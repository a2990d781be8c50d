# -*- coding: utf-8 -*-
"""Embedded structured-data (JSON-LD / schema.org) extraction.

Web pages increasingly carry machine-readable entity descriptions in
``<script type="application/ld+json">`` blocks — schema.org
Organization/Person/Product/Article markup that search engines and KG
builders (the Google Knowledge Graph pipeline, Web Data Commons)
harvest as SEED FACTS: typed entities with canonical names, for free,
before any NLP runs. For a KG-construction engine this is the
highest-precision entity source a crawl has, and it composes with the
extraction kernel's prose triples (structured seeds anchor entity
resolution).

Not in the reference (its input is pre-extracted prose); format is the
public JSON-LD 1.1 / schema.org convention, harvest semantics follow
Web Data Commons (Meusel et al. 2014, "The WebDataCommons Microdata,
RDFa and Microformat Dataset Series").

Scale shape: entirely row-local codegen — a lazy regexp pulls the
script bodies, ``from_json`` (JVM Jackson, no UDF) parses a fixed
projection schema, and one explode emits the entity rows. Page bodies
never survive past the explode; no exchange of any kind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# (?s): '.' must cross newlines — real JSON-LD is overwhelmingly
# pretty-printed (multi-line); without DOTALL those blocks silently
# never extract (same reason _SITEMAP_ENTRY_RE carries it)
_SCRIPT_RE = r'(?s)<script type="application/ld\+json">(.*?)</script>'
_LD_SCHEMA = "`@type` STRING, name STRING, url STRING"


def extract_jsonld(pages: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Harvest ``(doc_id, ld_type, ld_name, ld_url)`` entity rows from
    embedded JSON-LD blocks.

    A block survives only if it parses as a JSON object whose
    ``@type`` is a non-null string — malformed JSON, arrays, scalars,
    and typeless objects are all dropped under the SAME rule in Spark
    (``from_json`` projects null fields) and the SQL oracle (DuckDB
    ``json_valid`` + null ``@type``), so validity never depends on
    engine-specific error behavior. ``name``/``url`` stay NULL when
    absent. Top-level ``@graph`` arrays and nested entities are out of
    scope (declared): this is the flat-object harvest that covers the
    overwhelming majority of schema.org deployments per the Web Data
    Commons census.
    """
    # SQL string literals eat single backslashes -> double them
    sql_re = _SCRIPT_RE.replace("\\", "\\\\")
    blocks = F.expr(
        f"regexp_extract_all({text_col}, '{sql_re}', 1)")
    raw = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(blocks).alias("_raw"),
    )
    j = F.from_json("_raw", _LD_SCHEMA)
    return (
        raw.select(
            "doc_id",
            j.getField("@type").alias("ld_type"),
            j.getField("name").alias("ld_name"),
            j.getField("url").alias("ld_url"),
        )
        .filter(F.col("ld_type").isNotNull())
    )


# a table line: starts and ends with '|' after trimming
_TABLE_LINE_RE = r"^\|.*\|$"
# a separator line: only -,:,| and spaces between the pipes
_SEPARATOR_RE = r"^\|[-:| ]+\|$"


def extract_tables(pages: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Relational-table harvest from markdown-style pipe tables — the
    WebTables program (Cafarella et al., VLDB 2008): the web's
    embedded tables are a corpus of hundreds of millions of small
    relations whose header rows carry attribute names for free, and
    mining them yields (entity, attribute, value) triples at a
    precision prose extraction can't reach.

    A table is a maximal run of consecutive lines that start and end
    with ``|`` (after trimming) — the gaps-and-islands rule. Within an
    island the FIRST line is the header, ``|---|:--:|``-style
    separator lines are dropped, and every remaining line is a data
    row. Output is the fully unpivoted cell list ``(doc_id, table_id,
    row_idx, col_idx, header, cell)``: ``table_id`` numbers islands
    within a document in text order (1-based), ``row_idx`` numbers
    data rows within a table (1-based, separators and header
    excluded), ``col_idx`` is 0-based, ``header`` is the header cell
    of the same column or NULL when a ragged row is wider than its
    header. Cells are trimmed; empty cells survive as ``''``.

    Scale shape: one explode, then all sequencing windows are keyed by
    ``doc_id`` (one doc-sized partition each — bounded by a page's
    line count, never by corpus size), and the header lookup is an
    ``element_at`` against the island's first line carried by a window
    ``first()``, not a join. The exchange moves ``(doc_id, idx,
    line)`` for TABLE lines only — prose never shuffles."""
    lines = pages.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("idx", "line"),
    ).withColumn("_t", F.trim("line"))
    tl = lines.filter(F.col("_t").rlike(_TABLE_LINE_RE))

    w_doc = Window.partitionBy("doc_id").orderBy("idx")
    tl = tl.withColumn("_grp", F.col("idx") - F.row_number().over(w_doc))
    tl = tl.withColumn(
        "table_id",
        F.dense_rank().over(Window.partitionBy("doc_id").orderBy("_grp")))

    w_isl = Window.partitionBy("doc_id", "_grp").orderBy("idx")
    tl = (
        tl.withColumn("_rn", F.row_number().over(w_isl))
        .withColumn("_header_line", F.first("_t").over(w_isl))
        .withColumn("_sep", F.col("_t").rlike(_SEPARATOR_RE))
    )
    cells_of = (lambda c: F.transform(
        F.split(F.regexp_replace(c, r"^\||\|$", ""), r"\|"),
        lambda x: F.trim(x)))
    data = (
        tl.filter((F.col("_rn") > 1) & ~F.col("_sep"))
        .withColumn("row_idx",
                    F.row_number().over(w_isl).cast("long"))
        .select(
            "doc_id", F.col("table_id").cast("long").alias("table_id"),
            "row_idx",
            F.posexplode(cells_of(F.col("_t"))).alias("col_idx", "cell"),
            cells_of(F.col("_header_line")).alias("_hc"),
        )
    )
    return data.select(
        "doc_id", "table_id", "row_idx",
        F.col("col_idx").cast("long").alias("col_idx"),
        F.try_element_at("_hc", (F.col("col_idx") + 1).cast("int"))
        .alias("header"),
        "cell",
    )


def infobox_triples(cells: DataFrame, subjects: DataFrame,
                    id_col: str = "doc_id",
                    subj_col: str = "subj") -> DataFrame:
    """Infobox-style triple harvest from 2-column web tables: a table
    whose rows are ``| attribute | value |`` pairs is a per-page
    entity description (the Wikipedia-infobox shape DBpedia is built
    from — Lehmann et al. 2015), and each data row asserts
    ``(page_subject, attribute, value)``. ``cells`` is
    :func:`extract_tables` output; ``subjects`` maps ``doc_id`` to
    the page's subject entity (from JSON-LD, the title, or entity
    linking — caller's choice of anchor).

    Rules: only tables whose max col_idx is exactly 1 qualify (wider
    tables are relations, not attribute lists — WebTables territory);
    the key is column 0, the value column 1; rows with an empty key
    or a missing value (ragged) are dropped. Emits ``(doc_id, subj,
    key, value)``.

    Scale shape: the 2-column qualifier and the key/value pivot are
    both map-side-combined aggregates keyed (doc, table[, row]) —
    partition-local after extract_tables' own doc-keyed shuffle; the
    subject attach is one equi-join on the doc key. No window over
    anything corpus-wide."""
    width = (cells.groupBy(id_col, "table_id")
             .agg(F.max("col_idx").alias("_w")))
    kv = (cells.join(width.filter(F.col("_w") == 1),
                     [id_col, "table_id"])
          .groupBy(id_col, "table_id", "row_idx")
          .agg(F.max(F.when(F.col("col_idx") == 0, F.col("cell")))
               .alias("key"),
               F.max(F.when(F.col("col_idx") == 1, F.col("cell")))
               .alias("value")))
    return (kv.filter((F.col("key") != "") & F.col("value").isNotNull())
            .join(subjects.select(F.col(id_col),
                                  F.col(subj_col).alias("subj")),
                  id_col)
            .select(id_col, "subj", "key", "value"))


# microdata: any tag carrying itemprop=..., plus the trailing inner
# text up to the next '<' (so both content-attribute and element-text
# values are visible in ONE extracted span). RE2-compatible: no
# lookaround, so the same pattern runs verbatim in the SQL oracle.
# The \s before each attribute name is the word boundary that keeps
# data-itemprop= / xcontent= lookalikes from substring-matching
# (attributes are always whitespace-separated in a tag).
_ITEMPROP_TAG_RE = r'<[^<>]*\sitemprop="[^"]*"[^<>]*>[^<]*'


def extract_microdata(pages: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Schema.org microdata harvest — the second leg of the Web Data
    Commons structured-data triad (Meusel et al. 2014) next to
    :func:`extract_jsonld`: HTML5 ``itemscope``/``itemtype``/
    ``itemprop`` attributes mark up entity descriptions inline in the
    markup, and at crawl scale microdata deployments OUTNUMBER
    JSON-LD ones, so a KG seed-fact pass that skips them leaves
    precision facts on the floor.

    Emits ``(doc_id, prop, value, source)``:

    * every ``itemtype="IRI"`` attribute → one ``('@type', IRI,
      'type')`` row (the entity-class assertion);
    * every tag carrying ``itemprop="k"`` → one ``(k, v, source)``
      row where ``v`` is the tag's ``content`` attribute when present
      (``source='content'`` — the meta-tag form), else the element
      text up to the next tag boundary (``source='text'``), trimmed;
      tags with neither are dropped, as are empty ``itemprop`` keys.

    Nested-scope attachment (which itemscope a prop belongs to) is
    declared out of scope — like the flat JSON-LD harvest, this is
    the per-page property bag that downstream linking keys on.

    Scale shape: entirely row-local — two RE2-safe regex passes and
    one explode; page bodies never survive the explode and no
    exchange of any kind happens here.
    """
    types = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, "
            f"'\\\\sitemtype=\"([^\"]+)\"', 1)"
        )).alias("value"),
    ).select("doc_id", F.lit("@type").alias("prop"), "value",
             F.lit("type").alias("source"))

    tag_sql_re = _ITEMPROP_TAG_RE.replace("\\", "\\\\")
    tags = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{tag_sql_re}', 0)"
        )).alias("_m"),
    )
    prop = F.regexp_extract("_m", r'\sitemprop="([^"]+)"', 1)
    content = F.regexp_extract("_m", r'\scontent="([^"]+)"', 1)
    inner = F.trim(F.regexp_extract("_m", r">([^<]*)$", 1))
    props = (
        tags.select(
            "doc_id", prop.alias("prop"), content.alias("_c"),
            inner.alias("_t"))
        .filter(F.col("prop") != "")
        .select(
            "doc_id", "prop",
            F.when(F.col("_c") != "", F.col("_c"))
            .when(F.col("_t") != "", F.col("_t")).alias("value"),
            F.when(F.col("_c") != "", F.lit("content"))
            .when(F.col("_t") != "", F.lit("text")).alias("source"))
        .filter(F.col("value").isNotNull())
    )
    return types.unionByName(props)


# one <url>...</url> entry of a sitemap; (?s) so loc/lastmod may sit
# on their own lines. RE2-compatible (no lookaround) — the SQL oracle
# runs the same pattern verbatim.
_SITEMAP_ENTRY_RE = r"(?s)<url>(.*?)</url>"


def extract_sitemap(blobs: DataFrame, id_col: str = "sitemap_id",
                    xml_col: str = "xml") -> DataFrame:
    """Sitemap-protocol harvest (sitemaps.org 0.9 — the crawl-
    scheduling seed every polite crawler reads before fetching): split
    sitemap XML blobs into their ``<url>`` entries and extract the
    three load-bearing fields.

    Returns one row per entry: ``(sitemap_id, entry_idx, loc,
    lastmod, priority)`` — ``entry_idx`` 0-based in blob order,
    ``loc`` NULL when the entry lacks one (the malformed-entry
    signal; filter or quarantine downstream, never silently dropped),
    ``lastmod``/``priority`` NULL when absent.

    Scale shape: one regexp_extract_all + posexplode per blob and
    three row-local extracts per entry — zero exchange; a sitemap
    file never crosses a shuffle whole. XML niceties (CDATA, entity
    escapes, namespaces) are declared out of scope: this is the
    textual-convention harvest matching how sitemaps are emitted in
    practice, same contract as the WARC textual split.
    """
    entries = F.expr(
        f"regexp_extract_all({xml_col}, '{_SITEMAP_ENTRY_RE}', 1)")
    rec = blobs.select(
        F.col(id_col).alias("sitemap_id"),
        F.posexplode(entries).alias("entry_idx", "_e"),
    ).select("sitemap_id",
             F.col("entry_idx").cast("long").alias("entry_idx"),
             F.col("_e"))

    def _tag(name):
        v = F.regexp_extract(
            F.col("_e"), rf"(?s)<{name}>(.*?)</{name}>", 1)
        return F.when(v == "", F.lit(None).cast("string")) \
            .otherwise(F.trim(v))

    return rec.select(
        "sitemap_id", "entry_idx",
        _tag("loc").alias("loc"),
        _tag("lastmod").alias("lastmod"),
        _tag("priority").alias("priority"),
    )


def extract_meta(pages: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """OpenGraph / canonical-link harvest — the third leg of the
    markup triad next to :func:`extract_jsonld` and
    :func:`extract_microdata`: ``<meta property="og:*" content=..>``
    tags (the OpenGraph protocol, ogp.me) carry the page's own
    declaration of its title/type/url, and ``<link rel="canonical"
    href=..>`` is the dedup signal search pipelines trust FIRST —
    the page naming its own canonical variant, upstream of any
    content hash.

    Returns one row per page: ``(doc_id, og_title, og_type, og_url,
    canonical)``, each NULL when the tag is absent. First occurrence
    wins when a tag repeats (regexp_extract takes the leftmost match
    in both Java regex and RE2 — the declared tie rule).

    Scale shape: four row-local regexp extracts, zero exchange.
    """

    def _first(pat):
        v = F.regexp_extract(F.col(text_col), pat, 1)
        return F.when(v == "", F.lit(None).cast("string")).otherwise(v)

    def _og(prop):
        return _first(
            rf'<meta property="og:{prop}" content="([^"]*)"')

    return pages.select(
        F.col(id_col).alias("doc_id"),
        _og("title").alias("og_title"),
        _og("type").alias("og_type"),
        _og("url").alias("og_url"),
        _first(r'<link rel="canonical" href="([^"]*)"')
        .alias("canonical"),
    )


#: one alternate-language link tag; href/hreflang order fixed by the
#: emitter convention (declared), keeping the pattern RE2-safe
_HREFLANG_TAG_RE = (r'<link rel="alternate" hreflang="([a-zA-Z-]+)" '
                    r'href="([^"]*)"')


def hreflang_pairs(pages: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_langs: int = 64) -> DataFrame:
    """Markup-declared bitext mining: ``<link rel="alternate"
    hreflang=..>`` clusters (the ogp/Google i18n convention) name a
    page's own translations — the highest-precision parallel-corpus
    signal a crawl carries, upstream of the content-based
    :func:`linking.bitext_candidates`. Emits every cross-language
    pair within a page's alternate cluster: ``(doc_id, lang_a,
    href_a, lang_b, href_b)`` with ``lang_a < lang_b`` (ties on
    lang broken by href order; duplicate tags fold first).

    Scale shape: tags extract row-locally; pairs generate IN the
    per-doc aggregate (sorted struct list -> strict upper triangle
    via JVM lambdas — the proven ``dedup._bucket_pairs``
    construction), so no self-join exists and a page's cost is its
    own alternate count, capped by ``max_langs`` (a runaway tag farm
    drops whole rather than going quadratic).
    """
    tag0 = F.expr(
        f"regexp_extract_all({text_col}, '{_HREFLANG_TAG_RE}', 0)")
    tags = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tag0).alias("_t"),
    ).select(
        "doc_id",
        F.lower(F.regexp_extract("_t", _HREFLANG_TAG_RE, 1))
        .alias("lang"),
        F.regexp_extract("_t", _HREFLANG_TAG_RE, 2).alias("href"),
    ).distinct()
    grouped = (tags.groupBy("doc_id")
               .agg(F.sort_array(F.collect_list(
                   F.struct("lang", "href"))).alias("_alts"))
               .filter(F.size("_alts") <= int(max_langs)))
    tri = F.flatten(F.transform(
        "_alts",
        lambda x, i: F.transform(
            F.slice("_alts", i + F.lit(2), F.size("_alts")),
            lambda y: F.struct(
                x["lang"].alias("lang_a"), x["href"].alias("href_a"),
                y["lang"].alias("lang_b"), y["href"].alias("href_b")),
        ),
    ))
    return (grouped.select("doc_id", F.explode(tri).alias("_p"))
            .select("doc_id", "_p.lang_a", "_p.href_a",
                    "_p.lang_b", "_p.href_b")
            .filter(F.col("lang_a") != F.col("lang_b")))
