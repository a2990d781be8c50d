# -*- coding: utf-8 -*-
"""Wikilink extraction and anchor-text aggregation.

Wikipedia-style ``[[Target|anchor text]]`` links are the single
richest public source of (entity, alias) supervision — every serious
KG-construction pipeline (DBpedia, Wikidata bootstrapping, entity
linkers like TagMe/REL) starts by inverting them: for each link
TARGET, collect every anchor string authors used to refer to it. The
inverted anchor table gives (a) the alias dictionary for entity
linking, (b) inlink counts for entity salience, and (c) the mention
vocabulary for weak-labelling NER training data.

Not in the reference (its corpus is pre-extracted prose); semantics
follow the public MediaWiki link syntax and the anchor-dictionary
construction described in Spitkovsky & Chang (2012), "A Cross-Lingual
Dictionary for English Wikipedia Concepts".

Scale shape: link extraction is row-local codegen (regexp over the
page body — the body never survives past the explode); the inversion
exchanges ``(target, term, count)`` / ``(target, doc_id)`` rows only.
The per-target top-k is computed IN-aggregate (sorted slice of the
collected per-term counts, bounded by the target's distinct anchor
vocabulary) — no second window/shuffle, and no all-pairs anywhere.
A mega-target (a hub entity with millions of inlinks) bounds the
collect at its distinct-TERM count, not its inlink count, because the
term counting collapses map-side first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vectors import ws_tokens

# inner content of [[...]] — no nested brackets
_WIKILINK_RE = r"\[\[([^\[\]]+)\]\]"


def _normalize_target(col: Column) -> Column:
    """MediaWiki title normalization (declared subset): underscores to
    spaces, whitespace runs collapsed, trimmed, first char uppercased.
    Percent/HTML-entity decoding is out of scope (same stance as
    urls.canonical_url)."""
    t = F.trim(F.regexp_replace(F.replace(col, F.lit("_"), F.lit(" ")),
                                r"\s+", " "))
    return F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, 1 << 30))


def extract_wikilinks(pages: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Explode every ``[[Target|anchor]]`` / ``[[Target]]`` occurrence
    into ``(doc_id, target, anchor)`` rows.

    The anchor is the text after the FIRST ``|`` (later pipes stay in
    the anchor, per MediaWiki); a pipe-less link anchors with its own
    target text (pre-normalization). Targets are normalized with
    :func:`_normalize_target`; anchors keep their surface form (case
    folding happens in the aggregation, where it is a counting rule,
    not a data rewrite). Pages with no links contribute no rows.
    """
    # SQL string literals eat single backslashes -> double them
    sql_re = _WIKILINK_RE.replace("\\", "\\\\")
    inner = F.expr(
        f"regexp_extract_all({text_col}, '{sql_re}', 1)")
    links = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(inner).alias("_raw"),
    )
    parts = F.split(F.col("_raw"), r"\|", 2)
    target_raw = F.element_at(parts, 1)
    anchor = F.when(F.size(parts) >= 2, F.element_at(parts, 2)) \
        .otherwise(target_raw)
    return links.select(
        "doc_id",
        _normalize_target(target_raw).alias("target"),
        F.trim(anchor).alias("anchor"),
    ).filter(F.col("target") != "")  # pipe-trick '[[|x]]' has no target


def anchor_summary(links: DataFrame, k: int = 5) -> DataFrame:
    """Invert a ``(doc_id, target, anchor)`` link table into the
    per-target anchor dictionary:

    - ``n_inlinks``    — total link occurrences
    - ``n_docs``       — distinct citing documents
    - ``n_anchor_terms`` — distinct lowercased anchor words
    - ``top_anchor_terms`` — the ``k`` most frequent lowercased anchor
      words, ties broken lexicographically (deterministic, replayable)

    Term counting is occurrence-based (a word used twice across two
    anchors counts twice). Exchanges carry ``(target, term, long)``
    and ``(target, doc_id)`` rows; the top-k slice happens inside the
    final aggregate, bounded by each target's distinct-term count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    terms = links.select(
        "target",
        F.explode(ws_tokens("anchor")).alias("w"),
    ).select("target", F.lower("w").alias("term"))
    term_counts = terms.groupBy("target", "term").agg(
        F.count("*").alias("c"))
    top = term_counts.groupBy("target").agg(
        F.count("*").cast("long").alias("n_anchor_terms"),
        F.transform(
            F.slice(
                F.array_sort(F.collect_list(F.struct(
                    (-F.col("c")).alias("neg_c"), F.col("term")))),
                1, k),
            lambda s: s.term,
        ).alias("top_anchor_terms"),
    )
    stats = links.groupBy("target").agg(
        F.count("*").cast("long").alias("n_inlinks"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return stats.join(top, "target", "left").select(
        "target", "n_inlinks", "n_docs",
        F.coalesce("n_anchor_terms", F.lit(0)).alias("n_anchor_terms"),
        F.coalesce("top_anchor_terms", F.array().cast("array<string>"))
        .alias("top_anchor_terms"),
    )


def commonness_dictionary(links: DataFrame) -> DataFrame:
    """Collapse a ``(doc_id, target, anchor)`` link table into the
    commonness dictionary P(target | anchor) in COUNT form:
    ``(anchor_key, target, n_pair, n_anchor)`` where ``anchor_key`` is
    the case-folded trimmed anchor, ``n_pair`` counts links using that
    (anchor, target) pair and ``n_anchor`` counts all links with that
    anchor. Counts, not ratios, are exposed — the consumer divides (or
    compares cross-multiplied), so no float leaves the operator.

    Scale shape: one (anchor, target) count with map-side combine, one
    window-free per-anchor rollup rejoined by broadcast-eligible key —
    implemented as a second aggregation + join on ``anchor_key``; both
    exchanges carry ``(string, string, long)`` rows."""
    pairs = (
        # the key collapses internal whitespace runs too: consumer
        # surfaces (distant_labels / link_mentions candidates) are
        # single-space token joins, so a multi-space anchor would
        # otherwise never match anything
        links.select(F.lower(F.regexp_replace(F.trim("anchor"),
                                              r"\s+", " "))
                     .alias("anchor_key"),
                     "target")
        .filter(F.col("anchor_key") != "")
        .groupBy("anchor_key", "target")
        .agg(F.count("*").cast("long").alias("n_pair"))
    )
    totals = pairs.groupBy("anchor_key").agg(
        F.sum("n_pair").cast("long").alias("n_anchor"))
    return pairs.join(totals, "anchor_key").select(
        "anchor_key", "target", "n_pair", "n_anchor")


def link_mentions(mentions: DataFrame, dictionary: DataFrame,
                  id_col: str = "mention_id",
                  surface_col: str = "surface") -> DataFrame:
    """Commonness-baseline entity linking (Spitkovsky & Chang 2012;
    the P(entity | mention) prior every linker starts from): each
    mention surface is matched case-folded against the anchor
    dictionary and resolved to the target with the HIGHEST pair count,
    ties broken by lexicographically smallest target (declared,
    replayable). Unmatched surfaces survive with NULL target — a
    linker must report its abstentions, not drop them.

    Returns ``(mention_id, surface, target, n_pair, n_anchor)``;
    ``n_pair / n_anchor`` is the commonness score, left to the caller
    as counts. The argmax is computed on the dictionary BEFORE the
    mention join (one aggregation over dictionary rows, then an
    equi-join on the anchor key), so a frequent mention string never
    multiplies dictionary candidates through the join."""
    best = (
        dictionary.groupBy("anchor_key").agg(
            F.min(F.struct((-F.col("n_pair")).alias("neg"),
                           F.col("target"))).alias("_b"),
            F.max("n_anchor").alias("n_anchor"),
        )
        .select("anchor_key", F.col("_b.target").alias("target"),
                (-F.col("_b.neg")).cast("long").alias("n_pair"),
                "n_anchor")
    )
    m = mentions.select(
        F.col(id_col).alias("mention_id"),
        F.col(surface_col).alias("surface"),
        F.lower(F.trim(surface_col)).alias("anchor_key"),
    )
    return m.join(best, "anchor_key", "left").select(
        "mention_id", "surface", "target", "n_pair", "n_anchor")


def distant_labels(pages: DataFrame, dictionary: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   max_gram: int = 2) -> DataFrame:
    """Distant-supervision mention labeling (Mintz et al., ACL 2009):
    every occurrence of a dictionary alias in running text becomes a
    weak NER/linking label ``(doc_id, pos, n_words, surface,
    target)`` — the trick that turns an anchor dictionary (e.g.
    :func:`commonness_dictionary`'s output) into millions of free
    training labels.

    Matching is over case-folded whitespace word n-grams up to
    ``max_gram`` words; at the same START position the LONGEST match
    wins and shorter ones are dropped ("New York" beats "New" —
    standard maximal-munch). Overlaps at different starts both
    survive (resolving those needs the consumer's tag scheme).
    ``dictionary`` rows are ``(anchor_key, target)``; duplicate keys
    are an error the caller resolves first (e.g. keep the commonness
    argmax per key).

    Scale shape: the page side explodes to (doc, pos, gram-key) rows
    — bounded at ``max_gram`` rows per token, built ARRAY-SIDE in one
    pass so the token array is never replicated per exploded row —
    and the dictionary is the BROADCAST build side of the only join,
    so the token stream never shuffles for matching; the longest-match
    argmax is one in-aggregate max over (doc, pos) groups."""
    if max_gram < 1:
        raise ValueError(f"max_gram must be >= 1 (got {max_gram})")
    a = F.coalesce(ws_tokens(text_col), F.array())
    empty = F.array().cast(
        "array<struct<pos:int,n_words:int,surface:string>>")
    def _gram_structs(n):
        # single-arg lambda on purpose: a 2-arity lambda would make
        # transform() bind the array INDEX as the second parameter
        def build(i):
            return F.struct(
                i.cast("int").alias("pos"),
                F.lit(n).cast("int").alias("n_words"),
                F.concat_ws(
                    " ", F.slice(a, i + F.lit(1), F.lit(n))
                ).alias("surface"),
            )
        return F.transform(F.sequence(F.lit(0), F.size(a) - n), build)

    branches = []
    for n in range(1, max_gram + 1):
        # sequence(0, size-n) counts DOWN when size < n — guard first
        branches.append(
            F.when(F.size(a) >= n, _gram_structs(n)).otherwise(empty))
    cand = (
        pages.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.flatten(F.array(*branches))).alias("_g"))
        .select("doc_id", F.col("_g.pos").alias("pos"),
                F.col("_g.n_words").alias("n_words"),
                F.col("_g.surface").alias("surface"))
    )
    d = dictionary.select(F.col("anchor_key"), F.col("target"))
    hits = cand.join(
        F.broadcast(d),
        F.lower(cand["surface"]) == d["anchor_key"],
    )
    # maximal munch: longest surface at each start position wins
    return (
        hits.groupBy("doc_id", "pos").agg(
            F.max(F.struct("n_words", "surface", "target")).alias("_m"))
        .select(
            "doc_id", F.col("pos").cast("long").alias("pos"),
            F.col("_m.n_words").cast("long").alias("n_words"),
            F.col("_m.surface").alias("surface"),
            F.col("_m.target").alias("target"),
        )
    )
