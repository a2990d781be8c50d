# -*- coding: utf-8 -*-
"""Line-level page cleaning: corpus-frequency boilerplate removal.

Web pages carry chrome — navigation headers, cookie banners, footers,
share buttons — that repeats across a site (or the whole crawl) and
poisons LLM training data with millions of copies of "Home | About |
Contact". The standard fix (CCNet, Wenzek et al. 2020 §3.1; RefinedWeb,
Penedo et al. 2023 §3.2 line-wise filters) is line/paragraph-unit:
hash every line, count how many DISTINCT documents each line appears
in, and drop lines that are (a) shared by more than a threshold
fraction of the corpus — boilerplate by frequency — or (b) too short
to be prose and not punctuation-terminated — navigation junk.

This is deliberately a different unit than :func:`..dedup.span_dedup`
(fixed 8-word blocks, global first-occurrence survives: the FIRST copy
is kept) — here a frequent line is boilerplate and EVERY copy is
dropped, including the first, because page chrome has no canonical
owner.

Scale shape: one explode to ``(line_hash, doc_id)`` pairs (the line
BODY rides only until the hash is computed; the frequency exchange
moves ``(long, long)``), one distinct + groupBy to get per-line doc
frequencies, one hash-keyed join back, and one groupBy(doc_id) to
reassemble. The frequent-line set is the join's build side and is
bounded by the corpus's distinct-line count; the reassembly
``collect_list`` is bounded by a single page's line count. The total
document count rides in-plan as a broadcast 1-row aggregate — no
driver-side ``count()`` action.

Not in the reference (it has no corpus-cleaning stage); semantics from
the public CCNet/RefinedWeb recipes cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def strip_boilerplate(pages: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_line_chars: int = 20,
                      max_doc_frac: float = 0.3,
                      min_docs: int = 2) -> DataFrame:
    """Drop boilerplate lines from newline-separated page text.

    A line is dropped as **frequent** when its normalized form
    (trimmed, lowercased) appears in more than
    ``greatest(min_docs, max_doc_frac * total_docs)`` distinct
    documents; a surviving line is dropped as **short** when it has
    fewer than ``min_line_chars`` characters AND does not end in
    terminal punctuation (``. ! ? 。 ！ ？``) — prose sentences pass,
    "Share" buttons don't. Frequency wins when both apply (the
    dropped-short counter only sees non-frequent lines), so the two
    counters partition the dropped set.

    Returns ``(doc_id, n_lines, n_kept, n_dropped_freq,
    n_dropped_short, clean_text)`` — ``clean_text`` is the kept lines
    re-joined with ``\\n`` in original order. Every input row
    survives (a fully-boilerplate page comes back with
    ``n_kept = 0`` and empty text), so lineage joins never lose
    documents.
    """
    if not 0.0 < max_doc_frac <= 1.0:
        raise ValueError(
            f"max_doc_frac must be in (0, 1] (got {max_doc_frac})")
    lines = (
        pages.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("idx", "line"),
        )
        .withColumn("lkey", F.xxhash64(F.lower(F.trim("line"))))
    )

    # per-line document frequency: distinct (lkey, doc_id) first so a
    # line repeated WITHIN one page counts that page once
    line_df = (
        lines.select("lkey", "doc_id").distinct()
        .groupBy("lkey").agg(F.count("*").alias("n_docs_with"))
    )
    total = pages.select(
        F.count("*").cast("long").alias("_total_docs"))
    cutoff = (
        line_df.join(F.broadcast(total))
        .filter(
            F.col("n_docs_with")
            > F.greatest(F.lit(min_docs),
                         (F.lit(float(max_doc_frac))
                          * F.col("_total_docs")).cast("long")))
        .select("lkey", F.lit(True).alias("is_freq"))
    )

    terminal = r".*[.!?。！？]\s*$"
    flagged = (
        lines.join(cutoff, "lkey", "left")
        .withColumn("drop_freq", F.coalesce("is_freq", F.lit(False)))
        .withColumn(
            "drop_short",
            (~F.col("drop_freq"))
            & (F.length(F.trim("line")) < min_line_chars)
            & (~F.trim("line").rlike(terminal)),
        )
        .withColumn("keep", ~F.col("drop_freq") & ~F.col("drop_short"))
    )
    # array_sort on struct(idx, ...) orders by idx: original line order
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(F.col("drop_freq").cast("long")).alias("n_dropped_freq"),
            F.sum(F.col("drop_short").cast("long")).alias("n_dropped_short"),
            F.concat_ws(
                "\n",
                F.expr("transform(filter(array_sort(collect_list("
                       "struct(idx, keep, line))), s -> s.keep), "
                       "s -> s.line)"),
            ).alias("clean_text"),
        )
    )


def c4_line_filter(pages: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 5,
                   min_kept_lines: int = 3) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning", §2.2) — ROW-LOCAL line filters, the complement
    of :func:`strip_boilerplate`'s corpus-frequency rule (which needs a
    cross-document exchange; these rules need none and run first in a
    real pipeline, shrinking what the frequency pass must shuffle).

    Line rules, first failing rule charged, in C4's order:

    - ``drop_punct`` — the trimmed line does not end in a terminal
      punctuation mark (``. ! ? "`` plus CJK ``。！？”``)
    - ``drop_short`` — fewer than ``min_words`` whitespace words
    - ``drop_js``    — contains the word "javascript" (case-folded)

    Page rules (``page_verdict``, first match): ``lorem_ipsum`` if the
    page contains "lorem ipsum" (case-folded), ``brace`` if it contains
    ``{``, ``too_few_lines`` if fewer than ``min_kept_lines`` lines
    survive the line rules, else ``ok``. C4 drops non-``ok`` pages
    outright; the verdict is returned instead so curation can audit
    kill rates per rule before committing to them.

    Returns ``(doc_id, n_lines, n_kept, n_drop_punct, n_drop_short,
    n_drop_js, page_verdict, clean_text)`` — every input row survives;
    ``clean_text`` is the kept lines re-joined in original order (empty
    when the page verdict kills the page, so a downstream
    ``filter(page_verdict = 'ok')`` and a blind ``clean_text`` consumer
    agree on content).

    Scale shape: pure per-row codegen — split, per-line flags via array
    higher-order functions, no explode, no exchange, no UDF. The scan
    is embarrassingly parallel and survives any corpus size the
    underlying parquet scan survives.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    # per-line verdict array: 0 keep, 1 punct, 2 short, 3 js
    verdicts = F.transform(
        lines,
        lambda l: F.when(
            ~F.trim(l).rlike(r'[.!?"。！？”]$'), F.lit(1)
        ).when(
            F.size(F.filter(F.split(F.trim(l), r"\s+"),
                            lambda w: w != F.lit(""))) < min_words,
            F.lit(2),
        ).when(
            F.lower(l).contains("javascript"), F.lit(3)
        ).otherwise(F.lit(0)),
    )
    counted = pages.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("_ls"),
        verdicts.alias("_v"),
        F.lower(t).contains("lorem ipsum").alias("_lorem"),
        t.contains("{").alias("_brace"),
    )
    n_kept = F.size(F.filter("_v", lambda v: v == 0)).cast("long")
    kept_text = F.concat_ws(
        "\n",
        F.filter(
            F.zip_with("_ls", "_v",
                       lambda l, v: F.when(v == 0, l)),
            lambda x: x.isNotNull(),
        ),
    )
    verdict = (
        F.when(F.col("_lorem"), "lorem_ipsum")
        .when(F.col("_brace"), "brace")
        .when(n_kept < min_kept_lines, "too_few_lines")
        .otherwise("ok")
    )
    return counted.select(
        "doc_id",
        F.size("_ls").cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        F.size(F.filter("_v", lambda v: v == 1)).cast("long")
        .alias("n_drop_punct"),
        F.size(F.filter("_v", lambda v: v == 2)).cast("long")
        .alias("n_drop_short"),
        F.size(F.filter("_v", lambda v: v == 3)).cast("long")
        .alias("n_drop_js"),
        verdict.alias("page_verdict"),
        F.when(verdict == "ok", kept_text).otherwise(F.lit(""))
        .alias("clean_text"),
    )


def main_content_block(pages: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       min_words: int = 5,
                       max_link_frac_x3: int = 1) -> DataFrame:
    """Largest-content-block extraction — the boilerpipe/Arc90
    "readability" heuristic (Kohlschuetter et al., WSDM 2010): the
    main article of a web page is the LONGEST CONTIGUOUS RUN of
    text-dense lines, while chrome (nav, sidebars, footers) is short
    and link-dense. Unlike :func:`strip_boilerplate` (corpus
    frequency) and :func:`c4_line_filter` (per-line keep rules), this
    selects ONE block per page — what you want when a page embeds one
    article inside heavy chrome.

    A line is CONTENT when it has >= ``min_words`` whitespace words
    AND its link-span characters (``[[...]]`` wiki/markdown spans) are
    <= 1/3 of its length (integer cross-multiplied: ``3*link_chars <=
    max_link_frac_x3*length``). The main block is the contiguous
    content-line run with the MOST TOTAL WORDS, ties to the earliest
    start. Every input row survives: pages with no content line
    return ``block_lines = 0`` and empty ``main_text``.

    Returns ``(doc_id, n_lines, block_start, block_lines,
    block_words, main_text)`` — ``block_start`` is the 0-based line
    index of the block's first line (-1 when no block).

    Scale shape: the flag is row-local codegen; islands use doc-keyed
    windows (partitions bounded by a page's line count); the block
    argmax is an in-aggregate ``max(struct)``. Content-line BODIES do
    ride the (doc-keyed) island exchange — unavoidable when the
    operator's output IS the text — but chrome lines are filtered
    before any exchange."""
    lines = pages.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("idx", "line"),
    )
    n_lines = pages.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .cast("long").alias("n_lines"),
    )
    link_chars = (
        F.length("line")
        - F.length(F.regexp_replace("line", r"\[\[[^\]]*\]\]", ""))
    )
    n_words = F.size(F.filter(F.split(F.trim("line"), r"\s+"),
                              lambda w: w != F.lit("")))
    content = (
        lines.withColumn("_w", n_words)
        .filter((F.col("_w") >= min_words)
                & (3 * link_chars
                   <= max_link_frac_x3 * F.greatest(F.length("line"),
                                                    F.lit(1))))
    )
    w_doc = Window.partitionBy("doc_id").orderBy("idx")
    isl = content.withColumn(
        "_grp", F.col("idx") - F.row_number().over(w_doc))
    blocks = isl.groupBy("doc_id", "_grp").agg(
        F.min("idx").cast("long").alias("block_start"),
        F.count("*").cast("long").alias("block_lines"),
        F.sum("_w").cast("long").alias("block_words"),
        F.concat_ws(
            "\n",
            F.expr("transform(array_sort(collect_list("
                   "struct(idx, line))), s -> s.line)"),
        ).alias("main_text"),
    )
    best = blocks.groupBy("doc_id").agg(
        F.max(F.struct(
            F.col("block_words"), (-F.col("block_start")).alias("ns"),
            F.col("block_lines"), F.col("block_start"),
            F.col("main_text"))).alias("_b"))
    return n_lines.join(best, "doc_id", "left").select(
        "doc_id", "n_lines",
        F.coalesce(F.col("_b.block_start"), F.lit(-1)).cast("long")
        .alias("block_start"),
        F.coalesce(F.col("_b.block_lines"), F.lit(0)).cast("long")
        .alias("block_lines"),
        F.coalesce(F.col("_b.block_words"), F.lit(0)).cast("long")
        .alias("block_words"),
        F.coalesce(F.col("_b.main_text"), F.lit("")).alias("main_text"),
    )


# tokenizer for casing statistics: letters/digits runs; a token must
# contain at least one LETTER (pure numbers have no casing)
_WORD_SPLIT_RE = r"[^\p{L}\p{N}]+"


def truecase_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_total: int = 2) -> DataFrame:
    """Corpus truecasing model (Lita et al., ACL 2003 — "tRuEcasIng"):
    for every lowercased vocabulary key, the most frequent surface
    casing and its support — ``(token_lc, best_form, n_best,
    n_total)``. Web text arrives case-mangled (headlines ALL CAPS,
    social text lowercase); NER and entity linking both key on casing,
    so KG pipelines first learn the corpus-frequency casing model and
    re-case with it. Ties break to the bytewise-smallest form
    (uppercase sorts before lowercase in UTF-8, matching the "prefer
    the marked form on a tie" convention) — deterministic and
    replayable in SQL.

    Scale shape: one explode to tokens (the body never survives it),
    one map-side-combined aggregate to the vocabulary-bounded
    ``(token_lc, form, n)`` table, then a window PARTITIONED by
    token_lc over that bounded table — never over the corpus. Keys
    with fewer than ``min_total`` corpus occurrences are dropped
    (their statistics are noise)."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), _WORD_SPLIT_RE))
        .alias("form")
    ).filter((F.col("form") != "") & F.col("form").rlike(r"\p{L}"))
    counts = (toks.groupBy(F.lower("form").alias("token_lc"), "form")
              .agg(F.count("*").cast("long").alias("n")))
    w = Window.partitionBy("token_lc")
    ranked = counts.select(
        "token_lc", "form", "n",
        F.row_number().over(
            w.orderBy(F.col("n").desc(), F.col("form").asc()))
        .alias("_rn"),
        F.sum("n").over(w).cast("long").alias("n_total"),
    )
    return (ranked.filter((F.col("_rn") == 1)
                          & (F.col("n_total") >= min_total))
            .select("token_lc", F.col("form").alias("best_form"),
                    F.col("n").alias("n_best"), "n_total"))
