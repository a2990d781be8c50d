# -*- coding: utf-8 -*-
"""Corpus curation: the training-data operators composed end-to-end.

One call takes a raw document table to a training-ready survivor set —
the pipeline a 100 TB pre-training corpus actually runs, built
entirely from the operators proven individually in this repo:

    language ID  ->  quality score  ->  repetition filters (Gopher)
                 ->  exact dedup (min-id survivor)

Each stage is JVM-side/set-based (textstats are pure codegen;
repetition is two gram aggregations; dedup shuffles (hash, id) pairs
only), so the composition inherits every individual scale property.
Near-dup (MinHash) and embedding dedup chain after this the same way —
see :func:`knowledge_graph_spark.operators.dedup.dedup_minhash`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_exact
from .textstats import repetition_stats, with_language_id, with_quality_score

# default gates, tuned to the standard web-corpus practice: drop
# bottom-quality docs, template/boilerplate spam, and exact copies
DEFAULT_GATES = {
    "min_quality": 0.75,
    "max_top_2gram_frac": 0.07,
    "max_dup_3gram_frac": 0.6,
}

def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", lang: str | None = "en",
                  gates: dict | None = None) -> DataFrame:
    """Survivor documents after the full curation cascade, with the
    per-doc signals that admitted them (audit columns kept — a curation
    decision you cannot explain is a curation decision you cannot
    debug at 10^12 documents).

    Order matters for cost: the cheap row-local filters (language,
    quality) run FIRST so the aggregation stages (repetition, dedup)
    see only candidate rows — predicate pushdown does the same thing
    inside one stage; this does it across stages."""
    unknown = set(gates or {}) - set(DEFAULT_GATES)
    if unknown:
        # a typo'd gate key would merge in unused and the DEFAULT
        # threshold would silently apply — the caller believes they
        # changed the cascade when they did not
        raise ValueError(
            f"unknown gate keys {sorted(unknown)}; valid: "
            f"{sorted(DEFAULT_GATES)}")
    g = {**DEFAULT_GATES, **(gates or {})}
    d = with_quality_score(with_language_id(docs, text_col), text_col)
    if lang is not None:
        d = d.filter(F.col("lang_pred") == lang)
    d = d.filter(F.col("quality") >= g["min_quality"])
    # the DAG below is a diamond twice over (repetition reads the gated
    # frame for 2-grams AND 3-grams; dedup references its input as both
    # join sides) — without materialization the regex/higher-order gate
    # stage recomputes up to 6x. An EAGER localCheckpoint, not a lazy
    # persist: Spark submits a job's independent stages concurrently,
    # so a lazy cache lets the 2-gram and 3-gram scans race and BOTH
    # recompute the gated frame before either populates it (observed as
    # bimodal 7 s / 53 s runs); eager materialization closes the race,
    # truncates lineage, and is GC-reclaimed — no per-call cache
    # bookkeeping. Storage is MEMORY_AND_DISK (spills, never OOMs);
    # swap for a checkpoint table in a multi-job production pipeline.
    d = d.localCheckpoint(eager=True)

    rep = repetition_stats(d, id_col, text_col)
    d = d.join(rep, id_col).filter(
        (F.col("top_2gram_frac") <= g["max_top_2gram_frac"])
        & (F.col("dup_3gram_frac") <= g["max_dup_3gram_frac"])
    )
    return dedup_exact(d, id_col, text_col)


def corpus_report(docs: DataFrame, source_col: str = "source",
                  id_col: str = "doc_id", text_col: str = "text",
                  min_quality: float = 0.75) -> DataFrame:
    """Per-source corpus report card — the governance table a data
    team reads before touching mixture weights: for every source, how
    big is it, what language is it, how much of it passes the quality
    and Gopher gates, how much is internally duplicated. One row per
    source, all counts (rates are the caller's division), composing
    the individually-proven operators:

    - ``n_docs`` / ``n_tokens`` — volume (whitespace tokens)
    - ``n_en`` / ``n_zh`` / ``n_other`` — :func:`with_language_id`
    - ``n_quality_hi`` — :func:`with_quality_score` composite >=
      ``min_quality`` (the composite takes 0.25-step values, exactly
      representable, so the threshold compare is engine-exact)
    - ``n_gopher_pass`` — :func:`gopher_rules` full-battery pass
    - ``n_dup_docs`` — documents sharing their exact content
      (xxhash64 identity) with another document OF THE SAME SOURCE

    Scale shape: the per-document signals are the row-local codegen
    of their operators; the rollup is one groupBy(source) over
    (source, flags); the dup census is a (source, hash) count joined
    back by hash key — bodies never shuffle anywhere.
    """
    from ..functions.vectors import n_ws_tokens
    from .textstats import gopher_rules

    base = with_quality_score(with_language_id(docs, text_col),
                              text_col)
    gop = gopher_rules(docs, id_col=id_col, text_col=text_col) \
        .select(F.col("doc_id").alias("_gid"),
                F.col("pass_gopher"))
    keyed = (
        base.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("_gid"),
            n_ws_tokens(text_col).cast("long").alias("_nt"),
            F.col("lang_pred"),
            (F.col("quality") >= F.lit(float(min_quality)))
            .alias("_hi"),
            # NULL text hashes to NULL: a NULL join/group key never
            # groups with anything here, matching dedup_exact's "no
            # basis to merge" policy — the report predicts exactly
            # what the dedup stage would remove (coalescing to ''
            # counted every held-out doc as a duplicate of the rest)
            F.xxhash64(F.col(text_col)).alias("_h"),
        )
        .join(gop, "_gid")
    )
    dup_groups = (
        keyed.groupBy("source", "_h")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .select("source", "_h", F.lit(True).alias("_dup"))
    )
    flagged = keyed.join(dup_groups, ["source", "_h"], "left")
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.sum((F.col("lang_pred") == "en").cast("long")).cast("long")
        .alias("n_en"),
        F.sum((F.col("lang_pred") == "zh").cast("long")).cast("long")
        .alias("n_zh"),
        F.sum((~F.col("lang_pred").isin("en", "zh")).cast("long"))
        .cast("long").alias("n_other"),
        F.sum(F.coalesce(F.col("_hi"), F.lit(False)).cast("long"))
        .cast("long").alias("n_quality_hi"),
        F.sum(F.col("pass_gopher").cast("long")).cast("long")
        .alias("n_gopher_pass"),
        F.sum(F.coalesce(F.col("_dup"), F.lit(False)).cast("long"))
        .cast("long").alias("n_dup_docs"),
    )
