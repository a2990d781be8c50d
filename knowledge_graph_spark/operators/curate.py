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
