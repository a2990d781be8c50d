# -*- coding: utf-8 -*-
"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

Every serious pre-training pipeline runs this (GPT-3 App. C: 13-gram
dedup vs benchmarks; Llama/PaLM: 8-10-gram overlap): a training
document that contains a benchmark's n-grams leaks the benchmark into
the model. The operator reports, per contaminated document, how many
DISTINCT eval n-grams it contains and how many eval documents are
implicated — the audit a removal decision needs.

Scale shape (100 TB corpus, MB-scale benchmark): eval n-grams are a
small set — deduplicate and BROADCAST them; the corpus side computes
its grams row-locally and hits them in a map-side broadcast hash join
BEFORE any dedup, so the only rows that ever reach an exchange are the
HITS (rare by assumption) flowing into the per-doc countDistinct — a
pre-join ``distinct`` would shuffle the full corpus gram stream
instead. The token array is materialized once per row (a project-local
column) so the n-gram lambda doesn't re-split the text per gram. Gram
semantics match :func:`repetition_stats`
(``functions.vectors.word_ngrams``): lowercase, split on
non-alphanumeric, whole text as one gram when shorter than n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _gram_col(text_col: str, n: int):
    """(tokens, grams) column pair; tokens materialize once per row."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^\\\\p{{L}}\\\\p{{N}}]+'),"
        " x -> x != '')"
    )
    # the short-text fallback folds the whole token list into ONE
    # gram; an EMPTY token list would fold to the empty string, and a
    # shared '' gram would flag every blank/punctuation-only corpus
    # page as contaminated by a blank eval row — filter it out
    grams = F.expr(
        f"""
        filter(
          CASE WHEN size(_w) >= {n}
          THEN transform(sequence(0, size(_w) - {n}),
                         i -> array_join(slice(_w, i + 1, {n}), ' '))
          ELSE array(array_join(_w, ' '))
          END, x -> x != '')
        """
    )
    return toks, grams


def ngram_decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_id_col: str = "eval_id",
                        eval_text_col: str = "text",
                        min_hits: int = 1) -> DataFrame:
    """Contaminated documents: ``(id_col, n_hit_grams, n_eval_docs)``
    for every corpus document sharing at least ``min_hits`` distinct
    word ``n``-grams with any eval document.

    Counts are over DISTINCT grams (a doc repeating one leaked gram 50
    times is one overlap, not fifty), matching how published
    decontamination thresholds are stated."""
    e_toks, e_grams = _gram_col(eval_text_col, n)
    eg = (
        eval_docs.select(F.col(eval_id_col).alias("_eval_id"),
                         e_toks.alias("_w"))
        .select("_eval_id", F.explode(e_grams).alias("_g"))
        .distinct()
    )
    d_toks, d_grams = _gram_col(text_col, n)
    dg = (
        docs.select(F.col(id_col), d_toks.alias("_w"))
        .select(id_col, F.explode(d_grams).alias("_g"))
    )
    return (
        dg.join(F.broadcast(eg), "_g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_g").alias("n_hit_grams"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hit_grams") >= min_hits)
    )
