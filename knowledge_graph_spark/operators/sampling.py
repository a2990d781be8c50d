# -*- coding: utf-8 -*-
"""Deterministic sampling and domain-mixture weighting.

A training-data pipeline doesn't sample with an RNG: a resumable
100 TB job needs the SAME rows kept on every rerun, on every cluster
size, from every re-ingest of the same corpus. The standard trick
(used by C4's hash-based splits and every reproducible holdout) is
content-keyed Bernoulli sampling — keep a row iff
``hash(key) mod M < rate * M``. That makes the sample a pure row-local
filter: no shuffle, no state, no seed file, stable under repartition,
and mergeable across incremental batches (a re-crawled url re-samples
to the same decision).

:func:`stratified_mixture` applies per-stratum rates (domain mixture
weighting a la C4/Pile/DoReMi-style recipes downstream of curation):
the rates table is a handful of literals folded into the plan — at any
corpus scale the whole operator is one codegen'd filter over the scan,
with the hash computed JVM-side (``F.xxhash64``, same function the
LSH/fingerprint operators build on; pure-Python twin in
``functions/xxh64.py`` lets oracles reproduce the exact keep set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# threshold denominator: rates are resolved to integer thresholds so
# both engines (and the pure-Python twin) compare exact integers, never
# floats
M = 1_000_000

SPARK_SEED = 42  # Spark's fixed xxhash64 seed


def _keep_expr(key_col: str, threshold: Column, seed: int) -> Column:
    h = (F.xxhash64(F.col(key_col)) if seed == SPARK_SEED
         else F.xxhash64(F.col(key_col), F.lit(seed)))
    return F.pmod(h, F.lit(M)) < threshold


def deterministic_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                         seed: int = SPARK_SEED) -> DataFrame:
    """Content-keyed Bernoulli sample: keeps a row iff
    ``pmod(xxhash64(key), 1e6) < rate * 1e6``. Row-local and
    reproducible; disjoint samples of the same table can be carved by
    varying ``seed``."""
    return df.filter(_keep_expr(key_col, F.lit(int(round(rate * M))), seed))


def _threshold_col(rates: dict[str, float], stratum_col: str,
                   default_rate: float) -> Column:
    pairs: list[Column] = []
    for s, r in rates.items():
        pairs += [F.lit(s), F.lit(int(round(r * M)))]
    return F.coalesce(
        F.create_map(*pairs)[F.col(stratum_col)] if pairs else F.lit(None),
        F.lit(int(round(default_rate * M))),
    )


def stratified_mixture(df: DataFrame, rates: dict[str, float],
                       stratum_col: str = "source",
                       key_col: str = "doc_id",
                       default_rate: float = 0.0,
                       seed: int = SPARK_SEED) -> DataFrame:
    """Per-stratum deterministic sampling rates (domain mixture
    weighting). ``rates`` maps stratum value -> keep rate; strata not
    listed keep at ``default_rate``. The rate map folds into the plan
    as literals — one codegen'd filter, zero joins, zero shuffles."""
    thr = _threshold_col(rates, stratum_col, default_rate)
    return df.filter(_keep_expr(key_col, thr, seed))


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", seed: int = SPARK_SEED,
               split_col: str = "split") -> DataFrame:
    """Adds ``split_col`` assigning each row to a named split
    (train/val/test style) with probability proportional to
    ``weights``, deterministically by content key — the reproducible
    holdout construction (a re-ingested document lands in the SAME
    split forever, so eval rows can never leak into training between
    runs). Row-local: a when-chain over cumulative integer thresholds
    on ``pmod(xxhash64(key), 1e6)``; weights are normalized, the last
    split absorbs the rounding tail."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum > 0")
    names = list(weights)
    h = (F.xxhash64(F.col(key_col)) if seed == SPARK_SEED
         else F.xxhash64(F.col(key_col), F.lit(seed)))
    bucket = F.pmod(h, F.lit(M))
    expr = None
    acc = 0
    for name in names[:-1]:
        acc += int(round(weights[name] / total * M))
        cond = bucket < F.lit(acc)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def mixture_report(df: DataFrame, rates: dict[str, float],
                   stratum_col: str = "source", key_col: str = "doc_id",
                   default_rate: float = 0.0,
                   seed: int = SPARK_SEED) -> DataFrame:
    """Audit of a mixture plan before committing to it: per stratum,
    total rows, rows the mixture keeps, and the realized rate — the
    numbers a mixture decision is reviewed on. ONE scan and one
    map-side-combined shuffle: the keep decision rides as a conditional
    aggregate, not a second pass."""
    thr = _threshold_col(rates, stratum_col, default_rate)
    keep = _keep_expr(key_col, thr, seed)
    return (
        df.groupBy(stratum_col)
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            stratum_col, "n_total", "n_kept",
            F.round(F.col("n_kept") / F.col("n_total"), 6)
            .alias("realized_rate"),
        )
    )


def dsir_weights(docs: DataFrame, target: Column, id_col: str = "doc_id",
                 text_col: str = "text", alpha: float = 1.0) -> DataFrame:
    """Data-selection importance weights (DSIR — Xie et al., NeurIPS
    2023, "Data Selection for Language Models via Importance
    Resampling"), reduced to word-unigram language models: per
    document, the mean log importance ratio
    ``ln(p_target(w) / p_raw(w))`` over its tokens, with add-``alpha``
    smoothing over the shared vocabulary. ``target`` is a boolean
    Column over ``docs`` rows defining the in-domain subset (e.g.
    ``F.col("lang") == "en"``). Feeding the weights into
    :func:`deterministic_sample`-style thresholding reproduces the
    paper's resampling step.

    Returns ``(doc_id, n_terms, dsir_weight)`` for documents with at
    least one token, weight rounded to 6 dp.

    Scale shape:
    - vocabulary statistics are ONE aggregate keyed by term over the
      token stream (map-side combined) emitting
      ``(term, c_raw, c_target)`` — vocabulary-sized output;
    - corpus totals and vocabulary size fold into a one-row broadcast
      aggregate built from the vocabulary frame, never the corpus;
    - scoring joins the token stream to the vocabulary keyed by term:
      hot stopword keys are exactly AQE's skew-join case, and when the
      vocabulary fits the broadcast threshold Catalyst broadcasts it —
      both without driver involvement;
    - the per-doc reduce is one groupBy ``doc_id``. No Python anywhere.
    """
    from ..functions.vectors import word_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target.cast("long").alias("is_t"),
        F.explode(word_tokens(text_col)).alias("term"),
    )
    vocab = toks.groupBy("term").agg(
        F.count("*").alias("c_raw"), F.sum("is_t").alias("c_t"))
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_t").alias("n_t"),
        F.count("*").alias("v"))
    a = F.lit(float(alpha))
    log_ratio = (
        F.log((F.col("c_t") + a) / (F.col("n_t") + a * F.col("v")))
        - F.log((F.col("c_raw") + a) / (F.col("n_raw") + a * F.col("v")))
    )
    return (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"),
             F.round(F.avg(log_ratio), 6).alias("dsir_weight"))
    )
