# -*- coding: utf-8 -*-
"""Distributed document classification: multinomial Naive Bayes.

The classifier-based filtering stage of a web-scale corpus pipeline
(GPT-3 trained a quality classifier against WebText; CCNet/fastText is
the standard open implementation): train a bag-of-words model on a
labeled slice, score every document, keep / route by predicted class.
Multinomial NB (McCallum & Nigam 1998) is the strongest model whose
training AND inference are both pure DataFrame aggregates — no SGD
state, no Python in any hot path, and an exact SQL oracle can replay
every probability.

Scale shape:

- training is ONE corpus pass: a (label, word) count aggregate with
  map-side combine (exchange volume bounded by vocabulary × labels,
  never corpus tokens); priors / label token totals / vocabulary size
  all derive from that one aggregate;
- the model is densified to a (word × label) log-likelihood grid —
  labels are few (routing classes), so the grid is O(vocabulary) and
  broadcastable; unseen-word mass is a per-label constant folded in as
  a one-row-per-label broadcast;
- inference explodes score docs to (doc, word, count), joins the
  broadcast grid, and arg-maxes per document with ``min(struct)``
  (deterministic tie-break: smallest label) — one shuffle keyed by
  doc id carrying (id, label, double) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import word_tokens


def nb_train_score(train: DataFrame, score: DataFrame,
                   label_col: str = "label", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Train add-one-smoothed multinomial NB on ``train`` and classify
    every row of ``score``. Returns ``(id_col, predicted, log_score)``:
    the argmax label and its unnormalized log posterior
    ``ln P(label) + Σ_w c(w) · ln P(w|label)``, where
    ``P(w|label) = (c(w,label) + 1) / (tokens(label) + V)`` and V is
    the training vocabulary size + 1 (unseen words share one smoothed
    bucket). Ties break to the smallest label. Documents with no
    tokens are classified by priors alone."""
    # unlabeled rows train nothing: a NULL label would keep its
    # prior (groupBy groups NULLs) but lose its token mass to the
    # NULL-never-matches equi-joins, competing with the minimum
    # denominator and winning every all-unseen-words document
    train = train.filter(F.col(label_col).isNotNull())
    tr = (
        train.select(F.col(label_col).alias("label"),
                     F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("label", "word").agg(F.count("*").alias("c"))
        # reused four times (totals, vocab, grid, unseen mass);
        # GC-reclaimed checkpoint, not persist (linking.py pattern)
        .localCheckpoint(eager=True)
    )
    label_tot = tr.groupBy("label").agg(F.sum("c").alias("tok"))
    vocab = tr.select("word").distinct()
    vsize = vocab.agg((F.count("*") + F.lit(1)).alias("_v"))
    priors = (
        train.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("n_docs"))
        # constant non-foldable key: the total over the per-LABEL
        # frame is single-partition by design (≤ |labels| rows), but
        # an empty spec would fire the WindowExec warning reserved
        # for real unbounded-window regressions
        .withColumn("_tot", F.sum("n_docs").over(
            Window.partitionBy(F.pmod(F.col("n_docs"), F.lit(1)))))
    )
    # per-label constants: log prior and the unseen-word log mass.
    # LEFT join + coalesce: a label whose training docs contain zero
    # tokens has no (label, word) row, but must still compete at
    # P(w|label) = 1/(0 + V) — an inner join would silently make it
    # unpredictable and break the priors' sum-to-1
    consts = (
        priors.join(label_tot, "label", "left")
        .withColumn("tok", F.coalesce(F.col("tok"), F.lit(0)))
        .crossJoin(F.broadcast(vsize))
        .select(
            "label",
            F.log(F.col("n_docs") / F.col("_tot")).alias("log_prior"),
            (-F.log(F.col("tok") + F.col("_v"))).alias("log_unseen"),
            (F.col("tok") + F.col("_v")).alias("_denom"),
        )
    )
    # the per-label constants fold into ONE literal struct array: a
    # bounded driver action (labels are routing classes — ≤ dozens by
    # construction, the bpe-vocab collect convention), replacing a
    # per-reference broadcast-join fan (the r4 plan carried 26
    # broadcast joins re-deriving this ≤|labels|-row frame) with
    # exploded literals that cost zero exchanges. IEEE754 doubles
    # round-trip the driver exactly, so probabilities are unchanged.
    const_rows = sorted(consts.collect(), key=lambda r: str(r["label"]))
    if not const_rows:  # empty training set: nothing can be predicted
        ltype = train.schema[label_col].dataType.simpleString()
        return (score.select(F.col(id_col)).limit(0)
                .withColumn("predicted", F.lit(None).cast(ltype))
                .withColumn("log_score", F.lit(None).cast("double")))
    lab_structs = F.array(*[
        F.struct(F.lit(r["label"]).alias("label"),
                 F.lit(float(r["_denom"])).alias("_denom"),
                 F.lit(float(r["log_prior"])).alias("log_prior"),
                 F.lit(float(r["log_unseen"])).alias("log_unseen"))
        for r in const_rows])
    # dense (word x label) grid: every vocabulary word gets a row per
    # label (missing counts smooth to +1), so inference needs no
    # per-label missing-word bookkeeping
    grid = (
        vocab.select("word", F.explode(lab_structs).alias("_l"))
        .select("word", F.col("_l.label").alias("label"),
                F.col("_l._denom").alias("_denom"))
        .join(tr, ["label", "word"], "left")
        .select("word", "label",
                F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
                      / F.col("_denom")).alias("log_p"))
    )

    toks = (
        score.select(F.col(id_col), F.explode(word_tokens(text_col))
                     .alias("word"))
        .groupBy(id_col, "word").agg(F.count("*").alias("n"))
    )
    # per (doc, label): known-word mass via the grid join; unseen mass
    # = (tokens not in vocab) * log_unseen, counted once per doc.
    # No broadcast HINT on the grid: it's vocabulary × labels — small
    # for routing models (AQE broadcasts it), but a forced broadcast
    # would OOM the driver on an open-vocabulary 100 TB corpus; the
    # word-keyed shuffle join is the correct fallback there (stopword
    # rows are AQE's skew case).
    known = (
        toks.join(grid, "word")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("n") * F.col("log_p")).alias("m_known"))
    )
    unseen_n = (
        toks.join(vocab, "word", "left_anti")
        .groupBy(id_col).agg(F.sum("n").alias("n_unseen"))
    )
    ids = score.select(id_col).distinct()
    scored = (
        ids.select(F.col(id_col), F.explode(lab_structs).alias("_l"))
        .select(F.col(id_col), F.col("_l.label").alias("label"),
                F.col("_l.log_prior").alias("log_prior"),
                F.col("_l.log_unseen").alias("log_unseen"))
        .join(known, [id_col, "label"], "left")
        .join(unseen_n, [id_col], "left")
        .select(
            F.col(id_col), "label",
            (F.col("log_prior")
             + F.coalesce(F.col("m_known"), F.lit(0.0))
             + F.coalesce(F.col("n_unseen"), F.lit(0))
             * F.col("log_unseen")).alias("s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct((-F.col("s")).alias("ns"),
                            F.col("label").alias("l"))).alias("m"))
        .select(F.col(id_col), F.col("m.l").alias("predicted"),
                (-F.col("m.ns")).alias("log_score"))
    )
