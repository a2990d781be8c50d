# -*- coding: utf-8 -*-
"""Label aggregation for training-data curation: Dawid-Skene EM.

When a corpus is annotated by several noisy raters (crowd workers,
weak-supervision heuristics, LLM judges), majority vote ignores that
raters differ in reliability. Dawid & Skene (JRSS-C 1979) fit a latent
true label per item and a confusion profile per rater with EM; the
posterior-weighted vote is the standard label-cleaning step in
RLHF/annotation pipelines (and the Snorkel label-model ancestor).

Binary-label formulation here: rater ``w`` has sensitivity
``alpha_w = P(vote=1 | true=1)`` and specificity
``beta_w = P(vote=0 | true=0)``; prior ``p = P(true=1)``.

Cross-engine determinism discipline: every EM quantity is ROUNDED TO
9 DECIMALS after each update, in the engine and in the SQL oracle
alike, so float divergence (sum order, ln/exp last-ulp) is re-synced
to a shared lattice every step instead of compounding across
iterations. Driver-facing projections use integers / 6-dp values on
top of that (the repo-wide hash convention).

Scale shape per iteration: one broadcast-joined pass over the votes
(rows are (item, worker, int) plus two doubles), one aggregate keyed
by worker (bounded by the rater pool) and one keyed by item; the item
posterior frame is localCheckpoint-ed so the plan stays flat across
the fixed iteration count. No per-item driver work, no collect of
anything unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LO = 1e-6


def _clamp9(col):
    """round-to-9dp then clamp to (0, 1) open interval — the shared
    re-sync lattice (see module docstring)."""
    return F.least(F.greatest(F.round(col, 9), F.lit(_LO)),
                   F.lit(1.0 - _LO))


def _mstep(vq):
    """Per-worker M-step: alpha/beta from posterior-weighted votes.
    One helper for the in-loop update AND the final reporting pass so
    they can never drift. Denominators are floored at ``_LO``: the
    E-step rounds q to 9 dp WITHOUT clamping, so a worker whose rated
    items all sit at q == 0 (or 1 — e.g. unanimous votes) would
    otherwise divide by zero, which ANSI Spark raises as a job-killing
    error; the floor leaves every non-degenerate result bit-identical
    (denominators are otherwise >= _LO by construction)."""
    return (vq.groupBy("worker").agg(
        F.sum(F.col("q") * F.col("y")).alias("_a_num"),
        F.sum("q").alias("_a_den"),
        F.sum((1.0 - F.col("q")) * (1 - F.col("y"))).alias("_b_num"),
        F.sum(1.0 - F.col("q")).alias("_b_den"))
        .select("worker",
                _clamp9(F.col("_a_num")
                        / F.greatest(F.col("_a_den"), F.lit(_LO)))
                .alias("alpha"),
                _clamp9(F.col("_b_num")
                        / F.greatest(F.col("_b_den"), F.lit(_LO)))
                .alias("beta")))


def dawid_skene(votes: DataFrame, item_col: str = "item",
                worker_col: str = "worker", label_col: str = "label",
                iterations: int = 10) -> tuple:
    """Dawid-Skene EM over binary rater votes.

    ``votes``: one row per (item, worker) with ``label`` in {0, 1}.

    Returns ``(items, workers)``:

    - ``items``: ``(item, n_votes, n_pos, q, label_hat)`` — vote
      counts (exact BIGINTs), the 9-dp posterior ``P(true=1)``, and
      the hard label ``q > 0.5`` as BIGINT;
    - ``workers``: ``(worker, n_votes, alpha, beta)`` — per-rater
      vote count and the fitted 9-dp sensitivity/specificity.
    """
    v = (votes.select(F.col(item_col).alias("item"),
                      F.col(worker_col).alias("worker"),
                      F.col(label_col).cast("int").alias("y"))
         # a NULL vote would be skipped by the aggregates but hit the
         # otherwise() branch of the E-step CASE — drop it outright
         .filter(F.col("y").isNotNull() & F.col("item").isNotNull()
                 & F.col("worker").isNotNull())
         .persist())
    q = (v.groupBy("item")
         .agg(F.round(F.avg("y"), 9).alias("q"))
         .localCheckpoint(eager=True))
    n_items = q.count()
    if n_items == 0:
        raise ValueError("dawid_skene: no votes")
    for _ in range(int(iterations)):
        par = _mstep(v.join(q, "item"))
        pr = q.agg(_clamp9(F.sum("q") / F.lit(float(n_items)))
                   .alias("p"))
        # z = logit(p) + sum over votes of ln(f1) - ln(f0)
        terms = (v.join(F.broadcast(par), "worker")
                 .select("item",
                         (F.when(F.col("y") == 1, F.log(F.col("alpha")))
                          .otherwise(F.log(1.0 - F.col("alpha")))
                          - F.when(F.col("y") == 1,
                                   F.log(1.0 - F.col("beta")))
                          .otherwise(F.log(F.col("beta"))))
                         .alias("_t")))
        q = (terms.groupBy("item")
             .agg(F.sum("_t").alias("_s"))
             .crossJoin(F.broadcast(pr))
             .select("item",
                     F.round(F.col("_s") + F.log(F.col("p"))
                             - F.log(1.0 - F.col("p")), 9).alias("_z"))
             .select("item",
                     F.round(1.0 / (1.0 + F.exp(-F.col("_z"))), 9)
                     .alias("q"))
             .localCheckpoint(eager=True))
    counts = v.groupBy("item").agg(
        F.count("*").cast("long").alias("n_votes"),
        F.sum("y").cast("long").alias("n_pos"))
    items = (counts.join(q, "item")
             .select("item", "n_votes", "n_pos", "q",
                     (F.col("q") > 0.5).cast("long").alias("label_hat")))
    wcounts = v.groupBy("worker").agg(
        F.count("*").cast("long").alias("n_votes"))
    # final M-step params from the final posteriors, for reporting —
    # the SAME helper as the in-loop update, so they cannot drift
    workers = wcounts.join(_mstep(v.join(q, "item")), "worker")
    items = items.localCheckpoint(eager=True)
    workers = workers.localCheckpoint(eager=True)
    v.unpersist()
    return items, workers
