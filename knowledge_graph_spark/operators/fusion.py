# -*- coding: utf-8 -*-
"""Knowledge fusion: multi-source triple conflict resolution.

A web-scale KG is built from MANY extractors over MANY pages, and
they disagree: one source says (acme, hq_city, oslo), another says
(acme, hq_city, bergen). The fusion stage (Dong et al., KDD 2014,
"Knowledge Vault"; the truth-discovery line of Yin et al. 2007)
resolves each FUNCTIONAL (single-valued) predicate to one object per
subject by weighing supporting sources, and keeps the losing
assertions as audit rows rather than silently deleting them.

This implements the deterministic core: support-weighted voting with
integer confidences. Source-reliability iteration (TruthFinder-style
EM) is deliberately out of scope — one voting pass is what Knowledge
Vault ships as its baseline fuser, and iteration composes on top by
re-weighting ``confidence`` between passes.

Not in the reference (single extractor, no conflicts); semantics from
the cited public papers.

Scale shape: two hash aggregations — ``(subj, pred, obj)`` support
with map-side combine, then an in-aggregate argmax over the
object candidates of each ``(subj, pred)`` — both exchanging
``(keys, long)`` rows only. No window, no join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuse_triples(assertions: DataFrame,
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj", source_col: str = "source_id",
                 confidence_col: str | None = None) -> DataFrame:
    """Resolve each ``(subj, pred)`` to its best-supported object.

    Votes are INTEGER confidences (e.g. extractor score × 100); when
    ``confidence_col`` is None every assertion votes 1. The same
    source asserting the same object twice votes once with its MAX
    confidence (dedup-before-vote, so a crawler that fetched a page
    twice gains no weight). The winner is the object with the highest
    total vote; ties break to the lexicographically smallest object
    (declared, replayable).

    Returns one row per ``(subj, pred)``:

    - ``obj``           — the winning object
    - ``support``       — its total vote
    - ``n_sources``     — distinct sources behind the winner
    - ``n_objects``     — how many distinct objects competed
    - ``support_total`` — votes across ALL candidates (the winner's
      share ``support/support_total`` is the fusion confidence —
      counts exposed, the caller divides)
    """
    conf = (F.col(confidence_col).cast("long") if confidence_col
            else F.lit(1).cast("long"))
    votes = (
        assertions.select(
            F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
            F.col(source_col).alias("source_id"), conf.alias("_c"))
        .filter(F.col("subj").isNotNull() & F.col("pred").isNotNull()
                & F.col("obj").isNotNull())
        .groupBy("subj", "pred", "obj", "source_id")
        .agg(F.max("_c").alias("_c"))
    )
    candidates = votes.groupBy("subj", "pred", "obj").agg(
        F.sum("_c").cast("long").alias("support"),
        F.countDistinct("source_id").cast("long").alias("n_sources"),
    )
    # in-aggregate argmax: min(struct(-support, obj, ...)) is
    # (support desc, obj asc) — the full candidate row rides inside
    return (
        candidates.groupBy("subj", "pred").agg(
            F.min(F.struct(
                (-F.col("support")).alias("neg"), F.col("obj"),
                F.col("support"), F.col("n_sources"))).alias("_w"),
            F.count("*").cast("long").alias("n_objects"),
            F.sum("support").cast("long").alias("support_total"),
        )
        .select(
            "subj", "pred", F.col("_w.obj").alias("obj"),
            F.col("_w.support").alias("support"),
            F.col("_w.n_sources").alias("n_sources"),
            "n_objects", "support_total",
        )
    )
