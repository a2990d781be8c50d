# -*- coding: utf-8 -*-
"""KG → training-data export: dense ids and negative sampling.

The reference stops at serving its graph to a frontend
(kg_writer.py:82-131); a corpus-scale engine also has to hand the
graph to model training. The standard interchange for KG-embedding
training (TransE, Bordes et al. 2013, and successors) is
``(head_id, relation_id, tail_id)`` triples over dense contiguous ids
plus K corrupted negatives per positive. Both steps are deterministic
here — the same corpus yields byte-identical training files on any
cluster size, the same reproducibility contract as
:mod:`.sampling`.

Scale shape:
- dense-id assignment is the distributed pattern: content-keyed
  bucketing (``pmod(xxhash64(v), B)``) → per-bucket rank (a window
  whose partitions are 1/B of the vocabulary — never a global sort) →
  bucket offsets from a B-row running sum. Cluster-size independent,
  unlike ``zipWithIndex``/``repartitionByRange`` ids, which change
  with input splits.
- id attachment joins are keyed by entity id; hub entities are AQE's
  skew-join case, and the relation vocabulary joins broadcast.
- negatives are pure row-local hashing — no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dense_ids(values: DataFrame, col: str = "v",
              buckets: int = 1024) -> DataFrame:
    """Deterministic dense ids ``[0, N)`` for the distinct values of
    ``values[col]``, ordered by (bucket, value). Returns
    ``(col, id)``.

    The per-bucket window sees ~1/``buckets`` of the vocabulary (raise
    ``buckets`` for larger vocabularies); the offset window runs over
    at most ``buckets`` rows — metadata-scale regardless of corpus
    size."""
    b = (
        values.select(col).distinct()
        .withColumn("_b", F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)))
    )
    ranked = b.withColumn(
        "_r", F.row_number().over(
            Window.partitionBy("_b").orderBy(col)) - 1)
    offs = (
        b.groupBy("_b").agg(F.count("*").alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("_b", "_off")
    )
    return (
        ranked.join(F.broadcast(offs), "_b")
        .select(col, (F.col("_off") + F.col("_r")).cast("long").alias("id"))
    )


def training_triples(edges: DataFrame, negatives: int = 2,
                     src: str = "src", dst: str = "dst",
                     rel: str = "rel_type",
                     buckets: int = 1024) -> DataFrame:
    """TransE-style training export over the distinct edge set:
    ``(h_id, r_id, t_id, k, neg_t_id)`` — one row per positive triple
    per negative index ``k`` in ``[0, negatives)``.

    The corrupted tail is ``pmod(xxhash64(src, dst, rel, k), N)``
    (bumped by one, mod N, when it collides with the true tail) —
    deterministic, uniform over the entity vocabulary, and row-local.
    Ids come from :func:`dense_ids` over endpoints (entities) and
    relation types. ``negatives`` must be >= 1: Spark's
    ``sequence(0, negatives - 1)`` steps DOWNWARD when the end is
    below the start, so 0 would silently emit bogus k = 0 and k = -1
    rows instead of none."""
    if negatives < 1:
        raise ValueError(
            f"negatives={negatives}: need >= 1 corruption per triple "
            "(to export positives only, project the distinct edge set "
            "through dense_ids directly)")
    e = edges.select(F.col(src).alias("_h"), F.col(dst).alias("_t"),
                     F.col(rel).alias("_r")).distinct()
    ents = dense_ids(
        e.select(F.col("_h").alias("v"))
        .unionByName(e.select(F.col("_t").alias("v"))),
        buckets=buckets,
    )
    rels = dense_ids(e.select(F.col("_r").alias("v")), buckets=buckets)
    n_ents = ents.agg(F.count("*").alias("_n_ents"))

    withids = (
        e.join(ents.select(F.col("v").alias("_h"),
                           F.col("id").alias("h_id")), "_h")
        .join(ents.select(F.col("v").alias("_t"),
                          F.col("id").alias("t_id")), "_t")
        .join(F.broadcast(rels.select(F.col("v").alias("_r"),
                                      F.col("id").alias("r_id"))), "_r")
        .crossJoin(F.broadcast(n_ents))
    )
    raw_neg = F.pmod(
        F.xxhash64(F.col("_h"), F.col("_t"), F.col("_r"), F.col("k")),
        F.col("_n_ents"),
    )
    neg = F.when(raw_neg == F.col("t_id"),
                 F.pmod(raw_neg + 1, F.col("_n_ents"))).otherwise(raw_neg)
    return (
        withids.select(
            "h_id", "r_id", "t_id", "_h", "_t", "_r", "_n_ents",
            F.explode(F.sequence(F.lit(0), F.lit(negatives - 1))).alias("k"),
        )
        .select("h_id", "r_id", "t_id", F.col("k").cast("long").alias("k"),
                neg.cast("long").alias("neg_t_id"))
    )
