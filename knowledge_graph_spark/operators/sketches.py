# -*- coding: utf-8 -*-
"""Probabilistic sketches: KMV distinct-count and Count-Min frequency.

At 100 TB, "how many distinct tokens/urls/users per group" and "how
often does this term occur" are questions you cannot afford to answer
with a full-vocabulary shuffle. These operators answer them from
bounded-size summaries:

- **KMV (k-minimum-values)** — Bar-Yossef et al., "Counting distinct
  elements in a data stream" (RANDOM 2002): keep the k smallest hash
  values of the distinct items; the k-th smallest, as a fraction of
  the hash space, estimates density, so D ≈ (k-1) / kth_normalized.
  Relative error ~ 1/sqrt(k). The sketch is k longs per group, no
  matter how large the group.
- **Count-Min** — Cormode & Muthukrishnan, "An improved data stream
  summary: the count-min sketch" (J. Algorithms 2005): a depth x width
  counter grid; each item increments one counter per row (one hash per
  row); a frequency estimate is the MIN over the item's d counters —
  always >= truth, over by at most the collision mass. The sketch is
  depth*width longs, no matter the vocabulary.

Scale design: both sketches build as plain aggregations with map-side
combine — the full item stream never moves, only pre-aggregated
(group, hash) / (row, col) partials. The KMV smallest-k uses the same
salted two-phase pass as :func:`simsearch._per_query_topk`, so no
single reducer sees a group's full distinct-hash stream.

Determinism: the hash is the first 13 hex chars of md5 (52 bits — an
exact integer in a double, which is what lets DuckDB replay it with
float arithmetic where needed). Every estimate is therefore exactly
reproducible in ANSI SQL, so the driver oracle recomputes the full
sketch + estimate rather than trusting a golden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# the hash space: 13 hex chars = 52 bits
HASH_SPACE = float(1 << 52)

# salt fan-out of the two-phase smallest-k (see simsearch.TOPK_SALT_BUCKETS)
KMV_SALT_BUCKETS = 64


def h52(col) -> "F.Column":
    """52-bit deterministic hash of a string column: the first 13 hex
    chars of md5, as a bigint in [0, 2^52).

    md5-prefix rather than xxhash64 because the sketch must be
    REPLAYABLE by the SQL oracle: DuckDB has md5 but not xxhash64, and
    52 bits keeps the value exact even through double arithmetic.
    Cryptographic md5 costs more per byte than xxhash64, but both
    sketches hash each distinct item once — never the document bodies
    — so the hash is not the hot path."""
    return F.conv(F.substring(F.md5(F.col(col) if isinstance(col, str)
                                    else col), 1, 13), 16, 10).cast("long")


def _word_stream(docs: DataFrame, text_col: str, extra_cols: list) -> DataFrame:
    """(extra_cols..., token) — lower-cased alphabetic word stream.

    ``split(lower(text), '[^a-z]+')`` parses identically under Java
    regex and RE2, which is what keeps Spark and the DuckDB oracle
    token-for-token aligned."""
    tok = F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("token")
    return docs.select(*extra_cols, tok).filter(F.col("token") != "")


def _smallest_k(hashes: DataFrame, group_cols: list, k: int,
                salt_buckets: int) -> DataFrame:
    """Per-group k smallest distinct ``_h`` values, two-phase:
    row_number within (group, salt-of-hash) caps each of the
    ``salt_buckets`` reducers at k rows, then the global per-group
    pass ranks at most salt_buckets*k survivors. No reducer ever
    holds a group's full distinct-hash stream."""
    salt = F.pmod(F.col("_h"), F.lit(salt_buckets))
    w_local = Window.partitionBy(*group_cols, "_salt").orderBy("_h")
    kept = (
        hashes.withColumn("_salt", salt)
        .withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= k).drop("_salt", "_r")
    )
    w_global = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        kept.withColumn("_r", F.row_number().over(w_global))
        .filter(F.col("_r") <= k).drop("_r")
    )


def kmv_sketch(items: DataFrame, item_col: str,
               group_cols: list | None = None, k: int = 256,
               salt_buckets: int = KMV_SALT_BUCKETS) -> DataFrame:
    """The KMV sketch itself -> (group_cols..., _h): the k smallest
    distinct item hashes per group (at most k rows per group, however
    large the group). The first exchange carries distinct (group,
    hash) longs — never item payloads."""
    group_cols = list(group_cols or [])
    hashes = (
        items.select(*group_cols, h52(item_col).alias("_h"))
        .distinct()
    )
    return _smallest_k(hashes, group_cols, k, salt_buckets)


def kmv_merge(sketches: list, group_cols: list | None = None,
              k: int = 256,
              salt_buckets: int = KMV_SALT_BUCKETS) -> DataFrame:
    """Merge KMV sketches of disjoint-or-not item streams into the
    sketch of their UNION: k smallest of the distinct union of kept
    hashes. Exact, not approximate — k-min of a union is a function
    of the per-part k-mins — which is what lets a 1000-executor
    cluster sketch per shard/day and combine without re-reading raw
    data."""
    group_cols = list(group_cols or [])
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return _smallest_k(merged.distinct(), group_cols, k, salt_buckets)


def kmv_estimate(sketch: DataFrame, group_cols: list | None = None,
                 k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch ->
    (group_cols..., n_kept, kth_min, est_distinct).

    ``n_kept`` is the sketch fill (min(k, observed distinct hashes)),
    ``kth_min`` the largest kept hash. When the sketch is not full the
    estimate IS the exact distinct count (small-range correction);
    otherwise est = (k-1) * 2^52 / kth_min."""
    group_cols = list(group_cols or [])
    n = F.count("*")
    kth = F.max("_h")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / kth.cast("double"))
    return (
        sketch.groupBy(*group_cols)
        .agg(n.alias("n_kept"), kth.alias("kth_min"),
             F.round(est, 4).alias("est_distinct"))
    )


def kmv_distinct(items: DataFrame, item_col: str,
                 group_cols: list | None = None, k: int = 256,
                 salt_buckets: int = KMV_SALT_BUCKETS) -> DataFrame:
    """KMV distinct-count estimate per group, end to end ->
    (group_cols..., n_kept, kth_min, est_distinct). See
    :func:`kmv_sketch` / :func:`kmv_estimate`."""
    group_cols = list(group_cols or [])
    return kmv_estimate(
        kmv_sketch(items, item_col, group_cols, k, salt_buckets),
        group_cols, k)


def kmv_distinct_tokens(docs: DataFrame, text_col: str = "text",
                        group_cols: list | None = None,
                        k: int = 256) -> DataFrame:
    """KMV over the lower-cased word stream of a document table —
    the 'distinct vocabulary per source' census at sketch cost."""
    group_cols = list(group_cols or [])
    return kmv_distinct(_word_stream(docs, text_col, group_cols),
                        "token", group_cols, k)


def build_count_min(items: DataFrame, item_col: str, depth: int = 4,
                    width: int = 1024) -> DataFrame:
    """Count-Min sketch of an item stream -> (row, col, cnt), at most
    depth*width rows.

    Row ``i``'s hash is h52 of ``'<i>:' || item`` — d independent-ish
    hash functions from one primitive, the standard salting trick.
    Built as ONE aggregation: each item explodes to its depth (row,
    col) cells, then groupBy(row, col) counts with map-side combine —
    the exchange carries at most depth*width partials per map task,
    never the item stream."""
    cells = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(h52(F.concat(F.lit(f"{i}:"), F.col(item_col))),
                   F.lit(width)).alias("col"),
        ) for i in range(depth)
    ])).alias("cell")
    return (
        items.select(cells)
        .groupBy(F.col("cell.row").alias("row"),
                 F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(sketches: list) -> DataFrame:
    """Merge Count-Min sketches built with the SAME depth/width into
    the sketch of the concatenated streams: cell-wise counter sums.
    Exact by linearity of counting — the distributed contract that
    lets each shard/day keep its own depth x width grid."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Estimate each probe item's frequency from a Count-Min sketch ->
    (item_col, est_count).

    The probe set is small by construction (you query terms you care
    about), so probes explode to their depth cells and join the
    BROADCAST sketch (<= depth*width rows); est = min over the d
    counters, 0 if an item's cell is absent (item never seen)."""
    cells = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(h52(F.concat(F.lit(f"{i}:"), F.col(item_col))),
                   F.lit(width)).alias("col"),
        ) for i in range(depth)
    ])).alias("cell")
    probe_cells = probes.select(item_col, cells).select(
        item_col, F.col("cell.row").alias("row"),
        F.col("cell.col").alias("col"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def cms_token_frequencies(docs: DataFrame, probe_docs: DataFrame,
                          text_col: str = "text", depth: int = 4,
                          width: int = 1024) -> DataFrame:
    """End-to-end CMS demo over a document table ->
    (token, est_count, exact_count), one row per distinct token of
    ``probe_docs``.

    est_count >= exact_count always (CMS one-sided error); the exact
    column exists so callers (and tests) can see the collision mass.
    At 100 TB you would keep only the sketch; the exact join here is
    the verification harness, not the scale path."""
    stream = _word_stream(docs, text_col, [])
    sketch = build_count_min(stream, "token", depth, width)
    probes = _word_stream(probe_docs, text_col, []).distinct()
    est = cms_estimate(sketch, probes, "token", depth, width)
    exact = stream.groupBy("token").agg(F.count("*").alias("exact_count"))
    return est.join(exact, "token", "left").select(
        "token", "est_count", F.coalesce("exact_count", F.lit(0)).alias("exact_count"))
