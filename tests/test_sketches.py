# -*- coding: utf-8 -*-
"""Sketches: KMV distinct-count and Count-Min frequency.

The cross-engine contract (Spark result == DuckDB oracle replay) is
checked by the driver; these tests pin the hash primitive, the
estimator's accuracy, the two-phase smallest-k equivalence, and CMS's
one-sided error — including an exact pure-Python (hashlib) twin of the
whole CMS grid."""
from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.sketches import (
    HASH_SPACE, build_count_min, cms_estimate, cms_merge,
    cms_token_frequencies, h52, kmv_distinct, kmv_distinct_tokens,
    kmv_estimate, kmv_merge, kmv_sketch)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from knowledge_graph_spark.session import get_spark

    yield get_spark(app="sketch-tests", master="local[4]",
                    shuffle_partitions=4)


def _py_h52(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:13], 16)


def test_h52_matches_python_twin(spark):
    # the same value DuckDB computes for
    # CAST(concat('0x', substring(md5('hello'),1,13)) AS BIGINT)
    assert _py_h52("hello") == 1640557292799154
    vals = ["hello", "", "世界", "a" * 100, "0:tok"]
    got = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", h52("s").alias("h")).collect()
    )
    for r in got:
        assert r["h"] == _py_h52(r["s"])


def test_kmv_small_range_is_exact(spark):
    # fewer distinct items than k -> the sketch is the exact answer
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {r["source"]: r for r in
           kmv_distinct_tokens(docs, group_cols=["source"], k=64).collect()}
    exact = {r["source"]: r["d"] for r in docs.select(
        "source",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("source").agg(F.countDistinct("t").alias("d")).collect()}
    assert set(got) == set(exact)
    for src, r in got.items():
        assert r["n_kept"] == exact[src]
        assert r["est_distinct"] == float(exact[src])


def test_kmv_estimator_accuracy(spark):
    # 5000 distinct items, k=256 -> relative error ~1/sqrt(k) (~6%);
    # assert a loose 3-sigma bound
    items = spark.range(5000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("v"))
    row = kmv_distinct(items, "v", k=256).collect()[0]
    assert row["n_kept"] == 256
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.20
    # the estimate really came from the estimator, not the exact path
    assert row["est_distinct"] == round(
        255.0 * HASH_SPACE / float(row["kth_min"]), 4)


def test_kmv_salting_invariant(spark):
    # the salted two-phase smallest-k must equal the one-bucket plan
    items = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("x"), F.col("id")).alias("v"))
    a = sorted(map(tuple, kmv_distinct(
        items, "v", ["g"], k=128, salt_buckets=64).collect()))
    b = sorted(map(tuple, kmv_distinct(
        items, "v", ["g"], k=128, salt_buckets=1).collect()))
    assert a == b


def test_kmv_merge_equals_union_sketch(spark):
    # sketch per part + merge == sketch of the union (overlapping
    # parts on purpose — merge must dedup, not just concatenate)
    a = spark.range(0, 1500).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    b = spark.range(1000, 3000).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    merged = kmv_estimate(kmv_merge(
        [kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128)],
        k=128), k=128)
    direct = kmv_distinct(a.unionByName(b), "v", k=128)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_cms_merge_equals_union_sketch(spark):
    a = spark.createDataFrame(
        [(t,) for t in ["x"] * 5 + ["y"] * 2], ["token"])
    b = spark.createDataFrame(
        [(t,) for t in ["x"] * 3 + ["z"] * 4], ["token"])
    merged = cms_merge([build_count_min(a, "token", 4, 32),
                        build_count_min(b, "token", 4, 32)])
    direct = build_count_min(a.unionByName(b), "token", 4, 32)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def _py_cms(stream, depth, width):
    grid = {}
    for t in stream:
        for i in range(depth):
            key = (i, _py_h52(f"{i}:{t}") % width)
            grid[key] = grid.get(key, 0) + 1
    return grid


def test_cms_matches_python_twin(spark):
    stream = (["apple"] * 7 + ["pear"] * 3 + ["plum"] * 11
              + [f"w{i}" for i in range(40)])
    depth, width = 4, 32  # narrow grid so collisions actually happen
    grid = _py_cms(stream, depth, width)
    items = spark.createDataFrame([(t,) for t in stream], ["token"])
    sketch = {(r["row"], r["col"]): r["cnt"] for r in
              build_count_min(items, "token", depth, width).collect()}
    assert sketch == grid
    probes = spark.createDataFrame(
        [("apple",), ("pear",), ("plum",), ("absent",)], ["token"])
    est = {r["token"]: r["est_count"] for r in cms_estimate(
        spark.createDataFrame(
            [(k[0], k[1], v) for k, v in grid.items()],
            ["row", "col", "cnt"]),
        probes, "token", depth, width).collect()}
    expect = {t: min(grid.get((i, _py_h52(f"{i}:{t}") % width), 0)
                     for i in range(depth))
              for t in ["apple", "pear", "plum", "absent"]}
    assert est == expect
    # one-sided error: never under the true count
    truth = {"apple": 7, "pear": 3, "plum": 11, "absent": 0}
    for t, e in est.items():
        assert e >= truth[t]


def test_cms_token_frequencies_one_sided(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    probe = docs.filter(F.col("doc_id") < 2)
    rows = cms_token_frequencies(docs, probe, depth=4, width=256).collect()
    assert rows
    for r in rows:
        assert r["est_count"] >= r["exact_count"] > 0


def test_sketch_plans_stay_jvm_side(spark):
    # no Python evaluation anywhere in either sketch's plan
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (
        kmv_distinct_tokens(docs, group_cols=["source"], k=64),
        cms_token_frequencies(docs, docs.filter(F.col("doc_id") < 2)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
