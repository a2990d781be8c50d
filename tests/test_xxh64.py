# -*- coding: utf-8 -*-
"""The pure-Python xxhash64 twin must equal Spark's xxhash64 bit-for-bit
on every type path (int/long/string/bytes) and on chained multi-column
hashes — it is the independent implementation behind the hash-sketch
oracles (tests/golden_tables, tools/make_goldens.py)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from knowledge_graph_spark.functions.xxh64 import spark_xxhash64


def test_twin_matches_spark_all_paths(spark):
    rows = [("", 0, 0), ("a", 1, -1), ("hello world", 7, 123456789012345),
            ("深度智云", -5, 2 ** 40), ("x" * 31, 2 ** 31 - 1, -(2 ** 62)),
            ("y" * 32, -(2 ** 31), 9223372036854775807),
            ("z" * 100, 42, 42), ("华星科技公司 int'l", 0, 0)]
    df = spark.createDataFrame(rows, "s string, i int, l long")
    got = df.select(
        F.xxhash64("s").alias("hs"), F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"), F.xxhash64("s", "i").alias("hsi"),
        F.xxhash64("i", "l", "s").alias("hils"),
        F.xxhash64("l", "l").alias("hll"),
    ).collect()
    for (s, i, l), r in zip(rows, got):
        assert r["hs"] == spark_xxhash64(s)
        assert r["hi"] == spark_xxhash64(i)
        assert r["hl"] == spark_xxhash64(("long", l))
        assert r["hsi"] == spark_xxhash64(s, i)
        assert r["hils"] == spark_xxhash64(i, ("long", l), s)
        assert r["hll"] == spark_xxhash64(("long", l), ("long", l))


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_twin_total_on_arbitrary_text(s):
    # total function, 64-bit signed output
    v = spark_xxhash64(s)
    assert -(2 ** 63) <= v < 2 ** 63
