# -*- coding: utf-8 -*-
"""Sequence-packing operator: greedy semantics, determinism under
repartitioning, oversized docs, and the fill-ratio report."""
from __future__ import annotations

import pytest

from knowledge_graph_spark.operators.packing import (pack_sequences,
                                                     packing_report)


@pytest.fixture(scope="module")
def spark():
    from knowledge_graph_spark.session import get_spark

    s = get_spark(app="pack-tests", master="local[4]", shuffle_partitions=4)
    yield s


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_greedy_packing_semantics(spark):
    # one shard (n_shards=1); capacities force: [a(3), b(3)] | [c(5)] | [d(2)]
    rows = [(0, "x y z"), (1, "a b c"), (2, "p q r s t"), (3, "u v")]
    out = {r["doc_id"]: r for r in
           pack_sequences(_docs(spark, rows), capacity=6,
                          n_shards=1).collect()}
    assert (out[0]["seq_id"], out[0]["pos"]) == (0, 0)
    assert (out[1]["seq_id"], out[1]["pos"]) == (0, 1)
    assert (out[2]["seq_id"], out[2]["pos"]) == (1, 0)
    assert (out[3]["seq_id"], out[3]["pos"]) == (2, 0)
    assert out[2]["n_tokens"] == 5


def test_oversized_doc_gets_own_sequence(spark):
    rows = [(0, "a b c d e f g h"), (1, "x y")]  # 8 > capacity 4
    out = {r["doc_id"]: r for r in
           pack_sequences(_docs(spark, rows), capacity=4,
                          n_shards=1).collect()}
    assert (out[0]["seq_id"], out[0]["pos"]) == (0, 0)
    assert (out[1]["seq_id"], out[1]["pos"]) == (1, 0)


def test_packing_deterministic_under_repartition(spark):
    rows = [(i, "w " * (1 + i % 7)) for i in range(60)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, pack_sequences(docs, 16, n_shards=4).collect()))
    b = sorted(map(tuple,
                   pack_sequences(docs.repartition(7), 16,
                                  n_shards=4).collect()))
    assert a == b
    # shard is a pure function of id
    assert all(t[1] == t[0] % 4 for t in a)


def test_packing_report_fill(spark):
    rows = [(0, "a b c"), (1, "d e f"), (2, "g h")]  # packs to [3+3] [2]
    packed = pack_sequences(_docs(spark, rows), capacity=6, n_shards=1)
    rep = packing_report(packed, capacity=6).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_seqs"] == 2 and r["n_docs"] == 3
    # fills: 6/6 and 2/6 -> mean 0.666667
    assert abs(r["avg_fill"] - (1.0 + 2 / 6) / 2) < 1e-6


def test_packing_projects_before_shuffle(spark):
    # document bodies must not survive past the scan: the exchange
    # carries only (doc_id, shard, n_tokens)
    rows = [(i, "some text here") for i in range(10)]
    plan = (pack_sequences(_docs(spark, rows), 16, n_shards=2)
            ._jdf.queryExecution().executedPlan().toString())
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_null_text_packs_as_zero_tokens(spark):
    rows = [(0, "a b c"), (1, None), (2, "d e")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, capacity=4, n_shards=1).collect()}
    assert out[1]["n_tokens"] == 0
    # zero-length doc rides along in whichever sequence is open
    assert out[1]["seq_id"] == out[0]["seq_id"]


def test_pack_sequences_rejects_non_integral_ids(spark):
    """A string id would cast('long') to NULL and silently collapse
    every row into one NULL shard — the operator must refuse instead."""
    docs = spark.createDataFrame(
        [("doc_1", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integral"):
        pack_sequences(docs, capacity=4)
