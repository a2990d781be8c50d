# -*- coding: utf-8 -*-
"""LakeTable: snapshot/merge/delete semantics + idempotent resume."""

from __future__ import annotations

import pytest

from knowledge_graph_spark.sources.lake import LakeTable


@pytest.fixture()
def tbl(tmp_path):
    return LakeTable(str(tmp_path), "t")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_overwrite_and_read(spark, tbl):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    tbl.overwrite(df)
    assert rows(tbl.read(spark)) == [(1, "a"), (2, "b")]


def test_merge_update_semantics(spark, tbl):
    tbl.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    tbl.merge_into(
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), on=["k"]
    )
    assert rows(tbl.read(spark)) == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_ignore_semantics(spark, tbl):
    """ON CREATE only — matched rows keep their values (reference edge
    semantics, kg_writer.py:56-57)."""
    tbl.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    tbl.merge_into(
        spark.createDataFrame([(1, "X"), (2, "b")], "k int, v string"),
        on=["k"], when_matched="ignore",
    )
    assert rows(tbl.read(spark)) == [(1, "a"), (2, "b")]


def test_merge_idempotent_by_batch_id(spark, tbl):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    tbl.merge_into(df, on=["k"], batch_id="b1")
    r = tbl.merge_into(df, on=["k"], batch_id="b1")
    assert r.get("skipped")
    assert len(tbl.history()) == 1


def test_merge_reapply_same_batch_same_state(spark, tbl):
    """MERGE is a set operation: re-applying the same rows (new batch id)
    yields an identical table."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    tbl.merge_into(df, on=["k"], batch_id="b1")
    before = rows(tbl.read(spark))
    tbl.merge_into(df, on=["k"], batch_id="b2")
    assert rows(tbl.read(spark)) == before


def test_delete_where(spark, tbl):
    tbl.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    tbl.delete_where(spark, "k = 1")
    assert rows(tbl.read(spark)) == [(2, "b")]


def test_lineage_and_counters(spark, tbl):
    tbl.overwrite(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        counters={"stage": "unit"},
    )
    h = tbl.history()
    assert h[-1]["rows"] == 1
    assert h[-1]["counters"] == {"stage": "unit"}
    assert h[-1]["parent"] is None


def test_merge_commutative_on_disjoint_batches(spark, tmp_path):
    """SURVEY §5.2(4): applying disjoint batches in either order yields
    the identical table (insert-only merges commute)."""
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b = spark.createDataFrame([(3, "c"), (4, "d")], "k int, v string")
    t1 = LakeTable(str(tmp_path), "ab")
    t1.merge_into(a, on=["k"]); t1.merge_into(b, on=["k"])
    t2 = LakeTable(str(tmp_path), "ba")
    t2.merge_into(b, on=["k"]); t2.merge_into(a, on=["k"])
    assert rows(t1.read(spark)) == rows(t2.read(spark))


def test_vacuum_keeps_current(spark, tbl):
    for i in range(4):
        tbl.overwrite(spark.createDataFrame([(i, "x")], "k int, v string"))
    removed = tbl.vacuum(keep_last=1)
    assert removed
    assert rows(tbl.read(spark)) == [(3, "x")]
