# -*- coding: utf-8 -*-
"""Cross-KB entity alignment (PARIS-style shared evidence) and
point-in-time KB snapshots — hand-computed twins."""

import datetime

import pytest

from knowledge_graph_spark.operators.linking import align_entities
from knowledge_graph_spark.operators.temporal import snapshot_at


@pytest.fixture(scope="module")
def kbs(spark):
    a = spark.createDataFrame(
        [("a1", "p", "o1"), ("a1", "q", "o2"), ("a1", "r", "o3"),
         ("a2", "p", "o1"),
         # duplicate + NULL rows collapse/drop
         ("a1", "p", "o1"), (None, "p", "o1")],
        "subj string, pred string, obj string")
    b = spark.createDataFrame(
        [("b1", "p", "o1"), ("b1", "q", "o2"), ("b2", "q", "o9")],
        "subj string, pred string, obj string")
    return a, b


def test_align_entities_shared_evidence(kbs):
    a, b = kbs
    out = {(r.subj_a, r.subj_b): r
           for r in align_entities(a, b, min_shared=2).collect()}
    assert set(out) == {("a1", "b1")}
    r = out[("a1", "b1")]
    assert (r.n_shared, r.n_facts_a, r.n_facts_b) == (2, 3, 2)


def test_align_entities_min_shared_one_includes_weak_pairs(kbs):
    a, b = kbs
    out = {(r.subj_a, r.subj_b): r.n_shared
           for r in align_entities(a, b, min_shared=1).collect()}
    assert out == {("a1", "b1"): 2, ("a2", "b1"): 1}


def test_align_entities_stop_fact_guard_keeps_denominators(kbs):
    a, b = kbs
    # (p, o1) carried by a1 AND a2 on side A -> dropped at cap 1;
    # alignment survives only through (q, o2), but n_facts_a stays 3
    out = {(r.subj_a, r.subj_b): r
           for r in align_entities(a, b, min_shared=1,
                                   max_po_degree=1).collect()}
    assert set(out) == {("a1", "b1")}
    r = out[("a1", "b1")]
    assert (r.n_shared, r.n_facts_a, r.n_facts_b) == (1, 3, 2)


@pytest.fixture(scope="module")
def intervals(spark):
    d = datetime.date
    rows = [
        ("s1", "p", "o", d(2021, 1, 1), d(2023, 1, 1), 2, 2),
        ("s2", "p", "o", d(2022, 7, 1), d(2022, 8, 1), 1, 1),
        ("s3", "p", "o", d(2021, 1, 1), d(2022, 5, 1), 1, 1),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
              "first_seen date, last_seen date, n_docs long, "
              "n_mentions long")


def test_snapshot_at_validity_window(intervals):
    got = {r.subj for r in snapshot_at(intervals, "2022-06-15").collect()}
    # s1 spans the date; s2 starts after; s3 last seen before
    assert got == {"s1"}


def test_snapshot_at_grace_days(intervals):
    got = {r.subj
           for r in snapshot_at(intervals, "2022-06-15",
                                grace_days=45).collect()}
    # 45 days of grace revives s3 (last seen 2022-05-01)
    assert got == {"s1", "s3"}
    # boundary: exactly on last_seen + grace is still valid
    got2 = {r.subj
            for r in snapshot_at(intervals, "2022-06-15",
                                 grace_days=45).collect()}
    assert got2 == got
