# -*- coding: utf-8 -*-
"""Hand-computed cases for the round-4 fifth-continuation batch:
WL structural roles, spam mass, golden-record survivorship, RAKE
phrase ingredients, and mirror-host detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- WL roles


def test_wl_roles_path_symmetry(spark):
    """P3 path a-b-c: the endpoints are structurally identical at any
    radius; the center is not."""
    from knowledge_graph_spark.operators.graph_analytics import wl_roles

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    got = {r["id"]: r["role"] for r in wl_roles(edges, rounds=2).collect()}
    assert got["a"] == got["c"]
    assert got["a"] != got["b"]


def test_wl_roles_separates_star_from_triangle(spark):
    """Degree-2 nodes in a triangle vs a P3 center share label_0 (both
    degree 2) but diverge after one refinement round: the triangle
    node's neighbors have degree 2, the path center's have degree 1."""
    from knowledge_graph_spark.operators.graph_analytics import wl_roles

    edges = spark.createDataFrame(
        [("t1", "t2"), ("t2", "t3"), ("t1", "t3"),   # triangle
         ("p1", "p2"), ("p2", "p3")],                # path
        "src string, dst string")
    r0 = {r["id"]: r["role"] for r in wl_roles(edges, rounds=0).collect()}
    assert r0["t1"] == r0["p2"] == "2"
    r1 = {r["id"]: r["role"] for r in wl_roles(edges, rounds=1).collect()}
    assert r1["t1"] == r1["t2"] == r1["t3"]
    assert r1["t1"] != r1["p2"]


def test_wl_roles_direction_and_duplicates_ignored(spark):
    """The canonical undirected fold: reversed and duplicated edges
    don't change roles."""
    from knowledge_graph_spark.operators.graph_analytics import wl_roles

    e1 = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    e2 = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("c", "b")], "src string, dst string")
    got1 = sorted(map(tuple, wl_roles(e1, rounds=2).collect()))
    got2 = sorted(map(tuple, wl_roles(e2, rounds=2).collect()))
    assert got1 == got2


# --------------------------------------------------------------- spam mass


def test_spam_mass_flags_untrusted_cluster(spark):
    """Two disjoint 3-cycles; teleport trusts only cycle A. Both
    distributions sum to 1; cycle-B nodes carry positive mass (their
    PageRank is unreachable from the trusted core), cycle-A nodes
    negative."""
    from knowledge_graph_spark.operators.graph_analytics import spam_mass

    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
         ("b1", "b2"), ("b2", "b3"), ("b3", "b1")],
        "src string, dst string")
    trusted = spark.createDataFrame([("a1",)], "id string")
    rows = {r["id"]: r for r in spam_mass(edges, trusted).collect()}
    assert sum(r["pr"] for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["tr"] for r in rows.values()) == pytest.approx(1.0)
    for b in ("b1", "b2", "b3"):
        assert rows[b]["mass"] > 0.1
    for a in ("a1", "a2", "a3"):
        assert rows[a]["mass"] < 0.0
    # symmetric cycles: every node holds pr = 1/6
    assert rows["b1"]["pr"] == pytest.approx(1.0 / 6.0, abs=1e-3)


# ------------------------------------------------------------ golden record


def test_golden_record_majority_ties_and_nulls(spark):
    from knowledge_graph_spark.operators.fusion import golden_record

    rec = spark.createDataFrame(
        [(1, "A", "x"), (1, "A", None), (1, "B", None),
         (2, "A", None), (2, "B", None),
         (3, None, None)],
        "k long, seg string, ph string")
    got = {r["k"]: r for r in
           golden_record(rec, "k", ["seg", "ph"]).collect()}
    # majority
    assert (got[1]["seg"], got[1]["seg_n"]) == ("A", 2)
    # single non-null vote survives
    assert (got[1]["ph"], got[1]["ph_n"]) == ("x", 1)
    # tie -> smaller value
    assert (got[2]["seg"], got[2]["seg_n"]) == ("A", 1)
    # all-null attribute -> NULL with 0 votes
    assert got[2]["ph"] is None and got[2]["ph_n"] == 0
    assert got[3]["seg"] is None and got[3]["seg_n"] == 0
    assert [got[k]["n_records"] for k in (1, 2, 3)] == [3, 2, 1]


def test_golden_record_casts_nonstring_attrs(spark):
    from knowledge_graph_spark.operators.fusion import golden_record

    rec = spark.createDataFrame(
        [(1, 7), (1, 7), (1, 9)], "k long, v long")
    row = golden_record(rec, "k", ["v"]).collect()[0]
    assert (row["v"], row["v_n"]) == ("7", 2)


def test_golden_record_rejects_empty_attrs(spark):
    from knowledge_graph_spark.operators.fusion import golden_record

    rec = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError):
        golden_record(rec, "k", [])


# ------------------------------------------------------------------- RAKE


def test_rake_phrases_hand_computed(spark):
    """'deep learning of deep learning systems' splits on 'of' into
    phrases [deep learning], [deep learning systems]:
    freq(deep)=2, deg(deep)=2+3=5; same for learning;
    freq(systems)=1, deg(systems)=3."""
    from knowledge_graph_spark.operators.textstats import rake_phrases

    docs = spark.createDataFrame(
        [(1, "Deep learning of deep learning systems.")],
        "doc_id long, text string")
    got = {r["phrase"]: r for r in
           rake_phrases(docs, min_words=1, max_words=4).collect()}
    dl = got["deep learning"]
    assert (dl["n_words"], dl["n_occur"], dl["n_docs"]) == (2, 1, 1)
    assert (dl["sum_deg"], dl["sum_freq"]) == (10, 4)
    dls = got["deep learning systems"]
    assert (dls["sum_deg"], dls["sum_freq"]) == (13, 5)


def test_rake_phrases_stopword_boundaries_and_word_caps(spark):
    from knowledge_graph_spark.operators.textstats import rake_phrases

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"),
         (2, "quick brown fox!"),
         (3, None)],
        "doc_id long, text string")
    got = {r["phrase"]: r for r in rake_phrases(docs).collect()}
    # stopwords never appear inside candidates
    assert all(" the " not in f" {p} " for p in got)
    fox = got["quick brown fox"]
    assert (fox["n_occur"], fox["n_docs"]) == (2, 2)
    # 'lazy dog' occurs once
    assert got["lazy dog"]["n_occur"] == 1
    # min_words=2 default drops single-word runs
    assert "dog" not in got


# ------------------------------------------------------------ mirror hosts


def test_mirror_hosts_counts_and_cap(spark):
    from knowledge_graph_spark.operators.crawl import mirror_hosts

    rows = [
        # h1 and h2 mirror three docs; h3 shares only one
        ("h1", "f1"), ("h1", "f2"), ("h1", "f3"),
        ("h2", "f1"), ("h2", "f2"), ("h2", "f3"),
        ("h3", "f1"),
        # boilerplate fingerprint on ALL hosts — must be capped out
        ("h1", "fb"), ("h2", "fb"), ("h3", "fb"), ("h4", "fb"),
    ]
    pages = spark.createDataFrame(rows, "host string, fingerprint string")
    got = {(r["host_a"], r["host_b"]): r for r in
           mirror_hosts(pages, min_shared=2, max_fp_hosts=3).collect()}
    assert set(got) == {("h1", "h2")}
    r = got[("h1", "h2")]
    # degrees counted over the capped fingerprint set (fb dropped)
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (3, 3, 3)
