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


def test_rake_phrases_metachar_stopwords_and_empty_list(spark):
    """Stopwords are regex-escaped (a 'c++'-style entry must not
    throw a PatternSyntaxException or corrupt the split), and an
    empty stoplist raises instead of matching every word boundary."""
    import pytest

    from knowledge_graph_spark.operators.textstats import rake_phrases

    docs = spark.createDataFrame(
        [(1, "big data c++ big data")], "doc_id long, text string")
    # note: the a-z0-9 collapse rewrites 'c++' to 'c ' first, so the
    # stopword must be its post-collapse form 'c' — the point here is
    # the metachar entry must not corrupt the OTHER boundaries
    got = {r["phrase"]: r for r in
           rake_phrases(docs, stopwords=("c++", "c"),
                        min_words=1).collect()}
    assert got["big data"]["n_occur"] == 2
    with pytest.raises(ValueError):
        rake_phrases(docs, stopwords=()).collect()


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


# -------------------------------------------------------- landmark index


def test_landmark_distances_path_graph(spark):
    """Path a-b-c-d with landmark a: exact hop distances; landmark z
    (absent from the graph) contributes nothing."""
    from knowledge_graph_spark.operators.graph_analytics import (
        landmark_distances)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    lms = spark.createDataFrame([("a",), ("z",)], "id string")
    got = {(r["id"], r["landmark"]): r["dist"]
           for r in landmark_distances(edges, lms).collect()}
    assert got == {("a", "a"): 0, ("b", "a"): 1,
                   ("c", "a"): 2, ("d", "a"): 3}


def test_landmark_estimate_triangle_inequality(spark):
    """Square a-b-c-d-a with landmark a: est(b,d) = d(b,a)+d(a,d)
    = 2 (exact here); est(a,c) = 2."""
    from knowledge_graph_spark.operators.graph_analytics import (
        landmark_distances, landmark_estimate)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string")
    lms = spark.createDataFrame([("a",)], "id string")
    idx = landmark_distances(edges, lms)
    pairs = spark.createDataFrame(
        [("b", "d"), ("a", "c"), ("b", "zz")], "a string, b string")
    got = {(r["a"], r["b"]): r["est"]
           for r in landmark_estimate(idx, pairs).collect()}
    # unreachable pair side drops out; both estimates exact via a
    assert got == {("b", "d"): 2, ("a", "c"): 2}


def test_landmark_multi_landmark_takes_min(spark):
    """Path a-b-c-d-e, landmarks a and e: est(b,d) via a = 1+3 = 4,
    via e = 3+1 = 4; but est(b,c) = min(1+2, 3+2) = 3 via a."""
    from knowledge_graph_spark.operators.graph_analytics import (
        landmark_distances, landmark_estimate)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string")
    lms = spark.createDataFrame([("a",), ("e",)], "id string")
    idx = landmark_distances(edges, lms)
    pairs = spark.createDataFrame([("b", "c")], "a string, b string")
    [row] = landmark_estimate(idx, pairs).collect()
    assert row["est"] == 3


# ------------------------------------------------------------- profiling


def test_fd_profile_holds_and_violations(spark):
    from knowledge_graph_spark.operators.profiling import fd_profile

    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 10), (3, "y", 20), (3, "y", 20),
         (4, None, 30), (None, "z", 40)],
        "k long, a string, b long")
    got = {(r["lhs"], r["rhs"]): r for r in
           fd_profile(df, [("k", "a"), ("a", "b"), ("b", "a")])
           .collect()}
    # k -> a: keys 1,2,3 map uniquely (4 has NULL a, NULL k dropped)
    r = got[("k", "a")]
    assert (r["n_lhs"], r["n_pairs"], r["n_violating_keys"]) == (3, 3, 0)
    # a -> b holds: x->10, y->20, z->40
    r = got[("a", "b")]
    assert (r["n_lhs"], r["n_pairs"], r["n_violating_keys"]) == (3, 3, 0)
    # b -> a: 10->x only, 20->y, 40->z, 30 dropped (NULL a)
    r = got[("b", "a")]
    assert (r["n_lhs"], r["n_pairs"], r["n_violating_keys"]) == (3, 3, 0)


def test_fd_profile_counts_violating_keys(spark):
    from knowledge_graph_spark.operators.profiling import fd_profile

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 3), ("z", 4), ("z", 4), ("z", 5)],
        "a string, b long")
    [r] = fd_profile(df, [("a", "b")]).collect()
    # x carries {1,2}, z carries {4,5} -> 2 violating keys, 5 pairs
    assert (r["n_lhs"], r["n_pairs"], r["n_violating_keys"]) == (3, 5, 2)


def test_inclusion_profile_full_and_partial(spark):
    from knowledge_graph_spark.operators.profiling import (
        inclusion_profile)

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "v long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    got = {r["candidate"]: r for r in inclusion_profile([
        ("c<p", child, "v", parent, "p"),
        ("p<c", parent, "p", child, "v"),
    ]).collect()}
    assert (got["c<p"]["n_child"], got["c<p"]["n_matched"]) == (3, 2)
    assert (got["p<c"]["n_child"], got["p<c"]["n_matched"]) == (3, 2)


def test_fd_profile_all_null_pair_still_emits_row(spark):
    """A pair whose rows are all NULL on either side still gets its
    census row (zeros) — the contract is one row per profiled pair."""
    from knowledge_graph_spark.operators.profiling import fd_profile

    df = spark.createDataFrame(
        [(None, "x"), (None, "y")], "a string, b string")
    [r] = fd_profile(df, [("a", "b")]).collect()
    assert (r["n_lhs"], r["n_pairs"], r["n_violating_keys"]) == (0, 0, 0)


def test_column_profile_empty_table_emits_zero_rows_per_column(spark):
    """An empty ingest must surface every column with n_rows=0, not
    silently drop it from the census."""
    from knowledge_graph_spark.operators.profiling import column_profile

    df = spark.createDataFrame([], "a string, b long")
    got = {r["table_col"]: r for r in
           column_profile(df, table_name="t").collect()}
    assert set(got) == {"t.a", "t.b"}
    for r in got.values():
        assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
        assert r["min_val"] is None and r["max_val"] is None


# ------------------------------------------------------------ TextTiling


def test_texttiling_hand_computed(spark):
    """Two 3-word blocks sharing one word: block A = (a b a),
    block B = (b c c); dot = cnt_A(b)*cnt_B(b) = 1;
    na2 = 2^2+1 = 5, nb2 = 1+2^2 = 5."""
    from knowledge_graph_spark.operators.textstats import (
        texttiling_ingredients)

    docs = spark.createDataFrame(
        [(1, "a b a b c c")], "doc_id long, text string")
    [r] = texttiling_ingredients(docs, block_words=3).collect()
    assert (r["gap"], r["dot"], r["na2"], r["nb2"]) == (0, 1, 5, 5)


def test_texttiling_zero_overlap_and_short_docs(spark):
    from knowledge_graph_spark.operators.textstats import (
        texttiling_ingredients)

    docs = spark.createDataFrame(
        [(1, "a a a b b b"),     # disjoint blocks -> dot 0
         (2, "only three words"),  # single block -> no gaps
         (3, None)],
        "doc_id long, text string")
    rows = texttiling_ingredients(docs, block_words=3).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["doc_id"], r["dot"], r["na2"], r["nb2"]) == (1, 0, 9, 9)


# -------------------------------------------------------- column profiling


def test_column_profile_counts_nulls_distincts(spark):
    from knowledge_graph_spark.operators.profiling import column_profile

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 2), (None, 2)],
        "s string, v long")
    got = {r["table_col"]: r for r in
           column_profile(df, table_name="t").collect()}
    s = got["t.s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_val"], s["max_val"]) == ("a", "b")
    v = got["t.v"]
    assert (v["n_rows"], v["n_nulls"], v["n_distinct"]) == (4, 1, 2)
    # numeric columns profile through their string form
    assert (v["min_val"], v["max_val"]) == ("1", "2")


def test_column_profile_rejects_empty(spark):
    from knowledge_graph_spark.operators.profiling import column_profile

    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError):
        column_profile(df, cols=[])


# ------------------------------------------------------------------ CUSUM


def test_cusum_finds_level_shift(spark):
    """Series 1,1,1,5,5 (days 1-5): total=13, T=5;
    S_t = 5*prefix - i*13 -> [-8, -16, -24, -12, 0]; the shift
    point (largest |S|) is day 3, S=-24."""
    from knowledge_graph_spark.operators.events import cusum_ingredients

    rows = []
    for day, n in ((1, 1), (2, 1), (3, 1), (4, 5), (5, 5)):
        rows += [(f"2024-01-0{day} 10:00:00", "x")] * n
    ev = spark.createDataFrame(rows, "ts string, event_type string") \
        .select(F.to_timestamp("ts").alias("ts"), "event_type")
    [r] = cusum_ingredients(ev).collect()
    assert (r["n_days"], r["total"]) == (5, 13)
    assert str(r["cp_day"]) == "2024-01-03"
    assert (r["s_at_cp"], r["max_abs_s"]) == (-24, 24)


def test_cusum_flat_series_ties_to_first_day(spark):
    from knowledge_graph_spark.operators.events import cusum_ingredients

    rows = [(f"2024-02-0{d} 00:00:00", "y") for d in (1, 2, 3)]
    ev = spark.createDataFrame(rows, "ts string, event_type string") \
        .select(F.to_timestamp("ts").alias("ts"), "event_type")
    [r] = cusum_ingredients(ev).collect()
    # flat series: every S_t = 0; first day wins the tie
    assert (str(r["cp_day"]), r["max_abs_s"]) == ("2024-02-01", 0)


# ------------------------------------------------------------------ trends


def test_trend_ingredients_hand_computed(spark):
    """Counts 2,4,6 on days 0,1,2: sx=3, sy=12, sxx=5, sxy=16
    (slope = (3*16-3*12)/(3*5-9) = 2)."""
    from knowledge_graph_spark.operators.events import trend_ingredients

    rows = []
    for day, n in ((1, 2), (2, 4), (3, 6)):
        rows += [(f"2024-03-0{day} 12:00:00", "z")] * n
    ev = spark.createDataFrame(rows, "ts string, event_type string") \
        .select(F.to_timestamp("ts").alias("ts"), "event_type")
    [r] = trend_ingredients(ev).collect()
    assert (r["n_days"], r["sx"], r["sy"], r["sxx"], r["sxy"]) == \
        (3, 3, 12, 5, 16)
    n, sx, sy, sxx, sxy = (r["n_days"], r["sx"], r["sy"], r["sxx"],
                           r["sxy"])
    assert (n * sxy - sx * sy) / (n * sxx - sx * sx) == 2.0


def test_trend_ingredients_sparse_days(spark):
    """Zero-count days contribute nothing: days 1 and 11 -> x in
    {0, 10}."""
    from knowledge_graph_spark.operators.events import trend_ingredients

    ev = spark.createDataFrame(
        [("2024-03-01 00:00:00", "z"), ("2024-03-11 00:00:00", "z")],
        "ts string, event_type string") \
        .select(F.to_timestamp("ts").alias("ts"), "event_type")
    [r] = trend_ingredients(ev).collect()
    assert (r["n_days"], r["sx"], r["sxx"]) == (2, 10, 100)


# -------------------------------------------------------------- WARC split


def test_warc_round_trip_and_malformed(spark):
    from knowledge_graph_spark.sources.warc import (build_warc_text,
                                                    parse_warc_text)

    recs = spark.createDataFrame(
        [(1, 0, "conversion", "http://a/x", "2024-01-01T00:00:00Z",
          "hello world"),
         (1, 1, "conversion", "http://a/y", "2024-01-02T00:00:00Z",
          ""),
         (2, 0, "response", "http://b/z", "2024-01-03T00:00:00Z",
          "line one\r\nline two")],
        "g long, o long, wt string, uri string, dt string, p string")
    blobs = build_warc_text(recs, "g", "o", "wt", "uri", "dt", "p")
    got = {(r["blob_id"], r["rec_idx"]): r for r in
           parse_warc_text(blobs, "warc", "blob_id").collect()}
    assert len(got) == 3
    r = got[(1, 0)]
    assert (r["warc_type"], r["target_uri"], r["payload"]) == \
        ("conversion", "http://a/x", "hello world")
    # empty payload survives as ''
    assert got[(1, 1)]["payload"] == ""
    # multi-line payload keeps its interior CRLF
    assert got[(2, 0)]["payload"] == "line one\r\nline two"
    assert got[(2, 0)]["warc_date"] == "2024-01-03T00:00:00Z"


def test_warc_parse_preamble_case_and_missing_headers(spark):
    from knowledge_graph_spark.sources.warc import parse_warc_text

    blob = ("junk preamble\r\n"
            "WARC/1.0\r\n"
            "warc-type: conversion\r\n"          # case-insensitive
            "WARC-Target-URI: http://x\r\n"
            "\r\n"
            "payload A\r\n\r\n"
            "WARC/1.0\r\n"
            "X-Other: nope\r\n"
            "\r\n"
            "payload B\r\n\r\n")
    blobs = spark.createDataFrame([(7, blob)], "blob_id long, warc string")
    got = {r["rec_idx"]: r for r in
           parse_warc_text(blobs).collect()}
    assert len(got) == 2
    assert got[0]["warc_type"] == "conversion"
    assert got[0]["target_uri"] == "http://x"
    # missing headers surface as NULL (the quarantine signal),
    # never as empty strings
    assert got[0]["warc_date"] is None
    assert got[1]["warc_type"] is None
    assert got[1]["payload"] == "payload B"


def test_warc_null_fields_never_drop_records(spark):
    """A NULL header field must not null the whole record out of the
    blob (concat-over-NULL + array_join would silently lose it):
    the line is omitted, the record survives, the field reads back
    NULL; a NULL payload writes as empty."""
    from knowledge_graph_spark.sources.warc import (build_warc_text,
                                                    parse_warc_text)

    recs = spark.createDataFrame(
        [(1, 0, "conversion", None, "2024-01-01T00:00:00Z", "body A"),
         (1, 1, "conversion", "http://a/y", None, None)],
        "g long, o long, wt string, uri string, dt string, p string")
    blobs = build_warc_text(recs, "g", "o", "wt", "uri", "dt", "p")
    got = {r["rec_idx"]: r for r in
           parse_warc_text(blobs, "warc", "blob_id").collect()}
    assert len(got) == 2                      # nothing vanished
    assert got[0]["target_uri"] is None
    assert got[0]["payload"] == "body A"
    assert got[1]["warc_date"] is None
    assert got[1]["payload"] == ""


def test_warc_payload_trailing_crlf_round_trips(spark):
    """Only the ONE appended record separator is trimmed — CRLFs
    that belong to the payload itself survive the round trip."""
    from knowledge_graph_spark.sources.warc import (build_warc_text,
                                                    parse_warc_text)

    recs = spark.createDataFrame(
        [(1, 0, "conversion", "http://a", "2024-01-01T00:00:00Z",
          "line one\r\n"),
         (1, 1, "conversion", "http://b", "2024-01-01T00:00:00Z",
          "tail\r\n\r\n")],
        "g long, o long, wt string, uri string, dt string, p string")
    blobs = build_warc_text(recs, "g", "o", "wt", "uri", "dt", "p")
    got = {r["rec_idx"]: r["payload"] for r in
           parse_warc_text(blobs, "warc", "blob_id").collect()}
    assert got[0] == "line one\r\n"
    assert got[1] == "tail\r\n\r\n"


# ---------------------------------------------------------- assortativity


def test_assortativity_star_is_disassortative(spark):
    """Star c-(x,y,z): pairs (3,1)x3 and (1,3)x3; n=6, sx=12,
    sxx=30, sxy=18 -> r = (6*18-144)/(6*30-144) = -1 (perfectly
    disassortative, as a star must be)."""
    from knowledge_graph_spark.operators.graph_analytics import (
        assortativity_ingredients)

    edges = spark.createDataFrame(
        [("c", "x"), ("c", "y"), ("c", "z")], "src string, dst string")
    [r] = assortativity_ingredients(edges).collect()
    assert (r["n_pairs"], r["sx"], r["sxx"], r["sxy"]) == (6, 12, 30, 18)
    n, sx, sxx, sxy = r["n_pairs"], r["sx"], r["sxx"], r["sxy"]
    assert (n * sxy - sx * sx) / (n * sxx - sx * sx) == -1.0


def test_assortativity_regular_graph_degenerate(spark):
    """4-cycle: every degree 2, variance 0 -> both numerator and
    denominator of r are 0 (the census exposes that; r undefined)."""
    from knowledge_graph_spark.operators.graph_analytics import (
        assortativity_ingredients)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string")
    [r] = assortativity_ingredients(edges).collect()
    n, sx, sxx, sxy = r["n_pairs"], r["sx"], r["sxx"], r["sxy"]
    assert (n, sx) == (8, 16)
    assert n * sxx - sx * sx == 0 and n * sxy - sx * sx == 0


# ------------------------------------------------------------ Heaps census


def test_heaps_census_prefix_vocab(spark):
    """Docs 1..4 in 2 buckets: bucket 1 = {a b, b c}, bucket 2 =
    {c d, a e}. Prefix 1: 4 tokens, vocab {a,b,c}=3; prefix 2: 8
    tokens, vocab {a,b,c,d,e}=5."""
    from knowledge_graph_spark.operators.textstats import heaps_census

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (3, "c d"), (4, "a e")],
        "doc_id long, text string")
    got = {r["prefix"]: r for r in heaps_census(docs, buckets=2).collect()}
    assert (got[1]["n_tokens"], got[1]["n_vocab"]) == (4, 3)
    assert (got[2]["n_tokens"], got[2]["n_vocab"]) == (8, 5)


def test_heaps_census_sparse_ids_fill_every_prefix(spark):
    """Skewed doc ids {1, 2, 1000} land in slices 1 and 10 only —
    the empty slices must still emit their prefix row (repeating the
    cumulative totals), not punch holes in the growth curve."""
    from knowledge_graph_spark.operators.textstats import heaps_census

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (1000, "c d")],
        "doc_id long, text string")
    got = {r["prefix"]: r for r in
           heaps_census(docs, buckets=10).collect()}
    assert sorted(got) == list(range(1, 11))
    # slices 2..9 are empty: cumulative totals repeat prefix 1's
    for p in range(1, 10):
        assert (got[p]["n_tokens"], got[p]["n_vocab"]) == (4, 3)
    assert (got[10]["n_tokens"], got[10]["n_vocab"]) == (6, 4)


def test_heaps_census_monotone_on_corpus(spark):
    import os

    from knowledge_graph_spark.operators.textstats import heaps_census

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rows = (heaps_census(docs, buckets=5)
            .orderBy("prefix").collect())
    toks = [r["n_tokens"] for r in rows]
    vocs = [r["n_vocab"] for r in rows]
    assert toks == sorted(toks) and vocs == sorted(vocs)
    assert vocs[-1] <= toks[-1]


# -------------------------------------------------------- term dispersion


def test_term_dispersion_bursty_vs_dispersed(spark):
    """'x' appears 4x in one doc (bursty); 'y' once in each of 4
    docs (dispersed)."""
    from knowledge_graph_spark.operators.textstats import term_dispersion

    docs = spark.createDataFrame(
        [(1, "x x x x y"), (2, "y"), (3, "y"), (4, "y")],
        "doc_id long, text string")
    got = {r["term"]: r for r in
           term_dispersion(docs, min_cf=4).collect()}
    assert (got["x"]["cf"], got["x"]["df"], got["x"]["max_tf"]) == \
        (4, 1, 4)
    assert (got["y"]["cf"], got["y"]["df"], got["y"]["max_tf"]) == \
        (4, 4, 1)


def test_fd_profile_empty_pair_rows_survive_melt(spark):
    """Pairs whose valid (non-null) row set is empty must still emit
    an all-zeros row (the r5 one-pass melt keeps the spine join)."""
    from knowledge_graph_spark.operators.profiling import fd_profile

    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, dead string")
    rows = {(r["lhs"], r["rhs"]): r for r in
            fd_profile(df, [("k", "dead"), ("k", "k")]).collect()}
    assert rows[("k", "dead")]["n_lhs"] == 0
    assert rows[("k", "dead")]["n_violating_keys"] == 0
    assert rows[("k", "k")]["n_lhs"] == 2


def test_column_profile_dotted_column_names(spark):
    from knowledge_graph_spark.operators.profiling import column_profile

    df = spark.range(3).toDF("id").withColumn("price.usd",
                                              F.col("id") * 2)
    rows = {r["table_col"]: r for r in column_profile(df).collect()}
    assert rows["price.usd"]["n_distinct"] == 3


def test_ranking_metrics_null_scored_positive_drops_query(spark):
    from knowledge_graph_spark.operators.kg_export import ranking_metrics

    scored = spark.createDataFrame(
        [(1, 5.0, True), (1, 3.0, False),
         (2, None, True), (2, 7.0, False)],
        "query_id long, score double, is_positive boolean")
    row = ranking_metrics(scored).collect()[0]
    # query 2's positive is unscored -> whole query drops, counts stay
    # consistent (n_queries == number of summed ranks)
    assert row["n_queries"] == 1 and row["sum_rank"] == 1


def test_training_triples_null_endpoints_never_enter_vocab(spark):
    from knowledge_graph_spark.operators.kg_export import (
        dense_ids, training_triples)

    edges = spark.createDataFrame(
        [("a", "b", "r"), ("a", None, "r"), (None, "b", "r")],
        "src string, dst string, rel_type string")
    out = training_triples(edges, negatives=4)
    # vocabulary = {a, b}: every sampled neg_t_id must be 0 or 1
    assert {r["neg_t_id"] for r in out.collect()} <= {0, 1}
    import pytest
    with pytest.raises(ValueError):
        dense_ids(edges.select(F.col("src").alias("v")), buckets=0)


def test_frequent_item_pairs_census_is_guard_consistent(spark):
    from knowledge_graph_spark.operators.assoc import frequent_item_pairs

    rows = [("b1", x) for x in ("a", "b")] + [("b2", x) for x in ("a", "b")]
    rows += [("big", f"i{k}") for k in range(10)] + [("big", "a"),
                                                     ("big", "b")]
    bk = spark.createDataFrame(rows, "basket string, item string")
    out = frequent_item_pairs(bk, min_support=2, max_basket=4)
    r = {(x["item_a"], x["item_b"]): x for x in out.collect()}[("a", "b")]
    # the oversized basket is invisible to EVERY statistic
    assert r["pair_count"] == 2
    assert r["count_a"] == 2 and r["count_b"] == 2
    assert r["n_baskets"] == 2


def test_warc_midline_marker_does_not_split(spark):
    """The marker is anchored at line starts (the documented textual
    convention): a payload mentioning 'WARC/1.0\\r\\n' mid-line must
    not truncate the record (r5 review finding)."""
    from knowledge_graph_spark.sources.warc import parse_warc_text

    blob = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n"
            "see WARC/1.0\r\ncontinued text\r\n\r\n")
    blobs = spark.createDataFrame([(1, blob)],
                                  "blob_id long, warc string")
    rows = parse_warc_text(blobs, "warc", "blob_id").collect()
    assert len(rows) == 1
    assert rows[0]["payload"] == "see WARC/1.0\r\ncontinued text"


def test_warc_markerless_blob_quarantines(spark):
    """A blob with no record marker (corrupt/mis-decoded file) must
    surface as one NULL-header quarantine row, never vanish."""
    from knowledge_graph_spark.sources.warc import parse_warc_text

    blobs = spark.createDataFrame(
        [(1, "just some garbage bytes"),
         (2, "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nreal\r\n\r\n")],
        "blob_id long, warc string")
    rows = {r["blob_id"]: r for r in
            parse_warc_text(blobs, "warc", "blob_id").collect()}
    assert rows[1]["warc_type"] is None          # quarantine signal
    assert rows[2]["warc_type"] == "conversion"
