# -*- coding: utf-8 -*-
"""Hand-computed checks for the round-4 census additions: integer-
exact Katz centrality, the Holland-Leinhardt dyad census, the NCP
conductance census, and the Good-Turing count-of-counts census.

Katz on a -> b -> c, a -> c at alpha = 1/2 (alpha_inv = 2):
  x_1 = alpha * indegree, x_2(c) = alpha*((1+x_1(a)) + (1+x_1(b)))
      = 0.5 * (1 + 1.5) = 1.25  ->  y_2(c) = 4 * 1.25 = 5.
Two-cycle a <-> b at alpha = 1/2, 3 rounds: exactly one path per
length, so x_3 = 1/2 + 1/4 + 1/8 = 7/8  ->  y_3 = 7.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.graph_analytics import (
    conductance_census, dyad_census, katz_ingredients)
from knowledge_graph_spark.operators.textstats import good_turing_census


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_katz_triangle_hand_computed(spark):
    out = katz_ingredients(
        _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")]),
        alpha_inv=2, rounds=2)
    rows = {r["id"]: r["katz_num"] for r in out.collect()}
    # y_2(b) = 2 + y_1(a) = 2;  y_2(c) = (2 + y_1(a)) + (2 + y_1(b)) = 5
    assert rows == {"a": 0, "b": 2, "c": 5}


def test_katz_two_cycle_geometric(spark):
    out = katz_ingredients(_edges(spark, [("a", "b"), ("b", "a")]),
                           alpha_inv=2, rounds=3)
    rows = {r["id"]: r["katz_num"] for r in out.collect()}
    # one path per length 1..3: y_3 = 4 + 2 + 1 = 7 on both nodes
    assert rows == {"a": 7, "b": 7}


def test_katz_drops_self_loops_and_duplicates(spark):
    out = katz_ingredients(
        _edges(spark, [("a", "b"), ("a", "b"), ("a", "a")]),
        alpha_inv=2, rounds=1)
    rows = {r["id"]: r["katz_num"] for r in out.collect()}
    assert rows == {"a": 0, "b": 1}


def test_katz_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        katz_ingredients(_edges(spark, [("a", "b")]), alpha_inv=1)


def test_dyad_census_hand_computed(spark):
    out = dyad_census(_edges(spark, [
        ("a", "b"), ("b", "a"), ("a", "c"), ("x", "y"),
        ("a", "b"),              # duplicate directed edge
        ("c", "c"),              # self-loop: dropped
    ]))
    row = out.collect()[0]
    assert row["n_nodes"] == 5
    assert row["mutual_dyads"] == 1     # {a,b}
    assert row["asym_dyads"] == 2       # {a,c}, {x,y}
    assert row["null_dyads"] == 10 - 3  # C(5,2) - connected


def test_conductance_square_two_halves(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"),
                           ("d", "a")])
    labels = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2), ("d", 2), ("e", 3)],
        "id string, community int")
    rows = {r["community"]: r for r in
            conductance_census(edges, labels).collect()}
    for c in (1, 2):
        assert rows[c]["n_nodes"] == 2
        assert rows[c]["internal_edges"] == 1
        assert rows[c]["cut_edges"] == 2
        # identity: volume = 2*internal + cut
        assert rows[c]["volume"] == 4
    # labeled but edge-free community still appears, all zeros
    assert rows[3]["n_nodes"] == 1
    assert rows[3]["volume"] == 0
    assert rows[3]["internal_edges"] == 0
    assert rows[3]["cut_edges"] == 0


def test_conductance_drops_unlabeled_endpoints(spark):
    edges = _edges(spark, [("a", "b"), ("a", "z")])  # z unlabeled
    labels = spark.createDataFrame([("a", 1), ("b", 1)],
                                   "id string, community int")
    rows = {r["community"]: r for r in
            conductance_census(edges, labels).collect()}
    assert rows[1]["internal_edges"] == 1
    assert rows[1]["cut_edges"] == 0
    # degree still counts the a-z edge (volume is over the raw graph)
    assert rows[1]["volume"] == 3


def test_good_turing_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "c d")], "doc_id long, text string")
    rows = {r["r"]: r for r in good_turing_census(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_r"], rows[1]["r_prev"], rows[1]["r_next"]) == (1, 0, 2)
    assert (rows[2]["n_r"], rows[2]["r_prev"], rows[2]["r_next"]) == (2, 1, 3)
    # Gale-Sampson boundary: r_next = 2r - r_prev at the top
    assert (rows[3]["n_r"], rows[3]["r_prev"], rows[3]["r_next"]) == (1, 2, 4)


def test_good_turing_max_r_truncates(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c c d")], "doc_id long, text string")
    out = good_turing_census(docs, max_r=2)
    assert {r["r"] for r in out.collect()} == {1, 2}


# ---------------------------------------------------------------------------
# coreness (h-index fix-point) + allpairs exact similarity join
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.dedup import allpairs_jaccard
from knowledge_graph_spark.operators.graph_analytics import coreness


def test_coreness_triangle_with_pendant(spark):
    out = coreness(_edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                                  ("a", "d")]))
    rows = {r["id"]: r["coreness"] for r in out.collect()}
    assert rows == {"a": 2, "b": 2, "c": 2, "d": 1}


def test_coreness_path_and_k4(spark):
    path = coreness(_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]))
    assert {r["coreness"] for r in path.collect()} == {1}
    k4 = coreness(_edges(spark, [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d")]))
    assert {r["coreness"] for r in k4.collect()} == {3}


def test_coreness_two_triangles_sharing_a_node(spark):
    out = coreness(_edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                                  ("c", "d"), ("d", "e"), ("c", "e")]))
    rows = {r["id"]: r["coreness"] for r in out.collect()}
    # the shared node's degree is 4 but its coreness is still 2
    assert rows == {"a": 2, "b": 2, "c": 2, "d": 2, "e": 2}


def _brute_jaccard_pairs(texts, n=3, t=0.5):
    """Pure-Python exact reference: shingle sets + all-pairs."""
    import re

    def shingles(s):
        w = [x for x in re.split(r"[^\w]+", s.lower()) if x]
        if len(w) >= n:
            return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
        return {" ".join(w)}

    sets = {i: shingles(s) for i, s in texts}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= t:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def test_allpairs_matches_bruteforce(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (3, "the quick brown fox jumps over the sleepy dog"), # near dup
        (4, "entirely different words live in this document"),
        (5, "another unrelated text about spark and graphs"),
        (6, "a b c d e"),
        (7, "a b c d f"),   # J = 2/4 = 0.5: boundary pair, must be IN
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["sz_a"], r["sz_b"])
           for r in allpairs_jaccard(docs).collect()}
    assert got == _brute_jaccard_pairs(texts)
    assert (6, 7) in got          # the exact-boundary pair survived


def test_allpairs_integer_threshold_excludes_below(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z")],
        "doc_id long, text string")
    # 4 shingles each, intersection 1: J = 1/7 < 1/2
    assert allpairs_jaccard(docs).count() == 0


# ---------------------------------------------------------------------------
# triad census
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.graph_analytics import (
    TRIAD_TYPES, triad_census)


def _census(spark, pairs):
    out = triad_census(_edges(spark, pairs))
    rows = {r["triad_type"]: r["n_triads"] for r in out.collect()}
    assert set(rows) == set(TRIAD_TYPES)
    return rows


def test_triad_census_chain_star_cycles(spark):
    rows = _census(spark, [("a", "b"), ("b", "c")])
    assert rows["021C"] == 1 and sum(rows.values()) == 1
    rows = _census(spark, [("a", "b"), ("a", "c"), ("a", "d")])
    assert rows["021D"] == 3 and rows["003"] == 1
    rows = _census(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert rows["030C"] == 1
    rows = _census(spark, [("a", "b"), ("b", "a"), ("b", "c"),
                           ("c", "b"), ("a", "c"), ("c", "a")])
    assert rows["300"] == 1


def test_triad_census_matches_networkx_on_hash_graphs(spark):
    import hashlib

    nx = pytest.importorskip("networkx", reason="independent reference")

    for seed in (1, 2, 3):
        # deterministic pseudo-random digraph on 12 nodes
        pairs = []
        for u in range(12):
            for v in range(12):
                if u == v:
                    continue
                h = hashlib.md5(f"{seed}:{u}:{v}".encode()).digest()[0]
                if h < 70:
                    pairs.append((f"n{u:02d}", f"n{v:02d}"))
        G = nx.DiGraph()
        G.add_nodes_from(f"n{i:02d}" for i in range(12))
        G.add_edges_from(pairs)
        want = nx.triadic_census(G)
        got = _census(spark, pairs)
        assert got == want, f"seed {seed}: {got} != {want}"
        assert sum(got.values()) == 12 * 11 * 10 // 6


# ---------------------------------------------------------------------------
# Kleinberg burst detection
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.events import kleinberg_bursts


def _events(spark, day_counts, base="2024-01-01"):
    """day_counts: {type: [count per day 1..T]} -> events frame."""
    import datetime as dt

    rows = []
    b = dt.datetime.fromisoformat(base)
    for tp, counts in day_counts.items():
        for d, n in enumerate(counts, start=1):
            for i in range(n):
                rows.append((tp, b + dt.timedelta(days=d - 1, seconds=i)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _py_kleinberg(day_counts, n_steps, tau, s_ratio=2):
    """Pure-Python reference DP on the same 1e-6 integer lattice."""
    import math

    R = {k: sum(v) for k, v in day_counts.items()}
    d = [0] * (n_steps + 1)
    for k, v in day_counts.items():
        for t, n in enumerate(v, start=1):
            d[t] += n
    D = sum(d)
    out = {}
    for k, v in day_counts.items():
        p0 = R[k] / D
        p1 = min(p0 * s_ratio, 0.999999)

        def cost(t, p):
            r = v[t - 1] if t <= len(v) else 0
            if d[t] == 0:
                return 0
            return round(-(r * math.log(p)
                           + (d[t] - r) * math.log(1 - p)) * 1e6)

        # states: (cost, path); start forced into state 0
        st = {0: (0, ""), 1: (10 ** 15, "")}
        for t in range(1, n_steps + 1):
            new = {}
            for qn in (0, 1):
                cands = sorted(
                    (st[q][0] + (tau if qn == 1 and q == 0 else 0),
                     q, st[q][1])
                    for q in (0, 1))
                c, q, pth = cands[0]
                new[qn] = (c + cost(t, p1 if qn else p0),
                           pth + str(qn))
            st = new
        c, q, pth = sorted((st[q][0], q, st[q][1]) for q in (0, 1))[0]
        out[k] = (pth, pth.count("1"), c)
    return out


def test_kleinberg_planted_burst_fires(spark):
    import math

    counts = {
        "bg1": [100] * 6,
        "bg2": [100] * 6,
        "spiky": [10, 10, 100, 100, 10, 10],
    }
    tau = round(math.log(6) * 1e6)
    out = kleinberg_bursts(_events(spark, counts), n_steps=6,
                           tau_scaled=tau)
    rows = {r["key"]: (r["path"], r["n_burst_steps"],
                       r["total_cost_scaled"]) for r in out.collect()}
    assert rows["spiky"][0] == "001100"
    assert rows["bg1"][0] == "000000"
    assert rows == _py_kleinberg(counts, 6, tau)


def test_kleinberg_matches_python_twin_on_hash_series(spark):
    import hashlib
    import math

    counts = {}
    for k in ("a", "b", "c", "d"):
        counts[k] = [
            hashlib.md5(f"{k}:{t}".encode()).digest()[0] % 40 + 5
            for t in range(1, 9)]
    tau = round(math.log(8) * 1e6)
    out = kleinberg_bursts(_events(spark, counts), n_steps=8,
                           tau_scaled=tau)
    rows = {r["key"]: (r["path"], r["n_burst_steps"],
                       r["total_cost_scaled"]) for r in out.collect()}
    assert rows == _py_kleinberg(counts, 8, tau)


def test_kleinberg_rejects_bad_steps(spark):
    with pytest.raises(ValueError):
        kleinberg_bursts(_events(spark, {"a": [1]}), n_steps=0,
                         tau_scaled=1)


# ---------------------------------------------------------------------------
# Boruvka minimum spanning forest
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.graph_analytics import boruvka_msf


def _wedges(spark, triples):
    return spark.createDataFrame(
        triples, "src string, dst string, weight double")


def test_boruvka_hand_computed_square(spark):
    # square with one diagonal: MST = the three cheapest non-cyclic
    out = boruvka_msf(_wedges(spark, [
        ("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0),
        ("d", "a", 4.0), ("a", "c", 5.0)]))
    got = {(r["src"], r["dst"], r["weight"]) for r in out.collect()}
    assert got == {("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0)}


def test_boruvka_forest_two_components(spark):
    out = boruvka_msf(_wedges(spark, [
        ("a", "b", 1.0), ("b", "c", 5.0), ("a", "c", 2.0),
        ("x", "y", 7.0)]))
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {("a", "b"), ("a", "c"), ("x", "y")}


def test_boruvka_tied_weights_deterministic_and_acyclic(spark):
    # all weights tied: the (w, src, dst) total order must still
    # produce a unique spanning tree (n-1 edges, no cycle)
    out = boruvka_msf(_wedges(spark, [
        ("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
        ("c", "d", 1.0), ("d", "a", 1.0)]))
    rows = sorted((r["src"], r["dst"]) for r in out.collect())
    assert len(rows) == 3
    assert rows == [("a", "b"), ("a", "c"), ("a", "d")]


def test_boruvka_matches_networkx_on_hash_graphs(spark):
    import hashlib

    nx = pytest.importorskip("networkx", reason="independent reference")
    for seed in (1, 2):
        triples = []
        for u in range(14):
            for v in range(u + 1, 14):
                h = hashlib.md5(f"{seed}:{u}:{v}".encode()).digest()
                if h[0] < 90:
                    # distinct weights so the MSF is unique
                    triples.append((f"n{u:02d}", f"n{v:02d}",
                                    float(int.from_bytes(h[1:4], "big"))))
        G = nx.Graph()
        for u, v, w in triples:
            G.add_edge(u, v, weight=w)
        want = {(min(u, v), max(u, v)) for u, v in
                nx.minimum_spanning_edges(G, data=False)}
        out = boruvka_msf(_wedges(spark, triples))
        got = {(r["src"], r["dst"]) for r in out.collect()}
        assert got == want, f"seed {seed}"


# ---------------------------------------------------------------------------
# Gonzalez greedy k-center coreset
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.simsearch import kcenter_coreset


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_kcenter_farthest_point_order(spark):
    pts = _points(spark, [(1, [0.0]), (2, [1.0]), (3, [10.0]),
                          (4, [11.0]), (5, [100.0])])
    out = {r["rank"]: r["center_id"]
           for r in kcenter_coreset(pts, k=3).collect()}
    # min id first, then 100 (farthest), then 11 (d_min 121 > 100)
    assert out == {1: 1, 2: 5, 3: 4}


def test_kcenter_tie_breaks_on_lower_id(spark):
    pts = _points(spark, [(1, [0.0]), (2, [5.0]), (3, [5.0]),
                          (4, [-5.0])])
    out = {r["rank"]: r["center_id"]
           for r in kcenter_coreset(pts, k=2).collect()}
    # ids 2, 3, 4 all sit at distance 25: lowest id wins
    assert out == {1: 1, 2: 2}


def test_kcenter_matches_python_greedy_on_hash_points(spark):
    import hashlib

    rows = []
    for i in range(40):
        h = hashlib.md5(f"pt{i}".encode()).digest()
        rows.append((i, [float(h[0]), float(h[1]), float(h[2])]))
    got = {r["rank"]: r["center_id"]
           for r in kcenter_coreset(_points(spark, rows), k=6).collect()}

    # pure-Python twin with the same 6-dp rounding + id tie-break
    pts = {i: v for i, v in rows}
    centers = [min(pts)]
    d = {i: round(sum((a - b) ** 2 for a, b in
                      zip(v, pts[centers[0]])), 6)
         for i, v in pts.items()}
    for _ in range(5):
        nxt = max(pts, key=lambda i: (d[i], -i))
        centers.append(nxt)
        for i, v in pts.items():
            d[i] = min(d[i], round(sum((a - b) ** 2 for a, b in
                                       zip(v, pts[nxt])), 6))
    assert got == {r + 1: c for r, c in enumerate(centers)}


def test_kcenter_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        kcenter_coreset(_points(spark, [(1, [0.0])]), k=0)


# ---------------------------------------------------------------------------
# shared-nearest-neighbor clustering
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.simsearch import snn_clusters


def _knn(spark, pairs):
    return spark.createDataFrame(pairs, "query_id long, vec_id long")


def test_snn_two_tight_groups(spark):
    knn = _knn(spark, [
        (1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2),
        (4, 5), (4, 6), (5, 4), (5, 6), (6, 4), (6, 5),
    ])
    out = {r["vec_id"]: r["cluster"]
           for r in snn_clusters(knn, min_shared=1).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_snn_requires_mutual_listing(spark):
    # 7 lists 1 but 1 does not list 7: no edge, 7 stays a singleton
    knn = _knn(spark, [
        (1, 2), (2, 1), (7, 1), (7, 2),
    ])
    out = {r["vec_id"]: r["cluster"]
           for r in snn_clusters(knn, min_shared=0).collect()}
    assert out[7] == 7
    assert out[1] == out[2] == 1


def test_snn_shared_threshold_splits(spark):
    knn = _knn(spark, [
        (1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 2),
    ])
    # each mutual pair shares exactly ONE neighbor: threshold 2 cuts
    out = {r["vec_id"]: r["cluster"]
           for r in snn_clusters(knn, min_shared=2).collect()}
    assert out == {1: 1, 2: 2, 3: 3}


def test_snn_self_listing_ignored(spark):
    knn = _knn(spark, [
        (1, 1), (1, 2), (2, 2), (2, 1), (3, 3),
    ])
    out = {r["vec_id"]: r["cluster"]
           for r in snn_clusters(knn, min_shared=0).collect()}
    assert out[1] == out[2] == 1
    assert out[3] == 3


# ---------------------------------------------------------------------------
# Kendall rank agreement
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.search import kendall_agreement


def _ranks(spark, rows):
    return spark.createDataFrame(rows, "query_id long, vec_id long, rank int")


def test_kendall_identical_and_reversed(spark):
    a = _ranks(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)])
    same = kendall_agreement(a, a).collect()[0]
    assert (same["n_common"], same["concordant"],
            same["discordant"]) == (3, 3, 0)
    rev = _ranks(spark, [(1, 10, 3), (1, 20, 2), (1, 30, 1)])
    out = kendall_agreement(a, rev).collect()[0]
    assert (out["concordant"], out["discordant"]) == (0, 3)


def test_kendall_partial_overlap_counts_leakage(spark):
    a = _ranks(spark, [(1, 10, 1), (1, 20, 2), (1, 30, 3)])
    b = _ranks(spark, [(1, 20, 1), (1, 10, 2), (1, 40, 3)])
    out = kendall_agreement(a, b).collect()[0]
    # common = {10, 20}: one pair, discordant (a: 10<20, b: 20<10)
    assert out["n_common"] == 2
    assert (out["concordant"], out["discordant"]) == (0, 1)
    assert (out["only_a"], out["only_b"]) == (1, 1)


def test_kendall_disjoint_queries_zero_filled(spark):
    a = _ranks(spark, [(1, 10, 1)])
    b = _ranks(spark, [(2, 10, 1)])
    rows = {r["query_id"]: r for r in kendall_agreement(a, b).collect()}
    assert rows[1]["n_common"] == 0 and rows[1]["only_a"] == 1
    assert rows[2]["n_common"] == 0 and rows[2]["only_b"] == 1


# ---------------------------------------------------------------------------
# temporal functional-constraint conflicts
# ---------------------------------------------------------------------------

import datetime as _dt

from knowledge_graph_spark.operators.temporal import temporal_conflicts


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
              "first_seen date, last_seen date")


def _d(s):
    return _dt.date.fromisoformat(s)


def test_temporal_conflicts_overlap_and_disjoint(spark):
    facts = _facts(spark, [
        ("acme", "ceo_of", "alice", _d("2021-01-01"), _d("2021-06-30")),
        ("acme", "ceo_of", "bob", _d("2021-06-01"), _d("2021-12-31")),
        ("acme", "ceo_of", "carol", _d("2022-01-01"), _d("2022-06-30")),
        ("acme", "hq_in", "lisbon", _d("2021-01-01"), _d("2021-12-31")),
    ])
    out = temporal_conflicts(facts, ["ceo_of"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["obj_a"], r["obj_b"]) == ("alice", "bob")
    # June 1 .. June 30 inclusive
    assert r["overlap_days"] == 30


def test_temporal_conflicts_touching_windows_conflict(spark):
    facts = _facts(spark, [
        ("x", "is_a", "town", _d("2021-01-01"), _d("2021-03-01")),
        ("x", "is_a", "city", _d("2021-03-01"), _d("2021-06-01")),
    ])
    out = temporal_conflicts(facts, ["is_a"]).collect()
    assert len(out) == 1
    assert out[0]["overlap_days"] == 1


def test_temporal_conflicts_nonfunctional_pred_ignored(spark):
    facts = _facts(spark, [
        ("x", "likes", "tea", _d("2021-01-01"), _d("2021-12-31")),
        ("x", "likes", "coffee", _d("2021-01-01"), _d("2021-12-31")),
    ])
    assert temporal_conflicts(facts, ["is_a"]).count() == 0


# ---------------------------------------------------------------------------
# Gini token-inequality ingredients
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.textstats import gini_ingredients


def test_gini_hand_computed(spark):
    # counts: a=1, b=2, c=3 -> sorted ranks 1,2,3
    # S = 1*1 + 2*2 + 3*3 = 14; n=3, T=6
    docs = spark.createDataFrame(
        [(1, "a b b c c c")], "doc_id long, text string")
    r = gini_ingredients(docs).collect()[0]
    assert (r["n_terms"], r["total_tokens"],
            r["rank_weighted_sum"]) == (3, 6, 14)


def test_gini_matches_python_sort_reference(spark):
    import hashlib

    words = []
    for i in range(30):
        n = hashlib.md5(f"w{i}".encode()).digest()[0] % 9 + 1
        words += [f"w{i}"] * n
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string")
    r = gini_ingredients(docs).collect()[0]
    from collections import Counter

    counts = sorted(Counter(words).values())
    S = sum((i + 1) * c for i, c in enumerate(counts))
    assert (r["n_terms"], r["total_tokens"],
            r["rank_weighted_sum"]) == (len(counts), sum(counts), S)


def test_gini_uniform_distribution_minimal(spark):
    # equal counts: G = 2S/(nT) - (n+1)/n must be 0
    docs = spark.createDataFrame(
        [(1, "a a b b c c")], "doc_id long, text string")
    r = gini_ingredients(docs).collect()[0]
    n, T, S = r["n_terms"], r["total_tokens"], r["rank_weighted_sum"]
    assert 2 * S / (n * T) - (n + 1) / n == 0.0


# ---------------------------------------------------------------------------
# RFC 9309 wildcard robots matching
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.crawl import robots_filter_wildcards


def _rurls(spark, paths):
    return spark.createDataFrame(
        [(i, f"https://h.example.org{p}") for i, p in enumerate(paths)],
        "doc_id long, url string")


def _rrules(spark, rules):
    return spark.createDataFrame(
        [("h.example.org", p, a) for p, a in rules],
        "host string, pattern string, allow boolean")


def test_robots_wildcard_star_and_anchor(spark):
    urls = _rurls(spark, ["/private/a/doc.pdf", "/private/doc.pdfx",
                          "/searchresults", "/open/doc.pdf"])
    rules = _rrules(spark, [("/private/*.pdf$", False),
                            ("/search*", False)])
    out = {r["path"]: r["allowed"] for r in
           robots_filter_wildcards(urls, rules).collect()}
    assert out["/private/a/doc.pdf"] is False     # * spans segments
    assert out["/private/doc.pdfx"] is True       # $ anchors the end
    assert out["/searchresults"] is False         # trailing * open
    assert out["/open/doc.pdf"] is True           # no match -> allowed


def test_robots_wildcard_tie_goes_to_allow(spark):
    urls = _rurls(spark, ["/a/b"])
    rules = _rrules(spark, [("/a/*", False), ("/a/b", True)])
    out = robots_filter_wildcards(urls, rules).collect()[0]
    assert out["allowed"] is True
    assert out["rule_pattern"] == "/a/b"


def test_robots_wildcard_subsumes_literal_prefixes(spark):
    urls = _rurls(spark, ["/tmp/x", "/tmp2/x", "/t.mp/x"])
    rules = _rrules(spark, [("/tmp/", False), ("/t.mp/", False)])
    out = {r["path"]: r["allowed"] for r in
           robots_filter_wildcards(urls, rules).collect()}
    assert out["/tmp/x"] is False
    assert out["/tmp2/x"] is True
    # the dot is escaped: /t.mp/ matches only itself, not /tymp/
    assert out["/t.mp/x"] is False


def test_robots_wildcard_specificity_by_pattern_length(spark):
    urls = _rurls(spark, ["/private/pub-1"])
    rules = _rrules(spark, [("/private/*", False),
                            ("/private/pub-*", True)])
    out = robots_filter_wildcards(urls, rules).collect()[0]
    assert out["allowed"] is True


# ---------------------------------------------------------------------------
# Burrows' Delta stylometry ingredients
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.textstats import stylometry_ingredients


def test_stylometry_matrix_shape_and_counts(spark):
    docs = spark.createDataFrame(
        [("a", "the cat and the dog"),
         ("b", "the fish and a bird the")],
        "source string, text string")
    out = stylometry_ingredients(docs, top_f=2).collect()
    rows = {(r["word"], r["source"]): r for r in out}
    # corpus: the=4, and=2 -> markers (1, the), (2, and)
    assert len(out) == 4                       # 2 words x 2 sources
    assert rows[("the", "a")]["rank"] == 1
    assert rows[("the", "a")]["n_word"] == 2
    assert rows[("the", "b")]["n_word"] == 2
    assert rows[("and", "b")]["n_word"] == 1
    assert rows[("the", "a")]["n_source_tokens"] == 5
    assert rows[("the", "b")]["n_source_tokens"] == 6


def test_stylometry_zero_fills_missing_pairs(spark):
    docs = spark.createDataFrame(
        [("a", "x x x y"), ("b", "x x")],
        "source string, text string")
    out = {(r["word"], r["source"]): r["n_word"]
           for r in stylometry_ingredients(docs, top_f=2).collect()}
    assert out[("y", "b")] == 0                # explicit zero row


def test_stylometry_marker_tie_breaks_on_word(spark):
    docs = spark.createDataFrame(
        [("a", "b a")], "source string, text string")
    out = {r["rank"]: r["word"]
           for r in stylometry_ingredients(docs, top_f=2).collect()}
    assert out == {1: "a", 2: "b"}             # cf tie -> word asc


# ---------------------------------------------------------------------------
# Dirichlet query-likelihood retrieval
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.search import ql_search


def test_ql_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "date date date")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["score"]
           for r in ql_search(docs, ["apple", "banana"],
                              mu=10.0).collect()}
    # corpus: 8 tokens; p(apple)=2/8, p(banana)=2/8
    def score(tf_a, tf_b, dl):
        return round(
            math.log((tf_a + 10.0 * 0.25) / (dl + 10.0))
            + math.log((tf_b + 10.0 * 0.25) / (dl + 10.0)), 6)

    assert set(out) == {1, 2}          # doc 3 matches nothing
    assert out[1] == score(2, 1, 3)
    assert out[2] == score(0, 1, 2)
    # the longer, double-matching doc must outrank the single match
    assert out[1] > out[2]


def test_ql_oov_terms_dropped_not_minus_inf(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple")], "doc_id long, text string")
    out = ql_search(docs, ["apple", "zzz"], mu=10.0).collect()
    assert len(out) == 1
    import math
    assert math.isfinite(out[0]["score"])


# ---------------------------------------------------------------------------
# thresholded LexRank extractive summary
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.textstats import lexrank_summary


def test_lexrank_central_sentence_wins(spark):
    # s0 and s2 are near-identical; s1 shares terms with both; s3 is
    # unrelated. s1 connects to 0 and 2 only if cosine clears 0.3.
    text = ("the cat sat on the mat. "
            "the cat ran to the dog. "
            "the cat sat on the mat again. "
            "quantum flux capacitors hum quietly.")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = lexrank_summary(docs).collect()[0]
    assert r["n_sents"] == 4
    # the repeated 'cat sat mat' pair plus links to s1 makes s0 win
    assert r["top_sent_idx"] == 0
    assert r["top_degree"] >= 2
    assert r["summary"].startswith("the cat sat")


def test_lexrank_tie_breaks_to_earliest(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta. alpha beta. gamma delta. gamma delta.")],
        "doc_id long, text string")
    r = lexrank_summary(docs).collect()[0]
    # two symmetric pairs, every degree equal: earliest sentence wins
    assert r["top_sent_idx"] == 0


def test_lexrank_single_sentence_doc(spark):
    docs = spark.createDataFrame(
        [(1, "only one sentence here")], "doc_id long, text string")
    r = lexrank_summary(docs).collect()[0]
    assert (r["n_sents"], r["top_sent_idx"], r["top_degree"]) == (1, 0, 0)
    assert r["summary"] == "only one sentence here"


# ---------------------------------------------------------------------------
# integer-exact OPIC
# ---------------------------------------------------------------------------

from knowledge_graph_spark.operators.crawl import opic_ingredients


def test_opic_cash_conserved_and_history_grows(spark):
    out = opic_ingredients(_edges(spark, [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]),
        rounds=3, init_cash=100)
    rows = {r["id"]: r for r in out.collect()}
    assert sum(r["cash"] for r in rows.values()) == 300
    # c receives from both a and b: highest history
    assert rows["c"]["history"] == max(r["history"] for r in rows.values())


def test_opic_hand_computed_two_cycle(spark):
    out = opic_ingredients(_edges(spark, [("a", "b"), ("b", "a")]),
                           rounds=2, init_cash=7)
    rows = {r["id"]: r for r in out.collect()}
    # round 1: each sends 7 (outdeg 1, no remainder); round 2: 7 back
    assert rows["a"]["cash"] == 7 and rows["b"]["cash"] == 7
    assert rows["a"]["history"] == 14 and rows["b"]["history"] == 14


def test_opic_remainder_stays_home_and_dangling_keeps(spark):
    out = opic_ingredients(_edges(spark, [("a", "b"), ("a", "c")]),
                           rounds=1, init_cash=7)
    rows = {r["id"]: r for r in out.collect()}
    # a sends 3 each (7 DIV 2), keeps 1; b and c are dangling
    assert rows["a"]["cash"] == 1
    assert rows["b"]["cash"] == 10 and rows["c"]["cash"] == 10
    assert rows["b"]["history"] == 3 and rows["c"]["history"] == 3


# ---------------------------------------------------------------------------
# independent networkx references for the census suite
# ---------------------------------------------------------------------------


def _hash_graph(seed, n=14, thresh=80, directed=False):
    import hashlib

    pairs = []
    for u in range(n):
        for v in range(n):
            if u == v or (not directed and u >= v):
                continue
            h = hashlib.md5(f"{seed}:{u}:{v}".encode()).digest()[0]
            if h < thresh:
                pairs.append((f"n{u:02d}", f"n{v:02d}"))
    return pairs


def test_coreness_matches_networkx_core_number(spark):
    nx = pytest.importorskip("networkx", reason="independent reference")
    for seed in (1, 2, 3):
        pairs = _hash_graph(seed)
        G = nx.Graph()
        G.add_edges_from(pairs)
        want = nx.core_number(G)
        got = {r["id"]: r["coreness"]
               for r in coreness(_edges(spark, pairs)).collect()}
        assert got == want, f"seed {seed}"


def test_dyad_census_matches_networkx_reciprocity(spark):
    nx = pytest.importorskip("networkx", reason="independent reference")
    for seed in (1, 2):
        pairs = _hash_graph(seed, directed=True, thresh=60)
        G = nx.DiGraph()
        G.add_edges_from(pairs)
        r = dyad_census(_edges(spark, pairs)).collect()[0]
        m, a = r["mutual_dyads"], r["asym_dyads"]
        # nx.reciprocity = fraction of directed edges reciprocated
        assert 2 * m / (2 * m + a) == pytest.approx(
            nx.reciprocity(G)), f"seed {seed}"
        assert r["n_nodes"] == G.number_of_nodes()


def test_conductance_matches_networkx(spark):
    nx = pytest.importorskip("networkx", reason="independent reference")
    pairs = _hash_graph(4, n=16, thresh=90)
    G = nx.Graph()
    G.add_edges_from(pairs)
    labels = [(f"n{i:02d}", i % 3) for i in range(16)]
    lab_df = spark.createDataFrame(labels, "id string, community int")
    rows = {r["community"]: r for r in
            conductance_census(_edges(spark, pairs), lab_df).collect()}
    for c in (0, 1, 2):
        S = {n for n, l in labels if l == c and n in G}
        want = nx.conductance(G, S)
        r = rows[c]
        got = r["cut_edges"] / min(
            r["volume"], 2 * G.number_of_edges() - r["volume"])
        assert got == pytest.approx(want), f"community {c}"
        # identity check too
        assert r["volume"] == 2 * r["internal_edges"] + r["cut_edges"]


# ---------------------------------------------------------------------------
# round-5 advisor regressions
# ---------------------------------------------------------------------------


def test_temporal_conflicts_same_object_duplicate_not_conflict(spark):
    # two extraction runs asserting the SAME (s,p,o) with overlapping
    # validity are re-assertions, never conflicts (obj_a < obj_b
    # contract requires distinct objects)
    facts = _facts(spark, [
        ("acme", "ceo_of", "alice", _d("2021-01-01"), _d("2021-06-30")),
        ("acme", "ceo_of", "alice", _d("2021-03-01"), _d("2021-09-30")),
    ])
    assert temporal_conflicts(facts, ["ceo_of"]).count() == 0


def test_temporal_conflicts_duplicate_plus_real_conflict(spark):
    facts = _facts(spark, [
        ("acme", "ceo_of", "alice", _d("2021-01-01"), _d("2021-06-30")),
        ("acme", "ceo_of", "alice", _d("2021-02-01"), _d("2021-07-31")),
        ("acme", "ceo_of", "bob", _d("2021-06-01"), _d("2021-12-31")),
    ])
    out = temporal_conflicts(facts, ["ceo_of"]).collect()
    assert all(r["obj_a"] != r["obj_b"] for r in out)
    assert {(r["obj_a"], r["obj_b"]) for r in out} == {("alice", "bob")}
    assert len(out) == 2  # each alice interval conflicts with bob's


def test_kleinberg_single_series_all_events_defined(spark):
    # one series carries every event: unclamped p0 would be 1 and
    # (d-r)*ln(1-p0) NULL -> NULL costs/paths; the clamp keeps the
    # output defined and burst-free (rate can't exceed the base rate)
    counts = {"only": [5, 5, 5, 5]}
    out = kleinberg_bursts(_events(spark, counts), n_steps=4,
                           tau_scaled=1000).collect()
    assert len(out) == 1
    r = out[0]
    assert r["path"] is not None and len(r["path"]) == 4
    assert r["path"] == "0000"


def test_kcenter_k_exceeding_corpus_stops_at_n(spark):
    pts = _points(spark, [(1, [0.0, 0.0]), (2, [3.0, 0.0]),
                          (3, [0.0, 4.0])])
    rows = kcenter_coreset(pts, k=10).collect()
    ids = [r["center_id"] for r in rows]
    assert sorted(ids) == [1, 2, 3]          # no duplicate centers
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_kcenter_duplicate_vectors_terminate_early(spark):
    pts = _points(spark, [(1, [1.0, 1.0]), (2, [1.0, 1.0]),
                          (3, [1.0, 1.0])])
    rows = kcenter_coreset(pts, k=3).collect()
    ids = [r["center_id"] for r in rows]
    assert len(ids) == len(set(ids))         # never re-emit a center


def test_dyad_census_empty_graph_all_zeros_row(spark):
    row = dyad_census(_edges(spark, [])).collect()[0]
    assert (row["n_nodes"], row["mutual_dyads"], row["asym_dyads"],
            row["null_dyads"]) == (0, 0, 0, 0)


def test_robots_wildcard_query_string_is_matchable(spark):
    """RFC 9309 match target = path + query: 'Disallow: /*?' (one of
    the most common real rules) must match urls WITH a query, and an
    end anchor must see the query ('/doc.pdf?dl=1' does not end at
    .pdf) — r5 review finding: the query was stripped pre-match."""
    urls = _rurls(spark, ["/page?session=1", "/page"])
    rules = _rrules(spark, [("/*?", False)])
    out = {r["doc_id"]: r for r in
           robots_filter_wildcards(urls, rules).collect()}
    assert out[0]["allowed"] is False          # query rule fires
    assert out[0]["path"] == "/page?session=1"
    assert out[1]["allowed"] is True           # no query -> no match
    # end anchor must see the query: /doc.pdf?dl=1 does not end .pdf
    urls2 = _rurls(spark, ["/doc.pdf", "/doc.pdf?dl=1"])
    rules2 = _rrules(spark, [("/*.pdf$", False)])
    out2 = {r["doc_id"]: r["allowed"] for r in
            robots_filter_wildcards(urls2, rules2).collect()}
    assert out2[0] is False and out2[1] is True


def test_robots_literal_prefix_matches_into_query(spark):
    from knowledge_graph_spark.operators.crawl import robots_filter

    urls = spark.createDataFrame(
        [(1, "https://a.org/search?q=x"), (2, "https://a.org/search")],
        "doc_id long, url string")
    rules = spark.createDataFrame(
        [("a.org", "/search?", False)],
        "host string, path_prefix string, allow boolean")
    out = {r["doc_id"]: r["allowed"] for r in
           robots_filter(urls, rules).collect()}
    assert out[1] is False and out[2] is True


def test_robots_wildcard_specificity_counts_octets(spark):
    """Most-specific-wins compares OCTET length (the reference
    Googlebot rule): a 5-char/9-octet Allow must beat a
    7-char/7-octet Disallow when both match."""
    urls = _rurls(spark, ["/pуть-x"])  # /путь-x
    rules = _rrules(spark, [("/pуть*", True),
                            ("/p*", False)])
    out = robots_filter_wildcards(urls, rules).collect()[0]
    assert out["allowed"] is True
    urls2 = _rurls(spark, ["/ab"])
    # ASCII sanity: octet == char length, longer still wins
    rules2 = _rrules(spark, [("/a*", True), ("/ab*", False)])
    assert robots_filter_wildcards(
        urls2, rules2).collect()[0]["allowed"] is False
