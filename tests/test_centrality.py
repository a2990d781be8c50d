# -*- coding: utf-8 -*-
"""Hand-computed checks for the pivot-sampled centrality suite:
closeness/eccentricity census, Shimbel stress, Brandes betweenness.

Path graph a-b-c-d, pivot a (sigma = 1 everywhere):
  r: d=0, c=1, b=2  ->  stress b=2 (a->c, a->d), c=1 (a->d), d=0
  delta: c=1, b=2   ->  betweenness b=2, c=1
Diamond a-b, a-c, b-d, c-d, pivot a (sigma_d = 2):
  stress b=1, c=1, d=0; delta b = c = 0.5.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_spark.operators.graph_analytics import (
    centrality_census, stress_centrality)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _pivots(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_stress_path_single_pivot(spark):
    out = stress_centrality(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]),
        _pivots(spark, ["a"]))
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"b", "c", "d"}
    assert rows["b"]["stress"] == 2
    assert rows["c"]["stress"] == 1
    assert rows["d"]["stress"] == 0
    assert rows["b"]["betweenness"] == pytest.approx(2.0)
    assert rows["c"]["betweenness"] == pytest.approx(1.0)
    assert rows["d"]["betweenness"] == pytest.approx(0.0)


def test_stress_path_both_endpoints(spark):
    out = stress_centrality(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]),
        _pivots(spark, ["a", "d"]))
    rows = {r["id"]: r for r in out.collect()}
    # symmetric: each interior node accumulates from both pivots
    assert rows["b"]["stress"] == 2 + 1
    assert rows["c"]["stress"] == 1 + 2
    assert rows["a"]["stress"] == 0  # leaves are never interior
    assert rows["d"]["stress"] == 0
    assert rows["b"]["betweenness"] == pytest.approx(3.0)


def test_stress_diamond_sigma2(spark):
    out = stress_centrality(
        _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]),
        _pivots(spark, ["a"]))
    rows = {r["id"]: r for r in out.collect()}
    assert rows["b"]["stress"] == 1
    assert rows["c"]["stress"] == 1
    assert rows["d"]["stress"] == 0
    assert rows["b"]["betweenness"] == pytest.approx(0.5)
    assert rows["c"]["betweenness"] == pytest.approx(0.5)


def test_stress_horizon_bounded(spark):
    out = stress_centrality(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]),
        _pivots(spark, ["a"]), max_hops=2)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"b", "c"}
    # d is beyond the horizon: only a->c passes through b
    assert rows["b"]["stress"] == 1
    assert rows["c"]["stress"] == 0


def test_stress_pivot_not_endpoint(spark):
    out = stress_centrality(
        _edges(spark, [("a", "b")]), _pivots(spark, ["z"]))
    assert out.count() == 0


def test_closeness_census_path(spark):
    out = centrality_census(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")]),
        _pivots(spark, ["a", "d"]))
    rows = {r["id"]: r for r in out.collect()}
    assert rows["b"]["n_src"] == 2
    assert rows["b"]["sum_dist"] == 1 + 2
    assert rows["b"]["ecc"] == 2
    assert rows["a"]["sum_dist"] == 0 + 3
    assert rows["a"]["ecc"] == 3
    # diameter lower bound from the census
    assert max(r["ecc"] for r in rows.values()) == 3


def test_fellegi_sunter_separates_mixture(spark):
    from knowledge_graph_spark.operators.linking import (
        fellegi_sunter, fs_pattern_census)
    # 40 clear matches (all three fields agree), 160 clear
    # non-matches (none agree), 10 noisy rows per side
    rows = ([(True, True, True)] * 40 + [(False, False, False)] * 160
            + [(True, True, False)] * 10 + [(False, False, True)] * 10)
    pairs = spark.createDataFrame(
        rows, "a_f1 boolean, a_f2 boolean, a_f3 boolean")
    census = {r["pattern"]: r["n"] for r in
              fs_pattern_census(
                  pairs, ["a_f1", "a_f2", "a_f3"]).collect()}
    assert census == {7: 40, 0: 160, 3: 10, 4: 10}
    out = {r["pattern"]: r for r in
           fellegi_sunter(pairs, ["a_f1", "a_f2", "a_f3"]).collect()}
    assert out[7]["w_rank"] == 1          # all-agree ranks first
    assert out[7]["posterior"] > 0.9
    assert out[0]["posterior"] < 0.1
    assert out[7]["weight"] > out[3]["weight"] > out[0]["weight"]


def test_fellegi_sunter_empty_raises(spark):
    from knowledge_graph_spark.operators.linking import fellegi_sunter
    pairs = spark.createDataFrame([], "a boolean, b boolean")
    with pytest.raises(ValueError):
        fellegi_sunter(pairs, ["a", "b"])


def test_sorted_neighborhood_window3(spark):
    from knowledge_graph_spark.operators.linking import (
        sorted_neighborhood)
    # keys sort as: x(10), y(10), z(25), w(3007), v(3009)
    # (tie 10/10 broken by id: x < y); slice_width=1000 forces a
    # slice boundary between z and w
    items = spark.createDataFrame(
        [("x", 10), ("y", 10), ("z", 25), ("w", 3007), ("v", 3009)],
        "id string, k long")
    out = sorted_neighborhood(items, "k", "id", window=3,
                              slice_width=1000)
    pairs = {(r["a"], r["b"]): r["gap"] for r in out.collect()}
    assert pairs == {
        ("x", "y"): 1, ("x", "z"): 2, ("y", "z"): 1,
        ("y", "w"): 2, ("z", "w"): 1, ("z", "v"): 2, ("w", "v"): 1,
    }


def test_sorted_neighborhood_bad_window(spark):
    from knowledge_graph_spark.operators.linking import (
        sorted_neighborhood)
    items = spark.createDataFrame([("x", 1)], "id string, k long")
    with pytest.raises(ValueError):
        sorted_neighborhood(items, "k", "id", window=1)


def test_salsa_closed_form(spark):
    from knowledge_graph_spark.operators.graph_analytics import salsa
    edges = spark.createDataFrame(
        [("h1", "a"), ("h1", "b"), ("h2", "b"), ("h2", "c"),
         ("h3", "d")], "src string, dst string")
    out = {(r["side"], r["id"]): r for r in salsa(edges).collect()}
    # authority component {a,b,c} (co-cited chain), singleton {d}
    assert out[("authority", "b")]["deg"] == 2
    assert out[("authority", "b")]["comp_size"] == 3
    assert out[("authority", "b")]["comp_deg"] == 4
    assert out[("authority", "b")]["score"] == pytest.approx(0.375)
    assert out[("authority", "a")]["score"] == pytest.approx(0.1875)
    assert out[("authority", "d")]["score"] == pytest.approx(0.25)
    # hub side: {h1,h2} share b; h3 alone; scores all 1/3
    for h in ("h1", "h2", "h3"):
        assert out[("hub", h)]["score"] == pytest.approx(1 / 3)
    # stationary: each side sums to 1
    assert sum(r["score"] for k, r in out.items()
               if k[0] == "authority") == pytest.approx(1.0)
    assert sum(r["score"] for k, r in out.items()
               if k[0] == "hub") == pytest.approx(1.0)


def test_dawid_skene_recovers_truth(spark):
    from knowledge_graph_spark.operators.labels import dawid_skene
    rows = []
    for i in range(30):
        t = i % 2
        for w, vote in (("a", t), ("b", t), ("c", t),
                        ("d", 1 - t), ("e", 1)):
            rows.append((i, w, vote))
    votes = spark.createDataFrame(
        rows, "item long, worker string, label int")
    items, workers = dawid_skene(votes)
    it = {r["item"]: r for r in items.collect()}
    assert all(it[i]["label_hat"] == i % 2 for i in range(30))
    assert it[0]["n_votes"] == 5
    assert it[1]["n_pos"] == 4          # t=1: a,b,c vote 1, e votes 1
    wk = {r["worker"]: r for r in workers.collect()}
    # reliable raters: high sensitivity and specificity
    for w in ("a", "b", "c"):
        assert wk[w]["alpha"] > 0.95 and wk[w]["beta"] > 0.95
    # adversarial rater: inverted profile
    assert wk["d"]["alpha"] < 0.05 and wk["d"]["beta"] < 0.05
    # always-1 rater: perfect sensitivity, zero specificity
    assert wk["e"]["alpha"] > 0.95 and wk["e"]["beta"] < 0.05


def test_dawid_skene_empty_raises(spark):
    from knowledge_graph_spark.operators.labels import dawid_skene
    votes = spark.createDataFrame([], "item long, worker string, label int")
    with pytest.raises(ValueError):
        dawid_skene(votes)


def test_rich_club_census(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        rich_club_census)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")],
        "src string, dst string")
    out = {r["k"]: (r["n_nodes"], r["n_edges"])
           for r in rich_club_census(edges, [0, 1, 2, 5]).collect()}
    assert out == {0: (4, 4), 1: (3, 3), 2: (1, 0), 5: (0, 0)}


def test_rich_club_empty_ks(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        rich_club_census)
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        rich_club_census(edges, [])


def test_yule_census_hand_counts(spark):
    from knowledge_graph_spark.operators.textstats import yule_census
    docs = spark.createDataFrame(
        [("en", "the cat the dog"), ("en", "the cat"),
         ("zh", "one two three")],
        "lang string, text string")
    out = {r["slice"]: r for r in yule_census(docs).collect()}
    # en: tokens the×3 cat×2 dog×1 -> N=6 V=3 S2=9+4+1=14
    assert (out["en"]["n_tokens"], out["en"]["n_types"],
            out["en"]["sum_f_sq"]) == (6, 3, 14)
    assert (out["zh"]["n_tokens"], out["zh"]["n_types"],
            out["zh"]["sum_f_sq"]) == (3, 3, 3)
    # K = 1e4 (S2 - N) / N^2
    assert 1e4 * (14 - 6) / 36 == pytest.approx(2222.2, abs=0.1)


def test_log_odds_terms_distinctive(spark):
    from knowledge_graph_spark.operators.textstats import log_odds_terms
    docs = spark.createDataFrame(
        [("a", "alpha alpha alpha shared shared")] * 5
        + [("b", "beta beta beta shared shared")] * 5,
        "lang string, text string")
    out = log_odds_terms(docs, "a", "b", min_count=5,
                         top_k=3).collect()
    ranked = [r["term"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == "alpha"          # most a-distinctive
    assert "beta" in ranked              # most negative z still in k=3
    za = {r["term"]: r["z"] for r in out}
    assert za["alpha"] > 0 > za["beta"]
    assert abs(za["shared"]) < 1.0


def test_bcubed_ingredients(spark):
    from knowledge_graph_spark.operators.linking import bcubed_ingredients
    pred = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "id long, cluster string")
    gold = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "X"), (4, "Y")],
        "id long, cluster string")
    out = {r["id"]: r for r in bcubed_ingredients(pred, gold).collect()}
    assert (out[1]["c_size"], out[1]["g_size"], out[1]["overlap"]) \
        == (2, 3, 2)
    assert (out[3]["c_size"], out[3]["g_size"], out[3]["overlap"]) \
        == (2, 3, 1)
    assert (out[4]["c_size"], out[4]["g_size"], out[4]["overlap"]) \
        == (2, 1, 1)
    # B-cubed P/R from the census (hand): P = avg(o/c) = (1+1+.5+.5)/4
    p = sum(r["overlap"] / r["c_size"] for r in out.values()) / 4
    r_ = sum(r["overlap"] / r["g_size"] for r in out.values()) / 4
    assert p == pytest.approx(0.75)
    assert r_ == pytest.approx((2 / 3 + 2 / 3 + 1 / 3 + 1) / 4)


def test_zorder_key_interleaves(spark):
    from knowledge_graph_spark.functions.layout import zorder_key2
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)],
        "a long, b long")
    out = [r["z"] for r in
           df.select(zorder_key2("a", "b").alias("z")).collect()]
    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    assert out == [morton(a, b) for a, b in
                   [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]
    assert out[0] == 0 and out[1] == 1 and out[2] == 2
    assert out[4] == (1 << 32) - 1


def test_zorder_locality(spark):
    from knowledge_graph_spark.functions.layout import zorder_key2
    # z-ordered 16x16 grid: any 64-key range covers a small rectangle
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long")
        .alias("y"))
    rows = (df.select("x", "y", zorder_key2("x", "y").alias("z"))
            .orderBy("z").collect())
    first = rows[:64]
    assert max(r["x"] for r in first) <= 7
    assert max(r["y"] for r in first) <= 7


def test_allen_census_classifies(spark):
    from knowledge_graph_spark.operators.temporal import allen_census
    iv = spark.createDataFrame(
        [("g", 1, 0, 10), ("g", 2, 0, 10),    # equals
         ("g", 3, 10, 20),                    # meets 1&2; during? no
         ("g", 4, 2, 5),                      # during 1,2; before 3
         ("h", 1, 0, 3), ("h", 2, 1, 5)],     # overlaps
        "g string, i long, s long, e long")
    out = {r["relation"]: r["n"] for r in
           allen_census(iv, "g", "i", "s", "e").collect()}
    # pairs in g: (1,2) equals, (1,3) meets, (2,3) meets,
    # (1,4) contains, (2,4) contains, (3,4) after; h: (1,2) overlaps
    assert out == {"equals": 1, "meets": 2, "contains": 2,
                   "after": 1, "overlaps": 1}


def test_dominant_matching_cascade(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        dominant_matching)
    edges = spark.createDataFrame(
        [("a", "x", 9), ("b", "x", 8), ("b", "y", 7)],
        "src string, dst string, w long")
    # round 1: a-x dominant (both prefer it); round 2: b-y
    out = {(r["src"], r["dst"]): r["w"]
           for r in dominant_matching(edges).collect()}
    assert out == {("a", "x"): 9, ("b", "y"): 7}


def test_dominant_matching_tiebreak_and_horizon(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        dominant_matching)
    edges = spark.createDataFrame(
        [("a", "v1", 5), ("a", "v2", 5)],
        "src string, dst string, w long")
    out = dominant_matching(edges).collect()
    # equal weights: lexicographic max partner wins
    assert [(r["src"], r["dst"]) for r in out] == [("a", "v2")]
    # horizon 0 rounds -> empty matching, empty schema preserved
    assert dominant_matching(edges, rounds=0).count() == 0


def test_kneser_ney_ingredients(spark):
    from knowledge_graph_spark.operators.textstats import (
        kneser_ney_ingredients)
    docs = spark.createDataFrame(
        [("a b a b c",), ("x b",)], "text string")
    out = {(r["w1"], r["w2"]): r for r in
           kneser_ney_ingredients(docs, min_count=1).collect()}
    # bigrams doc1: (a,b)x2 (b,a) (b,c); doc2: (x,b) — no cross-doc
    assert out[("a", "b")]["c_big"] == 2
    assert out[("a", "b")]["c_w1"] == 2          # 'a' history count
    assert out[("a", "b")]["n1p_hist"] == 1      # a -> {b}
    assert out[("a", "b")]["n1p_cont"] == 2      # b after {a, x}
    assert out[("b", "a")]["c_w1"] == 2          # b -> a, c
    assert out[("b", "a")]["n1p_hist"] == 2
    assert ("b", "x") not in out                 # never crosses docs


def test_dawid_skene_unanimous_votes_do_not_crash(spark):
    """Every vote 0 drives the posterior q to exactly 0, zeroing the
    alpha M-step denominator — under ANSI Spark that divided by zero
    and killed the job (r5 review finding). The floored denominator
    must yield a defined, clamped result instead."""
    from knowledge_graph_spark.operators.labels import dawid_skene

    votes = spark.createDataFrame(
        [(i, w, 0) for i in range(6) for w in range(3)],
        "item long, worker long, label int")
    items, workers = dawid_skene(votes, iterations=3)
    rows = items.collect()
    assert len(rows) == 6
    assert all(r["label_hat"] == 0 and r["q"] is not None for r in rows)
    wrows = workers.collect()
    assert all(w["alpha"] is not None and w["beta"] is not None
               for w in wrows)
