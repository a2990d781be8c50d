# -*- coding: utf-8 -*-
"""Rule mining (AMIE, characteristic sets), iterative truth
discovery, and DIRT path-synonym mining — hand-computed twins."""

import pytest

from knowledge_graph_spark.operators.fusion import truth_discovery
from knowledge_graph_spark.operators.patterns import dirt_paths
from knowledge_graph_spark.operators.rules import (
    amie_rules, characteristic_sets)


@pytest.fixture(scope="module")
def kb(spark):
    rows = [
        ("s1", "supplies", "p1"), ("s1", "supplies", "p2"),
        ("p1", "has_brand", "b1"), ("p2", "has_brand", "b1"),
        ("s1", "makes_brand", "b1"),
        ("s2", "supplies", "p3"), ("p3", "has_brand", "b2"),
        # duplicate triple: must collapse before mining
        ("s1", "supplies", "p1"),
        # NULL row: dropped
        (None, "supplies", "p9"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_amie_support_and_denominators(kb):
    out = {(r.r1, r.r2, r.r3): r
           for r in amie_rules(kb, min_support=1).collect()}
    # body supplies∘has_brand: distinct (x, y) = (s1,b1), (s2,b2)
    # head makes_brand covers only (s1,b1); PCA: only s1 has any
    # makes_brand edge -> pca_pairs counts body pairs with x=s1
    r = out[("supplies", "has_brand", "makes_brand")]
    assert (r.support, r.body_pairs, r.pca_pairs) == (1, 2, 1)
    # head supplies on body pairs? (x,y)=(s1,b1) needs supplies(s1,b1)
    # — absent, so no (supplies, has_brand, supplies) rule
    assert ("supplies", "has_brand", "supplies") not in out


def test_amie_min_support_filters(kb):
    assert amie_rules(kb, min_support=2).count() == 0


def test_amie_z_degree_guard(kb):
    # s1 supplies two parts -> z = p1/p2 each degree 1; cap 0 is
    # impossible so everything drops
    assert amie_rules(kb, min_support=1, max_z_degree=0).count() == 0
    # generous cap changes nothing
    r = amie_rules(kb, min_support=1, max_z_degree=100).collect()
    assert len(r) == 1


def test_characteristic_sets(kb):
    out = {r.char_set: r for r in characteristic_sets(kb).collect()}
    # s1: supplies x3 rows (dup counts as a triple) + makes_brand
    r = out["makes_brand,supplies"]
    assert (r.set_size, r.n_subjects, r.n_triples) == (2, 1, 4)
    assert out["has_brand"].n_subjects == 3
    assert out["supplies"].n_subjects == 1  # s2
    # NULL subject contributes no set
    assert sum(r.n_subjects for r in out.values()) == 5


def test_truth_discovery_hand_computed(spark):
    a = spark.createDataFrame(
        [("s1", "e1", "hq", "oslo"), ("s2", "e1", "hq", "oslo"),
         ("s3", "e1", "hq", "bergen"),
         ("s1", "e2", "hq", "rome"), ("s3", "e2", "hq", "rome"),
         ("s3", "e1", "ceo", "ann"),
         # duplicate assertion by the same source: votes once
         ("s1", "e1", "hq", "oslo")],
        "source_id string, subj string, pred string, obj string")
    out = {(r.subj, r.pred): r
           for r in truth_discovery(a, n_iters=3).collect()}
    # hand-run: c1 oslo=2 bergen=1 rome=2 ann=1; t1 s1=4 s2=2 s3=4;
    # c2 oslo=6 bergen=4 rome=8 ann=4; t2 s1=14 s2=6 s3=16;
    # c3 oslo=20 bergen=16 rome=30 ann=16
    r = out[("e1", "hq")]
    assert (r.obj, r.belief, r.n_sources, r.n_objects) == \
        ("oslo", 20, 2, 2)
    assert out[("e2", "hq")].belief == 30
    assert out[("e1", "ceo")].belief == 16


def test_truth_discovery_one_iter_is_vote_count(spark):
    a = spark.createDataFrame(
        [("s1", "e", "p", "x"), ("s2", "e", "p", "x"),
         ("s3", "e", "p", "y")],
        "source_id string, subj string, pred string, obj string")
    r = truth_discovery(a, n_iters=1).collect()[0]
    assert (r.obj, r.belief) == ("x", 2)
    with pytest.raises(ValueError):
        truth_discovery(a, n_iters=0)


def test_truth_discovery_tie_breaks_to_smaller_obj(spark):
    a = spark.createDataFrame(
        [("s1", "e", "p", "zz"), ("s2", "e", "p", "aa")],
        "source_id string, subj string, pred string, obj string")
    # symmetric evidence at every iteration -> tie -> obj asc
    r = truth_discovery(a, n_iters=3).collect()[0]
    assert r.obj == "aa"


def test_dirt_paths_paraphrase(spark):
    docs = spark.createDataFrame(
        [(1, "Alice works at Acme and Bob works at Globex"),
         (2, "Alice joined Acme while Bob joined Globex"),
         (3, "Carol works at Initech and Carol joined Initech"),
         (4, None)],
        "doc_id int, text string")
    out = dirt_paths(docs, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    # shared argument pairs: (Alice,Acme), (Bob,Globex),
    # (Carol,Initech); each path also has exactly those 3 pairs
    assert (r.path_a, r.path_b, r.n_shared, r.n_a, r.n_b) == \
        ("joined", "works at", 3, 3, 3)


def test_dirt_paths_promiscuous_pair_guard(spark):
    # one argument pair connected by 3 middles; cap 2 drops the
    # bucket whole -> no co-occurrence evidence survives
    docs = spark.createDataFrame(
        [(1, "Alice works at Acme"), (2, "Alice joined Acme"),
         (3, "Alice runs Acme")],
        "doc_id int, text string")
    assert dirt_paths(docs, min_shared=1, max_pair_paths=2).count() == 0
    assert dirt_paths(docs, min_shared=1, max_pair_paths=3).count() == 3


def test_er_pair_metrics_hand_computed(spark):
    from knowledge_graph_spark.operators.linking import er_pair_metrics
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "id int, cluster string")
    gold = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y"), (6, "z"),
         (7, "w")],  # id 7 absent from pred: dropped (inner join)
        "id int, cluster string")
    r = er_pair_metrics(pred, gold).collect()[0]
    # pred pairs C(3,2)+C(2,2)... a=3, b=1, c=0 -> 4; gold x=1,y=3 -> 4
    # cells (a,x)=1,(a,y)=0,(b,y)=1 -> tp=2
    assert (r.n_items, r.n_pred_clusters, r.n_gold_clusters,
            r.tp, r.fp, r.fn) == (6, 3, 3, 2, 2, 2)


def test_er_pair_metrics_perfect_and_singletons(spark):
    from knowledge_graph_spark.operators.linking import er_pair_metrics
    d = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, cluster string")
    r = er_pair_metrics(d, d).collect()[0]
    # all-singleton: zero pairs anywhere, sums must coalesce to 0
    assert (r.tp, r.fp, r.fn) == (0, 0, 0)


def test_canonicalize_predicates_chain(spark):
    from knowledge_graph_spark.operators.patterns import (
        canonicalize_predicates)
    docs = spark.createDataFrame(
        [(1, "Alice works at Acme and Bob works at Globex"),
         (2, "Alice joined Acme while Bob joined Globex"),
         (3, "Carol works at Initech and Carol joined Initech")],
        "doc_id int, text string")
    out = {r.path: r.canonical
           for r in canonicalize_predicates(docs, min_shared=2).collect()}
    # 'joined' ~ 'works at' share all 3 pairs (J=1) -> one cluster,
    # canonical = min path
    assert out == {"joined": "joined", "works at": "joined"}


def test_kb_diff_hand_computed(spark):
    from knowledge_graph_spark.operators.rules import kb_diff
    old = spark.createDataFrame(
        [("e1", "hq", "oslo"), ("e2", "hq", "rome"), ("e3", "hq", "nyc"),
         ("e1", "ceo", "ann"), ("e1", "ceo", "bob")],
        "subj string, pred string, obj string")
    new = spark.createDataFrame(
        [("e1", "hq", "bergen"), ("e2", "hq", "rome"),
         ("e1", "ceo", "ann"), ("e1", "ceo", "bob"),
         ("e4", "hq", "lima")],
        "subj string, pred string, obj string")
    out = {r.pred: r for r in kb_diff(old, new).collect()}
    r = out["hq"]
    # added: bergen, lima; removed: oslo, nyc; retained: rome;
    # changed keys: (e1, hq) — present both sides, object set differs.
    # (e3, hq) and (e4, hq) are one-sided keys, NOT changed.
    assert (r.n_added, r.n_removed, r.n_retained, r.n_changed_keys) \
        == (2, 2, 1, 1)
    assert (out["ceo"].n_added, out["ceo"].n_removed,
            out["ceo"].n_retained, out["ceo"].n_changed_keys) \
        == (0, 0, 2, 0)


def test_blocking_metrics_hand_computed(spark):
    from pyspark.sql import functions as F
    from knowledge_graph_spark.operators.linking import blocking_metrics
    items = spark.createDataFrame(
        [(1, "h1", "A", "x"), (2, "h1", "A", "y"), (3, "h2", "B", "x"),
         (4, "h2", "B", "y"), (5, None, "A", "z"), (6, "h3", None, "x")],
        "doc_id int, content_key string, band1 string, band2 string")
    r = blocking_metrics(
        items, [F.col("band1"), F.col("band2")]).collect()[0]
    # band1 buckets A={1,2,5} B={3,4}; band2 x={1,3,6} y={2,4} z={5}
    # cand = {12,15,25,34} ∪ {13,16,36,24} = 8; hits: (1,2) and (3,4);
    # gold: h1 -> 1 pair, h2 -> 1 pair (NULL truth is not a dup)
    assert (r.n_items, r.total_pairs, r.n_cand, r.n_hit, r.n_gold) \
        == (6, 15, 8, 2, 2)


def test_blocking_metrics_bucket_guard(spark):
    from pyspark.sql import functions as F
    from knowledge_graph_spark.operators.linking import blocking_metrics
    items = spark.createDataFrame(
        [(i, "h", "A") for i in range(10)],
        "doc_id int, content_key string, band1 string")
    # one 10-doc bucket: cap 4 drops it whole -> zero candidates,
    # but gold pairs still count (blocker recall failure is visible)
    r = blocking_metrics(items, [F.col("band1")],
                         max_bucket=4).collect()[0]
    assert (r.n_cand, r.n_hit, r.n_gold) == (0, 0, 45)


def test_pathsim_hand_computed(spark):
    from knowledge_graph_spark.operators.graph_analytics import pathsim
    e = spark.createDataFrame(
        [(1, "p1"), (1, "p2"), (2, "p1"), (2, "p2"), (2, "p3"),
         (3, "p3"), (1, "p1")],  # duplicate edge collapses
        "src int, dst string")
    out = {(r.id_a, r.id_b): r for r in pathsim(e).collect()}
    assert (out[(1, 2)].n_ab, out[(1, 2)].n_aa, out[(1, 2)].n_bb) \
        == (2, 2, 3)
    assert out[(2, 3)].n_ab == 1
    assert (1, 3) not in out  # no shared neighbor


def test_pathsim_hub_guard(spark):
    from knowledge_graph_spark.operators.graph_analytics import pathsim
    e = spark.createDataFrame(
        [(i, "hub") for i in range(5)] + [(0, "x"), (1, "x")],
        "src int, dst string")
    out = {(r.id_a, r.id_b): r
           for r in pathsim(e, max_dst_degree=4).collect()}
    # the 5-degree hub is dropped whole; only x contributes, and the
    # degrees are counted over the SAME capped edge set
    assert out == {k: v for k, v in out.items()}
    assert list(out) == [(0, 1)]
    assert (out[(0, 1)].n_ab, out[(0, 1)].n_aa, out[(0, 1)].n_bb) \
        == (1, 1, 1)


def test_set_expansion_seeds_and_scores(spark):
    from knowledge_graph_spark.operators.patterns import set_expansion
    docs = spark.createDataFrame(
        [(1, "we use python, java and rust daily"),
         (2, "python, go and rust are fast"),
         (3, "apples, pears and plums here")],
        "doc_id int, text string")
    seeds = spark.createDataFrame(
        [("Python",), ("java",)], "item string")  # case-folds
    out = {r.item: r for r in set_expansion(docs, seeds).collect()}
    # rust: with python in docs 1+2 and java in doc 1 -> 2 docs, 2 seeds
    assert (out["rust"].n_seed_docs, out["rust"].n_seeds) == (2, 2)
    assert (out["go"].n_seed_docs, out["go"].n_seeds) == (1, 1)
    assert "python" not in out and "java" not in out  # anti-joined
    assert "apples" not in out  # no seed in its list


def test_seeded_label_propagation(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        seeded_label_propagation)
    import pytest as _pt
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 4), (6, 7), (2, 1)],  # dup dir
        "src int, dst int")
    seeds = spark.createDataFrame(
        [(1, "news"), (5, "shop")], "node int, label string")
    out = {r.node: r.label
           for r in seeded_label_propagation(e, seeds, 2).collect()}
    # round 1: 2<-news, 4<-shop; round 2: 3 sees {news, shop} tie ->
    # 'news' (lexical); 6/7 unreachable from any seed -> absent;
    # seeds clamped
    assert out == {1: "news", 2: "news", 3: "news", 4: "shop",
                   5: "shop"}
    with _pt.raises(ValueError):
        seeded_label_propagation(e, seeds, 0)


def test_seed_clamp_beats_neighbors(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        seeded_label_propagation)
    # seed 1 surrounded by 'shop' seeds must KEEP its own label
    e = spark.createDataFrame([(1, 2), (1, 3)], "src int, dst int")
    seeds = spark.createDataFrame(
        [(1, "news"), (2, "shop"), (3, "shop")], "node int, label string")
    out = {r.node: r.label
           for r in seeded_label_propagation(e, seeds, 3).collect()}
    assert out[1] == "news"


def test_frequent_item_pairs(spark):
    from knowledge_graph_spark.operators.assoc import frequent_item_pairs
    b = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (3, "x"),
         (3, "y"), (4, "q"), (1, "x")],  # dup (1,x) collapses
        "basket int, item string")
    out = frequent_item_pairs(b, min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.pair_count, r.count_a, r.count_b,
            r.n_baskets) == ("x", "y", 3, 3, 3, 4)


def test_frequent_item_pairs_basket_guard(spark):
    from knowledge_graph_spark.operators.assoc import frequent_item_pairs
    rows = [(1, f"i{k}") for k in range(5)] + \
        [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    b = spark.createDataFrame(rows, "basket int, item string")
    # basket 1 (5 items) dropped whole by cap 4 — from EVERY
    # statistic (r5: supports/census share the guarded universe so
    # confidence = pair_count/count never mixes censuses)
    r = frequent_item_pairs(b, min_support=2, max_basket=4).collect()[0]
    assert (r.item_a, r.item_b, r.pair_count, r.count_a, r.count_b) \
        == ("i0", "i1", 2, 2, 2)
    assert r.n_baskets == 2


def test_seeded_lpa_conflicting_seed_resolves_min(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        seeded_label_propagation)
    e = spark.createDataFrame([(1, 2)], "src int, dst int")
    seeds = spark.createDataFrame(
        [(1, "zoo"), (1, "art")], "node int, label string")
    out = seeded_label_propagation(e, seeds, 1).collect()
    got = {r.node: r.label for r in out}
    assert got == {1: "art", 2: "art"}
    assert len(out) == 2  # no duplicate rows for the seeded node


def test_blocking_metrics_empty_bands_raises(spark):
    import pytest as _pt
    from knowledge_graph_spark.operators.linking import blocking_metrics
    d = spark.createDataFrame([(1, "h")], "doc_id int, content_key string")
    with _pt.raises(ValueError):
        blocking_metrics(d, [])


def test_apply_rules_infers_missing_heads(kb):
    from knowledge_graph_spark.operators.rules import apply_rules
    rules = amie_rules(kb, min_support=1)
    out = apply_rules(kb, rules).collect()
    # body pairs (s1,b1), (s2,b2); makes_brand(s1,b1) already
    # asserted -> only (s2, makes_brand, b2) is NEW
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.pred, r.obj) == ("s2", "makes_brand", "b2")
    assert (r.r1, r.r2) == ("supplies", "has_brand")
    assert (r.support, r.body_pairs, r.pca_pairs) == (1, 2, 1)


def test_apply_rules_integer_conf_gate(kb):
    from knowledge_graph_spark.operators.rules import apply_rules
    rules = amie_rules(kb, min_support=1)
    # CWA conf = 1/2: kept at exactly 50%, dropped at 51%
    assert apply_rules(kb, rules, min_conf_pct=50).count() == 1
    assert apply_rules(kb, rules, min_conf_pct=51).count() == 0


def test_predicate_stats(kb):
    from knowledge_graph_spark.operators.rules import predicate_stats
    out = {r.pred: r for r in predicate_stats(kb).collect()}
    s = out["supplies"]
    assert (s.n_triples, s.n_subjects, s.n_objects,
            s.max_fanout, s.max_fanin) == (3, 2, 3, 2, 1)
    h = out["has_brand"]
    assert (h.n_triples, h.n_subjects, h.n_objects,
            h.max_fanout, h.max_fanin) == (3, 3, 2, 1, 2)
    m = out["makes_brand"]
    assert (m.n_triples, m.max_fanout, m.max_fanin) == (1, 1, 1)


def test_complete_kb_equals_mine_then_apply(kb):
    from knowledge_graph_spark.operators.rules import (
        apply_rules, complete_kb)
    fused = {tuple(r) for r in complete_kb(kb, min_support=1).collect()}
    composed = {tuple(r)
                for r in apply_rules(kb, amie_rules(kb, min_support=1))
                .collect()}
    assert fused == composed and len(fused) == 1


def test_complete_kb_conf_gate(kb):
    from knowledge_graph_spark.operators.rules import complete_kb
    assert complete_kb(kb, min_support=1, min_conf_pct=51).count() == 0


def test_amie_assume_distinct_equivalent(kb):
    deduped = kb.dropna().distinct()
    a = {tuple(r) for r in amie_rules(kb, min_support=1).collect()}
    b = {tuple(r) for r in amie_rules(deduped, min_support=1,
                                      assume_distinct=True).collect()}
    assert a == b
