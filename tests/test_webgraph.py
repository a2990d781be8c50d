# -*- coding: utf-8 -*-
"""SCC / bowtie / HyperANF unit tests (web-graph census operators)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from knowledge_graph_spark.operators.graph_analytics import (
    bowtie_regions, neighborhood_function, strongly_connected_components,
)


def _scc_map(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["id"]: r["scc_id"]
            for r in strongly_connected_components(df).collect()}


def test_scc_cycles_and_singletons(spark):
    # a->b->c->a (SCC abc), d->a (singleton), c->e, e<->f (SCC ef)
    out = _scc_map(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                           ("d", "a"), ("c", "e"), ("e", "f"), ("f", "e")])
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["d"] == "d"
    assert out["e"] == out["f"] == "e"
    assert len(out) == 6


def test_scc_condensation_chain_needs_peeling(spark):
    """A chain of 2-cycles (1<->2) -> (3<->4) -> (5<->6): nodes 3..6
    see ancestor 1 in round one (f != b), so only outer peeling
    resolves them — the progress-guarantee path."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5), (5, 6), (6, 5)],
        "src long, dst long")
    out = {r["id"]: r["scc_id"]
           for r in strongly_connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}


def _kosaraju(nodes, edges):
    fwd = {n: [] for n in nodes}
    rev = {n: [] for n in nodes}
    for u, v in edges:
        fwd[u].append(v)
        rev[v].append(u)
    seen, order = set(), []
    for n in sorted(nodes):
        if n in seen:
            continue
        stack = [(n, iter(fwd[n]))]
        seen.add(n)
        while stack:
            node, it = stack[-1]
            advanced = False
            for m in it:
                if m not in seen:
                    seen.add(m)
                    stack.append((m, iter(fwd[m])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    comp = {}
    for n in reversed(order):
        if n in comp:
            continue
        members, stack = [], [n]
        comp[n] = None
        while stack:
            x = stack.pop()
            members.append(x)
            for m in rev[x]:
                if m not in comp:
                    comp[m] = None
                    stack.append(m)
        root = min(members)
        for x in members:
            comp[x] = root
    return comp


def test_scc_matches_kosaraju_on_seeded_random_graph(spark):
    """60 md5-seeded edges over 30 int nodes vs a pure-Python Kosaraju
    twin — the structural fuzz case for the peeling loop."""
    edges = []
    for i in range(60):
        h = hashlib.md5(f"scc-{i}".encode()).hexdigest()
        u, v = int(h[:4], 16) % 30, int(h[4:8], 16) % 30
        if u != v:
            edges.append((u, v))
    nodes = sorted({x for e in edges for x in e})
    expected = _kosaraju(nodes, edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["scc_id"]
           for r in strongly_connected_components(df).collect()}
    assert got == expected


def test_bowtie_regions_canonical_graph(spark):
    """Every Broder region non-empty: 3-cycle CORE, IN feeder, OUT
    sink, a TUBE bypassing core, a tendril off IN, a tendril FEEDING
    OUT (reaches OUT but neither reaches core nor is reached from it),
    a dangler DOWNSTREAM of OUT (reachable from core, hence OUT
    itself), and a 2-cycle island (DISC)."""
    edges = spark.createDataFrame(
        [("c1", "c2"), ("c2", "c3"), ("c3", "c1"),   # CORE
         ("in1", "c1"),                                # IN
         ("c2", "o1"),                                 # OUT
         ("in1", "tb1"), ("tb1", "o1"),                # TUBE
         ("in1", "t1"),                                # TENDRIL (off IN)
         ("t3", "o1"),                                 # TENDRIL (into OUT)
         ("o1", "t2"),                                 # downstream => OUT
         ("d1", "d2"), ("d2", "d1")],                  # DISC island
        "src string, dst string")
    got = {r["id"]: r["region"] for r in bowtie_regions(edges).collect()}
    assert got == {"c1": "CORE", "c2": "CORE", "c3": "CORE",
                   "in1": "IN", "o1": "OUT", "t2": "OUT", "tb1": "TUBE",
                   "t1": "TENDRIL", "t3": "TENDRIL",
                   "d1": "DISC", "d2": "DISC"}


def test_neighborhood_function_equals_explicit_ball_sketch(spark):
    """nf(t) must EQUAL the HLL estimate of the explicitly enumerated
    out-ball — register-wise max of singleton sketches is exactly the
    sketch of the union, so sketch-propagation loses nothing vs
    sketching the closure directly."""
    from knowledge_graph_spark.operators.sketches import hll_distinct

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")],
        "src string, dst string")
    nf = neighborhood_function(edges, rounds=2, p=4)
    got = {(r["t"], r["id"]): (r["n_registers"], r["ball_est"])
           for r in nf.collect()}
    balls_t2 = {"a": ["a", "b", "c", "e"], "b": ["b", "c", "d", "e"],
                "c": ["c", "d"], "d": ["d"], "e": ["e"]}
    rows = [(node, m) for node, ball in balls_t2.items() for m in ball]
    ref = spark.createDataFrame(rows, "id string, member string")
    expected = {r["id"]: (r["n_registers"], r["est_distinct"])
                for r in hll_distinct(ref, "member", ["id"], p=4).collect()}
    for node, exp in expected.items():
        assert got[(2, node)] == exp, node


def test_neighborhood_function_monotone_in_t(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    nf = neighborhood_function(edges, rounds=3, p=4).collect()
    by_node = {}
    for r in nf:
        by_node.setdefault(r["id"], {})[r["t"]] = r["ball_est"]
    for node, series in by_node.items():
        vals = [series[t] for t in sorted(series)]
        assert vals == sorted(vals), node
    # the path head grows (plateaus are legal — a new ball member can
    # collide into an already-set register — but round 1 must beat
    # round 0, and the t=3 ball must beat the singleton)
    a = by_node["a"]
    assert a[0] < a[1] <= a[2] <= a[3]
