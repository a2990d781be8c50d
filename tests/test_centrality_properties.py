# -*- coding: utf-8 -*-
"""Independent-reference checks for the seventh-continuation
operators: each Spark implementation is compared against a separate
pure-Python implementation of the published algorithm on
deterministic pseudo-random graphs (hash-derived edges — no RNG, so
failures reproduce).

- stress/betweenness vs a textbook per-source BFS + Brandes backward
  pass;
- SALSA's closed form vs the actual alternating random-walk power
  iteration it claims to equal;
- locally-dominant matching vs a sequential reference of the same
  round semantics;
- Dawid-Skene vs a NumPy-free replica EM.
"""

import hashlib
import math
from collections import defaultdict

import pytest

from knowledge_graph_spark.operators.graph_analytics import (
    dominant_matching, salsa, stress_centrality)


def _graph(seed: str, n: int, m: int):
    """Deterministic pseudo-random multigraph on n nodes, m draws."""
    edges = set()
    for i in range(m):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        u, v = int(h[:8], 16) % n, int(h[8:16], 16) % n
        if u != v:
            edges.add((f"n{min(u, v)}", f"n{max(u, v)}"))
    return sorted(edges)


def _ref_stress(edges, pivots, max_hops):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    stress = defaultdict(int)
    delta_tot = defaultdict(float)
    for s in pivots:
        if s not in adj:
            continue
        dist, sigma = {s: 0}, {s: 1}
        frontier = [s]
        d = 0
        levels = [[s]]
        while frontier and d < max_hops:
            d += 1
            nxt = {}
            for u in frontier:
                for w in sorted(adj[u]):
                    if w not in dist:
                        nxt[w] = None
            for w in nxt:
                dist[w] = d
                sigma[w] = sum(sigma[u] for u in adj[w]
                               if dist.get(u) == d - 1)
            frontier = sorted(nxt)
            if frontier:
                levels.append(frontier)
        r = {}
        delta = {}
        for lvl in reversed(levels):
            for u in lvl:
                succ = [w for w in adj[u] if dist.get(w) == dist[u] + 1]
                r[u] = sum(r[w] + 1 for w in succ)
                delta[u] = sigma[u] * sum(
                    (1 + delta[w]) / sigma[w] for w in succ)
        for u in dist:
            if dist[u] > 0:
                stress[u] += sigma[u] * r[u]
                delta_tot[u] += delta[u]
    return stress, delta_tot


@pytest.mark.parametrize("seed,n,m", [("a", 12, 30), ("b", 20, 45),
                                      ("c", 16, 20)])
def test_stress_matches_reference_brandes(spark, seed, n, m):
    edges = _graph(seed, n, m)
    pivots = ["n0", "n1", "n3"]
    df = spark.createDataFrame(edges, "src string, dst string")
    pv = spark.createDataFrame([(p,) for p in pivots], "id string")
    got = {r["id"]: r for r in
           stress_centrality(df, pv, max_hops=5).collect()}
    stress, delta = _ref_stress(edges, pivots, 5)
    exp = {u for u in stress}
    assert set(got) == exp
    for u in exp:
        assert got[u]["stress"] == stress[u], u
        assert got[u]["betweenness"] == pytest.approx(delta[u]), u


def _ref_salsa_power(edges, iters=400):
    """Authority scores by actually iterating the SALSA chain:
    a <- A^T row-norm(H) h, h <- ... (equivalently the two-step
    random walk). Returns the per-component-stationary limit started
    from uniform."""
    hubs = sorted({u for u, _ in edges})
    auths = sorted({v for _, v in edges})
    out_deg = defaultdict(int)
    in_deg = defaultdict(int)
    for u, v in edges:
        out_deg[u] += 1
        in_deg[v] += 1
    a = {x: 1.0 / len(auths) for x in auths}
    for _ in range(iters):
        h = defaultdict(float)
        for u, v in edges:
            h[u] += a[v] / in_deg[v]
        nxt = defaultdict(float)
        for u, v in edges:
            nxt[v] += h[u] / out_deg[u]
        a = nxt
    return a


def test_salsa_closed_form_equals_power_iteration(spark):
    raw = [("h1", "a"), ("h1", "b"), ("h2", "b"), ("h2", "c"),
           ("h3", "c"), ("h3", "d"), ("h4", "e"), ("h5", "e"),
           ("h5", "f")]
    df = spark.createDataFrame(raw, "src string, dst string")
    got = {r["id"]: r["score"] for r in salsa(df).collect()
           if r["side"] == "authority"}
    ref = _ref_salsa_power(raw)
    # the alternating walk preserves per-component mass, so from a
    # uniform start each component keeps (its size)/|A| — exactly the
    # closed form's component-share factor
    for x, s in ref.items():
        assert got[x] == pytest.approx(s, rel=1e-6), x


def _ref_dominant(edges, rounds=8):
    # same multigraph fold as the operator: max weight per (u, v)
    best = {}
    for u, v, w in edges:
        best[(u, v)] = max(best.get((u, v), w), w)
    e = {(u, v, w) for (u, v), w in best.items()}
    matched = []
    for _ in range(rounds):
        if not e:
            break
        best_u, best_v = {}, {}
        # lexicographic (w, partner) max per endpoint
        for u, v, w in e:
            if u not in best_u or (w, v) > best_u[u]:
                best_u[u] = (w, v)
            if v not in best_v or (w, u) > best_v[v]:
                best_v[v] = (w, u)
        m = [(u, v, w) for u, v, w in e
             if best_u[u] == (w, v) and best_v[v] == (w, u)]
        matched.extend(m)
        mu = {u for u, _, _ in m}
        mv = {v for _, v, _ in m}
        e = {(u, v, w) for u, v, w in e
             if u not in mu and v not in mv}
    return sorted(matched)


@pytest.mark.parametrize("seed", ["x", "y"])
def test_dominant_matching_matches_reference(spark, seed):
    edges = []
    for i in range(40):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        u, v = int(h[:8], 16) % 10, int(h[8:16], 16) % 8
        w = int(h[16:20], 16) % 50
        edges.append((f"u{u}", f"v{v}", w))
    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = sorted((r["src"], r["dst"], r["w"])
                 for r in dominant_matching(df).collect())
    assert got == _ref_dominant(edges)
    # matching property: no endpoint appears twice
    us = [u for u, _, _ in got]
    vs = [v for _, v, _ in got]
    assert len(us) == len(set(us)) and len(vs) == len(set(vs))


def _ref_dawid_skene(votes, iterations=10):
    def r9(x):
        return float(f"{x:.9f}") if x == x else x
    items = sorted({i for i, _, _ in votes})
    workers = sorted({w for _, w, _ in votes})
    by_item = defaultdict(list)
    by_worker = defaultdict(list)
    for i, w, y in votes:
        by_item[i].append((w, y))
        by_worker[w].append((i, y))
    lo, hi = 1e-6, 1.0 - 1e-6
    q = {i: r9(sum(y for _, y in by_item[i]) / len(by_item[i]))
         for i in items}
    n = len(items)
    for _ in range(iterations):
        alpha, beta = {}, {}
        for w in workers:
            an = sum(q[i] * y for i, y in by_worker[w])
            ad = sum(q[i] for i, _ in by_worker[w])
            bn = sum((1.0 - q[i]) * (1 - y) for i, y in by_worker[w])
            bd = sum(1.0 - q[i] for i, _ in by_worker[w])
            alpha[w] = min(max(r9(an / ad), lo), hi)
            beta[w] = min(max(r9(bn / bd), lo), hi)
        p = min(max(r9(sum(q.values()) / float(n)), lo), hi)
        for i in items:
            z = sum((math.log(alpha[w]) if y == 1
                     else math.log(1.0 - alpha[w]))
                    - (math.log(1.0 - beta[w]) if y == 1
                       else math.log(beta[w]))
                    for w, y in by_item[i])
            z = r9(z + math.log(p) - math.log(1.0 - p))
            q[i] = r9(1.0 / (1.0 + math.exp(-z)))
    return q


def test_dawid_skene_matches_replica_em(spark):
    from knowledge_graph_spark.operators.labels import dawid_skene
    votes = []
    for i in range(40):
        for w in range(4):
            h = hashlib.md5(f"ds:{i}:{w}".encode()).hexdigest()
            t = i % 2
            flip = int(h[:4], 16) % 100 < 10 * (w + 1)
            votes.append((i, f"w{w}", (t + flip) % 2))
    df = spark.createDataFrame(votes, "item long, worker string, label int")
    items, _ = dawid_skene(df, iterations=10)
    got = {r["item"]: r["q"] for r in items.collect()}
    ref = _ref_dawid_skene(votes, 10)
    for i, qv in ref.items():
        # both sides round to the same 9-dp lattice every step
        assert got[i] == pytest.approx(qv, abs=2e-9), i


def test_fellegi_sunter_matches_replica_em(spark):
    from knowledge_graph_spark.operators.linking import (
        _fs_em, fellegi_sunter)
    rows = []
    for i in range(300):
        h = hashlib.md5(f"fs:{i}".encode()).hexdigest()
        rows.append((int(h[0], 16) % 2 == 0, int(h[1], 16) % 3 == 0,
                     int(h[2], 16) % 4 == 0))
    pairs = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    out = {r["pattern"]: r for r in
           fellegi_sunter(pairs, ["a", "b", "c"]).collect()}
    census = defaultdict(int)
    for a, b, c in rows:
        census[int(a) + 2 * int(b) + 4 * int(c)] += 1
    ref, _, _, _ = _fs_em(sorted(census.items()), 3, 15)
    for pattern, n, weight, post in ref:
        assert out[pattern]["n"] == n
        assert out[pattern]["weight"] == pytest.approx(weight)
        assert out[pattern]["posterior"] == pytest.approx(post)
    # ranks are a permutation of 1..K
    assert sorted(r["w_rank"] for r in out.values()) == \
        list(range(1, len(out) + 1))


def test_sorted_neighborhood_matches_bruteforce(spark):
    from knowledge_graph_spark.operators.linking import (
        sorted_neighborhood)
    items = []
    for i in range(60):
        h = hashlib.md5(f"snm:{i}".encode()).hexdigest()
        items.append((f"r{i}", int(h[:4], 16) % 500))
    df = spark.createDataFrame(items, "id string, k long")
    got = sorted((r["a"], r["b"], r["gap"]) for r in
                 sorted_neighborhood(df, "k", "id", window=4,
                                     slice_width=64).collect())
    order = [i for i, _ in sorted(items, key=lambda t: (t[1], t[0]))]
    exp = sorted((order[i], order[j], j - i)
                 for i in range(len(order))
                 for j in range(i + 1, min(i + 4, len(order))))
    assert got == exp


# ---------------------------------------------------------------------------
# round-5 graph-analytics review regressions
# ---------------------------------------------------------------------------


def test_dominant_matching_general_graph_one_partner_per_node(spark):
    """On non-bipartite input a node may appear in both edge columns;
    its best partner is over BOTH incidences and it gets at most ONE
    partner (r5 review finding: per-column bests matched node 2 twice
    on {(1,2,10),(2,3,5)})."""
    from knowledge_graph_spark.operators.graph_analytics import (
        dominant_matching)

    e = spark.createDataFrame(
        [(1, 2, 10.0), (2, 3, 5.0)], "src long, dst long, w double")
    rows = dominant_matching(e, weight="w").collect()
    assert len(rows) == 1
    assert (rows[0]["src"], rows[0]["dst"]) == (1, 2)
    # self-loops never match
    e2 = spark.createDataFrame(
        [(7, 7, 100.0), (7, 8, 50.0)], "src long, dst long, w double")
    rows2 = dominant_matching(e2, weight="w").collect()
    assert [(r["src"], r["dst"]) for r in rows2] == [(7, 8)]


def test_pagerank_null_endpoints_filtered_and_mass_conserved(spark):
    from knowledge_graph_spark.operators.graph_analytics import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", None), (None, "b")],
        "src string, dst string")
    rows = pagerank(e, iterations=5).collect()
    assert {r["id"] for r in rows} == {"a", "b"}   # no NULL node
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9


def test_weighted_sssp_null_weights_do_not_spread(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        weighted_shortest_paths)

    e = spark.createDataFrame(
        [("s", "a", None), ("a", "b", 2.0), ("s", "c", 1.0)],
        "src string, dst string, w double")
    sources = spark.createDataFrame([("s",)], "id string")
    rows = {r["id"]: r["dist"] for r in
            weighted_shortest_paths(e, sources=sources).collect()}
    # a/b reachable only through the NULL-weight edge: absent, not
    # NULL-dist rows
    assert rows == {"s": 0.0, "c": 1.0}


def test_scc_raises_loudly_on_round_exhaustion(spark):
    import pytest

    from knowledge_graph_spark.operators.graph_analytics import (
        strongly_connected_components)

    # an id-increasing path resolves ONE node per peel round
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.raises(RuntimeError):
        strongly_connected_components(e, max_rounds=3)
    out = strongly_connected_components(e, max_rounds=20)
    assert out.count() == 9                     # every node labeled


def test_degree_powerlaw_empty_input_zeros(spark):
    from knowledge_graph_spark.operators.graph_analytics import (
        powerlaw_ingredients)

    empty = spark.createDataFrame([], "d long")
    row = powerlaw_ingredients(empty, "d", d_min=2).collect()[0]
    assert (row["n_nodes"], row["n_tail"], row["max_degree"],
            row["sum_log_1e6"]) == (0, 0, 0, 0)
