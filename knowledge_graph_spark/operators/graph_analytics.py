# -*- coding: utf-8 -*-
"""Graph analytics over the materialized KG: PageRank, triangles,
BFS distances, k-core.

Not a reference query (its Cypher surface stops at scans/deletes) —
but "which entities matter" is the canonical question over an
extracted knowledge graph, and degree alone over-counts boilerplate
hubs. This is the classic Pregel-style join formulation (Page et al.
1999; the MapReduce shape from Malewicz et al.'s Pregel paper),
expressed as DataFrame joins so Catalyst/AQE pick the physical plan.

Scale shape per iteration:
- one shuffle keyed by ``dst`` (contribution aggregate) and one join
  keyed by node id — the link table ``(src, dst, deg)`` is persisted
  once and its partitioning reused every round;
- dangling-node mass (nodes with no out-edges) is redistributed via a
  ONE-ROW broadcast aggregate built inside the plan — no per-iteration
  driver action;
- ranks are ``localCheckpoint``-ed each round (same lineage-truncation
  pattern as :mod:`components`), so the plan never grows with the
  iteration count;
- shuffles carry ``(id, double)`` pairs only — never node payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected distinct edge set ``(a, b)`` with a < b:
    each edge oriented by (least, greatest), self-loops dropped. The
    shared first step of every undirected operator here — one place to
    fix canonicalization (e.g. NULL-endpoint policy) for all of them."""
    return (
        edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                     F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _sym_partitioned(edges: DataFrame, src: str,
                     dst: str) -> DataFrame:
    """Symmetrized distinct edge list, self-loops dropped, hash-
    partitioned on src and PERSISTED — the shared frontier-join
    layout of the BFS family (shortest_paths / landmark_distances /
    stress_centrality). One helper so symmetrization policy lives in
    one place (the _undirected rule)."""
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
            .filter(F.col("src") != F.col("dst")))
        .distinct()
        .repartition(F.col("src"))
        .persist()
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 10, damping: float = 0.85,
             n_nodes: int | None = None) -> DataFrame:
    """PageRank over the distinct edge set of ``edges``.

    Returns ``(id, rank)`` for every node appearing as an endpoint;
    ranks sum to 1. Pass ``n_nodes`` (e.g. from catalog stats) to skip
    the one sizing count. Fixed ``iterations`` keeps the operator
    deterministic and oracle-reproducible; 10 rounds is within ~1e-3
    of convergence on graphs with damping 0.85."""
    # NULL endpoints out: a (y, NULL) edge would count toward y's
    # out-degree, send rank into a dst the USING-join can never match
    # (mass silently vanishes — ranks no longer sum to 1) and emit a
    # spurious id=NULL node row
    pairs = (edges.select(F.col(src).alias("src"),
                          F.col(dst).alias("dst"))
             .filter(F.col("src").isNotNull()
                     & F.col("dst").isNotNull())
             .distinct())
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct().persist()
    )
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes == 0:
        nodes.unpersist()
        return nodes.select("id", F.lit(0.0).alias("rank"))
    deg = pairs.groupBy("src").agg(F.count("*").alias("deg"))
    links = pairs.join(deg, "src").persist()
    # the dangling set (no out-edges) is loop-invariant: materialize it
    # once instead of re-deriving deg's subplan every round
    dangling = nodes.join(deg, nodes["id"] == deg["src"],
                          "left_anti").persist()

    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links["src"] == ranks["id"])
            .select(F.col("dst").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id").agg(F.sum("c").alias("c"))
        )
        # dangling mass: rank held by nodes with no out-edges, fed back
        # uniformly; a 1-row aggregate broadcast inside the plan
        dang = (
            ranks.join(dangling, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("dm") / F.lit(float(n_nodes)))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    links.unpersist()
    dangling.unpersist()
    return ranks


def personalized_pagerank(edges: DataFrame, sources: DataFrame,
                          src: str = "src", dst: str = "dst",
                          iterations: int = 10,
                          damping: float = 0.85) -> DataFrame:
    """Personalized PageRank (the topic-sensitive variant of Haveliwala
    2002): random walks teleport back to the ``sources`` set instead of
    uniformly, so ranks measure proximity-weighted importance RELATIVE
    to those seeds — "what matters around these entities", the KG
    recommendation/expansion primitive global PageRank can't answer.
    Returns ``(id, rank)`` for every endpoint; ranks sum to 1.

    Semantics: teleport vector t(v) = 1/|S| on the seed set, 0
    elsewhere; ``rank' = (1-d)·t + d·(contribs + dangling_mass·t)``
    (dangling mass returns to the seeds — the standard PPR convention,
    keeping the walk inside the seed neighborhood); ranks start at t.
    Fixed ``iterations`` for determinism, like :func:`pagerank`.

    Same scale shape as :func:`pagerank`: one (id, double) exchange +
    one-row dangling broadcast per round, teleport flags carried on the
    once-built node frame, per-round ``localCheckpoint``.

    The teleport vector is normalized over the seeds that actually ARE
    graph endpoints: seed ids absent from the edge set (mistyped or
    isolated entities) carry no walk mass anywhere, so dividing by the
    raw seed count would silently leak their share of the teleport mass
    and break the ranks-sum-to-1 invariant. Raises if NO seed is an
    endpoint (the all-zero teleport would return all-zero ranks)."""
    pairs = (edges.select(F.col(src).alias("src"),
                          F.col(dst).alias("dst"))
             .filter(F.col("src").isNotNull()
                     & F.col("dst").isNotNull())
             .distinct())
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
    )
    srcs = sources.select(F.col(sources.columns[0]).alias("id")).distinct()
    flags = (
        nodes.join(srcs.withColumn("_s", F.lit(1)), "id", "left")
        .select("id", F.coalesce(F.col("_s"), F.lit(0)).alias("_s"))
        .localCheckpoint(eager=True)
    )
    # tiny agg over the already-materialized flags — not a second scan
    n_matched = flags.agg(F.sum("_s")).first()[0] or 0
    if n_matched == 0:
        raise ValueError(
            "personalized_pagerank needs >= 1 source that is an edge "
            "endpoint (none of the given seeds appear in the graph)")
    tele = flags.select(
        "id", (F.col("_s") / F.lit(float(n_matched))).alias("t"))
    deg = pairs.groupBy("src").agg(F.count("*").alias("deg"))
    links = pairs.join(deg, "src").persist()
    dangling = tele.join(deg, tele["id"] == deg["src"],
                         "left_anti").select("id").persist()

    ranks = tele.select("id", F.col("t").alias("rank"))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links["src"] == ranks["id"])
            .select(F.col("dst").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id").agg(F.sum("c").alias("c"))
        )
        dang = (
            ranks.join(dangling, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            tele.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                ((1.0 - damping) * F.col("t") + damping
                 * (F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("dm") * F.col("t"))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    links.unpersist()
    dangling.unpersist()
    return ranks


def modularity(edges: DataFrame, communities: DataFrame,
               src: str = "src", dst: str = "dst",
               id_col: str = "id", label_col: str = "label") -> DataFrame:
    """Newman modularity decomposition of a community assignment over
    the undirected distinct edge set: per community,
    ``contribution = e_c/m − (d_c/2m)²`` (internal-edge fraction minus
    the random-graph expectation); total modularity Q is the sum over
    rows. Returns ``(label, n_nodes, internal_edges, degree_sum,
    contribution)`` — the quality report for
    :func:`label_propagation`'s output (did propagation find real
    structure, or shatter?).

    ``communities`` must cover every endpoint (community detectors over
    the same edge set do); nodes without edges are ignored (they carry
    no modularity mass). Scale shape: the edge set is aggregated once
    for degrees and joined twice against the (id, label) assignment —
    both joins keyed by node id (AQE skew handles hub nodes); per-
    community rollups exchange (label, long) pairs; ``m`` rides as a
    one-row in-plan broadcast, no driver sizing action."""
    und = _undirected(edges, src, dst)
    la = communities.select(F.col(id_col).alias("a"),
                            F.col(label_col).alias("_la"))
    lb = communities.select(F.col(id_col).alias("b"),
                            F.col(label_col).alias("_lb"))
    internal = (
        und.join(la, "a").join(lb, "b")
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count("*").alias("internal_edges"))
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("nid"))
        .groupBy("nid").agg(F.count("*").alias("d"))
    )
    dsum = (
        communities.select(F.col(id_col).alias("nid"),
                           F.col(label_col).alias("label"))
        .join(deg, "nid")
        .groupBy("label")
        .agg(F.count("*").alias("n_nodes"),
             F.sum("d").alias("degree_sum"))
    )
    mrow = und.agg(F.count("*").alias("_m"))
    return (
        dsum.join(internal, "label", "left")
        .crossJoin(F.broadcast(mrow))
        .select(
            "label", "n_nodes",
            F.coalesce(F.col("internal_edges"), F.lit(0))
            .alias("internal_edges"),
            "degree_sum",
            (F.coalesce(F.col("internal_edges"), F.lit(0)) / F.col("_m")
             - (F.col("degree_sum") / (2.0 * F.col("_m"))) ** 2)
            .alias("contribution"),
        )
    )


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over the undirected distinct edge set
    (self-loops dropped). Returns ``(id, triangles)`` for nodes in at
    least one triangle.

    Uses the degree-ordering construction (the MapReduce triangle
    algorithm of Suri & Vassilvitskii, WWW'11): every undirected edge
    is oriented from its (degree, id)-smaller endpoint, which bounds
    any node's out-degree by O(sqrt(E)), so the wedge self-join cannot
    blow up on hub nodes — the skew story that makes this shape safe
    on a web-scale graph. Three shuffles: degree aggregate, wedge
    self-join on the low endpoint, closing-edge join."""
    und = _undirected(edges, src, dst)
    tri = _oriented_triangles(und)
    return (
        tri.select(F.explode(F.array("t_u", "t_v", "t_w")).alias("id"))
        .groupBy("id").agg(F.count("*").alias("triangles"))
    )


def _oriented_triangles(und: DataFrame) -> DataFrame:
    """Every triangle of the undirected distinct edge set ``(a, b)``,
    once, as ``(t_u, t_v, t_w)`` — the Suri & Vassilvitskii WWW'11
    degree-ordered enumeration (edges orient from their (degree, id)-
    smaller endpoint, bounding wedge fan-out by O(sqrt E) per node).
    Shared by :func:`triangle_counts` and :func:`k_truss`."""
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id").agg(F.count("*").alias("d"))
    )
    withd = (
        und.join(deg.withColumnRenamed("id", "a")
                    .withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("id", "b")
                 .withColumnRenamed("d", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = withd.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x, y = o.alias("x"), o.alias("y")
    wedges = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter((F.col("x.dv") < F.col("y.dv"))
                | ((F.col("x.dv") == F.col("y.dv"))
                   & (F.col("x.v") < F.col("y.v"))))
        .select(F.col("x.u").alias("t_u"), F.col("x.v").alias("t_v"),
                F.col("y.v").alias("t_w"))
    )
    closing = o.select(F.col("u").alias("t_v"), F.col("v").alias("t_w"))
    return wedges.join(closing, ["t_v", "t_w"])


def k_truss(edges: DataFrame, k: int, src: str = "src",
            dst: str = "dst", max_rounds: int = 100) -> DataFrame:
    """k-truss membership (Cohen 2008, "Trusses: cohesive subgraphs
    for social network analysis"): the maximal subgraph in which every
    edge closes at least ``k - 2`` triangles WITHIN the subgraph.
    Edge-level cohesion — strictly stronger than the (k-1)-core, and
    the standard KG-denoising step above it: a spurious extracted
    relation rarely closes triangles with real ones, so it peels out
    while genuine entity cliques survive. Returns the surviving edges
    ``(a, b, support)`` with ``a < b`` and their in-truss triangle
    support.

    Scale shape per round: one degree-ordered triangle enumeration
    (:func:`_oriented_triangles` — wedge fan-out bounded O(sqrt E)
    per node, hub-safe) folded to per-edge support counts (each
    triangle contributes to its three normalized edges), then one
    filter; every exchange carries id pairs and one long, and the
    surviving edge set is ``localCheckpoint``-ed per round to cut
    lineage. Rounds are O(peeling depth) — small on power-law graphs
    (tail edges with no support fall out in round one)."""
    if k < 2:
        raise ValueError("k_truss needs k >= 2")

    def _support(cur: DataFrame) -> DataFrame:
        tri = _oriented_triangles(cur)
        pair = (lambda p, q: F.struct(
            F.least(p, q).alias("a"), F.greatest(p, q).alias("b")))
        per_edge = (
            tri.select(F.explode(F.array(
                pair(F.col("t_u"), F.col("t_v")),
                pair(F.col("t_u"), F.col("t_w")),
                pair(F.col("t_v"), F.col("t_w")))).alias("_e"))
            .select("_e.a", "_e.b")
            .groupBy("a", "b").agg(F.count("*").cast("long")
                                   .alias("support"))
        )
        return (cur.join(per_edge, ["a", "b"], "left")
                .select("a", "b",
                        F.coalesce("support", F.lit(0)).cast("long")
                        .alias("support")))

    need = int(k) - 2
    cur = _undirected(edges, src, dst).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        sup = _support(cur).localCheckpoint(eager=True)
        if sup.filter(F.col("support") < need).isEmpty():
            return sup
        cur = (sup.filter(F.col("support") >= need)
               .select("a", "b").localCheckpoint(eager=True))
    return _support(cur)


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998) over the
    undirected distinct edge set: for every node with degree >= 1,
    ``coeff = 2 * triangles / (degree * (degree - 1))`` — the fraction
    of a node's neighbor pairs that are themselves linked. Returns
    ``(id, degree, triangles, coeff)``; degree-1 nodes score 0.0
    (no neighbor pair exists).

    Separates "hub" from "clique member" in the extracted KG: a
    boilerplate entity touching everything has a near-zero coefficient,
    while a tight org-person-product cluster scores near 1 — the signal
    degree and PageRank both miss.

    Scale shape: triangle counts come from :func:`triangle_counts`
    (degree-ordered wedge join — per-node out-degree bounded by
    O(sqrt E), safe on hub nodes); the degree census is one explode +
    count aggregate with map-side combine; the final join is keyed by
    node id over ``(id, long)`` rows only. The edge set is scanned
    twice (once per census) — both scans are the cheap part of the
    plan, and sharing one persisted frame across the two would pin the
    full edge list in memory for no shuffle savings."""
    und = _undirected(edges, src, dst)
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id").agg(F.count("*").alias("degree"))
    )
    tri = triangle_counts(edges, src, dst)
    pairs = F.col("degree") * (F.col("degree") - F.lit(1))
    return (
        deg.join(tri, "id", "left")
        .select(
            "id", "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(F.col("degree") >= 2,
                   F.lit(2.0) * F.coalesce(F.col("triangles"), F.lit(0))
                   / pairs)
            .otherwise(F.lit(0.0)).alias("coeff"),
        )
    )


def shortest_paths(edges: DataFrame, sources: DataFrame | None = None,
                   src: str = "src", dst: str = "dst",
                   max_hops: int = 10) -> DataFrame:
    """BFS hop distances from ``sources`` over the UNDIRECTED distinct
    edge set (self-loops dropped). Returns ``(id, dist)`` for every
    node reachable within ``max_hops``; sources themselves at dist 0.

    ``sources`` is a one-column ``id`` DataFrame (landmark entities);
    when None the lexicographically-smallest endpoint id is the single
    source, derived by an in-plan aggregate — no driver collect.

    Scale shape per hop: ONE shuffle join of the frontier against the
    symmetrized edge list (both keyed by node id) plus an anti-join
    against the visited set; the frontier and visited set carry
    ``(id, int)`` pairs only, never node payloads. Each hop's frontier
    is ``localCheckpoint``-ed so the plan stays flat, and the loop
    exits early when a frontier is empty (checkpointed, so the check
    reads materialized partitions, not a recompute). Hub skew in the
    frontier join is AQE's skew-join case; at web scale the landmark
    fan-out is bounded by max_hops·|frontier| not |V|²."""
    # distinct already hash-partitions on (src, dst); re-key by src so
    # every hop's frontier join reuses THIS cached partitioning — the
    # edge list is shuffled once, not once per hop (when the frontier
    # is small AQE broadcasts it instead; when it isn't — the web-scale
    # case — only the frontier side moves)
    sym = _sym_partitioned(edges, src, dst)
    if sources is None:
        sources = sym.agg(F.min("src").alias("id"))
    frontier = (
        sources.select("id").filter(F.col("id").isNotNull()).distinct()
        .select("id", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"), F.lit(hop).alias("dist"))
            .distinct()
            .join(dist, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        dist = dist.unionByName(frontier)
    sym.unpersist()
    return dist


def k_core(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
           max_rounds: int = 100) -> DataFrame:
    """The k-core of the undirected distinct edge set: iteratively peel
    nodes of degree < k until fixpoint (Seidman 1983; the standard
    corpus-graph denoising primitive — boilerplate-only entities fall
    out of the core). Returns ``(id, core_degree)`` — each surviving
    node with its degree inside the core subgraph.

    Scale shape per round: one degree aggregate keyed by node id plus
    two semi-joins of the edge list against the survivor set; all
    exchanges carry ``(id, long)`` or ``(a, b)`` id pairs. The surviving
    edge set is ``localCheckpoint``-ed each round, and peeling stops as
    soon as a round removes nothing. Rounds are O(peeling depth), which
    is tiny on power-law graphs (hubs survive, tails fall out in the
    first rounds)."""
    cur = _undirected(edges, src, dst).localCheckpoint(eager=True)

    def _deg(pairs: DataFrame) -> DataFrame:
        # checkpointed so the fixpoint check, the survivor filter, and
        # the final return all read ONE materialization per round
        return (
            pairs.select(F.explode(F.array("a", "b")).alias("id"))
            .groupBy("id").agg(F.count("*").alias("core_degree"))
            .localCheckpoint(eager=True)
        )

    deg = _deg(cur)
    for _ in range(max_rounds):
        if deg.filter(F.col("core_degree") < k).isEmpty():
            break
        keep = deg.filter(F.col("core_degree") >= k)
        cur = (
            cur.join(keep.select(F.col("id").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("id").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        deg = _deg(cur)
    return deg.filter(F.col("core_degree") >= k)


def adamic_adar(edges: DataFrame, src: str = "src", dst: str = "dst",
                max_degree: int = 64) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar, Social Networks
    2003) over the undirected distinct edge set: for every UNLINKED
    node pair sharing at least one neighbor, ``score = Σ_z 1/ln(deg z)``
    over common neighbors ``z`` with ``2 <= deg(z) <= max_degree``.
    Returns ``(id_a, id_b, common_neighbors, score)`` with
    ``id_a < id_b``.

    The degree cap is part of the semantics, not an approximation
    escape hatch: a center shared by everyone carries ~no signal
    (``1/ln d → 0``), and capping it bounds the per-center pair fan-out
    at ``max_degree²/2`` — the skew guard that keeps the wedge
    generation safe when a boilerplate hub entity touches millions of
    nodes. Pair generation is in-aggregate (sorted neighbor array →
    strict upper triangle via JVM lambdas — the proven
    ``dedup._bucket_pairs`` construction), so there is no bucket
    self-join: three shuffles total (degree aggregate, center
    aggregate, pair aggregate) plus the existing-edge anti-join, and
    every exchange carries ids and one double, never payloads."""
    und = _undirected(edges, src, dst)
    sym = und.select(F.col("a").alias("id"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nbr")))
    deg = sym.groupBy("id").agg(F.count("*").alias("d"))
    ctr = (
        sym.join(deg, "id")
        .filter((F.col("d") >= 2) & (F.col("d") <= max_degree))
        .select("id", "nbr", (F.lit(1.0) / F.log(F.col("d"))).alias("w"))
    )
    grouped = ctr.groupBy("id", "w").agg(
        F.sort_array(F.collect_list("nbr")).alias("_nbrs"))
    tri = F.flatten(
        F.transform(
            "_nbrs",
            lambda x, i: F.transform(
                F.slice("_nbrs", i + F.lit(2), F.size("_nbrs")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    scored = (
        grouped.select(F.explode(tri).alias("p"), "w")
        .select("p.id_a", "p.id_b", "w")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common_neighbors"),
             F.sum("w").alias("score"))
    )
    return scored.join(
        und,
        (scored["id_a"] == und["a"]) & (scored["id_b"] == und["b"]),
        "left_anti",
    )


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", iterations: int = 5) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the undirected distinct edge set: every node
    starts as its own label; each round it adopts the most frequent
    label among its neighbors, ties broken by SMALLEST label — the
    deterministic variant (plain LPA breaks ties randomly; a fixed
    rule plus a fixed round count makes the operator reproducible and
    oracle-checkable on any cluster size). Returns ``(id, label)``
    after exactly ``iterations`` rounds.

    Scale shape per round: the symmetrized edge list is shuffled ONCE
    up front (persisted, keyed by node id — the BFS pattern) and every
    round's label join reuses that partitioning; then two aggregates —
    ``(node, label) → count`` and the per-node argmax via
    ``min(struct(-count, label))``, both with map-side partial
    aggregation. Every exchange carries ``(id, label, long)`` — never
    payloads. Labels are ``localCheckpoint``-ed per round so the plan
    stays flat."""
    und = _undirected(edges, src, dst)
    sym = (
        und.select(F.col("a").alias("id"), F.col("b").alias("nbr"))
        .unionByName(und.select(F.col("b").alias("id"),
                                F.col("a").alias("nbr")))
        .repartition(F.col("nbr"))
        .persist()
    )
    labels = (
        sym.select("id").distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        nbr_labels = (
            sym.join(labels.select(F.col("id").alias("nbr"), "label"), "nbr")
            .select("id", "label")
        )
        labels = (
            nbr_labels.groupBy("id", "label").agg(F.count("*").alias("c"))
            .groupBy("id")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("label").alias("l"))).alias("m"))
            .select("id", F.col("m.l").alias("label"))
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return labels


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iterations: int = 10) -> DataFrame:
    """Hubs and authorities (Kleinberg 1999, HITS) over the distinct
    directed edge set: returns ``(id, hub, authority)`` for every
    endpoint, L2-normalized each half-step (the classic power
    iteration), fixed ``iterations`` for determinism.

    Same scale shape as :func:`pagerank`: per half-step ONE shuffle
    keyed by the receiving endpoint plus a one-row in-plan broadcast
    (the L2 norm); scores are ``localCheckpoint``-ed per round so the
    plan stays flat; every exchange carries ``(id, double)`` pairs."""
    if iterations < 1:
        # the loop must run at least once — auth is only defined inside
        # it, so 0 would crash on None rather than return anything
        raise ValueError(f"iterations={iterations}: need >= 1")
    pairs = (edges.select(F.col(src).alias("src"),
                          F.col(dst).alias("dst"))
             .filter(F.col("src").isNotNull()
                     & F.col("dst").isNotNull())
             .distinct()).persist()
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct().persist()
    )

    def _half_step(scores: DataFrame, from_col: str,
                   to_col: str) -> DataFrame:
        # receive = Σ of sender scores over edges, L2-normalized in-plan
        recv = (
            pairs.join(scores, pairs[from_col] == scores["id"])
            .select(F.col(to_col).alias("id"), F.col("s"))
            .groupBy("id").agg(F.sum("s").alias("s"))
        )
        full = nodes.join(recv, "id", "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0.0)).alias("s"))
        nrm = full.agg(
            F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("_n"))
        return (
            full.crossJoin(F.broadcast(nrm))
            .select("id", F.when(F.col("_n") > 0,
                                 F.col("s") / F.col("_n"))
                    .otherwise(F.lit(0.0)).alias("s"))
            .localCheckpoint(eager=True)
        )

    hub = nodes.select("id", F.lit(1.0).alias("s"))
    auth = None
    for _ in range(iterations):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")
    out = (
        hub.select("id", F.col("s").alias("hub"))
        .join(auth.select("id", F.col("s").alias("authority")), "id")
    )
    pairs.unpersist()
    nodes.unpersist()
    return out


def weighted_shortest_paths(
    edges: DataFrame, weight: str = "w",
    sources: DataFrame | None = None, src: str = "src", dst: str = "dst",
    max_rounds: int = 20, directed: bool = False,
) -> DataFrame:
    """Single/multi-source weighted shortest paths (distributed
    Bellman-Ford): returns ``(id, dist)`` — the minimum total edge
    weight from any source to every reachable node, sources at 0.0.
    Parallel edges collapse to their minimum weight; weights are
    assumed non-negative (a negative cycle would relax until
    ``max_rounds``, as in any Bellman-Ford). ``sources``
    is a one-column ``id`` frame; when None the smallest endpoint id
    is the single source, derived in-plan.

    This is the Pregel SSSP formulation (Malewicz et al. 2010) as
    DataFrame rounds: each round relaxes every edge out of the current
    distance frontier — one shuffle keyed by the receiving endpoint
    (min-aggregate of candidate distances, partial map-side) plus one
    (id)-keyed min against the standing distances. The edge list is
    shuffled ONCE (repartitioned by ``src``, persisted) and that
    partitioning is reused every round; all per-round exchanges carry
    ``(id, double)`` pairs. Distances are ``localCheckpoint``-ed per
    round and the loop exits when a round improves nothing (the
    improvement check reads the checkpointed frames — an anti-join,
    no recompute). Rounds needed = the shortest-path tree's hop depth,
    small on small-diameter web/KG graphs; ``max_rounds`` bounds
    adversarial chains. Integer-valued weights keep the double sums
    exact, so results value-match an exact SQL oracle."""
    # NULL endpoints/weights out: min(w)=NULL would enter the dist
    # frame (the improvement filter passes NULL candidates) and
    # NULL distances would spread BFS-like through everything
    # reachable only through that edge
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      F.col(weight).cast("double").alias("w"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                 & F.col("w").isNotNull()))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"),
                     F.col("src").alias("dst"), "w"))
    e = (
        e.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst").agg(F.min("w").alias("w"))
        .repartition(F.col("src"))
        .persist()
    )
    if sources is None:
        sources = e.select(F.least(F.min("src"), F.min("dst")).alias("id"))
    dist = (
        sources.select("id").filter(F.col("id").isNotNull()).distinct()
        .select("id", F.lit(0.0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist  # rows whose dist improved last round
    for _ in range(max_rounds):
        cand = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(F.col("dst").alias("id"),
                    (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("id").agg(F.min("dist").alias("dist"))
        )
        # improved = candidates strictly better than the standing dist
        improved = (
            cand.join(dist.withColumnRenamed("dist", "_old"), "id", "left")
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .select("id", "dist")
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved, "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return dist


def neighborhood_mean(edges: DataFrame, features: DataFrame,
                      src: str = "src", dst: str = "dst",
                      id_col: str = "id", vec_col: str = "vec",
                      hops: int = 1) -> DataFrame:
    """GNN-style feature propagation (the aggregation step of
    GraphSAGE-mean, Hamilton et al. 2017, without the learned weights):
    each hop replaces every node's vector with the MEAN of its
    neighbors' vectors over the undirected distinct edge set. Returns
    ``(id, vec)`` for every node that has features; isolated nodes keep
    their own vector (a mean over zero neighbors is undefined — the
    identity is the standard fallback). The pre-training feature
    build for KG entity embeddings: smooth noisy per-entity features
    over the graph before any model sees them.

    Scale shape per hop: vectors are EXPLODED to (node, dim_pos, value)
    rows, so the neighbor aggregate is a plain (id, pos)-keyed avg with
    map-side combine — a hub node's million neighbor contributions
    collapse inside each task, never as a million-element collected
    array; the rebuild groups dim-bounded rows per node. Exchanges
    carry (id, int, double); the feature table is re-joined per hop by
    node id (AQE skew case for hubs). Dimension must be uniform;
    ragged inputs surface as NULL dims in the rebuilt array.

    Each hop's result is ``localCheckpoint``-ed (the same per-round
    rule as :func:`pagerank` / :func:`k_core`): ``cur`` feeds BOTH the
    contrib join and the identity-fallback coalesce, so an unchecked
    plan would double per hop — 2^hops copies of the explode/aggregate
    subtree by hop k."""
    und = _undirected(edges, src, dst)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    cur = features.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec"))
    if hops > 0:
        cur = cur.localCheckpoint(eager=True)
        # the symmetric edge fold is loop-invariant: materialize it
        # once instead of re-running the distinct + union inside
        # every hop's contrib join (the shuffle-once rule the other
        # iterative operators here follow)
        sym = sym.localCheckpoint(eager=True)
    for _ in range(hops):
        contrib = (
            sym.join(cur.select(F.col("id").alias("b"), "vec"), "b")
            .select(F.col("a").alias("id"),
                    F.posexplode("vec").alias("pos", "v"))
            .groupBy("id", "pos").agg(F.avg("v").alias("m"))
        )
        agg = (
            contrib.groupBy("id")
            .agg(F.array_sort(F.collect_list(
                F.struct("pos", "m"))).alias("_pm"))
            .select("id", F.expr(
                "transform(_pm, x -> x.m)").alias("_nvec"))
        )
        cur = (
            cur.join(agg, "id", "left")
            .select("id", F.coalesce(F.col("_nvec"), F.col("vec"))
                    .alias("vec"))
            .localCheckpoint(eager=True)
        )
    return cur


def pathsim(edges: DataFrame, src_col: str = "src",
            dst_col: str = "dst", min_shared: int = 1,
            max_dst_degree: int | None = 256) -> DataFrame:
    """PathSim meta-path similarity (Sun, Han, Yan, Yu, Wu, VLDB
    2011: "PathSim: Meta Path-Based Top-K Similarity Search in
    Heterogeneous Information Networks") for the symmetric round-trip
    meta-path ``A -e-> B -e⁻¹-> A``: two source entities are similar
    when many path instances connect them — e.g. two suppliers
    co-supplying many parts, two authors co-publishing at many
    venues.

    Emits ``(id_a, id_b, n_ab, n_aa, n_bb)`` with ``id_a < id_b``,
    INTEGER path-instance counts only:

    - ``n_ab`` — round-trip path instances between a and b
      (= shared distinct neighbors for a deduped edge set)
    - ``n_aa`` / ``n_bb`` — self path instances (= degrees)

    PathSim itself is the row-local division
    ``2·n_ab / (n_aa + n_bb)`` — the normalization that, unlike raw
    path counts, doesn't just rank hubs first (the paper's point).

    Scale shape: edges fold to distinct; the path join would fan out
    quadratically on a hub ``B`` node (a part supplied by everyone),
    so destinations above ``max_dst_degree`` are dropped whole
    BEFORE the pairing (None = no cap) and pairs are generated
    IN-AGGREGATE per destination (sorted collect + triangular slice
    — one shuffle, no self-join). Degrees come from the same distinct
    edge set, counted over the SAME capped destination set so that
    n_aa/n_bb and n_ab are consistent ingredients.
    """
    e = (edges.select(F.col(src_col).alias("a"),
                      F.col(dst_col).alias("b"))
         .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
         .distinct())
    if max_dst_degree is not None:
        cap = int(max_dst_degree)
        keep = (e.groupBy("b").agg(F.count("*").alias("_d"))
                .filter(F.col("_d") <= cap).select("b"))
        e = e.join(keep, "b", "leftsemi")
    e = e.localCheckpoint(eager=True)  # pairing AND degrees below

    deg = e.groupBy("a").agg(F.count("*").cast("long").alias("n"))

    grouped = e.groupBy("b").agg(
        F.sort_array(F.collect_list("a")).alias("_ids"))
    pairs = F.flatten(
        F.transform(
            "_ids",
            lambda x, i: F.transform(
                F.slice("_ids", i + F.lit(2), F.size("_ids")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    shared = (
        grouped.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.pa").alias("id_a"), F.col("p.pb").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_shared))
    )
    da = deg.select(F.col("a").alias("id_a"), F.col("n").alias("n_aa"))
    db = deg.select(F.col("a").alias("id_b"), F.col("n").alias("n_bb"))
    return shared.join(da, "id_a").join(db, "id_b").select(
        "id_a", "id_b", "n_ab", "n_aa", "n_bb")


def seeded_label_propagation(edges: DataFrame, seeds: DataFrame,
                             n_rounds: int = 2,
                             src_col: str = "src", dst_col: str = "dst",
                             node_col: str = "node",
                             label_col: str = "label") -> DataFrame:
    """Semi-supervised node classification by seeded label
    propagation (Zhu & Ghahramani 2002, CMU-CALD-02-107) — the
    web-corpus domain-tagging workhorse: a few hand-labeled hosts
    propagate their topic label across the link graph. UNLIKE
    :func:`label_propagation` (unsupervised community detection),
    seed labels are CLAMPED: a seed never changes, and every round
    each non-seed node takes the argmax label among its neighbors'
    current labels (INTEGER vote counts; ties to the
    lexicographically smallest label — deterministic, replayable).

    Runs a FIXED ``n_rounds`` (the caller picks reach = n_rounds
    hops from the nearest seed), returning ``(node, label)`` for
    every node labeled by then — unreached nodes are absent, the
    caller's NULL-handling decision.

    Scale shape: edges fold to distinct symmetric pairs once; each
    round is one equi-join of edges against the current ``(node,
    label)`` table plus one map-side-combined count and one
    in-aggregate ``min_by`` argmax — ``(key, long)`` exchanges only.
    The label table is localCheckpointed per round (iterative-reuse
    precedent), so lineage stays O(1) across rounds.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1 (got {n_rounds})")
    e = (edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull()
                 & (F.col("u") != F.col("v")))
         .distinct())
    sym = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .localCheckpoint(eager=True))
    # a node seeded with two conflicting labels resolves to the min
    # label (deterministic) — otherwise it would vote twice AND
    # emit two output rows
    seed = (seeds.select(F.col(node_col).alias("n"),
                         F.col(label_col).alias("l"))
            .filter(F.col("n").isNotNull() & F.col("l").isNotNull())
            .groupBy("n").agg(F.min("l").alias("l"))
            .localCheckpoint(eager=True))
    cur = seed
    for _ in range(int(n_rounds)):
        votes = (sym.join(cur, sym["v"] == cur["n"])
                 .groupBy(F.col("u").alias("n"), F.col("l"))
                 .agg(F.count("*").alias("_c")))
        inferred = (votes.join(seed.select(F.col("n")), "n", "left_anti")
                    .groupBy("n")
                    .agg(F.expr(
                        "min_by(l, named_struct('nc', -_c, 'l', l))")
                        .alias("l")))
        cur = seed.unionByName(inferred).localCheckpoint(eager=True)
    return cur.select(F.col("n").alias("node"), F.col("l").alias("label"))


def _directed_distinct(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct directed edge set ``(u, v)``, NULL endpoints and
    self-loops dropped — self-loops never change strong connectivity
    or reachability, and dropping them here keeps every closure loop
    below from re-deriving that fact."""
    return (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull()
                & (F.col("u") != F.col("v")))
        .distinct()
    )


def _min_label_fixpoint(nodes: DataFrame, edges_uv: DataFrame,
                        max_iters: int) -> DataFrame:
    """Propagate min node-id labels along ``(u, v)`` edges (label
    flows u -> v) to fixpoint: returns ``(id, lab)`` where ``lab`` =
    min id over {id} ∪ {ancestors of id along the given direction}.
    Each iteration is one edge-keyed join plus one min aggregate —
    ``(id, id)`` pairs only on the wire — with a localCheckpoint so
    lineage stays O(1); iterations are bounded by graph diameter
    (hash-min propagation, Rastogi et al. ICDE 2013)."""
    lab = (nodes.select("id", F.col("id").alias("lab"))
           .localCheckpoint(eager=True))
    for _ in range(max_iters):
        cand = (edges_uv.join(lab.withColumnRenamed("id", "_src"),
                              edges_uv["u"] == F.col("_src"))
                .groupBy(F.col("v").alias("id"))
                .agg(F.min("lab").alias("cand")))
        new = (lab.join(cand, "id", "left")
               .select("id", F.least("lab", F.coalesce("cand", "lab"))
                       .alias("lab"))
               .localCheckpoint(eager=True))
        changed = (new.withColumnRenamed("lab", "_new")
                   .join(lab, "id")
                   .filter(F.col("_new") != F.col("lab")))
        lab = new
        if changed.isEmpty():
            break
    return lab


def strongly_connected_components(edges: DataFrame, src: str = "src",
                                  dst: str = "dst",
                                  max_rounds: int = 30) -> DataFrame:
    """Strongly connected components of the directed distinct edge
    set -> ``(id, scc_id)`` for every endpoint node, where ``scc_id``
    is the minimum node id in the component.

    Algorithm: forward-backward min-label peeling (the label-based
    variant of FW-BW / coloring SCC — Fleischer et al. IPDPS 2000;
    Orzan 2004; the MapReduce adaptation in Rastogi et al. ICDE
    2013). Each outer round computes, over the still-unresolved
    subgraph, ``f(v)`` = min ancestor id (min-label propagated along
    edges) and ``b(v)`` = min descendant id (propagated along
    reversed edges); nodes with ``f(v) == b(v) == m`` are exactly the
    SCC of node ``m`` among still-live pivots (``m`` reaches v and v
    reaches m), get ``scc_id = m``, and are peeled. Progress is
    guaranteed: the minimum live node id always resolves its own SCC,
    so rounds are bounded by the longest chain of SCCs in condensation
    order — small on web graphs, whose condensation is shallow
    (Broder et al., Computer Networks 2000).

    Scale shape: every exchange carries ``(id, id)`` string/long pairs
    — never payloads; the live edge set shrinks monotonically and is
    re-checkpointed per round; inner propagation is diameter-bounded
    hash-min. Hub skew in the propagation joins is AQE's skew case."""
    live_edges = _directed_distinct(edges, src, dst).localCheckpoint(
        eager=True)
    live_nodes = (
        live_edges.select(F.col("u").alias("id"))
        .unionByName(live_edges.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out: DataFrame | None = None
    for _ in range(max_rounds):
        if live_nodes.isEmpty():
            break
        fwd = _min_label_fixpoint(live_nodes, live_edges, max_rounds * 4)
        bwd = _min_label_fixpoint(
            live_nodes,
            live_edges.select(F.col("v").alias("u"), F.col("u").alias("v")),
            max_rounds * 4)
        done = (fwd.withColumnRenamed("lab", "f")
                .join(bwd.withColumnRenamed("lab", "b"), "id")
                .filter(F.col("f") == F.col("b"))
                .select("id", F.col("f").alias("scc_id"))
                .localCheckpoint(eager=True))
        out = done if out is None else out.unionByName(done)
        live_nodes = (live_nodes.join(done, "id", "left_anti")
                      .localCheckpoint(eager=True))
        live_edges = (
            live_edges
            .join(live_nodes.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(live_nodes.withColumnRenamed("id", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    if not live_nodes.isEmpty():
        # silently dropping the unresolved remainder would violate the
        # "every endpoint node gets a row" contract AND corrupt any
        # census built on the output (bowtie regions) — fail loudly
        raise RuntimeError(
            f"strongly_connected_components: {live_nodes.count()} "
            f"nodes unresolved after max_rounds={max_rounds} peeling "
            "rounds (a long chain of singleton SCCs in condensation "
            "order); raise max_rounds")
    if out is None:
        spark_nodes = live_nodes
        return spark_nodes.select("id", F.col("id").alias("scc_id"))
    return out


def _reachable(seeds: DataFrame, edges_uv: DataFrame,
               max_hops: int) -> DataFrame:
    """Directed BFS closure: every node reachable from ``seeds``
    (inclusive) along ``(u, v)`` edges, as a one-column ``id`` frame.
    Same frontier/visited shape as :func:`shortest_paths` — ``(id,)``
    rows only, per-hop localCheckpoint, early exit on empty frontier."""
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_hops):
        frontier = (
            edges_uv.join(frontier.withColumnRenamed("id", "u"), "u",
                          "left_semi")
            .select(F.col("v").alias("id")).distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return visited


def bowtie_regions(edges: DataFrame, src: str = "src", dst: str = "dst",
                   max_rounds: int = 30) -> DataFrame:
    """Broder bowtie decomposition of a directed graph (Broder et al.,
    "Graph structure in the Web", Computer Networks 2000) ->
    ``(id, region)`` with region in {CORE, IN, OUT, TUBE, TENDRIL,
    DISC}: CORE = the largest SCC (ties to the smallest scc_id); IN =
    nodes that reach CORE; OUT = nodes CORE reaches; among the rest,
    TUBE = on an IN->OUT path avoiding CORE, TENDRIL = weakly
    connected to the giant component without touching CORE either way
    (hangs off IN, feeds OUT, or dangles from OUT), DISC = in another
    weak component entirely.

    The web-graph census primitive: at crawl scale it tells a KG
    pipeline which hosts are authority-carrying (CORE/IN/OUT) versus
    crawl debris (TENDRIL/DISC). Built from
    :func:`strongly_connected_components` plus four diameter-bounded
    directed BFS closures; every exchange carries id-only rows."""
    e = _directed_distinct(edges, src, dst).localCheckpoint(eager=True)
    scc = strongly_connected_components(e, "u", "v", max_rounds)
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("n"))
    core_id = sizes.agg(F.expr(
        "min_by(scc_id, named_struct('nn', -n, 's', scc_id))").alias("cid"))
    core = (scc.join(F.broadcast(core_id),
                     F.col("scc_id") == F.col("cid"))
            .select("id").localCheckpoint(eager=True))
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    from_core = _reachable(core, e, max_rounds * 4)
    to_core = _reachable(core, rev, max_rounds * 4)
    in_set = to_core.join(core, "id", "left_anti").localCheckpoint(eager=True)
    out_set = from_core.join(core, "id", "left_anti").localCheckpoint(
        eager=True)
    # closures avoiding CORE: drop every edge touching a core node
    e2 = (e.join(core.withColumnRenamed("id", "u"), "u", "left_anti")
          .join(core.withColumnRenamed("id", "v"), "v", "left_anti")
          .localCheckpoint(eager=True))
    rev2 = e2.select(F.col("v").alias("u"), F.col("u").alias("v"))
    from_in = _reachable(in_set, e2, max_rounds * 4)
    to_out = _reachable(out_set, rev2, max_rounds * 4)
    # the giant weak component: undirected reach from CORE over ALL
    # edges — what separates tendril debris from truly disconnected
    # islands in Broder's taxonomy
    sym = e.unionByName(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    wcc = _reachable(core, sym, max_rounds * 8)
    nodes = scc.select("id")
    flags = (
        nodes
        .join(core.select("id", F.lit(1).alias("_core")), "id", "left")
        .join(in_set.select("id", F.lit(1).alias("_in")), "id", "left")
        .join(out_set.select("id", F.lit(1).alias("_out")), "id", "left")
        .join(from_in.select("id", F.lit(1).alias("_fi")), "id", "left")
        .join(to_out.select("id", F.lit(1).alias("_to")), "id", "left")
        .join(wcc.select("id", F.lit(1).alias("_wcc")), "id", "left")
    )
    region = (
        F.when(F.col("_core") == 1, F.lit("CORE"))
        .when(F.col("_in") == 1, F.lit("IN"))
        .when(F.col("_out") == 1, F.lit("OUT"))
        .when((F.col("_fi") == 1) & (F.col("_to") == 1), F.lit("TUBE"))
        .when(F.col("_wcc") == 1, F.lit("TENDRIL"))
        .otherwise(F.lit("DISC"))
    )
    return flags.select("id", region.alias("region"))


def neighborhood_function(edges: DataFrame, rounds: int = 4, p: int = 4,
                          src: str = "src", dst: str = "dst") -> DataFrame:
    """HyperANF neighborhood function (Boldi, Rosa & Vigna, WWW 2011;
    the HLL-sketch successor of Palmer et al.'s ANF, KDD 2002) ->
    ``(t, id, n_registers, ball_est)`` for t in 0..rounds: per node,
    the estimated size of its OUT-ball ``|{u : dist(id -> u) <= t}|``.
    Summing ``ball_est`` over nodes gives the neighborhood function
    N(t), whose saturation point is the effective-diameter estimate —
    the web-graph distance census that is infeasible exactly (all-pairs
    BFS) but one sketch-exchange per round with HLL registers.

    Register mechanics reuse :func:`sketches.hll_sketch` /
    :func:`sketches.hll_estimate` verbatim: integer-exact ranks (no
    float log2), harmonic denominator accumulated as an exact int64,
    linear counting below 2.5m — so the whole propagation is exactly
    SQL-replayable. Per round: ONE join of the register table against
    the edge list keyed by ``dst`` plus one (id, register)-keyed max
    aggregate; exchanges carry ``(id, int, int)`` rows only, at most
    m = 2^p per node, localCheckpoint-ed per round. Ball growth is
    monotone by register-wise max idempotence — the property that
    makes shard-merge at 1000 executors exact rather than approximate."""
    from .sketches import hll_estimate, hll_sketch

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0 (got {rounds})")
    e = _directed_distinct(edges, src, dst).localCheckpoint(eager=True)
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct())
    sk = hll_sketch(nodes, "id", ["id"], p=p).localCheckpoint(eager=True)

    def _est(sketch: DataFrame, t: int) -> DataFrame:
        return (hll_estimate(sketch, ["id"], p=p)
                .select(F.lit(t).cast("int").alias("t"), "id",
                        "n_registers",
                        F.col("est_distinct").alias("ball_est")))

    out = _est(sk, 0)
    for t in range(1, rounds + 1):
        contrib = (e.join(sk.withColumnRenamed("id", "v"), "v")
                   .select(F.col("u").alias("id"), "register", "rank"))
        sk = (sk.unionByName(contrib)
              .groupBy("id", "register").agg(F.max("rank").alias("rank"))
              .localCheckpoint(eager=True))
        out = out.unionByName(_est(sk, t))
    return out


_MOTIF_ATOM = None  # compiled lazily below


def _parse_motif(pattern: str):
    """Parse a chain-motif pattern into (src_var, pred_token,
    dst_var) atoms. Grammar (GraphFrames-find-style, SPARQL predicate
    variables): semicolon-separated directed atoms
    ``(a)-[supplies]->(b)``; the predicate slot is a literal
    predicate name, ``?r`` to BIND the predicate as an output
    column, or empty ``[]`` for "any predicate, not returned"."""
    import re
    global _MOTIF_ATOM
    if _MOTIF_ATOM is None:
        _MOTIF_ATOM = re.compile(
            r"^\(\s*(\w+)\s*\)\s*-\s*\[\s*(\??[\w:.\-]*)\s*\]\s*"
            r"->\s*\(\s*(\w+)\s*\)$")
    atoms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _MOTIF_ATOM.match(raw)
        if not m:
            raise ValueError(f"unparseable motif atom: {raw!r}")
        atoms.append((m.group(1), m.group(2), m.group(3)))
    if not atoms:
        raise ValueError("empty motif pattern")
    return atoms


def find_motif(triples: DataFrame, pattern: str,
               subj_col: str = "subj", pred_col: str = "pred",
               obj_col: str = "obj") -> DataFrame:
    """Graph-pattern (motif) matching over a ``(subj, pred, obj)``
    edge table — the relational core of a Cypher ``MATCH`` clause /
    GraphFrames ``find()`` / a SPARQL basic graph pattern, as pure
    Catalyst joins.

    ``pattern`` is a semicolon-separated conjunction of directed
    atoms ``(a)-[supplies]->(b)``. Node variables bind across atoms
    (the join keys); the predicate slot is a literal name (filter,
    pushed to the scan), ``?r`` (a predicate VARIABLE, returned as
    column ``r``), or ``[]`` (wildcard, anonymous). Returns the
    DISTINCT variable bindings, one column per node/predicate
    variable in first-appearance order. Atoms sharing no variable
    with the already-joined prefix are rejected (a Cartesian motif
    is almost always a pattern bug; cross products stay explicit in
    caller code).

    The reference's Neo4j layer answers exactly such patterns via
    Cypher (`reference/backend/kgapi/kg_writer.py` query strings);
    here the pattern compiles to a join tree Catalyst reorders and
    AQE re-plans — predicate literals prune at the scan, each shared
    variable is one hash-join key, and no loop or Python runs per
    row. Skewed hub variables are AQE's skew-join case.

    Scale shape: k atoms = k scans of the (pruned) triple table and
    k-1 hash joins carrying only the bound variable columns; the
    final distinct is the only extra exchange.
    """
    atoms = _parse_motif(pattern)
    t = (triples.select(F.col(subj_col).alias("_s"),
                        F.col(pred_col).alias("_p"),
                        F.col(obj_col).alias("_o"))
         .filter(F.col("_s").isNotNull() & F.col("_p").isNotNull()
                 & F.col("_o").isNotNull()))

    out_cols: list[str] = []
    acc = None
    for (sv, ptok, ov) in atoms:
        cols = [F.col("_s").alias(sv)]
        atom = t
        if ptok.startswith("?") and len(ptok) > 1:
            cols.append(F.col("_p").alias(ptok[1:]))
        elif ptok not in ("", "?"):
            atom = atom.filter(F.col("_p") == F.lit(ptok))
        if ov == sv:
            atom = atom.filter(F.col("_s") == F.col("_o"))
        else:
            cols.append(F.col("_o").alias(ov))
        atom = atom.select(*cols)
        if acc is None:
            acc = atom
        else:
            shared = [c for c in atom.columns if c in set(out_cols)]
            if not shared:
                raise ValueError(
                    f"motif atom ({sv})-[{ptok}]->({ov}) shares no "
                    "variable with the preceding atoms — Cartesian "
                    "patterns are rejected")
            acc = acc.join(atom, shared)
        for c in atom.columns:
            if c not in out_cols:
                out_cols.append(c)
    return acc.select(*out_cols).distinct()


def condense(edges: DataFrame, scc: DataFrame,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Condensation (quotient graph) of a directed graph under its
    strongly-connected components: one super-edge per ordered SCC
    pair connected by at least one underlying edge, with the count
    of distinct underlying edges. The condensation is a DAG — the
    object web-graph structure analyses (Broder et al. 2000) and
    incremental SCC maintenance actually traverse.

    ``scc`` is :func:`strongly_connected_components` output
    ``(id, scc_id)``. Intra-component edges collapse away.

    Scale shape: two id-keyed hash joins mapping endpoints to
    component ids (the label table is (id, id) pairs — broadcast
    when small, AQE decides), one distinct-edge fold, one
    map-side-combined count aggregate. Nothing wider than two id
    columns ever moves.
    """
    e = _directed_distinct(edges, src, dst)
    lab_u = scc.select(F.col("id").alias("u"),
                       F.col("scc_id").alias("scc_u"))
    lab_v = scc.select(F.col("id").alias("v"),
                       F.col("scc_id").alias("scc_v"))
    return (e.join(lab_u, "u").join(lab_v, "v")
            .filter(F.col("scc_u") != F.col("scc_v"))
            .groupBy("scc_u", "scc_v")
            .agg(F.count("*").cast("long").alias("n_edges")))


def degree_powerlaw(edges: DataFrame, src: str = "src",
                    dst: str = "dst", d_min: int = 2) -> DataFrame:
    """Power-law fit of the (undirected, distinct-neighbor) degree
    distribution — the scale-free exponent census every web-graph
    characterization reports (Barabási & Albert 1999; estimator from
    Clauset, Shalizi & Newman, SIAM Review 2009 eq. 3.1: continuous
    MLE ``alpha = 1 + n / Σ ln(d_i / (d_min − ½))`` over the tail
    ``d_i ≥ d_min``).

    Returns ONE row of integer-exact ingredients (the division and
    the final ``1 +`` stay row-local for the caller):

    - ``n_nodes`` / ``n_tail``  — all nodes / nodes with ``d ≥ d_min``
    - ``d_min`` / ``max_degree``
    - ``sum_log_1e6`` — ``Σ_i round(ln(d_i / (d_min − ½)) · 10⁶)``
      as BIGINT, accumulated over the bounded (degree, count) census
      so the float work is one ``ln`` per DISTINCT degree, rounded to
      6 dp BEFORE the integer-weighted sum — summation order can
      never reorder floats, and cross-engine libm agreement at 6 dp
      makes the statistic engine-deterministic (the repo-wide
      round-before-aggregate rule).

    Scale shape: one distinct-edge fold, one degree aggregate, one
    census aggregate over ≤ max_degree rows, one single-row final
    fold. ``(id, long)`` pairs are the widest exchange.
    """
    if d_min < 2:
        raise ValueError("d_min must be >= 2 (the d_min - 0.5 offset "
                         "must stay positive and the tail non-trivial)")
    und = _undirected(edges, src, dst)
    deg = (und.select(F.col("a").alias("id"))
           .unionByName(und.select(F.col("b").alias("id")))
           .groupBy("id")
           .agg(F.count("*").cast("long").alias("d")))
    return powerlaw_ingredients(deg, "d", d_min)


def powerlaw_ingredients(values: DataFrame, value_col: str,
                         d_min: int) -> DataFrame:
    """Integer-exact CSN power-law MLE ingredients for ANY positive
    integer value distribution (node degrees, term frequencies, host
    sizes): one row of ``n_nodes`` / ``n_tail`` / ``d_min`` /
    ``max_degree`` / ``sum_log_1e6`` over the rows of ``values``.
    Shared by :func:`degree_powerlaw` (degrees) and
    ``textstats.term_powerlaw`` (Zipf over term frequencies).

    Scale shape: one census aggregate over ≤ max(value) distinct
    values, then one single-row fold; the ln runs once per DISTINCT
    value and is rounded at the integer scale BEFORE the weighted
    sum (the repo-wide round-before-aggregate rule)."""
    if d_min < 2:
        raise ValueError("d_min must be >= 2 (the d_min - 0.5 offset "
                         "must stay positive and the tail non-trivial)")
    census = (values.groupBy(F.col(value_col).alias("d"))
              .agg(F.count("*").cast("long").alias("n_d")))
    # round at the INTEGER scale (round(ln·10⁶, 0)), never
    # round-to-6dp-then-multiply: 0.693147 · 10⁶ can sit at
    # x.999… in binary and a bare cast would truncate it down
    term_int = F.round(
        F.log(F.col("d").cast("double") / F.lit(float(d_min) - 0.5))
        * F.lit(1000000.0), 0).cast("long")
    # coalesce: aggregates over an EMPTY census are NULL — the
    # empty-input contract is one all-zeros row (dyad_census rule)
    return (census.agg(
        F.coalesce(F.sum("n_d"), F.lit(0)).cast("long")
        .alias("n_nodes"),
        F.coalesce(F.sum(F.when(F.col("d") >= d_min, F.col("n_d"))
                         .otherwise(F.lit(0))), F.lit(0))
        .cast("long").alias("n_tail"),
        F.coalesce(F.max("d"), F.lit(0)).cast("long")
        .alias("max_degree"),
        F.coalesce(F.sum(F.when(F.col("d") >= d_min,
                                term_int * F.col("n_d"))
                         .otherwise(F.lit(0).cast("long"))), F.lit(0))
        .cast("long").alias("sum_log_1e6"))
        .select("n_nodes", "n_tail",
                F.lit(int(d_min)).cast("long").alias("d_min"),
                "max_degree", "sum_log_1e6"))


def wl_roles(edges: DataFrame, rounds: int = 3, src: str = "src",
             dst: str = "dst") -> DataFrame:
    """Weisfeiler-Leman structural-role refinement (Weisfeiler &
    Leman 1968; the 1-WL color refinement used as graph-structure
    features by Shervashidze et al., JMLR 2011): every node starts
    with its degree as a label, then ``rounds`` times each node's
    label becomes a hash of (its old label, the MULTISET of its
    neighbors' old labels). Nodes sharing a final label are
    structurally indistinguishable at radius ``rounds`` — the
    "role" signal entity resolution over graphs blocks on, and the
    census a web-graph audit reads mirror/farm patterns from.

    Returns ``(id, role)``, ``role`` a 32-hex md5 string.

    The neighbor multiset is folded COMMUTATIVELY — per-neighbor
    52-bit md5 of the label (:func:`sketches.h52`) reduced mod 2^30,
    then summed alongside the neighbor count — instead of the
    classic sort-and-concatenate, so a hub's update is a plain
    aggregate: no ``collect_list`` whose row width scales with
    degree. The sum stays exact in a BIGINT up to ~2^33 neighbors.
    Two multisets colliding on (sum mod 2^30·deg-space, count) is
    possible but role-census-harmless; the fold is md5-based so the
    DuckDB oracle replays it bit-for-bit.

    Scale shape per round: one (id, label-hash) exchange keyed by
    the neighbor id + one join back to the label frame; labels are
    ``localCheckpoint``-ed per round so lineage stays flat.
    """
    from knowledge_graph_spark.operators.sketches import h52

    und = _undirected(edges, src, dst)
    # pre-key by v: every round joins labels on v, so the (big) edge
    # side shuffles ONCE here and its cached partitioning is reused
    # each round — same pattern as shortest_paths
    sym = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(und.select(F.col("b").alias("u"),
                                   F.col("a").alias("v")))
           .repartition(F.col("v"))
           .persist())
    labels = (sym.groupBy(F.col("u").alias("id"))
              .agg(F.count("*").cast("long").alias("_d"))
              .select("id", F.col("_d").cast("string").alias("role"))
              .localCheckpoint(eager=True))
    for _ in range(int(rounds)):
        nb = (sym.join(labels, sym["v"] == labels["id"])
              .select(F.col("u"),
                      F.pmod(h52(F.col("role")),
                             F.lit(1 << 30)).alias("_h"))
              .groupBy("u")
              .agg(F.sum("_h").cast("long").alias("_s"),
                   F.count("*").cast("long").alias("_c")))
        labels = (labels.join(nb, labels["id"] == nb["u"])
                  .select("id",
                          F.md5(F.concat_ws(
                              ":", F.col("role"),
                              F.col("_s").cast("string"),
                              F.col("_c").cast("string"))).alias("role"))
                  .localCheckpoint(eager=True))
    sym.unpersist()
    return labels


def spam_mass(edges: DataFrame, trusted: DataFrame, src: str = "src",
              dst: str = "dst", iterations: int = 10,
              damping: float = 0.85) -> DataFrame:
    """Spam-mass estimation (Gyongyi, Berkhin, Garcia-Molina,
    Pedersen, VLDB 2006 "Link spam detection based on mass
    estimation"): how much of a host's PageRank arrives from OUTSIDE
    a trusted core. ``pr`` is global PageRank, ``tr`` the
    TrustRank-style personalized PageRank teleporting only to the
    ``trusted`` seed hosts (Gyongyi et al., VLDB 2004); both are
    probability distributions over the same node set, so
    ``mass = pr - tr`` is the (possibly negative) rank share the
    trusted core cannot account for — large positive mass with
    meaningful pr is the link-spam signature.

    Returns ``(id, pr, tr, mass)`` doubles; callers needing
    hash-stable output should rank over rounded scores (the
    host_pagerank convention).

    Scale shape: both chains run in ONE fused loop — the state frame
    carries ``(id, t, pr, tr)``, so each round is one links-join
    feeding BOTH contribution sums, one two-column dangling
    broadcast, and one checkpointed update. Per-column arithmetic is
    exactly the :func:`pagerank` / :func:`personalized_pagerank`
    recurrences (same expressions, same join/aggregate keys), but
    the edge list is scanned once per round instead of twice and the
    sequential job chain is half as long — the wall-clock win at toy
    scale, and one fewer full rank-exchange per round at any scale.
    """
    pairs = (edges.select(F.col(src).alias("src"),
                          F.col(dst).alias("dst"))
             .filter(F.col("src").isNotNull()
                     & F.col("dst").isNotNull())
             .distinct())
    nodes = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct().persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        nodes.unpersist()
        return nodes.select("id", F.lit(0.0).alias("pr"),
                            F.lit(0.0).alias("tr"),
                            F.lit(0.0).alias("mass"))
    srcs = trusted.select(F.col(trusted.columns[0]).alias("id")).distinct()
    flags = (
        nodes.join(srcs.withColumn("_s", F.lit(1)), "id", "left")
        .select("id", F.coalesce(F.col("_s"), F.lit(0)).alias("_s"))
        .localCheckpoint(eager=True)
    )
    n_matched = flags.agg(F.sum("_s")).first()[0] or 0
    if n_matched == 0:
        raise ValueError(
            "spam_mass needs >= 1 trusted seed that is an edge "
            "endpoint (none of the given seeds appear in the graph)")
    deg = pairs.groupBy("src").agg(F.count("*").alias("deg"))
    links = pairs.join(deg, "src").persist()
    dangling = nodes.join(deg, nodes["id"] == deg["src"],
                          "left_anti").persist()

    base = (1.0 - damping) / n_nodes
    state = flags.select(
        "id", (F.col("_s") / F.lit(float(n_matched))).alias("t"),
        F.lit(1.0 / n_nodes).alias("pr"),
        (F.col("_s") / F.lit(float(n_matched))).alias("tr"))
    for _ in range(iterations):
        contribs = (
            links.join(state, links["src"] == state["id"])
            .select(F.col("dst").alias("id"),
                    (F.col("pr") / F.col("deg")).alias("cp"),
                    (F.col("tr") / F.col("deg")).alias("ct"))
            .groupBy("id").agg(F.sum("cp").alias("cp"),
                               F.sum("ct").alias("ct"))
        )
        dang = (
            state.join(dangling, "id", "left_semi")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dp"),
                 F.coalesce(F.sum("tr"), F.lit(0.0)).alias("dt"))
        )
        state = (
            state.select("id", "t")
            .join(contribs, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id", "t",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("cp"), F.lit(0.0))
                    + F.col("dp") / F.lit(float(n_nodes)))).alias("pr"),
                ((1.0 - damping) * F.col("t") + damping
                 * (F.coalesce(F.col("ct"), F.lit(0.0))
                    + F.col("dt") * F.col("t"))).alias("tr"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    links.unpersist()
    dangling.unpersist()
    return state.select("id", "pr", "tr",
                        (F.col("pr") - F.col("tr")).alias("mass"))


def landmark_distances(edges: DataFrame, landmarks: DataFrame,
                       src: str = "src", dst: str = "dst",
                       max_hops: int = 6) -> DataFrame:
    """Landmark (pivot) BFS index (Potamias, Bonchi, Castillo,
    Gionis, CIKM 2009 "Fast shortest path distance estimation in
    large networks"): hop distances from EVERY landmark to every
    node within ``max_hops``, kept per-landmark — the offline index
    whose triangle-inequality read ``min_l d(a,l) + d(l,b)``
    (:func:`landmark_estimate`) answers pairwise distance queries
    without a per-query BFS, the only practical distance oracle at
    web-graph scale.

    Returns ``(id, landmark, dist)``; landmarks absent from the
    edge set contribute nothing.

    Same per-hop shape as :func:`shortest_paths`, with the
    composite ``(id, landmark)`` frontier key: one shuffle join of
    the frontier against the symmetrized edge list (re-keyed once,
    reused every hop) + one anti-join against the visited set; rows
    are ``(id, landmark, int)`` triples only. All landmarks advance
    in the SAME frontier, so the index costs one BFS sweep, not one
    per landmark.
    """
    sym = _sym_partitioned(edges, src, dst)
    lm = landmarks.select(
        F.col(landmarks.columns[0]).alias("landmark")).distinct()
    # keep only landmarks that are actual endpoints (dist-0 seeds)
    frontier = (
        lm.join(sym.select(F.col("src").alias("id")).distinct(),
                lm["landmark"] == F.col("id"), "left_semi")
        .select(F.col("landmark").alias("id"), F.col("landmark"),
                F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"), "landmark",
                    F.lit(hop).alias("dist"))
            .distinct()
            .join(dist, ["id", "landmark"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        dist = dist.unionByName(frontier)
    sym.unpersist()
    return dist.select("id", "landmark", F.col("dist").cast("long")
                       .alias("dist"))


def landmark_estimate(index: DataFrame, pairs: DataFrame,
                      a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Triangle-inequality distance estimates from a landmark index
    (Potamias et al. 2009): for each query pair, the upper bound
    ``est = min over landmarks of d(a, l) + d(l, b)``. Pairs where
    no landmark reaches both sides are omitted (disconnected or
    beyond the index horizon).

    Scale shape: two joins keyed by node id against the (id,
    landmark, dist) index — each pair fans out to at most
    |landmarks| rows — then one pair-keyed min. No BFS at query
    time; that is the point of the index."""
    ia = index.select(F.col("id").alias("_a"), "landmark",
                      F.col("dist").alias("_da"))
    ib = index.select(F.col("id").alias("_b"), "landmark",
                      F.col("dist").alias("_db"))
    return (pairs.select(F.col(a_col).alias("_a"),
                         F.col(b_col).alias("_b"))
            .join(ia, "_a").join(ib, ["_b", "landmark"])
            .groupBy("_a", "_b")
            .agg(F.min(F.col("_da") + F.col("_db")).cast("long")
                 .alias("est"))
            .select(F.col("_a").alias(a_col), F.col("_b").alias(b_col),
                    "est"))


def assortativity_ingredients(edges: DataFrame, src: str = "src",
                              dst: str = "dst") -> DataFrame:
    """Degree-assortativity ingredients (Newman, PRL 2002
    "Assortative mixing in networks"): the Pearson correlation of
    endpoint degrees over the undirected distinct edge set — the
    one-number census separating social-style graphs (assortative,
    r > 0) from web/biological graphs (disassortative, r < 0), and a
    drift alarm for synthetic-vs-crawled link corpora.

    Emits ONE row of INTEGER sufficient statistics over the edge
    list with both orientations (the standard symmetric convention:
    each undirected edge contributes (deg_u, deg_v) and
    (deg_v, deg_u)): ``(n_pairs, sx, sxx, sxy)`` — by symmetry
    sy = sx and syy = sxx, so
    ``r = (n·sxy − sx²) / (n·sxx − sx²)`` is a row-local division
    for API users and the output hash-stably replays cross-engine.

    Scale shape: one distinct-edge fold, one degree aggregate, one
    id-keyed join per endpoint ((id, long) pairs only), one single-
    row fold. Degree sums fit BIGINT to ~2^21-degree hubs on 2^21
    edges; beyond that, profile on a degree-capped subgraph.
    """
    und = _undirected(edges, src, dst)
    sym = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(und.select(F.col("b").alias("u"),
                                   F.col("a").alias("v"))))
    deg = sym.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    du = deg.select(F.col("u"), F.col("d").alias("_du"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("_dv"))
    j = sym.join(du, "u").join(dv, "v")
    return j.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("_du").cast("long").alias("sx"),
        F.sum(F.col("_du") * F.col("_du")).cast("long").alias("sxx"),
        F.sum(F.col("_du") * F.col("_dv")).cast("long").alias("sxy"))


def centrality_census(edges: DataFrame, sources: DataFrame,
                      src: str = "src", dst: str = "dst",
                      max_hops: int = 6) -> DataFrame:
    """Pivot-sampled closeness/eccentricity ingredients (Eppstein &
    Wang 2004 "Fast approximation of centrality"; Bavelas 1950):
    BFS hop distances from a deterministic pivot sample, folded per
    node into the INTEGER sufficient statistics of every classical
    distance centrality — ``n_src`` pivots reached, ``sum_dist``
    (closeness denominator), ``ecc`` (max observed distance, an
    eccentricity lower bound whose max over nodes lower-bounds the
    diameter). Closeness ``(n_src-1)/sum_dist`` and the Eppstein-
    Wang extrapolation are row-local divisions for API users;
    keeping the output integral makes it hash-stable cross-engine.

    Returns ``(id, n_src, sum_dist, ecc)``, all BIGINT.

    Scale shape: ONE composite-key BFS sweep for all pivots
    (exactly :func:`landmark_distances` — rows are (id, pivot, int)
    triples, the symmetrized edge list shuffles once and is reused
    every hop) + one id-keyed aggregate. Pivot count bounds both
    the frontier width multiplier and the census variance."""
    idx = landmark_distances(edges, sources, src=src, dst=dst,
                             max_hops=max_hops)
    return idx.groupBy("id").agg(
        F.count("*").cast("long").alias("n_src"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.max("dist").cast("long").alias("ecc"))


def stress_centrality(edges: DataFrame, sources: DataFrame,
                      src: str = "src", dst: str = "dst",
                      max_hops: int = 6) -> DataFrame:
    """Pivot-sampled stress and betweenness centrality over the
    undirected graph (Shimbel 1953 stress; Brandes 2001 dependency
    accumulation; Bader et al. 2007 pivot sampling): for each pivot
    ``s`` run a BFS that counts shortest paths ``sigma_s(v)``, then
    accumulate backward over the shortest-path DAG

    - ``r_s(v) = sum over DAG successors w of (r_s(w) + 1)`` — the
      number of shortest s-paths CONTINUING strictly through v
      (integer-exact), so ``stress(v) = sum_s sigma_s(v) * r_s(v)``
      is Shimbel's count of pivot-sourced shortest paths passing
      through v as an interior vertex;
    - ``delta_s(v) = sigma_s(v) * sum over successors w of
      (1 + delta_s(w)) / sigma_s(w)`` — Brandes' pair dependency,
      summed into ``betweenness``.

    Returns ``(id, stress, betweenness)`` for every node reached at
    depth >= 1 from some pivot; ``stress`` is BIGINT and exact (the
    cross-engine hash surface), ``betweenness`` DOUBLE (rank it
    over rounded values downstream, the host_pagerank convention).
    Pivots themselves appear only via OTHER pivots' walks, matching
    the s != v != t convention. For undirected graphs each (s, t)
    pair is seen once per pivot endpoint, so full-pivot-set runs
    report 2x the textbook undirected betweenness.

    Scale shape: forward = one composite ``(pivot, node)`` frontier
    join per hop against the once-shuffled symmetric edge list with
    map-side-combinable sigma sums; the DAG is materialized ONCE as
    ``(pivot, u, du, sigma_u, v)`` rows keyed by adjacent BFS
    depths; backward = one depth-d slice join per level against the
    accumulated ``(pivot, node, r, acc)`` frame. Every exchange
    carries ids and fixed-width numerics only. Path counts grow
    combinatorially on dense graphs — BIGINT holds to ~2^63, so cap
    ``max_hops`` (the horizon is also the variance knob) rather
    than sweeping deep on high-degree webgraphs."""
    sym = _sym_partitioned(edges, src, dst)
    piv = sources.select(
        F.col(sources.columns[0]).alias("s")).distinct()
    frontier = (
        piv.join(sym.select(F.col("src").alias("id")).distinct(),
                 piv["s"] == F.col("id"), "left_semi")
        .select("s", F.col("s").alias("id"), F.lit(0).alias("dist"),
                F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint(eager=True)
    )
    full = frontier
    max_seen = 0
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select("s", F.col("dst").alias("id"), F.col("sigma"))
            .groupBy("s", "id")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .join(full.select("s", "id"), ["s", "id"], "left_anti")
            .select("s", "id", F.lit(hop).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        max_seen = hop
        full = full.unionByName(nxt)
        frontier = nxt
    # shortest-path DAG: (s, u, du, sigma_u, v) for sym edges u->v
    # with dist_s(v) = dist_s(u) + 1
    u_side = full.select("s", F.col("id").alias("u"),
                         F.col("dist").alias("du"),
                         F.col("sigma").alias("sigma_u"))
    v_side = full.select(F.col("s").alias("s2"),
                         F.col("id").alias("v"),
                         F.col("dist").alias("dv"),
                         F.col("sigma").alias("sigma_v"))
    dag = (
        sym.join(u_side, sym["src"] == u_side["u"])
        .join(v_side, (sym["dst"] == v_side["v"])
              & (u_side["s"] == v_side["s2"])
              & (v_side["dv"] == u_side["du"] + 1))
        .select("s", "u", "du", "sigma_u", "v", "sigma_v")
        .persist()
    )
    # backward accumulation, deepest level first; acc holds
    # sum over successors of (1 + delta_w) / sigma_w
    done = (full.filter(F.col("dist") == max_seen)
            .select("s", "id", F.lit(0).cast("long").alias("r"),
                    F.lit(0.0).alias("acc"))
            .localCheckpoint(eager=True))
    for d in range(max_seen - 1, -1, -1):
        succ = (
            dag.filter(F.col("du") == d)
            .join(done.select(F.col("s").alias("s3"),
                              F.col("id").alias("w"),
                              F.col("r").alias("rw"),
                              F.col("acc").alias("accw")),
                  (F.col("v") == F.col("w")) & (F.col("s") == F.col("s3")))
            .groupBy("s", "u")
            .agg(F.sum(F.col("rw") + 1).cast("long").alias("r"),
                 F.sum((F.lit(1.0) + F.col("accw") * F.col("sigma_v"))
                       / F.col("sigma_v")).alias("acc"))
        )
        lvl = (
            full.filter(F.col("dist") == d).select("s", "id")
            .join(succ.select(F.col("s").alias("s4"),
                              F.col("u"), F.col("r"), F.col("acc")),
                  (F.col("id") == F.col("u")) & (F.col("s") == F.col("s4")),
                  "left")
            .select("s", "id",
                    F.coalesce(F.col("r"), F.lit(0)).cast("long")
                    .alias("r"),
                    F.coalesce(F.col("acc"), F.lit(0.0)).alias("acc"))
            .localCheckpoint(eager=True)
        )
        done = done.unionByName(lvl)
    out = (
        full.filter(F.col("dist") > 0)
        .join(done.select(F.col("s").alias("s5"),
                          F.col("id").alias("id5"),
                          F.col("r"), F.col("acc")),
              (F.col("id") == F.col("id5")) & (F.col("s") == F.col("s5")))
        .groupBy("id")
        .agg(F.sum(F.col("sigma") * F.col("r")).cast("long")
             .alias("stress"),
             F.sum(F.col("sigma") * F.col("acc")).alias("betweenness"))
    )
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    dag.unpersist()
    return out


def salsa(edges: DataFrame, src: str = "src",
          dst: str = "dst") -> DataFrame:
    """SALSA link analysis (Lempel & Moran, WWW 2000): hub and
    authority scores from the stationary distribution of the
    alternating backward/forward random walk on the bipartite
    hub↔authority view of the link graph. Computed in CLOSED FORM
    rather than by power iteration — Lempel & Moran's Proposition 2:
    within a connected component ``C`` of the authority support
    graph (authorities adjacent iff co-cited by some hub), the
    stationary authority weight is

        score(i) = (|C| / |A|) * din(i) / din(C)

    (component share times within-component in-degree fraction), and
    symmetrically for hubs over out-degrees on the co-reference
    graph. The closed form is exact, iteration-free, and all its
    ingredients are INTEGERS — ``(deg, comp_size, comp_deg,
    n_side)`` — so the result is hash-stable cross-engine and the
    derived double is one row-local division.

    Returns ``(id, side, deg, comp_size, comp_deg, n_side, score)``
    with ``side`` in {'authority', 'hub'}.

    Scale shape: one distinct-edge fold; per side one degree
    aggregate, one min-per-block star reduction (co-citation
    connectivity via (min co-endpoint, endpoint) STAR edges — never
    the quadratic co-citation pair set), one
    :func:`~knowledge_graph_spark.operators.components.connected_components`
    run over those |E|-bounded star edges, and one component
    aggregate broadcast back. Every exchange carries (id, id) or
    (id, long) rows only."""
    from knowledge_graph_spark.operators.components import (
        connected_components)

    pairs = (edges.select(F.col(src).alias("src"),
                          F.col(dst).alias("dst"))
             .filter(F.col("src").isNotNull()
                     & F.col("dst").isNotNull())
             .distinct().persist())

    def _side(end_col: str, other_col: str, side_name: str):
        deg = (pairs.groupBy(F.col(end_col).alias("id"))
               .agg(F.count("*").cast("long").alias("deg")))
        # star edges: every endpoint of a shared co-endpoint links to
        # the minimum such endpoint — same components as the full
        # co-citation graph, linear in |E|
        roots = (pairs.groupBy(other_col)
                 .agg(F.min(end_col).alias("_root")))
        star = (pairs.join(roots, other_col)
                .select(F.col("_root").alias("u"),
                        F.col(end_col).alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct())
        comp = connected_components(star)
        lab = (deg.join(comp, deg["id"] == comp["node"], "left")
               .select("id", "deg",
                       F.coalesce(F.col("component"), F.col("id"))
                       .alias("comp")))
        stats = (lab.groupBy("comp")
                 .agg(F.count("*").cast("long").alias("comp_size"),
                      F.sum("deg").cast("long").alias("comp_deg")))
        tot = lab.agg(F.count("*").cast("long").alias("n_side"))
        # no forced broadcast: the per-component stats frame is
        # data-dependent (up to one row per node on a fragmented
        # co-citation graph) — let the planner/AQE pick the strategy
        return (lab.join(stats, "comp")
                .crossJoin(F.broadcast(tot))
                .select("id", F.lit(side_name).alias("side"), "deg",
                        "comp_size", "comp_deg", "n_side",
                        ((F.col("comp_size") / F.col("n_side"))
                         * (F.col("deg") / F.col("comp_deg")))
                        .alias("score")))

    out = (_side("dst", "src", "authority")
           .unionByName(_side("src", "dst", "hub")))
    out = out.localCheckpoint(eager=True)
    pairs.unpersist()
    return out


def rich_club_census(edges: DataFrame, ks: list,
                     src: str = "src", dst: str = "dst") -> DataFrame:
    """Rich-club ingredients (Zhou & Mondragón 2004; Colizza et al.,
    Nature Physics 2006): for each degree threshold ``k``, the number
    of nodes with degree > k and the number of undirected edges with
    BOTH endpoints above the threshold. The rich-club coefficient
    ``phi(k) = 2 E_k / (N_k (N_k - 1))`` is a row-local division for
    API users; the census stays integral (the cross-engine hash
    surface). The k-profile separates hub-interconnected webgraphs
    (rich clubs: mirror farms, link exchanges) from hub-and-spoke
    topologies.

    Returns ``(k, n_nodes, n_edges)``, all BIGINT, one row per
    requested threshold (thresholds with no qualifying nodes emit
    ``(k, 0, 0)``).

    Scale shape: one degree aggregate over the canonical undirected
    edge set, two id-keyed joins to tag each edge with its endpoint
    degrees, then ONE pass over the tagged edges producing all
    thresholds via conditional aggregation (the threshold list rides
    in the plan — no per-k scan)."""
    und = _undirected(edges, src, dst)
    sym = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(und.select(F.col("b").alias("u"),
                                   F.col("a").alias("v"))))
    deg = sym.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    ks = sorted(set(int(k) for k in ks))
    if not ks:
        raise ValueError("rich_club_census: need >= 1 threshold")
    node_rows = deg.agg(*[
        F.sum(F.when(F.col("d") > k, 1).otherwise(0)).cast("long")
        .alias(f"n{k}") for k in ks])
    tagged = (und
              .join(deg.select(F.col("u").alias("a"),
                               F.col("d").alias("_da")), "a")
              .join(deg.select(F.col("u").alias("b"),
                               F.col("d").alias("_db")), "b"))
    edge_rows = tagged.agg(*[
        F.sum(F.when((F.col("_da") > k) & (F.col("_db") > k), 1)
              .otherwise(0)).cast("long").alias(f"e{k}") for k in ks])
    both = node_rows.crossJoin(edge_rows)
    # one row per threshold via a single in-plan explode — a k-way
    # union would re-evaluate both aggregates once per branch
    rows = F.array(*[
        F.struct(F.lit(k).cast("long").alias("k"),
                 F.col(f"n{k}").alias("n_nodes"),
                 F.col(f"e{k}").alias("n_edges")) for k in ks])
    return (both.select(F.explode(rows).alias("_r"))
            .select("_r.k", "_r.n_nodes", "_r.n_edges"))


def dominant_matching(edges: DataFrame, src: str = "src",
                      dst: str = "dst", weight: str = "w",
                      rounds: int = 8) -> DataFrame:
    """Greedy maximal-weight matching via locally dominant edges
    (Preis, STACS 1999; Manne & Bisseling 2007 — the standard
    distributed 1/2-approximation of maximum weight matching): each
    round, an edge is matched iff it is the best edge of BOTH its
    endpoints ("locally dominant"); matched endpoints leave the
    graph. The 1-1 constraint solver for entity alignment — after
    similarity scoring, each record may claim at most one partner.

    "Best" is the lexicographic max of ``(weight, partner)`` — a
    total order, so the matching is DETERMINISTIC and the fixed
    ``rounds`` horizon lets a SQL oracle replay it exactly (a round
    with no remaining edges is a no-op, so early exhaustion agrees
    with the unrolled replay). The horizon is honest: pathological
    weight chains can need O(n) rounds; 8 rounds match everything
    locally dominant within 8 cascade steps — on similarity-scored
    ER graphs the cascade dies in 2-4.

    Returns matched ``(src, dst, w)`` edges.

    Scale shape per round: two (endpoint)-keyed max-struct
    aggregates (map-side combinable), one join of the edge list
    against both bests, two anti-joins to drop matched endpoints;
    the edge frame is localCheckpoint-ed so lineage stays flat.
    Exchanges carry (id, id, numeric) triples only."""
    # parallel (u, v) edges — and the REVERSE orientation of the
    # same undirected pair — fold to one row FIRST (max weight, ties
    # to the max-struct orientation — deterministic): the dominance
    # test compares partners, so without the fold every parallel or
    # reversed copy of a dominant pair would match (multigraph
    # property test; r5 review). Self-loops are dropped like every
    # other operator here — a node cannot partner itself.
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                      F.col(weight).alias("w"))
         .filter(F.col("w").isNotNull() & F.col("u").isNotNull()
                 & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
         .withColumn("_k1", F.least("u", "v"))
         .withColumn("_k2", F.greatest("u", "v"))
         .groupBy("_k1", "_k2")
         .agg(F.max(F.struct("w", "u", "v")).alias("_m"))
         .select(F.col("_m.u").alias("u"), F.col("_m.v").alias("v"),
                 F.col("_m.w").alias("w"))
         .localCheckpoint(eager=True))
    out = None
    for _ in range(int(rounds)):
        if e.isEmpty():
            break
        # per-NODE best over BOTH incidences: a node appearing as src
        # of one edge and dst of another (general graphs) has ONE
        # best partner, not one per column — the per-column form
        # matched such a node twice (r5 review; the bipartite caller
        # masked it)
        inc = (e.select(F.col("u").alias("n"), F.col("v").alias("p"),
                        "w")
               .unionByName(e.select(F.col("v").alias("n"),
                                     F.col("u").alias("p"), "w")))
        best = (inc.groupBy("n")
                .agg(F.max(F.struct("w", "p")).alias("_b"))
                .select("n", F.col("_b.p").alias("bp")))
        m = (e.join(best.select(F.col("n").alias("u"),
                                F.col("bp").alias("_bu")), "u")
             .join(best.select(F.col("n").alias("v"),
                               F.col("bp").alias("_bv")), "v")
             .filter((F.col("_bu") == F.col("v"))
                     & (F.col("_bv") == F.col("u")))
             .select("u", "v", "w")
             .localCheckpoint(eager=True))
        out = m if out is None else out.unionByName(m)
        matched = (m.select(F.col("u").alias("_mn"))
                   .unionByName(m.select(F.col("v").alias("_mn")))
                   .distinct())
        e = (e.join(matched, e["u"] == F.col("_mn"), "left_anti")
             .join(matched, e["v"] == F.col("_mn"), "left_anti")
             .localCheckpoint(eager=True))
    if out is None:
        out = e.limit(0)
    return out.select(F.col("u").alias(src), F.col("v").alias(dst),
                      F.col("w").alias(weight))


def katz_ingredients(edges: DataFrame, alpha_inv: int = 8,
                     rounds: int = 4, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Katz centrality, integer-exact (Katz, Psychometrika 1953
    "A new status index derived from sociometric analysis"): the
    attenuated path-count status measure
    ``x(v) = sum_k alpha^k (#paths of length k ending at v)`` —
    the in-link prestige index that, unlike PageRank, does not
    dilute a recommendation by the recommender's out-degree, which
    is exactly the right convention for citation/endorsement edges.

    Determinism across engines is the whole design: with
    ``alpha = 1/alpha_inv`` the scaled iterate
    ``y_t = alpha_inv^t * x_t`` satisfies the INTEGER recurrence

        ``y_{t+1}(v) = sum_{u->v} (alpha_inv^t + y_t(u))``

    so every round is BIGINT-exact arithmetic and the emitted
    ``katz_num = y_rounds`` hash-replays bit-for-bit on any engine;
    ``katz = katz_num / alpha_inv^rounds`` is a row-local division
    for API users. Truncation at ``rounds`` is the standard finite
    Neumann-series cutoff; attenuation alpha^k bounds the tail.

    Returns ``(id, katz_num)`` over every endpoint node, BIGINT.

    Scale shape: per round ONE edge-keyed join + one dst-keyed sum
    — ``(id, long)`` pairs only on the wire, the distinct edge list
    shuffles once and is reused, per-round localCheckpoint keeps
    lineage O(1). Overflow bound: ``y_t <= (t+1) * max(alpha_inv,
    max_indegree)^t`` — BIGINT-safe to ~2^15-indegree hubs at 4
    rounds; cap hub in-degree or lower ``rounds`` beyond that.

    Cites reference scope: ``backend/kgapi/`` has no centrality —
    this is part of the "which entities matter" analytics layer the
    Spark engine adds over the materialized KG.
    """
    a = int(alpha_inv)
    if a < 2:
        raise ValueError("alpha_inv must be >= 2 (alpha < 1/2)")
    e = _directed_distinct(edges, src, dst).localCheckpoint(eager=True)
    nodes = (e.select(F.col("u").alias("id"))
             .unionByName(e.select(F.col("v").alias("id")))
             .distinct().localCheckpoint(eager=True))
    y = nodes.select("id", F.lit(0).cast("long").alias("y"))
    for t in range(int(rounds)):
        c_t = a ** t
        contrib = (e.join(y.withColumnRenamed("id", "u"), "u")
                   .groupBy(F.col("v").alias("id"))
                   .agg(F.sum(F.col("y") + F.lit(c_t).cast("long"))
                        .cast("long").alias("_c")))
        y = (nodes.join(contrib, "id", "left")
             .select("id", F.coalesce("_c", F.lit(0).cast("long"))
                     .alias("y"))
             .localCheckpoint(eager=True))
    return y.select("id", F.col("y").alias("katz_num"))


def dyad_census(edges: DataFrame, src: str = "src",
                dst: str = "dst") -> DataFrame:
    """Directed dyad census (Holland & Leinhardt, JASA 1976 "Local
    structure in social networks" — the M/A/N census): for every
    unordered node pair, is the connection mutual (edges both
    ways), asymmetric (one way), or null? The one-row summary that
    measures a link corpus's reciprocity — web/citation graphs run
    asymmetric, social/endorsement graphs run mutual — and feeds
    the classical conditional-uniform graph tests.

    Returns ONE integer row ``(n_nodes, mutual_dyads, asym_dyads,
    null_dyads)``; reciprocity ``r = 2M / (2M + A)`` and dyad
    density are row-local divisions for API users.

    Scale shape: no pair join anywhere — each directed edge folds
    to its unordered dyad key ``(least, greatest)``, one map-side-
    combined count per connected dyad (1 or 2), one single-row
    fold; null dyads come from ``C(n,2)`` arithmetic, never from
    materializing non-edges. Exchanges carry (id, id) keys only.
    """
    e = _directed_distinct(edges, src, dst)
    dyads = (e.select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
             .groupBy("a", "b")
             .agg(F.count("*").cast("int").alias("_m")))
    n_nodes = (e.select(F.col("u").alias("id"))
               .unionByName(e.select(F.col("v").alias("id")))
               .distinct()
               .agg(F.count("*").cast("long").alias("n"))
               .select("n"))
    # coalesce: SUM over an EMPTY dyad set is NULL — the empty-graph
    # contract is one all-zeros row (n_nodes 0, every census count 0)
    summary = dyads.agg(
        F.coalesce(F.sum(F.when(F.col("_m") == 2, 1).otherwise(0)),
                   F.lit(0)).cast("long").alias("mutual_dyads"),
        F.coalesce(F.sum(F.when(F.col("_m") == 1, 1).otherwise(0)),
                   F.lit(0)).cast("long").alias("asym_dyads"))
    return (summary.crossJoin(F.broadcast(n_nodes))
            .select(F.col("n").alias("n_nodes"),
                    "mutual_dyads", "asym_dyads",
                    # integer division (DIV) keeps the census
                    # BIGINT-exact cross-engine; n*(n-1) is even so
                    # no truncation ever actually occurs
                    (F.expr("(n * (n - 1)) DIV 2")
                     - F.col("mutual_dyads") - F.col("asym_dyads"))
                    .cast("long").alias("null_dyads")))


def conductance_census(edges: DataFrame, communities: DataFrame,
                       src: str = "src", dst: str = "dst",
                       id_col: str = "id",
                       com_col: str = "community") -> DataFrame:
    """Community conductance census (Leskovec, Lang, Dasgupta &
    Mahoney, Internet Math. 2009 — the Network Community Profile's
    per-community ingredient; Shi & Malik 2000 normalized cut): for
    each community C over the undirected distinct edge set, the
    INTEGER ingredients of ``phi(C) = cut(C) / min(vol(C),
    vol(V)-vol(C))`` — the standard "is this partition real
    structure or an arbitrary slice" diagnostic over an ER
    partition, a crawl shard, or an LPA output.

    Returns per community: ``(community, n_nodes, volume,
    internal_edges, cut_edges)`` — all BIGINT; ``internal_edges``
    counts each inside-C edge once, and phi is a row-local division
    for API users (total volume = sum over the census). ``volume``
    sums RAW-graph degrees of C's members, so the self-check
    identity ``volume = 2*internal + cut`` holds only when every
    edge endpoint carries a community label; edges touching an
    unlabeled node count toward their labeled endpoint's volume but
    toward neither internal nor cut (see
    test_conductance_drops_unlabeled_endpoints).

    Scale shape: one undirected-distinct fold, one (id, community)
    join per endpoint (AQE skew case on hub communities), then two
    map-side-combined aggregates — per-edge rows carry (id, id,
    community, community) keys only; a cross edge contributes one
    cut count to EACH side via an in-plan two-row explode, never a
    second scan. Nodes missing a community label are dropped with
    their edges (documented: label your frontier first).
    """
    und = _undirected(edges, src, dst)
    lab = communities.select(F.col(id_col).alias("_id"),
                             F.col(com_col).alias("_c"))
    lab_a = lab.select(F.col("_id").alias("a"), F.col("_c").alias("_ca"))
    lab_b = lab.select(F.col("_id").alias("b"), F.col("_c").alias("_cb"))
    tagged = und.join(lab_a, "a").join(lab_b, "b")
    per_side = tagged.select(
        F.explode(F.when(F.col("_ca") == F.col("_cb"),
                         F.array(F.struct(F.col("_ca").alias("c"),
                                          F.lit(1).alias("i"),
                                          F.lit(0).alias("x"))))
                  .otherwise(F.array(
                      F.struct(F.col("_ca").alias("c"),
                               F.lit(0).alias("i"), F.lit(1).alias("x")),
                      F.struct(F.col("_cb").alias("c"),
                               F.lit(0).alias("i"), F.lit(1).alias("x")))))
        .alias("_e"))
    edge_stats = (per_side
                  .groupBy(F.col("_e.c").alias(com_col))
                  .agg(F.sum("_e.i").cast("long").alias("internal_edges"),
                       F.sum("_e.x").cast("long").alias("cut_edges")))
    deg = (und.select(F.col("a").alias("_id"))
           .unionByName(und.select(F.col("b").alias("_id")))
           .groupBy("_id").agg(F.count("*").cast("long").alias("_d")))
    node_stats = (lab.join(deg, "_id", "left")
                  .groupBy(F.col("_c").alias(com_col))
                  .agg(F.count("*").cast("long").alias("n_nodes"),
                       F.sum(F.coalesce("_d", F.lit(0).cast("long")))
                       .cast("long").alias("volume")))
    return (node_stats.join(edge_stats, com_col, "left")
            .select(com_col, "n_nodes", "volume",
                    F.coalesce("internal_edges", F.lit(0).cast("long"))
                    .alias("internal_edges"),
                    F.coalesce("cut_edges", F.lit(0).cast("long"))
                    .alias("cut_edges")))


def coreness(edges: DataFrame, src: str = "src", dst: str = "dst",
             max_rounds: int = 50) -> DataFrame:
    """Full k-core decomposition — every node's core number — via the
    h-index fix-point (Lü, Zhou, Zhang & Stanley, Nature
    Communications 2016 "The H-index of a network node and its
    relation to degree and coreness"): start from degree and
    repeatedly replace each node's value with the h-index of its
    neighbors' values; the process is monotonically non-increasing
    and its fixed point IS the coreness (Theorem 1). This subsumes
    :func:`k_core` (which peels ONE k) with a single pass that needs
    no sequential min-degree peeling order — the property that makes
    coreness computable on a 10^12-edge graph at all.

    Returns ``(id, coreness)`` for every endpoint node — all
    integers, so the result hash-replays bit-for-bit cross-engine
    (every h-index step is rank-vs-value integer arithmetic).

    Scale shape: the symmetrized edge list shuffles once and is
    reused every round; each round is one id-keyed join moving
    ``(id, int)`` pairs, one neighbor-keyed window (partitioned by
    node id — hub partitions are the spillable-window skew case,
    bounded by max degree), and one max aggregate; per-round
    localCheckpoint keeps lineage O(1); early exit on fix-point.
    Round count is bounded by the longest strictly-decreasing
    cascade, empirically O(10) on web graphs (Lü et al. Fig. 2).
    """
    from pyspark.sql import Window

    und = _undirected(edges, src, dst)
    sym = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(und.select(F.col("b").alias("u"),
                                   F.col("a").alias("v")))
           .localCheckpoint(eager=True))
    c = (sym.groupBy(F.col("u").alias("id"))
         .agg(F.count("*").cast("int").alias("c"))
         .localCheckpoint(eager=True))
    for _ in range(int(max_rounds)):
        nbr = (sym.join(c.withColumnRenamed("id", "v"), "v")
               .select(F.col("u").alias("id"), F.col("c").alias("_cv")))
        w = (Window.partitionBy("id")
             .orderBy(F.col("_cv").desc()))
        # h-index of the neighbor multiset: rank values descending,
        # h = max over rows of min(rank, value)
        new = (nbr.withColumn("_r", F.row_number().over(w))
               .groupBy("id")
               .agg(F.max(F.least(F.col("_r"), F.col("_cv")))
                    .cast("int").alias("c"))
               .localCheckpoint(eager=True))
        changed = (new.withColumnRenamed("c", "_new").join(c, "id")
                   .filter(F.col("_new") != F.col("c")))
        done = changed.isEmpty()
        c = new
        if done:
            break
    return c.select("id", F.col("c").alias("coreness"))


# 6-bit dyad-state code -> Holland-Leinhardt triad isomorphism class.
# Code = m_ij + 4*m_ik + 16*m_jk over the sorted triad (i<j<k), where
# each pair state m is 1 = low->high arc, 2 = high->low arc, 3 = both.
# Derived once by brute-force canonicalization over all 6 node
# permutations (verified against the standard orbit sizes: 003/300
# have 1 code, 030C has 2, the D/U/201 classes 3, the rest 6).
_TRIAD_TYPE_BY_CODE = {
    0: '003', 1: '012', 2: '012', 3: '102', 4: '012', 5: '021D',
    6: '021C', 7: '111U', 8: '012', 9: '021C', 10: '021U', 11: '111D',
    12: '102', 13: '111U', 14: '111D', 15: '201', 16: '012',
    17: '021C', 18: '021D', 19: '111U', 20: '021U', 21: '030T',
    22: '030T', 23: '120U', 24: '021C', 25: '030C', 26: '030T',
    27: '120C', 28: '111D', 29: '120C', 30: '120D', 31: '210',
    32: '012', 33: '021U', 34: '021C', 35: '111D', 36: '021C',
    37: '030T', 38: '030C', 39: '120C', 40: '021D', 41: '030T',
    42: '030T', 43: '120D', 44: '111U', 45: '120U', 46: '120C',
    47: '210', 48: '102', 49: '111D', 50: '111U', 51: '201',
    52: '111D', 53: '120D', 54: '120C', 55: '210', 56: '111U',
    57: '120C', 58: '120U', 59: '210', 60: '201', 61: '210',
    62: '210', 63: '300'}

TRIAD_TYPES = ('003', '012', '102', '021D', '021U', '021C', '111D',
               '111U', '030T', '030C', '201', '120D', '120U', '120C',
               '210', '300')


def triad_census(edges: DataFrame, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """Full 16-type directed triad census (Holland & Leinhardt 1970
    "A method for detecting structure in sociometric data"; the
    M-A-N labels of Davis & Leinhardt 1972; subquadratic enumeration
    after Batagelj & Mrvar, Social Networks 2001): how many node
    triples realize each directed-triad isomorphism class — the
    structural signature behind transitivity tests (030T vs 030C),
    hierarchy detection, and the triad-significance profiles of
    Milo et al. Science 2004.

    Never enumerates O(n^3): triads holding >= 2 connected dyads
    come from the wedge join (adjacent-dyad pairs through a shared
    center — a 2-dyad triad is found exactly once, a 3-dyad triad
    three times and deduped on its sorted node key); single-dyad
    triads (012/102) come from per-dyad INTEGER arithmetic
    ``(n-2) - (d(a)-1) - (d(b)-1) + cn(a,b)`` (common-neighbor
    counts fall out of the same wedge frame); the empty triad 003
    is ``C(n,3)`` minus everything else. All counts BIGINT — the
    census hash-replays bit-for-bit cross-engine, and
    ``sum == C(n,3)`` is a built-in self-check.

    Returns all 16 rows ``(triad_type, n_triads)`` (zeros kept).

    Scale shape: the dyad fold and wedge join carry (id, id, int)
    rows; hub centers are the wedge join's skew case (AQE /
    degree-cap the hubs first on power-law graphs — the Batagelj-
    Mrvar bound is sum of center-degree squared); the 64->16 class
    map rides as a literal CASE; single-dyad arithmetic touches
    dyad-count rows only; ``n`` is a one-row broadcast.
    """
    spark = edges.sparkSession
    e = _directed_distinct(edges, src, dst)
    dy = (e.select(F.least("u", "v").alias("a"),
                   F.greatest("u", "v").alias("b"),
                   F.when(F.col("u") < F.col("v"), 1).otherwise(2)
                   .alias("_m0"))
          .groupBy("a", "b")
          .agg(F.sum("_m0").cast("int").alias("m"))
          .localCheckpoint(eager=True))
    deg = (dy.select(F.col("a").alias("id"))
           .unionByName(dy.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count("*").cast("long").alias("d")))
    nrow = deg.agg(F.count("*").cast("long").alias("n"))

    adj = (dy.select(F.col("a").alias("c"), F.col("b").alias("o"),
                     "a", "b", "m")
           .unionByName(dy.select(F.col("b").alias("c"),
                                  F.col("a").alias("o"), "a", "b", "m")))
    a1 = adj.select(F.col("c"), F.col("o").alias("o1"),
                    F.col("a").alias("a1"), F.col("b").alias("b1"),
                    F.col("m").alias("m1"))
    a2 = adj.select(F.col("c"), F.col("o").alias("o2"),
                    F.col("a").alias("a2"), F.col("b").alias("b2"),
                    F.col("m").alias("m2"))
    wedge = (a1.join(a2, "c").filter(F.col("o1") < F.col("o2"))
             .localCheckpoint(eager=True))
    third = dy.select(F.col("a").alias("o1"), F.col("b").alias("o2"),
                      F.col("m").alias("_m3"))
    wt = (wedge.join(third, ["o1", "o2"], "left")
          .withColumn("m3", F.coalesce("_m3", F.lit(0))))

    key = F.array_sort(F.array("c", "o1", "o2"))
    mp = F.create_map(
        F.concat_ws("\x01", "a1", "b1"), F.col("m1"),
        F.concat_ws("\x01", "a2", "b2"), F.col("m2"),
        F.concat_ws("\x01", "o1", "o2"), F.col("m3"))
    pair = lambda x, y: F.concat_ws("\x01", key.getItem(x),
                                    key.getItem(y))
    code = (F.element_at(mp, pair(0, 1))
            + F.element_at(mp, pair(0, 2)) * 4
            + F.element_at(mp, pair(1, 2)) * 16)
    coded = wt.select(key.alias("_t"), F.col("m3"), code.alias("code"))
    type_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(
            _TRIAD_TYPE_BY_CODE.items()) for x in kv]),
        F.col("code"))
    two = (coded.filter(F.col("m3") == 0)
           .groupBy(type_expr.alias("triad_type"))
           .agg(F.count("*").cast("long").alias("n_triads")))
    three = (coded.filter(F.col("m3") > 0)
             .select("_t", "code").distinct()
             .groupBy(type_expr.alias("triad_type"))
             .agg(F.count("*").cast("long").alias("n_triads")))

    cn = wedge.groupBy("o1", "o2").agg(
        F.count("*").cast("long").alias("_cn"))
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("_db"))
    ones = (dy.join(cn, (dy["a"] == cn["o1"]) & (dy["b"] == cn["o2"]),
                    "left")
            .join(da, "a").join(db, "b")
            .crossJoin(F.broadcast(nrow))
            .select("m",
                    (F.col("n") - 2 - (F.col("_da") - 1)
                     - (F.col("_db") - 1)
                     + F.coalesce("_cn", F.lit(0).cast("long")))
                    .alias("_k")))
    one = (ones.groupBy(F.when(F.col("m") == 3, F.lit("102"))
                        .otherwise(F.lit("012")).alias("triad_type"))
           .agg(F.sum("_k").cast("long").alias("n_triads")))

    counted = two.unionByName(three).unionByName(one)
    counted = (counted.groupBy("triad_type")
               .agg(F.sum("n_triads").cast("long").alias("n_triads")))
    spine = spark.createDataFrame([(t,) for t in TRIAD_TYPES],
                                  "triad_type string")
    filled = (spine.join(counted, "triad_type", "left")
              .select("triad_type",
                      F.coalesce("n_triads", F.lit(0).cast("long"))
                      .alias("n_triads")))
    # 003 = C(n,3) - everything else (integer DIV, exact)
    others = filled.filter(F.col("triad_type") != "003").agg(
        F.sum("n_triads").cast("long").alias("_s"))
    n003 = (nrow.crossJoin(others)
            .select(F.lit("003").alias("triad_type"),
                    (F.expr("(n * (n - 1) * (n - 2)) DIV 6")
                     - F.col("_s")).cast("long").alias("n_triads")))
    return (filled.filter(F.col("triad_type") != "003")
            .unionByName(n003))


def boruvka_msf(edges: DataFrame, src: str = "src", dst: str = "dst",
                weight: str = "weight",
                max_rounds: int = 20) -> DataFrame:
    """Minimum spanning forest via Borůvka's algorithm (Borůvka 1926;
    the parallel-MST workhorse — Chung & Condon IPPS 1996, and the
    MapReduce form in Lattanzi et al. SPAA 2011 filtering) — the
    backbone of SINGLE-LINKAGE clustering over an ER similarity
    graph: cutting the forest at a distance threshold yields exactly
    the single-linkage clusters, without ever materializing a
    dendrogram. Per round every component selects its minimum
    outgoing edge and components merge; rounds are O(log V) because
    the component count at least halves.

    Determinism by construction: edges are totally ordered by
    ``(weight, src, dst)`` — distinct even on tied weights — so the
    forest is UNIQUE (the classic cut-property argument needs only a
    total order) and hash-replays exactly; selection-only output
    (no arithmetic ever touches the weights, so float drift cannot
    exist cross-engine).

    Returns the forest edge list ``(src, dst, weight)`` — V minus
    #components rows.

    Scale shape: per round one label join per endpoint ((id, id)
    pairs), one min(struct) fold per component side (map-side
    combined — a hub component never collects its edge list), a
    distinct over the chosen edges, and component contraction via
    :mod:`components`' size-adaptive connected components on the
    CHOSEN-edge graph only (≤ one edge per component). The live
    inter-component edge set shrinks monotonically and re-
    checkpoints per round.
    """
    from knowledge_graph_spark.operators.components import (
        connected_components)

    e = (edges.select(F.least(src, dst).alias("u"),
                      F.greatest(src, dst).alias("v"),
                      F.col(weight).alias("w"))
         .filter(F.col("u").isNotNull() & F.col("v").isNotNull()
                 & F.col("w").isNotNull() & (F.col("u") != F.col("v")))
         .groupBy("u", "v").agg(F.min("w").alias("w"))
         .localCheckpoint(eager=True))
    comp = (e.select(F.col("u").alias("id"))
            .unionByName(e.select(F.col("v").alias("id")))
            .distinct()
            .select("id", F.col("id").alias("c"))
            .localCheckpoint(eager=True))
    out: DataFrame | None = None
    for _ in range(int(max_rounds)):
        cu = comp.select(F.col("id").alias("u"), F.col("c").alias("_cu"))
        cv = comp.select(F.col("id").alias("v"), F.col("c").alias("_cv"))
        live = (e.join(cu, "u").join(cv, "v")
                .filter(F.col("_cu") != F.col("_cv")))
        if live.isEmpty():
            break
        pick = F.struct("w", "u", "v")
        side = (live.select(F.col("_cu").alias("cc"), pick.alias("_e"))
                .unionByName(live.select(F.col("_cv").alias("cc"),
                                         pick.alias("_e"))))
        chosen = (side.groupBy("cc").agg(F.min("_e").alias("_e"))
                  .select("_e.u", "_e.v", "_e.w").distinct()
                  .localCheckpoint(eager=True))
        out = chosen if out is None else out.unionByName(chosen)
        # contract: relabel via CC over the chosen component pairs
        cpairs = (chosen.join(cu, "u").join(cv, "v")
                  .select(F.col("_cu").alias("u"),
                          F.col("_cv").alias("v")))
        relab = connected_components(cpairs)
        comp = (comp.join(relab.withColumnRenamed("node", "c")
                          .withColumnRenamed("component", "_nc"),
                          "c", "left")
                .select("id", F.coalesce("_nc", "c").alias("c"))
                .localCheckpoint(eager=True))
    if out is None:
        return e.limit(0).select(F.col("u").alias(src),
                                 F.col("v").alias(dst),
                                 F.col("w").alias(weight))
    return out.select(F.col("u").alias(src), F.col("v").alias(dst),
                      F.col("w").alias(weight))
