# -*- coding: utf-8 -*-
"""KG → training-data export: dense ids and negative sampling.

The reference stops at serving its graph to a frontend
(kg_writer.py:82-131); a corpus-scale engine also has to hand the
graph to model training. The standard interchange for KG-embedding
training (TransE, Bordes et al. 2013, and successors) is
``(head_id, relation_id, tail_id)`` triples over dense contiguous ids
plus K corrupted negatives per positive. Both steps are deterministic
here — the same corpus yields byte-identical training files on any
cluster size, the same reproducibility contract as
:mod:`.sampling`.

Scale shape:
- dense-id assignment is the distributed pattern: content-keyed
  bucketing (``pmod(xxhash64(v), B)``) → per-bucket rank (a window
  whose partitions are 1/B of the vocabulary — never a global sort) →
  bucket offsets from a B-row running sum. Cluster-size independent,
  unlike ``zipWithIndex``/``repartitionByRange`` ids, which change
  with input splits.
- id attachment joins are keyed by entity id; hub entities are AQE's
  skew-join case, and the relation vocabulary joins broadcast.
- negatives are pure row-local hashing — no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dense_ids(values: DataFrame, col: str = "v",
              buckets: int = 1024) -> DataFrame:
    """Deterministic dense ids ``[0, N)`` for the distinct values of
    ``values[col]``, ordered by (bucket, value). Returns
    ``(col, id)``.

    The per-bucket window sees ~1/``buckets`` of the vocabulary (raise
    ``buckets`` for larger vocabularies); the offset window runs over
    at most ``buckets`` rows — metadata-scale regardless of corpus
    size. NULL values carry no id (xxhash64(NULL) is the seed — a
    real-looking hash — so an unfiltered NULL would silently own a
    dense id no actual value maps to)."""
    if buckets < 1:
        # pmod(h, 0) is NULL and the bucket equi-join would match
        # nothing — a silently EMPTY id table (same loud-guard class
        # as training_triples' negatives check)
        raise ValueError(f"buckets must be >= 1 (got {buckets})")
    b = (
        values.select(col).distinct()
        .filter(F.col(col).isNotNull())
        .withColumn("_b", F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)))
    )
    ranked = b.withColumn(
        "_r", F.row_number().over(
            Window.partitionBy("_b").orderBy(col)) - 1)
    offs = (
        b.groupBy("_b").agg(F.count("*").alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    # bounded: ≤ `buckets` rows; constant partition key
                    # keeps real unpartitioned-window warnings visible
                    Window.partitionBy(F.pmod(F.col("_b"), F.lit(1))).orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("_b", "_off")
    )
    return (
        ranked.join(F.broadcast(offs), "_b")
        .select(col, (F.col("_off") + F.col("_r")).cast("long").alias("id"))
    )


def training_triples(edges: DataFrame, negatives: int = 2,
                     src: str = "src", dst: str = "dst",
                     rel: str = "rel_type",
                     buckets: int = 1024) -> DataFrame:
    """TransE-style training export over the distinct edge set:
    ``(h_id, r_id, t_id, k, neg_t_id)`` — one row per positive triple
    per negative index ``k`` in ``[0, negatives)``.

    The corrupted tail is ``pmod(xxhash64(src, dst, rel, k), N)``
    (bumped by one, mod N, when it collides with the true tail) —
    deterministic, uniform over the entity vocabulary, and row-local.
    Ids come from :func:`dense_ids` over endpoints (entities) and
    relation types. ``negatives`` must be >= 1: Spark's
    ``sequence(0, negatives - 1)`` steps DOWNWARD when the end is
    below the start, so 0 would silently emit bogus k = 0 and k = -1
    rows instead of none."""
    if negatives < 1:
        raise ValueError(
            f"negatives={negatives}: need >= 1 corruption per triple "
            "(to export positives only, project the distinct edge set "
            "through dense_ids directly)")
    # NULL-endpoint/relation edges can never join their ids back
    # (inner equi-joins) — but their endpoints would still enter the
    # entity vocabulary, inflating n_ents and letting the negative
    # sampler emit a phantom tail id no real entity owns. Filter them
    # before the vocabulary forms.
    e = (edges.select(F.col(src).alias("_h"), F.col(dst).alias("_t"),
                      F.col(rel).alias("_r"))
         .filter(F.col("_h").isNotNull() & F.col("_t").isNotNull()
                 & F.col("_r").isNotNull())
         .distinct())
    ents = dense_ids(
        e.select(F.col("_h").alias("v"))
        .unionByName(e.select(F.col("_t").alias("v"))),
        buckets=buckets,
    )
    rels = dense_ids(e.select(F.col("_r").alias("v")), buckets=buckets)
    n_ents = ents.agg(F.count("*").alias("_n_ents"))

    withids = (
        e.join(ents.select(F.col("v").alias("_h"),
                           F.col("id").alias("h_id")), "_h")
        .join(ents.select(F.col("v").alias("_t"),
                          F.col("id").alias("t_id")), "_t")
        .join(F.broadcast(rels.select(F.col("v").alias("_r"),
                                      F.col("id").alias("r_id"))), "_r")
        .crossJoin(F.broadcast(n_ents))
    )
    raw_neg = F.pmod(
        F.xxhash64(F.col("_h"), F.col("_t"), F.col("_r"), F.col("k")),
        F.col("_n_ents"),
    )
    neg = F.when(raw_neg == F.col("t_id"),
                 F.pmod(raw_neg + 1, F.col("_n_ents"))).otherwise(raw_neg)
    return (
        withids.select(
            "h_id", "r_id", "t_id", "_h", "_t", "_r", "_n_ents",
            F.explode(F.sequence(F.lit(0), F.lit(negatives - 1))).alias("k"),
        )
        .select("h_id", "r_id", "t_id", F.col("k").cast("long").alias("k"),
                neg.cast("long").alias("neg_t_id"))
    )


def skipgram_pairs(walks: DataFrame, window: int = 2,
                   walk_col: str = "walk_id", step_col: str = "step",
                   node_col: str = "node") -> DataFrame:
    """Skip-gram training pairs from a walk corpus (the second half of
    DeepWalk, Perozzi et al. 2014): for every position in every walk,
    emit ``(center, context)`` for each other position within
    ``window`` steps, both directions, then aggregate to
    ``(center, context, n_pairs)`` — the co-occurrence table a
    word2vec-style trainer consumes.

    Scale shape: ONE walk-keyed aggregate reassembles each walk into
    its (sorted) node array — safe to collect because walk length is
    bounded by construction (``random_walks(length=L)`` caps it at
    L + 1 rows), the same bounded-state argument as the sessionizer;
    pair generation is an in-plan JVM ``transform`` over that array
    (no Python, no self-join — a walk-keyed self-join would shuffle
    the corpus twice and rejoin rows the aggregate already co-located);
    the final count aggregate map-side-combines hub pairs. Exchanges
    carry ``(walk_id, step, node)`` then ``(node, node, long)`` —
    never payloads."""
    if window < 1:
        # sequence() steps DOWNWARD when bounds invert (the
        # training_triples(negatives=0) trap) — a non-positive window
        # would silently emit wrong pairs instead of none
        raise ValueError(f"window={window}: need >= 1")
    seq = (
        walks.groupBy(F.col(walk_col).alias("walk_id"))
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col(step_col).alias("s"),
            F.col(node_col).alias("n")))).alias("_w"))
        .select(F.transform("_w", lambda x: x["n"]).alias("_nodes"))
    )
    # pair generation by index arithmetic over the walk array: for each
    # position i, every j in [i-window, i+window] except i itself
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("_nodes") - F.lit(1)),
            lambda i: F.transform(
                F.filter(
                    F.sequence(
                        F.greatest(i - F.lit(window), F.lit(0)),
                        F.least(i + F.lit(window),
                                F.size("_nodes") - F.lit(1)),
                    ),
                    lambda j: j != i,
                ),
                lambda j: F.struct(
                    F.element_at("_nodes", i + F.lit(1)).alias("center"),
                    F.element_at("_nodes", j + F.lit(1)).alias("context"),
                ),
            ),
        )
    )
    return (
        seq.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.center").alias("center"),
                 F.col("p.context").alias("context"))
        .agg(F.count("*").alias("n_pairs"))
    )


def random_walks(edges: DataFrame, length: int = 4, n_walks: int = 1,
                 src: str = "src", dst: str = "dst",
                 sources: DataFrame | None = None,
                 directed: bool = False) -> DataFrame:
    """Deterministic uniform random walks over the distinct edge set —
    the DeepWalk/node2vec(p=q=1) corpus export (Perozzi et al. 2014):
    every source node starts ``n_walks`` walks of up to ``length``
    steps; step t moves to the neighbor minimizing
    ``md5(walk_id || '/' || t || '/' || neighbor)`` — a deterministic
    uniform pick (hash ranking), reproducible on any cluster size and
    recomputable by a plain SQL oracle (md5 is engine-portable, unlike
    Spark's xxhash64). A walk ends early at a dead end (directed sink).
    Returns ``(walk_id, step, node)``; walk_id = ``node#w``.

    Scale shape per step: ONE join of the frontier against the
    symmetrized edge list (repartitioned by src ONCE, persisted, the
    partitioning reused every step — only the frontier moves) and one
    walk-keyed min_by aggregate. A hub node's deg(hub) candidate rows
    collapse map-side in the aggregate's partial min; exchanges carry
    (walk_id, node) string pairs, never payloads. Frontiers are
    ``localCheckpoint``-ed so the plan stays flat over ``length``."""
    if n_walks < 1:
        # same downward-sequence trap as training_triples(negatives=0)
        raise ValueError(f"n_walks={n_walks}: need >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    e = e.filter(F.col("src") != F.col("dst")).distinct() \
         .repartition(F.col("src")).persist()
    if sources is None:
        sources = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id"))).distinct()
        )
    starts = sources.select(F.col("id").cast("string").alias("node")) \
        .filter(F.col("node").isNotNull()).distinct()
    frontier = (
        starts.select(
            "node",
            F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("_w"),
        )
        .select(F.concat_ws("#", "node", "_w").alias("walk_id"), "node")
        .localCheckpoint(eager=True)
    )
    out = frontier.select("walk_id", F.lit(0).alias("step"), "node")
    for step in range(1, length + 1):
        rank = F.md5(F.concat_ws(
            "/", F.col("walk_id"), F.lit(str(step)), e["dst"]))
        frontier = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("walk_id")
            .agg(F.min_by(e["dst"], rank).alias("node"))
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        out = out.unionByName(
            frontier.select("walk_id", F.lit(step).alias("step"), "node"))
    e.unpersist()
    return out


def ranking_metrics(scored: DataFrame, ks: tuple[int, ...] = (1, 3, 10),
                    query_col: str = "query_id",
                    score_col: str = "score",
                    label_col: str = "is_positive") -> DataFrame:
    """Link-prediction evaluation: the rank of each query's positive
    among its scored candidates, plus corpus Hits@k counts — the MRR /
    Hits@k protocol every KG-embedding paper reports (Bordes et al.
    2013 "filtered" setting is this, applied after the caller removes
    known-true corruptions from the candidate set).

    Input: one row per (query, candidate) with an integer-comparable
    ``score`` and exactly one ``is_positive`` candidate per query.
    The positive's rank is ``1 + |candidates scoring strictly higher|
    + |tied candidates that are not the positive|`` — the PESSIMISTIC
    tie rule (ties rank below the positive), the conservative variant
    recommended since Sun et al. 2020 exposed optimistic-tie inflation.

    Returns ONE summary row: ``(n_queries, sum_rank, hits_at_k...)``
    — all longs. MRR's reciprocal stays with the caller (it is the
    one quantity here that needs a float; everything exported is
    exact). Per-query ranks are computable by the same aggregation
    without the final rollup; this operator ships the corpus summary
    because that is what an eval loop consumes per checkpoint.

    Scale shape: two query-keyed aggregations and one query-keyed
    join — the positive's score is a 1-row-per-query table joined back
    onto the candidate stream, and the rank is a conditional COUNT, so
    NO candidate list ever materializes: ranking against the full
    entity vocabulary (millions of candidates per query, the filtered
    KG-eval protocol) exchanges only (query, long) rows. Then one
    global rollup of (long) counters."""
    # NULL-score candidates are unrankable and are dropped; a query
    # whose POSITIVE has no score is unevaluable and drops whole (the
    # inner join below) — otherwise its NULL rank would be counted by
    # n_queries but silently skipped by sum_rank/hits, biasing MRR
    cands = scored.select(
        F.col(query_col).alias("query_id"),
        F.col(score_col).alias("_s"),
        F.col(label_col).alias("_p")).filter(F.col("_s").isNotNull())
    pos = cands.filter(F.col("_p")).groupBy("query_id").agg(
        F.max("_s").alias("_ps"))
    per_query = (
        cands.join(pos, "query_id")
        .groupBy("query_id")
        .agg((1 + F.sum(
            ((F.col("_s") > F.col("_ps"))
             | ((F.col("_s") == F.col("_ps")) & ~F.col("_p")))
            .cast("long"))).cast("long").alias("rank"))
    )
    agg = [F.count("*").cast("long").alias("n_queries"),
           F.sum("rank").cast("long").alias("sum_rank")]
    for k in ks:
        agg.append(F.sum((F.col("rank") <= k).cast("long"))
                   .cast("long").alias(f"hits_at_{k}"))
    return per_query.agg(*agg)


def entity_cards(triples: DataFrame,
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj",
                 max_objects: int = 5) -> DataFrame:
    """Render one retrieval/RAG "entity card" per subject — the
    KG-to-corpus bridge every retrieval-augmented training pipeline
    ships (a verbalized per-entity summary document; the KELM corpus
    of Agarwal et al., NAACL 2021 verbalizes KG triples into text
    exactly so they can be mixed into LM training data).

    Per subject: ``entity``, ``n_facts`` (distinct triples), and
    ``card`` — a deterministic rendering::

        <entity>
        <pred>: <obj1>, <obj2>, ...      (one line per predicate,
        ...                               predicates sorted, objects
                                          sorted, capped at
                                          ``max_objects`` each)

    Determinism contract: predicates and objects order
    lexicographically (Spark's UTF-8 binary sort = DuckDB's default
    binary collation), so the same KB renders byte-identical cards
    on any engine and any cluster size.

    Scale shape: one (subj, pred)-keyed aggregate (object sets
    bounded per predicate by collect_set then capped — hub subjects
    with millions of objects keep only ``max_objects`` strings after
    the slice, and the set itself is the per-(s,p) fan-out the KB
    already pays to store), then one subj-keyed aggregate whose rows
    are (pred, line) pairs bounded by the predicate vocabulary.
    Bodies never join; no window, no collect.
    """
    t = (triples.select(F.col(subj_col).alias("s"),
                        F.col(pred_col).alias("p"),
                        F.col(obj_col).alias("o"))
         .filter(F.col("s").isNotNull() & F.col("p").isNotNull()
                 & F.col("o").isNotNull())
         .distinct())
    per_sp = (t.groupBy("s", "p")
              .agg(F.count("*").cast("long").alias("_n"),
                   F.slice(F.sort_array(F.collect_set("o")), 1,
                           int(max_objects)).alias("_objs")))
    lines = per_sp.select(
        "s", "_n",
        F.struct(F.col("p"), F.concat(F.col("p"), F.lit(": "),
                                      F.array_join("_objs", ", "))
                 .alias("line")).alias("_pl"))
    return (lines.groupBy("s")
            .agg(F.sum("_n").cast("long").alias("n_facts"),
                 F.concat(
                     F.col("s"), F.lit("\n"),
                     F.array_join(
                         F.transform(F.sort_array(F.collect_list("_pl")),
                                     lambda x: x["line"]),
                         "\n")).alias("card"))
            .select(F.col("s").alias("entity"), "n_facts", "card"))


def qa_pairs(triples: DataFrame, templates: dict[str, str],
             subj_col: str = "subj", pred_col: str = "pred",
             obj_col: str = "obj",
             max_answers: int = 8) -> DataFrame:
    """Synthesize question-answer training pairs from KG triples via
    per-predicate templates — the template-based KGQA data synthesis
    of LC-QuAD / SimpleQuestions-style dataset construction (Trivedi
    et al., ISWC 2017 build QA corpora from KG templates; WebNLG
    verbalization works the same way).

    ``templates`` maps predicate → question template containing the
    literal placeholder ``{s}`` (replaced by the subject). One output
    row per (subject, templated predicate): ``question``, ``answers``
    (sorted distinct objects joined with ``", "``, capped at
    ``max_answers``), ``n_answers`` (uncapped distinct count — so
    the consumer can filter ambiguous questions), and the
    provenance columns ``subj``/``pred``.

    Determinism: template application is a literal string replace;
    answer order is the binary sort. Predicates without a template
    emit nothing (the map is the declared question inventory).

    Scale shape: the template map rides as a broadcast literal
    CASE/map lookup (predicate vocabulary is schema-scale); the only
    exchange is the (subj, pred) aggregate with map-side combine.
    """
    if not templates:
        raise ValueError("templates must map at least one predicate")
    for p, tpl in templates.items():
        if "{s}" not in tpl:
            raise ValueError(
                f"template for {p!r} lacks the {{s}} placeholder")
    t = (triples.select(F.col(subj_col).alias("s"),
                        F.col(pred_col).alias("p"),
                        F.col(obj_col).alias("o"))
         .filter(F.col("s").isNotNull() & F.col("p").isNotNull()
                 & F.col("o").isNotNull())
         .filter(F.col("p").isin(*templates.keys()))
         .distinct())
    tpl_map = F.create_map(
        *[F.lit(x) for kv in templates.items() for x in kv])
    return (t.groupBy("s", "p")
            .agg(F.count("*").cast("long").alias("n_answers"),
                 F.slice(F.sort_array(F.collect_set("o")), 1,
                         int(max_answers)).alias("_objs"))
            .select(
                F.col("s").alias("subj"), F.col("p").alias("pred"),
                F.replace(tpl_map[F.col("p")], F.lit("{s}"),
                          F.col("s")).alias("question"),
                F.array_join("_objs", ", ").alias("answers"),
                "n_answers"))
