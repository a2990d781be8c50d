# -*- coding: utf-8 -*-
"""Knowledge fusion: multi-source triple conflict resolution.

A web-scale KG is built from MANY extractors over MANY pages, and
they disagree: one source says (acme, hq_city, oslo), another says
(acme, hq_city, bergen). The fusion stage (Dong et al., KDD 2014,
"Knowledge Vault"; the truth-discovery line of Yin et al. 2007)
resolves each FUNCTIONAL (single-valued) predicate to one object per
subject by weighing supporting sources, and keeps the losing
assertions as audit rows rather than silently deleting them.

This implements the deterministic core: support-weighted voting with
integer confidences. Source-reliability iteration (TruthFinder-style
EM) is deliberately out of scope — one voting pass is what Knowledge
Vault ships as its baseline fuser, and iteration composes on top by
re-weighting ``confidence`` between passes.

Not in the reference (single extractor, no conflicts); semantics from
the cited public papers.

Scale shape: two hash aggregations — ``(subj, pred, obj)`` support
with map-side combine, then an in-aggregate argmax over the
object candidates of each ``(subj, pred)`` — both exchanging
``(keys, long)`` rows only. No window, no join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuse_triples(assertions: DataFrame,
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj", source_col: str = "source_id",
                 confidence_col: str | None = None) -> DataFrame:
    """Resolve each ``(subj, pred)`` to its best-supported object.

    Votes are INTEGER confidences (e.g. extractor score × 100); when
    ``confidence_col`` is None every assertion votes 1. The same
    source asserting the same object twice votes once with its MAX
    confidence (dedup-before-vote, so a crawler that fetched a page
    twice gains no weight). The winner is the object with the highest
    total vote; ties break to the lexicographically smallest object
    (declared, replayable).

    Returns one row per ``(subj, pred)``:

    - ``obj``           — the winning object
    - ``support``       — its total vote
    - ``n_sources``     — distinct sources behind the winner
    - ``n_objects``     — how many distinct objects competed
    - ``support_total`` — votes across ALL candidates (the winner's
      share ``support/support_total`` is the fusion confidence —
      counts exposed, the caller divides)
    """
    # NULL confidence coalesces to 0 (an assertion with no stated
    # confidence carries no vote weight): left NULL, SUM(support)
    # would be NULL and -support = NULL sorts FIRST in min(struct),
    # letting an unweighted candidate beat every real vote
    conf = (F.coalesce(F.col(confidence_col).cast("long"), F.lit(0))
            if confidence_col else F.lit(1).cast("long"))
    votes = (
        assertions.select(
            F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"),
            F.col(source_col).alias("source_id"), conf.alias("_c"))
        .filter(F.col("subj").isNotNull() & F.col("pred").isNotNull()
                & F.col("obj").isNotNull())
        .groupBy("subj", "pred", "obj", "source_id")
        .agg(F.max("_c").alias("_c"))
    )
    candidates = votes.groupBy("subj", "pred", "obj").agg(
        F.sum("_c").cast("long").alias("support"),
        F.countDistinct("source_id").cast("long").alias("n_sources"),
    )
    # in-aggregate argmax: min(struct(-support, obj, ...)) is
    # (support desc, obj asc) — the full candidate row rides inside
    return (
        candidates.groupBy("subj", "pred").agg(
            F.min(F.struct(
                (-F.col("support")).alias("neg"), F.col("obj"),
                F.col("support"), F.col("n_sources"))).alias("_w"),
            F.count("*").cast("long").alias("n_objects"),
            F.sum("support").cast("long").alias("support_total"),
        )
        .select(
            "subj", "pred", F.col("_w.obj").alias("obj"),
            F.col("_w.support").alias("support"),
            F.col("_w.n_sources").alias("n_sources"),
            "n_objects", "support_total",
        )
    )


def type_check_triples(triples: DataFrame, entity_types: DataFrame,
                       constraints: DataFrame,
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj") -> DataFrame:
    """Ontology domain/range validation — Knowledge Vault's type
    prior (Dong et al. 2014 §4.2; also the RDFS semantics every
    triple store enforces: a predicate declares the types its subject
    and object must carry). A triple whose endpoints violate the
    predicate's declared (domain, range) is the highest-precision
    error signal a fusion stage has — "acquired" linking a Person to
    a Date is wrong regardless of how many pages assert it.

    Inputs: ``entity_types(entity, type)`` (from the microdata /
    JSON-LD harvest or the linking stage — an entity may carry
    several types) and ``constraints(pred, domain, range)`` (the
    schema — predicate-scale, tiny). Emits one row per (triple,
    evaluated constraint): ``(subj, pred, obj, domain_ok, range_ok,
    ok)`` where each flag is true when the endpoint carries ANY type
    satisfying the constraint; triples whose predicate has no
    declared constraint pass vacuously (ok with NULL flags, the open-
    world default); an endpoint with NO known type fails its flag
    (strict mode — the caller routes those to linking, not to the
    graph).

    Scale shape: ``constraints`` broadcasts (predicate vocabulary);
    the two type attachments are equi-joins against per-endpoint
    type-set AGGREGATES (entity_types folds to (entity, type_list)
    first — one map-side-combined agg each, so a hub entity
    contributes ONE row per side, never a fan-out per assertion).
    """
    tl = (entity_types
          .groupBy(F.col("entity"))
          .agg(F.collect_set("type").alias("_types")))
    c = F.broadcast(constraints.select(
        F.col("pred"), F.col("domain").alias("_dom"),
        F.col("range").alias("_rng")))
    out = (triples
           .join(c, triples[pred_col] == c["pred"], "left")
           .drop(c["pred"])
           .join(tl.select(F.col("entity").alias("_se"),
                           F.col("_types").alias("_st")),
                 triples[subj_col] == F.col("_se"), "left")
           .join(tl.select(F.col("entity").alias("_oe"),
                           F.col("_types").alias("_ot")),
                 triples[obj_col] == F.col("_oe"), "left"))
    dom_ok = F.when(
        F.col("_dom").isNotNull(),
        F.coalesce(F.array_contains(F.col("_st"), F.col("_dom")),
                   F.lit(False)))
    rng_ok = F.when(
        F.col("_rng").isNotNull(),
        F.coalesce(F.array_contains(F.col("_ot"), F.col("_rng")),
                   F.lit(False)))
    return out.select(
        F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
        dom_ok.alias("domain_ok"), rng_ok.alias("range_ok"),
        (F.coalesce(dom_ok, F.lit(True))
         & F.coalesce(rng_ok, F.lit(True))).alias("ok"))


def truth_discovery(assertions: DataFrame,
                    subj_col: str = "subj", pred_col: str = "pred",
                    obj_col: str = "obj", source_col: str = "source_id",
                    n_iters: int = 3) -> DataFrame:
    """Iterative source-trust truth discovery — the "Sums" fixpoint of
    Pasternack & Roth ("Knowing What to Believe", COLING 2010; the
    HITS recurrence of Kleinberg 1999 applied to the source↔fact
    bipartite graph), composing on top of :func:`fuse_triples`'s
    single voting pass exactly as that docstring promises:

        belief(f) = Σ_{s asserts f} trust(s)
        trust(s)  = Σ_{f asserted by s} belief(f)

    run for ``n_iters`` rounds from trust ≡ 1. Sources corroborated
    by well-trusted sources gain weight; a spam host asserting junk
    facts nobody repeats loses it. Pasternack & Roth normalize each
    round only to avoid numeric blow-up — normalization is uniform
    across facts, so the per-``(subj, pred)`` RANKING after k rounds
    is identical without it. This implementation therefore keeps the
    recurrence in EXACT 64-bit integers (belief/trust are integer
    sums of integer values), which is what lets a plain-SQL oracle
    replay it bit-for-bit: no float ever enters the pipeline.
    Overflow bound: beliefs grow by a factor ≤ (max facts/source ×
    max sources/fact) per round — at the default 3 rounds anything
    below ~10^6 on both degrees stays far inside int64.

    Returns the winning object per ``(subj, pred)`` — argmax final
    belief, ties to the lexicographically smallest object — with
    integer evidence: ``belief`` (winner's final score), ``n_sources``
    (distinct sources behind the winner), ``n_objects`` (candidates
    that competed).

    Scale shape: the assertion graph folds once to distinct
    ``(source, fact)`` edges; each half-round is one equi-join of
    those edges against a ``(key, long)`` score table plus one
    map-side-combined sum — 2·``n_iters`` shuffles of long-only rows.
    The final argmax is an in-aggregate ``max_by``. No window over
    raw data, no Python, no collect.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1 (got {n_iters})")
    edges = (
        assertions.select(
            F.col(source_col).alias("src"),
            F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
            F.col(obj_col).alias("obj"))
        .filter(F.col("src").isNotNull() & F.col("subj").isNotNull()
                & F.col("pred").isNotNull() & F.col("obj").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)  # referenced 2x per round
    )
    # round 1 with trust ≡ 1 folds to a plain source count
    belief = (edges.groupBy("subj", "pred", "obj")
              .agg(F.count("*").cast("long").alias("_b")))
    for _ in range(int(n_iters) - 1):
        trust = (edges.join(belief, ["subj", "pred", "obj"])
                 .groupBy("src").agg(F.sum("_b").alias("_t")))
        belief = (edges.join(trust, "src")
                  .groupBy("subj", "pred", "obj")
                  .agg(F.sum("_t").cast("long").alias("_b")))
    n_src = (edges.groupBy("subj", "pred", "obj")
             .agg(F.countDistinct("src").cast("long").alias("_ns")))
    cand = belief.join(n_src, ["subj", "pred", "obj"])
    return (
        cand.groupBy("subj", "pred")
        .agg(
            F.expr("min_by(obj, named_struct('nb', -_b, 'o', obj))")
            .alias("obj"),
            F.max("_b").alias("belief"),
            F.expr("min_by(_ns, named_struct('nb', -_b, 'o', obj))")
            .alias("n_sources"),
            F.count("*").cast("long").alias("n_objects"),
        )
    )


def golden_record(records: DataFrame, cluster_col: str,
                  attr_cols: list[str]) -> DataFrame:
    """Field-level survivorship over resolved duplicate clusters —
    the "golden record" step of classic MDM/record-linkage stacks
    (Talburt 2011 ch. 6; the fuse step of Bleiholder & Naumann's
    ACM CS 2008 data-fusion survey): after entity resolution groups
    dirty records into clusters, each ATTRIBUTE survives
    independently by majority vote over the cluster's non-null
    values, ties broken by the smaller value (deterministic, so
    reruns and the SQL oracle agree).

    Returns one row per cluster: ``n_records`` plus, for every
    attribute ``a`` in ``attr_cols``, ``a`` (the surviving value,
    as string; NULL when every record left it null) and ``a_n``
    (that value's vote count).

    Scale shape: records melt to ``(cluster, attr, value)`` — rows
    × |attrs|, value strings only, never whole records — then two
    key-local aggregates: vote counts per (cluster, attr, value),
    argmax per (cluster, attr) via a ``min(struct(-votes, value))``
    fold (no window, no collect), and one pivot-shaped aggregate
    back to a row per cluster. All exchanges are keyed by cluster;
    a hub cluster costs its own record count, nothing global.
    """
    if not attr_cols:
        raise ValueError("golden_record needs >= 1 attribute column")
    c = F.col(cluster_col).alias("_k")
    melted = records.select(
        c,
        F.explode(F.array(*[
            F.struct(F.lit(a).alias("_a"),
                     F.col(a).cast("string").alias("_v"))
            for a in attr_cols
        ])).alias("_m"),
    ).select("_k", F.col("_m._a").alias("_a"), F.col("_m._v").alias("_v"))
    votes = (melted.filter(F.col("_v").isNotNull())
             .groupBy("_k", "_a", "_v")
             .agg(F.count("*").cast("long").alias("_n")))
    best = (votes.groupBy("_k", "_a")
            .agg(F.min(F.struct((-F.col("_n")).alias("_neg"),
                                F.col("_v").alias("_v"))).alias("_b"))
            .select("_k", "_a", F.col("_b._v").alias("_v"),
                    (-F.col("_b._neg")).cast("long").alias("_n")))
    sizes = records.groupBy(c).agg(
        F.count("*").cast("long").alias("n_records"))
    wide = best.groupBy("_k").agg(*[
        e for a in attr_cols for e in (
            F.max(F.when(F.col("_a") == a, F.col("_v"))).alias(a),
            # missing-attribute NULLs fall through to the final
            # select's coalesce (same path as the no-votes-row case)
            F.max(F.when(F.col("_a") == a, F.col("_n")))
            .cast("long").alias(f"{a}_n"),
        )
    ])
    return (sizes.join(wide, "_k", "left")
            .select(F.col("_k").alias(cluster_col), "n_records",
                    *[x for a in attr_cols for x in (
                        F.col(a),
                        # all-null cluster: no votes row at all
                        F.coalesce(F.col(f"{a}_n"), F.lit(0))
                        .cast("long").alias(f"{a}_n"))]))
