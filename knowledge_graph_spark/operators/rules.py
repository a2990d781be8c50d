# -*- coding: utf-8 -*-
"""Rule mining and schema discovery over a (subj, pred, obj) triple KB.

The reference stops at materializing extracted triples; a production
KG-construction pipeline then LEARNS from the assembled graph:

- :func:`amie_rules` — AMIE-style 2-atom closed horn rules
  ``r1(x, z) ∧ r2(z, y) ⇒ r3(x, y)`` with support and the two
  confidence denominators (Galárraga, Teflioudi, Hose, Suchanek,
  "AMIE: Association Rule Mining under Incomplete Evidence", WWW
  2013). Rules drive KB completion and error detection.
- :func:`characteristic_sets` — the characteristic-set census of
  Neumann & Moerkotte ("Characteristic Sets: Accurate Cardinality
  Estimation for RDF Queries with Multiple Joins", ICDE 2011): the
  distinct predicate SET each subject carries, grouped and counted.
  The census is simultaneously an induced soft schema ("entities
  shaped like {has_brand, supplies, located_in}") and the standard
  RDF cardinality-estimation statistic.

Not in the reference (no rule-mining stage); semantics from the cited
public papers.

Scale shape: everything is joins + hash aggregations over
``(string, string, string)`` triples — no window over raw data, no
Python, no collect. The body join hashes on the shared variable
``z``; high-degree ``z`` values (hub entities) are the classic skew
point, so the body join is guarded by an optional per-``z`` degree
cap exactly like the LSH bucket guards (drop hubs above the cap
BEFORE the join fans out, disclosed to the caller via the dropped
count being derivable from the census).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fold_kb(triples: DataFrame, subj_col: str, pred_col: str,
             obj_col: str) -> DataFrame:
    """NULL-filtered distinct (s, p, o) KB, pinned with one eager
    localCheckpoint — THE fold every mining/application entry point
    shares (referenced multiple times downstream; each reference
    would otherwise re-execute the distinct shuffle)."""
    return (triples.select(F.col(subj_col).alias("s"),
                           F.col(pred_col).alias("p"),
                           F.col(obj_col).alias("o"))
            .filter(F.col("s").isNotNull() & F.col("p").isNotNull()
                    & F.col("o").isNotNull())
            .distinct()
            .localCheckpoint(eager=True))


def _body_sides(t: DataFrame, max_z_degree: int | None = None):
    """(left, right) chain-body atom projections with the per-z hub
    guard applied BEFORE the join fans out."""
    left = t.select(F.col("s").alias("x"), F.col("p").alias("r1"),
                    F.col("o").alias("z"))
    right = t.select(F.col("s").alias("z"), F.col("p").alias("r2"),
                     F.col("o").alias("y"))
    if max_z_degree is not None:
        zcap = int(max_z_degree)
        z_out = (left.groupBy("z").agg(F.count("*").alias("_d"))
                 .filter(F.col("_d") <= zcap).select("z"))
        z_in = (right.groupBy("z").agg(F.count("*").alias("_d"))
                .filter(F.col("_d") <= zcap).select("z"))
        left = left.join(z_out, "z", "leftsemi")
        right = right.join(z_in, "z", "leftsemi")
    return left, right


def _mine_counters(body: DataFrame, t: DataFrame,
                   min_support: int) -> DataFrame:
    """support / body_pairs / pca_pairs over a PINNED body — the one
    source of truth for the AMIE counters (amie_rules and complete_kb
    both compose it; a fix here propagates to both)."""
    heads = t.select(F.col("p").alias("r3"), F.col("s").alias("x"),
                     F.col("o").alias("y"))
    support = (body.join(heads, ["x", "y"])
               .groupBy("r1", "r2", "r3")
               .agg(F.count("*").cast("long").alias("support"))
               .filter(F.col("support") >= int(min_support)))
    body_n = (body.groupBy("r1", "r2")
              .agg(F.count("*").cast("long").alias("body_pairs")))
    # PCA denominator: body pairs whose x has SOME r3 edge. One
    # distinct (r3, x) table joined on x — (predicate, subject)
    # pairs, orders below the body size.
    r3x = heads.select("r3", "x").distinct()
    pca = (body.join(r3x, "x")
           .groupBy("r1", "r2", "r3")
           .agg(F.count("*").cast("long").alias("pca_pairs")))
    return (support
            .join(body_n, ["r1", "r2"])
            .join(pca, ["r1", "r2", "r3"])
            .select("r1", "r2", "r3", "support", "body_pairs",
                    "pca_pairs"))


def _infer_heads(body: DataFrame, rules: DataFrame,
                 t: DataFrame) -> DataFrame:
    """Candidate heads from body x broadcast rules, minus triples the
    KB already asserts — shared by apply_rules and complete_kb."""
    cand = (body.join(F.broadcast(rules), ["r1", "r2"])
            .select("x", F.col("r3").alias("p"), F.col("y").alias("o"),
                    "r1", "r2", "support", "body_pairs", "pca_pairs"))
    return (cand.join(t.select(F.col("s").alias("x"), "p",
                               F.col("o").alias("o")),
                      ["x", "p", "o"], "left_anti")
            .select(F.col("x").alias("subj"), F.col("p").alias("pred"),
                    F.col("o").alias("obj"), "r1", "r2", "support",
                    "body_pairs", "pca_pairs"))


def amie_rules(triples: DataFrame,
               subj_col: str = "subj", pred_col: str = "pred",
               obj_col: str = "obj",
               min_support: int = 2,
               max_z_degree: int | None = None,
               assume_distinct: bool = False) -> DataFrame:
    """Mine 2-atom chain rules ``r1(x, z) ∧ r2(z, y) ⇒ r3(x, y)``.

    For every predicate triple ``(r1, r2, r3)`` present in the KB:

    - ``support``   — |{(x, y)}| with both the body path and the head
      edge (distinct head pairs the rule correctly predicts)
    - ``body_pairs`` — |{(x, y)}| connected by the body path
      (standard-confidence denominator; ``support / body_pairs`` is
      CWA confidence)
    - ``pca_pairs`` — |{(x, y) in body : ∃ y' r3(x, y')}| — the
      partial-completeness denominator of Galárraga et al. §4.3
      (``support / pca_pairs`` is PCA confidence)

    Integer ingredients only — both confidences are row-local
    divisions the caller applies.

    ``max_z_degree`` drops join-variable values whose in- or
    out-degree exceeds the cap BEFORE the body join (the hub-entity
    skew guard; NULL = no cap). Duplicate triples are collapsed
    first, so crawl replays add no weight.
    """
    # the deduped KB is referenced three times (body left, body
    # right, heads) and the body three times (support, CWA and PCA
    # denominators) — each reference would re-execute the distinct /
    # join shuffle; one localCheckpoint each trades a single
    # materialization (to executor-local storage, the persist-for-
    # iterative-reuse pattern) for three recomputed shuffles.
    # ``assume_distinct`` skips that fold for callers who pin an
    # already-deduped NULL-free KB (e.g. mine-then-apply pipelines
    # that localCheckpoint the KB once and share it).
    if assume_distinct:
        t = triples.select(F.col(subj_col).alias("s"),
                           F.col(pred_col).alias("p"),
                           F.col(obj_col).alias("o"))
    else:
        t = _fold_kb(triples, subj_col, pred_col, obj_col)

    left, right = _body_sides(t, max_z_degree)
    # body paths, collapsed to distinct (r1, r2, x, y) — the same
    # (x, y) reachable through two z values counts once, per the
    # AMIE support definition
    body = (left.join(right, "z")
            .select("r1", "r2", "x", "y").distinct()
            .localCheckpoint(eager=True))
    return _mine_counters(body, t, min_support)


def characteristic_sets(triples: DataFrame,
                        subj_col: str = "subj",
                        pred_col: str = "pred") -> DataFrame:
    """Characteristic-set census: group subjects by their distinct
    predicate SET.

    Returns one row per observed set: ``char_set`` (the sorted
    distinct predicates joined with ``,`` — a deterministic set key),
    ``set_size`` (predicates in the set), ``n_subjects`` (subjects
    carrying exactly this set), ``n_triples`` (total triples those
    subjects carry, the cardinality-estimation numerator of Neumann &
    Moerkotte §3).

    Scale shape: one hash aggregation per subject (collect_set of
    predicates is bounded by the SCHEMA's predicate vocabulary, not
    the data), then one hash aggregation over set keys. Both
    map-side combinable; bodies/objects never move.
    """
    per_subj = (
        triples.select(F.col(subj_col).alias("s"),
                       F.col(pred_col).alias("p"))
        .filter(F.col("s").isNotNull() & F.col("p").isNotNull())
        .groupBy("s")
        .agg(
            F.sort_array(F.collect_set("p")).alias("_set"),
            F.count("*").cast("long").alias("n_t"),
        )
    )
    # group by the predicate ARRAY itself, not its comma-join: with
    # comma-bearing predicate names, {'a,b','c'} and {'a','b,c'}
    # share the joined string and would merge into one bogus census
    # row; the join is display-only
    return (
        per_subj.groupBy("_set")
        .agg(F.count("*").cast("long").alias("n_subjects"),
             F.sum("n_t").cast("long").alias("n_triples"))
        .select(F.array_join("_set", ",").alias("char_set"),
                F.size("_set").cast("long").alias("set_size"),
                "n_subjects", "n_triples")
    )


def kb_diff(old: DataFrame, new: DataFrame,
            subj_col: str = "subj", pred_col: str = "pred",
            obj_col: str = "obj") -> DataFrame:
    """Per-predicate audit of a KG update — the counters an
    incremental construction pipeline publishes with every batch
    commit (the reference's update semantics, lifted to version
    accounting):

    - ``n_added``    — triples in ``new`` only
    - ``n_removed``  — triples in ``old`` only
    - ``n_retained`` — triples in both
    - ``n_changed_keys`` — ``(subj, pred)`` keys present on BOTH
      sides whose object SETS differ (the "fact edited" signal that
      added/removed counts alone can't distinguish from unrelated
      churn)

    Returns one row per predicate occurring on either side.

    Scale shape: both sides fold to distinct triples; the diff is one
    full-outer join on ``(subj, pred, obj)`` aggregated map-side to
    ``(pred, long)`` counters, plus one ``(subj, pred)``-level
    aggregate for the changed-key census. Objects never fan out;
    no window, no collect.
    """
    def _t(df):
        return (df.select(F.col(subj_col).alias("s"),
                          F.col(pred_col).alias("p"),
                          F.col(obj_col).alias("o"))
                .filter(F.col("s").isNotNull() & F.col("p").isNotNull()
                        & F.col("o").isNotNull())
                .distinct())

    o = _t(old).withColumn("_o", F.lit(1))
    n = _t(new).withColumn("_n", F.lit(1))
    j = (o.join(n, ["s", "p", "o"], "full_outer")
         .select("s", "p",
                 F.coalesce("_o", F.lit(0)).alias("in_old"),
                 F.coalesce("_n", F.lit(0)).alias("in_new"))
         .localCheckpoint(eager=True))  # feeds both aggregates below
    per_pred = (j.groupBy("p").agg(
        F.sum(F.expr("if(in_new = 1 and in_old = 0, 1, 0)"))
        .cast("long").alias("n_added"),
        F.sum(F.expr("if(in_old = 1 and in_new = 0, 1, 0)"))
        .cast("long").alias("n_removed"),
        F.sum(F.expr("if(in_old = 1 and in_new = 1, 1, 0)"))
        .cast("long").alias("n_retained"),
    ))
    keys = (j.groupBy("s", "p").agg(
        F.max("in_old").alias("_ko"), F.max("in_new").alias("_kn"),
        # the key's object sets differ iff some triple is one-sided
        F.max(F.expr("if(in_old != in_new, 1, 0)")).alias("_diff"))
        .filter((F.col("_ko") == 1) & (F.col("_kn") == 1)
                & (F.col("_diff") == 1))
        .groupBy("p")
        .agg(F.count("*").cast("long").alias("n_changed_keys")))
    return (per_pred.join(keys, "p", "left")
            .select(F.col("p").alias("pred"), "n_added", "n_removed",
                    "n_retained",
                    F.coalesce("n_changed_keys", F.lit(0).cast("long"))
                    .alias("n_changed_keys")))


def apply_rules(triples: DataFrame, rules: DataFrame,
                subj_col: str = "subj", pred_col: str = "pred",
                obj_col: str = "obj",
                min_conf_pct: int = 0,
                assume_distinct: bool = False) -> DataFrame:
    """KB completion: materialize the NEW head triples every mined
    chain rule predicts (Galárraga et al. WWW 2013 §6 — the point of
    mining the rules in the first place).

    ``rules`` is the :func:`amie_rules` output (``r1, r2, r3,
    support, body_pairs, pca_pairs``). For each rule, the body join
    ``r1(x, z) ∧ r2(z, y)`` produces candidate heads ``r3(x, y)``;
    candidates already asserted in the KB are anti-joined away. The
    output carries full provenance — one row per (inferred triple,
    rule) with the rule's integer support/denominator counters, so
    CWA and PCA confidence stay row-local divisions for the caller.

    ``min_conf_pct`` keeps only rules whose CWA confidence reaches
    the given percentage, tested integer-exactly as
    ``support * 100 >= min_conf_pct * body_pairs`` (no float ever
    materializes — the same cross-multiplication trick the curation
    cascade uses for ratio gates).

    Scale shape: the KB folds to distinct triples once and is
    referenced three times (body left/right, existing-head anti
    join) off one localCheckpoint; the rules table is mined output —
    orders of magnitude below the KB — and BROADCAST onto the body
    join, so the only exchanges are the body's hash join on ``z``
    and the anti join on ``(r3, x, y)``. Rules are applied
    set-at-a-time: one body join serves every rule simultaneously
    (predicate pairs filter via the broadcast), never a loop over
    rules.
    """
    # the rules table is referenced four times below (broadcast join
    # + two predicate-pruning semi joins + the filter); without a pin
    # each reference RE-EXECUTES the caller's entire mining DAG. It
    # is mining output — orders of magnitude below the KB — so one
    # eager localCheckpoint makes the re-references free.
    r = (rules.select("r1", "r2", "r3", "support", "body_pairs",
                      "pca_pairs")
         .filter(F.col("support") * 100
                 >= int(min_conf_pct) * F.col("body_pairs"))
         .localCheckpoint(eager=True))

    if assume_distinct:
        # skips the fold for callers who pin an already-deduped
        # NULL-free KB (the mine-then-apply pipeline shares one
        # localCheckpoint across both operators)
        t = triples.select(F.col(subj_col).alias("s"),
                           F.col(pred_col).alias("p"),
                           F.col(obj_col).alias("o"))
    else:
        t = _fold_kb(triples, subj_col, pred_col, obj_col)

    left, right = _body_sides(t)
    # restrict each side to predicates any surviving rule uses —
    # broadcast semi joins that prune the body join's inputs before
    # the z-hash exchange
    left = left.join(F.broadcast(r.select("r1").distinct()), "r1",
                     "leftsemi")
    right = right.join(F.broadcast(r.select("r2").distinct()), "r2",
                       "leftsemi")

    body = (left.join(right, "z")
            .select("r1", "r2", "x", "y").distinct())
    return _infer_heads(body, r, t)


def predicate_stats(triples: DataFrame,
                    subj_col: str = "subj", pred_col: str = "pred",
                    obj_col: str = "obj") -> DataFrame:
    """Per-predicate cardinality profile — the functionality
    statistics AMIE's PCA confidence assumes and the schema-induction
    signal an ontology layer consumes (Galárraga et al. WWW 2013
    §4.2; Suchanek et al.'s YAGO functional-property checks).

    One row per predicate, integer ingredients only:

    - ``n_triples``  — distinct triples carrying the predicate
    - ``n_subjects`` / ``n_objects`` — distinct subjects / objects
    - ``max_fanout``  — max distinct objects for one subject
    - ``max_fanin``   — max distinct subjects for one object

    Functionality ``n_subjects / n_triples`` and inverse
    functionality ``n_objects / n_triples`` are row-local divisions
    for the caller; ``max_fanout = 1`` identifies functional
    predicates (a subject has at most one object — the predicates
    whose multi-object subjects are CONFLICTS for truth discovery).

    Scale shape: distinct fold, then one (pred, subj)-keyed and one
    (pred, obj)-keyed aggregate, each collapsing map-side to
    per-predicate longs before the final predicate-keyed merge.
    Objects never fan out; no window, no collect.
    """
    t = (triples.select(F.col(subj_col).alias("s"),
                        F.col(pred_col).alias("p"),
                        F.col(obj_col).alias("o"))
         .filter(F.col("s").isNotNull() & F.col("p").isNotNull()
                 & F.col("o").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    by_s = (t.groupBy("p", "s").agg(F.count("*").alias("_fo"))
            .groupBy("p").agg(
                F.count("*").cast("long").alias("n_subjects"),
                F.sum("_fo").cast("long").alias("n_triples"),
                F.max("_fo").cast("long").alias("max_fanout")))
    by_o = (t.groupBy("p", "o").agg(F.count("*").alias("_fi"))
            .groupBy("p").agg(
                F.count("*").cast("long").alias("n_objects"),
                F.max("_fi").cast("long").alias("max_fanin")))
    return (by_s.join(by_o, "p")
            .select(F.col("p").alias("pred"), "n_triples",
                    "n_subjects", "n_objects", "max_fanout",
                    "max_fanin"))


def complete_kb(triples: DataFrame,
                subj_col: str = "subj", pred_col: str = "pred",
                obj_col: str = "obj",
                min_support: int = 2,
                min_conf_pct: int = 0,
                max_z_degree: int | None = None) -> DataFrame:
    """Fused mine-then-apply KB completion: :func:`amie_rules` and
    :func:`apply_rules` share ONE body join instead of each paying
    it. Output and semantics are exactly ``apply_rules(triples,
    amie_rules(triples, min_support), min_conf_pct)`` — the fusion is
    a pure plan optimization: the body table (the largest intermediate
    by orders of magnitude) is materialized once and feeds support,
    both confidence denominators, AND candidate generation.

    Scale shape: one distinct KB fold, one z-hash body join, three
    map-side-combined aggregates over the pinned body, one broadcast
    of the (tiny) mined-rule table back onto it, one existing-head
    anti join.
    """
    t = _fold_kb(triples, subj_col, pred_col, obj_col)
    left, right = _body_sides(t, max_z_degree)
    body = (left.join(right, "z")
            .select("r1", "r2", "x", "y").distinct()
            .localCheckpoint(eager=True))
    rules = (_mine_counters(body, t, min_support)
             .filter(F.col("support") * 100
                     >= int(min_conf_pct) * F.col("body_pairs"))
             .localCheckpoint(eager=True))
    return _infer_heads(body, rules, t)
