# -*- coding: utf-8 -*-
"""Temporal join operators: as-of join and bounded range join.

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas do) and a naive
time-range join plans as a broadcast-nested-loop theta join — both are
must-haves for event analytics next to the KG pipeline. Each is
implemented as a composition of DataFrame primitives that keeps the
plan equi-shuffle shaped:

- :func:`asof_join` — the union-tag trick: union both sides ordered by
  (key, ts, side), carry the right row forward as ONE struct with
  ``last(..., ignorenulls=True)`` over a running window, keep left
  rows. ONE shuffle on the key, a spillable sort, zero Python — the
  canonical distributed as-of (Flink's event-time join and
  pandas.merge_asof do the same walk per key).
- :func:`range_join` — time-bucketing: with bucket width = the range
  span Δ, any right row in ``(l.ts, l.ts + Δ]`` lives in the left
  row's bucket or the next one, so exploding TWO candidate buckets per
  left row turns the theta join into an equi join on (key, bucket) +
  a residual row-local filter. Shuffle volume is 2|L| + |R| keyed
  rows; no nested loop at any scale.

Both verified value-exact against DuckDB's native ASOF JOIN / interval
join at the driver gate (`asof_purchases`, `range_view_clicks`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts_col: str = "ts", payload: list[str] | None = None,
              tiebreak: str | None = None, prefix: str = "r_") -> DataFrame:
    """LEFT AS-OF join: every left row gains the payload of the most
    recent right row with ``right.ts <= left.ts`` for the same key
    (NULLs when no prior right row exists) — DuckDB
    ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`` semantics,
    inclusive at equal timestamps.

    ``payload`` — right columns to carry (default: all but the key);
    emitted as ``{prefix}{col}``. The payload rides as ONE struct, so
    the whole matched right row is carried atomically: a NULL in one
    column of the most recent right row stays NULL in the output
    instead of resurrecting that column from an older row (per-column
    ``last(ignorenulls)`` would mix rows). ``tiebreak`` — right column
    that deterministically resolves multiple right rows sharing one
    timestamp (largest wins); without it such ties are
    implementation-defined on ANY engine, Spark or DuckDB.

    Skew note: like every keyed as-of (kdb aj, Flink temporal join),
    one key's full history flows through one sort partition — the
    window operator spills, but a pathological hub key serializes.
    Salting cannot apply here (the running state crosses salt
    boundaries); shard hub keys upstream by a coarser epoch if one key
    dominates."""
    from pyspark.sql import types as T

    payload = payload or [c for c in right.columns if c != on]
    pay_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in payload]
    )

    lhs = (left.withColumn("_pay", F.lit(None).cast(pay_type))
               .withColumn("_side", F.lit(1)))

    # NULL join keys must never match: SQL equality (the DuckDB ASOF
    # oracle) says NULL = NULL is not a match, but the window below
    # groups NULL partition keys together — so null-key right rows are
    # dropped here, and null-key LEFT rows land alone in the NULL
    # partition and correctly emit with a NULL payload. NULL-TIMESTAMP
    # right rows are dropped for the same reason: ascending sort puts
    # them FIRST in the partition, where last(ignorenulls) would carry
    # their payload into every left row as a spurious "most recent"
    # match (ASOF's l.ts >= r.ts is never true for a NULL r.ts)
    rhs = right.filter(F.col(on).isNotNull()
                       & F.col(ts_col).isNotNull()).select(
        F.col(on), F.col(ts_col).alias("_rts"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_pay"),
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in (on,):
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rhs = rhs.withColumn(ts_col, F.col("_rts")).drop("_rts")

    u = lhs.unionByName(rhs.select(*lhs.columns))
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tiebreak:
        order.append(F.col("_pay").getField(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(on).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in left.columns],
        "_side",
        F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col("_pay").getField(c).alias(f"{prefix}{c}") for c in payload],
    )


def range_join(left: DataFrame, right: DataFrame, delta_seconds: int,
               on: str = "user_id", ts_col: str = "ts",
               prefix: str = "r_") -> DataFrame:
    """Bounded-range inner join: pairs with
    ``left.ts < right.ts <= left.ts + delta_seconds`` on the same key.

    Equi-shuffle plan via Δ-width time buckets (see module docstring);
    the residual range predicate is row-local. Right columns are
    emitted as ``{prefix}{col}``."""
    # cast: events tables often carry TIMESTAMP_NTZ; unix_micros needs
    # TIMESTAMP (session is pinned UTC, so the cast is value-preserving)
    bucket = lambda c: F.floor(
        F.unix_micros(F.col(c).cast("timestamp")) / (delta_seconds * 1_000_000)
    )
    lhs = left.withColumn(
        "_b", F.explode(F.array(bucket(ts_col), bucket(ts_col) + 1))
    )
    rhs = right.select(
        F.col(on),
        *[F.col(c).alias(f"{prefix}{c}") for c in right.columns if c != on],
    ).withColumn("_b", bucket(f"{prefix}{ts_col}"))
    r_ts, l_ts = F.col(f"{prefix}{ts_col}"), F.col(ts_col)
    return (
        lhs.join(rhs, on=[on, "_b"])
        .filter(
            (F.unix_micros(r_ts.cast("timestamp"))
             > F.unix_micros(l_ts.cast("timestamp")))
            & (F.unix_micros(r_ts.cast("timestamp"))
               <= F.unix_micros(l_ts.cast("timestamp"))
               + delta_seconds * 1_000_000)
        )
        .drop("_b")
    )


def scd2_history(facts: DataFrame, key_col: str = "user_id",
                 value_col: str = "event_type", ts_col: str = "ts",
                 tiebreak_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension Type 2 collapse (Kimball's SCD2; for
    a temporal KG this is the fact-history table): an assertion stream
    ``(key, value, ts)`` becomes validity intervals — one row per RUN
    of consecutive equal values per key, ``[valid_from, valid_to)``
    half-open, ``valid_to`` NULL on the current run. The question it
    answers — "what did we believe about X at time t, and when did
    that change?" — is the backbone of point-in-time KG queries and
    of training-data freshness audits.

    Runs are detected with the change-flag prefix sum (lag + running
    count), the standard gaps-and-islands formulation; ties within a
    key at equal ``ts`` are ordered by ``tiebreak_col`` (declared,
    replayable) when given.

    Returns ``(key, value, valid_from, valid_to, n_events,
    is_current)`` with the input's key/value column names preserved.

    Scale shape: two key-partitioned windows and one (key, run)
    aggregation — every partition is bounded by one key's assertion
    count, the natural unit (a key hot enough to overflow a partition
    is a data-model bug upstream, not a planner problem). Exchanges
    carry (key, value, ts) rows once."""
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    # null-SAFE change detection: `value != lag` evaluates NULL when
    # either side is NULL, which silently absorbed NULL assertions
    # into the preceding run (and made first() over the mixed run
    # nondeterministic). row_number marks the genuine first row —
    # lag().isNull() cannot, because a true NULL previous VALUE also
    # makes lag NULL.
    rn = F.row_number().over(w)
    changed = F.when(
        (rn == 1)
        | ~F.col(value_col).eqNullSafe(F.lag(value_col).over(w)), 1
    ).otherwise(0)
    runs = (
        facts.select(key_col, value_col, ts_col,
                     *( [tiebreak_col] if tiebreak_col else [] ))
        .withColumn("_run", F.sum(changed).over(w))
    )
    spans = runs.groupBy(key_col, "_run").agg(
        F.first(value_col).alias(value_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return (
        spans.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            key_col, value_col, "valid_from", "valid_to", "n_events",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


_MONTHS = ("January", "February", "March", "April", "May", "June",
           "July", "August", "September", "October", "November",
           "December")


def extract_dates(pages: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Temporal-expression extraction with normalization — the
    HeidelTime/SUTime capability reduced to its three dominant
    surface forms (the subset that covers most web dates), because a
    KG fact without a date cannot be versioned:

    - ISO          ``2024-03-05``
    - US long      ``March 5, 2024``
    - US numeric   ``3/5/2024`` (month/day/year — declared convention)

    Emits ``(doc_id, raw, date)`` with ``date`` typed DATE; calendar-
    invalid candidates (``February 30, 2024``) are DROPPED — both
    engines agree because normalization goes through try-semantics
    (``try_to_date`` here, ``TRY_CAST`` in the oracle), never an
    erroring constructor. Relative expressions ("last Tuesday") are
    out of scope (declared — they need a document timestamp anchor).

    Row-local regex + date folding; zero exchanges, no UDF."""
    forms = []
    forms.append(F.expr(
        f"transform(regexp_extract_all({text_col}, "
        f"'\\\\b(\\\\d{{4}}-\\\\d{{2}}-\\\\d{{2}})\\\\b', 1), "
        f"m -> struct(m AS raw, try_to_date(m) AS date))"))
    long_rx = ("(" + "|".join(_MONTHS) + r") (\d{1,2}), (\d{4})")
    sql_long = long_rx.replace("\\", "\\\\")
    forms.append(F.expr(
        f"transform(regexp_extract_all({text_col}, '{sql_long}', 0), "
        f"m -> struct(m AS raw, try_to_date(concat("
        f"  regexp_extract(m, '{sql_long}', 3), '-',"
        f"  array_position(array({','.join(repr(x) for x in _MONTHS)}),"
        f"       regexp_extract(m, '{sql_long}', 1)), '-',"
        f"  regexp_extract(m, '{sql_long}', 2)), 'yyyy-M-d') AS date))"))
    num_rx = r"\b(\d{1,2})/(\d{1,2})/(\d{4})\b"
    sql_num = num_rx.replace("\\", "\\\\")
    forms.append(F.expr(
        f"transform(regexp_extract_all({text_col}, '{sql_num}', 0), "
        f"m -> struct(m AS raw, try_to_date(concat("
        f"  regexp_extract(m, '{sql_num}', 3), '-',"
        f"  regexp_extract(m, '{sql_num}', 1), '-',"
        f"  regexp_extract(m, '{sql_num}', 2)), 'yyyy-M-d') AS date))"))
    return (
        pages.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.concat(*forms)).alias("m"),
        )
        .select("doc_id", "m.raw", "m.date")
        .filter(F.col("date").isNotNull())
    )


def fact_intervals(assertions: DataFrame, doc_dates: DataFrame,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj", doc_col: str = "doc_id",
                   date_col: str = "date") -> DataFrame:
    """Temporal scoping of extracted facts (the YAGO2/T-YAGO move —
    Hoffart et al. 2013 attach validity time to every fact): join each
    asserted triple with its source document's publication date and
    aggregate to ``(subj, pred, obj, first_seen, last_seen, n_docs,
    n_mentions)``. ``first_seen``/``last_seen`` are the corpus-observed
    validity bounds a KG UPDATE pipeline uses to retire stale facts
    (a triple last seen two years ago, contradicted since, loses to
    the fresher assertion at fusion time).

    Scale shape: one equi-join on the document key (both sides
    corpus-partitioned on it — no broadcast of a corpus-sized side),
    then one map-side-combined aggregate keyed by the triple. Dates
    ride as real DATE values; min/max need no casting."""
    dated = assertions.select(
        F.col(doc_col).alias("_d"), F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"), F.col(obj_col).alias("obj"),
    ).join(
        doc_dates.select(F.col(doc_col).alias("_d"),
                         F.col(date_col).alias("_dt")),
        "_d",
    )
    return (dated.groupBy("subj", "pred", "obj")
            .agg(F.min("_dt").alias("first_seen"),
                 F.max("_dt").alias("last_seen"),
                 F.countDistinct("_d").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_mentions")))


def snapshot_at(intervals: DataFrame, as_of,
                grace_days: int = 0) -> DataFrame:
    """Point-in-time view of a temporally-scoped KB: the facts
    considered VALID at ``as_of`` — first observed on or before the
    date, last observed within ``grace_days`` of it (a fact unseen
    for longer has been retired by the update pipeline; the
    T-YAGO/YAGO2 validity-window read — Hoffart et al. 2013).

    ``intervals`` is :func:`fact_intervals` output; ``as_of`` is a
    date/string accepted by ``to_date``. Pure row-local filter —
    partition-prunable when the lake stores facts partitioned by
    ``last_seen`` month, zero exchanges here.
    """
    d = F.to_date(F.lit(as_of) if not hasattr(as_of, "alias") else as_of)
    return intervals.filter(
        (F.col("first_seen") <= d)
        & (F.date_add(F.col("last_seen"), int(grace_days)) >= d))


# the 13 Allen relations, classified by ONE deterministic CASE cascade
# shared verbatim with the SQL oracle. For PROPER intervals the 13
# conditions partition the space and order is cosmetic; for POINT
# intervals ([t,t]) several conditions can hold at once (e.g. [t,t]
# vs [t,u] satisfies both starts and meets), so the first-match
# order below IS the classification contract — equality relations
# win over meets/before, which win over the strict-overlap family
_ALLEN_CASES = [
    ("equals", "(s1 = s2) AND (e1 = e2)"),
    ("starts", "(s1 = s2) AND (e1 < e2)"),
    ("started_by", "(s1 = s2) AND (e1 > e2)"),
    ("finishes", "(e1 = e2) AND (s1 > s2)"),
    ("finished_by", "(e1 = e2) AND (s1 < s2)"),
    ("meets", "e1 = s2"),
    ("met_by", "e2 = s1"),
    ("before", "e1 < s2"),
    ("after", "e2 < s1"),
    ("during", "(s1 > s2) AND (e1 < e2)"),
    ("contains", "(s1 < s2) AND (e1 > e2)"),
    ("overlaps", "(s1 < s2) AND (e1 < e2)"),
    ("overlapped_by", "(s1 > s2) AND (e1 > e2)"),
]


def allen_relation_expr(s1="s1", e1="e1", s2="s2", e2="e2"):
    """SQL CASE expression classifying interval pair
    ``[s1,e1] vs [s2,e2]`` into its Allen relation (Allen, CACM
    1983). Valid Spark SQL and DuckDB SQL alike — the oracle embeds
    the same string, so the cascade can never drift between
    engines."""
    import re

    parts = " ".join(
        f"WHEN {cond} THEN '{name}'"
        for name, cond in _ALLEN_CASES)
    expr = f"CASE {parts} END"
    # SIMULTANEOUS substitution: sequential str.replace corrupts the
    # SQL whenever an earlier replacement value contains a later
    # placeholder (s1='phase1_s' introduces 'e1' inside 'phase1'),
    # rewriting user column names into garbage
    mapping = {"s1": s1, "e1": e1, "s2": s2, "e2": e2}
    return re.sub(r"\b(s1|e1|s2|e2)\b",
                  lambda m: mapping[m.group(1)], expr)


def allen_census(intervals: DataFrame, group_col: str,
                 id_col: str, start_col: str = "start",
                 end_col: str = "end") -> DataFrame:
    """Allen interval-algebra census (Allen, CACM 1983) over the
    temporal facts of a KB: for every within-group ordered pair of
    intervals (``id_a < id_b``), classify their temporal relation
    into the 13 Allen primitives and fold to ``(relation, n)`` —
    the one-table temporal-consistency fingerprint (a KB whose
    'position held' facts mostly *overlap* instead of *meet* has
    extraction errors; a census dominated by *equals* signals
    default-dated facts).

    Proper and point intervals both classify (a point interval
    [t, t] *starts* any longer interval sharing t); the cascade is
    one shared CASE string (:func:`allen_relation_expr`), so engine
    and oracle agree bit-for-bit on every boundary tie.

    Scale shape: one self-join keyed by the group column (group
    sizes bound the quadratic locally — callers pass entity or
    user keys, not corpus-constants), then one map-side-combinable
    13-row fold. Exchange rows are (group, id, 2 timestamps)."""
    base = intervals.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("i"),
        F.col(start_col).alias("s"), F.col(end_col).alias("e"))
    a = base.select("g", F.col("i").alias("ia"),
                    F.col("s").alias("s1"), F.col("e").alias("e1"))
    b = base.select(F.col("g").alias("g2"), F.col("i").alias("ib"),
                    F.col("s").alias("s2"), F.col("e").alias("e2"))
    pairs = a.join(b, (F.col("g") == F.col("g2"))
                   & (F.col("ia") < F.col("ib")))
    rel = F.expr(allen_relation_expr("s1", "e1", "s2", "e2"))
    return (pairs.select(rel.alias("relation"))
            .groupBy("relation")
            .agg(F.count("*").cast("long").alias("n")))


def temporal_conflicts(intervals: DataFrame,
                       functional_preds: list,
                       subj_col: str = "subj", pred_col: str = "pred",
                       obj_col: str = "obj",
                       first_col: str = "first_seen",
                       last_col: str = "last_seen",
                       max_objects: int = 10000) -> DataFrame:
    """Temporal functional-constraint violation census (Dylla,
    Mühleisen & Theobald, EDBT 2013 "temporal consistency
    constraints"; the functional-predicate time checks behind
    YAGO2's validity windows — Hoffart et al. 2013): for predicates
    declared FUNCTIONAL (one true object at a time — capital_of,
    ceo_of, is-a kind), two facts about the same subject with
    DIFFERENT objects whose validity windows overlap cannot both be
    true; the census surfaces every such pair so fusion can retire
    the staler assertion instead of silently keeping both.

    Returns one row per conflicting pair: ``(subj, pred, obj_a,
    obj_b, overlap_days)`` with ``obj_a < obj_b`` and
    ``overlap_days`` the INTEGER size of the window intersection
    (>= 1 — touching windows conflict on their shared day; DATE
    arithmetic, nothing floats).

    Scale shape: the functional-pred filter broadcasts as an isin
    literal; pairs are generated IN-AGGREGATE per (subj, pred) —
    one collect of (obj, first, last) structs bounded by the
    subject's object count, with a guard window dropping
    pathological subjects past ``max_objects`` BEFORE any list
    materializes (the `_bucket_pairs` convention); the overlap test
    and day count are row-local. Exchanges carry the (subj, pred)
    key plus small structs only.
    """
    preds = [str(x) for x in functional_preds]
    f = (intervals.select(
        F.col(subj_col).alias("s"), F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"), F.col(first_col).alias("f"),
        F.col(last_col).alias("l"))
        .filter(F.col("p").isin(preds)
                & F.col("s").isNotNull() & F.col("o").isNotNull()
                & F.col("f").isNotNull() & F.col("l").isNotNull()))
    w = Window.partitionBy("s", "p")
    sized = (f.withColumn("_n", F.count("*").over(w))
             .filter((F.col("_n") >= 2) & (F.col("_n") <= int(max_objects)))
             .drop("_n"))
    grouped = sized.groupBy("s", "p").agg(
        F.sort_array(F.collect_list(F.struct("o", "f", "l")))
        .alias("_xs"))
    gen = F.flatten(F.transform(
        "_xs",
        lambda x, i: F.transform(
            F.slice("_xs", i + F.lit(2), F.size("_xs")),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    pairs = (grouped.select("s", "p", F.explode(gen).alias("_p"))
             .filter(~((F.col("_p.a.l") < F.col("_p.b.f"))
                       | (F.col("_p.b.l") < F.col("_p.a.f"))))
             # same-object duplicates (two extraction runs of one
             # (s,p,o)) are re-assertions, not conflicts — and the
             # obj_a < obj_b contract requires distinct objects
             .filter(F.col("_p.a.o") != F.col("_p.b.o")))
    return pairs.select(
        F.col("s").alias(subj_col), F.col("p").alias(pred_col),
        F.col("_p.a.o").alias("obj_a"), F.col("_p.b.o").alias("obj_b"),
        (F.datediff(F.least("_p.a.l", "_p.b.l"),
                    F.greatest("_p.a.f", "_p.b.f")) + 1)
        .cast("long").alias("overlap_days"))
