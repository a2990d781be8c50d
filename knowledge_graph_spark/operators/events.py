# -*- coding: utf-8 -*-
"""Event-stream analytics operators (batch forms).

The reference has no stream processing; these cover the events-table
workloads a production corpus pipeline runs next to KG construction:
fixed-window aggregation (the batch twin of
streaming/ingest.windowed_event_counts) and gap-based sessionization.

Both are pure window/aggregate plans — sessionization is the classic
two-window trick (lag -> gap flag -> running sum = session id), which
Catalyst executes with one shuffle per user partition, no Python, no
iteration. At 10^12 events the shuffle key is user_id; AQE skew-join /
salting applies for pathological power users (see functions/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(events: DataFrame, hours: int = 6) -> DataFrame:
    """Fixed tumbling windows over ts: (window_start, event_type,
    n_events, n_users, total_value). Epoch-aligned so a SQL oracle can
    reproduce the bucketing exactly."""
    bucket = (F.unix_timestamp("ts") / (hours * 3600)).cast("long")
    return (
        events.groupBy(
            F.from_unixtime(bucket * hours * 3600).cast("timestamp").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    since the user's previous event exceeds ``gap_minutes``.

    Returns one row per session: (user_id, session_id, session_start,
    session_end, n_events, total_value). session_id is 1-based per
    user in time order — deterministic, so it value-matches a SQL
    oracle using the identical two-window construction."""
    # NULL user/ts rows (anonymous events, join misses) would all
    # land in ONE window partition and stitch unrelated events into
    # fake sessions — same guard stance as cusum/trend/kleinberg
    events = events.filter(F.col("user_id").isNotNull()
                           & F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: unix_timestamp() truncates to seconds and
    # would mis-classify gaps that straddle the threshold fractionally;
    # cast covers TIMESTAMP_NTZ parquet columns (session TZ is UTC)
    us = lambda c: F.unix_micros(c.cast("timestamp") if hasattr(c, "cast")
                                 else F.col(c).cast("timestamp"))
    gap = us("ts") - us(F.lag("ts").over(w))
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = (
        events.withColumn("_new", is_new)
        .withColumn("session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary: session count, mean session length
    (seconds), mean events per session."""
    s = sessionize(events, gap_minutes)
    dur = (
        F.unix_micros(F.col("session_end").cast("timestamp"))
        - F.unix_micros(F.col("session_start").cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg(dur), 4).alias("avg_session_sec"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        )
    )

def funnel(events: DataFrame, steps: list[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Ordered funnel analysis: for each user who performed
    ``steps[0]``, the earliest timestamp of each successive step that
    happens STRICTLY AFTER the previous step's timestamp (the classic
    product-analytics funnel: a click only counts if it follows the
    view that entered the user into the funnel). Returns
    ``(user, t1..tk, steps_completed)``; a user stalls at the first
    step they never perform in order (later columns NULL).

    Scale shape: the event stream is pruned to the funnel's event
    types and 3 columns (filter + project pushed to the scan) and the
    pruned stream is PERSISTED — each step's aggregate reads the
    cached pruned events, not the raw table again (k steps would
    otherwise re-scan the source k+1 times). The cache lives until
    Spark evicts it (it backs the returned lazy frame, so the operator
    cannot unpersist it itself). Each step is one user-keyed aggregate
    over only that step's events, joined to the previous frontier
    (per-user one row —
    broadcast when small, hash join keyed on the same user column
    otherwise, so AQE reuses the partitioning). Every exchange carries
    ``(user, timestamp)`` pairs. No windows, no per-user event
    collection — hub users with millions of events cost nothing
    beyond their aggregate partials."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    user, ts = F.col(user_col), F.col(ts_col)
    base = (
        events.select(user.alias("user"), ts.alias("_ts"),
                      F.col(type_col).alias("_type"))
        .filter(F.col("_type").isin(list(steps)))
        .persist()
    )
    out = (
        base.filter(F.col("_type") == steps[0])
        .groupBy("user").agg(F.min("_ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            base.filter(F.col("_type") == step)
            .join(out.select("user", prev), "user")
            .filter(F.col("_ts") > F.col(prev))
            .groupBy("user").agg(F.min("_ts").alias(f"t{i}"))
        )
        out = out.join(nxt, "user", "left")
    done = F.lit(0)
    for i in range(1, len(steps) + 1):
        done = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(done)
    return out.withColumn("steps_completed", done)


def retention_cohorts(events: DataFrame, period_days: int = 7,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Cohort retention: users are grouped by the epoch-aligned
    ``period_days`` bucket of their FIRST event (their cohort); for
    each (cohort, k) the row counts the distinct cohort members active
    k periods after joining, plus the retention rate. The classic
    growth-analytics matrix (k = 0 rows equal the cohort size by
    construction).

    ``cohort_epoch`` is the cohort bucket's start as epoch seconds —
    a timezone-free long, so a SQL oracle reproduces it exactly.

    Scale shape: project to (user, period) and distinct ONCE (the only
    pass over the raw stream — a hub user with millions of events
    collapses to their few active periods map-side before the
    exchange), one user-keyed min-aggregate for cohorts, one user-keyed
    join back (AQE reuses the distinct's hash partitioning), one
    (cohort, k) count-distinct aggregate, and a broadcast join of the
    per-cohort sizes (one row per cohort — weeks, not users). Every
    exchange carries (long, long) pairs; event payloads are pruned at
    the scan."""
    secs = period_days * 86400
    period = (F.unix_micros(F.col(ts_col).cast("timestamp"))
              / F.lit(secs * 1_000_000)).cast("long")
    activity = (
        events.select(F.col(user_col).alias("user"),
                      period.alias("period"))
        .distinct()
    )
    cohorts = activity.groupBy("user").agg(F.min("period").alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(
        F.count("*").alias("cohort_size"))
    ret = (
        activity.join(cohorts, "user")
        # count, not countDistinct: (user, period) is distinct and a
        # user has one cohort, so rows are already unique per
        # (cohort, k, user) — a distinct-aggregate here would re-pay
        # an expand over the largest exchange for nothing
        .groupBy("cohort", (F.col("period") - F.col("cohort")).alias("k"))
        .agg(F.count("*").alias("active_users"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort")
        .select(
            (F.col("cohort") * secs).alias("cohort_epoch"),
            F.col("k").alias("periods_later"),
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6)
            .alias("retention_rate"),
        )
    )


def daily_anomalies(events: DataFrame, threshold: float = 2.0,
                    type_col: str = "event_type",
                    ts_col: str = "ts") -> DataFrame:
    """Volume anomaly detection: per (event type, UTC day), the daily
    event count's z-score against that type's own across-days mean and
    population standard deviation, flagged when ``|z| >= threshold`` —
    the crawl-monitoring report that catches a collapsed source or a
    runaway host the moment a day's volume leaves the type's normal
    band. Returns ``(event_type, day, n_events, mean_events,
    stddev_events, zscore, is_anomaly)``; a type with constant daily
    volume (stddev 0) scores z = 0.0 (nothing to flag, and no ANSI
    divide-by-zero).

    Scale shape: ONE pass over the raw stream — a (type, day)-keyed
    count aggregate with map-side combine (a hub day collapses inside
    each task before the exchange); mean/stddev then come from a
    window over the AGGREGATED frame, whose partitions are one row per
    day per type — metadata-scale, never raw events. ``day`` is
    ``to_date(ts)`` in UTC, so a SQL oracle reproduces the bucketing
    exactly."""
    daily = (
        events.select(F.col(type_col).alias("event_type"),
                      F.to_date(F.col(ts_col)).alias("day"))
        # a NULL day bucket (NULL ts) would enter every type's
        # mean/stddev and skew all z-scores — drop it
        .filter(F.col("day").isNotNull())
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("event_type")
    mean = F.avg("n_events").over(w)
    sd = F.stddev_pop("n_events").over(w)
    z = F.when(sd == 0, F.lit(0.0)).otherwise(
        (F.col("n_events") - mean) / sd)
    return daily.select(
        "event_type", "day", "n_events",
        F.round(mean, 6).alias("mean_events"),
        F.round(sd, 6).alias("stddev_events"),
        F.round(z, 6).alias("zscore"),
        (F.abs(z) >= F.lit(threshold)).alias("is_anomaly"),
    )


def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """First-order Markov transition statistics over each user's
    event sequence: for every observed (current, next) event-type
    pair, the count and the conditional probability
    ``p = c(cur, next) / Σ_next c(cur, ·)`` — the behavioral model
    behind funnel drop-off analysis and next-event prediction
    baselines. Returns ``(cur_type, next_type, n_transitions, prob)``.
    Ties in event time order by event id-free deterministic
    (ts, type) so reruns agree.

    Scale shape: ONE user-keyed window pass (lead over (ts, type) —
    partitions bounded by a user's event count; the power-user skew
    case is the same one sessionize carries), then a (cur, next)
    aggregate with map-side combine and a row-count window over the
    AGGREGATED frame (one row per observed pair — metadata-scale) for
    the denominator. Event payloads are pruned at the scan."""
    # NULL users would fabricate transitions BETWEEN different real
    # users' events (one shared window partition); NULL ts has no
    # position in the sequence
    events = events.filter(F.col(user_col).isNotNull()
                           & F.col(ts_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.col(type_col))
    seq = events.select(
        F.col(type_col).alias("cur_type"),
        F.lead(type_col, 1).over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    agg = seq.groupBy("cur_type", "next_type").agg(
        F.count("*").alias("n_transitions"))
    denom = F.sum("n_transitions").over(Window.partitionBy("cur_type"))
    return agg.select(
        "cur_type", "next_type", "n_transitions",
        F.round(F.col("n_transitions") / denom, 6).alias("prob"),
    )


def cusum_ingredients(events: DataFrame, key_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """CUSUM changepoint statistics (Page, Biometrika 1954; the
    at-most-one-change scan statistic of Hinkley 1970) per series:
    for each key's daily-count sequence, the INTEGER-scaled
    cumulative deviation ``S_t = T * prefix_t - t_index * total``
    (= T·(prefix_t − t/T·total), the mean-removed CUSUM times T —
    kept in BIGINT so both engines replay it exactly); the day
    maximizing ``|S_t|`` is the single most likely level-shift
    point, and ``max|S|`` its strength.

    Returns per key: ``(key, n_days, total, cp_day, s_at_cp,
    max_abs_s)`` where ``cp_day`` is the FIRST day attaining the
    max (deterministic tie-break).

    Scale shape: one (key, day) count aggregate; prefix sums run in
    a window partitioned BY KEY (series-local, never global); the
    argmax folds with ``min(struct(-|S|, day, S))`` — no second
    window, no collect.
    """
    from pyspark.sql import Window

    daily = (events
             .select(F.col(key_col).alias("k"),
                     F.to_date(ts_col).alias("d"))
             .filter(F.col("k").isNotNull() & F.col("d").isNotNull())
             .groupBy("k", "d")
             .agg(F.count("*").cast("long").alias("n")))
    w = (Window.partitionBy("k").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wk = Window.partitionBy("k")
    cur = (daily
           .withColumn("_pre", F.sum("n").over(w))
           .withColumn("_i", F.count("*").over(w))
           .withColumn("_tot", F.sum("n").over(wk).cast("long"))
           .withColumn("_T", F.count("*").over(wk).cast("long")))
    s = cur.select(
        "k", "d", "_tot", "_T",
        (F.col("_T") * F.col("_pre") - F.col("_i") * F.col("_tot"))
        .cast("long").alias("_s"))
    return (s.groupBy("k")
            .agg(F.max("_T").alias("n_days"),
                 F.max("_tot").alias("total"),
                 F.min(F.struct(
                     (-F.abs(F.col("_s"))).alias("_na"),
                     F.col("d").alias("_d"),
                     F.col("_s").alias("_sv"))).alias("_b"))
            .select(F.col("k").alias(key_col), "n_days", "total",
                    F.col("_b._d").alias("cp_day"),
                    F.col("_b._sv").alias("s_at_cp"),
                    (-F.col("_b._na")).cast("long").alias("max_abs_s")))


def trend_ingredients(events: DataFrame, key_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """Per-series OLS trend ingredients over daily counts — the
    "is this entity/predicate/source growing" census a temporal KG
    publishes per batch. Emits the five INTEGER sufficient
    statistics of the least-squares slope over (day_index, count)
    pairs — ``slope = (n·sxy − sx·sy) / (n·sxx − sx·sx)`` is a
    row-local division for API users, so the output hash-stably
    replays cross-engine.

    Day indices are per-series (0 = the series' first active day,
    counting calendar days, zero-count days contributing nothing —
    the standard sparse convention; datediff is exact integer
    arithmetic in both engines).

    Returns ``(key, n_days, sx, sy, sxx, sxy)``.

    Scale shape: one (key, day) count aggregate, one key-local min
    window for the series origin, one final key-keyed fold. No
    global window, no collect.
    """
    from pyspark.sql import Window

    daily = (events
             .select(F.col(key_col).alias("k"),
                     F.to_date(ts_col).alias("d"))
             .filter(F.col("k").isNotNull() & F.col("d").isNotNull())
             .groupBy("k", "d")
             .agg(F.count("*").cast("long").alias("n")))
    wk = Window.partitionBy("k")
    xy = (daily
          .withColumn("_d0", F.min("d").over(wk))
          .select("k", F.datediff(F.col("d"), F.col("_d0"))
                  .cast("long").alias("x"), F.col("n").alias("y")))
    return (xy.groupBy("k")
            .agg(F.count("*").cast("long").alias("n_days"),
                 F.sum("x").cast("long").alias("sx"),
                 F.sum("y").cast("long").alias("sy"),
                 F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                 F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"))
            .select(F.col("k").alias(key_col), "n_days", "sx", "sy",
                    "sxx", "sxy"))


def kleinberg_bursts(events: DataFrame, n_steps: int,
                     tau_scaled: int, s_ratio: int = 2,
                     key_col: str = "event_type",
                     ts_col: str = "ts") -> DataFrame:
    """Kleinberg burst detection, batched-stream form (Kleinberg,
    KDD 2002 "Bursty and hierarchical structure in streams" §4 — the
    enumerating-bursts automaton over per-batch counts): for each
    series, the minimum-cost state path of a two-state automaton
    whose base state emits the series' background rate ``p0 = R/D``
    and whose burst state emits ``p1 = s_ratio * p0``; entering the
    burst state costs ``tau``, leaving is free. Costs live on an
    integer micro-nat lattice (round(raw * 1e6)), which hash-replays
    cross-engine but bounds the domain: a single series accumulating
    ~1e12 events at extreme rate ratios pushes r*|ln p|*1e6 toward
    the BIGINT ceiling — shard series keys (or coarsen n_steps)
    before that scale; the DP itself is per-key and unaffected by
    corpus size. The classic detector
    for topic surges and crawl-traffic flares that a plain z-score
    census (:func:`daily_anomalies`) misses when bursts span
    multiple days — the DP trades per-day evidence against the
    transition toll, so one quiet day inside a real burst does not
    split it.

    Determinism is engineered, not hoped for: per-cell emission
    costs ``-(r ln p_q + (d - r) ln(1 - p_q))`` are rounded onto a
    1e-6 lattice and carried as BIGINT micro-nats, so every DP sum
    and comparison is integer-exact; ``tau_scaled`` (the scaled
    transition toll, typically ``round(ln(n_steps) * 1e6)``) is a
    caller-supplied literal shared verbatim with any SQL replay;
    argmin ties break on the lower predecessor state via one
    ``min(struct)`` fold. The day axis is a DENSE ``1..n_steps``
    index from the global min day (absent days cost zero in both
    states), so the path length is a constant of the query, not of
    which days happened to have data.

    Returns per series: ``(key, path, n_burst_steps,
    total_cost_scaled)`` — ``path`` is the 0/1 state string of
    length ``n_steps``.

    Scale shape: one raw-stream aggregate to (key, day_idx, r) and
    one to day totals; the DP advances ALL series in parallel, one
    tiny (key, state, cost, path) frame per step — 2 rows per
    series, ``n_steps`` bounded (the landmark-BFS convention);
    per-step exchanges carry (key, int, long, short-string). The
    raw stream is never touched inside the loop.
    """
    if int(n_steps) < 1:
        raise ValueError("n_steps must be >= 1")
    day = F.to_date(ts_col)
    base = (events.filter(F.col(key_col).isNotNull()
                          & F.col(ts_col).isNotNull())
            .select(F.col(key_col).alias("key"), day.alias("_d")))
    lo = base.agg(F.min("_d").alias("_lo"))
    counts = (base.crossJoin(F.broadcast(lo))
              .select("key", (F.datediff(F.col("_d"), F.col("_lo"))
                              + 1).alias("t"))
              .filter((F.col("t") >= 1) & (F.col("t") <= int(n_steps)))
              .groupBy("key", "t")
              .agg(F.count("*").cast("long").alias("r")))
    totals = counts.groupBy("t").agg(F.sum("r").cast("long").alias("d"))
    series = counts.groupBy("key").agg(
        F.sum("r").cast("long").alias("rtot"))
    grand = totals.agg(F.sum("d").cast("long").alias("dtot"))

    # dense (key, t) grid with r = 0 filled in, plus per-type rates
    spark = events.sparkSession
    tgrid = spark.range(1, int(n_steps) + 1).select(
        F.col("id").cast("int").alias("t"))
    grid = (series.crossJoin(tgrid)
            .join(counts, ["key", "t"], "left")
            .join(totals, "t", "left")
            .crossJoin(F.broadcast(grand))
            .select("key", "t",
                    F.coalesce("r", F.lit(0).cast("long")).alias("r"),
                    F.coalesce("d", F.lit(0).cast("long")).alias("d"),
                    "rtot", "dtot"))
    # clamp BOTH rates below 1: a series carrying every event at every
    # step (rtot == dtot) makes the unclamped p0 = 1 and
    # (d-r)*ln(1-p0) NULL, which would propagate NULL costs/paths
    p0 = F.least(F.col("rtot") / F.col("dtot"), F.lit(0.999999))
    p1 = F.least(p0 * int(s_ratio), F.lit(0.999999))

    def _cost(p):
        raw = -(F.col("r") * F.log(p)
                + (F.col("d") - F.col("r")) * F.log(F.lit(1.0) - p))
        return F.round(raw * 1e6).cast("long")

    dc = (grid.select(
        "key", "t",
        F.when(F.col("d") == 0, F.lit(0).cast("long"))
        .otherwise(_cost(p0)).alias("c0"),
        F.when(F.col("d") == 0, F.lit(0).cast("long"))
        .otherwise(_cost(p1)).alias("c1"))
        .localCheckpoint(eager=True))

    big = 10 ** 15
    state = (series.select(
        "key",
        F.explode(F.array(
            F.struct(F.lit(0).alias("q"),
                     F.lit(0).cast("long").alias("cost"),
                     F.lit("").alias("path")),
            F.struct(F.lit(1).alias("q"),
                     F.lit(big).cast("long").alias("cost"),
                     F.lit("").alias("path")))).alias("_s"))
        .select("key", "_s.q", "_s.cost", "_s.path")
        .localCheckpoint(eager=True))
    qn = spark.range(2).select(F.col("id").cast("int").alias("qn"))
    tau = int(tau_scaled)
    for t in range(1, int(n_steps) + 1):
        cand = (state.crossJoin(F.broadcast(qn))
                .select("key", "qn",
                        (F.col("cost")
                         + F.when((F.col("qn") == 1) & (F.col("q") == 0),
                                  F.lit(tau).cast("long"))
                         .otherwise(F.lit(0).cast("long"))).alias("_c"),
                        "q", "path"))
        best = (cand.groupBy("key", "qn")
                .agg(F.min(F.struct("_c", "q", "path")).alias("_b")))
        dct = dc.filter(F.col("t") == t).select(
            "key", "c0", "c1")
        state = (best.join(dct, "key")
                 .select("key", F.col("qn").alias("q"),
                         (F.col("_b._c")
                          + F.when(F.col("qn") == 0, F.col("c0"))
                          .otherwise(F.col("c1"))).alias("cost"),
                         F.concat("_b.path",
                                  F.col("qn").cast("string"))
                         .alias("path"))
                 .localCheckpoint(eager=True))
    final = (state.groupBy("key")
             .agg(F.min(F.struct("cost", "q", "path")).alias("_b")))
    return final.select(
        F.col("key"), F.col("_b.path").alias("path"),
        (F.length("_b.path")
         - F.length(F.replace(F.col("_b.path"), F.lit("1"), F.lit(""))))
        .cast("long").alias("n_burst_steps"),
        F.col("_b.cost").alias("total_cost_scaled"))
