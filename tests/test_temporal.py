# -*- coding: utf-8 -*-
"""As-of join and bounded range join: edge semantics the oracles can't
single out (equality inclusivity, bucket boundaries, tie resolution)."""

from __future__ import annotations

from datetime import datetime

from knowledge_graph_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 7),   # before any right -> NULL
            (2, _ts("2024-01-01 12:00:00"), 7),   # equals a right ts -> inclusive
            (3, _ts("2024-01-01 15:00:00"), 7),   # most recent wins, not first
            (4, _ts("2024-01-01 15:00:00"), 8),   # other key: no right rows at all
        ],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 12:00:00"), 100),
            (7, _ts("2024-01-01 14:00:00"), 101),
        ],
        "user_id long, ts timestamp_ntz, event_id long",
    )
    out = {r["event_id"]: r["r_event_id"]
           for r in asof_join(left, right, payload=["event_id", "ts"],
                              tiebreak="event_id").collect()}
    assert out == {1: None, 2: 100, 3: 101, 4: None}


def test_asof_join_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 13:00:00"), 7)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    # two right rows at the SAME timestamp: the largest tiebreak wins
    right = spark.createDataFrame(
        [(7, _ts("2024-01-01 12:00:00"), 5), (7, _ts("2024-01-01 12:00:00"), 9)],
        "user_id long, ts timestamp_ntz, event_id long",
    )
    got = asof_join(left, right, payload=["event_id"],
                    tiebreak="event_id").collect()
    assert got[0]["r_event_id"] == 9


def test_asof_join_null_payload_column_not_resurrected(spark):
    """The matched right row is carried ATOMICALLY: when the most recent
    right row has a NULL in one payload column, the output keeps that
    NULL instead of filling it from an OLDER right row (per-column
    last(ignorenulls) would fabricate a row that never existed)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 15:00:00"), 7)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 12:00:00"), 100, "old"),
            (7, _ts("2024-01-01 14:00:00"), None, "new"),
        ],
        "user_id long, ts timestamp_ntz, event_id long, tag string",
    )
    got = asof_join(left, right, payload=["event_id", "tag", "ts"]).collect()
    assert len(got) == 1
    r = got[0]
    # DuckDB ASOF semantics: the 14:00 row matches — all three payload
    # columns come from it, including its NULL event_id
    assert r["r_tag"] == "new"
    assert r["r_ts"] == _ts("2024-01-01 14:00:00")
    assert r["r_event_id"] is None


def test_range_join_bucket_boundaries(spark):
    # delta = 60s; right rows at +0s (excluded: strict >), +59s, +60s
    # (included: inclusive upper), +61s (excluded), and one in the NEXT
    # bucket but inside the range (the explode(+1) candidate must catch it)
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:30"), 7)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 10:00:30"), 200),  # == l.ts -> out
            (7, _ts("2024-01-01 10:00:59"), 201),  # same bucket -> in
            (7, _ts("2024-01-01 10:01:29"), 202),  # next bucket, +59s -> in
            (7, _ts("2024-01-01 10:01:30"), 203),  # exactly +60s -> in
            (7, _ts("2024-01-01 10:01:31"), 204),  # +61s -> out
            (8, _ts("2024-01-01 10:00:45"), 205),  # other key -> out
        ],
        "user_id long, ts timestamp_ntz, event_id long",
    )
    got = sorted(
        r["r_event_id"]
        for r in range_join(left, right, delta_seconds=60).collect()
    )
    assert got == [201, 202, 203]
    # no duplicate pairs from the two candidate buckets
    assert len(got) == len(set(got))


def test_asof_join_null_keys_never_match(spark):
    """SQL equality semantics (the DuckDB ASOF oracle): a NULL left
    key matches NO right row — even a null-key right row with an
    earlier timestamp — and still emits with a NULL payload (left
    join keeps the row)."""
    from datetime import datetime

    from knowledge_graph_spark.operators.temporal import asof_join

    T = lambda s: datetime(2026, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(None, T(5), "l0"), (1, T(5), "l1")],
        "user_id int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(None, T(1), "r_null"), (1, T(2), "r_one")],
        "user_id int, ts timestamp, v string")
    got = {r["tag"]: r["r_v"]
           for r in asof_join(left, right, on="user_id").collect()}
    assert got == {"l0": None, "l1": "r_one"}


def test_scd2_history_runs_and_intervals(spark):
    from datetime import datetime as dt

    from knowledge_graph_spark.operators.temporal import scd2_history

    t = lambda m: dt(2024, 1, 1, 0, m)
    facts = spark.createDataFrame(
        [(1, "trial", t(0)), (1, "trial", t(5)), (1, "paid", t(10)),
         (1, "trial", t(20)),      # value returns -> NEW run
         (2, "paid", t(3))],
        "user_id long, event_type string, ts timestamp")
    rows = [r.asDict() for r in
            scd2_history(facts).orderBy("user_id", "valid_from")
            .collect()]
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [(r["event_type"], r["n_events"], r["is_current"])
            for r in u1] == [("trial", 2, False), ("paid", 1, False),
                             ("trial", 1, True)]
    assert u1[0]["valid_to"] == u1[1]["valid_from"] == t(10)
    assert u1[2]["valid_to"] is None
    u2 = [r for r in rows if r["user_id"] == 2]
    assert u2[0]["is_current"] and u2[0]["n_events"] == 1


def test_extract_dates_three_forms_and_invalid(spark):
    import datetime as dt

    from knowledge_graph_spark.operators.temporal import extract_dates

    pages = spark.createDataFrame(
        [(1, "published 2024-03-05, updated March 7, 2024, "
             "seen 3/9/2024"),
         (2, "broken February 30, 2024 and 13/40/2024 both drop"),
         (3, "no dates"), (4, None)],
        "doc_id long, text string")
    rows = {(r["doc_id"], r["raw"], r["date"])
            for r in extract_dates(pages).collect()}
    assert (1, "2024-03-05", dt.date(2024, 3, 5)) in rows
    assert (1, "March 7, 2024", dt.date(2024, 3, 7)) in rows
    assert (1, "3/9/2024", dt.date(2024, 3, 9)) in rows
    assert not any(r[0] in (2, 3, 4) for r in rows)


def test_fact_intervals_bounds_and_counts(spark):
    """first/last_seen are per-triple DATE bounds across SOURCE docs;
    n_docs is distinct, n_mentions total; assertions in docs without
    a date are dropped by the inner join."""
    import datetime as _dt

    from knowledge_graph_spark.operators.temporal import fact_intervals

    assertions = spark.createDataFrame([
        (1, "paris", "capital_of", "france"),
        (2, "paris", "capital_of", "france"),
        (2, "paris", "capital_of", "france"),   # 2nd mention, same doc
        (3, "lyon", "city_in", "france"),
        (9, "ghost", "in", "nowhere"),           # doc 9 has no date
    ], "doc_id long, subj string, pred string, obj string")
    dates = spark.createDataFrame([
        (1, _dt.date(2021, 5, 1)),
        (2, _dt.date(2023, 1, 15)),
        (3, _dt.date(2022, 7, 4)),
    ], "doc_id long, date date")
    got = {(r["subj"], r["pred"], r["obj"]):
           (r["first_seen"], r["last_seen"], r["n_docs"], r["n_mentions"])
           for r in fact_intervals(assertions, dates).collect()}
    assert got[("paris", "capital_of", "france")] == (
        _dt.date(2021, 5, 1), _dt.date(2023, 1, 15), 2, 3)
    assert got[("lyon", "city_in", "france")] == (
        _dt.date(2022, 7, 4), _dt.date(2022, 7, 4), 1, 1)
    assert ("ghost", "in", "nowhere") not in got
