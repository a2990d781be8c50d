# -*- coding: utf-8 -*-
"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The watermarked window aggregations in ingest.py cover FIXED windows;
session windows (close after ``gap`` of inactivity) need arbitrary
per-key state — Spark's escape hatch for custom stateful operators is
``applyInPandasWithState`` (Arrow-batched, event-time timeouts). This
module implements the canonical one: per-user sessionization whose
CLOSED-session output matches the batch operator
(:func:`knowledge_graph_spark.operators.events.sessionize`) exactly,
so the streaming and batch paths are twin-checkable.

State design (bounded, per the 100 TB rule):
- one fixed-size tuple per OPEN session per user — (start_us, last_us,
  n_events, total_value); closed sessions leave state immediately;
- event-time timeout at ``last_ts + gap``: when the watermark passes
  it, the open session closes and the key's state is removed — state
  size is O(active users within the watermark horizon), not O(users
  ever seen);
- timestamps ride as int64 microseconds inside the state tuple (no
  tz/py-datetime round-trips in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """events stream (event_id, ts, user_id, event_type, value) ->
    stream of CLOSED sessions (append mode).

    A session closes when (a) a later event of the same user arrives
    more than ``gap`` after it (intra-stream close), or (b) the
    watermark passes ``last_ts + gap`` (event-time timeout)."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def _emit(user: int, s: tuple) -> "pd.DataFrame":
        start_us, last_us, n, total = s
        return pd.DataFrame([{
            "user_id": user,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
            "n_events": n,
            "total_value": total,
        }])

    def fn(key, pdfs, state):
        user = key[0]
        if state.hasTimedOut:
            s = tuple(state.get)
            state.remove()
            yield _emit(user, s)
            return
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
        vals = rows["value"].to_numpy()

        # Interval-merge the batch's events WITH the stored open session
        # as one atom [start,last]. applyInPandasWithState delivers
        # late-but-within-watermark rows, so a batch may carry events
        # OLDER than the open session — a naive "extend last" walk would
        # regress last_us and split sessions batch order would keep.
        # The atom merge is exact: an event inside the span always
        # attaches (consecutive session gaps are <= gap, so both
        # sub-gaps of any interior insertion are too), and events before
        # the span chain exactly as a global sort would.
        items = [(int(t), int(t), 1, float(v)) for t, v in zip(ts_us, vals)]
        if state.exists:
            items.append(tuple(state.get))
        items.sort(key=lambda x: (x[0], x[1]))
        closed = []
        cur = items[0]
        for it in items[1:]:
            if it[0] - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], it[1]),
                       cur[2] + it[2], cur[3] + it[3])
            else:
                closed.append(cur)
                cur = it
        state.update(cur)
        # event-time timeout: fire when the watermark passes last + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        for s in closed:
            yield _emit(user, s)

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
