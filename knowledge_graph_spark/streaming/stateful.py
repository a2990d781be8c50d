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

Emission discipline (the append-sink correctness rule): a session may
be emitted ONLY once the watermark has passed ``session_end + gap`` —
before that, a late-but-still-accepted event (ts >= watermark) could
attach to it (``ts - end <= gap``), and an append sink cannot retract.
Sessions closed by an intra-batch gap therefore WAIT in state as
"pending" until they mature; emitting them immediately (the pre-r5
behavior) split sessions that a late event would have merged,
breaking the batch-equivalence contract.

State design (bounded, per the 100 TB rule):
- one array of fixed-size session tuples per user — the OPEN session
  plus any pending (gap-closed but not yet watermark-matured) ones;
  pending sessions drain on the next invocation or timeout, so the
  array length is bounded by the number of sessions a user can start
  within one watermark horizon (horizon / gap);
- event-time timeout at ``min(last) + gap``: when the watermark
  passes the earliest session's close point, matured sessions emit
  and state shrinks; the key's state is removed when nothing remains
  — state size is O(active users within the watermark horizon);
- timestamps ride as int64 microseconds inside the state tuples (no
  tz/py-datetime round-trips in the hot path). NULL event values
  count 0 toward ``total_value`` (the batch ``F.sum`` skips NULLs)
  and the emitted total is rounded to 4 dp like the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_SESSION = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])

_STATE = StructType([StructField("sessions", ArrayType(_SESSION))])


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """events stream (event_id, ts, user_id, event_type, value) ->
    stream of CLOSED sessions (append mode).

    A session EMITS only when the watermark passes ``last_ts + gap``
    (whether the gap was observed intra-stream or via event-time
    timeout) — the earliest moment no acceptable event can still
    attach. NULL user_id / ts rows are dropped like the batch
    operator (they would stitch unrelated events into fake
    sessions)."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def _emit(user: int, sessions: list) -> "pd.DataFrame":
        return pd.DataFrame([{
            "user_id": user,
            "session_start": pd.Timestamp(s[0], unit="us"),
            "session_end": pd.Timestamp(s[1], unit="us"),
            "n_events": s[2],
            "total_value": round(s[3], 4),
        } for s in sorted(sessions)])

    def _split(sessions: list, wm_us: int):
        """(matured, kept): a session is safe to emit iff the
        watermark passed last + gap."""
        matured = [s for s in sessions if s[1] + gap_us < wm_us]
        kept = [s for s in sessions if s[1] + gap_us >= wm_us]
        return matured, kept

    def _flush(user, state, sessions):
        wm_us = state.getCurrentWatermarkMs() * 1000
        matured, kept = _split(sessions, wm_us)
        if kept:
            state.update((kept,))
            # fire when the earliest remaining session matures; the
            # timestamp must sit strictly past the current watermark
            nxt_ms = min(s[1] + gap_us for s in kept) // 1000 + 1
            state.setTimeoutTimestamp(max(nxt_ms,
                                          state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        if matured:
            yield _emit(user, matured)

    def fn(key, pdfs, state):
        user = key[0]
        if state.hasTimedOut:
            (sessions,) = state.get
            yield from _flush(user, state, [tuple(s) for s in sessions])
            return
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
        vals = rows["value"].to_numpy()

        # Interval-merge the batch's events WITH every stored session
        # atom. applyInPandasWithState delivers late-but-within-
        # watermark rows, so a batch may carry events OLDER than a
        # pending session — the atom merge attaches them exactly as a
        # global sort would (consecutive session gaps are <= gap, so
        # both sub-gaps of any interior insertion are too).
        items = [(int(t), int(t), 1,
                  0.0 if pd.isna(v) else float(v))
                 for t, v in zip(ts_us, vals)]
        if state.exists:
            (sessions,) = state.get
            items.extend(tuple(s) for s in sessions)
        items.sort(key=lambda x: (x[0], x[1]))
        merged = []
        cur = items[0]
        for it in items[1:]:
            if it[0] - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], it[1]),
                       cur[2] + it[2], cur[3] + it[3])
            else:
                merged.append(cur)
                cur = it
        merged.append(cur)
        yield from _flush(user, state, merged)

    return (
        events_stream
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
