"""Streaming sessionization: the batch gap-based sessionizer
(operators/sessions.py:sessionize) as a LIVE view via Spark's built-in
``session_window`` — the last streaming aggregation shape the engine
lacked (tumbling windows: trends_stream; custom per-key state: the
rate limiter; standing index: neardup_stream).

Semantics parity: ``session_window(ts, gap)`` merges events within
``gap`` of each other per key and emits a window of
[first_ts, last_ts + gap) — so (session_start, session_end_of_events,
n_events) matches the batch operator's lag-based runs exactly
(session_end here = max event ts, computed as an explicit max, NOT the
window end, which includes the open gap).  Like the trends view, the
live variant needs a WATERMARK to bound state: a session closes (and
emits, in append mode) only when the watermark passes its end + gap —
and events later than the watermark are dropped, the same documented
T5 delta the trends view carries vs batch replay.

At 100 TB: state per key is the OPEN sessions only (merged eagerly by
the engine); the watermark evicts closed ones; the shuffle key is the
user — the same partitioning the batch twin uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessions_live(events_stream: DataFrame, gap_minutes: int = 30,
                  watermark: str = "30 minutes",
                  user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """(user_id, session_start_ms, session_end_ms, n_events) for every
    CLOSED session of the stream."""
    gap = f"{gap_minutes} minutes"
    return (events_stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col),
                     F.session_window(F.col(ts_col), gap))
            .agg(F.min(F.unix_millis(F.col(ts_col)))
                 .alias("session_start_ms"),
                 F.max(F.unix_millis(F.col(ts_col)))
                 .alias("session_end_ms"),
                 F.count(F.lit(1)).alias("n_events"))
            .select(user_col, "session_start_ms", "session_end_ms",
                    "n_events"))
