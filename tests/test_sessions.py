"""Rate-limiter replay semantics vs the reference
(consumer/ratelimit/ratelimit.go:38-62) and sessionization edges."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from currency_market_pulse_spark.operators import sessions as S

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=T0 + dt.timedelta(milliseconds=ms))
         for i, (u, ms) in enumerate(rows)])


def test_admission_burst_then_reject(spark):
    # limit 3 in 1000 ms: 4th+5th requests inside the window are
    # rejected with retry_after = oldest_in_window + 1000 - now
    ev = _events(spark, [(1, 0), (1, 100), (1, 200), (1, 300), (1, 1500)])
    out = {r.event_id: r for r in
           S.sliding_window_admission(ev, window_ms=1000, limit=3,
                                      ).collect()}
    assert [out[i].admitted for i in range(5)] == [True, True, True, False, True]
    # rejected at t=300: oldest in window is t=0 -> retry 0+1000-300=700
    assert out[3].retry_after_ms == 700
    assert out[3].n_in_window == 4
    # t=1500: window [500,1500] holds only itself -> admitted
    assert out[4].n_in_window == 1


def test_admission_per_user_isolation(spark):
    ev = _events(spark, [(1, 0), (2, 0), (1, 10), (2, 10)])
    out = S.sliding_window_admission(ev, window_ms=1000, limit=1).collect()
    by_id = {r.event_id: r.admitted for r in out}
    # each user's first request admitted, second rejected (limit 1)
    assert by_id == {0: True, 1: True, 2: False, 3: False}


def test_noop_limiter(spark):
    # limit <= 0 disables limiting entirely (ratelimit.go:15-19 — T4)
    ev = _events(spark, [(1, 0), (1, 1), (1, 2)])
    out = S.sliding_window_admission(ev, window_ms=1000, limit=0).collect()
    assert all(r.admitted for r in out)
    assert all(r.retry_after_ms is None for r in out)


def test_sessionize_gap_splits(spark):
    ev = _events(spark, [
        (1, 0), (1, 60_000),           # session 1 (1 min apart)
        (1, 60_000 + 31 * 60_000),     # gap > 30 min -> session 2
        (2, 0),                        # other user -> own session
    ])
    out = S.sessionize(ev, gap_minutes=30).collect()
    sess = [(r.user_id, r.session_seq, r.n_events) for r in out]
    assert sess == [(1, 1, 2), (1, 2, 1), (2, 1, 1)]
