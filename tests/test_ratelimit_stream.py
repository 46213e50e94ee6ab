"""Stateful rate limiter: the pure fold math, plus the
applyInPandasWithState operator end-to-end on a real stream."""

from __future__ import annotations

import json
import time

from currency_market_pulse_spark.streaming.ratelimiter import (
    admit_fold, rate_limit_stream,
)


def test_admit_fold_matches_reference_semantics():
    # ratelimit.go with duration=1000ms limit=2
    recent, n, ok, retry = admit_fold([], 1000, 1000, 2)
    assert (n, ok, retry) == (1, True, None)
    recent, n, ok, retry = admit_fold(recent, 1100, 1000, 2)
    assert (n, ok, retry) == (2, True, None)
    recent, n, ok, retry = admit_fold(recent, 1200, 1000, 2)
    # 3rd within window: reject; retry = oldest(1000) + 1000 - 1200
    assert (n, ok, retry) == (3, False, 800)
    # window slides: at 2150 the ts=1000,1100 entries expire
    recent, n, ok, retry = admit_fold(recent, 2150, 1000, 2)
    assert (n, ok) == (2, True)


def test_admit_fold_boundary_inclusive():
    # entry exactly at now-window stays in the window (ZRemRangeByScore
    # removes strictly-older scores)
    recent, n, ok, _ = admit_fold([1000], 2000, 1000, 1)
    assert n == 2 and not ok


def test_rate_limit_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    events = (
        [{"user_id": "hot", "event_id": i, "ts_ms": 1000 + i * 10}
         for i in range(5)]
        + [{"user_id": "cold", "event_id": 100, "ts_ms": 1000}])
    with open(src / "f1.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    stream = (spark.readStream
              .schema("user_id string, event_id long, ts_ms long")
              .json(str(src)))
    out = rate_limit_stream(stream, window_ms=1000, limit=3)
    q = (out.writeStream.format("memory").queryName("rl_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("rl_out").count() >= 6:
                break
            time.sleep(0.5)
        rows = {r.event_id: r for r in spark.table("rl_out").collect()}
    finally:
        q.stop()

    assert len(rows) == 6
    # hot user: first 3 admitted, then rejected with reference retry-after
    assert [rows[i].admitted for i in range(5)] == [True] * 3 + [False] * 2
    assert rows[3].retry_after_ms == 1000 + 1000 - 1030
    assert rows[100].admitted  # cold user unaffected


def test_gateway_decisions_match_batch_replay(spark, tmp_path):
    """The payload-carrying gateway fold must produce the same
    (n_in_window, admitted, retry_after_ms) per event as the batch
    sliding-window replay operator — including state carried across
    micro-batches (maxFilesPerTrigger=1 splits the run)."""
    import datetime as dt

    from currency_market_pulse_spark.operators.sessions import (
        sliding_window_admission,
    )
    from currency_market_pulse_spark.streaming.ratelimiter import (
        rate_limit_gateway,
    )

    events = ([("hot", i, 1000 + i * 300) for i in range(6)]
              + [("cold", 100, 1500)])
    f1 = [e for e in events if e[1] < 3]
    f2 = [e for e in events if e[1] >= 3]
    src = tmp_path / "in"
    src.mkdir()
    for name, chunk in [("f1.json", f1), ("f2.json", f2)]:
        with open(src / name, "w") as f:
            for u, eid, ts in chunk:
                f.write(json.dumps({"user_id": u, "event_id": eid,
                                    "ts_ms": ts, "payload": f"p{eid}"})
                        + "\n")

    stream = (spark.readStream
              .schema("user_id string, event_id long, ts_ms long, "
                      "payload string")
              .option("maxFilesPerTrigger", "1").json(str(src)))
    q = (rate_limit_gateway(stream, window_ms=1000, limit=2)
         .writeStream.format("memory").queryName("gw_batch_cmp")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second")
         .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("gw_batch_cmp").count() >= len(events):
                break
            time.sleep(0.5)
        live = {r.event_id: (r.n_in_window, r.admitted, r.retry_after_ms,
                             r.payload)
                for r in spark.table("gw_batch_cmp").collect()}
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        [(u, eid, dt.datetime.utcfromtimestamp(ts / 1000.0))
         for u, eid, ts in events],
        "user_id string, event_id long, ts timestamp")
    batch = {r.event_id: (r.n_in_window, r.admitted, r.retry_after_ms)
             for r in sliding_window_admission(
                 batch_df, window_ms=1000, limit=2).collect()}

    assert set(live) == set(batch)
    for eid, b in batch.items():
        assert live[eid][:3] == b, eid
        assert live[eid][3] == f"p{eid}"   # payload carried through


def test_bucketed_gateway_equals_per_user_gateway(spark, tmp_path):
    """The cardinality-scale bucketed gateway (state keyed by
    hash(user)%buckets) makes IDENTICAL admission decisions to the
    per-user operator — same n_in_window, admitted, retry_after_ms,
    payload — across multi-batch streams with over-limit bursts,
    multiple users per bucket (buckets=2 forces collisions), and
    window slides."""
    import json as _json

    from pyspark.sql import functions as F

    from currency_market_pulse_spark.streaming.ratelimiter import (
        rate_limit_gateway, rate_limit_gateway_bucketed,
    )

    def mk_events():
        evs = []
        eid = 0
        # burst user exceeding limit, steady user, one-shot users
        for b in range(3):
            for i in range(5):
                evs.append({"user_id": "burst", "event_id": eid,
                            "ts_ms": 1000 + b * 700 + i * 10}); eid += 1
            evs.append({"user_id": "steady", "event_id": eid,
                        "ts_ms": 1000 + b * 700}); eid += 1
            evs.append({"user_id": f"once{b}", "event_id": eid,
                        "ts_ms": 1000 + b * 700}); eid += 1
        return evs

    def run(tag, fn):
        src = tmp_path / f"in_{tag}"
        src.mkdir()
        evs = mk_events()
        import os
        for b in range(3):                 # 3 micro-batches
            p = src / f"f{b}.json"
            with open(p, "w") as f:
                for e in evs[b * 7:(b + 1) * 7]:
                    f.write(_json.dumps(e | {"payload": "p" +
                            str(e["event_id"])}) + "\n")
            os.utime(p, (1_000_000 + b * 100,) * 2)
        stream = (spark.readStream
                  .schema("user_id string, event_id long, ts_ms long, "
                          "payload string")
                  .option("maxFilesPerTrigger", "1").json(str(src)))
        out = fn(stream)
        q = (out.writeStream.format("memory").queryName(f"bg_{tag}")
             .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
             .outputMode("append").start())
        try:
            import time as _t
            deadline = _t.time() + 90
            while _t.time() < deadline:
                if spark.table(f"bg_{tag}").count() >= 21:
                    break
                _t.sleep(0.5)
            return sorted(map(tuple, spark.table(f"bg_{tag}")
                              .collect()))
        finally:
            q.stop()

    per_user = run("user", lambda s: rate_limit_gateway(
        s, window_ms=1000, limit=3))
    bucketed = run("bkt", lambda s: rate_limit_gateway_bucketed(
        s, window_ms=1000, limit=3, buckets=2))
    assert len(per_user) == 21
    assert per_user == bucketed
    # the scenario actually exercised rejection + retry hints
    rejected = [r for r in per_user if not r[4]]
    assert rejected and all(r[5] is not None and r[5] > 0
                            for r in rejected)
