"""transformWithStateInPandas limiter variant — end-to-end run gated
on the protobuf package (Spark serializes TWS state through it; not in
this container).  The shared admission math is fully covered by
tests/test_ratelimit_stream.py either way."""

from __future__ import annotations

import json
import time

import pytest


def test_processor_constructs():
    from currency_market_pulse_spark.streaming.ratelimiter_tws import (
        RateLimiterProcessor,
    )
    p = RateLimiterProcessor(window_ms=1000, limit=3)
    assert p.window_ms == 1000 and p.limit == 3


def test_tws_stream_end_to_end(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    from currency_market_pulse_spark.streaming.ratelimiter_tws import (
        rate_limit_stream_tws,
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "f1.json", "w") as f:
        for i in range(5):
            f.write(json.dumps(
                {"user_id": "hot", "event_id": i, "ts_ms": 1000 + i * 10}) + "\n")
    stream = (spark.readStream
              .schema("user_id string, event_id long, ts_ms long")
              .json(str(src)))
    q = (rate_limit_stream_tws(stream, window_ms=1000, limit=3)
         .writeStream.format("memory").queryName("tws_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("tws_out").count() < 5:
            time.sleep(0.5)
        rows = {r.event_id: r.admitted for r in spark.table("tws_out").collect()}
    finally:
        q.stop()
    assert [rows[i] for i in range(5)] == [True] * 3 + [False] * 2
