"""Streaming trends view: windows close correctly under a watermark;
late data beyond the watermark is dropped (the documented delta vs the
reference's batch semantics)."""

from __future__ import annotations

import json
import time


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _trade(ts, rate=2.0):
    # pre-normalized trades stream shape (what streaming/ingest emits)
    return {"user_id": "u", "currency_from": "EUR", "currency_to": "USD",
            "amount_sell_micros": 1_000_000,
            "amount_buy_micros": int(rate * 1_000_000),
            "rate": rate, "originating_country": "FR", "time_placed": ts}


def test_trends_live_windows_and_late_drop(spark, tmp_path):
    from currency_market_pulse_spark.streaming.trends_stream import trends_live

    src = tmp_path / "in"
    src.mkdir()
    schema = ("user_id string, currency_from string, currency_to string, "
              "amount_sell_micros long, amount_buy_micros long, rate double, "
              "originating_country string, time_placed timestamp")
    _write(src / "f1.json", [
        _trade("2024-01-01T10:01:00Z", 1.0),
        _trade("2024-01-01T10:05:00Z", 3.0),
        _trade("2024-01-01T10:31:00Z", 5.0),  # advances watermark past 10:10
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    q = (trends_live(stream, watermark="10 minutes")
         .writeStream.format("memory").queryName("trends_live_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # a too-late event for the (closed) 10:00 window
        _write(src / "f2.json", [_trade("2024-01-01T10:02:00Z", 99.0),
                                 _trade("2024-01-01T10:55:00Z", 7.0)])
        q.processAllAvailable()
        rows = {(r.time_window.isoformat(), r.currency_from): r
                for r in spark.table("trends_live_out").collect()}
    finally:
        q.stop()

    w10 = rows[("2024-01-01T10:00:00", "EUR")]
    # closed 10:00 window holds ONLY the on-time rows; the rate=99 late
    # event was dropped by the watermark
    assert (w10.min, w10.max, w10.mean, w10.n_trades) == (1.0, 3.0, 2.0, 2)
