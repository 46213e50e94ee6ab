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


def test_trends_live_equals_batch_on_closed_windows(spark, tmp_path):
    """Fixture replay differential (VERDICT r3 item 5): the sf0.001
    trades stream through the watermarked live view, captured per
    micro-batch via foreachBatch, must equal the batch ``trends()``
    result on every CLOSED window — and an injected too-late event must
    be absent from the stream's closed window while changing the batch
    result, proving the T5 semantic delta rather than documenting it."""
    import math

    from currency_market_pulse_spark.operators.trends import trends
    from currency_market_pulse_spark.sources.catalog import events_as_trades
    from currency_market_pulse_spark.streaming.trends_stream import trends_live
    from tests.conftest import SF_DIR

    trades = events_as_trades(spark, SF_DIR).select(
        "currency_from", "currency_to", "rate", "time_placed")
    fixture = trades.orderBy("time_placed").collect()
    assert len(fixture) > 100

    def row_json(r):
        return {"currency_from": r.currency_from,
                "currency_to": r.currency_to, "rate": r.rate,
                "time_placed": r.time_placed.isoformat()}

    # split mid-fixture; batch 1 establishes a watermark far past the
    # first window, batch 2 carries an extreme-valued event landing in
    # that first (long-closed) window
    mid = len(fixture) // 2
    late = {"currency_from": fixture[0].currency_from,
            "currency_to": "USD", "rate": 999.0,
            "time_placed": fixture[0].time_placed.isoformat()}
    src = tmp_path / "replay"
    src.mkdir()
    _write(src / "b1.json", [row_json(r) for r in fixture[:mid]])

    captured = []
    schema = ("currency_from string, currency_to string, rate double, "
              "time_placed timestamp")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (trends_live(stream, watermark="10 minutes")
         .writeStream
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .outputMode("append")
         .foreachBatch(lambda df, bid: captured.extend(df.collect()))
         .start())
    try:
        q.processAllAvailable()
        _write(src / "b2.json",
               [late] + [row_json(r) for r in fixture[mid:]])
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {(r.time_window, r.currency_from, r.currency_to): r
                for r in captured}
    assert len(streamed) == len(captured), "duplicate closed-window emission"
    assert len({k[0] for k in streamed}) >= 2, "need >=2 closed windows"

    # batch side through the REAL operator: trends() is single-pair like
    # the reference HTTP API, so run it per currency_from (currency_to
    # is constant 'USD' in the fixture mapping)
    pairs = [r.currency_from
             for r in trades.select("currency_from").distinct().collect()]
    batch = {}
    for cf in pairs:
        for r in trends(trades, currency_from=cf, currency_to="USD").collect():
            batch[(r.time_window, cf, "USD")] = r
    for key, s in streamed.items():
        b = batch[key]
        assert (s.min, s.max) == (b.min, b.max), key
        assert math.isclose(s.mean, b.mean, rel_tol=1e-9), key
    # every closed window the stream did NOT emit is within the final
    # watermark horizon (nothing silently lost)
    horizon = max(r.time_placed for r in fixture)
    import datetime as dt
    for key, b in batch.items():
        if key not in streamed:
            assert key[0] >= horizon - dt.timedelta(minutes=20), key

    # the late event's window: emitted WITHOUT the 999.0 contribution...
    late_key = (fixture[0].time_placed.replace(
        minute=fixture[0].time_placed.minute // 10 * 10,
        second=0, microsecond=0),
        fixture[0].currency_from, "USD")
    assert late_key in streamed
    assert streamed[late_key].max < 999.0
    # ...while a batch query over the same full input DOES include it —
    # the reference's batch semantics (SURVEY §4 T5 delta, proven)
    with_late = spark.createDataFrame(
        [(late["currency_from"], "USD", 999.0, fixture[0].time_placed)],
        schema)
    batch_late = {(r.time_window, late["currency_from"], "USD"): r
                  for r in trends(trades.unionAll(with_late),
                                  currency_from=late["currency_from"],
                                  currency_to="USD").collect()}
    assert batch_late[late_key].max == 999.0
