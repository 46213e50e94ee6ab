"""Streaming exact dedup: duplicate trade messages across micro-batches
are dropped within the watermark horizon — the stream-side half of the
at-least-once -> effective-exactly-once story (SURVEY §2.4 T6: the
reference can deliver duplicates on replay; dedup makes them harmless).
"""

from __future__ import annotations

import json
import time


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    msg = {"user_id": "1", "trade_id": 7, "ts": "2024-01-01T10:00:00Z"}
    other = {"user_id": "2", "trade_id": 8, "ts": "2024-01-01T10:00:01Z"}
    _write(src / "f1.json", [msg, msg, other])  # duplicate inside a batch

    stream = (spark.readStream
              .schema("user_id string, trade_id long, ts timestamp")
              .json(str(src)))
    deduped = (stream
               .withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["user_id", "trade_id"]))
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        _write(src / "f2.json", [msg])  # replayed duplicate, next batch
        q.processAllAvailable()
        rows = spark.table("dedup_out").collect()
    finally:
        q.stop()

    assert sorted((r.user_id, r.trade_id) for r in rows) == [("1", 7), ("2", 8)]
