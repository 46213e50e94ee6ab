"""Compaction: many per-batch files -> few sorted files, same rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from currency_market_pulse_spark.streaming.compaction import (
    compact_date_partition, count_files, recover_partition,
)
from currency_market_pulse_spark.streaming.importer import ParquetTradesSink


def _batch(spark, i):
    return spark.createDataFrame([Row(
        user_id=str(i), currency_from="EUR", currency_to="GBP",
        amount_sell_micros=1_000_000, amount_buy_micros=2_000_000,
        rate=2.0, originating_country="FR",
        time_placed=dt.datetime(2024, 1, 1, 12, 0, i))])


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "sink")
    sink = ParquetTradesSink(out)
    for i in range(12):  # 12 micro-batches -> 12 batch dirs
        sink.write(_batch(spark, i), batch_id=i)
    before = count_files(out)
    assert before >= 12

    n = compact_date_partition(spark, out, "2024-01-01", target_files=2)
    assert n == 12
    after = count_files(out)
    assert after <= 3  # few large files now

    df = spark.read.parquet(out)
    assert df.count() == 12
    assert sorted(r.user_id for r in df.collect()) == sorted(str(i) for i in range(12))
    # sorted-by-time layout retained for row-group skipping
    rows = [r.time_placed for r in df.orderBy("time_placed").collect()]
    assert rows == sorted(rows)


def test_compaction_missing_partition_is_noop(spark, tmp_path):
    assert compact_date_partition(spark, str(tmp_path / "x"), "2024-01-01") == 0


def test_recompaction_after_late_replay_keeps_all_rows(spark, tmp_path):
    """The documented late-replay-then-recompact flow (ADVICE r1): the
    second compaction consumes the compacted dir + the late batch and
    must never lose the previously-compacted rows."""
    out = str(tmp_path / "sink")
    sink = ParquetTradesSink(out)
    for i in range(5):
        sink.write(_batch(spark, i), batch_id=i)
    assert compact_date_partition(spark, out, "2024-01-01") == 5
    sink.write(_batch(spark, 7), batch_id=7)  # late replay
    assert compact_date_partition(spark, out, "2024-01-01") == 6
    df = spark.read.parquet(out)
    assert sorted(r.user_id for r in df.collect()) == ["0", "1", "2", "3", "4", "7"]


def _crash_state_before_swap(spark, tmp_path):
    """Build the on-disk state of a crash BETWEEN the retire-rename and
    the tmp->final rename: manifest present, tmp present, old compacted
    dir renamed aside to _retired, final missing."""
    import json
    import os
    out = str(tmp_path / "sink")
    sink = ParquetTradesSink(out)
    for i in range(4):
        sink.write(_batch(spark, i), batch_id=i)
    assert compact_date_partition(spark, out, "2024-01-01") == 4
    sink.write(_batch(spark, 9), batch_id=9)
    part = os.path.join(out, "trade_date=2024-01-01")
    os.rename(os.path.join(part, "batch_id=-1"),
              os.path.join(out, "_retired_trade_date=2024-01-01"))
    os.makedirs(os.path.join(out, "_compacting_trade_date=2024-01-01"))
    with open(os.path.join(part, "_compaction_manifest"), "w") as f:
        json.dump({"consumed": ["batch_id=-1", "batch_id=9"]}, f)
    return out


def test_recovery_aborts_interrupted_swap_without_data_loss(spark, tmp_path):
    out = _crash_state_before_swap(spark, tmp_path)
    assert recover_partition(out, "2024-01-01") == "aborted"
    df = spark.read.parquet(out)
    assert sorted(r.user_id for r in df.collect()) == ["0", "1", "2", "3", "9"]


def test_compaction_self_recovers_from_interrupted_swap(spark, tmp_path):
    out = _crash_state_before_swap(spark, tmp_path)
    assert compact_date_partition(spark, out, "2024-01-01") == 5
    df = spark.read.parquet(out)
    assert sorted(r.user_id for r in df.collect()) == ["0", "1", "2", "3", "9"]


def test_recovery_completes_interrupted_cleanup(spark, tmp_path):
    """Crash AFTER the swap (manifest present, tmp gone): recovery must
    delete exactly the consumed dirs and keep later arrivals."""
    import json
    import os
    out = str(tmp_path / "sink")
    sink = ParquetTradesSink(out)
    for i in range(3):
        sink.write(_batch(spark, i), batch_id=i)
    assert compact_date_partition(spark, out, "2024-01-01") == 3
    part = os.path.join(out, "trade_date=2024-01-01")
    # pretend batch 0-2 dirs were consumed but cleanup crashed; batch 5
    # arrived after the crash and must survive
    sink.write(_batch(spark, 5), batch_id=5)
    with open(os.path.join(part, "_compaction_manifest"), "w") as f:
        json.dump({"consumed": ["batch_id=-1"]}, f)
    assert recover_partition(out, "2024-01-01") == "completed"
    df = spark.read.parquet(out)
    assert sorted(r.user_id for r in df.collect()) == ["0", "1", "2", "5"]
