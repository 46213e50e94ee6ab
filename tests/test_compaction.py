"""Compaction: many per-batch files -> few sorted files, same rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from currency_market_pulse_spark.streaming.compaction import (
    compact_date_partition, count_files,
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
