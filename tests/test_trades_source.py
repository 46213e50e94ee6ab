"""Custom Python Data Source (trades_gen): deterministic batch reads,
partition parallelism, streaming offsets, and composition with the
normalize chain."""

from __future__ import annotations

import pytest


@pytest.fixture()
def registered(spark):
    from currency_market_pulse_spark.sources.trades_source import (
        TradesGenDataSource,
    )

    try:
        spark.dataSource.register(TradesGenDataSource)
    except Exception as e:          # already registered in this session
        if "already" not in str(e).lower():
            raise
    return spark


def test_batch_read_deterministic_and_partitioned(registered):
    spark = registered
    df = (spark.read.format("trades_gen")
          .option("n", 500).option("parts", 7).load())
    assert df.rdd.getNumPartitions() == 7
    rows1 = sorted(map(tuple, df.collect()))
    rows2 = sorted(map(tuple, (spark.read.format("trades_gen")
                               .option("n", 500).load()).collect()))
    assert rows1 == rows2 and len(rows1) == 500
    # schema is the ingest shape the normalize chain consumes
    assert df.columns[0] == "userId" and df.columns[-1] == "originatingCountry"


def test_generated_rows_normalize_cleanly(registered):
    from pyspark.sql import functions as F

    from currency_market_pulse_spark.functions.normalize import (
        normalize_trades,
    )

    spark = registered
    raw = spark.read.format("trades_gen").option("n", 200).load()
    out = normalize_trades(raw)
    assert out.filter(F.col("time_placed").isNull()).count() == 0
    assert out.filter(F.col("amount_sell_micros") <= 0).count() == 0


def test_stream_reader_advances_offsets_and_matches_batch(
        registered, tmp_path):
    spark = registered
    stream = (spark.readStream.format("trades_gen")
              .option("rowsPerBatch", 50).load())
    q = (stream.writeStream.format("memory").queryName("gen_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second")
         .outputMode("append").start())
    try:
        import time
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("gen_out").count() >= 100:
                break
            time.sleep(0.5)
        got = sorted(map(tuple, spark.table("gen_out").collect()))
    finally:
        q.stop()
    n = len(got)
    assert n >= 100 and n % 50 == 0
    batch = sorted(map(tuple, (spark.read.format("trades_gen")
                               .option("n", n).load()).collect()))
    # the stream's prefix IS the batch source — same pure-function rows
    assert got == batch


def test_users_option_controls_key_cardinality(registered):
    """The ``users`` option sets user-id cardinality (VERDICT r12
    directive 1: stateful-op benchmarks need realistic key counts);
    default stays 50, and only userId changes — every other field is
    identical row-for-row across cardinalities."""
    spark = registered
    lo = (spark.read.format("trades_gen").option("n", 2000).load()
          .select("userId").distinct().count())
    assert lo == 50
    hi_df = (spark.read.format("trades_gen").option("n", 2000)
             .option("users", 100_000).load())
    hi = hi_df.select("userId").distinct().count()
    # 2000 md5-uniform draws from 100k: collisions possible but rare
    assert hi > 1900
    # non-key fields are unchanged by the cardinality knob
    base = (spark.read.format("trades_gen").option("n", 100).load()
            .drop("userId").collect())
    alt = (spark.read.format("trades_gen").option("n", 100)
           .option("users", 100_000).load().drop("userId").collect())
    assert sorted(map(tuple, base)) == sorted(map(tuple, alt))
