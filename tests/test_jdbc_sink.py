"""JdbcSink exercised against a REAL JDBC database (embedded Derby,
which ships in Spark's jars/), proving the batch-id replay-dedup claim
(VERDICT r1 item 8): replaying a batch after a simulated crash between
sink write and checkpoint commit must not duplicate rows.

Derby is the stand-in for ClickHouse (reference storage target,
importer/importing/service.go:156-171); the sink logic is identical —
only url/driver/delete_sql differ.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from currency_market_pulse_spark.streaming.importer import JdbcSink


def _batch(spark, ids):
    return spark.createDataFrame([Row(
        user_id=str(i), currency_from="EUR", currency_to="GBP",
        amount_sell_micros=1_000_000 * (i + 1), amount_buy_micros=2_000_000,
        rate=2.0 / (i + 1), originating_country="FR",
        time_placed=dt.datetime(2024, 1, 1, 12, 0, i)) for i in ids])


@pytest.fixture
def sink(tmp_path):
    return JdbcSink(url=f"jdbc:derby:{tmp_path}/db;create=true",
                    table="trades",
                    driver="org.apache.derby.jdbc.EmbeddedDriver")


def _read(spark, sink):
    return (spark.read.format("jdbc")
            .option("url", sink.url).option("dbtable", sink.table)
            .option("driver", sink.driver).load())


def test_jdbc_replay_same_batch_is_idempotent(spark, sink):
    sink.write(_batch(spark, [0, 1, 2]), batch_id=0)
    sink.write(_batch(spark, [3, 4]), batch_id=1)
    # crash-replay: batch 0 re-delivered with the same id
    sink.write(_batch(spark, [0, 1, 2]), batch_id=0)
    out = _read(spark, sink)
    assert out.count() == 5
    assert sorted(r.user_id for r in out.collect()) == ["0", "1", "2", "3", "4"]
    assert set(r.batch_id for r in out.collect()) == {0, 1}


def test_jdbc_first_write_creates_table(spark, sink):
    # the pre-delete must tolerate the table not existing yet
    sink.write(_batch(spark, [7]), batch_id=3)
    out = _read(spark, sink)
    assert [r.user_id for r in out.collect()] == ["7"]


def test_jdbc_values_roundtrip(spark, sink):
    sink.write(_batch(spark, [1]), batch_id=0)
    [r] = _read(spark, sink).collect()
    assert r.amount_sell_micros == 2_000_000
    assert r.rate == 1.0
    assert r.time_placed == dt.datetime(2024, 1, 1, 12, 0, 1)
