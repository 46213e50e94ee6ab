"""Real-broker Kafka integration (SURVEY §2.1 S2/S3), gated: the
container has neither the spark-sql-kafka jar nor a broker, so these
tests run only when SPARK_KAFKA_TEST=1 (with KAFKA_BOOTSTRAP pointing
at a broker and the connector on the classpath — see
streaming/ingest.py:KAFKA_PACKAGE for the --packages coordinates).

What is still proven unconditionally (tests/test_wire.py,
test_streaming.py): the proto3 payload is byte-identical to the
reference's proto.Marshal, and the identical normalization/sink chain
runs end-to-end through the file-source twin.  This module closes the
last untested hop — the broker round-trip itself.

Reference: producer consumer/consuming/service.go:28-36, consumer
group importer/importing/service.go:74-88.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

import pytest
from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.functions.wire import from_trade_proto
from currency_market_pulse_spark.streaming.ingest import (
    kafka_connector_available,
)
from currency_market_pulse_spark.streaming.sinks import trades_to_kafka_payload

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_KAFKA_TEST") != "1",
    reason="Kafka integration gated: set SPARK_KAFKA_TEST=1 with a broker "
           "at $KAFKA_BOOTSTRAP and the spark-sql-kafka connector on the "
           "classpath (ingest.KAFKA_PACKAGE)")

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _trades(spark):
    return spark.createDataFrame([Row(
        user_id=f"u{i}", currency_from="EUR", currency_to="GBP",
        amount_sell_micros=1_000_000 + i, amount_buy_micros=2_000_000,
        rate=2.0, originating_country="FR",
        time_placed=dt.datetime(2024, 1, 1, 12, 0, i)) for i in range(5)])


def test_connector_present(spark):
    assert kafka_connector_available(spark), (
        "SPARK_KAFKA_TEST=1 but the Kafka connector is not on the "
        "classpath — launch with --packages " )


def test_kafka_roundtrip_proto_payload(spark):
    """Produce proto3 payloads to a fresh topic (batch Kafka sink),
    read them back (batch Kafka source), decode, compare values."""
    topic = f"cmp-test-{uuid.uuid4().hex[:8]}"
    src = _trades(spark)
    (trades_to_kafka_payload(src)
     .write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", topic)
     .save())
    raw = (spark.read.format("kafka")
           .option("kafka.bootstrap.servers", BOOTSTRAP)
           .option("subscribe", topic)
           .option("startingOffsets", "earliest")
           .load())
    decoded = from_trade_proto(raw, "value")
    rows = {r.user_id: r for r in decoded.collect()}
    assert set(rows) == {f"u{i}" for i in range(5)}
    assert rows["u3"].amount_sell_micros == 1_000_003
    assert rows["u3"].time_placed_ms == int(
        dt.datetime(2024, 1, 1, 12, 0, 3,
                    tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_kafka_stream_source_normalizes(spark, tmp_path):
    """readStream from the topic through the engine's normalization
    chain — the S3 consumer path — via availableNow + memory sink."""
    import json
    topic = f"cmp-test-{uuid.uuid4().hex[:8]}"
    msgs = [json.dumps({
        "userId": f"u{i}", "currencyFrom": "EUR", "currencyTo": "GBP",
        "amountSell": 1.5, "amountBuy": 3.0, "rate": 2.0,
        "timePlaced": "12-AUG-24 11:23:45", "originatingCountry": "FR",
    }) for i in range(3)]
    spark.createDataFrame([(m,) for m in msgs], "value string") \
        .selectExpr("CAST(value AS BINARY) AS value") \
        .write.format("kafka") \
        .option("kafka.bootstrap.servers", BOOTSTRAP) \
        .option("topic", topic).save()

    from currency_market_pulse_spark.streaming.ingest import read_trades_stream
    stream = read_trades_stream(spark, BOOTSTRAP, topic,
                                starting_offsets="earliest")
    q = (stream.writeStream.format("memory")
         .queryName("kafka_norm_test")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM kafka_norm_test")
    assert out.count() == 3
    [r] = out.filter(F.col("user_id") == "u1").collect()
    assert r.amount_sell_micros == 1_500_000
    assert r.rate == 2.0
