"""Kafka producer sink (SURVEY §2.1 S2): normalized trades -> proto3
payload -> topic ``currency-trades``.

Reference producer config (consumer/cmd/main.go:22-26): idempotent,
acks=all, max 1 in-flight, round-robin partitioner.  Structured
Streaming's Kafka sink with checkpointing gives the equivalent
guarantee (exactly-once-per-epoch produce; per-partition ordering).
Requires the spark-sql-kafka connector on the classpath — the engine
compiles the sink unconditionally and fails fast at .start() when the
connector is absent (tests cover payload construction, not the broker
hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from currency_market_pulse_spark.functions.wire import to_trade_proto
from currency_market_pulse_spark.streaming.ingest import KAFKA_TOPIC


def trades_to_kafka_payload(trades: DataFrame,
                            key_col: str = "user_id") -> DataFrame:
    """Normalized trades -> (key, value) rows for the Kafka sink.
    Key = user_id keeps a user's trades ordered within a partition;
    value = proto3 Trade bytes (functions/wire.py)."""
    with_value = to_trade_proto(trades, out_col="value")
    return with_value.select(
        F.col(key_col).cast("binary").alias("key"), F.col("value"))


def write_trades_to_kafka(trades_stream: DataFrame,
                          bootstrap_servers: str,
                          checkpoint_dir: str,
                          topic: str = KAFKA_TOPIC) -> StreamingQuery:
    """Start the producer query (acks=all is the Kafka sink default;
    idempotence comes from checkpointed epochs)."""
    payload = trades_to_kafka_payload(trades_stream)
    return (payload.writeStream
            .format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint_dir)
            .start())
