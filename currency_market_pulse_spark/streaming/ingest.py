"""Streaming ingest: the reference's consumer service re-expressed as a
Structured Streaming source stage.

Reference pipeline (consumer/http/rest/api.go:40-81 ->
consumer/consuming/service.go:28-36): HTTP JSON -> validate -> normalize
(micros, epoch-ms) -> protobuf -> Kafka topic 'currency-trades'.

Engine mapping: Kafka is the front door (the HTTP shim is out of engine
scope — SURVEY §2.1 S1).  ``read_trades_stream`` builds the Kafka
source when the connector is on the classpath; ``read_trades_files``
is the connector-free equivalent (file source, same schema, same
downstream semantics) used by tests and available for file-drop ingest.
Both feed the SAME normalization chain (functions/normalize.py) — the
transformation logic is source-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_market_pulse_spark.functions.normalize import (
    INGEST_SCHEMA, normalize_trades, parse_ingest_json,
)

KAFKA_TOPIC = "currency-trades"  # consumer/cmd/main.go:73

#: Maven coordinates of the Kafka connector matching this PySpark
#: build (Spark 4.x is Scala 2.13; version pinned to the installed
#: pyspark so the connector always matches the engine).  Not bundled
#: with pip pyspark — launch with:  spark-submit --packages $(python -c
#: 'from currency_market_pulse_spark.streaming.ingest import
#: KAFKA_PACKAGE; print(KAFKA_PACKAGE)') ...   or set
#: spark.jars.packages on the session builder.
#: tests/test_kafka_integration.py exercises the real broker path when
#: SPARK_KAFKA_TEST=1.
import pyspark as _pyspark

KAFKA_PACKAGE = (
    f"org.apache.spark:spark-sql-kafka-0-10_2.13:{_pyspark.__version__}")


def kafka_connector_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the JVM classpath
    (session-level check; cheap, no broker contact)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def read_trades_stream(spark: SparkSession,
                       bootstrap_servers: str,
                       topic: str = KAFKA_TOPIC,
                       starting_offsets: str = "latest") -> DataFrame:
    """Kafka -> normalized trades stream.

    startingOffsets='latest' mirrors OffsetNewest (importer/cmd/main.go:24).
    Requires the spark-sql-kafka connector on the classpath; raises a
    clear error otherwise (the test path uses read_trades_files).
    """
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", bootstrap_servers)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    return normalize_trades(parse_ingest_json(raw, "value"))


def read_trades_files(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 10) -> DataFrame:
    """File-source twin of read_trades_stream: JSON-lines files with the
    ingest schema (consumer/http/rest/api.go:16-25), same normalization."""
    raw = (spark.readStream
           .schema(INGEST_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .json(path))
    return normalize_trades(raw)


def enrich_with_dim(stream: DataFrame, dim: DataFrame,
                    on: str, how: str = "left") -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against
    the (broadcast) static dimension — Structured Streaming re-reads
    the static side per trigger, so a dim refresh (e.g. a re-written
    reference parquet) is picked up without restarting the query.  At
    100 TB of stream the dim side stays a broadcast hash join; never
    make the STREAM the build side."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, how)
