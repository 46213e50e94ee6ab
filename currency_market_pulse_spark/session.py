"""SparkSession factory with the engine's scale-oriented defaults.

The same conf is used for local testing (local[N]) and would apply
unchanged on a multi-executor cluster: AQE handles runtime re-planning
(partition coalescing, skew-join splitting), shuffle partitions are
sized for the local core count but overridable via env, and the session
timezone is pinned to UTC to mirror the reference storage schema
(DateTime64(3,'UTC') — db/clickhouse/init.sql:12).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "currency-market-pulse-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Env overrides: SPARK_GRAFT_CPUS (local parallelism),
    SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    # local mode runs all "executors" inside the driver JVM, whose Spark
    # default heap is 1g — 32 concurrent tasks' aggregation state OOMs
    # there long before the machine (measured: lineitem_profile's exact
    # NDV sets at sf1).  Only effective at JVM launch; a pre-existing
    # session keeps its heap.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing + skew-join mitigation — the
        # 100 TB posture depends on it (skewed currency pairs / user ids).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dimension tables (region/nation/currency) are tiny; broadcast
        # them rather than shuffling the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Some fixture rounds store events.ts as TIMESTAMP(NANOS);
        # Spark has no ns timestamp — read as long and convert in the
        # catalog layer (sources/catalog.py, which also handles the
        # us-precision encodings later rounds generate).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for every pandas_udf / applyInPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
