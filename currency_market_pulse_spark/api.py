"""Engine facade: the reference's three services as one Python API.

- ``PulseEngine.trends(...)`` = GET /api/trends
  (trends/http/rest/api.go:40-66 + listing/service.go:34-76): validated
  params -> cached windowed aggregation over the trades table.
- ``ingest_batch(...)`` = the consumer's normalize path for batch
  backfills.
- streaming entry points live in streaming/ (importer, ratelimiter).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Row, SparkSession

from currency_market_pulse_spark.functions.normalize import normalize_trades
from currency_market_pulse_spark.operators.trends import trends as trends_df
from currency_market_pulse_spark.plans.cache import ResultCache
from currency_market_pulse_spark.sources.catalog import ensure_session_confs


class PulseEngine:
    def __init__(self, spark: SparkSession, trades: DataFrame,
                 cache_ttl_s: float = 60.0):
        ensure_session_confs(spark)
        self.spark = spark
        self.trades = trades
        self.cache = ResultCache(ttl_s=cache_ttl_s)

    def trends(self, date_from: dt.datetime, date_to: dt.datetime,
               currency_from: str, currency_to: str) -> list[Row]:
        """The reference query, cached.  All four params required
        (trends/http/rest/api.go:43-52); returns collected Statistic
        rows (window, min, max, mean, median)."""
        for name, v in (("date_from", date_from), ("date_to", date_to),
                        ("currency_from", currency_from),
                        ("currency_to", currency_to)):
            if v is None:
                raise ValueError(f"missing required parameter: {name}")
        key = ResultCache.key(
            int(date_from.timestamp() * 1000), int(date_to.timestamp() * 1000),
            currency_from, currency_to)  # service.go:83 key shape
        return self.cache.get_or_compute(
            key,
            lambda: trends_df(self.trades, date_from, date_to,
                              currency_from, currency_to).collect())

    def ingest_batch(self, raw: DataFrame) -> DataFrame:
        """Batch ingest normalization (consumer path, P1-P7)."""
        return normalize_trades(raw)
