"""currency_market_pulse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference system
``anton-kapralov/currency-market-pulse`` (a Go streaming market-data
pipeline: REST ingest -> Kafka -> micro-batched columnar OLAP store ->
one windowed analytical query), re-expressed Spark-first:

- batch query layer: DataFrame pipelines over partitioned Parquet
- ingest layer: JSON normalization (reference consumer/http/rest/api.go)
- streaming layer: micro-batch import pipeline + stateful rate limiter
  (reference importer/importing/service.go, consumer/ratelimit/ratelimit.go)
- serving layer: param-keyed TTL result cache (reference trends/listing/service.go)
- LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal columns — designed for 100 TB scale.

All relational execution is declared through the DataFrame API and
delegated to Catalyst/Tungsten; custom logic lives above the API
(no custom Catalyst rules needed — see SURVEY.md §4).
"""

from currency_market_pulse_spark.session import get_spark
from currency_market_pulse_spark.sources.catalog import load_table, TABLES

__all__ = ["get_spark", "load_table", "TABLES"]

__version__ = "0.1.0"
