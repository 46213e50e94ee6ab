"""Registry wiring ``queries()`` / ``oracle_sql()`` entries.

Each module under ``currency_market_pulse_spark.queries`` registers its
named pipelines with the @query decorator; ``__spark_entry__`` re-exports
the populated dicts.  A query without an oracle is allowed (driver
records a weaker rows-only check) but should be the exception.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco
