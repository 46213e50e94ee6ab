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

# Second tier: library-grade queries kept OUT of the driver-visible
# registry.  The driver's correctness gate checks the first 50
# registered entries, so the registry is capped at 50 distinct
# operators; near-duplicate variants live here instead and are held to
# the same differential standard by tests/test_extra_queries.py.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA_ORACLES: dict[str, str] = {}

#: Library-tier queries whose oracle is an ERROR BOUND, not an exact
#: twin: sketch estimators (HLL) are engine-specific by design, so the
#: differential gate asserts |spark - oracle| <= rtol * |oracle| on
#: every numeric cell instead of bitwise equality (rows/schema still
#: must match exactly).  Keyed by query name -> relative tolerance.
EXTRA_RTOL: dict[str, float] = {}

MAX_REGISTERED = 50


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        assert len(QUERIES) <= MAX_REGISTERED, (
            f"registry over {MAX_REGISTERED} entries ({name}) — the driver "
            f"only correctness-checks the first {MAX_REGISTERED}; demote a "
            f"redundant variant to @extra_query instead")
        return fn
    return deco


def extra_query(name: str, oracle: str | None = None,
                rtol: float | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        EXTRA_QUERIES[name] = fn
        if oracle is not None:
            EXTRA_ORACLES[name] = oracle
        if rtol is not None:
            assert oracle is not None, f"{name}: rtol requires an oracle"
            EXTRA_RTOL[name] = rtol
        return fn
    return deco
