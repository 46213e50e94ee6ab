"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` declares
one named DataFrame pipeline per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.

Column names are aliased identically on both sides (the driver sorts
columns by name before hashing).  Double-typed aggregates whose value
depends on floating-point summation order (sum/avg/stddev/median over
many rows) are rounded to a safe number of decimals ON BOTH SIDES so
bitwise comparison is deterministic; min/max/counts stay exact.

ROW ORDER: every declared query's result is an UNORDERED row set.  The
driver's gate canonicalizes rows (sorts them) before hashing — a
property this engine has relied on since round 1 (``dedup_exact``'s
Spark group order is nondeterministic and cannot coincide with
DuckDB's, yet it has hash-matched every round) and relies on
deliberately since round 17, when presentation-only terminal ORDER BYs
were removed engine-side (guide §2.4: an Exchange(range)+Sort per
query, purely cosmetic).  Oracle SQL strings may keep their ORDER BY —
harmless under a sorting gate.  Top-k semantics (orderBy + limit) are
NOT presentation and are kept.  If a future driver compared ordered
output, the removed sorts would need restoring — they change
presentation, never the row set.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module from any working directory; make the
# sibling package importable regardless
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from currency_market_pulse_spark.queries import QUERIES, ORACLES
from currency_market_pulse_spark.operators.trends import trends
from currency_market_pulse_spark.sources.catalog import events_as_trades


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's trends aggregation (10-minute tumbling
    min/max/mean/median of rate for one currency pair over a closed time
    range — trends/listing/service.go:47-62) on sf0.001."""
    trades = events_as_trades(spark, "/root/testdata/sf0.001")
    return trends(
        trades,
        date_from="2024-01-01 00:00:00", date_to="2024-01-31 00:00:00",
        currency_from="PUR", currency_to="USD",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
