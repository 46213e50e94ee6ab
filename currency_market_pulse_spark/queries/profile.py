"""Table-profiling query (operators/profile.py) over ``lineitem`` —
the widest fixture — with a per-column UNION ALL DuckDB twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_market_pulse_spark.operators.profile import profile_columns
from currency_market_pulse_spark.queries.registry import extra_query
from currency_market_pulse_spark.sources.catalog import load_table

_NUMERIC = ["l_quantity", "l_extendedprice", "l_discount"]
_STRING = ["l_returnflag", "l_linestatus"]


def _col_profile_sql(c: str, numeric: bool) -> str:
    min_num = f"round(CAST(min({c}) AS DOUBLE), 6)" if numeric else \
        "CAST(NULL AS DOUBLE)"
    max_num = f"round(CAST(max({c}) AS DOUBLE), 6)" if numeric else \
        "CAST(NULL AS DOUBLE)"
    min_str = f"CAST(min({c}) AS VARCHAR)" if not numeric else \
        "CAST(NULL AS VARCHAR)"
    max_str = f"CAST(max({c}) AS VARCHAR)" if not numeric else \
        "CAST(NULL AS VARCHAR)"
    return f"""
SELECT '{c}' AS col_name,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       {min_num} AS min_num, {max_num} AS max_num,
       {min_str} AS min_str, {max_str} AS max_str
FROM lineitem"""


_PROFILE_ORACLE = (
    " UNION ALL ".join([_col_profile_sql(c, True) for c in _NUMERIC]
                       + [_col_profile_sql(c, False) for c in _STRING])
    + " ORDER BY col_name")


@extra_query("lineitem_profile", oracle=_PROFILE_ORACLE)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for lineitem in ONE scan
    (nulls, exact NDV, typed min/max) — the planner/data-quality
    readout a 100 TB table can't afford to compute per-column.  Exact
    NDV variant: bitwise-gateable, memory ∝ per-column NDV (the
    approx twin below is the scale deployment)."""
    return profile_columns(load_table(spark, sf_dir, "lineitem"),
                           _NUMERIC, _STRING)


@extra_query(
    "lineitem_profile_approx",
    oracle=_PROFILE_ORACLE,
    # HLL++ at rsd=0.01 has ~1% standard error on n_distinct; every
    # other cell is exact, so the 5% bound is pure headroom (same
    # convention as approx_distinct_users)
    rtol=0.05,
)
def lineitem_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiler: identical single-scan plan with HLL++
    sketches for NDV — constant aggregation state per column per task
    regardless of cardinality (exact NDV sets OOM at high-cardinality
    columns; measured at sf1).  Gated against the EXACT oracle with an
    error bound, so the sketch's accuracy is itself regression-tested."""
    return profile_columns(load_table(spark, sf_dir, "lineitem"),
                           _NUMERIC, _STRING, approx_ndv=True)
