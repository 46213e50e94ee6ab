"""The reference's one analytical query, Spark-first.

Reference SQL (trends/listing/service.go:47-62):

    SELECT toStartOfInterval(toDateTime(t.time_placed), INTERVAL 10 minute) AS time_window,
           min(t.rate), max(t.rate), avg(t.rate), median(t.rate)
    FROM cmp.trades t
    WHERE t.time_placed >= ? AND t.time_placed <= ?
      AND t.currency_from = ? AND t.currency_to = ?
    GROUP BY time_window ORDER BY time_window

Semantics pinned (SURVEY.md §4):
- both time bounds INCLUSIVE (service.go:55-56)
- tumbling 10-minute windows assigned by flooring event time
- median is EXACT (Spark ``median`` == DuckDB ``median``; ClickHouse's
  approximate quantile is an implementation detail, not a semantic)
- rate NULL on division by zero (Spark/SQL behavior; Go produced ±Inf)

Physical plan at scale: parquet scan with the pair-equality and
time-range predicates pushed down (PushedFilters) and columns pruned to
(time_placed, rate, currency_from, currency_to); partial HashAggregate
map-side; one shuffle on the window bucket; final HashAggregate; sort.
With date-partitioned storage the time filter also prunes partitions, so
the scan cost is proportional to the queried range, mirroring the
reference's MergeTree primary-index range scan (init.sql:15).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: aggregate spec shared by trends() and its tests: output column name ->
#: aggregate expression over ``rate``.
AGGS = ("min", "max", "mean", "median")


def tumbling_window(ts: Column, width: str = "10 minutes") -> Column:
    """Floor an event-time column to the start of its tumbling window.

    Equivalent to ClickHouse toStartOfInterval (listing/service.go:49).
    ``window(...).start`` keeps the plan in native Catalyst expressions
    (whole-stage codegen; no UDF).
    """
    return F.window(ts, width).start


def trends(trades: DataFrame,
           date_from=None, date_to=None,
           currency_from: str | None = None,
           currency_to: str | None = None,
           window_width: str = "10 minutes",
           value_col: str = "rate",
           time_col: str = "time_placed",
           ordered: bool = True) -> DataFrame:
    """Windowed min/max/mean/median of ``value_col`` per tumbling window.

    All filters optional (None skips them), matching the reference API
    where all four params are required at the HTTP layer
    (trends/http/rest/api.go:43-62) but the engine core is generic.

    ``ordered=False`` skips the final ORDER BY time_window: the sort is
    presentation (the reference SQL orders for its HTTP response — the
    aggregate itself is order-free), and it costs a full extra exchange
    (rangepartitioning) + Sort of the result relation — at 100 TB of
    windows a real shuffle, at bench scale an extra 2 jobs (range-sample
    + sort).  The HTTP-facing path (api.py) keeps the reference's
    ordered contract; order-insensitive consumers (the driver's hash
    gate sorts rows before comparing) skip it.  r17 optimization guide
    §2.4: "an orderBy used only to make output deterministic".
    """
    df = trades
    if date_from is not None:
        df = df.filter(F.col(time_col) >= F.lit(date_from))
    if date_to is not None:
        df = df.filter(F.col(time_col) <= F.lit(date_to))
    # Partition-predicate derivation: the sink layout partitions by
    # trade_date (streaming/importer.py) but queries filter the
    # fine-grained time_placed — Catalyst cannot infer the implied
    # date bounds on its own, and without them a time-range query scans
    # EVERY date partition.  Deriving them here is what makes the scan
    # cost proportional to the queried range at 100 TB
    # (tests/test_storage_pushdown.py asserts the PartitionFilters).
    if "trade_date" in df.columns:
        if date_from is not None:
            df = df.filter(F.col("trade_date") >= F.to_date(F.lit(date_from)))
        if date_to is not None:
            df = df.filter(F.col("trade_date") <= F.to_date(F.lit(date_to)))
    if currency_from is not None:
        df = df.filter(F.col("currency_from") == currency_from)
    if currency_to is not None:
        df = df.filter(F.col("currency_to") == currency_to)
    v = F.col(value_col)
    out = (
        df.groupBy(tumbling_window(F.col(time_col), window_width).alias("time_window"))
        .agg(
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.avg(v).alias("mean"),
            F.median(v).alias("median"),
        )
    )
    return out.orderBy("time_window") if ordered else out
