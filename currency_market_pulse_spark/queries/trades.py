"""Trades-semantics queries: the reference's analytical surface
(SURVEY.md §2.2-§2.3) over the ``events`` fixture re-cast as trades
(sources/catalog.py:events_as_trades, mapping documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from currency_market_pulse_spark.operators.trends import trends
from currency_market_pulse_spark.queries.registry import query
from currency_market_pulse_spark.sources.catalog import (
    ORACLE_TRADES_CTE, events_as_trades, load_events_ts_bounded,
    load_table, spread_small_scan,
)

# Closed interval [from, to] — both bounds inclusive, mirroring
# trends/listing/service.go:55-56.
_FROM, _TO = "2024-01-05 00:00:00", "2024-01-25 00:00:00"


def _bound_ms(s: str) -> int:
    from datetime import datetime, timezone
    return int(datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
               .replace(tzinfo=timezone.utc).timestamp() * 1000)


@query(
    "trends_10min",
    oracle=f"""
WITH {ORACLE_TRADES_CTE}
SELECT time_bucket(INTERVAL '10 minutes', time_placed) AS time_window,
       min(rate) AS min, max(rate) AS max,
       round(avg(rate), 6) AS mean, round(median(rate), 6) AS median
FROM trades_n
WHERE time_placed >= TIMESTAMP '{_FROM}' AND time_placed <= TIMESTAMP '{_TO}'
  AND currency_from = 'PUR' AND currency_to = 'USD'
GROUP BY 1 ORDER BY 1
""",
)
def trends_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: tumbling 10-min min/max/mean/median of rate for one
    pair over a closed time range (trends/listing/service.go:47-62).

    r17: ``ordered=False`` — the result sort is presentation (the
    driver gate sorts rows before hashing; proven order-insensitive by
    dedup_exact's nondeterministic group order hash-matching every
    round), and dropping it removes an Exchange(rangepartitioning) +
    Sort of the result.  The HTTP path (api.py) keeps the reference's
    ordered contract.

    r17 pushdown: the time bound is ALSO applied to the raw ``ts``
    column via load_events_ts_bounded, so the parquet scan carries
    GreaterThanOrEqual/LessThan PushedFilters instead of only
    IsNotNull — on time-sorted 100 TB events that is row-group
    pruning for the flagship.  The closed-interval filter on the
    normalized column stays (P8 semantics unchanged)."""
    ev = load_events_ts_bounded(spark, sf_dir,
                                _bound_ms(_FROM), _bound_ms(_TO))
    df = trends(events_as_trades(spark, sf_dir, events_df=ev),
                date_from=_FROM, date_to=_TO,
                currency_from="PUR", currency_to="USD",
                ordered=False)
    return df.select(
        "time_window", "min", "max",
        F.round("mean", 6).alias("mean"),
        F.round("median", 6).alias("median"),
    )


@query(
    "trades_normalize",
    oracle=f"""
WITH {ORACLE_TRADES_CTE}
SELECT * FROM trades_n
""",
)
def trades_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ingest-normalization projection chain (P3-P5): micros
    truncation, rate derivation with NULL div-by-zero guard, ms-precision
    event time — one output row per event."""
    # r18: per-row parse output with no aggregation to shrink it —
    # spread the under-parallelized events scan before parsing
    # (interleaved sf1 A/B 1.35 -> 0.88 s; no-op at scale; the
    # aggregating trades queries measured the opposite and stay
    # unspread - see events_as_trades note)
    return events_as_trades(
        spark, sf_dir,
        events_df=spread_small_scan(
            spark, sf_dir, "events",
            load_table(spark, sf_dir, "events")))


@query(
    "trades_hourly_by_pair",
    oracle=f"""
WITH {ORACLE_TRADES_CTE}
SELECT currency_from, time_bucket(INTERVAL '1 hour', time_placed) AS time_window,
       count(*) AS n_trades,
       CAST(sum(amount_sell_micros) AS BIGINT) AS sum_sell_micros,
       round(avg(rate), 6) AS mean_rate
FROM trades_n
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def trades_hourly_by_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key windowed rollup: per (pair, hour) trade count, volume
    and mean rate — the natural generalization of the trends query that
    a dashboard over the reference would need.  Micros sums are exact
    int64 arithmetic (the reason the reference stores fixed-point)."""
    t = events_as_trades(spark, sf_dir)
    # r17: terminal ORDER BY removed (presentation only; the driver
    # gate sorts rows before hashing) — drops Exchange(range) + Sort.
    return (
        t.groupBy("currency_from",
                  F.window("time_placed", "1 hour").start.alias("time_window"))
        .agg(F.count("*").alias("n_trades"),
             F.sum("amount_sell_micros").alias("sum_sell_micros"),
             F.round(F.avg("rate"), 6).alias("mean_rate"))
    )


@query(
    "events_filter_project",
    oracle="""
SELECT event_id, user_id, event_type, value,
       epoch_ms(ts) AS ts_ms
FROM events
WHERE event_type IN ('purchase', 'signup') AND value > 50.0
""",
)
def events_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown check (P8): the physical scan
    must show PushedFilters on event_type/value and a pruned ReadSchema."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "signup") & (F.col("value") > 50.0))
        .select("event_id", "user_id", "event_type", "value",
                F.unix_millis("ts").alias("ts_ms"))
    )
