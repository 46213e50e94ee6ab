"""Second analytics wave: GROUPING SETS, exact percentiles, pivot /
unpivot, statistical aggregates, hopping windows, regexp extraction.
Rounds out the operator inventory beyond queries/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from currency_market_pulse_spark.queries.registry import extra_query, query
from currency_market_pulse_spark.sources.catalog import (
    ORACLE_TRADES_CTE, events_as_trades, load_table,
)

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube) through
    the SQL surface — the engine accepts SQL as well as DataFrames."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    # r17: terminal ORDER BY removed (presentation only)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "acctbal_percentiles",
    oracle="""
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
       round(quantile_cont(c_acctbal, 0.50), 6) AS p50,
       round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
       round(min(c_acctbal), 6) AS lo,
       round(max(c_acctbal), 6) AS hi
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont) — the distributed sort-based exact path; swap to
    approx_percentile sketches for interactive 100 TB scans."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.round(F.percentile("c_acctbal", 0.25), 6).alias("p25"),
             F.round(F.percentile("c_acctbal", 0.50), 6).alias("p50"),
             F.round(F.percentile("c_acctbal", 0.75), 6).alias("p75"),
             F.round(F.min("c_acctbal"), 6).alias("lo"),
             F.round(F.max("c_acctbal"), 6).alias("hi"))
        # r17: terminal ORDER BY removed (presentation only)
    )


@extra_query(
    "user_event_pivot",
    oracle=f"""
SELECT user_id,
       {', '.join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}"
                  for t in EVENT_TYPES)}
FROM events GROUP BY user_id ORDER BY user_id
""",
)
def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event type (fixed value list keeps the
    schema static — mandatory at scale; never let pivot scan for
    distinct values over 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .orderBy("user_id")
    )


@extra_query(
    "orders_unpivot",
    oracle="""
SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
FROM orders WHERE o_orderkey % 500 = 0
UNION ALL
SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
FROM orders WHERE o_orderkey % 500 = 0
ORDER BY o_orderkey, metric
""",
)
def orders_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide -> long."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    return (
        o.select("o_orderkey", F.col("o_totalprice").alias("totalprice"),
                 F.col("o_custkey").cast("double").alias("custkey"))
        .unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "value")
        .orderBy("o_orderkey", "metric")
    )


@extra_query(
    "nation_balance_stats",
    oracle="""
SELECT c_nationkey,
       round(stddev_samp(c_acctbal), 4) AS sd_acctbal,
       round(var_samp(c_acctbal), 4) AS var_acctbal,
       round(avg(c_acctbal), 6) AS mean_acctbal,
       count(*) AS n
FROM customer GROUP BY c_nationkey HAVING count(*) > 1 ORDER BY c_nationkey
""",
)
def nation_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_acctbal"),
             F.round(F.var_samp("c_acctbal"), 4).alias("var_acctbal"),
             F.round(F.avg("c_acctbal"), 6).alias("mean_acctbal"),
             F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy("c_nationkey")
    )


@extra_query(
    "trades_sliding_window",
    oracle=f"""
WITH {ORACLE_TRADES_CTE},
assigned AS (
  SELECT time_bucket(INTERVAL '5 minutes', time_placed) AS w, rate
  FROM trades_n WHERE currency_from = 'PUR'
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', time_placed) - INTERVAL '5 minutes' AS w, rate
  FROM trades_n WHERE currency_from = 'PUR')
SELECT w AS window_start, count(*) AS n_trades, round(avg(rate), 6) AS mean_rate
FROM assigned GROUP BY w ORDER BY w
""",
)
def trades_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window: 10-minute windows sliding every 5 (each event in
    exactly 2 windows).  window(ts, '10 minutes', '5 minutes') expands
    rows JVM-side; the oracle mirrors it with two shifted buckets."""
    t = events_as_trades(spark, sf_dir).filter(F.col("currency_from") == "PUR")
    return (
        t.groupBy(F.window("time_placed", "10 minutes", "5 minutes")
                  .start.alias("window_start"))
        .agg(F.count("*").alias("n_trades"),
             F.round(F.avg("rate"), 6).alias("mean_rate"))
        .orderBy("window_start")
    )


@query(
    "daily_rolling_active_users",
    oracle="""
WITH user_days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
days AS (SELECT DISTINCT d FROM user_days)
SELECT days.d AS day,
       (SELECT count(*) FROM user_days u WHERE u.d = days.d) AS dau,
       (SELECT count(DISTINCT u.user_id) FROM user_days u
        WHERE u.d > days.d - INTERVAL 7 DAY AND u.d <= days.d) AS wau
FROM days ORDER BY day
""",
)
def daily_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU.  Window functions can't COUNT DISTINCT,
    so WAU dedups to (user, day) and counts each user-day into the 7
    window days it contributes to — one exploded aggregate, shuffle
    volume |user-days| x 7, never raw events.

    r17 restructure (guide §2.4 — fewer passes): the previous shape
    (DAU aggregate + day-list x user_days range JOIN + a second
    countDistinct aggregate) re-evaluated user_days per consumer and
    paid a join whose output IS the explode below (each user-day
    matched exactly the 7 days it contributes to).  Now one pass:
    explode (u, d0) -> (u, d0, day in [d0, d0+6]), then a single
    groupBy(day) computes wau = countDistinct(u) and dau =
    countDistinct(u where d0 = day) together; days with dau = 0 are
    exactly the days that never occur in the data (the old inner day
    list), so the filter reproduces the day set.  Proven
    set-equal to the join form at sf0.1 and EXACT vs the unchanged
    oracle; measured min-of-5 interleaved 3.12 -> 1.97 s (loaded
    host), one shuffle+aggregate replacing distinct+join+aggregate."""
    ev = load_table(spark, sf_dir, "events")
    user_days = (ev.select("user_id",
                           F.date_trunc("day", "ts").alias("d"))
                 .distinct())
    contrib = user_days.select(
        "user_id", F.col("d").alias("d0"),
        F.explode(F.sequence(
            F.col("d"), F.col("d") + F.expr("INTERVAL 6 DAY"),
            F.expr("INTERVAL 1 DAY"))).alias("day"))
    return (contrib.groupBy("day")
            .agg(F.countDistinct("user_id").alias("wau"),
                 F.countDistinct(
                     F.when(F.col("d0") == F.col("day"),
                            F.col("user_id"))).alias("dau"))
            .filter(F.col("dau") > 0)
            .select("day", "dau", "wau"))


@extra_query(
    "events_weekly_heatmap",
    oracle="""
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
       CAST(hour(ts) AS INT) AS hod,
       count(*) AS n_events,
       round(avg(value), 6) AS mean_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_weekly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap.  Cross-engine trap
    pinned here: Spark dayofweek is 1-based Sunday=1, DuckDB's is
    0-based Sunday=0 — the oracle shifts by +1 to the Spark convention."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.dayofweek("ts").alias("dow"),
                   F.hour("ts").alias("hod"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("value"), 6).alias("mean_value"))
        .orderBy("dow", "hod")
    )


@query(
    "supplier_balance_zscore",
    oracle="""
SELECT s_suppkey, s_nationkey,
       round((s_acctbal - avg(s_acctbal) OVER w)
             / nullif(stddev_samp(s_acctbal) OVER w, 0), 4) AS balance_z
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey)
ORDER BY s_suppkey
""",
)
def supplier_balance_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group standardization via unbounded window aggregates
    (the feature-normalization primitive)."""
    s = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window
    w = Window.partitionBy("s_nationkey")
    sd = F.stddev_samp("s_acctbal").over(w)
    return (
        s.select("s_suppkey", "s_nationkey",
                 F.round((F.col("s_acctbal") - F.avg("s_acctbal").over(w))
                         / F.when(sd != 0, sd), 4).alias("balance_z"))
        # r17: terminal ORDER BY removed (presentation only)
    )


@extra_query(
    "part_regexp_extract",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_type, '^([a-z]+)', 1) AS type_first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
       CAST(strpos(p_name, 'a') AS INT) AS first_a_pos,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       trim(upper(p_brand)) AS brand_norm
FROM part WHERE p_partkey % 10 = 0 ORDER BY p_partkey
""",
)
def part_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar coverage: extract / global replace / position /
    padding."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([a-z]+)", 1).alias("type_first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.instr(F.col("p_name"), "a").alias("first_a_pos"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.upper("p_brand")).alias("brand_norm"),
    ).orderBy("p_partkey")


@extra_query(
    "approx_acctbal_percentiles",
    oracle="""
SELECT c_mktsegment,
       round(quantile_disc(c_acctbal, 0.25), 6) AS p25,
       round(quantile_disc(c_acctbal, 0.50), 6) AS p50,
       round(quantile_disc(c_acctbal, 0.75), 6) AS p75,
       count(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    # approx_percentile at accuracy=1000 has ~0.1% rank error; 5%
    # value tolerance is generous headroom on the acctbal distribution
    rtol=0.05,
)
def approx_acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch, accuracy=1000): the mergeable
    constant-memory percentile for interactive 100 TB scans — the
    second sketch estimator under the error-bound oracle gate
    (registry.EXTRA_RTOL; exact discrete quantiles bound the sketch,
    bitwise equality is the wrong gate for engine-specific sketches).
    Exact twin: acctbal_percentiles."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.round(F.approx_percentile("c_acctbal", 0.25, 1000), 6).alias("p25"),
             F.round(F.approx_percentile("c_acctbal", 0.50, 1000), 6).alias("p50"),
             F.round(F.approx_percentile("c_acctbal", 0.75, 1000), 6).alias("p75"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@extra_query(
    "events_retention_cohorts",
    oracle="""
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
coh AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id),
cs AS (SELECT cw, count(*) AS cohort_size FROM coh GROUP BY cw),
act AS (
  SELECT c.cw, u.w, count(DISTINCT u.user_id) AS n_active
  FROM uw u JOIN coh c USING (user_id) GROUP BY c.cw, u.w)
SELECT act.cw AS cohort_week,
       CAST(date_diff('day', CAST(act.cw AS DATE), CAST(act.w AS DATE))
            / 7 AS BIGINT) AS week_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       round(n_active / CAST(cohort_size AS DOUBLE), 6) AS retention
FROM act JOIN cs USING (cw)
ORDER BY cohort_week, week_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by their FIRST
    active week; for each (cohort, week-offset) cell the count and
    fraction of the cohort still active — the classic product-
    analytics triangle next to DAU/WAU and the funnel.  Two distinct
    aggregations over the (user, week) relation plus one small join;
    the cohort relation is user-sized, the output is weeks^2 cells.
    Week buckets via date_trunc (ISO Monday start on both engines);
    offsets are exact day differences div 7."""
    ev = load_table(spark, sf_dir, "events")
    uw = (ev.select("user_id", F.date_trunc("week", "ts").alias("w"))
          .distinct())
    coh = uw.groupBy("user_id").agg(F.min("w").alias("cw"))
    cs = coh.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (uw.join(coh, "user_id")
           .groupBy("cw", "w")
           .agg(F.countDistinct("user_id").alias("n_active")))
    return (act.join(cs, "cw")
            .select(F.col("cw").alias("cohort_week"),
                    (F.datediff(F.col("w"), F.col("cw")) / 7)
                    .cast("long").alias("week_offset"),
                    F.col("n_active").cast("long").alias("n_active"),
                    F.col("cohort_size").cast("long")
                    .alias("cohort_size"),
                    F.round(F.col("n_active")
                            / F.col("cohort_size").cast("double"), 6)
                    .alias("retention"))
            .orderBy("cohort_week", "week_offset"))
