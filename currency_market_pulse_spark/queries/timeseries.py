"""Market-data time-series queries beyond the reference's single
aggregation: OHLC candlesticks, gap-filled resampling, TF-IDF weighted
document similarity.  The natural next queries a user of the reference
would ask for — same scan/window machinery, richer outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from currency_market_pulse_spark.queries.registry import query
from currency_market_pulse_spark.sources.catalog import (
    ORACLE_TRADES_CTE, events_as_trades, load_table,
)


@query(
    "trades_ohlc",
    oracle=f"""
WITH {ORACLE_TRADES_CTE},
w AS (
  SELECT time_bucket(INTERVAL '30 minutes', time_placed) AS bar_start, rate,
         amount_sell_micros,
         row_number() OVER (PARTITION BY time_bucket(INTERVAL '30 minutes', time_placed)
                            ORDER BY time_placed, amount_sell_micros, rate) AS rn_open,
         row_number() OVER (PARTITION BY time_bucket(INTERVAL '30 minutes', time_placed)
                            ORDER BY time_placed DESC, amount_sell_micros DESC, rate DESC) AS rn_close
  FROM trades_n WHERE currency_from = 'PUR' AND rate IS NOT NULL)
SELECT bar_start,
       round(max(CASE WHEN rn_open = 1 THEN rate END), 6) AS open,
       round(max(rate), 6) AS high,
       round(min(rate), 6) AS low,
       round(max(CASE WHEN rn_close = 1 THEN rate END), 6) AS close,
       CAST(sum(amount_sell_micros) AS BIGINT) AS volume_micros,
       count(*) AS n_trades
FROM w GROUP BY bar_start ORDER BY bar_start
""",
)
def trades_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars (30-minute): open/close via deterministic
    first/last-in-window (composite tie-break), high/low/volume as
    plain aggregates.  One shuffle on the bar; the first/last rank and
    the aggregation share it."""
    t = (events_as_trades(spark, sf_dir)
         .filter((F.col("currency_from") == "PUR") & F.col("rate").isNotNull()))
    bar = F.window("time_placed", "30 minutes").start
    t = t.withColumn("bar_start", bar)
    asc = Window.partitionBy("bar_start").orderBy(
        "time_placed", "amount_sell_micros", "rate")
    desc = Window.partitionBy("bar_start").orderBy(
        F.desc("time_placed"), F.desc("amount_sell_micros"), F.desc("rate"))
    return (
        t.withColumn("rn_open", F.row_number().over(asc))
        .withColumn("rn_close", F.row_number().over(desc))
        .groupBy("bar_start")
        .agg(
            F.round(F.max(F.when(F.col("rn_open") == 1, F.col("rate"))), 6).alias("open"),
            F.round(F.max("rate"), 6).alias("high"),
            F.round(F.min("rate"), 6).alias("low"),
            F.round(F.max(F.when(F.col("rn_close") == 1, F.col("rate"))), 6).alias("close"),
            F.sum("amount_sell_micros").alias("volume_micros"),
            F.count("*").alias("n_trades"),
        )
        .orderBy("bar_start")
    )


@query(
    "trades_gapfill",
    oracle=f"""
WITH {ORACLE_TRADES_CTE},
bounds AS (
  SELECT min(time_bucket(INTERVAL '6 hours', time_placed)) AS lo,
         max(time_bucket(INTERVAL '6 hours', time_placed)) AS hi
  FROM trades_n WHERE currency_from = 'SIG'),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL '6 hours')) AS slot FROM bounds),
agg AS (
  SELECT time_bucket(INTERVAL '6 hours', time_placed) AS slot,
         count(*) AS n_trades, round(avg(rate), 6) AS mean_rate
  FROM trades_n WHERE currency_from = 'SIG' GROUP BY 1)
SELECT g.slot, coalesce(a.n_trades, 0) AS n_trades,
       a.mean_rate, a.n_trades IS NULL AS is_gap
FROM grid g LEFT JOIN agg a ON a.slot = g.slot
ORDER BY g.slot
""",
)
def trades_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled resampling: a dense 6-hour grid between the first and
    last observed slot, empty slots emitted with n_trades=0 — the
    downsampling step every charting/feature pipeline needs (absent
    windows otherwise silently disappear from groupBy output).  The
    grid generates from one min/max row — no driver loop."""
    t = events_as_trades(spark, sf_dir).filter(F.col("currency_from") == "SIG")
    slot = F.window("time_placed", "6 hours").start
    agg = (t.groupBy(slot.alias("slot"))
           .agg(F.count("*").alias("n_trades"),
                F.round(F.avg("rate"), 6).alias("mean_rate")))
    bounds = agg.agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))).alias("slot"))
    return (
        grid.join(agg, "slot", "left")
        .select("slot",
                F.coalesce("n_trades", F.lit(0)).alias("n_trades"),
                "mean_rate",
                F.col("n_trades").isNull().alias("is_gap"))
        .orderBy("slot")
    )


@query(
    "tfidf_top_terms",
    oracle=r"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf
       FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * ln((SELECT n_docs FROM n) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok)
SELECT doc_id, tok, tfidf, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY tfidf DESC, tok) AS rn FROM scored) x
WHERE rn <= 3 AND doc_id < 100
ORDER BY doc_id, rn
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency x inverse document frequency, top-3
    characteristic terms per document.  Two aggregations (tf, df) + a
    broadcast join of the (small) df table; ln() is IEEE-identical
    across engines for these magnitudes (rounded 6 regardless)."""
    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row join, NOT docs.count(): keeps the
    # whole pipeline lazy (no extra driver-side job per invocation)
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    toks = docs.select("doc_id", F.explode(
        F.split(F.lower("text"), r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (tf.join(F.broadcast(df_), "tok")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "tok",
                      F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
                              6).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") <= 3) & (F.col("doc_id") < 100))
            .select("doc_id", "tok", "tfidf", "rn")
            .orderBy("doc_id", "rn"))
