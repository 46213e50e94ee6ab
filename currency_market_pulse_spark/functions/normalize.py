"""Ingest normalization: the reference's JSON->proto->storage transforms
(SURVEY.md §2.2 P1-P7) as reusable column expressions, usable unchanged
in batch parity tests and in the streaming ingest pipeline.

Reference behavior being reproduced:
- consumer/http/rest/api.go:61-65   timestamp parse "02-Jan-06 15:04:05"
                                    (Go layout) == "dd-MMM-yy HH:mm:ss"
- consumer/http/rest/api.go:83-85   money -> int64 micros, TRUNCATED
- consumer/http/rest/api.go:22,66-74  client `rate` accepted but DROPPED
- importer/importing/service.go:150 rate := buy_micros / sell_micros
  (engine guards /0 with NULL instead of Go's ±Inf — SURVEY §4.2)

Everything here is built-in Catalyst expressions — no UDFs — so the
whole chain stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

#: Ingest-side JSON schema (consumer/http/rest/api.go:16-25). The
#: client-supplied `rate` is bound but never forwarded (P6).
INGEST_SCHEMA = T.StructType([
    T.StructField("userId", T.StringType()),
    T.StructField("currencyFrom", T.StringType()),
    T.StructField("currencyTo", T.StringType()),
    T.StructField("amountSell", T.DoubleType()),
    T.StructField("amountBuy", T.DoubleType()),
    T.StructField("rate", T.DoubleType()),
    T.StructField("timePlaced", T.StringType()),
    T.StructField("originatingCountry", T.StringType()),
])

#: Storage schema (db/clickhouse/init.sql:3-15).
TRADES_SCHEMA = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("currency_from", T.StringType()),
    T.StructField("currency_to", T.StringType()),
    T.StructField("amount_sell_micros", T.LongType()),
    T.StructField("amount_buy_micros", T.LongType()),
    T.StructField("rate", T.DoubleType()),
    T.StructField("originating_country", T.StringType()),
    T.StructField("time_placed", T.TimestampType()),
])

#: Go layout "02-Jan-06 15:04:05" (api.go:61); README example shows the
#: month UPPERCASE ("12-AUG-24") which Go's time.Parse accepts
#: case-insensitively but JVM SimpleDateFormat-style patterns do not —
#: normalize case before parsing (SURVEY §4.6).
TIME_PLACED_FORMAT = "dd-MMM-yy HH:mm:ss"


def parse_time_placed(col: Column) -> Column:
    """Parse the reference's `timePlaced` string to a UTC timestamp;
    NULL on malformed input (the HTTP layer rejects those rows — P2)."""
    # "12-AUG-24 11:23:45" -> "12-Aug-24 11:23:45": the layout is fixed
    # width (dd-MMM-yy HH:mm:ss), so initcap just the month slice
    # (chars 4-6) and splice the string back together.
    month = F.initcap(F.lower(F.substring(col, 4, 3)))
    normalized = F.concat(F.substring(col, 1, 3), month, F.substring(col, 7, 2_000))
    # try_to_timestamp: NULL on malformed input instead of an ANSI-mode
    # error — the caller routes NULLs to a dead letter (reference: 400).
    return F.try_to_timestamp(normalized, F.lit(TIME_PLACED_FORMAT))


def money_to_micros(amount: Column) -> Column:
    """float64 amount -> int64 micros, truncating toward zero exactly as
    Go's int64(x*1e6) does (api.go:83-85).  cast(long) truncates; do NOT
    round (SURVEY §4.5)."""
    return (amount * 1_000_000).cast("long")


def derive_rate(buy_micros: Column, sell_micros: Column) -> Column:
    """rate = buy/sell as double; NULL when sell == 0 (engine decision
    SURVEY §4.2; Go emitted ±Inf/NaN, importing/service.go:150)."""
    return F.when(sell_micros != 0,
                  buy_micros.cast("double") / sell_micros.cast("double"))


#: Unresolved-Column memo, keyed by expression-list name and owning
#: SparkContext.  Unresolved Columns are immutable expression trees
#: reusable across DataFrames, but CONSTRUCTING them is py4j RPC —
#: measured 134 ms per normalize_trades chain, paid per micro-batch
#: inside every streaming foreachBatch (r12 import-leg decomposition).
#: The memo makes the build once-per-JVM; the context check rebuilds
#: after a Spark restart in the same python process (stale py4j refs).
_COL_MEMO: dict[str, tuple[object, list]] = {}


def _memo_cols(key: str, build) -> list:
    from pyspark import SparkContext
    sc = SparkContext._active_spark_context
    hit = _COL_MEMO.get(key)
    if hit is not None and hit[0] is sc:
        return hit[1]
    cols = build()
    if sc is not None:
        _COL_MEMO[key] = (sc, cols)
    return cols


def normalize_trades(raw: DataFrame) -> DataFrame:
    """Full ingest chain: raw JSON-shaped rows -> storage-shaped trades.

    Input columns = INGEST_SCHEMA (timePlaced as string). Malformed
    timestamps yield NULL time_placed; callers route them to a dead
    letter (the reference returns HTTP 400 — api.go:62-65).
    """
    def build():
        sell = money_to_micros(F.col("amountSell"))
        buy = money_to_micros(F.col("amountBuy"))
        return [
            F.col("userId").alias("user_id"),
            F.col("currencyFrom").alias("currency_from"),
            F.col("currencyTo").alias("currency_to"),
            sell.alias("amount_sell_micros"),
            buy.alias("amount_buy_micros"),
            derive_rate(buy, sell).alias("rate"),
            F.col("originatingCountry").alias("originating_country"),
            parse_time_placed(F.col("timePlaced")).alias("time_placed"),
            # client-supplied `rate` intentionally dropped (P6)
        ]

    return raw.select(*_memo_cols("normalize_trades", build))


def parse_ingest_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka/raw-bytes -> typed ingest rows (P1).  Corrupt records yield
    a NULL struct; kept so callers can route them (reference: HTTP 400)."""
    cols = _memo_cols(
        f"parse_ingest_json:{value_col}",
        lambda: [F.from_json(F.col(value_col).cast("string"),
                             INGEST_SCHEMA).alias("msg")])
    return df.select(*cols).select("msg.*")
