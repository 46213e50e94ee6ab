"""Storage-format breadth: the normalized trades table roundtrips
through parquet, ORC, CSV and JSON with identical values (the engine is
not parquet-only; ORC/CSV/JSON are built-in Spark sources)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from currency_market_pulse_spark.functions.normalize import TRADES_SCHEMA


def _trades(spark):
    rows = [Row(
        user_id=str(i), currency_from="EUR", currency_to="GBP",
        amount_sell_micros=1_000_000 * (i + 1),
        amount_buy_micros=747_100 * (i + 1),
        rate=0.7471, originating_country="FR",
        time_placed=dt.datetime(2024, 1, 1, 12, i, 0)) for i in range(5)]
    return spark.createDataFrame(rows, schema=TRADES_SCHEMA)


def _canon(df):
    return sorted((r.user_id, r.amount_sell_micros, r.rate,
                   r.time_placed) for r in df.collect())


def test_format_roundtrips(spark, tmp_path):
    src = _trades(spark)
    want = _canon(src)

    pq = str(tmp_path / "t.parquet")
    src.write.parquet(pq)
    assert _canon(spark.read.parquet(pq)) == want

    orc = str(tmp_path / "t.orc")
    src.write.orc(orc)
    assert _canon(spark.read.orc(orc)) == want

    csv = str(tmp_path / "t.csv")
    src.write.option("header", True).csv(csv)
    got = spark.read.schema(TRADES_SCHEMA).option("header", True).csv(csv)
    assert _canon(got) == want

    js = str(tmp_path / "t.json")
    src.write.json(js)
    got = spark.read.schema(TRADES_SCHEMA).json(js)
    assert _canon(got) == want
