"""Semantic-delta tests for the ingest normalization chain (SURVEY §4):
micros truncation toward zero, div-by-zero -> NULL rate, uppercase-month
timestamp parsing, client-rate drop."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from currency_market_pulse_spark.functions.normalize import (
    INGEST_SCHEMA, normalize_trades,
)


def _raw(spark, **over):
    base = dict(
        userId="134256", currencyFrom="EUR", currencyTo="GBP",
        amountSell=1000.0, amountBuy=747.1, rate=0.7471,
        timePlaced="24-JAN-18 10:27:44", originatingCountry="FR",
    )
    base.update(over)
    return spark.createDataFrame([Row(**base)], schema=INGEST_SCHEMA)


def test_normalize_happy_path(spark):
    row = normalize_trades(_raw(spark)).collect()[0]
    assert row.user_id == "134256"
    assert row.currency_from == "EUR" and row.currency_to == "GBP"
    assert row.amount_sell_micros == 1_000_000_000
    assert row.amount_buy_micros == 747_100_000
    assert abs(row.rate - 0.7471) < 1e-12
    assert row.time_placed == dt.datetime(2018, 1, 24, 10, 27, 44)
    assert "rate" in row.asDict()  # derived rate present...
    # ...but equals buy/sell, NOT the client-supplied 0.7471-ish value
    assert row.rate == row.amount_buy_micros / row.amount_sell_micros


def test_micros_truncate_toward_zero(spark):
    # int64(x*1e6) truncates (api.go:83-85): 1.9999999 -> 1999999
    row = normalize_trades(_raw(spark, amountSell=1.9999999)).collect()[0]
    assert row.amount_sell_micros == 1_999_999


def test_div_by_zero_rate_is_null(spark):
    row = normalize_trades(_raw(spark, amountSell=0.0)).collect()[0]
    assert row.amount_sell_micros == 0
    assert row.rate is None  # engine choice: NULL, not Go's +Inf


def test_month_case_insensitive(spark):
    for m in ("12-AUG-24 11:23:45", "12-Aug-24 11:23:45", "12-aug-24 11:23:45"):
        row = normalize_trades(_raw(spark, timePlaced=m)).collect()[0]
        assert row.time_placed == dt.datetime(2024, 8, 12, 11, 23, 45), m


def test_malformed_timestamp_is_null(spark):
    row = normalize_trades(_raw(spark, timePlaced="2024-08-12T11:23:45Z")).collect()[0]
    assert row.time_placed is None
