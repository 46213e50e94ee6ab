"""Flagship query semantics: window assignment, inclusive bounds, exact
median interpolation, pair filtering (SURVEY §2.3, §4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from currency_market_pulse_spark.operators.trends import trends
from tests.conftest import SF_DIR


def _trades(spark, rows):
    return spark.createDataFrame([
        Row(user_id="u", currency_from=cf, currency_to=ct, rate=r,
            time_placed=ts)
        for cf, ct, r, ts in rows
    ])


T0 = dt.datetime(2024, 8, 12, 11, 0, 0)


def test_window_boundaries_and_aggs(spark):
    rows = [
        ("EUR", "USD", 1.0, T0),                                  # 11:00 window
        ("EUR", "USD", 3.0, T0 + dt.timedelta(minutes=9, seconds=59)),
        ("EUR", "USD", 2.0, T0 + dt.timedelta(minutes=10)),        # next window
        ("EUR", "GBP", 99.0, T0),                                  # other pair
    ]
    out = trends(_trades(spark, rows), currency_from="EUR", currency_to="USD").collect()
    assert [r.time_window for r in out] == [T0, T0 + dt.timedelta(minutes=10)]
    w0 = out[0]
    assert (w0.min, w0.max, w0.mean, w0.median) == (1.0, 3.0, 2.0, 2.0)


def test_median_exact_interpolation(spark):
    # even count -> interpolated median (Spark median == DuckDB median),
    # NOT ClickHouse's sampled quantile
    rows = [("EUR", "USD", r, T0) for r in (1.0, 2.0, 10.0, 20.0)]
    out = trends(_trades(spark, rows)).collect()
    assert out[0].median == 6.0
    assert out[0].mean == 8.25


def test_bounds_inclusive_both_ends(spark):
    lo, hi = T0, T0 + dt.timedelta(hours=1)
    rows = [
        ("EUR", "USD", 1.0, lo - dt.timedelta(seconds=1)),  # out
        ("EUR", "USD", 2.0, lo),                             # in (inclusive)
        ("EUR", "USD", 3.0, hi),                             # in (inclusive)
        ("EUR", "USD", 4.0, hi + dt.timedelta(seconds=1)),  # out
    ]
    out = trends(_trades(spark, rows), date_from=lo, date_to=hi).collect()
    got = sorted(r.min for r in out)
    assert got == [2.0, 3.0]


def test_flagship_on_fixture(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["time_window", "min", "max", "mean", "median"]
