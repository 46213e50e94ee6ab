"""Catalog layer: session-conf bootstrapping, ns->ms conversion
goldens, trades view derivation."""

from __future__ import annotations

import datetime as dt

from currency_market_pulse_spark.sources.catalog import (
    TABLES, ensure_session_confs, events_as_trades, load_table,
)
from tests.conftest import SF_DIR


def test_all_tables_load_with_declared_columns(spark):
    expected_cols = {
        "region": ["r_regionkey", "r_name"],
        "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
        "embeddings": ["vec_id", "embedding", "label"],
    }
    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        assert df.count() > 0, t
        if t in expected_cols:
            assert df.columns == expected_cols[t]


def test_events_ts_is_ms_precision_timestamp(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # every value must be exactly ms-aligned (floor of the stored ns)
    from pyspark.sql import functions as F
    sub_ms = ev.select(
        (F.unix_micros("ts") % 1000).alias("r")).filter("r != 0").count()
    assert sub_ms == 0


def test_events_ts_normalized_for_every_fixture_encoding(spark, tmp_path):
    """The driver has regenerated events.parquet with different physical
    ts encodings across rounds (TIMESTAMP(NANOS) in r1-r3, then
    TIMESTAMP(MICROS)/NTZ in r4).  load_table must yield the identical
    ms-floored TimestampType column for all of them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_706_520_535_383_915, 1_706_520_536_000_000]
    want = [dt.datetime(2024, 1, 29, 9, 28, 55, 383000),
            dt.datetime(2024, 1, 29, 9, 28, 56, 0)]
    base = {
        "event_id": [1, 2], "user_id": [10, 11],
        "event_type": ["a", "b"], "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }
    encodings = {
        "ns": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
        "us": pa.array(micros, pa.timestamp("us")),
        "us_utc": pa.array(micros, pa.timestamp("us", tz="UTC")),
    }
    for enc, arr in encodings.items():
        d = tmp_path / enc
        d.mkdir()
        pq.write_table(
            pa.table({**base, "ts": arr}),
            str(d / "events.parquet"),
            coerce_timestamps=None, allow_truncated_timestamps=False)
        ev = load_table(spark, str(d), "events")
        assert dict(ev.dtypes)["ts"] == "timestamp", enc
        got = [r.ts for r in ev.orderBy("event_id").collect()]
        assert got == want, enc


def test_ensure_session_confs_idempotent(spark):
    ensure_session_confs(spark)
    ensure_session_confs(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


def test_events_as_trades_derivation(spark):
    t = events_as_trades(spark, SF_DIR)
    row = t.filter(t.currency_from == "PUR").first()
    assert row.currency_to == "USD"
    assert row.rate is not None
    # rate == buy/sell exactly, micros truncated toward zero
    assert row.rate == row.amount_buy_micros / row.amount_sell_micros
    assert isinstance(row.time_placed, dt.datetime)
    assert row.originating_country.startswith("C")


def test_events_ts_pre1970_floors_toward_negative_infinity(spark, tmp_path):
    """ms-flooring must floor toward -infinity for NEGATIVE epochs too,
    matching DuckDB's epoch_ms — truncating `div` would round a
    pre-1970 instant UP to the next millisecond (ADVICE r4).  -1234.567
    ms floors to -1235 ms == 1969-12-31 23:59:58.765."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = -1_234_567
    want = dt.datetime(1969, 12, 31, 23, 59, 58, 765000)
    base = {
        "event_id": [1], "user_id": [10],
        "event_type": ["a"], "value": [1.0], "props": ["{}"],
    }
    encodings = {
        "ns": pa.array([micros * 1000], pa.timestamp("ns")),
        "us_utc": pa.array([micros], pa.timestamp("us", tz="UTC")),
    }
    for enc, arr in encodings.items():
        d = tmp_path / enc
        d.mkdir()
        pq.write_table(pa.table({**base, "ts": arr}),
                       str(d / "events.parquet"))
        ev = load_table(spark, str(d), "events")
        assert [r.ts for r in ev.collect()] == [want], enc
