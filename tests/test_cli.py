"""CLI surface (C3, SURVEY §2.5): JSON page assembly for the trends
endpoint, the query runner, and RFC3339 offset handling — previously
only manually verified."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import Row

from currency_market_pulse_spark.__main__ import _parse_ts, main

from tests.conftest import SF_DIR


def test_parse_ts_converts_offsets_to_utc():
    assert _parse_ts("2024-01-01T00:00:00") == dt.datetime(2024, 1, 1)
    assert _parse_ts("2024-01-01T00:00:00Z") == dt.datetime(2024, 1, 1)
    # +05:00 must CONVERT, not just strip (ADVICE r1)
    assert _parse_ts("2024-01-01T05:00:00+05:00") == dt.datetime(2024, 1, 1)
    assert _parse_ts("2023-12-31T19:00:00-05:00") == dt.datetime(2024, 1, 1)


def _trades_parquet(spark, tmp_path) -> str:
    path = str(tmp_path / "trades")
    spark.createDataFrame([Row(
        user_id="u", currency_from="EUR", currency_to="GBP",
        amount_sell_micros=1_000_000, amount_buy_micros=2_000_000 + i,
        rate=2.0 + i / 1e6, originating_country="FR",
        time_placed=dt.datetime(2024, 1, 1, 12, i)) for i in range(3)]
    ).write.parquet(path)
    return path


def test_cli_trends_emits_json_page(spark, tmp_path, capsys):
    path = _trades_parquet(spark, tmp_path)
    rc = main(["trends", "--trades-path", path,
               "--from", "2024-01-01T12:00:00Z",
               "--to", "2024-01-01T13:00:00Z",
               "--cur-from", "EUR", "--cur-to", "GBP"], spark=spark)
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 1  # all three trades in one 10-min window
    page = lines[0]
    assert set(page) == {"window", "min", "max", "mean", "median"}
    assert page["window"] == "2024-01-01T12:00:00"
    assert page["min"] == 2.0 and page["max"] == 2.000002


def test_cli_query_runs_registered_entry(spark, capsys):
    rc = main(["query", "q1_pricing_summary", "--sf-dir", SF_DIR,
               "--limit", "3"], spark=spark)
    assert rc == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 3
    assert "l_returnflag" in rows[0]


def test_cli_query_unknown_name_fails_with_listing(spark, capsys):
    rc = main(["query", "no_such_query"], spark=spark)
    assert rc == 2
    assert "trends_10min" in capsys.readouterr().err
