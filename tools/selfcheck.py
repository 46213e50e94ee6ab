"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given SF,
runs the matching ``oracle_sql()`` through DuckDB over the same parquet
files, and compares: row count, column names, and values (rows sorted,
columns sorted by name).  Reports EXACT (bitwise, the standard to aim
for) and APPROX (rtol 1e-9, diagnosing float-summation-order noise —
fix by rounding both sides).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from currency_market_pulse_spark.session import get_spark
from currency_market_pulse_spark.sources.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b, exact: bool) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if exact:
            return fa == fb
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b or str(a) == str(b)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWCOUNT {len(spark_pdf)} vs {len(oracle_pdf)}"
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    a, b = canon(spark_pdf), canon(oracle_pdf)
    exact = True
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or str(x) in ("NaT", "None", "nan")
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or str(y) in ("NaT", "None", "nan")
            if xn or yn:
                if xn != yn:
                    return f"NULL-MISMATCH col={c} row={i}: {x!r} vs {y!r}"
                continue
            if not values_equal(x, y, exact=True):
                exact = False
                if not values_equal(x, y, exact=False):
                    return f"VALUE col={c} row={i}: {x!r} vs {y!r}"
    return "EXACT" if exact else "APPROX"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(shuffle_partitions=8)
    con = duck_con(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only  {name}: {len(sdf)} rows  ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        verdict = compare(sdf, odf)
        status = "ok   " if verdict in ("EXACT", "APPROX") else "FAIL "
        if verdict not in ("EXACT",):
            pass
        print(f"{status} {name}: {verdict}  rows={len(sdf)}  ({dt:.1f}s)")
        if verdict not in ("EXACT", "APPROX"):
            failures += 1
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
