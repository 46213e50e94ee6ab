"""DuckDB differential-oracle helpers, shared by ``tools/selfcheck.py``
(the local stand-in for the driver's correctness gate) and
``tests/test_extra_queries.py`` (the gate for library-tier queries that
are deliberately kept out of the 50-entry driver registry).

Comparison contract mirrors the driver: row count, column-name set, and
order-insensitive values with rows sorted and columns sorted by name.
EXACT means bitwise-equal; APPROX (rtol 1e-9) diagnoses float
summation-order noise — fix by rounding both sides, don't ship it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.types as pat

from currency_market_pulse_spark.sources.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame, sort_cols: list[str] | None = None) -> pd.DataFrame:
    """Column-sort, dtype-normalize, then row-sort.  ``sort_cols`` limits
    the row sort to the given (key) columns — used by compare_bounded so
    approximate numeric cells can't scramble row alignment between the
    Spark and oracle frames (ADVICE r3 item 1)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                # tz-aware (parquet instant read by DuckDB as
                # TIMESTAMPTZ) -> naive UTC, matching Spark's toPandas
                # under the UTC session: same instants compare equal
                # regardless of which physical annotation the file used
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    keys = sort_cols if sort_cols else list(df.columns)
    return df.sort_values(keys, kind="mergesort").reset_index(drop=True)


def dtype_traps(schema: pa.Schema) -> list[str]:
    """Columns whose oracle dtype the driver hashes differently from
    Spark even when the values are equal.  DuckDB sum() over integers
    returns HUGEINT (arrow decimal128(38,0)); uint64 is equally
    un-Spark-able.  Pandas silently coerces both to float/object, which
    is why the round-1 selfcheck said EXACT where the driver's
    dtype-aware hash failed — fail loudly here instead."""
    bad = []
    for field in schema:
        t = field.type
        if pat.is_decimal(t) or t == pa.uint64() or t == pa.uint32():
            bad.append(f"{field.name}:{t}")
    return bad


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


def compare_bounded(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                    rtol: float) -> str:
    """Row-count + schema must match exactly; every numeric cell must
    satisfy |spark - oracle| <= rtol * max(1, |oracle|).  The gate for
    sketch estimators (HLL) whose values are engine-specific by design
    but carry a published error bound."""
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWCOUNT {len(spark_pdf)} vs {len(oracle_pdf)}"
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    # Align rows on the non-rtol-gated key columns only: every numeric
    # cell (HLL estimates are int64) is engine-specific by design, so
    # sorting on one could pair Spark row i with oracle row j and fail
    # spuriously even with every value inside the bound.
    def _is_numeric(s: pd.Series) -> bool:
        return pd.api.types.is_numeric_dtype(s)
    key_cols = sorted(
        c for c in spark_pdf.columns
        if not _is_numeric(spark_pdf[c]) and not _is_numeric(oracle_pdf[c]))
    a = canon(spark_pdf, sort_cols=key_cols or None)
    b = canon(oracle_pdf, sort_cols=key_cols or None)
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            try:
                fx, fy = float(x), float(y)
            except (TypeError, ValueError):
                if not (x == y or str(x) == str(y)):
                    return f"VALUE col={c} row={i}: {x!r} vs {y!r}"
                continue
            if abs(fx - fy) > rtol * max(1.0, abs(fy)):
                return (f"BOUND col={c} row={i}: {x!r} vs {y!r} "
                        f"(rel err {abs(fx - fy) / max(1.0, abs(fy)):.4f} "
                        f"> rtol {rtol})")
    return "WITHIN-BOUND"


def check_within_bound(spark, con: duckdb.DuckDBPyConnection,
                       fn, sql: str, sf_dir: str,
                       rtol: float) -> tuple[str, int]:
    """Bounded variant of check_against_oracle (see compare_bounded)."""
    sdf = fn(spark, sf_dir).toPandas()
    odf = con.execute(sql).arrow().to_pandas(date_as_object=False)
    return compare_bounded(sdf, odf, rtol), len(sdf)


def check_against_oracle(spark, con: duckdb.DuckDBPyConnection,
                         fn, sql: str, sf_dir: str) -> tuple[str, int]:
    """Run one Spark query fn and its DuckDB oracle; return
    (verdict, spark_rows).  Verdict is EXACT/APPROX or a failure
    description (ROWCOUNT/SCHEMA/VALUE/NULL-MISMATCH/DTYPE-TRAP)."""
    sdf = fn(spark, sf_dir).toPandas()
    otbl = con.execute(sql).arrow()
    traps = dtype_traps(otbl.schema)
    if traps:
        return (f"DTYPE-TRAP oracle returns {traps} (driver hash will "
                f"mismatch Spark int64/double — CAST in the oracle SQL)",
                len(sdf))
    odf = otbl.to_pandas(date_as_object=False)
    return compare(sdf, odf), len(sdf)
