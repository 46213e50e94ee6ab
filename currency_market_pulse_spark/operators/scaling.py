"""Scale techniques as reusable operators: salted joins for skewed
keys, bucketed-table co-located joins.

AQE's skew-join splitting (on in session.py) handles most skew
transparently; ``salted_join`` is the explicit fallback for the cases
AQE can't fix (e.g. a single hot key inside one shuffle partition of a
non-sort-merge join, or aggregations).  Bucketing removes the shuffle
from recurring fact-fact joins entirely — the 100 TB answer for the
orders⨝lineitem spine that every TPC-H-shaped query pays for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameWriter, functions as F


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``key``.

    The skewed side gets a uniform random-ish salt derived from a
    sibling expression (hash of all columns) — deterministic, no rand()
    so retries/replays stay stable.  The other side is exploded
    n_salts times so every (key, salt) pair finds its match.  Shuffle
    load for a hot key drops by n_salts at the cost of duplicating the
    other side's matching rows n_salts times (cheap when `other` is the
    smaller/dimension side).
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in skewed.columns])) % n_salts)
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = left.join(right, [key, "_salt"], how)
    return joined.drop("_salt")


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16, sort_col: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by the join
    key.  Two tables bucketed identically on their join key sort-merge
    join with ZERO shuffle — the plan shows no Exchange above either
    scan (asserted in tests/test_scaling.py)."""
    w: DataFrameWriter = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def zorder_key(cols: list, bits: int = 8) -> "F.Column":
    """Morton / Z-order key: interleave the low ``bits`` bits of each
    (non-negative integer) column — bit b of dim i lands at position
    b * ndims + i.  Rows sorted or range-partitioned by this key
    cluster in ALL dims at once, so per-file min/max statistics prune
    multi-dimensional predicates — the data-layout move (Delta/Iceberg
    OPTIMIZE ZORDER) that single-column sorting can't provide at
    100 TB.  Pure bit arithmetic (whole-stage codegen, engine-portable
    — the DuckDB oracle replays it with >> & * literally).

    Callers bucket real values into the [0, 2^bits) range first (e.g.
    ``pmod``); at 16 dims x 8 bits the key still fits a long.
    """
    nc = len(cols)
    assert nc * bits <= 63, "z-key must fit a signed long"
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + bit * F.lit(1 << (b * nc + i)).cast("long")
    return key


def write_zordered(df: DataFrame, path: str, dims: list,
                   bits: int = 8, n_files: int = 8) -> None:
    """Write parquet laid out in z-order: range-partition + sort by the
    Morton key of ``dims`` so each output file covers a compact
    multi-dimensional region.  Parquet then stores per-file/row-group
    min/max for the ORIGINAL dim columns, and a predicate on ANY of
    them skips most files — the OPTIMIZE ZORDER move, expressed as
    plain repartitionByRange + sortWithinPartitions (both one shuffle
    total; the sort is file-local).  tests/test_scaling.py measures the
    skipping bound directly from the written footers."""
    z = df.withColumn("_z", zorder_key(dims, bits))
    (z.repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(path))
