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
