"""Vector primitives over ``array<float>`` embedding columns.

Two implementations of the same math:

- Catalyst higher-order functions (zip_with + aggregate): JVM-side,
  no Python boundary, used in the differential-tested queries.  The
  accumulation is sequential left-to-right in double precision, which
  matches DuckDB's list_dot_product fold order.
- numpy pandas_udf (Arrow-batched): the high-throughput path for
  brute-force top-k over wide candidate sets (BLAS matmul beats
  per-element codegen by a wide margin when k*dim is large).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


#: DuckDB oracle CTE: embeddings with the float list cast to DOUBLE[].
#: REQUIRED for bitwise parity — list_dot_product over FLOAT lists
#: accumulates in float32 (~1e-7 error vs our double fold); over
#: DOUBLE lists it matches our zip_with/aggregate exactly (verified).
ORACLE_EMB_CTE = (
    "emb AS (SELECT vec_id, label, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding "
    "FROM embeddings)"
)

ORACLE_COSINE_SQL = (
    "CASE WHEN sqrt(list_dot_product({a}, {a})) > 0 "
    "AND sqrt(list_dot_product({b}, {b})) > 0 "
    "THEN list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) END"
)


def oracle_cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of cosine().  ``a``/``b`` must be DOUBLE[] (use
    ORACLE_EMB_CTE) or the fold happens in float32 and diverges."""
    return ORACLE_COSINE_SQL.format(a=a, b=b)
