"""Subquery shapes (correlated + uncorrelated) and deeper multi-join
TPC-H-style queries — exercising Catalyst's decorrelation and join
reordering."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from currency_market_pulse_spark.queries.registry import extra_query, query
from currency_market_pulse_spark.sources.catalog import load_table


def _view(spark, sf_dir, name):
    load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")


@query(
    "parts_above_brand_avg",
    oracle="""
SELECT p.p_partkey, p.p_brand, p.p_retailprice
FROM part p
WHERE p.p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                         WHERE p2.p_brand = p.p_brand)
ORDER BY p.p_partkey
""",
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (one pass over part, not one subquery per row)."""
    _view(spark, sf_dir, "part")
    # r17: terminal ORDER BY removed (presentation only; the oracle
    # keeps its ORDER BY harmlessly — the gate sorts rows)
    return spark.sql("""
        SELECT p.p_partkey, p.p_brand, p.p_retailprice
        FROM part_v p
        WHERE p.p_retailprice > (SELECT avg(p2.p_retailprice) FROM part_v p2
                                 WHERE p2.p_brand = p.p_brand)
    """)


@query(
    "orders_of_rich_customers",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
ORDER BY o_orderkey
""",
)
def orders_of_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (compiles to a semi join)."""
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "customer")
    # r17: terminal ORDER BY removed (presentation only)
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v
        WHERE o_custkey IN (SELECT c_custkey FROM customer_v
                            WHERE c_acctbal > 9000.0)
    """)


@extra_query(
    "lineitems_above_global_avg_qty",
    oracle="""
SELECT l_returnflag, count(*) AS n_above
FROM lineitem
WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def lineitems_above_global_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast as a
    literal into the scan filter)."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_returnflag, count(*) AS n_above
        FROM lineitem_v
        WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem_v)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """)


@query(
    "q5_nation_revenue",
    oracle="""
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name ORDER BY revenue DESC, n_name
""",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with a cyclic predicate
    (customer and supplier in the same nation).  Catalyst orders the
    joins; supplier/nation/region broadcast, the orders⨝lineitem spine
    co-shuffles on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        # r17: terminal ORDER BY removed (presentation only)
    )


@extra_query(
    "q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name, round(c.c_acctbal, 2)
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter -> joins -> top-k by
    aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name",
                 F.round("c_acctbal", 2).alias("c_acctbal"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
