"""Scale techniques: salted join equivalence + bucketed co-located
join eliminating the shuffle (plan-asserted)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.operators.scaling import (
    salted_join, write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left side: 900 rows of key=1, few others
    left = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(900)]
        + [Row(k=2, v=1), Row(k=3, v=2)])
    right = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="warm"), Row(k=4, name="unmatched")])
    plain = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.name)
              for r in salted_join(left, right, "k", n_salts=4).collect()}
    assert salted == plain and len(plain) == 901


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([Row(k=1, v=1), Row(k=9, v=2)])
    right = spark.createDataFrame([Row(k=1, name="x")])
    out = {(r.k, r.v, r.name)
           for r in salted_join(left, right, "k", n_salts=3, how="left").collect()}
    assert out == {(1, 1, "x"), (9, 2, None)}


def test_bucketed_join_has_no_shuffle(spark):
    # uses the default spark-warehouse dir (gitignored); static conf
    # spark.sql.warehouse.dir can't be changed on a live session
    from currency_market_pulse_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    import shutil
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"),
                   "orders_b", "k", n_buckets=4)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "k"),
                   "lineitem_b", "k", n_buckets=4)
    # force the sort-merge path (the tiny test tables would broadcast,
    # which proves nothing about bucketing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(spark.table("orders_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketing replaced the shuffle
        # and the join still computes the right thing
        n = joined.count()
        assert n == lineitem.count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_zorder_buckets_bound_both_dims(spark):
    """Top-4-bit z-buckets must span at most a quarter (64 values) of
    EACH 8-bit dimension — the multi-dim locality single-column sorting
    cannot give."""
    from currency_market_pulse_spark.queries.relational import (
        orders_zorder_locality,
    )
    from tests.conftest import SF_DIR

    rows = orders_zorder_locality(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.max_cust - r.min_cust <= 63, r
        assert r.max_day - r.min_day <= 63, r


def test_zorder_key_bit_exact(spark):
    """2-bit, 2-dim interleave spot check: (x=0b10, y=0b01) ->
    bits x0,y0,x1,y1 = 0,1,1,0 -> 0b0110 = 6."""
    from pyspark.sql import Row
    from currency_market_pulse_spark.operators.scaling import zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(x=2, y=1)])
    got = df.select(zorder_key([F.col("x"), F.col("y")], 2).alias("z")) \
        .collect()[0].z
    assert got == 6


def test_write_zordered_files_bound_both_dims(spark, tmp_path):
    """Files written by write_zordered must each cover a narrow range
    of BOTH z-dims — the physical file-skipping property (footer
    min/max per file), not just the logical bucket demo."""
    import glob

    import pyarrow.parquet as pq

    from currency_market_pulse_spark.operators.scaling import (
        write_zordered,
    )
    from currency_market_pulse_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    o = (load_table(spark, SF_DIR, "orders")
         .select(F.pmod("o_custkey", F.lit(256)).alias("d_cust"),
                 F.pmod(F.datediff("o_orderdate", F.lit("1970-01-01")),
                        F.lit(256)).alias("d_day")))
    out = str(tmp_path / "zordered")
    write_zordered(o, out, [F.col("d_cust"), F.col("d_day")],
                   bits=8, n_files=8)

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 4
    spans = []
    for f in files:
        t = pq.read_table(f)
        d = t.to_pydict()
        spans.append((max(d["d_cust"]) - min(d["d_cust"]),
                      max(d["d_day"]) - min(d["d_day"])))
    # every file bounded in both dims: strictly narrower than the full
    # 0..255 range, and on average far narrower
    assert all(sc < 256 and sd < 256 for sc, sd in spans)
    avg_cust = sum(sc for sc, _ in spans) / len(spans)
    avg_day = sum(sd for _, sd in spans) / len(spans)
    assert avg_cust < 200 and avg_day < 200, (avg_cust, avg_day)
