"""Sequence packing: unit pins for the two disciplines plus the
differential zero-token edge the recursive-CTE oracle must replay
(ADVICE r2: the CTE now mirrors the fold's ``cum > 0`` guard)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from currency_market_pulse_spark.operators import packing as P


def _pdf(rows):
    return pd.DataFrame(rows, columns=["shard", "doc_id", "n_tokens"])


def _spark_df(spark, rows):
    return spark.createDataFrame(
        _pdf(rows), "shard string, doc_id long, n_tokens long")


def _greedy(spark, rows, budget):
    out = P.greedy_pack(_spark_df(spark, rows), "doc_id", "n_tokens",
                        budget, "shard")
    return {(r.shard, r.doc_id): r.pack_id for r in out.collect()}


def test_greedy_fills_then_opens(spark):
    # 600+600+600 fit in 2000; the fourth (300) overflows 1800+300>2000?
    # no — 1800+300 > 2000 is False (2100 > 2000 True) -> opens pack 1.
    rows = [("s", 1, 600), ("s", 2, 600), ("s", 3, 600), ("s", 4, 300)]
    packs = _greedy(spark, rows, budget=2000)
    assert packs == {("s", 1): 0, ("s", 2): 0, ("s", 3): 0, ("s", 4): 1}


def test_greedy_exact_boundary_stays(spark):
    # cum + t == budget is NOT an overflow: the pack fills exactly.
    rows = [("s", 1, 1000), ("s", 2, 1000), ("s", 3, 1)]
    packs = _greedy(spark, rows, budget=2000)
    assert packs == {("s", 1): 0, ("s", 2): 0, ("s", 3): 1}


def test_greedy_oversized_doc_gets_own_pack(spark):
    # a doc alone over budget still occupies exactly one pack and the
    # follower opens a fresh one (never co-packed with the giant).
    rows = [("s", 1, 100), ("s", 2, 5000), ("s", 3, 100)]
    packs = _greedy(spark, rows, budget=2000)
    assert packs == {("s", 1): 0, ("s", 2): 1, ("s", 3): 2}


def test_greedy_shards_independent(spark):
    rows = [("a", 1, 1500), ("a", 2, 1500), ("b", 1, 1500), ("b", 2, 400)]
    packs = _greedy(spark, rows, budget=2000)
    assert packs == {("a", 1): 0, ("a", 2): 1, ("b", 1): 0, ("b", 2): 0}


def test_chunk_pack_straddles_at_most_one(spark):
    # starts 0,900,1800,2700 with budget 1000 -> packs 0,0,1,2; the doc
    # starting at 1800 straddles into pack 1's overflow — by design.
    rows = [("s", 1, 900), ("s", 2, 900), ("s", 3, 900), ("s", 4, 900)]
    out = P.chunk_pack(_spark_df(spark, rows), "doc_id", "n_tokens",
                       1000, "shard")
    packs = {r.doc_id: r.pack_id for r in out.collect()}
    assert packs == {1: 0, 2: 0, 3: 1, 4: 2}


@pytest.mark.parametrize("rows", [
    # ADVICE r2 zero-token trap: zero-token doc at shard head followed
    # by an over-budget doc — the fold keeps pack 0 (cum==0 never
    # closes); the CTE must agree.
    [("s", 1, 0), ("s", 2, 5000), ("s", 3, 10)],
    # zero-token runs in the middle
    [("s", 1, 900), ("s", 2, 0), ("s", 3, 0), ("s", 4, 200), ("s", 5, 0)],
    # boundary + oversized mix across shards
    [("a", 1, 1000), ("a", 2, 1000), ("a", 3, 3000), ("a", 4, 1),
     ("b", 9, 0), ("b", 10, 2500)],
])
def test_greedy_matches_recursive_cte_oracle(spark, rows):
    budget = 2000
    packed = P.greedy_pack(_spark_df(spark, rows), "doc_id", "n_tokens",
                           budget, "shard")
    got = {tuple(r) for r in
           P.pack_stats(packed, "n_tokens", "shard").collect()}

    con = duckdb.connect()
    con.register("docs", _pdf(rows))
    sql = P.greedy_pack_oracle_sql(budget, "n_tokens", table="docs",
                                   id_col="doc_id", shard_col="shard")
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want


def test_greedy_pack_sums_bounded(spark):
    # invariant: no pack exceeds budget unless it is a single oversized
    # doc — over the real fixture at sf0.001.
    from currency_market_pulse_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    packed = P.greedy_pack(docs, "doc_id", "n_chars", 2048, "source")
    bad = (P.pack_stats(packed, "n_chars", "source")
           .filter((F.col("sum_tokens") > 2048) & (F.col("n_docs") > 1))
           .count())
    assert bad == 0


def test_chunk_documents_short_doc_single_chunk(spark):
    from pyspark.sql import Row
    from currency_market_pulse_spark.operators.packing import (
        chunk_documents,
    )
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    rows = chunk_documents(docs, max_tokens=8, overlap=2).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].n_chunk_tokens == 3
    assert rows[0].chunk_text == "a b c"


def test_chunk_documents_overlap_and_coverage(spark):
    from pyspark.sql import Row
    from currency_market_pulse_spark.operators.packing import (
        chunk_documents,
    )
    toks = [f"t{i}" for i in range(20)]
    docs = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    rows = sorted(chunk_documents(docs, max_tokens=8, overlap=2).collect(),
                  key=lambda r: r.chunk_id)
    # stride 6: starts 1,7,13 (13 <= 20-2=18); windows [0:8),[6:14),[12:20)
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    chunks = [r.chunk_text.split(" ") for r in rows]
    assert chunks[0] == toks[0:8]
    assert chunks[1] == toks[6:14]
    assert chunks[2] == toks[12:20]
    # consecutive chunks share exactly `overlap` tokens
    assert chunks[0][-2:] == chunks[1][:2]
    # every token covered
    assert set(toks) == {t for c in chunks for t in c}


def test_profile_single_scan(spark):
    """The profiler must read the table ONCE — one FileScan in the
    plan, however many columns are profiled."""
    from currency_market_pulse_spark.queries.profile import (
        lineitem_profile,
    )
    from tests.conftest import SF_DIR

    df = lineitem_profile(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert sum("Scan parquet" in line or "FileScan" in line
               for line in plan.splitlines()) == 1
    rows = {r.col_name: r for r in df.collect()}
    assert rows["l_discount"].n_nulls == 0
    assert rows["l_returnflag"].min_str == "A"
