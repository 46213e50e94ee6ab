"""BM25 retrieval: ranking sanity on a planted corpus."""

from __future__ import annotations

from pyspark.sql import Row

from currency_market_pulse_spark.operators.textops import bm25_topk


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="hash join hash join skew hash"),
        Row(doc_id=2, text="hash once among many other words here now"),
        Row(doc_id=3, text="completely unrelated text about rivers"),
        Row(doc_id=4, text="skew skew skew skew skew skew skew skew"),
    ])
    out = bm25_topk(docs, [(1, ["hash", "join"])], top_k=4).collect()
    ranked = [r.doc_id for r in out]
    assert ranked[0] == 1                  # both terms, dense
    assert 3 not in ranked                 # no query terms -> absent
    assert all(r.bm25 > 0 for r in out)


def test_bm25_length_normalization_prefers_shorter(spark):
    """Same tf, shorter doc -> higher score (the b-term)."""
    docs = spark.createDataFrame([
        Row(doc_id=1, text="skew skew " + "pad " * 40),
        Row(doc_id=2, text="skew skew pad"),
    ])
    out = {r.doc_id: r.bm25
           for r in bm25_topk(docs, [(1, ["skew"])], top_k=2).collect()}
    assert out[2] > out[1]
