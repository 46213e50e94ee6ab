"""Count-min sketch: planted heavy hitter, no-undercount invariant,
and the cell-wise merge property that makes the sketch shardable."""

from __future__ import annotations

from pyspark.sql import functions as F

from currency_market_pulse_spark.operators import textops as X


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_cms_planted_heavy_hitter_and_no_undercount(spark):
    """A token planted 50x must surface with est >= 50 (count-min never
    undercounts), and every token's estimate dominates its true count."""
    docs = _docs(spark, [
        " ".join(["pelican"] * 50),
        "some other words entirely distinct here",
        "pelican flies again",
    ])
    est = {r.tok: r.est for r in X.cms_estimates(docs).collect()}
    assert est["pelican"] >= 51   # 50 planted + 1 in the last doc
    occ = (docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                       .alias("tok"))
           .groupBy("tok").count().collect())
    exact = {r.tok: r["count"] for r in occ}
    for tok, c in exact.items():
        assert est[tok] >= c, f"{tok}: est {est[tok]} < exact {c}"


def test_cms_sketch_merges_cellwise(spark):
    """sketch(A) + sketch(B) == sketch(A union B) cell-by-cell — the
    property that lets 1000 executors (or stream micro-batches) build
    local sketches and fold them by addition."""
    texts_a = ["alpha beta gamma alpha", "delta epsilon"]
    texts_b = ["beta beta zeta", "alpha eta theta iota"]
    sk_a = {(r.row, r.bucket): r.cnt
            for r in X.cms_sketch(_docs(spark, texts_a)).collect()}
    sk_b = {(r.row, r.bucket): r.cnt
            for r in X.cms_sketch(_docs(spark, texts_b)).collect()}
    sk_ab = {(r.row, r.bucket): r.cnt
             for r in X.cms_sketch(_docs(spark, texts_a + texts_b))
             .collect()}
    merged = dict(sk_a)
    for cell, c in sk_b.items():
        merged[cell] = merged.get(cell, 0) + c
    assert merged == sk_ab


def test_cms_sketch_state_is_bounded(spark):
    """The sketch relation never exceeds rows * width cells no matter
    the corpus (here it is far under; the bound is structural)."""
    docs = _docs(spark, ["a b c d e f g h i j"] * 5)
    n = X.cms_sketch(docs).count()
    assert n <= X.CMS_ROWS * X.CMS_WIDTH
