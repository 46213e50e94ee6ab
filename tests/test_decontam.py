"""Decontamination: n-gram overlap flags planted leaks, respects the
min_overlap threshold, and the anti-join drops exactly the flagged
train docs."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.operators import decontam as C

_EVAL_PHRASE = "the quick brown fox jumps over the lazy dog tonight"


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_planted_leak_is_flagged(spark):
    train = _docs(spark, [
        (1, "completely unrelated words about currency markets here"),
        (2, f"prefix copied {_EVAL_PHRASE} suffix appended"),
    ])
    ev = _docs(spark, [(100, _EVAL_PHRASE)])
    pairs = {(r.train_doc_id, r.eval_doc_id): r.n_overlap
             for r in C.contamination_pairs(train, ev, n=5).collect()}
    assert (2, 100) in pairs
    assert (1, 100) not in pairs
    # the copied 10-token phrase yields 6 distinct 5-grams
    assert pairs[(2, 100)] == 6


def test_min_overlap_threshold(spark):
    # doc 2 shares exactly one 5-gram window's worth: first 5 tokens
    train = _docs(spark, [
        (2, "the quick brown fox jumps elsewhere entirely different tail"),
    ])
    ev = _docs(spark, [(100, _EVAL_PHRASE)])
    assert C.contamination_pairs(train, ev, n=5, min_overlap=1).count() == 1
    assert C.contamination_pairs(train, ev, n=5, min_overlap=2).count() == 0


def test_short_docs_never_match(spark):
    train = _docs(spark, [(1, "the quick brown fox")])  # < n tokens
    ev = _docs(spark, [(100, _EVAL_PHRASE)])
    assert C.contamination_pairs(train, ev, n=5).count() == 0


def test_decontaminate_drops_only_flagged(spark):
    train = _docs(spark, [
        (1, "clean document with no overlap at all in any window"),
        (2, f"{_EVAL_PHRASE} plus some extra context"),
        (3, "another clean one still safely disjoint from benchmarks"),
    ])
    ev = _docs(spark, [(100, _EVAL_PHRASE)])
    kept = sorted(r.doc_id for r in C.decontaminate(train, ev, n=5).collect())
    assert kept == [1, 3]
    ids = {r.train_doc_id: (r.max_overlap, r.n_eval_docs)
           for r in C.contaminated_ids(train, ev, n=5).collect()}
    assert set(ids) == {2}


def test_bloom_prefilter_equals_exact_and_prunes(spark):
    """The bloom-prefiltered pair relation is bit-identical to the
    exact one (no false negatives by construction), the bitmap stays
    within its m/64-word budget, and on a disjoint train side the
    prefilter actually prunes (candidate shingles strictly fewer than
    total train shingles)."""
    from currency_market_pulse_spark.operators.dedup import _doc_shingles

    leak = "the quick brown fox jumps over the lazy dog today"
    train = spark.createDataFrame(
        [(0, leak),
         (1, "completely unrelated training text with many words here"),
         (2, "another clean document nothing shared at all with eval")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, leak), (101, "held out evaluation prompt squad entry")],
        "doc_id long, text string")

    exact = sorted(tuple(r) for r in
                   C.contamination_pairs(train, ev, n=5).collect())
    bloom = sorted(tuple(r) for r in
                   C.contamination_pairs_bloom(train, ev, n=5).collect())
    assert exact == bloom and len(exact) >= 1

    bm = C.eval_shingle_bloom(ev, n=5)
    assert bm.count() <= C.BLOOM_BITS // 64

    tr_sh = _doc_shingles(train, 5, "doc_id", "text")
    n_all = tr_sh.count()
    n_cand = C.bloom_prefilter(
        tr_sh.select(F.col("doc_id").alias("train_doc_id"), "sh"),
        bm).count()
    assert n_cand < n_all          # clean docs' shingles dropped
    assert n_cand >= 6             # the leaked doc's 5-gram overlap
