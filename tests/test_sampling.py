"""Deterministic sampling invariants: rerun-stability, monotone splits,
stratum rates, per-group caps.  (Differential parity with the DuckDB
oracles is covered by tests/test_extra_queries.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.operators.sampling import (
    hash_split, per_group_cap, stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=["en", "de", "fr"][i % 3]) for i in range(300)])


def _splits(df):
    return {r.doc_id: r.split for r in df.collect()}


def test_split_deterministic_across_runs(docs):
    w = {"train": 0.8, "test": 0.2}
    assert _splits(hash_split(docs, "doc_id", w)) == \
        _splits(hash_split(docs, "doc_id", w))


def test_split_stable_under_corpus_growth(spark, docs):
    """A doc's assignment must not depend on what else is in the
    corpus — the anti-leak property."""
    w = {"train": 0.8, "test": 0.2}
    small = docs.filter(F.col("doc_id") < 50)
    full = _splits(hash_split(docs, "doc_id", w))
    sub = _splits(hash_split(small, "doc_id", w))
    assert sub == {k: v for k, v in full.items() if k < 50}


def test_split_monotone_when_train_grows(docs):
    """Enlarging train keeps every previously-train doc in train
    (cumulative thresholds)."""
    at80 = _splits(hash_split(docs, "doc_id", {"train": 0.8, "test": 0.2}))
    at90 = _splits(hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1}))
    for d, s in at80.items():
        if s == "train":
            assert at90[d] == "train"


def test_split_covers_all_rows_and_weights_roughly(docs):
    out = hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05,
                                      "test": 0.05})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 300
    assert counts["train"] > 240  # ~270 expected; loose bound

def test_split_requires_two_names(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"train": 1.0})


def test_stratified_sample_drops_unlisted_strata(docs):
    out = stratified_sample(docs, "doc_id", "lang",
                            {"en": 1.0, "de": 0.5})
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "fr" not in langs
    assert out.filter(F.col("lang") == "en").count() == 100  # all kept


def test_per_group_cap_enforced_and_stable(spark):
    ev = spark.createDataFrame(
        [Row(event_id=i, user_id=i % 7) for i in range(200)])
    out = per_group_cap(ev, "user_id", "event_id", 3)
    per = out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 3 for r in per)  # every user has >=3 events here
    kept1 = {r.event_id for r in out.collect()}
    kept2 = {r.event_id for r in
             per_group_cap(ev, "user_id", "event_id", 3).collect()}
    assert kept1 == kept2
    assert kept1 <= set(range(200))


def test_per_group_cap_keeps_small_groups_whole(spark):
    ev = spark.createDataFrame(
        [Row(event_id=1, user_id=1), Row(event_id=2, user_id=1),
         Row(event_id=3, user_id=2)])
    out = per_group_cap(ev, "user_id", "event_id", 5)
    assert out.count() == 3
