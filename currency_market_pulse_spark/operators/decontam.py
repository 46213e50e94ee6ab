"""Benchmark decontamination: flag training documents that share
word-n-gram shingles with a held-out / evaluation corpus — the step
that keeps eval data out of a training set (the train-on-test leak).

Semantics (the standard n-gram-overlap definition used by public LLM
data pipelines): a (train doc, eval doc) pair is contaminated when the
two share at least ``min_overlap`` DISTINCT word n-grams.  Higher ``n``
(5-13 in published pipelines) makes shingles specific enough that any
hit is near-certain leakage; ``min_overlap`` trades recall for noise.

Scale design: the eval side is SMALL by nature (benchmarks are
thousands of docs, the training corpus is billions), so its exploded
shingle relation is broadcast — the contamination join is a map-side
hash join against the full training shingle scan, no shuffle of the
big side.  The per-shingle join blowup is bounded by the eval-side
document frequency, which at n >= 5 is tiny by construction.  The
output pair relation is again small (leaks are rare), so the follow-up
(drop or down-weight flagged train docs via a left-anti join) is
cheap.

Reference has no decontamination surface; §2.6 LLM-pipeline extension
tier.  Differential oracle: queries/decontam.py replays the identical
tokenize/shingle/join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from currency_market_pulse_spark.operators.dedup import _doc_shingles


def contamination_pairs(train: DataFrame, eval_: DataFrame,
                        n: int = 5, min_overlap: int = 1,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(train_doc_id, eval_doc_id, n_overlap) for every pair sharing
    >= ``min_overlap`` distinct word ``n``-grams.  ``_doc_shingles``
    already emits DISTINCT shingles per doc, so the join's group count
    IS the distinct-overlap count."""
    tr = (_doc_shingles(train, n, id_col, text_col)
          .select(F.col(id_col).alias("train_doc_id"), "sh"))
    ev = (_doc_shingles(eval_, n, id_col, text_col)
          .select(F.col(id_col).alias("eval_doc_id"), "sh"))
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def contaminated_ids(train: DataFrame, eval_: DataFrame,
                     n: int = 5, min_overlap: int = 1,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Distinct train doc ids to drop, with their worst-case evidence
    (max overlap, number of eval docs hit) — feed to a left-anti join
    against the training corpus."""
    return (contamination_pairs(train, eval_, n, min_overlap,
                                id_col, text_col)
            .groupBy("train_doc_id")
            .agg(F.max("n_overlap").alias("max_overlap"),
                 F.count(F.lit(1)).alias("n_eval_docs")))


def decontaminate(train: DataFrame, eval_: DataFrame,
                  n: int = 5, min_overlap: int = 1,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The training corpus minus contaminated docs (left-anti join on
    the flagged id relation — the flagged side is small, so the anti
    join broadcasts)."""
    flagged = contaminated_ids(train, eval_, n, min_overlap,
                               id_col, text_col)
    return train.join(
        F.broadcast(flagged.select(F.col("train_doc_id").alias(id_col))),
        id_col, "left_anti")
