"""SemDeDup: semantic deduplication of an embedded corpus by
cluster-then-prune (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", 2023).

The scale problem with embedding near-dup detection is candidate
generation: exact all-pairs cosine is O(n^2) (measured quadratic at
sf10 — SCALE.md).  SemDeDup's answer is to partition the corpus with
k-means FIRST and search for near-duplicates only WITHIN each cell:
with k cells the pair space drops to ~n^2/k, and k grows with the
corpus (production runs use k ~ sqrt(n) or larger), so per-cell work
stays bounded.  Semantically-close pairs land in the same cell with
high probability because the quantizer is trained on the same
geometry it prunes.

Pipeline (every stage an existing engine operator):

1. train: ``kmeans_fit`` (operators/kmeans.py) — deterministic Lloyd,
   broadcast assignment, no driver data dependency.
2. candidate pairs: self-join ON the cell id (shuffle key = cell),
   ``id_a < id_b`` dedup, sequential-fold cosine rounded to 6.
3. prune rule: DROP every vector that has an in-cell near-duplicate
   with a LOWER id ("keep the first, drop the rest") — pairwise and
   deterministic, so both engines agree without transitive closure.
   The connected-components variant of dedup grouping lives in
   operators/components.py; SemDeDup deliberately uses the cheaper
   local rule (one extra vector kept per chain edge at worst).

At 100 TB: the corpus shuffles ONCE on cell id; each cell's members
self-join locally.  Cell count is the knob that keeps cells
memory-sized — with the fixture's k=8 the per-cell join is a toy, at
scale k is chosen so n/k rows fit an executor (the same bound the
in-bucket LSH joins obey).  A pathological mega-cell would hit AQE's
skew-join split; the docstring contract is k scaled to corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from currency_market_pulse_spark.functions.vectors import cosine
from currency_market_pulse_spark.operators.kmeans import kmeans_fit

DEFAULT_THRESHOLD = 0.4


def semdedup(emb: DataFrame, k: int = 8, n_iter: int = 2,
             threshold: float = DEFAULT_THRESHOLD,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Returns ``(assigned, pairs)``:

    - ``assigned``: (id, cell, dist) — the trained partition of the
      corpus (k-means, ``n_iter`` deterministic Lloyd iterations).
    - ``pairs``: (cell, id_a, id_b, cos_sim) — in-cell near-duplicate
      pairs with cosine >= threshold (rounded to 6, id_a < id_b).
    """
    _, assigned = kmeans_fit(emb, k, n_iter, id_col, vec_col)
    members = (assigned.select(id_col, "cell")
               .join(emb.select(id_col, vec_col), id_col))
    a = members.select("cell", F.col(id_col).alias("id_a"),
                       F.col(vec_col).alias("_va"))
    b = members.select("cell", F.col(id_col).alias("id_b"),
                       F.col(vec_col).alias("_vb"))
    pairs = (a.join(b, "cell")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos_sim",
                         F.round(cosine(F.col("_va"), F.col("_vb")), 6))
             .filter(F.col("cos_sim") >= threshold)
             .select("cell", "id_a", "id_b", "cos_sim"))
    return assigned, pairs


def semdedup_cell_stats(emb: DataFrame, k: int = 8, n_iter: int = 2,
                        threshold: float = DEFAULT_THRESHOLD,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-cell prune summary: (cell, n_vecs, n_dropped, drop_frac).
    ``n_dropped`` counts distinct vectors with an in-cell near-dup of
    lower id — the rows SemDeDup would delete from the corpus."""
    assigned, pairs = semdedup(emb, k, n_iter, threshold, id_col, vec_col)
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    dropped = (pairs.select("cell", "id_b").distinct()
               .groupBy("cell").agg(F.count(F.lit(1)).alias("n_dropped")))
    return (sizes.join(dropped, "cell", "left")
            .select("cell", "n_vecs",
                    F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"))
            .withColumn("drop_frac", F.round(
                F.col("n_dropped") / F.col("n_vecs").cast("double"), 6))
            .orderBy("cell"))
