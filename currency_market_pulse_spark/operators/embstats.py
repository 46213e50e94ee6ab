"""Corpus-level embedding statistics: the mean vector and covariance
matrix that whitening / PCA preprocessing needs (SemDeDup and
embedding-cosine dedup both assume roughly isotropic vectors; real
encoder embeddings are anisotropic until whitened).

Scale design — the covariance of N vectors of dimension d is
sum-of-outer-products, a textbook map-side-combinable aggregate:

- each Arrow batch computes its PARTIAL (n, sum, X^T X) with one BLAS
  matmul and emits d*(d+1)/2 rows — per PARTITION, not per row; the
  shuffle carries ~2080 rows per task for d=64 regardless of N.
- one hash aggregate sums the partials; the final division happens on
  d^2 rows.  The corpus is read once and never shuffled.

Cross-engine determinism: float sums are fold-order-dependent, and a
32-way partial aggregation adds in a different order than DuckDB's
sequential scan — the ln-divergence lesson (functions/text.py llog).
So values are fixed-pointed FIRST: x_fix = round(x * SCALE) as int64
(round half away from zero, matching Spark's and DuckDB's round), and
every sum/product is exact integer arithmetic — order-independent by
construction.  The one float division at the end is the same IEEE
expression on both engines.  int64 bounds: |x| <~ 10 means
|sum x_i x_j| <~ N * 1e14, safe beyond 10^4 corpora per partial and
checked loudly by ANSI overflow if ever exceeded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: fixed-point scale: 6 decimal digits — matches the repo-wide round-6
#: comparison convention.
EMB_SCALE = 1_000_000

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("i", T.IntegerType()),
    T.StructField("j", T.IntegerType()),
    T.StructField("n", T.LongType()),
    T.StructField("si", T.LongType()),
    T.StructField("sj", T.LongType()),
    T.StructField("sij", T.LongType()),
])


def mean_vector(emb: DataFrame, dim: int,
                vec_col: str = "embedding",
                scale: int = EMB_SCALE) -> DataFrame:
    """One-row (mvec: array<double>) corpus mean of the embedding
    column, from exact fixed-point per-dimension sums (order-
    independent ints; the closing s/n/scale division is the same IEEE
    expression on both engines).  The per-pos aggregate shuffles d
    rows per task (partial aggregation), the assembly aggregate sees d
    rows total."""
    fx = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0)
        .cast("long"))
    stats = (emb.filter(F.size(vec_col) == dim)
             .select(F.posexplode(fx).alias("pos", "xf"))
             .groupBy("pos")
             .agg(F.sum("xf").alias("s"), F.count(F.lit(1)).alias("n")))
    return (stats.groupBy()
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "pos",
                    (F.col("s") / F.col("n") / F.lit(float(scale)))
                    .alias("m")))),
                lambda s: s["m"]).alias("mvec")))


def centered_embeddings(emb: DataFrame, dim: int,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, embedding) with the corpus mean vector subtracted — the
    cheapest anisotropy correction (encoder embeddings share a large
    common component that inflates every pairwise cosine; centering
    removes it, the standard first step before cosine-threshold dedup
    is trustworthy).  The 1-row mean broadcasts; the corpus never
    shuffles."""
    mv = mean_vector(emb, dim, vec_col)
    return (emb.filter(F.size(vec_col) == dim)
            .crossJoin(F.broadcast(mv))
            .select(F.col(id_col),
                    F.zip_with(
                        F.transform(F.col(vec_col),
                                    lambda x: x.cast("double")),
                        F.col("mvec"),
                        lambda a, m: a - m).alias(vec_col)))


def covariance_matrix(emb: DataFrame, dim: int,
                      vec_col: str = "embedding",
                      scale: int = EMB_SCALE) -> DataFrame:
    """Upper-triangle sample covariance (i <= j, 0-based dims) of the
    embedding column: (i, j, n, mean_i, mean_j, cov).

    ``dim`` is asserted per row (vectors of any other length are
    dropped, mirroring the oracle's len() filter)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        iu, ju = np.triu_indices(dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if mat.ndim != 2 or mat.shape[1] != dim:
                continue
            v = mat * scale
            # round half AWAY FROM ZERO — np.rint is half-even and
            # would diverge from Spark/DuckDB round() at exact .5
            fx = np.where(v >= 0, np.floor(v + 0.5),
                          np.ceil(v - 0.5)).astype(np.int64)
            # numpy int64 sums wrap SILENTLY on overflow (only the
            # cross-partition Spark sum is ANSI-checked), so bound the
            # in-batch stage explicitly: the worst |sij| partial is
            # rows * max|fx|^2 — refuse any batch where that can
            # exceed int64 rather than emit corrupted statistics.
            amax = int(np.abs(fx).max(initial=0))
            if amax and fx.shape[0] * amax * amax > np.iinfo(np.int64).max:
                raise OverflowError(
                    f"covariance partial would overflow int64: batch of "
                    f"{fx.shape[0]} rows with max|fixed-point| {amax} "
                    f"(scale={scale}); reduce scale or batch size")
            s = fx.sum(axis=0)
            prod = fx.T @ fx
            yield pd.DataFrame({
                "i": iu.astype("int32"), "j": ju.astype("int32"),
                "n": np.int64(fx.shape[0]),
                "si": s[iu], "sj": s[ju], "sij": prod[iu, ju]})

    parts = (emb.filter(F.size(vec_col) == dim)
             .select(vec_col)
             .mapInPandas(partial, _PARTIAL_SCHEMA))
    agg = (parts.groupBy("i", "j")
           .agg(F.sum("n").alias("n"), F.sum("si").alias("si"),
                F.sum("sj").alias("sj"), F.sum("sij").alias("sij")))
    n_d = F.col("n").cast("double")
    si_d, sj_d = F.col("si").cast("double"), F.col("sj").cast("double")
    sc = F.lit(float(scale))
    return (agg.select(
        "i", "j", "n",
        F.round(si_d / n_d / sc, 6).alias("mean_i"),
        F.round(sj_d / n_d / sc, 6).alias("mean_j"),
        F.round((F.col("sij").cast("double") - si_d * sj_d / n_d)
                / (n_d - F.lit(1.0)) / sc / sc, 6).alias("cov"))
        .orderBy("i", "j"))
