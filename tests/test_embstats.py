"""Embedding covariance: partition-count invariance (the property the
fixed-point integer arithmetic exists for) and agreement with a
straightforward numpy computation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from currency_market_pulse_spark.operators.embstats import (
    EMB_SCALE, covariance_matrix,
)
from currency_market_pulse_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return [(r.i, r.j, r.n, r.mean_i, r.mean_j, r.cov)
            for r in df.collect()]


def test_covariance_partition_invariant(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    one = _rows(covariance_matrix(emb.repartition(1), dim=64))
    many = _rows(covariance_matrix(emb.repartition(13), dim=64))
    assert one == many
    assert len(one) == 64 * 65 // 2


def test_covariance_matches_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    mat = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    v = mat * EMB_SCALE
    fx = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
    got = {(r.i, r.j): (r.cov, r.mean_i) for r in
           covariance_matrix(emb, dim=64).collect()}
    n = fx.shape[0]
    s = fx.sum(axis=0)
    for (i, j), (cov, mean_i) in list(got.items())[:50]:
        sij = float(fx[:, i] @ fx[:, j])
        want = (sij - s[i] * s[j] / n) / (n - 1) / EMB_SCALE / EMB_SCALE
        assert abs(cov - round(want, 6)) <= 1e-9, (i, j)
        assert abs(mean_i - round(s[i] / n / EMB_SCALE, 6)) <= 1e-9


def test_covariance_diagonal_is_variance(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    diag = [r for r in covariance_matrix(emb, dim=64).collect()
            if r.i == r.j]
    assert len(diag) == 64
    assert all(r.cov > 0 for r in diag)


def test_mean_vector_and_centering(spark):
    """The broadcast mean matches numpy; centered vectors sum to ~0
    per dimension (within the fixed-point quantum)."""
    from currency_market_pulse_spark.operators.embstats import (
        centered_embeddings, mean_vector,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    mat = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    mv = mean_vector(emb, dim=64).collect()[0].mvec
    v = mat * EMB_SCALE
    fx = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
    want = fx.sum(axis=0) / len(mat) / EMB_SCALE
    assert np.allclose(mv, want, atol=0)  # exact: same integer sums
    cen = np.array(
        [r.embedding for r in
         centered_embeddings(emb, dim=64).orderBy("vec_id").collect()])
    # centering is mean-subtraction up to the 1e-6 fixed-point quantum
    assert np.abs(cen.mean(axis=0)).max() < 1e-6


def test_covariance_overflow_raises_loudly(spark):
    """In-batch numpy int64 accumulation must refuse out-of-envelope
    embeddings instead of wrapping silently (ADVICE r5): a vector with
    |x| far beyond the fixed-point envelope makes rows * max|fx|^2
    exceed int64, and the partial must raise, not corrupt."""
    import pytest
    from pyspark.sql import Row

    big = 4.0e6      # fixed-point 4e12; 4 rows * (4e12)^2 >> 2^63
    emb = spark.createDataFrame([
        Row(vec_id=i, embedding=[big, 0.0]) for i in range(4)
    ]).withColumn("embedding", F.col("embedding").cast("array<float>"))
    with pytest.raises(Exception, match="(?i)overflow"):
        covariance_matrix(emb.repartition(1), dim=2).collect()
