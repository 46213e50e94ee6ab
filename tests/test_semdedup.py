"""SemDeDup operator: cluster-confined near-dup pruning."""

from __future__ import annotations

from pyspark.sql import Row

from currency_market_pulse_spark.operators.semdedup import (
    semdedup, semdedup_cell_stats,
)


def _corpus(spark):
    # Two well-separated directions; ids 0-2 are near-identical copies
    # of direction A (tiny perturbations), ids 10-11 copies of B, id 20
    # is an isolated vector near B's cell but below threshold.
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.999, 0.01, 0.0]),
        Row(vec_id=2, embedding=[0.998, 0.02, 0.0]),
        Row(vec_id=10, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=11, embedding=[0.0, 0.999, 0.01]),
        Row(vec_id=20, embedding=[0.0, 0.6, 0.8]),
    ]
    return spark.createDataFrame(rows)


def test_semdedup_drops_higher_ids_only(spark):
    emb = _corpus(spark)
    assigned, pairs = semdedup(emb, k=2, n_iter=2, threshold=0.99)
    p = {(r.id_a, r.id_b) for r in pairs.collect()}
    # Every pair is ordered and above threshold.
    assert all(a < b for a, b in p)
    # The two copy groups produce their in-group pairs; the isolated
    # vector (20) pairs with nothing at 0.99.
    assert (0, 1) in p and (0, 2) in p and (1, 2) in p
    assert (10, 11) in p
    assert not any(20 in pr for pr in p)


def test_semdedup_cell_stats_counts_distinct_dropped(spark):
    emb = _corpus(spark)
    out = semdedup_cell_stats(emb, k=2, n_iter=2, threshold=0.99)
    rows = out.collect()
    # Totals: 6 vectors, dropped = {1, 2, 11} (lower-id survivors 0,
    # 10, 20 kept).
    assert sum(r.n_vecs for r in rows) == 6
    assert sum(r.n_dropped for r in rows) == 3
    for r in rows:
        assert 0.0 <= r.drop_frac <= 1.0


def test_semdedup_threshold_one_keeps_everything(spark):
    emb = _corpus(spark)
    out = semdedup_cell_stats(emb, k=2, n_iter=1, threshold=1.0000001)
    assert sum(r.n_dropped for r in out.collect()) == 0


def test_blas_cell_pairs_match_catalyst(spark):
    """The per-cell BLAS matmul kernel (registered dedup_embedding_cells
    path) and the Catalyst sequential-fold join must emit identical
    pairs and round-6 cosines — including dropping zero-norm vectors."""
    from pyspark.sql import functions as F

    from currency_market_pulse_spark.operators.kmeans import kmeans_assign
    from currency_market_pulse_spark.operators.semdedup import (
        cell_pairs, cell_pairs_blas,
    )
    from currency_market_pulse_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned = kmeans_assign(emb, k=8, n_iter=2)
    members = (assigned.select("vec_id", "cell")
               .join(emb.select("vec_id", "embedding"), "vec_id"))
    key = lambda df: sorted(
        (r.cell, r.id_a, r.id_b, r.cos_sim) for r in df.collect())
    a = key(cell_pairs(members, 0.4))
    b = key(cell_pairs_blas(members, 0.4).withColumn(
        "cell", F.col("cell").cast("int")))
    assert a == b and len(a) > 0
