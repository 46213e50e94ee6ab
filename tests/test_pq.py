"""Product quantization: codebook shape, code validity, ADC ranking."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from currency_market_pulse_spark.operators.pq import pq_adc_topk, pq_fit


def _corpus(spark):
    # Three tight groups in 8 dims (2 subspaces x 4 dims); within-group
    # perturbations are tiny relative to between-group distances.
    base = {
        0: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    for g, vec in base.items():
        for j in range(3):
            v = [x + 0.01 * j for x in vec]
            rows.append(Row(vec_id=g * 10 + j, embedding=v))
    return spark.createDataFrame(rows)


def test_pq_fit_codes_and_codebooks(spark):
    emb = _corpus(spark)
    codebooks, codes = pq_fit(emb, m=2, sub_dim=4, k=3, n_iter=2)
    assert len(codebooks) == 2
    for cb in codebooks:
        rows = cb.collect()
        assert 1 <= len(rows) <= 3
        assert all(len(r.centroid) == 4 for r in rows)
    crows = codes.collect()
    assert len(crows) == 9
    assert set(codes.columns) == {"vec_id", "c0", "c1"}
    for r in crows:
        assert 0 <= r.c0 < 3 and 0 <= r.c1 < 3
    # group members share a code word in both subspaces
    by_group = {}
    for r in crows:
        by_group.setdefault(r.vec_id // 10, set()).add((r.c0, r.c1))
    assert all(len(s) == 1 for s in by_group.values())


def test_pq_adc_ranks_own_group_first(spark):
    emb = _corpus(spark)
    out = pq_adc_topk(emb, F.col("vec_id") == 0, k_neighbors=2,
                      m=2, sub_dim=4, k=3, n_iter=2).collect()
    assert [r.rn for r in out] == [1, 2]
    # both top neighbors come from the query's own group (ids 1, 2)
    assert {r.neighbor_id for r in out} == {1, 2}
    other = pq_adc_topk(emb, F.col("vec_id") == 0, k_neighbors=8,
                        m=2, sub_dim=4, k=3, n_iter=2).collect()
    # in-group ADC distances strictly below any out-group distance
    ingroup = max(r.adc_dist for r in other if r.neighbor_id < 10)
    outgroup = min(r.adc_dist for r in other if r.neighbor_id >= 10)
    assert ingroup < outgroup


def test_pq_recall_curve_is_monotone(spark):
    """Recall within a T-sized ADC buffer is non-decreasing in T by
    construction (larger buffer = superset of candidates); the curve
    query must reflect that on the real fixture."""
    from currency_market_pulse_spark.queries.ivf import sim_pq_recall
    from tests.conftest import EXTRA_SF_DIR

    rows = sim_pq_recall(spark, EXTRA_SF_DIR).collect()
    assert [r.buffer for r in rows] == [10, 25, 50, 100]
    recalls = [r.recall_at_3 for r in rows]
    assert recalls == sorted(recalls)
    assert all(r.n_queries == rows[0].n_queries for r in rows)


def test_ivfpq_ranks_own_group_first(spark):
    from currency_market_pulse_spark.operators.pq import ivfpq_topk

    emb = _corpus(spark)
    out = ivfpq_topk(emb, F.col("vec_id") == 0, k_neighbors=2,
                     coarse_k=3, coarse_iter=2, nprobe=2,
                     m=2, sub_dim=4, k=2, n_iter=1).collect()
    assert [r.rn for r in out] == [1, 2]
    # with 3 coarse cells matching the 3 groups and nprobe=2, the
    # query's own group is probed and its members rank first
    assert {r.neighbor_id for r in out} == {1, 2}


def test_ivfpq_scans_only_probed_cells(spark):
    from currency_market_pulse_spark.operators.pq import ivfpq_topk

    emb = _corpus(spark)
    out = ivfpq_topk(emb, F.col("vec_id") == 0, k_neighbors=9,
                     coarse_k=3, coarse_iter=2, nprobe=1,
                     m=2, sub_dim=4, k=2, n_iter=1).collect()
    # nprobe=1 with well-separated groups: candidates are only the
    # query's own cell members (2 others), never the full corpus
    assert len(out) == 2
    assert {r.neighbor_id for r in out} == {1, 2}
