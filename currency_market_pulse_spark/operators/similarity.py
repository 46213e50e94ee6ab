"""Similarity search over an embedding column (array<float>).

Three tiers, same semantics:

1. ``topk_bruteforce`` — exact top-k by cosine: broadcast the (small)
   query set against all candidates, score JVM-side with higher-order
   functions, rank per query.  O(n_q * N * dim) but embarrassingly
   parallel and shuffle-free except the final per-query top-k
   (TakeOrdered-size state).  The differential-tested baseline.
2. ``topk_numpy`` — identical semantics through an Arrow-batched
   pandas_udf doing a single BLAS matmul per batch: the throughput
   path when n_q * dim is large (10-100x the per-element codegen).
3. ``hyperplane_lsh`` — random-hyperplane LSH bucketing: 8 fixed
   integer hyperplanes (derived deterministically from md5, embedded as
   literals) -> 8-bit bucket id.  ANN search joins query to candidates
   on bucket equality first — at 100 TB this replaces the full scan per
   query with a 1/256 partition probe (trade recall for cost; more
   planes or multi-probe raise recall).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from currency_market_pulse_spark.functions.vectors import cosine, dot, norm

N_PLANES = 8
DIM = 64


def _plane_weight(p: int, d: int) -> int:
    """Deterministic integer weight for hyperplane p, dimension d, from
    the portable md5 family: hex64(md5('p|<p>|<d>')) % 1001 - 500."""
    h = hashlib.md5(f"p|{p}|{d}".encode()).hexdigest()
    return int(h[:15], 16) % 1001 - 500


def plane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    return [[_plane_weight(p, d) for d in range(dim)] for p in range(n_planes)]


def topk_bruteforce(emb: DataFrame, query_filter, k: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: for every query row (query_filter on emb),
    the k nearest other vectors.  Scores rounded to 6 so ranking is
    reproducible across engines; ties broken by neighbor id."""
    # zero-norm vectors have no defined cosine (cosine() -> NULL):
    # exclude them PER ROW, before the join — filtering on cos_sim
    # after the crossJoin would collapse into the projection and
    # re-evaluate the three array folds per PAIR (the SCALE.md
    # inlining trap, measured ~1.8x on this operator).
    nz = emb.filter(norm(F.col(vec_col)) > 0)
    q = nz.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = nz.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .orderBy("query_id", "rn"))


#: Hard cap on the driver-side query-set collect in topk_numpy.  The
#: "queries are few" contract is now enforced, not assumed: a bad
#: query_filter fails fast instead of OOMing the driver (VERDICT r1).
MAX_TOPK_QUERIES = 1024


def topk_numpy(emb: DataFrame, query_filter, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Same result as topk_bruteforce via one numpy matmul per Arrow
    batch (mapInPandas).  Queries are collected to the driver (bounded
    by MAX_TOPK_QUERIES — enforced) and closed over; candidates stream
    through executors in columnar batches.  Zero-norm vectors are
    excluded on both sides, mirroring topk_bruteforce's NULL-cosine
    filter."""
    import numpy as np

    q_rows = (emb.filter(query_filter).select(id_col, vec_col)
              .limit(MAX_TOPK_QUERIES + 1).collect())
    if len(q_rows) > MAX_TOPK_QUERIES:
        raise ValueError(
            f"topk_numpy query_filter selected more than {MAX_TOPK_QUERIES} "
            f"rows; the query set is collected to the driver by design — "
            f"narrow the filter or use topk_bruteforce/ann_lsh_topk")
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    keep_q = q_norms.ravel() > 0
    q_ids, q_mat, q_norms = q_ids[keep_q], q_mat[keep_q], q_norms[keep_q]
    q_norm = q_mat / q_norms

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
            keep = norms.ravel() > 0  # exclude zero-norm candidates too
            c_ids, c_mat, norms = c_ids[keep], c_mat[keep], norms[keep]
            sims = q_norm @ (c_mat / norms).T  # (n_q, batch)
            n_q, n_c = sims.shape
            yield pd.DataFrame({
                "query_id": np.repeat(q_ids, n_c),
                "neighbor_id": np.tile(c_ids, n_q),
                "cos_sim": np.round(sims.ravel(), 6),
            })

    scored = (emb.select(id_col, vec_col).mapInPandas(score, out_schema)
              .filter(F.col("query_id") != F.col("neighbor_id")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .orderBy("query_id", "rn"))


def lsh_bucket(vec_col, weights: list[list[int]] | None = None):
    """8-bit hyperplane bucket id as a Catalyst expression: bit p set
    iff dot(vec, plane_p) > 0."""
    weights = weights or plane_weights()
    bucket = F.lit(0)
    for p, w in enumerate(weights):
        wcol = F.array(*[F.lit(float(x)) for x in w])
        bucket = bucket + F.when(dot(vec_col, wcol) > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


def lsh_buckets(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Assign every vector its hyperplane bucket."""
    return emb.select(F.col(id_col),
                      lsh_bucket(F.col(vec_col)).alias("bucket"))


def ann_lsh_topk(emb: DataFrame, query_filter, k: int = 3,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.
    Recall < 1 by design; cost drops from N to N/2^planes per query."""
    with_b = emb.withColumn("bucket", lsh_bucket(F.col(vec_col)))
    q = with_b.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.col("bucket"))
    c = with_b.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"),
                      F.col("bucket").alias("cbucket"))
    scored = (
        F.broadcast(q).join(c, F.col("bucket") == F.col("cbucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "bucket",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .orderBy("query_id", "rn"))
