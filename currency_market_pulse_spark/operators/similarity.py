"""Similarity search over an embedding column (array<float>).

Three tiers, same semantics:

1. ``topk_bruteforce`` — exact top-k by cosine: broadcast the (small)
   query set against all candidates, score JVM-side with higher-order
   functions, rank per query.  O(n_q * N * dim) but embarrassingly
   parallel and shuffle-free except the final per-query top-k
   (TakeOrdered-size state).  The differential-tested baseline.
2. ``topk_numpy`` — identical semantics through cogrouped Arrow/BLAS
   matmuls: candidates blocked by hash, queries replicated per block
   via a broadcast range join, per-block top-k then a global rank.
   Fully distributed (no driver collect) and unbounded in n_q; the
   throughput path when n_q * dim is large (10-100x the per-element
   codegen).
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
    #
    # r17 (guide §1.2 per-task work): norms are HOISTED to one column
    # per SIDE before the join — cosine(q, c) inlined per pair costs
    # three O(dim) folds + two sqrt per pair (dot(q,c), dot(q,q),
    # dot(c,c)); with ||q|| and ||c|| computed once per row, each pair
    # pays one fold and one divide.  Bit-identical: the per-pair value
    # is the same IEEE expression dot/(sqrt(dot_q)*sqrt(dot_c)), only
    # evaluated once per row instead of once per pair; the NULL guard
    # is subsumed by the nz filter (both sides norm > 0 by
    # construction, so cosine() could never return NULL here).
    nz = emb.select(F.col(id_col), F.col(vec_col),
                    norm(F.col(vec_col)).alias("_nrm")).filter(
        F.col("_nrm") > 0)
    # query_filter is applied to the UNPROJECTED input (r18, ADVICE
    # r17): a predicate referencing any caller column (label, source,
    # ...) must keep working — filtering the (id, vec, _nrm) projection
    # instead silently narrowed the operator's API.  The broadcast q
    # side is tiny, so re-deriving its norm costs one O(dim) fold per
    # QUERY row; the same conjunction (query_filter AND norm > 0)
    # selects the same rows.
    q = (emb.filter(query_filter)
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec"),
                 norm(F.col(vec_col)).alias("_qn"))
         .filter(F.col("_qn") > 0))
    c = nz.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("cvec"),
                  F.col("_nrm").alias("_cn"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(dot(F.col("qvec"), F.col("cvec"))
                        / (F.col("_qn") * F.col("_cn")), 6)
                 .alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    # r17: no terminal ORDER BY — (query_id, rn) fully identifies each
    # row, so the global re-sort after the window rank was presentation
    # only (an extra Exchange(range)+Sort of the result; guide §2.4).
    # The whole retrieval family drops it uniformly.
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


#: Target candidate rows per block in topk_numpy's cogrouped matmul:
#: bounds each task's candidate matrix at ~4096*dim*8 bytes.
TOPK_BLOCK_ROWS = 4096

#: Query rows scored per matmul slice inside the kernel: bounds the
#: sims buffer at 1024*TOPK_BLOCK_ROWS*8 = 32 MB however many queries
#: the filter selects.
TOPK_QUERY_SLICE = 1024


def topk_numpy(emb: DataFrame, query_filter, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_blocks: int | None = None) -> DataFrame:
    """Same result as topk_bruteforce via numpy/BLAS matmuls — fully
    distributed, no driver-side data dependency (VERDICT r2 item 4;
    the round-2 version collected the query set to the driver under a
    1024-row cap).

    Plan: candidates land in block ``xxhash64(id) % B``; the query set
    is replicated to every block with a broadcast join against
    ``spark.range(B)`` (n_q * B small rows, never the candidate side);
    a cogrouped ``applyInPandas`` scores each block with one BLAS
    matmul per TOPK_QUERY_SLICE queries and emits only the per-block
    top-k per query; a global window rank finalizes.  Post-kernel row
    count is n_q * B * k, not n_q * N.  The query set is now unbounded
    — memory per task is capped by the block/slice constants.

    ``n_blocks=None`` auto-sizes B = ceil(n / TOPK_BLOCK_ROWS) from one
    count() (a scalar action, not a collect).  Zero-norm vectors are
    excluded on both sides, mirroring topk_bruteforce's NULL-cosine
    filter."""
    import math

    import numpy as np

    spark = emb.sparkSession
    if n_blocks is None:
        n_blocks = max(1, math.ceil(emb.count() / TOPK_BLOCK_ROWS))
    B = n_blocks

    c = emb.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("_blk"))
    q = (emb.filter(query_filter)
         .select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qvec"))
         .crossJoin(F.broadcast(
             spark.range(B).select(F.col("id").alias("_blk")))))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def score(c_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                              "neighbor_id": pd.Series(dtype="int64"),
                              "cos_sim": pd.Series(dtype="float64")})
        if len(c_pdf) == 0 or len(q_pdf) == 0:
            return empty
        c_ids = c_pdf["_cid"].to_numpy()
        c_mat = np.array(list(c_pdf["_cvec"]), dtype=np.float64)
        c_norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
        keep_c = c_norms.ravel() > 0
        c_ids, c_unit = c_ids[keep_c], c_mat[keep_c] / c_norms[keep_c]
        q_ids = q_pdf["_qid"].to_numpy()
        q_mat = np.array(list(q_pdf["_qvec"]), dtype=np.float64)
        q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
        keep_q = q_norms.ravel() > 0
        q_ids, q_unit = q_ids[keep_q], q_mat[keep_q] / q_norms[keep_q]
        if len(c_ids) == 0 or len(q_ids) == 0:
            return empty
        outs = []
        for s in range(0, len(q_ids), TOPK_QUERY_SLICE):
            qs_ids = q_ids[s:s + TOPK_QUERY_SLICE]
            sims = np.round(q_unit[s:s + TOPK_QUERY_SLICE] @ c_unit.T, 6)
            for qi, qid in enumerate(qs_ids):
                row = sims[qi]
                mask = c_ids != qid      # never self-match
                ids_m, row_m = c_ids[mask], row[mask]
                # primary sims desc, tie-break neighbor id asc — the
                # same total order the global window rank applies, so
                # per-block top-k retains every global top-k candidate
                order = np.lexsort((ids_m, -row_m))[:k]
                outs.append(pd.DataFrame({
                    "query_id": np.full(len(order), qid, dtype="int64"),
                    "neighbor_id": ids_m[order],
                    "cos_sim": row_m[order]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    scored = (c.groupBy("_blk").cogroup(q.groupBy("_blk"))
              .applyInPandas(score, out_schema))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    # r17: no terminal ORDER BY (see topk_bruteforce)
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


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
    Recall < 1 by design; cost drops from N to N/2^planes per query.

    Zero-norm vectors are dropped from BOTH sides (same ``nz`` filter
    as topk_bruteforce and ann_multiprobe_topk), so the single-probe
    and multi-probe operators search the identical corpus and the
    documented multi-probe-candidates ⊇ single-bucket-candidates
    recall-ordering invariant holds exactly — not merely because NULL
    cosines happen to sort last."""
    # r17: norms hoisted to one column per side (see topk_bruteforce)
    with_b = (emb.withColumn("_nrm", norm(F.col(vec_col)))
              .filter(F.col("_nrm") > 0)
              .withColumn("bucket", lsh_bucket(F.col(vec_col))))
    q = with_b.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.col("bucket"), F.col("_nrm").alias("_qn"))
    c = with_b.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"),
                      F.col("bucket").alias("cbucket"),
                      F.col("_nrm").alias("_cn"))
    scored = (
        F.broadcast(q).join(c, F.col("bucket") == F.col("cbucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "bucket",
                F.round(dot(F.col("qvec"), F.col("cvec"))
                        / (F.col("_qn") * F.col("_cn")), 6)
                 .alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    # r17: no terminal ORDER BY (see topk_bruteforce)
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def ann_multiprobe_topk(emb: DataFrame, query_filter, k: int = 3,
                        n_probes: int = 3,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. 2007): each query searches its
    own bucket PLUS the buckets reached by flipping the ``n_probes-1``
    hyperplane bits with the smallest |margin| — the planes the vector
    sits closest to, i.e. where a true neighbor most likely landed on
    the other side.  Recall rises toward brute force at cost
    n_probes/2^planes of the corpus per query, without adding planes
    or rebuilding the index.

    All probe selection is Catalyst HOFs (per-plane |dot| structs,
    array_sort, slice, bit flip) — deterministic, so the oracle
    replays it exactly.  Candidate buckets are disjoint, so no
    post-join dedup is needed."""
    weights = plane_weights()
    nz = emb.filter(norm(F.col(vec_col)) > 0)
    c = (nz.withColumn("cbucket", lsh_bucket(F.col(vec_col)))
         .select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("cvec"), "cbucket"))
    dots = [dot(F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in w]))
            for w in weights]
    margins = F.array(*[
        F.struct(F.abs(d).alias("a"), F.lit(p).alias("p"))
        for p, d in enumerate(dots)])
    q = (nz.filter(query_filter)
         .withColumn("bucket", lsh_bucket(F.col(vec_col)))
         .withColumn("_flips", F.slice(F.array_sort(margins), 1,
                                       n_probes - 1))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qvec"),
                 F.explode(F.array_union(
                     F.array(F.col("bucket")),
                     F.transform(
                         "_flips",
                         # shiftleft() takes only a literal shift, so
                         # 1<<p is spelled pow(2,p) — exact for p < 31
                         lambda s: F.col("bucket").bitwiseXOR(
                             F.pow(F.lit(2.0), s["p"].cast("double"))
                             .cast("int"))))
                 ).alias("probe")))
    scored = (
        F.broadcast(q).join(c, F.col("probe") == F.col("cbucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
                .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               "neighbor_id")
    # r17: no terminal ORDER BY (see topk_bruteforce)
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def knn_graph_lsh(emb: DataFrame, k: int = 3,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Corpus-wide approximate k-NN graph: every vector's top-k cosine
    neighbors WITHIN its hyperplane-LSH bucket — the graph-construction
    step for SNN clustering / graph-based dedup, where every node is a
    query (unlike the broadcast top-k paths, whose query set is small).

    Shape: one bucket self-join (each side the full corpus, joined on
    the 8-bit bucket id — candidates per node are bucket-sized, never
    corpus-sized), per-node window top-k on the join's own shuffle key.
    At 100 TB the bucket relation is the partition layout (write
    bucketed by `bucket` and the self-join is co-located, zero extra
    shuffle); hot buckets are bounded by adding planes or AQE skew
    split.  Returns directed edges (node_id, neighbor_id, cos_sim, rn).
    """
    nz = (emb.filter(norm(F.col(vec_col)) > 0)
          .withColumn("bucket", lsh_bucket(F.col(vec_col))))
    a = nz.select(F.col(id_col).alias("node_id"),
                  F.col(vec_col).alias("avec"), "bucket")
    b = nz.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("bvec"),
                  F.col("bucket").alias("bbucket"))
    scored = (a.join(b, F.col("bucket") == F.col("bbucket"))
              .filter(F.col("node_id") != F.col("neighbor_id"))
              .select("node_id", "neighbor_id",
                      F.round(cosine(F.col("avec"), F.col("bvec")), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy("node_id").orderBy(F.desc("cos_sim"),
                                              "neighbor_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def mutual_knn_edges(edges: DataFrame) -> DataFrame:
    """Symmetric (mutual) k-NN edges from a directed k-NN graph: keep
    (a, b) only when b is in a's top-k AND a is in b's top-k — the
    standard densification filter before SNN/graph clustering (mutual
    edges are far more likely to be true neighbors than one-sided
    ones).  Output one row per unordered pair, id_a < id_b.  One
    self-join of the (tiny, n*k-row) edge relation on the reversed key
    pair; the corpus itself is never touched again."""
    fwd = edges.select(F.col("node_id").alias("id_a"),
                       F.col("neighbor_id").alias("id_b"), "cos_sim")
    rev = edges.select(F.col("neighbor_id").alias("id_a"),
                       F.col("node_id").alias("id_b"))
    # r17: no terminal ORDER BY (see topk_bruteforce)
    return (fwd.join(rev, ["id_a", "id_b"], "left_semi")
            .filter(F.col("id_a") < F.col("id_b")))


def topk_hard_negatives(emb: DataFrame, query_filter, k: int = 5,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive / metric learning: for each
    query row, the k nearest vectors whose ``label_col`` DIFFERS from
    the query's — the most-confusable wrong-class examples, the
    training signal in-batch random negatives lack (the retrieval
    dual of ANCE/DPR negative selection).

    Same cost shape as ``topk_bruteforce`` (broadcast queries x one
    candidate scan, per-query TakeOrdered): the label inequality is one
    extra predicate on the broadcast join, evaluated before the cosine
    fold.  The exact baseline — at corpus scale, route candidate
    generation through the IVF/LSH paths (queries/ivf.py) and apply
    the label filter inside the probed cells."""
    nz = emb.filter(norm(F.col(vec_col)) > 0)
    q = nz.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"))
    c = nz.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("cvec"),
                  F.col(label_col).alias("clabel"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("qlabel") != F.col("clabel"))
        .select("query_id", "qlabel",
                F.col("neighbor_id"), F.col("clabel"),
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
                .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               "neighbor_id")
    # r17: no terminal ORDER BY (see topk_bruteforce)
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "qlabel", "neighbor_id", "clabel",
                    "cos_sim", "rn"))


#: Scalar quantization: symmetric int8 codes (one global scale) over
#: the NORMALIZED corpus — normalizing first makes the integer code
#: dot a direct cosine surrogate — with exact rerank of the top
#: SQ_RERANK candidates per query.
SQ_RERANK = 15


def sq_train_scale(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> float:
    """Global max|x| of the L2-normalized corpus — the scalar
    quantizer's ENTIRE trained state: one double, shipped in the task
    closure.  max is an order-independent aggregate, so training is
    deterministic under any partitioning — no fixed-point machinery
    needed, unlike every mean-based trainer in this package.

    One GLOBAL scale, symmetric around zero, on purpose: the first
    cut used per-dimension (min, span) affine codes, and its
    shortlist recall@3 against the exact cosine top-3 measured 0.07 —
    per-dim offsets add cross terms to the code dot
    (sum (a_d*x_d + b_d)(a_d*y_d + b_d)) that scramble the ranking
    entirely.  A single symmetric scale keeps the integer code dot
    PROPORTIONAL to the true dot (up to rounding), which over
    normalized vectors is exactly the cosine being ranked.  The
    fixture recall test pins this lesson."""
    par = emb.sparkSession.sparkContext.defaultParallelism
    nz = (emb.repartition(par)
          .withColumn("_nrm", norm(F.col(vec_col)))
          .filter(F.col("_nrm") > 0))
    row = (nz.select(F.max(F.aggregate(
        F.transform(F.col(vec_col),
                    lambda x: F.abs(x.cast("double") / F.col("_nrm"))),
        F.lit(0.0), lambda acc, v: F.greatest(acc, v))).alias("m"))
        .collect())
    return float(row[0].m)


def _sq_code(vec_col, scale: float, norm_col=None):
    """Symmetric int8 code array over the normalized vector:
    round(x * 127 / scale) clamped to [-127, 127].  All double IEEE
    arithmetic in left-associative order, mirrored verbatim by the
    oracle.  scale == 0 cannot happen for a nonzero normalized corpus
    but guards to all-zero codes anyway.

    ``norm_col`` lets the caller hoist the O(d) norm fold out of the
    per-element lambda: norm() INSIDE transform re-evaluates the full
    sqrt(dot) once per element — O(d^2) per row, and Catalyst does
    not hoist lambda-invariant subexpressions out of HOFs."""
    n = norm(vec_col) if norm_col is None else norm_col
    if scale <= 0:
        return F.transform(vec_col, lambda x: F.lit(0).cast("long"))
    return F.transform(
        vec_col,
        lambda x: F.least(F.lit(127), F.greatest(F.lit(-127), F.round(
            (x.cast("double") / n) * F.lit(127.0)
            / F.lit(float(scale)), 0).cast("long"))))


def sq_topk(emb: DataFrame, query_filter, k: int = 5,
            rerank: int = SQ_RERANK,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Scalar-quantized ANN: candidates ranked by the INTEGER dot
    product of per-dimension int8 codes (exact int64 arithmetic — no
    float fold anywhere in the scan), top ``rerank`` per query
    re-scored with exact cosine, top ``k`` kept.

    Scale shape: the search scan reads only the CODES relation (one
    byte of information per dimension — 4x smaller than float32, the
    poor man's PQ with zero codebook training); the trained state is
    ONE double (sq_train_scale) in the task closure; the rerank join touches
    ``rerank`` full vectors per query, fetched by a broadcast semi of
    the tiny candidate list against the corpus — full-precision
    vectors are never read in the scoring scan, exactly the PQ/ADC
    posture with a simpler (and training-free) quantizer."""
    scale = sq_train_scale(emb, id_col, vec_col)
    # pre-compute repartition: the compressed corpus is 1-2 input
    # splits while encode+score is ~dim work per row (input-split
    # starvation fix, queries/dedup.py _corpus)
    par = emb.sparkSession.sparkContext.defaultParallelism
    nz = (emb.repartition(par)
          .withColumn("_nrm", norm(F.col(vec_col)))
          .filter(F.col("_nrm") > 0))
    codes = nz.select(F.col(id_col),
                      _sq_code(F.col(vec_col), scale, F.col("_nrm"))
                      .alias("code"))
    qc = (nz.filter(query_filter)
          .select(F.col(id_col).alias("query_id"),
                  _sq_code(F.col(vec_col), scale, F.col("_nrm"))
                  .alias("qcode")))
    iscore = F.aggregate(
        F.zip_with(F.col("qcode"), F.col("code"), lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    cand = (F.broadcast(qc)
            .crossJoin(codes.select(F.col(id_col).alias("neighbor_id"),
                                    "code"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    iscore.alias("int_score")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("int_score"),
                                                "neighbor_id")
    short = (cand.withColumn("crn", F.row_number().over(wq))
             .filter(F.col("crn") <= rerank)
             .select("query_id", "neighbor_id"))
    qv = nz.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = nz.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cvec"))
    scored = (cv.join(F.broadcast(short), "neighbor_id")
              .join(F.broadcast(qv), "query_id")
              .select("query_id", "neighbor_id",
                      F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                               "neighbor_id")
    # r17: no terminal ORDER BY (see topk_bruteforce)
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))
