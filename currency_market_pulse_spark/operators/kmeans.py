"""Distributed Lloyd's k-means over an embedding column — the
centroid trainer the IVF coarse quantizer docstring promises
(queries/ivf.py cites pyspark.ml KMeans for production; this is the
DataFrame-only, engine-portable variant that a DuckDB oracle can
replay step for step).

Determinism contract (what makes it differential-testable):

- seeds: the k vectors with the lexicographically smallest
  md5('km|' || id) — portable hash order, no RNG, selected with
  orderBy+limit (TakeOrdered, never a global sort materialization).
- assignment: nearest centroid by squared Euclidean distance ROUNDED
  to 6 decimals before the argmin; ties break to the lowest cell id.
  Rounding absorbs the ~1e-15 fold-order noise between engines.
- update: per-cell per-dimension mean, rounded to 6 — so the NEXT
  iteration's inputs are bitwise identical on both engines no matter
  the partial-aggregation order.  Cells that lose all members drop
  (deterministically, on both sides).

Scale design: centroids are a k-row DataFrame broadcast into the
assignment join — the corpus never shuffles for assignment; the update
is one explode (vec -> dim rows) + partial-aggregated mean per
(cell, dim), i.e. the same cost shape as any wide aggregate.  Each
iteration's centroid relation is localCheckpoint-ed (k rows) so the
iterative lineage stays O(1)-deep (the components lesson,
operators/components.py).  The only driver-side data is the k-row
codebook itself, collected once per iteration into the BLAS kernel's
task closure — broadcast-scale by construction (see
assign_cells_blas for why a joined column was worse)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from currency_market_pulse_spark.functions.text import seeded_md5

KMEANS_SEED_TAG = "km"


def _sq_dist(a, b):
    """Sequential double fold of sum((a_i - b_i)^2) — multiplication,
    not pow(), to match the oracle expression exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)


def seed_centroids(emb: DataFrame, k: int,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(cell, centroid): the k hash-smallest vectors, cell = rank in
    hash order."""
    seeds = (emb.select(F.col(id_col).alias("_id"),
                        F.col(vec_col).alias("centroid"),
                        seeded_md5(KMEANS_SEED_TAG,
                                   F.col(id_col).cast("string")).alias("_h"))
             .orderBy("_h", "_id").limit(k))
    # unpartitioned window over k rows only (post-limit) — safe; the
    # WindowExec warning is suppressed session-wide with justification
    # in session._silence_windowexec_warning
    w = Window.orderBy("_h", "_id")
    return (seeds.withColumn("cell", F.row_number().over(w) - 1)
            .select("cell",
                    F.transform("centroid",
                                lambda x: x.cast("double")).alias("centroid")))


def assign_cells(emb: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, cell, dist): nearest centroid per vector (broadcast join;
    dist rounded to 6, ties to the lowest cell).

    The argmin is a hash aggregate over lexicographic min(struct(dist,
    cell)) — NOT a row_number window: the aggregate partially combines
    map-side (k-fold less shuffle volume) and skips the per-partition
    sort a window pays, which matters when assignment runs once per
    Lloyd iteration.  struct ordering = (dist asc, cell asc), exactly
    the window's tie rule."""
    scored = (emb.select(F.col(id_col), F.col(vec_col))
              .crossJoin(F.broadcast(centroids))
              .withColumn("dist", F.round(
                  _sq_dist(F.col(vec_col), F.col("centroid")), 6)))
    return (scored.groupBy(id_col)
            .agg(F.min(F.struct("dist", "cell")).alias("_m"))
            .select(id_col, F.col("_m.cell").alias("cell"),
                    F.col("_m.dist").alias("dist")))


def update_centroids(emb: DataFrame, assigned: DataFrame,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(cell, centroid): per-cell per-dim mean, rounded to 6 and
    re-packed in dimension order."""
    dims = (emb.select(F.col(id_col), F.col(vec_col))
            .join(assigned.select(id_col, "cell"), id_col)
            .select("cell", F.posexplode(vec_col).alias("pos", "v")))
    means = (dims.groupBy("cell", "pos")
             .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m")))
    return (means.groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("centroid")))


def kmeans_fit(emb: DataFrame, k: int = 8, n_iter: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """((cell, centroid), (id, cell, dist)) after ``n_iter`` Lloyd
    iterations from the deterministic seeds — the trained coarse
    quantizer plus the corpus partition it induces, i.e. exactly the
    two relations an IVF index stores (queries/ivf.py
    sim_ivf_kmeans_topk probes them)."""
    # EAGER localCheckpoints, measured deliberately: the lazy variant
    # (components.py's trick) was tried and is ~2.5x SLOWER here —
    # each of the chain's downstream branches (assignment, update,
    # consumers) races to materialize the un-checkpointed centroid
    # RDD separately under AQE, recomputing the prefix; a k-row eager
    # checkpoint per hand-off is a sub-0.3s job that every later
    # stage then reads for free (sf0.1: eager 2.9s vs lazy 7.1s
    # end-to-end train).
    # Assignment runs through the BLAS kernel (assign_cells_blas, the
    # matmul Lloyd inner loop — n*k*dim flops instead of n*k
    # interpreted folds; required at the corpus-adaptive k).  The
    # Catalyst fold twin (assign_cells) stays as the differential
    # reference, equality pinned by tests/test_kmeans.py.
    centroids = seed_centroids(emb, k, id_col, vec_col).localCheckpoint()
    assigned = assign_cells_blas(emb, centroids, id_col, vec_col)
    for _ in range(n_iter):
        centroids = update_centroids(
            emb, assigned, id_col, vec_col).localCheckpoint()
        assigned = assign_cells_blas(emb, centroids, id_col, vec_col)
    return centroids, assigned


def kmeans_assign(emb: DataFrame, k: int = 8, n_iter: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Final (id, cell, dist) after ``n_iter`` Lloyd iterations from
    the deterministic seeds."""
    return kmeans_fit(emb, k, n_iter, id_col, vec_col)[1]


def assign_cells_blas(emb: DataFrame, centroids: DataFrame,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      with_alt: bool = False) -> DataFrame:
    """BLAS twin of ``assign_cells``: per Arrow batch, all n x k
    squared distances in one |x|^2 + |c|^2 - 2XC^T matmul, rounded to
    6 and argmin'd with the same tie-to-lowest-cell rule (numpy argmin
    returns the first minimum; cells are sorted ascending).

    Why it exists: the Catalyst crossJoin+fold assignment is n*k
    interpreted 64-dim lambda folds — at the corpus-adaptive k
    (queries/ivf.py coarse_k) that made TRAINING the bottleneck
    (sf1, k=80: 40s vs 8.7s at k=8).  The matmul form is the standard
    Lloyd inner loop; the round-6 hand-off keeps it bitwise-aligned
    with the sequential-fold oracle exactly as the other proven BLAS
    twins (cell_pairs_blas, topk_numpy).

    ``with_alt``: also emit ``alt_dist`` = min rounded distance to any
    OTHER cell — the silhouette's ``b`` term for free, replacing a
    second n x k relation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    fields = [T.StructField("vec_id", T.LongType()),
              T.StructField("cell", T.IntegerType()),
              T.StructField("dist", T.DoubleType())]
    if with_alt:
        fields.append(T.StructField("alt_dist", T.DoubleType()))
    out_schema = T.StructType(fields)

    # The codebook ships in the TASK CLOSURE, not as a joined column:
    # a crossJoin against the packed 1-row relation repeats the k*dim
    # array PER ROW through Arrow (measured at sf10, k=800: ~400 KB x
    # every corpus row — the serialization, not the math, became the
    # bottleneck).  Collecting k rows at plan-build time is the same
    # broadcast-scale data the join hint would ship, fetched once per
    # task instead of once per row — the pyspark.ml posture.
    rows = sorted((r["cell"], list(r["centroid"]))
                  for r in centroids.select("cell", "centroid").collect())
    cell_ids = np.array([c for c, _ in rows], dtype=np.int32)
    C = np.array([v for _, v in rows], dtype=np.float64)
    src = emb.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).alias("_vec"))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # cells can DROP during Lloyd (non-contiguous ids);
            # cell_ids maps matrix row -> actual id.  Rows are
            # cell-ascending, so numpy's first-minimum argmin IS
            # tie-to-lowest-cell.
            X = np.array(list(pdf["_vec"]), dtype=np.float64)
            d = (np.square(X).sum(1)[:, None] + np.square(C).sum(1)[None, :]
                 - 2.0 * (X @ C.T))
            d = np.round(d, 6)
            rows = d.argmin(1)
            out = {"vec_id": pdf["_id"].to_numpy(),
                   "cell": cell_ids[rows],
                   "dist": d[np.arange(len(d)), rows]}
            if with_alt:
                d[np.arange(len(d)), rows] = np.inf
                out["alt_dist"] = d.min(1)
            yield pd.DataFrame(out)

    out = src.mapInPandas(kernel, out_schema)
    if id_col != "vec_id":
        out = out.withColumnRenamed("vec_id", id_col)
    return out
