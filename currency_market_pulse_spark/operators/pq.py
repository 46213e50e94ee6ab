"""Product quantization (PQ) for embedding compression + ADC search
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

Why PQ at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ code
at m=4 subspaces x k=8 centroids is 4 small ints (4 bytes packed —
64x smaller).  The ANN index for a trillion-row corpus only fits in
(distributed) memory compressed, and ADC (asymmetric distance
computation) searches the COMPRESSED codes directly: per query, one
tiny distance table per subspace (k entries), then every candidate's
approximate distance is m table lookups + adds — no decompression, no
full-precision vector reads.

Determinism contract (differential-testable like operators/kmeans.py,
whose trainer this reuses wholesale):

- each subspace trains an independent Lloyd k-means on the sliced
  sub-vectors — same md5-ordered seed rows for every subspace (the
  hash covers only vec_id), same round-6 distance/mean discipline;
- codes: per-subspace nearest-centroid cell, ties to the lowest cell;
- ADC distance: round-6 per-subspace table entries, summed left to
  right, the sum rounded to 6 — identical fold on both engines.

Scale shape: training = m independent k-means (broadcast assignment,
partial-agg update — nothing new); encoding = ONE broadcast join per
subspace fused into a scan of the corpus (the codebooks are m*k rows
total); search = query-local table build (m*k entries, broadcast) +
a scan of the CODES relation (4 ints/row, not 256 bytes/row) with
m lookups per row.  The corpus's full-precision vectors are never
read at search time — that is the entire point."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from currency_market_pulse_spark.operators.kmeans import _sq_dist, kmeans_fit

PQ_M = 4          #: subspaces
PQ_SUB_DIM = 16   #: dims per subspace (m * sub_dim = embedding dim)
PQ_K = 8          #: centroids per subspace codebook
PQ_ITER = 1       #: Lloyd iterations per subspace


def pq_fit(emb: DataFrame, m: int = PQ_M, sub_dim: int = PQ_SUB_DIM,
           k: int = PQ_K, n_iter: int = PQ_ITER,
           id_col: str = "vec_id",
           vec_col: str = "embedding") -> tuple[list[DataFrame], DataFrame]:
    """Train the m per-subspace codebooks and encode the corpus.

    Returns ``(codebooks, codes)``: ``codebooks[s]`` is the (cell,
    centroid) relation for subspace ``s`` (k rows, centroid of length
    ``sub_dim``); ``codes`` is (id, c0..c{m-1}) — the compressed
    corpus."""
    codebooks: list[DataFrame] = []
    codes: DataFrame | None = None
    for s in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias(vec_col))
        cents, assigned = kmeans_fit(sub, k, n_iter, id_col, vec_col)
        codebooks.append(cents)
        part = assigned.select(F.col(id_col), F.col("cell").alias(f"c{s}"))
        codes = part if codes is None else codes.join(part, id_col)
    return codebooks, codes


def pq_adc_topk(emb: DataFrame, query_pred, k_neighbors: int = 3,
                m: int = PQ_M, sub_dim: int = PQ_SUB_DIM,
                k: int = PQ_K, n_iter: int = PQ_ITER,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rn) — approximate
    squared-distance nearest neighbors computed ENTIRELY on the PQ
    codes.  ``query_pred`` selects the query rows (queries keep full
    precision — that is the 'asymmetric' in ADC)."""
    codebooks, codes = pq_fit(emb, m, sub_dim, k, n_iter, id_col, vec_col)
    q = emb.filter(query_pred).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    adc = codes
    for s in range(m):
        qd = (q.select("query_id",
                       F.slice("_qv", s * sub_dim + 1, sub_dim).alias("_qs"))
              .crossJoin(F.broadcast(codebooks[s]))
              .select("query_id", F.col("cell").alias(f"c{s}"),
                      F.round(_sq_dist(F.col("_qs"), F.col("centroid")), 6)
                       .alias(f"_d{s}")))
        keys = [f"c{s}"] if s == 0 else ["query_id", f"c{s}"]
        adc = adc.join(F.broadcast(qd), keys)
    total = F.col("_d0")
    for s in range(1, m):
        total = total + F.col(f"_d{s}")
    scored = (adc.filter(F.col(id_col) != F.col("query_id"))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      F.round(total, 6).alias("adc_dist")))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_neighbors)
            .orderBy("query_id", "rn"))
