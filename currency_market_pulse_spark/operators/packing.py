"""Sequence packing: assign documents to fixed-token-budget packs —
the concat-into-training-sequences step of an LLM data pipeline.

Two packing disciplines, both deterministic (docs ordered by id within
a shard):

- ``chunk_pack`` — concat-then-chunk: a doc belongs to the pack its
  cumulative START offset falls in (``floor(start / budget)``).  Packs
  can overflow by at most one document (the straddler), which is the
  standard accept-a-boundary-crossing formulation.  Pure window
  cumsum: one shuffle on the shard key, whole-stage codegen, no
  Python.  This is the 100 TB path — shard by source/file so each
  window partition is bounded, and every shard packs independently in
  parallel.
- ``greedy_pack`` — exact first-fit-sequential: fill a pack until the
  NEXT doc would overflow, then open a new one; a doc never straddles
  (oversized docs get a pack of their own).  The fold is inherently
  sequential per shard, so it runs as an Arrow-batched
  ``applyInPandas`` over the shard key — same shuffle shape as
  chunk_pack, O(shard) python work within each group.  Its DuckDB
  oracle is a recursive CTE replaying the identical fold — a strong
  differential test of the stateful kernel.

The reference has no packing surface; this is §2.6 extension tier.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def chunk_pack(docs: DataFrame, id_col: str, tokens_col: str,
               budget: int, shard_col: str) -> DataFrame:
    """Add ``pack_id``: concat-then-chunk packing per shard (see module
    docstring).  ``pack_id`` is dense from 0 within each shard."""
    w = Window.partitionBy(shard_col).orderBy(id_col)
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col))
    return docs.withColumn(
        "pack_id", F.floor(start / F.lit(budget)).cast("long"))


def greedy_pack(docs: DataFrame, id_col: str, tokens_col: str,
                budget: int, shard_col: str) -> DataFrame:
    """Add ``pack_id``: exact first-fit-sequential packing per shard —
    a pack never exceeds ``budget`` unless a single doc alone does."""
    out_schema = StructType(
        list(docs.schema.fields) + [StructField("pack_id", LongType())])
    cols = [f.name for f in docs.schema.fields]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        packs: list[int] = []
        pack, cum = 0, 0
        for t in pdf[tokens_col].astype("int64"):
            if cum > 0 and cum + t > budget:
                pack += 1
                cum = 0
            cum += int(t)
            packs.append(pack)
        pdf = pdf[cols].copy()
        pdf["pack_id"] = pd.Series(packs, index=pdf.index, dtype="int64")
        return pdf

    return docs.groupBy(shard_col).applyInPandas(fold, out_schema)


def pack_stats(packed: DataFrame, tokens_col: str,
               shard_col: str) -> DataFrame:
    """Per-pack fill statistics (docs, tokens) — the packing-efficiency
    readout."""
    return (packed.groupBy(shard_col, "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(tokens_col).alias("sum_tokens"))
            .orderBy(shard_col, "pack_id"))


def greedy_pack_oracle_sql(budget: int, tokens_expr: str,
                           table: str = "documents",
                           id_col: str = "doc_id",
                           shard_col: str = "source") -> str:
    """Recursive-CTE DuckDB twin of ``greedy_pack`` + ``pack_stats``:
    replays the same per-shard sequential fold (same order, same
    overflow rule) and aggregates per pack."""
    return f"""
WITH RECURSIVE toks AS (
  SELECT {shard_col} AS shard, {id_col} AS id, {tokens_expr} AS n_tokens,
         row_number() OVER (PARTITION BY {shard_col} ORDER BY {id_col}) AS rn
  FROM {table}),
fold AS (
  SELECT shard, id, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_id, n_tokens AS cum
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.id, t.n_tokens, t.rn,
         CASE WHEN f.cum > 0 AND f.cum + t.n_tokens > {budget}
              THEN f.pack_id + 1 ELSE f.pack_id END,
         CASE WHEN f.cum > 0 AND f.cum + t.n_tokens > {budget}
              THEN t.n_tokens ELSE f.cum + t.n_tokens END
  FROM toks t JOIN fold f ON t.shard = f.shard AND t.rn = f.rn + 1)
SELECT shard AS {shard_col}, pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM fold GROUP BY shard, pack_id ORDER BY {shard_col}, pack_id
"""


def chunk_documents(docs: DataFrame, max_tokens: int = 64,
                    overlap: int = 8, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split long documents into overlapping context-window chunks —
    the inverse of packing: (doc_id, chunk_id, n_chunk_tokens,
    chunk_text), chunk i covering tokens [1 + i*stride,
    1 + i*stride + max_tokens) with stride = max_tokens - overlap.

    Pure Catalyst: staged token array -> sequence of starts -> explode
    -> slice + concat_ws.  One narrow explode, no shuffle at all —
    chunking fuses into the scan stage and parallelizes per input
    split, which is exactly how a 100 TB corpus wants to be windowed.
    The last chunk per doc may be shorter; a doc shorter than
    max_tokens yields exactly one chunk."""
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    from currency_market_pulse_spark.functions.text import tokens

    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    pre = toks.select(F.col(id_col), "_t", F.size("_t").alias("_n"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("_n") - overlap, F.lit(1)), F.lit(stride))
    ex = (pre.select(F.col(id_col), "_t", F.explode(starts).alias("_s")))
    chunk = F.slice(F.col("_t"), F.col("_s"), max_tokens)
    return ex.select(
        F.col(id_col),
        F.floor((F.col("_s") - 1) / F.lit(stride)).cast("long")
         .alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"))


#: RAG chunker defaults: window of CHUNK_WIN tokens, stride
#: CHUNK_STRIDE (overlap = WIN - STRIDE) — overlapping windows so a
#: passage straddling a boundary is fully contained in some chunk,
#: the retrieval-chunking shape disjoint chunking can't provide.
CHUNK_WIN = 12
CHUNK_STRIDE = 8


def overlapping_chunks_udtf():
    """Python UDTF (Spark 4 ``@udtf``) emitting overlapping token-window
    chunks: (chunk_idx, start_tok, n_tok, chunk_text) per input doc —
    the 1->N row-generating shape as a LATERAL-joinable table function
    (the third Python extension axis next to pandas UDFs and custom
    data sources).  Chunk starts at multiples of the stride; the final
    window is emitted iff it starts inside the doc, so every token is
    covered and short docs yield exactly one chunk.

    Registered per session:
        spark.udtf.register("overlapping_chunks", overlapping_chunks_udtf())
        spark.sql("SELECT d.doc_id, c.* FROM documents d, "
                  "LATERAL overlapping_chunks(d.text, 12, 8) c")
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=("chunk_idx int, start_tok int, n_tok int, "
                      "chunk_text string"))
    class OverlappingChunks:
        def eval(self, text: str, win: int, stride: int):
            if text is None:
                return
            toks = text.lower().split()
            n = len(toks)
            if n == 0:
                return
            idx = 0
            for start in range(0, max(n - 1, 1), stride):
                if start >= n:
                    break
                chunk = toks[start:start + win]
                yield idx, start, len(chunk), " ".join(chunk)
                if start + win >= n:
                    break
                idx += 1

    return OverlappingChunks
