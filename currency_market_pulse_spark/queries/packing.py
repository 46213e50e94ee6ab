"""Sequence-packing queries over the ``documents`` fixture (library
tier): the concat-into-training-sequences step of an LLM data
pipeline, differential-tested against DuckDB replays of the identical
packing disciplines (operators/packing.py).

``n_chars`` stands in for the token count (a real pipeline would feed
``token_counts`` output, operators/textops.py); ``source`` is the
shard key — each shard packs independently, which is exactly the
100 TB parallelism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from currency_market_pulse_spark.operators import packing as P
from currency_market_pulse_spark.queries.registry import extra_query
from currency_market_pulse_spark.sources.catalog import load_table

#: Fixed token budget for the registered packing queries.  Fixture
#: n_chars is a few hundred per doc, so 2048 yields multi-doc packs
#: with regular boundary crossings (both disciplines exercised).
PACK_BUDGET = 2048

_CHUNK_ORACLE = f"""
WITH cum AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cum
  FROM documents),
packed AS (
  SELECT source, doc_id, n_chars,
         CAST(floor((cum - n_chars) / {PACK_BUDGET}) AS BIGINT) AS pack_id
  FROM cum)
SELECT source, pack_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_tokens
FROM packed GROUP BY source, pack_id ORDER BY source, pack_id
"""


@extra_query("documents_chunk_pack_stats", oracle=_CHUNK_ORACLE)
def documents_chunk_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing (doc -> pack of its cumulative start
    offset) + per-pack fill stats.  Pure window cumsum — one shuffle on
    the shard key, whole-stage codegen, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    packed = P.chunk_pack(docs, "doc_id", "n_chars", PACK_BUDGET, "source")
    return P.pack_stats(packed, "n_chars", "source")


@extra_query(
    "documents_greedy_pack_stats",
    oracle=P.greedy_pack_oracle_sql(
        PACK_BUDGET, "n_chars", table="documents",
        id_col="doc_id", shard_col="source"),
)
def documents_greedy_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact first-fit-sequential packing (applyInPandas fold per
    shard) + per-pack fill stats, differential-tested against the
    recursive-CTE replay of the same fold."""
    docs = load_table(spark, sf_dir, "documents")
    packed = P.greedy_pack(docs, "doc_id", "n_chars", PACK_BUDGET, "source")
    return P.pack_stats(packed, "n_chars", "source")


CHUNK_MAX, CHUNK_OVERLAP = 64, 8
_STRIDE = CHUNK_MAX - CHUNK_OVERLAP

_CHUNKS_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
  FROM documents),
pre AS (SELECT doc_id, t, len(t) AS n FROM toks),
ex AS (
  SELECT doc_id, t,
         unnest(range(1, greatest(n - {CHUNK_OVERLAP}, 1) + 1,
                      {_STRIDE})) AS s
  FROM pre)
SELECT doc_id,
       CAST(floor((s - 1.0) / {_STRIDE}) AS BIGINT) AS chunk_id,
       CAST(len(t[s : s + {CHUNK_MAX - 1}]) AS INT) AS n_chunk_tokens,
       array_to_string(t[s : s + {CHUNK_MAX - 1}], ' ') AS chunk_text
FROM ex
"""


@extra_query("documents_chunks", oracle=_CHUNKS_ORACLE)
def documents_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (the inverse of packing): overlapping
    64-token windows with stride 56 per document — zero-shuffle, the
    explode fuses into the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    return P.chunk_documents(docs, CHUNK_MAX, CHUNK_OVERLAP)


def _rag_chunks_oracle(win: int = 12, stride: int = 8) -> str:
    """SQL twin of the overlapping-chunk UDTF: chunk starts are the
    stride multiples up to L = the first start whose window reaches the
    doc end (ceil((n-win)/stride)*stride, 0 for short docs) — the same
    emit-and-stop rule the UDTF's loop implements."""
    return f"""
WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
           FROM documents WHERE text IS NOT NULL),
b AS (SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= {win} THEN 0
                  ELSE CAST(ceil((len(tk) - {win}) / {stride}.0)
                       AS BIGINT) * {stride} END AS last_start
      FROM t WHERE len(tk) > 0),
c AS (SELECT doc_id, CAST(s / {stride} AS INT) AS chunk_idx,
             CAST(s AS INT) AS start_tok,
             CAST(least({win}, n - s) AS INT) AS n_tok,
             md5(array_to_string(
               tk[CAST(s + 1 AS INT):CAST(least(s + {win}, n) AS INT)],
               ' ')) AS chunk_md5
      FROM b, LATERAL unnest(range(0, last_start + 1, {stride})) AS u(s))
SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_md5
FROM c ORDER BY doc_id, chunk_idx
"""


@extra_query("documents_rag_chunks", oracle=_rag_chunks_oracle())
def documents_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping retrieval chunks via a Python UDTF (Spark 4
    ``@udtf`` + LATERAL join — the third Python extension axis next to
    the pandas kernels and the custom data source): window 12 tokens,
    stride 8, so a passage straddling a disjoint-chunk boundary is
    fully contained in some chunk — the RAG chunking shape
    chunk_occurrences (disjoint) cannot provide.  Emits (doc_id,
    chunk_idx, start_tok, n_tok, chunk_md5); the oracle replays the
    emit-and-stop rule relationally.  Scale: the UDTF streams rows per
    input partition — same 1->N explosion cost as the frame sampler."""
    from currency_market_pulse_spark.operators.packing import (
        overlapping_chunks_udtf,
    )

    spark.udtf.register("overlapping_chunks", overlapping_chunks_udtf())
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_rag_docs")
    return spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.start_tok, c.n_tok,
               md5(c.chunk_text) AS chunk_md5
        FROM _rag_docs d, LATERAL overlapping_chunks(d.text, 12, 8) c
        ORDER BY d.doc_id, c.chunk_idx""")
