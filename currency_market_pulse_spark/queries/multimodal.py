"""Multimodal / nested-column queries: JSON props extraction and the
binary-payload decode pipeline (operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from currency_market_pulse_spark.operators import multimodal as M
from currency_market_pulse_spark.queries.registry import extra_query, query
from currency_market_pulse_spark.sources.catalog import load_table


@query(
    "events_props_json",
    oracle="""
SELECT event_type,
       CAST(CAST(props->>'$.k' AS BIGINT) // 10 AS BIGINT) AS k_decile,
       count(*) AS n_events,
       round(avg(value), 6) AS mean_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns: extract ``props.k`` from the JSON
    string, bucket it, aggregate — from_json/get_json_object stays in
    codegen (no Python)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type", F.floor(k / 10).alias("k_decile"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("value"), 6).alias("mean_value"))
        .orderBy("event_type", "k_decile")
    )


@query(
    "multimodal_decode_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 640 AS INT) AS width,
       CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 480 AS INT) AS height,
       CASE CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 3
         WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
FROM documents
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> (stub) decode metadata through the real
    mapInPandas Arrow plumbing.  The oracle reproduces the stub's
    md5-derived fake dimensions, so schema, batching and hashing of the
    Python stage are all verified; swap the kernel for PIL/ffmpeg in
    production (operators/multimodal.py:_stub_decode_one)."""
    docs = load_table(spark, sf_dir, "documents")
    return M.decode_metadata(M.with_binary_payload(docs))


@extra_query(
    "multimodal_frame_sample",
    oracle=f"""
WITH h AS (SELECT doc_id, text,
                  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h64
           FROM documents)
SELECT doc_id,
       CAST(k AS INT) AS frame_idx,
       CAST(k * {M.FRAME_INTERVAL_MS} AS BIGINT) AS ts_ms,
       -- payload bytes are UTF-8 of text, so hashing the VARCHAR
       -- concat is byte-identical (DuckDB 1.0 md5 takes no BLOB)
       md5(text || '|frame|' || k) AS frame_md5
FROM h, LATERAL unnest(range(0, h64 % {M.MAX_STUB_FRAMES} + 1)) AS t(k)
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1->N mapInPandas explosion): one row per
    stub-sampled frame with its timestamp and frame hash.  Library
    tier; the oracle reproduces the stub's frame count and per-frame
    md5 exactly, proving the row-expanding batch shape."""
    docs = load_table(spark, sf_dir, "documents")
    return (M.sample_frames(M.with_binary_payload(docs))
            .orderBy("doc_id", "frame_idx"))
