"""Multimodal column handling: opaque binary payloads + typed metadata,
decode / feature-extraction plumbing as Arrow-batched Python stages.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked STUB (deterministic md5-derived fake) behind the same
interface a real decoder would use — the Spark-side plumbing (binary
columns, mapInPandas batch shapes, output schema, partitioning) is real
and differential-tested.

At 100 TB: payloads live in parquet binary columns (or object-store
pointers); decode/resize/frame-sample run as mapInPandas stages so each
task streams Arrow record batches through the Python kernel without
per-row overhead; metadata-only queries never touch the payload column
thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: schema of the decode stage output — what a real image decoder would
#: produce (dimensions, format, frame count for video).
DECODED_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

_FORMATS = ("png", "jpeg", "webp")


def _stub_decode_one(payload: bytes) -> tuple[str, int, int, str]:
    """STUB decoder: a real implementation would call PIL/ffmpeg here
    (not installed in this container).  Derives deterministic fake
    dimensions from the payload hash so tests and oracles can verify
    the plumbing end-to-end."""
    md5 = hashlib.md5(payload).hexdigest()
    h64 = int(md5[:15], 16)
    return md5, h64 % 640, h64 % 480, _FORMATS[h64 % 3]


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text
    here; in production: image/audio bytes) plus typed metadata."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(docs_with_payload: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: streams Arrow batches of (id, payload)
    through the (stub) decode kernel."""
    cols = docs_with_payload.select(id_col, "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "payload_md5": [],
                   "width": [], "height": [], "format": []}
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                md5, w, h, fmt = _stub_decode_one(b)
                out["doc_id"].append(i)
                out["n_bytes"].append(len(b))
                out["payload_md5"].append(md5)
                out["width"].append(w)
                out["height"].append(h)
                out["format"].append(fmt)
            yield pd.DataFrame(out)

    return cols.mapInPandas(kernel, DECODED_META_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(docs_with_payload: DataFrame, width: int, height: int,
                  id_col: str = "doc_id") -> DataFrame:
    """1->1 transform stage: payload -> resized payload at (width,
    height).  STUB kernel (a real implementation calls
    PIL.Image.resize here — not installed in this container): emits
    md5(payload | 'WxH') bytes, deterministic so the batch plumbing is
    end-to-end testable.  Plumbing is real: binary in/out through
    Arrow, constant-memory per batch, column pruning upstream."""
    cols = docs_with_payload.select(id_col, "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": [], "width": [], "height": []}
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                fake = hashlib.md5(
                    bytes(payload) + f"|{width}x{height}".encode()).digest()
                out["doc_id"].append(i)
                out["payload"].append(fake)
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    return cols.mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("frame_md5", T.StringType()),
])

#: stub frame cadence: 25 fps -> 40 ms per frame
FRAME_INTERVAL_MS = 40
MAX_STUB_FRAMES = 5


def _stub_frame_count(b: bytes) -> int:
    """STUB frame count: h64(payload) % MAX_STUB_FRAMES + 1 — the one
    formula sample_frames, its oracle and frame_ahash_signatures must
    agree on, factored so it cannot drift."""
    return int(hashlib.md5(b).hexdigest()[:15], 16) % MAX_STUB_FRAMES + 1


def sample_frames(docs_with_payload: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """1->N explosion stage: each (video) payload yields one row per
    sampled frame — the row-count-changing mapInPandas shape a video
    pipeline needs (ffmpeg frame extraction in production; here the
    STUB derives n_frames = h64(payload) % MAX_STUB_FRAMES + 1 and
    per-frame md5s, fully reproducible in the DuckDB oracle).

    At 100 TB the explosion factor (frames per clip) multiplies output
    rows, not task memory: frames stream out per Arrow batch."""
    cols = docs_with_payload.select(id_col, "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame_md5": []}
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                for k in range(_stub_frame_count(b)):
                    out["doc_id"].append(i)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(k * FRAME_INTERVAL_MS)
                    out["frame_md5"].append(
                        hashlib.md5(b + f"|frame|{k}".encode()).hexdigest())
            yield pd.DataFrame(out)

    return cols.mapInPandas(kernel, FRAME_SCHEMA)


def extract_features(docs_with_payload: DataFrame, dim: int = 8,
                     id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction stage: payload -> float vector (a vision/
    audio encoder forward pass in production; STUB derives component j
    from md5(payload | 'f' | j), in [-1, 1), deterministic).  Output is
    array<float> — directly consumable by operators/similarity.py and
    embedding_near_dup_pairs, closing the multimodal -> embedding-dedup
    loop."""
    cols = docs_with_payload.select(id_col, "payload")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                vec = [
                    (int(hashlib.md5(b + f"|f|{j}".encode()).hexdigest()[:8],
                         16) % 2000 - 1000) / 1000.0
                    for j in range(dim)]
                ids.append(i)
                vecs.append(vec)
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return cols.mapInPandas(kernel, schema)


#: Perceptual-hash signature width — 60 bits so the hamming-banded
#: candidate machinery (operators/dedup.py simhash_hamming_pairs,
#: k+1 = 4 bands x 15 bits) applies verbatim.
AHASH_BITS = 60

AHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ahash", T.LongType()),
])


def ahash_signatures(docs_with_payload: DataFrame,
                     bits: int = AHASH_BITS,
                     id_col: str = "doc_id") -> DataFrame:
    """Average-hash perceptual signature over the binary payload — the
    aHash member of the pHash family (the production upgrade is the
    DCT low-frequency variant; same banding/verify machinery either
    way).  Per payload:

    1. "decode + resize": pool the raw bytes into ``bits`` contiguous
       chunks (chunk j covers bytes [j*n//bits, (j+1)*n//bits)) — the
       STUB stand-in for decode->grayscale->resize (no codecs in this
       container; a real build swaps a PIL/ffmpeg kernel in here and
       pools pixels instead of bytes);
    2. threshold each chunk against the payload average: bit j = 1 iff
       chunk_sum_j * bits > total_sum — an INTEGER cross-multiply, so
       the signature is bit-portable with no float anywhere.

    The perceptual property is real w.r.t. the payload: a local byte
    edit perturbs only the chunks it touches, so near-identical
    payloads land within small hamming distance while unrelated ones
    scatter.  mapInPandas over (id, payload) Arrow batches — the same
    streaming-decode shape as the other multimodal stages."""
    cols = docs_with_payload.select(id_col, "payload")

    def kernel(batches):
        for pdf in batches:
            ids, sigs = [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                ids.append(i)
                sigs.append(_ahash_bytes(bytes(payload), bits))
            yield pd.DataFrame({"doc_id": ids, "ahash": sigs})

    return cols.mapInPandas(kernel, AHASH_SCHEMA)


def phash_neardup_pairs(docs_with_payload: DataFrame, k: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """Perceptual near-dup pairs: (id_a, id_b, hamming) with
    hamming(ahash_a, ahash_b) <= k — image dedup, the one pipeline
    capability text-side dedup can't cover.  Candidate generation is
    the recall-COMPLETE pigeonhole banding of
    operators/dedup.py:simhash_hamming_pairs (k+1 bands; any pair
    within hamming k agrees exactly on >= 1 band), reused verbatim on
    the perceptual signatures: one explode + one (band, value)
    shuffle, never an all-pairs join."""
    from currency_market_pulse_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    sigs = (ahash_signatures(docs_with_payload, AHASH_BITS, id_col)
            .select(F.col(id_col), F.col("ahash").alias("simhash")))
    return simhash_hamming_pairs(sigs, k=k, bits=AHASH_BITS,
                                 id_col=id_col)


FRAME_AHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("fhash", T.LongType()),
])


def _ahash_bytes(b: bytes, bits: int) -> int:
    """aHash over raw bytes: byte-pool into ``bits`` chunks, integer
    average-threshold (the ahash_signatures kernel, factored so the
    payload-level and frame-level stages share one implementation)."""
    import numpy as np

    a = np.frombuffer(b, dtype=np.uint8)
    n = len(a)
    total = int(a.sum())
    sig = 0
    for j in range(bits):
        lo, hi = j * n // bits, (j + 1) * n // bits
        if int(a[lo:hi].sum()) * bits > total:
            sig |= 1 << j
    return sig


def frame_ahash_signatures(docs_with_payload: DataFrame,
                           bits: int = AHASH_BITS,
                           id_col: str = "doc_id") -> DataFrame:
    """Per-FRAME perceptual signatures: the sample_frames explosion
    (stub frame bytes = payload || '|frame|' || k — a real build
    decodes actual frames here) with each frame aHash'd.  Output
    (doc_id, frame_idx, fhash); frames stream out per Arrow batch as
    in sample_frames."""
    cols = docs_with_payload.select(id_col, "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "fhash": []}
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                for k in range(_stub_frame_count(b)):
                    out["doc_id"].append(i)
                    out["frame_idx"].append(k)
                    out["fhash"].append(
                        _ahash_bytes(b + f"|frame|{k}".encode(), bits))
            yield pd.DataFrame(out)

    return cols.mapInPandas(kernel, FRAME_AHASH_SCHEMA)


#: frame-uid packing factor (frame_idx < MAX_STUB_FRAMES + 1 always).
_FRAME_PACK = MAX_STUB_FRAMES + 1


def video_neardup_pairs(docs_with_payload: DataFrame, k: int = 3,
                        min_frac: float = 0.5,
                        id_col: str = "doc_id") -> DataFrame:
    """Video-level perceptual near-dup: (id_a, id_b, n_match_a,
    n_match_b, frac_a, frac_b) for video pairs where EITHER side has
    >= ``min_frac`` of its frames matched (hamming <= k) by some frame
    of the other — the clip-dedup shape (re-encodes, trims and
    overlays perturb frames slightly; the frame-match fraction
    survives).

    Plan: frame signatures -> recall-complete hamming banding
    (simhash_hamming_pairs reused on packed frame uids = doc_id *
    {pack} + frame_idx) -> same-video pairs dropped -> per-pair
    distinct-matched-frame counts vs each side's frame count.  Work is
    banded-candidate-bounded at every step; the frame relation is
    |corpus| x frames-per-clip, never joined all-pairs."""
    from currency_market_pulse_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    sigs = frame_ahash_signatures(docs_with_payload, AHASH_BITS, id_col)
    per_video = sigs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_frames"))
    uids = sigs.select(
        (F.col(id_col) * _FRAME_PACK + F.col("frame_idx")).alias("uid"),
        F.col("fhash").alias("simhash"))
    fp = simhash_hamming_pairs(uids, k=k, bits=AHASH_BITS, id_col="uid")
    # INTEGER division (div), not float '/': a double quotient loses
    # integer precision past ~2^53/pack and would unpack wrong video
    # ids at extreme corpus sizes.
    pairs = (fp.select(
        F.expr(f"id_a div {_FRAME_PACK}").alias("va"),
        (F.col("id_a") % _FRAME_PACK).alias("fa"),
        F.expr(f"id_b div {_FRAME_PACK}").alias("vb"),
        (F.col("id_b") % _FRAME_PACK).alias("fb"))
        .filter(F.col("va") != F.col("vb"))
        .select(F.least("va", "vb").alias("id_a"),
                F.greatest("va", "vb").alias("id_b"),
                F.when(F.col("va") < F.col("vb"), F.col("fa"))
                .otherwise(F.col("fb")).alias("frame_in_a"),
                F.when(F.col("va") < F.col("vb"), F.col("fb"))
                .otherwise(F.col("fa")).alias("frame_in_b")))
    agg = (pairs.groupBy("id_a", "id_b")
           .agg(F.countDistinct("frame_in_a").alias("n_match_a"),
                F.countDistinct("frame_in_b").alias("n_match_b")))
    na = per_video.select(F.col(id_col).alias("id_a"),
                          F.col("n_frames").alias("_na"))
    nb = per_video.select(F.col(id_col).alias("id_b"),
                          F.col("n_frames").alias("_nb"))
    return (agg.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b", "n_match_a", "n_match_b",
                    F.round(F.col("n_match_a") / F.col("_na"), 6)
                    .alias("frac_a"),
                    F.round(F.col("n_match_b") / F.col("_nb"), 6)
                    .alias("frac_b"))
            .filter(F.greatest("frac_a", "frac_b") >= min_frac)
            .orderBy("id_a", "id_b"))
