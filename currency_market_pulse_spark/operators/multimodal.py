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
