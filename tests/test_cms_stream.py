"""Streaming heavy hitters: the standing sketch equals the batch CMS
over everything ingested, crash-replay never double-counts, and a
planted hitter spread across micro-batches surfaces with est >= truth."""

from __future__ import annotations

import json
import os

from currency_market_pulse_spark.operators import textops as X
from currency_market_pulse_spark.streaming.cms_stream import (
    StreamingHeavyHitters,
)


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _handler(tmp_path):
    return StreamingHeavyHitters(
        sketch_path=str(tmp_path / "sketch"),
        cand_path=str(tmp_path / "cand"))


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    """After two micro-batches, the merged standing sketch is
    cell-identical to the batch CMS over the union corpus, and the
    cross-batch heavy hitter reports est >= its true total count."""
    src = tmp_path / "in"
    src.mkdir()
    rows1 = [{"doc_id": 1, "text": "storm " * 30 + "alpha beta"}]
    rows2 = [{"doc_id": 2, "text": "storm " * 25 + "gamma delta"},
             {"doc_id": 3, "text": "unrelated words entirely"}]
    _write(src / "f1.json", rows1, 1_000_000)
    _write(src / "f2.json", rows2, 1_000_100)

    hh = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = hh.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    union = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows1 + rows2],
        "doc_id long, text string")
    batch_cells = {(r.row, r.bucket): r.cnt
                   for r in X.cms_sketch(union).collect()}
    merged = {(r.row, r.bucket): r.cnt
              for r in hh.merged_sketch(spark).collect()}
    assert merged == batch_cells

    top = {r.tok: r.est for r in hh.heavy_hitters(spark).collect()}
    # "storm " * 30 ends with a space -> trailing empty token; the
    # word itself occurs 30 + 25 = 55 times
    assert top.get("storm", 0) >= 55


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    """Re-running a batch under the same batch_id (crash replay)
    REPLACES its partition: the merged sketch is unchanged."""
    hh = _handler(tmp_path)
    b0 = spark.createDataFrame([(1, "x y z x")],
                               "doc_id long, text string")
    b1 = spark.createDataFrame([(2, "x q")], "doc_id long, text string")
    hh.process_batch(b0, 0)
    hh.process_batch(b1, 1)
    before = {(r.row, r.bucket): r.cnt
              for r in hh.merged_sketch(spark).collect()}
    hh.process_batch(b1, 1)   # replay
    after = {(r.row, r.bucket): r.cnt
             for r in hh.merged_sketch(spark).collect()}
    assert before == after


def test_custom_geometry_threads_through(spark, tmp_path):
    """A non-default rows x width geometry is used end-to-end: the
    standing sketch matches the batch CMS at the SAME geometry, and
    estimates still never undercount."""
    hh = StreamingHeavyHitters(
        sketch_path=str(tmp_path / "sketch"),
        cand_path=str(tmp_path / "cand"), rows=3, width=64)
    b0 = spark.createDataFrame([(1, "x y z x x y")],
                               "doc_id long, text string")
    hh.process_batch(b0, 0)
    batch_cells = {(r.row, r.bucket): r.cnt
                   for r in X.cms_sketch(b0, 3, 64).collect()}
    merged = {(r.row, r.bucket): r.cnt
              for r in hh.merged_sketch(spark).collect()}
    assert merged == batch_cells
    assert max(r.row for r in hh.merged_sketch(spark).collect()) == 2
    top = {r.tok: r.est for r in hh.heavy_hitters(spark).collect()}
    assert top.get("x", 0) >= 3


def test_geometry_mismatch_refused(spark, tmp_path):
    """A handler with a re-tuned geometry must REFUSE a standing store
    built under the old one instead of silently mixing cells."""
    import pytest

    hh = StreamingHeavyHitters(
        sketch_path=str(tmp_path / "sketch"),
        cand_path=str(tmp_path / "cand"), rows=4, width=512)
    hh.process_batch(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string"),
        0)
    retuned = StreamingHeavyHitters(
        sketch_path=str(tmp_path / "sketch"),
        cand_path=str(tmp_path / "cand"), rows=4, width=1024)
    with pytest.raises(ValueError, match="geometry"):
        retuned.merged_sketch(spark)


def test_legacy_store_without_recorded_geometry_still_merges(
        spark, tmp_path):
    """A standing store written BEFORE geometry recording (pre-r8: no
    n_rows/width columns) reads back NULL under the explicit schema.
    NULL means 'built at the then-only module defaults' — a
    default-geometry handler must merge it (ADVICE r8: refusing bricks
    every existing store), while a re-tuned handler still refuses."""
    import pytest
    from pyspark.sql import functions as F

    hh = _handler(tmp_path)
    b0 = spark.createDataFrame([(1, "x y z x")],
                               "doc_id long, text string")
    # legacy write: exactly what the pre-r8 handler persisted
    (X.cms_sketch(b0)
     .withColumn("batch_id", F.lit(0).cast("bigint"))
     .write.mode("overwrite").partitionBy("batch_id")
     .parquet(hh.sketch_path))

    merged = {(r.row, r.bucket): r.cnt
              for r in hh.merged_sketch(spark).collect()}
    batch_cells = {(r.row, r.bucket): r.cnt
                   for r in X.cms_sketch(b0).collect()}
    assert merged == batch_cells

    # ...and a new-geometry batch on top still merges (defaults match)
    hh.process_batch(
        spark.createDataFrame([(2, "x q")], "doc_id long, text string"), 1)
    assert hh.merged_sketch(spark).count() > 0

    retuned = StreamingHeavyHitters(
        sketch_path=hh.sketch_path, cand_path=hh.cand_path,
        rows=X.CMS_ROWS, width=X.CMS_WIDTH * 2)
    with pytest.raises(ValueError, match="pre-recording"):
        retuned.merged_sketch(spark)
