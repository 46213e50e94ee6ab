"""Streaming near-dup: a later micro-batch's document is flagged
against the standing corpus index, distinct documents are not, and
crash-replay of a batch is idempotent (no duplicate index rows, no
self-matching)."""

from __future__ import annotations

import json
import os

from currency_market_pulse_spark.streaming.neardup_stream import (
    StreamingNearDup,
)

BASE = ("the quick brown fox jumps over the lazy dog while the calm "
        "river flows past the old stone bridge at dawn")
NEAR = BASE.replace("dawn", "dusk")          # one token differs
DISTINCT = ("completely unrelated text about parquet row groups and "
            "shuffle partitions in a distributed query engine runtime")


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _handler(tmp_path):
    return StreamingNearDup(
        bands_path=str(tmp_path / "idx_bands"),
        shingles_path=str(tmp_path / "idx_shingles"),
        dups_path=str(tmp_path / "dups"))


def test_stream_flags_cross_batch_near_dup(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", [{"doc_id": 1, "text": BASE}], 1_000_000)
    _write(src / "f2.json", [{"doc_id": 2, "text": NEAR},
                             {"doc_id": 3, "text": DISTINCT}], 1_000_100)

    nd = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = nd.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    dups = {r.new_id: (r.dup_of, r.jaccard)
            for r in spark.read.parquet(nd.dups_path).collect()}
    assert 2 in dups and dups[2][0] == 1 and dups[2][1] >= 0.5
    assert 3 not in dups and 1 not in dups
    idx = spark.read.parquet(nd.bands_path)
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} \
        == {1, 2, 3}


def test_within_batch_near_dup_flagged(spark, tmp_path):
    """Two near-identical docs arriving in the SAME micro-batch: the
    higher id is flagged against the lower (first-owner convention),
    even with no standing index yet."""
    nd = _handler(tmp_path)
    b0 = spark.createDataFrame([(10, BASE), (11, NEAR), (12, DISTINCT)],
                               "doc_id long, text string")
    nd.process_batch(b0, 0)
    dups = {r.new_id: r.dup_of
            for r in spark.read.parquet(nd.dups_path).collect()}
    assert dups == {11: 10}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    nd = _handler(tmp_path)
    b0 = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, NEAR)], "doc_id long, text string")
    nd.process_batch(b0, 0)
    nd.process_batch(b1, 1)
    first_dups = sorted((r.new_id, r.dup_of, r.jaccard) for r in
                        spark.read.parquet(nd.dups_path).collect())
    first_idx = spark.read.parquet(nd.shingles_path).count()

    nd.process_batch(b1, 1)  # crash-replay of the same batch
    replay_dups = sorted((r.new_id, r.dup_of, r.jaccard) for r in
                         spark.read.parquet(nd.dups_path).collect())
    assert replay_dups == first_dups == [(2, 1, replay_dups[0][2])]
    # the replay must not have appended a second copy of batch 1's rows
    assert spark.read.parquet(nd.shingles_path).count() == first_idx


def test_stream_survives_empty_first_batch(spark, tmp_path):
    """A first batch whose docs are all shorter than the shingle width
    produces EMPTY index partitions (no parquet footers); the standing
    index must still read back (explicit schemas, ADVICE r5) and a
    later batch must dedup normally."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", [{"doc_id": 1, "text": "too short"}],
           1_000_000)
    _write(src / "f2.json", [{"doc_id": 2, "text": BASE}], 1_000_100)
    _write(src / "f3.json", [{"doc_id": 3, "text": NEAR}], 1_000_200)

    nd = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = nd.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    dups = {r.new_id: r.dup_of for r in nd.read_dups(spark).collect()}
    assert dups == {3: 2}


def test_read_dups_on_all_empty_partitions(spark, tmp_path):
    """Even when EVERY batch so far flagged nothing, the dup log reads
    back as an empty typed relation — not an inference error."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", [{"doc_id": 1, "text": "x"}], 1_000_000)

    nd = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .json(str(src)))
    q = nd.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = nd.read_dups(spark)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "new_id", "dup_of", "jaccard", "batch_id"]
