"""Streaming reservoir (streaming/reservoir_stream.py): the streamed
bottom-k must equal the batch weighted_sample over everything seen,
replay must be byte-idempotent, snapshots must time-travel, repeated
ids must not occupy two slots, and prune must keep the newest."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row, functions as F

import pytest

from currency_market_pulse_spark.operators import sampling as S
from currency_market_pulse_spark.streaming.reservoir_stream import (
    StreamingGroupReservoir, StreamingReservoir,
)


def _docs(i0, n):
    return [{"doc_id": i, "text": f"document body {i}",
             "n_chars": 10 + (i * 37) % 90} for i in range(i0, i0 + n)]


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(**r) for r in rows],
        "doc_id bigint, text string, n_chars bigint")


def _handler(tmp_path, k=8, weight_col="n_chars"):
    return StreamingReservoir(
        reservoir_path=str(tmp_path / "res"), k=k,
        weight_col=weight_col)


def test_stream_equals_batch_weighted_sample(spark, tmp_path):
    """Three micro-batches end at exactly the batch A-ES draw over the
    union — same ids, same keys (es_key is one shared definition)."""
    batches = [_docs(0, 20), _docs(20, 20), _docs(40, 20)]
    res = _handler(tmp_path)
    for i, rows in enumerate(batches):
        res.process_batch(_df(spark, rows), i)

    got = {(r.doc_id, r.weight)
           for r in res.read_reservoir(spark).collect()}
    want = {(r.doc_id, r.weight)
            for r in S.weighted_sample(
                _df(spark, sum(batches, [])), "n_chars", 8).collect()}
    assert got == want and len(got) == 8


def test_replay_is_idempotent(spark, tmp_path):
    res = _handler(tmp_path)
    res.process_batch(_df(spark, _docs(0, 20)), 0)
    res.process_batch(_df(spark, _docs(20, 20)), 1)
    before = sorted((r.doc_id, r.key)
                    for r in res.read_reservoir(spark).collect())

    # crash-replay batch 1 with the same data: predecessor snapshot
    # (batch 0) is re-read, the result overwrites partition 1 unchanged
    res.process_batch(_df(spark, _docs(20, 20)), 1)
    after = sorted((r.doc_id, r.key)
                   for r in res.read_reservoir(spark).collect())
    assert before == after
    parts = {n for n in os.listdir(res.reservoir_path)
             if n.startswith("batch_id=")}
    assert parts == {"batch_id=0", "batch_id=1"}


def test_snapshot_time_travel(spark, tmp_path):
    res = _handler(tmp_path)
    res.process_batch(_df(spark, _docs(0, 20)), 0)
    at0 = {r.doc_id for r in
           res.read_reservoir(spark, at_batch=0).collect()}
    res.process_batch(_df(spark, _docs(20, 20)), 1)

    # the at_batch=0 view is unchanged by batch 1, and equals the
    # batch draw over batch 0 alone
    assert {r.doc_id for r in
            res.read_reservoir(spark, at_batch=0).collect()} == at0
    want0 = {r.doc_id for r in S.weighted_sample(
        _df(spark, _docs(0, 20)), "n_chars", 8).collect()}
    assert at0 == want0


def test_repeated_id_is_first_seen_and_single_slot(spark, tmp_path):
    """A re-ingested doc_id keeps its original payload and never holds
    two reservoir slots (id-coordinated keys)."""
    res = StreamingReservoir(reservoir_path=str(tmp_path / "res"), k=50,
                             weight_col="n_chars")
    res.process_batch(_df(spark, _docs(0, 10)), 0)
    changed = [{"doc_id": 3, "text": "MUTATED", "n_chars": 10 + 111 % 90}]
    res.process_batch(_df(spark, changed + _docs(10, 5)), 1)

    rows = res.read_reservoir(spark).collect()
    assert len({r.doc_id for r in rows}) == len(rows) == 15
    assert [r.text for r in rows if r.doc_id == 3] == ["document body 3"]


def test_uniform_mode_and_weight_filter(spark, tmp_path):
    """weight_col=None draws uniformly; nonpositive weights excluded
    in weighted mode."""
    uni = StreamingReservoir(reservoir_path=str(tmp_path / "uni"), k=5,
                             weight_col=None)
    uni.process_batch(_df(spark, _docs(0, 30)), 0)
    got = {r.doc_id for r in uni.read_reservoir(spark).collect()}
    ones = _df(spark, _docs(0, 30)).withColumn("w", F.lit(1.0))
    want = {r.doc_id for r in S.weighted_sample(ones, "w", 5).collect()}
    assert got == want

    wres = _handler(tmp_path, k=50)
    bad = [{"doc_id": 99, "text": "zero", "n_chars": 0}]
    wres.process_batch(_df(spark, bad + _docs(0, 5)), 0)
    assert 99 not in {r.doc_id
                      for r in wres.read_reservoir(spark).collect()}


def test_prune_keeps_newest(spark, tmp_path):
    res = _handler(tmp_path)
    for i in range(4):
        res.process_batch(_df(spark, _docs(i * 10, 10)), i)
    newest = sorted((r.doc_id, r.key)
                    for r in res.read_reservoir(spark).collect())
    doomed = res.prune(keep_last=2)
    assert sorted(doomed) == ["batch_id=0", "batch_id=1"]
    assert sorted((r.doc_id, r.key)
                  for r in res.read_reservoir(spark).collect()) == newest


def _gdocs(i0, n):
    langs = ["en", "fr", "de"]
    return [{"doc_id": i, "text": f"document body {i}",
             "lang": langs[i % 3], "n_chars": 10 + (i * 37) % 90}
            for i in range(i0, i0 + n)]


def _gdf(spark, rows):
    return spark.createDataFrame(
        [Row(**r) for r in rows],
        "doc_id bigint, text string, lang string, n_chars bigint")


def test_group_reservoir_equals_batch_per_group_draw(spark, tmp_path):
    """Streamed per-lang reservoirs equal weighted_sample_per_group
    over the union, and replay is idempotent."""
    res = StreamingGroupReservoir(
        reservoir_path=str(tmp_path / "gres"), k=4,
        weight_col="n_chars", group_col="lang")
    batches = [_gdocs(0, 18), _gdocs(18, 18)]
    for i, rows in enumerate(batches):
        res.process_batch(_gdf(spark, rows), i)

    got = {(r.lang, r.doc_id)
           for r in res.read_reservoir(spark).collect()}
    want = {(r.lang, r.doc_id)
            for r in S.weighted_sample_per_group(
                _gdf(spark, sum(batches, [])), "lang", "n_chars",
                4).collect()}
    assert got == want and len(got) == 12   # 3 langs x k=4

    res.process_batch(_gdf(spark, batches[1]), 1)   # crash-replay
    assert {(r.lang, r.doc_id)
            for r in res.read_reservoir(spark).collect()} == got


def test_group_reservoir_requires_payload_group(spark, tmp_path):
    with pytest.raises(ValueError, match="payload column"):
        StreamingGroupReservoir(
            reservoir_path=str(tmp_path / "g2"), k=2,
            group_col="source")


def test_end_to_end_readstream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(src / "f1.json", _docs(0, 20), 1_000_000)
    _write(src / "f2.json", _docs(20, 20), 1_000_100)

    res = _handler(tmp_path)
    stream = (spark.readStream
              .schema("doc_id long, text string, n_chars long")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = res.attach(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.doc_id for r in res.read_reservoir(spark).collect()}
    want = {r.doc_id for r in S.weighted_sample(
        _df(spark, _docs(0, 40)), "n_chars", 8).collect()}
    assert got == want
