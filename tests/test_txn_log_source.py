"""The manifest-log live-view source (sources/txn_log_source.py,
VERDICT r13 directive 1): offsets keyed on the txn sink's per-batch
commit log — O(new batches) per trigger, no directory listing — with
the same exactly-once-across-crash-replay property the listing-based
view proved in test_txn_sink.py, plus the windows unique to the log
protocol (half-published batches deferred, cutoff pruning, missing
manifests loud)."""

from __future__ import annotations

import datetime as dt
import os
import time

import test_txn_sink as tts
from pyspark.sql import Row

from currency_market_pulse_spark.sources.txn_log_source import (
    TxnTradesManifestDataSource, _ManifestStreamReader,
)
from currency_market_pulse_spark.streaming.ingest import read_trades_files
from currency_market_pulse_spark.streaming.importer import run_import
from currency_market_pulse_spark.streaming.txn_sink import (
    TxnParquetTradesSink,
)

SINK_SCHEMA = tts.SINK_SCHEMA


def _trades_df(spark, ids, day=1):
    return spark.createDataFrame([Row(
        user_id=f"u{i}", currency_from="EUR", currency_to="GBP",
        amount_sell_micros=1_000_000 * (i + 1),
        amount_buy_micros=2_000_000,
        rate=2.0 / (i + 1), originating_country="FR",
        time_placed=dt.datetime(2024, 1, day, 12, 0, i)) for i in ids])


def _start_view(spark, root, ckpt, name):
    spark.dataSource.register(TxnTradesManifestDataSource)
    return (spark.readStream.format("txn_trades")
            .option("path", root).load()
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="1 second").start())


def test_manifest_view_equals_batch_read(spark, tmp_path):
    """Batches written through the txn sink surface in the manifest
    view bit-for-bit equal to a batch read — including partition
    columns parsed from the recorded paths — and a batch committed
    while the view is live is picked up without restart."""
    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root)
    for b in range(3):
        sink.write(_trades_df(spark, range(5 * b, 5 * b + 5),
                              day=1 + b % 2), b)
    q = _start_view(spark, root, str(tmp_path / "ckpt"), "mv_eq")
    try:
        assert tts._poll(
            lambda: spark.table("mv_eq").count() >= 15)
        sink.write(_trades_df(spark, range(15, 18), day=2), 3)
        assert tts._poll(
            lambda: spark.table("mv_eq").count() >= 18)
        live = sorted(map(tuple, spark.table("mv_eq").collect()))
        batch = sorted(map(tuple, spark.read.schema(SINK_SCHEMA)
                           .parquet(root).collect()))
        assert live == batch
        assert dict(spark.table("mv_eq").dtypes) == dict(
            spark.read.schema(SINK_SCHEMA).parquet(root).dtypes)
    finally:
        q.stop()


def test_manifest_view_equals_batch_across_crash_replay(spark, tmp_path):
    """The r7 exactly-once claim, now through the LOG-backed view: an
    injected mid-publish crash + replay of the import query never
    double-counts or half-counts in the manifest view (the
    half-published batch is deferred until its files are all
    visible, then ingested exactly once)."""
    src = tmp_path / "in"
    out = str(tmp_path / "out")
    src.mkdir()
    os.makedirs(out, exist_ok=True)
    sink = tts._CrashOnceMidPublishSink(out, crash_batch=1)

    live = _start_view(spark, out, str(tmp_path / "ckpt_live"),
                       "mv_crash")
    try:
        tts._write_ingest_file(src / "f1.json",
                               [tts._trade(i) for i in range(5)])
        q1 = run_import(read_trades_files(spark, str(src)), sink,
                        str(tmp_path / "ckpt"))
        assert tts._poll(lambda: 0 in sink.committed_batches())

        # batch 1: two trade dates -> two final files; crashes after
        # publishing the first.  Its manifest is durable but the
        # batch is HALF-published — the view must not ingest it yet.
        tts._write_ingest_file(
            src / "f2.json",
            [tts._trade(i + 10, day=19) for i in range(3)]
            + [tts._trade(i + 20, day=20) for i in range(3)])
        assert tts._poll(lambda: q1.exception() is not None)
        assert "injected mid-publish crash" in str(q1.exception())
        q1.stop()
        time.sleep(3)   # several view triggers over the crashed state
        assert spark.table("mv_crash").count() == 5  # batch 0 only

        # restart: replay rolls the sink forward; then one more batch
        q2 = run_import(read_trades_files(spark, str(src)), sink,
                        str(tmp_path / "ckpt"))
        try:
            assert tts._poll(
                lambda: sorted(sink.committed_batches()) == [0, 1])
            tts._write_ingest_file(
                src / "f3.json",
                [tts._trade(i + 30, day=21) for i in range(4)])
            assert tts._poll(lambda: 2 in sink.committed_batches())
        finally:
            q2.stop()

        batch_df = spark.read.schema(SINK_SCHEMA).parquet(out)
        expect = batch_df.count()
        assert expect == 15
        assert tts._poll(
            lambda: spark.table("mv_crash").count() == expect)
        time.sleep(3)   # ...and STAYS equal (double-count would land)
        live_rows = sorted(tuple(r) for r in
                           spark.table("mv_crash").collect())
        batch_rows = sorted(tuple(r) for r in batch_df.collect())
        assert live_rows == batch_rows
    finally:
        live.stop()


def test_latest_offset_defers_half_published_batch(spark, tmp_path):
    """Unit-level: latestOffset stops BEFORE a batch whose manifest is
    committed but whose recorded files are not all visible yet (the
    sink's roll-forward window), and advances once publication
    completes.  No listing is involved — only keyed probes."""
    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root)
    sink.write(_trades_df(spark, range(3)), 0)
    reader = _ManifestStreamReader({"path": root})
    assert reader.latestOffset() == {"batch": 0}

    # batch 1 stuck mid-publish: stage + manifest, then un-publish one
    # recorded file back to its staged path
    sink.write(_trades_df(spark, range(3, 6)), 1)
    import json as _json
    with open(os.path.join(root, "_txn", "batch=1.json")) as f:
        rec = _json.load(f)
    staged_rel, final_rel = rec["files"][0]
    os.makedirs(os.path.dirname(os.path.join(root, staged_rel)),
                exist_ok=True)
    os.replace(os.path.join(root, final_rel),
               os.path.join(root, staged_rel))
    stuck = _ManifestStreamReader({"path": root})
    assert stuck.latestOffset() == {"batch": 0}
    sink._publish(1)   # roll forward completes
    assert stuck.latestOffset() == {"batch": 1}
    parts = stuck.partitions({"batch": -1}, {"batch": 1})
    assert {p.batch_id for p in parts} == {0, 1}
    assert all(os.path.exists(p.file_path) for p in parts)


def test_cutoff_date_prunes_at_source(spark, tmp_path):
    """cutoffDate drops files whose recorded trade_date partition
    predates it — planned AWAY, not read-and-filtered."""
    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root)
    sink.write(_trades_df(spark, range(3), day=1), 0)   # 2024-01-01
    sink.write(_trades_df(spark, range(3, 6), day=9), 1)  # 2024-01-09
    reader = _ManifestStreamReader(
        {"path": root, "cutoffdate": "2024-01-05"})
    end = reader.latestOffset()
    parts = reader.partitions({"batch": -1}, end)
    assert parts and all(p.trade_date == "2024-01-09" for p in parts)


def test_missing_manifest_for_committed_range_is_loud(spark, tmp_path):
    """A manifest vanishing under a checkpointed offset range breaks
    the write-once invariant — the source raises instead of silently
    skipping data."""
    import pytest

    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root)
    sink.write(_trades_df(spark, range(3)), 0)
    reader = _ManifestStreamReader({"path": root})
    end = reader.latestOffset()
    os.remove(os.path.join(root, "_txn", "batch=0.json"))
    with pytest.raises(IOError, match="write-once invariant"):
        reader.partitions({"batch": -1}, end)


def test_fresh_reader_discovers_deep_log_in_log_n(tmp_path, monkeypatch):
    """A fresh reader attaching to a deep commit log finds the tip by
    exponential probe + bisect on the contiguous id sequence —
    O(log N) existence checks, not O(N) (the boot-cost half of the
    bounded-view argument; steady state is O(new) either way)."""
    import json as _json
    import os

    root = str(tmp_path / "trades")
    txn = os.path.join(root, "_txn")
    os.makedirs(txn)
    n_batches = 5000
    for b in range(n_batches):
        with open(os.path.join(txn, f"batch={b}.json"), "w") as f:
            _json.dump({"batch_id": b, "files": []}, f)

    calls = {"n": 0}
    real_exists = os.path.exists

    def counting_exists(p):
        calls["n"] += 1
        return real_exists(p)

    monkeypatch.setattr(os.path, "exists", counting_exists)
    reader = _ManifestStreamReader({"path": root})
    assert reader.latestOffset() == {"batch": n_batches - 1}
    # exponential (~13) + bisect (~13) + the tip walk's constant tail
    assert calls["n"] <= 40, calls["n"]
    # steady state: no new manifests -> O(1)
    calls["n"] = 0
    assert reader.latestOffset() == {"batch": n_batches - 1}
    assert calls["n"] <= 3, calls["n"]


def test_fresh_reader_defers_mid_publish_tip_after_crash(spark, tmp_path):
    """Restart-before-roll-forward: a fresh reader over a log whose
    TIP batch is mid-publish (manifest durable, a file missing) must
    report the tip-1 offset — never serve a half-published batch —
    then advance once the replayed import rolls the tip forward."""
    import json as _json
    import os

    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root)
    for b in range(4):
        sink.write(_trades_df(spark, range(3 * b, 3 * b + 3)), b)
    # regress the TIP to mid-publish (file back to its staged path)
    with open(os.path.join(root, "_txn", "batch=3.json")) as f:
        rec = _json.load(f)
    staged_rel, final_rel = rec["files"][0]
    os.makedirs(os.path.dirname(os.path.join(root, staged_rel)),
                exist_ok=True)
    os.replace(os.path.join(root, final_rel),
               os.path.join(root, staged_rel))

    fresh = _ManifestStreamReader({"path": root})
    assert fresh.latestOffset() == {"batch": 2}
    sink._publish(3)
    assert fresh.latestOffset() == {"batch": 3}


# ---- txn-log checkpoint compaction (VERDICT r14 directive 2) --------

def _fabricate_log(root, n, files_per_batch=1, undated_at=()):
    """Hand-build a txn log: n contiguous manifests, each recording
    files_per_batch published (empty) data files; batches in
    ``undated_at`` record a path with NO trade_date= partition."""
    import json as _json

    txn = os.path.join(root, "_txn")
    os.makedirs(txn, exist_ok=True)
    for b in range(n):
        files = []
        for k in range(files_per_batch):
            if b in undated_at:
                rel = f"batch_id={b}/txn-{k}.parquet"
            else:
                rel = (f"trade_date=2024-01-{1 + b % 9:02d}/"
                       f"batch_id={b}/txn-{k}.parquet")
            final = os.path.join(root, rel)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            open(final, "w").close()
            files.append([f"_staged/batch={b}/part-{k}", rel])
        with open(os.path.join(txn, f"batch={b}.json"), "w") as f:
            _json.dump({"batch_id": b, "files": files}, f)


def _part_key(p):
    return (p.batch_id, p.file_path, p.trade_date)


def test_checkpoint_bounds_rebuild_manifest_reads(tmp_path, monkeypatch):
    """With checkpoints every 8 batches, a from-scratch rebuild over a
    50-batch log reads ONE columnar checkpoint + only the <=interval
    manifest suffix (2 JSONs here), not O(committed batches) — and
    the planned partitions are bit-equal to the uncompacted walk."""
    from currency_market_pulse_spark.sources import txn_log_source as tls

    root = str(tmp_path / "trades")
    _fabricate_log(root, 50)
    sink = TxnParquetTradesSink(root, checkpoint_every=8)
    for b in range(50):
        sink._maybe_checkpoint(b)
    ptr = sink.read_checkpoint_pointer()
    assert ptr == {"batch": 47, "file": "checkpoint=47.parquet"}

    calls = {"n": 0}
    real = tls._read_manifest

    def counting(r, b):
        calls["n"] += 1
        return real(r, b)

    monkeypatch.setattr(tls, "_read_manifest", counting)
    reader = _ManifestStreamReader({"path": root})
    end = reader.latestOffset()
    assert end == {"batch": 49}
    calls["n"] = 0        # isolate the REBUILD's planning reads
    parts = reader.partitions({"batch": -1}, end)
    assert calls["n"] == 2, calls["n"]       # only the 48, 49 suffix
    assert len(parts) == 50

    # bit-equality with the uncompacted rebuild: same partitions, the
    # only difference is how many tiny JSONs were opened
    os.remove(os.path.join(root, "_txn", "_last_checkpoint"))
    calls["n"] = 0
    plain = _ManifestStreamReader({"path": root}).partitions(
        {"batch": -1}, end)
    assert calls["n"] == 50
    assert sorted(map(_part_key, parts)) == sorted(map(_part_key, plain))


def test_checkpoint_incremental_and_replay_safe(tmp_path):
    """Each checkpoint builds from the previous one + the manifest
    suffix; a replayed older batch neither rewrites an existing
    checkpoint nor moves the pointer backwards."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "trades")
    _fabricate_log(root, 32, files_per_batch=2)
    sink = TxnParquetTradesSink(root, checkpoint_every=8)
    for b in range(32):
        sink._maybe_checkpoint(b)
    assert sink.read_checkpoint_pointer()["batch"] == 31
    t = pq.read_table(os.path.join(root, "_txn",
                                   "checkpoint=31.parquet"))
    assert t.num_rows == 64          # full history, 2 files x 32
    assert sorted(set(t.column("batch_id").to_pylist())) == list(range(32))
    before = open(os.path.join(root, "_txn",
                               "checkpoint=15.parquet"), "rb").read()
    sink._maybe_checkpoint(15)       # crash-replay of an old batch
    after = open(os.path.join(root, "_txn",
                              "checkpoint=15.parquet"), "rb").read()
    assert before == after           # write-once
    assert sink.read_checkpoint_pointer()["batch"] == 31  # not moved


def test_cutoff_drops_undated_files_pinned(tmp_path):
    """cutoffDate semantics pinned (ADVICE r14 low): with a cutoff
    set, files recording NO trade_date partition are dropped —
    matching the listing view mode, whose trade_date >= cutoff filter
    drops null-trade_date rows — in BOTH the manifest walk and the
    checkpoint-served prefix.  Without a cutoff they are kept."""
    root = str(tmp_path / "trades")
    _fabricate_log(root, 6, undated_at={2, 3})

    def dates(reader):
        parts = reader.partitions({"batch": -1},
                                  reader.latestOffset())
        return sorted({p.trade_date for p in parts}), len(parts)

    ds, n = dates(_ManifestStreamReader({"path": root}))
    assert "" in ds and n == 6                      # no cutoff: kept
    ds, n = dates(_ManifestStreamReader(
        {"path": root, "cutoffdate": "2024-01-01"}))
    assert "" not in ds and n == 4                  # cutoff: dropped
    # same semantics when the prefix comes from a checkpoint
    sink = TxnParquetTradesSink(root, checkpoint_every=6)
    for b in range(6):
        sink._maybe_checkpoint(b)
    assert sink.read_checkpoint_pointer()["batch"] == 5
    ds, n = dates(_ManifestStreamReader(
        {"path": root, "cutoffdate": "2024-01-01"}))
    assert "" not in ds and n == 4


def test_view_rebuild_through_checkpoint_equals_batch(spark, tmp_path):
    """End-to-end: a fresh manifest view attaching to a checkpointed
    sink (rebuild served checkpoint-first) produces exactly the batch
    read — same rows, same dtypes."""
    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root, checkpoint_every=2)
    for b in range(5):
        sink.write(_trades_df(spark, range(4 * b, 4 * b + 4),
                              day=1 + b % 3), b)
    assert sink.read_checkpoint_pointer()["batch"] == 3
    q = _start_view(spark, root, str(tmp_path / "ckpt"), "mv_cp")
    try:
        assert tts._poll(lambda: spark.table("mv_cp").count() >= 20)
        live = sorted(map(tuple, spark.table("mv_cp").collect()))
        batch = sorted(map(tuple, spark.read.schema(SINK_SCHEMA)
                           .parquet(root).collect()))
        assert live == batch
    finally:
        q.stop()


def test_manifest_retention_bounds_file_count(tmp_path):
    """VERDICT r15 directive 2: with retain_manifests set, _txn/ holds
    O(interval + retain + retain_checkpoints) FILES after N batches —
    manifests at or below the durable checkpoint floor and checkpoints
    beyond the newest retain_checkpoints are deleted — and rebuild
    planning over the retained log is bit-equal to the unretained
    twin's."""
    roots = {}
    for tag, retain in (("ret", 6), ("full", None)):
        root = str(tmp_path / tag)
        _fabricate_log(root, 40, files_per_batch=2)
        sink = TxnParquetTradesSink(root, checkpoint_every=8,
                                    retain_manifests=retain,
                                    retain_checkpoints=2)
        for b in range(40):
            sink._maybe_checkpoint(b)
        roots[tag] = root

    names = sorted(os.listdir(os.path.join(roots["ret"], "_txn")))
    # pointer at 39, floor 39-6=33: manifests 34..39 survive
    assert ([n for n in names if n.startswith("batch=")]
            == [f"batch={b}.json" for b in range(34, 40)])
    # checkpoints fired at 7,15,23,31,39; newest 2 survive
    assert ([n for n in names if n.startswith("checkpoint=")]
            == ["checkpoint=31.parquet", "checkpoint=39.parquet"])
    assert "_last_checkpoint" in names
    assert len(names) == 6 + 2 + 1      # the file-count bound itself
    # the unretained twin keeps everything
    full_names = os.listdir(os.path.join(roots["full"], "_txn"))
    assert len([n for n in full_names if n.startswith("batch=")]) == 40

    # tip discovery + rebuild planning equal across the twins
    def rel_keys(root, parts):
        return sorted((p.batch_id, os.path.relpath(p.file_path, root),
                       p.trade_date) for p in parts)

    r_ret = _ManifestStreamReader({"path": roots["ret"]})
    r_full = _ManifestStreamReader({"path": roots["full"]})
    end = r_ret.latestOffset()
    assert end == r_full.latestOffset() == {"batch": 39}
    assert (rel_keys(roots["ret"],
                     r_ret.partitions({"batch": -1}, end))
            == rel_keys(roots["full"],
                        r_full.partitions({"batch": -1}, end)))


def test_reader_resume_below_retention_floor(tmp_path):
    """A reader whose committed offset fell below the retention floor
    while it was down must neither stall nor raise: latestOffset
    jumps the cursor forward via the pointer (batches <= pointer are
    committed AND published — the pointer commits only after its
    checkpoint, which follows the publish), and partitions() serves
    the gap from the checkpoint.  Planned files equal the unretained
    twin's for the same range."""
    roots = {}
    for tag, retain in (("ret", 4), ("full", None)):
        root = str(tmp_path / tag)
        _fabricate_log(root, 40)
        sink = TxnParquetTradesSink(root, checkpoint_every=8,
                                    retain_manifests=retain)
        for b in range(40):
            sink._maybe_checkpoint(b)
        roots[tag] = root
    # floor = 39 - 4 = 35: manifest 11 is long gone
    assert not os.path.exists(os.path.join(
        roots["ret"], "_txn", "batch=11.json"))

    # restart path: engine re-plans (10, 39] from its own checkpoint
    def rel_keys(root, parts):
        return sorted((p.batch_id, os.path.relpath(p.file_path, root),
                       p.trade_date) for p in parts)

    r = _ManifestStreamReader({"path": roots["ret"]})
    assert r.latestOffset() == {"batch": 39}
    parts = r.partitions({"batch": 10}, {"batch": 39})
    full = _ManifestStreamReader({"path": roots["full"]}).partitions(
        {"batch": 10}, {"batch": 39})
    assert rel_keys(roots["ret"], parts) == rel_keys(roots["full"], full)

    # live-cursor path: a reader instance whose cached cursor sits
    # below the floor jumps forward instead of stalling at n forever
    stale = _ManifestStreamReader({"path": roots["ret"]})
    stale._last = 10
    assert stale.latestOffset() == {"batch": 39}
    # single-step range whose manifest was retained-away also plans
    # from the checkpoint instead of raising
    one = _ManifestStreamReader({"path": roots["ret"]}).partitions(
        {"batch": 11}, {"batch": 12})
    one_full = _ManifestStreamReader({"path": roots["full"]}).partitions(
        {"batch": 11}, {"batch": 12})
    assert rel_keys(roots["ret"], one) == rel_keys(roots["full"], one_full)


def test_retention_crash_windows(tmp_path, monkeypatch):
    """Retention runs strictly AFTER the pointer fsync and every step
    is idempotent: a crash mid-sweep leaves stragglers below the
    floor (harmless — contiguity above the floor holds), and the
    replayed batch's sweep finishes the job."""
    import pytest as _pytest

    root = str(tmp_path / "trades")
    _fabricate_log(root, 24)
    sink = TxnParquetTradesSink(root, checkpoint_every=8,
                                retain_manifests=4)
    real_remove = os.remove
    calls = {"n": 0}

    def flaky(path):
        if os.path.basename(path).startswith("batch="):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected crash mid-retention")
        real_remove(path)

    for b in range(24):
        if b == 15:
            monkeypatch.setattr(os, "remove", flaky)
            with _pytest.raises(RuntimeError, match="injected"):
                sink._maybe_checkpoint(b)
            monkeypatch.setattr(os, "remove", real_remove)
            # pointer is already durable; stragglers below the floor
            # remain but break nothing
            r = _ManifestStreamReader({"path": root})
            assert r.latestOffset() == {"batch": 23}
            # replay of the same batch finishes the sweep
            sink._maybe_checkpoint(b)
        else:
            sink._maybe_checkpoint(b)
    names = sorted(os.listdir(os.path.join(root, "_txn")))
    assert ([n for n in names if n.startswith("batch=")]
            == [f"batch={b}.json" for b in range(20, 24)])
    r = _ManifestStreamReader({"path": root})
    end = r.latestOffset()
    assert end == {"batch": 23}
    assert len(r.partitions({"batch": -1}, end)) == 24


def test_retention_validation():
    """retain_manifests without a checkpoint (nothing would make the
    deleted manifests re-derivable) and degenerate retain values are
    rejected up front."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="checkpoint_every"):
        TxnParquetTradesSink("x", retain_manifests=4)
    with _pytest.raises(ValueError, match="retain_manifests"):
        TxnParquetTradesSink("x", checkpoint_every=4,
                             retain_manifests=0)
    with _pytest.raises(ValueError, match="retain_checkpoints"):
        TxnParquetTradesSink("x", checkpoint_every=4,
                             retain_manifests=4, retain_checkpoints=0)


def test_view_over_retained_log_equals_batch(spark, tmp_path):
    """End-to-end with real data: a live manifest view over a sink
    running checkpoint compaction + manifest retention reads exactly
    the rows a batch read sees — the retention sweep never touches
    data files, only re-derivable control JSONs."""
    root = str(tmp_path / "trades")
    sink = TxnParquetTradesSink(root, checkpoint_every=3,
                                retain_manifests=3)
    for b in range(10):
        sink.write(_trades_df(spark, range(3 * b, 3 * b + 3),
                              day=1 + b % 2), b)
    # retention really engaged (pointer 8, floor 5)
    assert not os.path.exists(os.path.join(root, "_txn", "batch=0.json"))
    q = _start_view(spark, root, str(tmp_path / "ckpt"), "ret_view")
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select user_id, amount_sell_micros, trade_date, batch_id "
            "from ret_view").collect()
    finally:
        q.stop()
    want = (spark.read.schema(SINK_SCHEMA).parquet(root)
            .selectExpr("user_id", "amount_sell_micros",
                        "trade_date", "batch_id").collect())
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) == 30


def _mk_log(tmp_path, n_batches: int) -> str:
    """A bare commit log of trivially-complete manifests."""
    import json as _json

    root = str(tmp_path / "trades")
    txn = os.path.join(root, "_txn")
    os.makedirs(txn, exist_ok=True)
    for b in range(n_batches):
        with open(os.path.join(txn, f"batch={b}.json"), "w") as f:
            _json.dump({"batch_id": b, "files": []}, f)
    return root


def _hide_manifests(monkeypatch, hidden: set):
    """Inject stale-negative HEAD on manifest keys: ids in ``hidden``
    are durably on disk but invisible to BOTH discovery seams (the
    os.path.exists probe and the manifest read), the way an
    eventually-consistent object store serves 404 for a key another
    writer just PUT.  Mutate ``hidden`` to settle visibility."""
    import re

    from currency_market_pulse_spark.sources import txn_log_source as tls

    real_exists = os.path.exists
    real_read = tls._read_manifest

    def _hidden_path(p):
        m = re.search(r"batch=(\d+)\.json$", str(p))
        return m is not None and int(m.group(1)) in hidden

    monkeypatch.setattr(
        os.path, "exists",
        lambda p: (not _hidden_path(p)) and real_exists(p))
    monkeypatch.setattr(
        tls, "_read_manifest",
        lambda root, b: None if b in hidden else real_read(root, b))


def test_stale_manifest_head_stalls_never_skips(tmp_path, monkeypatch):
    """Consistency-contract direction 1 (VERDICT r16 directive 6): a
    committed manifest whose HEAD is stale-negative makes the view
    UNDER-read — the contiguous walk halts at the invisible id and a
    later-visible successor is never admitted over it — and the view
    converges to the full committed set once visibility settles.  A
    skipped batch (gap in served data) is structurally impossible."""
    root = _mk_log(tmp_path, 5)
    reader = _ManifestStreamReader({"path": root})
    assert reader.latestOffset() == {"batch": 4}

    # two more commits land; batch=5's manifest HEAD is stale while
    # batch=6's already settled (listings are not ordered)
    import json as _json
    for b in (5, 6):
        with open(os.path.join(root, "_txn", f"batch={b}.json"),
                  "w") as f:
            _json.dump({"batch_id": b, "files": []}, f)
    hidden = {5}
    _hide_manifests(monkeypatch, hidden)
    # the walk stops at the stale id: offset holds at 4, NOT 6
    assert reader.latestOffset() == {"batch": 4}
    assert reader.latestOffset() == {"batch": 4}  # stable while stale
    # visibility settles -> the next trigger serves 5 AND 6, in order
    hidden.clear()
    assert reader.latestOffset() == {"batch": 6}


def test_fresh_discovery_under_stale_head_misses_at_most_window(
        tmp_path, monkeypatch):
    """Consistency-contract direction 2: a FRESH reader whose tip
    probe lands inside the staleness window discovers a lower tip —
    it serves only committed batches (never an uncommitted or
    half-visible one) and misses the newest commit for at most the
    staleness window, converging on the next trigger."""
    root = _mk_log(tmp_path, 10)
    hidden = {9}
    _hide_manifests(monkeypatch, hidden)
    reader = _ManifestStreamReader({"path": root})
    # tip probe under staleness: 8 — a committed batch, one short
    assert reader.latestOffset() == {"batch": 8}
    hidden.clear()
    # settled: the standing walk picks up the missed commit
    assert reader.latestOffset() == {"batch": 9}


def test_retention_sweep_skips_unparseable_names(tmp_path):
    """ADVICE r16 (low): a stray file matching the manifest/checkpoint
    prefix+suffix but not the numeric shape (editor backup, manual
    "batch=5 (1).json" copy) must not raise out of the sink's commit
    path — the sweep skips it and still enforces the bound on real
    entries."""
    root = str(tmp_path / "stray")
    _fabricate_log(root, 20, files_per_batch=1)
    txn = os.path.join(root, "_txn")
    with open(os.path.join(txn, "batch=5 (1).json"), "w") as f:
        f.write("{}")
    with open(os.path.join(txn, "checkpoint=old.parquet"), "w") as f:
        f.write("x")
    sink = TxnParquetTradesSink(root, checkpoint_every=4,
                                retain_manifests=4,
                                retain_checkpoints=2)
    for b in range(20):
        sink._maybe_checkpoint(b)    # raises before the fix
    names = set(os.listdir(txn))
    # strays untouched (not parseable => not provably re-derivable)
    assert "batch=5 (1).json" in names
    assert "checkpoint=old.parquet" in names
    # the real bound still holds: pointer 19, floor 15 -> 16..19 live
    assert ([n for n in sorted(names) if n.startswith("batch=")
             and n != "batch=5 (1).json"]
            == [f"batch={b}.json" for b in range(16, 20)])
