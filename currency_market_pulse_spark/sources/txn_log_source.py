"""Manifest-log-backed streaming source over the write-once txn sink —
the bounded live-view feed (VERDICT r13 directive 1).

Why it exists: the composed pipeline's live trends view used to be a
``readStream.parquet`` file stream over the sink directory, and a file
stream RE-LISTS the whole directory tree every trigger to diff its
seen-set — O(total files in sink history) driver-side work that the
900 s soak measured growing 1.6 -> 3.7 s view p95 at ~4,000 files.
Unbounded in uptime: at 100x the run length the view stalls regardless
of data rate.

The fix is the one Delta/Iceberg streaming readers use: key the
stream on the table's own COMMIT LOG, not on storage listings.  The
write-once sink (streaming/txn_sink.py) already durably writes one
manifest per micro-batch at ``_txn/batch=<B>.json`` recording exactly
the final data-file paths that batch published — and Structured
Streaming batch ids are CONTIGUOUS from 0 per checkpoint, so the log
needs no listing at all:

- **offset** = the highest fully-published batch id ingested (one
  int);
- **latestOffset** probes ``batch=<n+1>.json`` forward — O(new
  batches) existence checks per trigger, ZERO directory listings, and
  advances over a batch only once every file its manifest records is
  published (the txn sink's crash window between manifest commit and
  publish completion is therefore invisible to the view; replay rolls
  the sink forward and the view picks the batch up next trigger);
- **partitions** are the manifests' recorded file paths (one reader
  task per file; partition values ``trade_date``/``batch_id`` are
  parsed from the recorded path exactly as Spark's partition
  discovery would);
- **read** runs on executors via pyarrow and yields Arrow batches
  cast to the sink schema.

Exactly-once composition: offsets live in the view's checkpoint;
manifests and data files are write-once (txn_sink invariant), so any
replayed (start, end] range re-reads identical bytes.

Boot cost: a fresh reader finds the tip by exponential-probe+bisect
(O(log N) stats), and the first deep ``partitions`` range is served
from the sink's Delta-style txn-log CHECKPOINT when one exists
(``_txn/_last_checkpoint`` -> ``checkpoint=<B>.parquet``, written
every ``checkpoint_every`` committed batches by
streaming/txn_sink.py): ONE columnar read covers every batch <= B,
and only the suffix (< checkpoint interval) walks per-batch manifest
JSONs — the r14 verdict's O(committed batches) rebuild reads are
gone.  Without a checkpoint the rebuild falls back to the manifest
walk.  The ``cutoffDate`` option bounds the REBUILD the same way
``view_rebuild_days`` bounds the listing-based rebuild: files whose
recorded trade_date partition predates the cutoff — or records NO
trade_date at all, matching the listing filter's null-drop — are
skipped at the source, before any read.

Scale note: file access here is local-filesystem ``os.path`` +
pyarrow; on HDFS/S3 the same protocol runs over the object client
(existence probe = HEAD on a known key — still no LIST anywhere).

Object-store consistency contract (VERDICT r16 directive 6, the
marker-store twin): discovery tolerates eventually-consistent HEAD on
manifest keys because every staleness direction is SAFE here:

- **Stale-negative HEAD on a committed manifest**: the forward walk
  stops at the first invisible id, so the view under-reads by at most
  the staleness window and picks the batch up on a later trigger.  No
  batch can be SKIPPED — offsets advance only through contiguous
  manifest ids, so a missed ``batch=n+1`` halts the walk rather than
  jumping over it (a later-visible ``batch=n+2`` is NOT admitted
  until n+1 HEADs).  The one jump path — a resumed reader below the
  retention floor — keys on the ``_last_checkpoint`` pointer, whose
  batches the sink proved committed+published before the pointer
  fsync; it never relies on manifest HEAD at all.
- **Manifest visible before its data files' HEAD settles** (stale-
  positive relative to data): ``_batch_complete`` defers the batch
  until every recorded file HEADs, exactly as it defers the sink's
  mid-publish crash window.

The only operation that would NEED read-after-write HEAD is the
sink's own pointer/manifest write-then-read during commit — and the
sink reads its own writes on the driver, not through discovery.
Both directions are pinned by the stale-HEAD tests in
tests/test_txn_log_source.py.

Reference anchor: the trends service reads a bounded primary-index
range, never a growing catalog (trends/listing/service.go:54-56).

Register per session, then::

    spark.readStream.format("txn_trades")
         .option("path", <sink root>).load()
"""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource, DataSourceStreamReader, InputPartition,
)
from pyspark.sql.types import StructType

#: the sink-side schema (streaming/pipeline.py _SINK_STREAM_SCHEMA):
#: TRADES_SCHEMA plus the partition columns recorded in final paths.
SINK_STREAM_SCHEMA = (
    "user_id string, currency_from string, currency_to string, "
    "amount_sell_micros long, amount_buy_micros long, rate double, "
    "originating_country string, time_placed timestamp, "
    "trade_date date, batch_id long")

_TXN_DIR = "_txn"


@dataclass
class _FilePartition(InputPartition):
    file_path: str
    trade_date: str   # ISO yyyy-mm-dd, '' if the file is undated
    batch_id: int


def _manifest_path(root: str, batch_id: int) -> str:
    return os.path.join(root, _TXN_DIR, f"batch={batch_id}.json")


def _read_manifest(root: str, batch_id: int) -> dict | None:
    try:
        with open(_manifest_path(root, batch_id)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _rel_trade_date(final_rel: str) -> str:
    first = final_rel.replace("\\", "/").split("/", 1)[0]
    if first.startswith("trade_date="):
        return first.split("=", 1)[1]
    return ""


class _ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("txn_trades requires .option('path', ...)")
        cutoff = options.get("cutoffdate") or options.get("cutoffDate")
        self.cutoff = dt.date.fromisoformat(cutoff) if cutoff else None
        self._last = -1   # driver-side cursor cache; re-derived on boot

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"batch": -1}

    def _batch_complete(self, manifest: dict) -> bool:
        """Every file the manifest records is published (the txn
        sink's roll-forward window between manifest commit and the
        last publish rename must never surface a half-visible batch
        to the view)."""
        return all(os.path.exists(os.path.join(self.root, final_rel))
                   for _staged, final_rel in manifest["files"])

    def _read_pointer(self) -> dict | None:
        """The sink's ``_last_checkpoint`` pointer, or None.  Batches
        <= pointer.batch are committed AND fully published (the sink
        advances the pointer only after its checkpoint, which is
        written after the batch's publish completes)."""
        try:
            with open(os.path.join(self.root, _TXN_DIR,
                                   "_last_checkpoint")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _discover_tip(self) -> int:
        """Highest existing manifest id, found by exponential probe +
        bisect on the id sequence — CONTIGUOUS above the retention
        floor (every executed micro-batch writes a manifest; the sink
        deletes manifests only below its durable checkpoint floor,
        streaming/txn_sink.py retain_manifests), so the probe starts
        from the checkpoint pointer, not 0: O(log N) existence
        checks for a fresh reader on a year-deep log.  Returns -1
        for an empty log."""
        exists = (lambda b:
                  os.path.exists(_manifest_path(self.root, b)))
        ptr = self._read_pointer()
        floor = int(ptr["batch"]) if ptr is not None else -1
        lo = floor if floor >= 0 else 0
        if not exists(lo):
            if floor >= 0:
                # the pointer batch itself proves commitment even if
                # retention raced its manifest away (retain >= 1
                # makes this unreachable in the sink's own sweep, but
                # the pointer is the stronger record — trust it)
                return floor
            return -1
        step = 1
        while exists(lo + step):
            lo, step = lo + step, step * 2
        hi = lo + step
        # invariant: exists(lo), not exists(hi), ids contiguous between
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if exists(mid):
                lo = mid
            else:
                hi = mid
        return lo

    def latestOffset(self) -> dict:
        n = self._last
        if n == -1:
            # fresh reader over a possibly deep log: jump near the tip
            # in O(log N), then fall into the completeness walk below
            # (which may step BACK from the tip only via its start
            # point — it never advances over an incomplete batch)
            tip = self._discover_tip()
            # the tip batch (and only it — earlier manifests' files
            # are published, else their own publish couldn't have
            # finished before the next batch ran) may be mid-publish;
            # admit ids below it unconditionally, then let the walk
            # decide the tip itself
            n = max(n, tip - 1)
        elif _read_manifest(self.root, n + 1) is None:
            # a reader resuming after downtime may hold an offset
            # below the sink's retention floor — its next manifests
            # were checkpoint-deleted, not never-written.  The
            # pointer proves every batch <= ptr.batch committed and
            # published, so jump the cursor forward; partitions()
            # serves the jumped range from the checkpoint.
            ptr = self._read_pointer()
            if ptr is not None and int(ptr["batch"]) > n:
                n = int(ptr["batch"])
        while True:
            manifest = _read_manifest(self.root, n + 1)
            if manifest is None or not self._batch_complete(manifest):
                break
            n += 1
        self._last = n
        return {"batch": n}

    # -- planning / reading ------------------------------------------
    def _keep(self, trade_date: str) -> bool:
        """cutoffDate semantics, pinned (ADVICE r14 low): when a
        cutoff is set, UNDATED files (no trade_date= partition in the
        recorded path) are dropped too — matching the listing-based
        view mode, whose ``trade_date >= cutoff`` filter drops
        null-trade_date rows.  The two view_source modes the pipeline
        documents as equivalent now agree for any future sink layout
        that emits unpartitioned files (unreachable with the current
        sink, which filters null time_placed — but the invariant is
        now tested, not assumed)."""
        if self.cutoff is None:
            return True
        if not trade_date:
            return False
        return dt.date.fromisoformat(trade_date) >= self.cutoff

    def _read_checkpoint(self) -> tuple[int, list] | None:
        """(checkpoint_batch, [(batch_id, final_rel), ...]) from the
        newest txn-log checkpoint, or None.  One columnar read via
        the ``_last_checkpoint`` pointer (Delta-style) — written by
        the sink every checkpoint_every batches
        (streaming/txn_sink.py)."""
        try:
            with open(os.path.join(self.root, _TXN_DIR,
                                   "_last_checkpoint")) as f:
                ptr = json.load(f)
        except (OSError, ValueError):
            return None
        import pyarrow.parquet as pq
        try:
            t = pq.read_table(os.path.join(self.root, _TXN_DIR,
                                           ptr["file"]))
        except OSError:
            return None
        return ptr["batch"], list(zip(t.column("batch_id").to_pylist(),
                                      t.column("final_rel").to_pylist()))

    def partitions(self, start: dict, end: dict):
        s, e = int(start["batch"]), int(end["batch"])
        parts: list[_FilePartition] = []
        lo = s
        if e - s > 1 or (e > s
                         and _read_manifest(self.root, s + 1) is None):
            # deep range (rebuild/bootstrap) — or a range whose
            # manifests were retention-deleted while this reader was
            # down: serve the prefix from the newest checkpoint — one
            # parquet read replaces O(range) manifest JSON opens;
            # only the post-checkpoint suffix still walks manifests.
            # Single-batch ranges with a live manifest (the steady-
            # state trigger) skip the pointer probe entirely.
            cp = self._read_checkpoint()
            if cp is not None and cp[0] > s:
                cp_batch, rows = cp
                hi = min(cp_batch, e)
                for b, final_rel in rows:
                    if not (s < b <= hi):
                        continue
                    d = _rel_trade_date(final_rel)
                    if not self._keep(d):
                        continue
                    parts.append(_FilePartition(
                        os.path.join(self.root, final_rel), d, b))
                lo = hi
        for b in range(lo + 1, e + 1):
            manifest = _read_manifest(self.root, b)
            if manifest is None:
                raise IOError(
                    f"txn_trades: manifest for committed batch {b} "
                    f"disappeared from {self.root}/{_TXN_DIR} — the "
                    "write-once invariant is broken")
            for _staged, final_rel in manifest["files"]:
                d = _rel_trade_date(final_rel)
                if not self._keep(d):
                    continue
                parts.append(_FilePartition(
                    os.path.join(self.root, final_rel), d, b))
        return parts

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = pa.schema([
            pa.field("user_id", pa.string()),
            pa.field("currency_from", pa.string()),
            pa.field("currency_to", pa.string()),
            pa.field("amount_sell_micros", pa.int64()),
            pa.field("amount_buy_micros", pa.int64()),
            pa.field("rate", pa.float64()),
            pa.field("originating_country", pa.string()),
            pa.field("time_placed", pa.timestamp("us", tz="UTC")),
            pa.field("trade_date", pa.date32()),
            pa.field("batch_id", pa.int64()),
        ])
        table = pq.read_table(partition.file_path)
        n = table.num_rows
        date_val = (dt.date.fromisoformat(partition.trade_date)
                    if partition.trade_date else None)
        table = table.append_column(
            "trade_date", pa.array([date_val] * n, pa.date32()))
        table = table.append_column(
            "batch_id", pa.array([partition.batch_id] * n, pa.int64()))
        for batch in (table.select(target.names)
                      .cast(target).to_batches()):
            yield batch

    def commit(self, end: dict) -> None:
        pass


class TxnTradesManifestDataSource(DataSource):
    """``format("txn_trades")`` — see the module docstring."""

    @classmethod
    def name(cls):
        return "txn_trades"

    def schema(self):
        return SINK_STREAM_SCHEMA

    def streamReader(self, schema: StructType):
        return _ManifestStreamReader(self.options)
