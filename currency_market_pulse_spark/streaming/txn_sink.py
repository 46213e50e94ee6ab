"""Write-once transactional parquet sink: exactly-once for FILE-STREAM
readers, not just batch readers.

Why the plain sink is not enough (streaming/pipeline.py's documented
gap, closed by this module — VERDICT r7 directive 3): the batch-id
dynamic partition overwrite of ``ParquetTradesSink`` makes STORAGE
exactly-once (a replayed batch overwrites its own partition), but every
replay writes NEW part-file names into that partition.  A downstream
``readStream.parquet`` file source keys its seen-set on file PATHS —
it has already ingested the old names, so the rewrite's fresh names
count as new input and the live view double-counts the batch.  The
production fix is a table format with snapshot isolation (Delta /
Iceberg), whose streaming reader keys on versioned commits; neither
jar ships in this container, so this module implements the property
those formats provide that the live view actually needs:

    **every visible data file is write-once** — a path, once visible
    to readers, never changes content, never disappears, and is never
    re-added.  Under that invariant a path-keyed file stream is
    exactly-once by construction, whatever crashes and replays happen
    on the write side.

Commit protocol per micro-batch B (the compaction module's
manifest-rename discipline, streaming/compaction.py, applied to batch
publication; all control files are underscore-prefixed and therefore
invisible to Spark's listings):

1. **Stage**: write the batch, date-partitioned, to
   ``_staged/batch=B/`` (mode=overwrite — an UNCOMMITTED crashed
   attempt is replaced wholesale; it was never visible).
2. **Commit point**: enumerate the staged part files, assign each a
   deterministic final path ``trade_date=D/batch_id=B/txn-<k>.parquet``,
   and record the (staged -> final) pairs in a manifest written via
   tmp + ``os.replace`` — ONE atomic rename is the whole commit.
3. **Publish**: ``os.replace`` each staged file to its final path
   (atomic per file, idempotent to re-run: final-exists means done).
4. Remove the empty staged dir.

Crash analysis (every window):

- before step 2: nothing visible; replay deletes the staged leftovers
  and regenerates.  The visible tree is untouched.
- after step 2, anywhere inside step 3: the manifest is durable, so
  the replay ROLLS FORWARD — it republishes from the RECORDED
  manifest and never regenerates data.  Final names and file contents
  come from the original attempt (staged files persist until their
  rename), so each final path becomes visible exactly once, with one
  content, ever.
- after step 4 (crash before the checkpoint commits): the replayed
  ``write`` finds the manifest, re-runs the (now no-op) publish, and
  returns — storage unchanged, no new paths, the file stream sees
  nothing.

A manifest, once written, is kept (tiny — one JSON per batch): it is
the idempotency record that makes a late replay a no-op, exactly the
role the txn log plays in Delta.  Layout compatibility: final files
live under the same ``trade_date=D/batch_id=B/`` tree as
``ParquetTradesSink``, so batch readers, the live-view schema, and
partition pruning are unchanged.  Do NOT run the compactor on a
partition a live file stream is still reading — compaction retires
visible paths, which intentionally violates write-once (the
compactor's own concurrent-reader caveat).

At 100 TB: staging cost is the same parquet write the plain sink
does; publish is O(files) metadata renames; the manifest is KBs.
Micro-batches are 1 s flushes, so per-batch file counts are small by
construction.

DURABILITY SCOPE (ADVICE r8, tightened ADVICE r9): the commit point
is ``os.replace`` on a local or shared POSIX filesystem — every
staged payload file and its directory is fsynced BEFORE the manifest
is written, and the manifest tmp file and the ``_txn`` directory are
fsynced around the rename, so a durable manifest only ever
references durable staged bytes and the whole commit survives power
loss on such filesystems.

OBJECT-STORE PUBLICATION (``publication="put"``, r15): stores like
S3 have no rename.  Inventory of renames in this protocol: (a) the
manifest/checkpoint commits are SAME-DIRECTORY tmp+replace — the
local emulation of one atomic object PUT, which a real store
provides natively; (b) the only true CROSS-DIRECTORY rename is the
staged -> final move in step 3.  ``publication="put"`` replaces (b)
with a copy+fsync materialized atomically (hidden tmp + same-dir
replace = the atomic-PUT emulation, exactly segment_store.py's fault
model: a failed real PUT creates no object, so "torn final object"
is out of scope; "some finals present, others not" is the window,
and the fault hook drives every such point).  The recovery analysis
is UNCHANGED because roll-forward was already copy-tolerant: a
final's existence is the per-file done marker, staged files persist
until the batch-level cleanup, and the staged+final-coexist window
put-mode introduces is exactly the idempotent-skip branch.  Readers
that must never see a half-published BATCH consult the manifests —
the manifest-log view source (sources/txn_log_source.py) already
does (existence probe = HEAD); plain listing-based batch reads see
per-file-atomic but batch-partial state in EITHER mode (files
publish one at a time), which is why the view is log-fed.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from currency_market_pulse_spark.streaming.importer import Sink

_TXN_DIR = "_txn"
_STAGED_DIR = "_staged"


@dataclass
class TxnParquetTradesSink(Sink):
    """Date-partitioned parquet with manifest-committed write-once
    publication; see the module docstring for the protocol."""

    path: str
    #: Delta-style checkpoint compaction of the txn log (VERDICT r14
    #: directive 2): every N committed batches, aggregate the full
    #: published-file set into ONE parquet checkpoint at
    #: ``_txn/checkpoint=<B>.parquet`` plus a ``_txn/_last_checkpoint``
    #: pointer (tmp+rename, like the manifests).  A manifest-log view
    #: reader rebuilding from scratch then reads newest-checkpoint +
    #: manifest suffix instead of O(committed batches) tiny JSONs —
    #: the r14 verdict's ~1 min at a million batches becomes one
    #: columnar read + <=N JSON reads.  None = off.
    checkpoint_every: int | None = None
    #: manifest retention bounded by checkpoints (VERDICT r15
    #: directive 2): once a checkpoint at batch B is durable (the
    #: ``_last_checkpoint`` pointer commits strictly after it),
    #: every manifest with id <= B - retain_manifests is re-derivable
    #: from that checkpoint — so keep ``_txn/`` at O(interval +
    #: retain + retain_checkpoints) FILES instead of one tiny JSON
    #: per committed batch forever (a million-batch log is a
    #: million-object listing/inode burden even if never read).
    #: Deletion happens strictly after the pointer fsync, so a crash
    #: mid-retention leaves only harmless stragglers below the floor;
    #: contiguity ABOVE the floor is preserved (readers probe from
    #: the pointer, sources/txn_log_source.py).  Replay idempotency
    #: is untouched for retained ids; a replay of a retention-deleted
    #: batch id cannot occur (Structured Streaming replays only the
    #: LAST uncommitted batch, and the floor trails the tip by
    #: >= max(retain_manifests, interval)).  Requires
    #: checkpoint_every.  None = keep every manifest (default).
    retain_manifests: int | None = None
    #: how many newest checkpoint files to keep once a newer one is
    #: durable (the pointed-to checkpoint is never deleted).
    retain_checkpoints: int = 2
    #: file publication mode: "rename" (one cross-directory
    #: os.replace per file — POSIX/HDFS) or "put" (object-store twin:
    #: copy+fsync materialized as one atomic PUT, no cross-directory
    #: rename anywhere — module docstring OBJECT-STORE PUBLICATION).
    publication: str = "rename"
    #: optional fault hook for put-mode crash-window tests: called
    #: with ``put:<final_rel>`` before each final object lands;
    #: raising simulates the crash (tests/test_txn_sink.py).
    fault: "object | None" = None

    def __post_init__(self):
        if self.publication not in ("rename", "put"):
            raise ValueError(f"unknown publication "
                             f"{self.publication!r} "
                             "(expected 'rename' or 'put')")
        if self.retain_manifests is not None:
            if not self.checkpoint_every:
                raise ValueError(
                    "retain_manifests requires checkpoint_every: "
                    "manifests may only be deleted once a durable "
                    "checkpoint makes them re-derivable")
            if self.retain_manifests < 1:
                raise ValueError("retain_manifests must be >= 1 "
                                 f"(got {self.retain_manifests})")
        if self.retain_checkpoints < 1:
            raise ValueError("retain_checkpoints must be >= 1 "
                             f"(got {self.retain_checkpoints})")

    # -- path helpers -------------------------------------------------
    def _manifest(self, batch_id: int) -> str:
        return os.path.join(self.path, _TXN_DIR, f"batch={batch_id}.json")

    def _staged(self, batch_id: int) -> str:
        return os.path.join(self.path, _STAGED_DIR, f"batch={batch_id}")

    # -- protocol -----------------------------------------------------
    def write(self, batch: DataFrame, batch_id: int) -> None:
        manifest = self._manifest(batch_id)
        staged = self._staged(batch_id)
        if os.path.exists(manifest):
            # already committed (crash after step 2): roll FORWARD from
            # the recorded manifest; never regenerate data.
            self._publish(batch_id)
            self._maybe_checkpoint(batch_id)
            return
        # uncommitted leftovers from a crashed attempt were never
        # visible; replace them wholesale (mode=overwrite does this,
        # rmtree keeps even an aborted empty dir from surviving)
        shutil.rmtree(staged, ignore_errors=True)
        # repartition by the partition key: ONE file per trade date per
        # batch instead of one per upstream shuffle partition (32 ~60-row
        # files for a 2,000-row flush — measured as the bulk of the
        # import leg's fixed per-batch cost: a 32-task write job plus
        # 36 fsyncs plus 33 publish renames plus 32 new paths PER BATCH
        # for the live view's file stream to track, VERDICT r10
        # directive 3).  A 1 s flush is small by construction; rows
        # within the file stay time-sorted for row-group pruning.  The
        # explicit shuffle (not coalesce) keeps the upstream stateful
        # gateway's partitioning intact.
        (batch
         .withColumn("trade_date", F.to_date("time_placed"))
         .repartition("trade_date")
         .sortWithinPartitions("time_placed")
         .write.mode("overwrite")
         .partitionBy("trade_date")
         .parquet(staged))

        pairs: list[list[str]] = []
        counters: dict[str, int] = {}
        for root, _dirs, names in sorted(os.walk(staged)):
            # fsync every staged payload file and its directory BEFORE
            # the manifest commit (ADVICE r9): a durable manifest must
            # never reference staged bytes still in the page cache —
            # otherwise power loss after the commit point leaves the
            # roll-forward publishing truncated files (silent
            # corruption) or hitting the invariant IOError.
            for name in sorted(names):
                if name.endswith(".parquet"):
                    fd = os.open(os.path.join(root, name), os.O_RDONLY)
                    try:
                        os.fsync(fd)
                    finally:
                        os.close(fd)
            dfd = os.open(root, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(root, staged)
                date_dir = "" if rel_dir == "." else rel_dir
                k = counters.get(date_dir, 0)
                counters[date_dir] = k + 1
                staged_rel = os.path.join(
                    _STAGED_DIR, f"batch={batch_id}",
                    date_dir, name).replace("\\", "/")
                final_rel = os.path.join(
                    date_dir, f"batch_id={batch_id}",
                    f"txn-{k}.parquet").replace("\\", "/")
                pairs.append([staged_rel, final_rel])

        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        tmp = manifest + ".tmp"
        # fsync the payload BEFORE the rename and the directory AFTER
        # (ADVICE r8): os.replace alone orders the rename against
        # nothing — on power loss the manifest could surface empty or
        # the rename itself could vanish.  POSIX-filesystem scope only
        # (module docstring).
        with open(tmp, "w") as f:
            json.dump({"batch_id": int(batch_id), "files": pairs}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, manifest)   # <-- the commit point
        dirfd = os.open(os.path.dirname(manifest), os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)
        self._publish(batch_id)
        self._maybe_checkpoint(batch_id)

    # -- checkpoint compaction of the txn log ---------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.path, _TXN_DIR, "_last_checkpoint")

    def read_checkpoint_pointer(self) -> dict | None:
        """{"batch": B, "file": "checkpoint=B.parquet"} or None.
        Shared with the view source (sources/txn_log_source.py)."""
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _maybe_checkpoint(self, batch_id: int) -> None:
        every = self.checkpoint_every
        if not every or (batch_id + 1) % every:
            return
        cp_name = f"checkpoint={batch_id}.parquet"
        cp_path = os.path.join(self.path, _TXN_DIR, cp_name)
        if os.path.exists(cp_path):
            # a replayed batch re-enters here; the checkpoint (like
            # every control file) is write-once
            self._update_pointer(batch_id, cp_name)
            self._apply_retention()
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        # previous checkpoint (one columnar read) + manifest suffix —
        # the same incremental scheme Delta uses, so each checkpoint
        # write costs O(history) IO but only O(interval) JSON opens
        prev = self.read_checkpoint_pointer()
        if prev is not None and prev["batch"] > batch_id:
            # a newer checkpoint supersedes this (replayed) batch's:
            # nothing to add, and with retention on, the manifests a
            # from-scratch rebuild would walk may be deleted
            return
        batches: list[int] = []
        rels: list[str] = []
        lo = -1
        if prev is not None and prev["batch"] <= batch_id:
            t = pq.read_table(
                os.path.join(self.path, _TXN_DIR, prev["file"]))
            batches = t.column("batch_id").to_pylist()
            rels = t.column("final_rel").to_pylist()
            lo = prev["batch"]
        for b in range(lo + 1, batch_id + 1):
            with open(self._manifest(b)) as f:
                m = json.load(f)
            for _staged_rel, final_rel in m["files"]:
                batches.append(b)
                rels.append(final_rel)
        table = pa.table({
            "batch_id": pa.array(batches, pa.int64()),
            "final_rel": pa.array(rels, pa.string()),
        })
        tmp = cp_path + ".tmp"
        pq.write_table(table, tmp)
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, cp_path)
        self._update_pointer(batch_id, cp_name)
        self._apply_retention()

    def _apply_retention(self) -> None:
        """Delete manifests the durable checkpoint floor makes
        re-derivable, and checkpoints older than the newest
        ``retain_checkpoints``.  Runs strictly AFTER the pointer
        fsync (the pointer is the durability record deletion keys
        on); every step is idempotent and crash-tolerant — a partial
        sweep only leaves extra files, never a gap above the floor."""
        if self.retain_manifests is None:
            return
        ptr = self.read_checkpoint_pointer()
        if ptr is None:
            return
        floor = int(ptr["batch"]) - self.retain_manifests
        txn = os.path.join(self.path, _TXN_DIR)
        try:
            names = os.listdir(txn)
        except OSError:
            return
        cps: list[int] = []
        for name in names:
            # A stray non-numeric entry matching the prefix/suffix
            # (editor backup, manual "batch=5 (1).json" copy) must not
            # raise out of the sink's commit path — skip it (ADVICE r16).
            if name.startswith("batch=") and name.endswith(".json"):
                try:
                    b = int(name[len("batch="):-len(".json")])
                except ValueError:
                    continue
                if b <= floor:
                    try:
                        os.remove(os.path.join(txn, name))
                    except OSError:
                        pass
            elif (name.startswith("checkpoint=")
                    and name.endswith(".parquet")):
                try:
                    cps.append(
                        int(name[len("checkpoint="):-len(".parquet")]))
                except ValueError:
                    continue
        for b in sorted(cps, reverse=True)[self.retain_checkpoints:]:
            if b >= int(ptr["batch"]):
                continue   # never delete the pointed-to checkpoint
            try:
                os.remove(os.path.join(txn, f"checkpoint={b}.parquet"))
            except OSError:
                pass

    def _update_pointer(self, batch_id: int, cp_name: str) -> None:
        cur = self.read_checkpoint_pointer()
        if cur is not None and cur["batch"] >= batch_id:
            return    # never move the pointer backwards (replays)
        ptr = self._pointer_path()
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch": int(batch_id), "file": cp_name}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, ptr)
        dirfd = os.open(os.path.dirname(ptr), os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)

    def _publish(self, batch_id: int) -> None:
        """Step 3+4: idempotent, roll-forward-able file publication."""
        with open(self._manifest(batch_id)) as f:
            recorded = json.load(f)
        for staged_rel, final_rel in recorded["files"]:
            dst = os.path.join(self.path, final_rel)
            if os.path.exists(dst):
                continue               # this file already published
            src = os.path.join(self.path, staged_rel)
            if not os.path.exists(src):
                raise IOError(
                    f"txn sink invariant broken for batch {batch_id}: "
                    f"{final_rel} is unpublished but its staged source "
                    f"{staged_rel} is gone — manual intervention needed")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if self.publication == "rename":
                os.replace(src, dst)   # atomic per file
            else:
                # object-store PUT twin: copy + fsync, materialized
                # atomically (hidden tmp + same-dir replace emulates
                # the store's per-object atomicity); staged persists
                # until the batch-level cleanup below — the
                # staged+final-coexist window is the idempotent-skip
                # branch above
                if self.fault is not None:
                    self.fault(f"put:{final_rel}")
                tmp = os.path.join(
                    os.path.dirname(dst),
                    "." + os.path.basename(dst) + ".put")
                shutil.copyfile(src, tmp)
                fd = os.open(tmp, os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
                os.replace(tmp, dst)
        shutil.rmtree(self._staged(batch_id), ignore_errors=True)

    # -- introspection (tests / ops) -----------------------------------
    def committed_batches(self) -> list[int]:
        txn = os.path.join(self.path, _TXN_DIR)
        if not os.path.isdir(txn):
            return []
        out = []
        for name in os.listdir(txn):
            if name.startswith("batch=") and name.endswith(".json"):
                out.append(int(name[len("batch="):-len(".json")]))
        return sorted(out)

    def visible_files(self) -> list[str]:
        """Relative paths of every reader-visible parquet file."""
        out = []
        for root, dirs, names in os.walk(self.path):
            # prune control dirs exactly the way Spark's listing does
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for name in names:
                if name.endswith(".parquet"):
                    out.append(os.path.relpath(
                        os.path.join(root, name), self.path))
        return sorted(out)
