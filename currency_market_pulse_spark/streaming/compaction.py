"""Compaction for the micro-batch parquet sink.

The 1-second flush cadence (importer.py, mirroring the reference's
ticker, importer/importing/service.go:97) writes one small file set per
batch — ~86 k batch dirs per day per partition.  ClickHouse solves this
with background MergeTree merges (the reference gets it for free); a
parquet lake needs an explicit compactor.  This one rewrites a closed
date partition into few large, time-sorted files and swaps it in
crash-safely, preserving the sink's read layout (date partition dirs +
time_placed-sorted row groups).

Crash-safety protocol (ADVICE r1: the old version rmtree'd the previous
compacted dir before the new one was in place, so a crash during
re-compaction lost all previously-compacted rows):

1. snapshot the batch-dir list, read EXACTLY those dirs, write the
   compacted result to a hidden ``_compacting...`` tmp dir
2. durably record intent: write a ``_compaction_manifest`` (tmp +
   atomic rename) listing the consumed dirs
3. retire the old ``batch_id=-1`` by RENAME (never delete-first)
4. rename tmp -> ``batch_id=-1``  (the new data is now durable)
5. delete the retired dir and the consumed batch dirs, drop the manifest

``recover_partition`` (called automatically at every compaction start)
rolls an interrupted run forward or back by inspecting which artifacts
survive: manifest + tmp => the swap never happened, restore the retired
dir and abort; manifest without tmp => the swap happened, finish the
cleanup.  In both cases every row is in exactly one surviving dir.
Underscore-prefixed artifacts are invisible to Spark readers throughout.

Batch dirs created concurrently (late replays) are never touched: the
read set and the delete set are the same snapshot taken in step 1.

CONCURRENT-READER CAVEAT (ADVICE r2): the protocol is crash-safe but
not reader-atomic.  Between step 3 and step 4 a concurrent reader sees
the partition missing all previously-compacted rows; between step 4
and step 5 it sees those rows duplicated (the new ``batch_id=-1`` plus
the still-present consumed batch dirs).  Schedule compaction in a
window with no readers, or put a manifest/pointer indirection that
readers consult in front of the partition (e.g. a table format like
the catalog's bucketed tables) if truly atomic swaps are required —
a plain directory-of-parquet layout cannot express one.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

COMPACTED_DIR = "batch_id=-1"


def _paths(sink_path: str, trade_date: str) -> dict[str, str]:
    part_dir = os.path.join(sink_path, f"trade_date={trade_date}")
    return {
        "part": part_dir,
        "final": os.path.join(part_dir, COMPACTED_DIR),
        "tmp": os.path.join(sink_path, f"_compacting_trade_date={trade_date}"),
        "retired": os.path.join(sink_path, f"_retired_trade_date={trade_date}"),
        "manifest": os.path.join(part_dir, "_compaction_manifest"),
    }


def recover_partition(sink_path: str, trade_date: str) -> str:
    """Roll an interrupted compaction forward or back.  Returns the
    action taken ('none' | 'aborted' | 'completed')."""
    p = _paths(sink_path, trade_date)
    if not os.path.exists(p["manifest"]):
        # pre-manifest crash: tmp without manifest is garbage; a stray
        # retired dir can only exist alongside a manifest, but restore
        # it defensively if the final dir is missing.
        shutil.rmtree(p["tmp"], ignore_errors=True)
        if os.path.isdir(p["retired"]):
            if not os.path.isdir(p["final"]):
                os.rename(p["retired"], p["final"])
            else:
                shutil.rmtree(p["retired"], ignore_errors=True)
        return "none"
    with open(p["manifest"]) as f:
        consumed = json.load(f)["consumed"]
    if os.path.isdir(p["tmp"]):
        # crashed before the swap: the new data never went live.  Put
        # the old compacted dir back and pretend nothing happened.
        if os.path.isdir(p["retired"]) and not os.path.isdir(p["final"]):
            os.rename(p["retired"], p["final"])
        shutil.rmtree(p["tmp"], ignore_errors=True)
        os.remove(p["manifest"])
        return "aborted"
    # swap happened: the final dir holds everything the manifest's dirs
    # held — finish deleting the consumed sources.
    for d in consumed:
        if d != COMPACTED_DIR:
            shutil.rmtree(os.path.join(p["part"], d), ignore_errors=True)
    shutil.rmtree(p["retired"], ignore_errors=True)
    os.remove(p["manifest"])
    return "completed"


def compact_date_partition(spark: SparkSession, sink_path: str,
                           trade_date: str, target_files: int = 4,
                           force: bool = False) -> int:
    """Rewrite sink_path/trade_date=<date>/batch_id=*/ into
    sink_path/trade_date=<date>/batch_id=-1/ with ``target_files``
    time-sorted files.  Returns the row count compacted.

    batch_id=-1 marks compacted data: replayed streaming batches use
    real non-negative ids, so a late replay after compaction still
    lands in its own partition and supersedes nothing.

    REFUSES write-once trees (VERDICT r8 directive 6): a ``_txn/``
    manifest dir marks a TxnParquetTradesSink tree, whose exactly-once
    live-view guarantee rests on visible paths never disappearing —
    compaction retires them by design.  Pass ``force=True`` only when
    every file-stream reader of this tree has been stopped and its
    checkpoint discarded.
    """
    p = _paths(sink_path, trade_date)
    if os.path.isdir(os.path.join(sink_path, "_txn")) and not force:
        raise ValueError(
            f"{sink_path} is a write-once (txn-sink) tree: compaction "
            "retires visible paths, which breaks the live view's "
            "exactly-once file stream.  Stop all file-stream readers "
            "and pass force=True to compact anyway.")
    if not os.path.isdir(p["part"]):
        return 0
    recover_partition(sink_path, trade_date)

    # 1. snapshot: read exactly the dirs we will later delete, so
    # batches that arrive mid-compaction are neither lost nor deleted.
    consumed = sorted(d for d in os.listdir(p["part"])
                      if d.startswith("batch_id="))
    if not consumed:
        return 0
    src = [os.path.join(p["part"], d) for d in consumed]
    df = spark.read.option("basePath", sink_path).parquet(*src)
    n = df.count()
    shutil.rmtree(p["tmp"], ignore_errors=True)
    (df.drop("batch_id", "trade_date")
     .repartitionByRange(target_files, "time_placed")
     .sortWithinPartitions("time_placed")
     .write.mode("overwrite").parquet(p["tmp"]))

    # 2. durable intent record (atomic via rename)
    mtmp = p["manifest"] + ".tmp"
    with open(mtmp, "w") as f:
        json.dump({"consumed": consumed}, f)
    os.replace(mtmp, p["manifest"])

    # 3.-4. retire-by-rename, then swap the new data in.  At no point
    # is any row deleted before the new dir is durable.
    if os.path.isdir(p["final"]):
        os.rename(p["final"], p["retired"])
    os.rename(p["tmp"], p["final"])

    # 5. cleanup
    for d in consumed:
        if d != COMPACTED_DIR:
            shutil.rmtree(os.path.join(p["part"], d), ignore_errors=True)
    shutil.rmtree(p["retired"], ignore_errors=True)
    os.remove(p["manifest"])
    return n


def count_files(path: str) -> int:
    return sum(1 for _, _, files in os.walk(path)
               for f in files if f.endswith(".parquet"))
