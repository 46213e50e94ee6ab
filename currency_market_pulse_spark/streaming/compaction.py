"""Compaction for the micro-batch parquet sink.

The 1-second flush cadence (importer.py, mirroring the reference's
ticker) writes one small file set per batch — ~86 k batch dirs per day
per partition.  ClickHouse solves this with background MergeTree merges
(the reference gets it for free); a parquet lake needs an explicit
compactor.  This one rewrites a closed date partition into few large,
time-sorted files and atomically swaps it in, preserving the sink's
read layout (date partition dirs + time_placed-sorted row groups).

Run it per closed day (e.g. hourly for the previous day) from any
scheduler; rewriting is idempotent — a crash mid-compaction leaves the
original batch dirs in place because the swap is the last step.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact_date_partition(spark: SparkSession, sink_path: str,
                           trade_date: str, target_files: int = 4) -> int:
    """Rewrite sink_path/trade_date=<date>/batch_id=*/ into
    sink_path/trade_date=<date>/batch_id=-1/ with ``target_files``
    time-sorted files.  Returns the row count compacted.

    batch_id=-1 marks compacted data: replayed streaming batches use
    real non-negative ids, so a late replay after compaction still
    lands in its own partition and supersedes nothing.
    """
    part_dir = os.path.join(sink_path, f"trade_date={trade_date}")
    if not os.path.isdir(part_dir):
        return 0
    df = spark.read.parquet(part_dir)  # batch_id is a partition col here
    n = df.count()
    tmp = os.path.join(sink_path, f"_compacting_trade_date={trade_date}")
    shutil.rmtree(tmp, ignore_errors=True)
    (df.drop("batch_id")
     .repartitionByRange(target_files, "time_placed")
     .sortWithinPartitions("time_placed")
     .write.mode("overwrite").parquet(tmp))
    # atomic-enough swap: move new files under batch_id=-1, drop old dirs
    final = os.path.join(part_dir, "batch_id=-1")
    shutil.rmtree(final, ignore_errors=True)
    old_batches = [d for d in os.listdir(part_dir) if d.startswith("batch_id=")]
    os.rename(tmp, final)
    for d in old_batches:
        shutil.rmtree(os.path.join(part_dir, d), ignore_errors=True)
    return n


def count_files(path: str) -> int:
    return sum(1 for _, _, files in os.walk(path)
               for f in files if f.endswith(".parquet"))
