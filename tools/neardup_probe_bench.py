"""Per-stage micro-bench of the streaming near-dup probe (VERDICT r17
item 6): drives ``StreamingNearDup.process_batch`` directly — no
structured-streaming engine, no sibling legs — so the probe's own
driver round-trips are the only thing on the clock.

Mirrors the RECOMMENDED doc tier of tools/stream_bench.py: batches of
``--docs-per-batch`` (default 1200 = 4 files x 300 docs) built from
sf0.1 documents with the same novelty-replication rule (rep 0 verbatim,
later reps token-suffixed so shingles stay disjoint), the same fused
pre-tokenized ``toks`` handoff the pipeline makes, the same stream
shuffle width (8).

Per batch it records wall and the handler's ``last_stage_s`` breakdown;
the summary prints p50/p95 per stage.  ``--out`` writes JSON.  The dup
log produced by a run is left in the workdir so two runs (before/after
an optimization) can be compared byte-for-byte:

    python tools/neardup_probe_bench.py --batches 20 \
        --workdir /tmp/probe_A --out /tmp/probe_A.json

Byte-equality check between two workdirs:

    python tools/neardup_probe_bench.py --compare /tmp/probe_A /tmp/probe_B
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def _pct(xs, p):
    if not xs:
        return None
    s = sorted(xs)
    return round(s[min(len(s) - 1, int(len(s) * p / 100))], 4)


def compare(dir_a: str, dir_b: str) -> int:
    """Row-set equality of the two runs' dup logs (sorted rows)."""
    import pyarrow.dataset as ds
    rows = []
    for d in (dir_a, dir_b):
        path = os.path.join(d, "out", "dups")
        t = ds.dataset(path, partitioning="hive").to_table().to_pylist()
        rows.append(sorted((r["batch_id"], r["new_id"], r["dup_of"],
                            r["jaccard"]) for r in t))
    if rows[0] == rows[1]:
        print(f"EQUAL: {len(rows[0])} dup rows match exactly")
        return 0
    only_a = set(rows[0]) - set(rows[1])
    only_b = set(rows[1]) - set(rows[0])
    print(f"DIFFER: {len(rows[0])} vs {len(rows[1])} rows; "
          f"only_a={list(only_a)[:5]} only_b={list(only_b)[:5]}")
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--docs-per-batch", type=int, default=1200)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--compact-every", type=int, default=32)
    ap.add_argument("--preseed-reps", type=int, default=0,
                    help="seed the standing index with N novel corpus "
                         "replicas first (index-size axis)")
    ap.add_argument("--fused-toks", action="store_true", default=True)
    ap.add_argument("--compare", nargs=2, metavar=("DIR_A", "DIR_B"))
    args = ap.parse_args()

    if args.compare:
        return compare(*args.compare)

    from currency_market_pulse_spark.session import get_spark
    from currency_market_pulse_spark.streaming.neardup_stream import (
        StreamingNearDup,
    )
    from currency_market_pulse_spark.functions.text import tokens
    from pyspark.sql import functions as F

    spark = get_spark(app_name="neardup-probe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    work = args.workdir or f"/tmp/neardup_probe_{int(time.time())}"
    shutil.rmtree(work, ignore_errors=True)
    out_dir = os.path.join(work, "out")
    os.makedirs(out_dir)

    docs = (spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet"))
        .select("doc_id", "text").collect())

    def _rep_text(text: str, rep: int) -> str:
        if rep == 0:
            return text
        return " ".join(f"{t}z{rep}q" for t in text.split())

    need = args.batches * args.docs_per_batch
    rows, rep = [], 0
    while len(rows) < need:
        rows.extend((int(r.doc_id) + rep * 10_000_000,
                     _rep_text(r.text, rep)) for r in docs)
        rep += 1

    nd = StreamingNearDup(
        bands_path=os.path.join(out_dir, "idx_bands"),
        shingles_path=os.path.join(out_dir, "idx_shingles"),
        hashes_path=os.path.join(out_dir, "idx_hashes"),
        dups_path=os.path.join(out_dir, "dups"),
        compact_every=args.compact_every,
        events_path=os.path.join(out_dir, "compaction_events.jsonl"),
    )

    if args.preseed_reps:
        seed_rows = [(did + 500_000_000, " ".join(
            f"{t} s{r}x{j}" for j, t in enumerate(text.split())))
            for r in range(args.preseed_reps)
            for did, text in ((int(d.doc_id), d.text) for d in docs)]
        seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
        nd.seed_index(seed)

    # micro-batches come from JSON files exactly like the pipeline's
    # file-source doc stream (a createDataFrame LocalRelation would
    # execute as Scan ExistingRDD through Python workers — measured
    # seconds per write in r15, and not what the stream pays)
    chunks_dir = os.path.join(work, "chunks")
    os.makedirs(chunks_dir)
    for b in range(args.batches):
        with open(os.path.join(chunks_dir, f"chunk-{b:05d}.json"),
                  "w") as f:
            for did, text in rows[b * args.docs_per_batch:
                                  (b + 1) * args.docs_per_batch]:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    walls, stages = [], []
    for b in range(args.batches):
        batch = (spark.read.schema("doc_id long, text string")
                 .json(os.path.join(chunks_dir, f"chunk-{b:05d}.json"))
                 .persist())
        toks = None
        if args.fused_toks:
            toks = batch.select(
                "doc_id", tokens(F.col("text")).alias("_t")).persist()
            toks.count()
        t0 = time.time()
        nd.process_batch(batch, b, toks=toks)
        wall = time.time() - t0
        walls.append(wall)
        stages.append(dict(nd.last_stage_s))
        print(f"batch {b:3d}  wall {wall:6.3f}s  "
              + " ".join(f"{k}={v:.3f}" for k, v in
                         sorted(nd.last_stage_s.items())), flush=True)
        batch.unpersist()
        if toks is not None:
            toks.unpersist()

    keys = sorted({k for s in stages for k in s})
    summary = {
        "config": vars(args),
        "workdir": work,
        "batch_wall_sec": {"p50": _pct(walls, 50), "p95": _pct(walls, 95),
                           "min": round(min(walls), 4),
                           "mean": round(sum(walls) / len(walls), 4)},
        "stage_sec": {k: {"p50": _pct([s[k] for s in stages if k in s], 50),
                          "p95": _pct([s[k] for s in stages if k in s], 95)}
                      for k in keys},
        "n_dup_rows": None,
    }
    try:
        import pyarrow.dataset as ds
        summary["n_dup_rows"] = ds.dataset(
            os.path.join(out_dir, "dups")).count_rows()
    except Exception:
        pass
    print(json.dumps(summary["batch_wall_sec"]))
    for k in keys:
        print(f"  {k:28s} p50={summary['stage_sec'][k]['p50']} "
              f"p95={summary['stage_sec'][k]['p95']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
