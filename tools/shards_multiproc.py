"""Multi-process index-placement evidence (VERDICT r15 directive 3):
run TWO index roots from two independent OS processes (two driver
JVMs) against a split doc stream and measure aggregate sustained
docs/s vs ONE process ingesting the same corpus into one root —
turning the "each shard root is independently placeable" argument
into an artifact.

    python tools/shards_multiproc.py [--files-per-half 20]
        [--docs-per-file 300] [--threads 16] [--out ...]

Semantics, stated precisely so the artifact claims exactly what it
proves:

- The doc split is PAIR-PRESERVING (each half is salted so every
  exact/near-dup pair lives inside one half) — the role a
  content-class router plays in a fleet.  Under that split the
  UNION of the two processes' dup logs must equal the single-process
  run's dup log on the same corpus byte-for-byte; the script asserts
  it (zero recall lost to placement).
- Band-hash sharding (``shards=S``, neardup_stream.py) is the
  ORTHOGONAL intra-root layout — already bit-equal by construction
  and test-pinned (test_neardup_stream.py); each placed root may
  itself be sharded.  What this artifact adds is the missing
  placement term: the per-batch probe's fixed driver-side floor
  (~1.8 s, SCALE.md r15) is PER PROCESS, so two processes over two
  roots drain ~2x the docs of one process at the same tier.
- Every worker runs the identical per-process configuration
  (``--threads`` executor threads, 8 shuffle partitions, same
  compact_every), so solo-vs-aggregate is like-for-like: the multi
  arm models two placement hosts, not one bigger host.

The workers feed batches through ``StreamingNearDup.process_batch``
directly from JSON files (the production batch shape — a
createDataFrame batch scans through per-job Python workers and
distorts the floor, SCALE.md r15 note).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)
sys.path.insert(0, _REPO)


def _build_corpus(sf_dir: str, work: str, files_per_half: int,
                  docs_per_file: int) -> dict:
    """Two pair-preserving halves: per half, every token carries the
    half's salt (cross-half shingle/hash overlap is zero), and files
    after the first mix ~20% exact copies and ~20% near-dups of
    earlier docs in the SAME half."""
    import pyarrow.parquet as pq

    texts = [t.as_py() for t in pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text"]).column("text") if t.as_py()]
    paths = {"a": [], "b": []}
    for half, id_base in (("a", 0), ("b", 50_000_000)):
        d = os.path.join(work, f"docs_{half}")
        os.makedirs(d)
        earlier: list[tuple[int, str]] = []
        nid = id_base
        for f in range(files_per_half):
            rows = []
            for j in range(docs_per_file):
                kind = (j % 5) if (f > 0 and earlier) else 0
                if kind == 3:       # exact copy of an earlier doc
                    _oid, text = earlier[(f * 31 + j) % len(earlier)]
                elif kind == 4:     # near-dup: one token swapped
                    _oid, base = earlier[(f * 17 + j) % len(earlier)]
                    toks = base.split()
                    toks[-1] = f"swapped{half}{f}x{j}"
                    text = " ".join(toks)
                else:               # novel, half-salted
                    src = texts[(f * docs_per_file + j) % len(texts)]
                    text = " ".join(
                        f"{t}{half}{(f * docs_per_file + j) // len(texts)}"
                        for t in src.split())
                    earlier.append((nid, text))
                rows.append((nid, text))
                nid += 1
            p = os.path.join(d, f"chunk-{f:05d}.json")
            with open(p, "w") as fh:
                for did, text in rows:
                    fh.write(json.dumps(
                        {"doc_id": did, "text": text}) + "\n")
            paths[half].append(p)
    return paths


def _worker(files: list[str], root: str, threads: int,
            compact_every: int, out: str) -> None:
    from pyspark.sql import SparkSession

    from currency_market_pulse_spark.streaming.neardup_stream import (
        StreamingNearDup,
    )

    spark = (SparkSession.builder.master(f"local[{threads}]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("shards-multiproc-worker").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    nd = StreamingNearDup(
        bands_path=os.path.join(root, "bands"),
        shingles_path=os.path.join(root, "shingles"),
        hashes_path=os.path.join(root, "hashes"),
        dups_path=os.path.join(root, "dups"),
        compact_every=compact_every, n_buckets=4)
    walls, n_docs = [], 0
    # one warmup-excluded timing convention: the first batch carries
    # JIT/session warmup for the whole process — report it separately
    for i, f in enumerate(files):
        df = spark.read.schema("doc_id long, text string").json(f)
        t = time.time()
        nd.process_batch(df, i)
        walls.append(round(time.time() - t, 4))
        with open(f) as fh:
            n_docs += sum(1 for _ in fh)
    dups = sorted((r.new_id, r.dup_of, round(r.jaccard, 9))
                  for r in nd.read_dups(spark).collect())
    with open(out, "w") as fh:
        json.dump({"walls": walls, "n_docs": n_docs,
                   "dups": dups,
                   "band_rows": nd.read_bands(spark).count()}, fh)
    spark.stop()


def _spawn(files, root, threads, compact_every, out):
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--worker-root", root, "--worker-out", out,
         "--threads", str(threads),
         "--compact-every", str(compact_every),
         "--worker-files", json.dumps(files)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--files-per-half", type=int, default=20)
    ap.add_argument("--docs-per-file", type=int, default=300)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        _REPO, "STREAM_BENCH_shards_multiproc.json"))
    ap.add_argument("--keep-workdir", action="store_true")
    # worker-mode plumbing
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--worker-root")
    ap.add_argument("--worker-out")
    ap.add_argument("--worker-files")
    args = ap.parse_args()

    if args.worker:
        _worker(json.loads(args.worker_files), args.worker_root,
                args.threads, args.compact_every, args.worker_out)
        return

    work = tempfile.mkdtemp(prefix="shards_mp_")
    paths = _build_corpus(args.sf_dir, work, args.files_per_half,
                          args.docs_per_file)

    # ---- solo arm: ONE process, the full corpus (halves interleaved
    # the way a single router-less ingest would see them), one root
    interleaved = [p for pair in zip(paths["a"], paths["b"])
                   for p in pair]
    t0 = time.time()
    solo = _spawn(interleaved, os.path.join(work, "root_solo"),
                  args.threads, args.compact_every,
                  os.path.join(work, "solo.json"))
    solo.wait()
    solo_wall = time.time() - t0
    with open(os.path.join(work, "solo.json")) as f:
        solo_res = json.load(f)

    # ---- multi arm: TWO processes, one half + one root each,
    # started together; aggregate wall = the slower process
    t0 = time.time()
    procs = [
        _spawn(paths["a"], os.path.join(work, "root_a"), args.threads,
               args.compact_every, os.path.join(work, "a.json")),
        _spawn(paths["b"], os.path.join(work, "root_b"), args.threads,
               args.compact_every, os.path.join(work, "b.json")),
    ]
    for p in procs:
        p.wait()
    multi_wall = time.time() - t0
    res = {}
    for half in ("a", "b"):
        with open(os.path.join(work, f"{half}.json")) as f:
            res[half] = json.load(f)

    # ---- equality: union of the placed roots' dup logs == solo's
    union = sorted(res["a"]["dups"] + res["b"]["dups"])
    equal = union == solo_res["dups"]

    def _rate(n_docs, walls, wall):
        batch_sum = sum(walls)
        steady = sum(walls[1:]) or batch_sum
        return {
            "docs": n_docs,
            "wall_sec": round(wall, 1),
            "batch_walls_sum_sec": round(batch_sum, 1),
            "docs_per_sec_incl_warmup": round(n_docs / batch_sum, 1),
            "docs_per_sec_steady": round(
                (n_docs - n_docs // len(walls)) / steady, 1),
            "batch_wall_p50_ms": int(sorted(walls)[len(walls) // 2]
                                     * 1000),
        }

    total_docs = res["a"]["n_docs"] + res["b"]["n_docs"]
    artifact = {
        "config": {"files_per_half": args.files_per_half,
                   "docs_per_file": args.docs_per_file,
                   "threads_per_process": args.threads,
                   "compact_every": args.compact_every,
                   "sf_dir": args.sf_dir},
        "solo": _rate(solo_res["n_docs"], solo_res["walls"],
                      solo_wall),
        "multi": {
            "a": _rate(res["a"]["n_docs"], res["a"]["walls"],
                       multi_wall),
            "b": _rate(res["b"]["n_docs"], res["b"]["walls"],
                       multi_wall),
            "aggregate_docs_per_sec": round(total_docs / multi_wall, 1),
            "wall_sec": round(multi_wall, 1),
        },
        "speedup_aggregate_vs_solo": round(
            (total_docs / multi_wall)
            / (solo_res["n_docs"] / solo_wall), 2),
        "dup_log_union_equals_solo": equal,
        "dups_found": len(solo_res["dups"]),
        "note": ("pair-preserving doc split (content-class router "
                 "twin); per-process config identical across arms — "
                 "the multi arm models two placement hosts"),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({k: artifact[k] for k in
                      ("speedup_aggregate_vs_solo",
                       "dup_log_union_equals_solo", "dups_found")}))
    print(f"wrote {args.out}")
    if not args.keep_workdir:
        import shutil
        shutil.rmtree(work, ignore_errors=True)
    if not equal:
        raise SystemExit("dup-log union != solo dup log")


if __name__ == "__main__":
    main()
