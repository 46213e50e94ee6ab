"""Interleaved fused-vs-independent doc-pipeline A/B (VERDICT r16
directive 1): the doc_fused default flipped in r16 on a tier-1 A/B
that showed near-dup leg p50 improving 3,597 -> 2,339 ms but
SUSTAINED docs/s falling 75.3 -> 69.8 (-7%), and the only number at
the RECOMMENDED 4 s/4-file tier was cross-round (-20%, host drift
possible).  This script produces the missing evidence: both arms at
the recommended tier, interleaved F,I,I,F in one session of runs
with load-gated settling between arms (the r16 memory protocol —
this host is bimodal beyond +-30%, so a single A-vs-B pair is not
evidence; within-pattern medians are).

    python tools/fused_ab_interleaved.py [--duration 180]
        [--arms F,I,I,F] [--out STREAM_BENCH_r17_fused_ab.json]

Each arm is a fresh stream_bench subprocess (fresh JVM — the fair
comparison for a deployment choice is a cold composed boot), with:

- a JVM-drain gate: no lingering java process before an arm starts
  (a killed/finished JVM keeps burning cores for minutes and was
  measured corrupting the NEXT run by ~60%);
- a load gate: 1-min loadavg must fall below --max-load before an
  arm starts (bounded wait), so every arm launches from comparable
  host state.

The summary compares within-pattern: median(fused arms) vs
median(indep arms) on sustained near-dup docs/s, near-dup leg p50,
and achieved trades rows/s — the three numbers the default decision
hangs on.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _java_pids() -> list[str]:
    try:
        out = subprocess.run(["pgrep", "-x", "java"],
                             capture_output=True, text=True)
        return [p for p in out.stdout.split() if p]
    except OSError:
        return []


def _settle(max_load: float, timeout_s: float) -> dict:
    """Block until no java process is alive AND loadavg < max_load
    (or the bounded wait expires — recorded, not fatal)."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if not _java_pids() and _loadavg1() < max_load:
            break
        time.sleep(5.0)
    return {"settle_sec": round(time.time() - t0, 1),
            "loadavg_at_launch": _loadavg1(),
            "java_at_launch": len(_java_pids())}


def _run_arm(kind: str, idx: int, args, out_path: str) -> dict:
    cmd = [sys.executable, os.path.join(_TOOLS, "stream_bench.py"),
           "--duration", str(args.duration),
           "--rows-per-batch", str(args.rows_per_batch),
           "--gateway-buckets", "auto",
           "--doc-trigger", args.doc_trigger,
           "--doc-files-per-trigger", str(args.doc_files_per_trigger),
           "--docs-per-file", str(args.docs_per_file),
           "--out", out_path]
    if kind == "I":
        cmd.append("--doc-independent")
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=_REPO, capture_output=True,
                          text=True,
                          timeout=args.duration * 3 + 600)
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(f"arm {kind}#{idx} rc={proc.returncode}")
    with open(out_path) as f:
        art = json.load(f)
    nd_key = "neardup" if art["config"].get("doc_fused") is False \
        else "docs"
    q = art["queries"].get(nd_key) or art["queries"].get("neardup")
    legs = art.get("doc_legs") or {}
    return {
        "arm": kind, "index": idx, "artifact": os.path.basename(out_path),
        "wall_sec": wall,
        "nd_docs_per_sec_sustained":
            art["capacity"]["neardup_docs_per_sec_sustained"],
        "nd_saturated": art["capacity"]["neardup_saturated"],
        "trades_achieved_rows_per_sec":
            art["throughput"]["trades_achieved_rows_per_sec"],
        "doc_query_p50_ms": ((q or {}).get("trigger_wall_ms")
                             or {}).get("p50"),
        "doc_query_p95_ms": ((q or {}).get("trigger_wall_ms")
                             or {}).get("p95"),
        "neardup_leg_p50_ms": (legs.get("neardup_ms") or {}).get("p50"),
        "import_p50_ms": (art["queries"]["import"]["trigger_wall_ms"]
                          ["p50"]),
        "import_p95_ms": (art["queries"]["import"]["trigger_wall_ms"]
                          ["p95"]),
    }


def _median(xs):
    xs = sorted(x for x in xs if x is not None)
    if not xs:
        return None
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else round((xs[mid - 1]
                                              + xs[mid]) / 2, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=int, default=180)
    ap.add_argument("--rows-per-batch", type=int, default=2000)
    ap.add_argument("--doc-trigger", default="4 seconds")
    ap.add_argument("--doc-files-per-trigger", type=int, default=4)
    ap.add_argument("--docs-per-file", type=int, default=300)
    ap.add_argument("--arms", default="F,I,I,F",
                    help="interleave pattern, F=fused I=independent")
    ap.add_argument("--max-load", type=float, default=1.5)
    ap.add_argument("--settle-timeout", type=float, default=420.0)
    ap.add_argument("--out", default=os.path.join(
        _REPO, "STREAM_BENCH_r17_fused_ab.json"))
    args = ap.parse_args()

    arms = [a.strip().upper() for a in args.arms.split(",") if a.strip()]
    runs = []
    for i, kind in enumerate(arms):
        gate = _settle(args.max_load, args.settle_timeout)
        out_path = os.path.join(
            _REPO, f"STREAM_BENCH_r17_ab_{i}_{kind}.json")
        print(json.dumps({"arm": kind, "index": i, **gate}),
              flush=True)
        r = _run_arm(kind, i, args, out_path)
        r.update(gate)
        runs.append(r)
        print(json.dumps(r), flush=True)

    fused = [r for r in runs if r["arm"] == "F"]
    indep = [r for r in runs if r["arm"] == "I"]
    summary = {
        "protocol": ("interleaved " + ",".join(arms)
                     + " with JVM-drain + load-gated settling; "
                     "within-pattern medians"),
        "tier": {"doc_trigger": args.doc_trigger,
                 "doc_files_per_trigger": args.doc_files_per_trigger,
                 "docs_per_file": args.docs_per_file,
                 "offered_docs_per_sec": args.docs_per_file
                 * args.doc_files_per_trigger / 4.0,
                 "duration_sec": args.duration},
        "fused": {
            "nd_docs_per_sec_sustained_median": _median(
                [r["nd_docs_per_sec_sustained"] for r in fused]),
            "trades_rows_per_sec_median": _median(
                [r["trades_achieved_rows_per_sec"] for r in fused]),
            "neardup_leg_p50_ms_median": _median(
                [r["neardup_leg_p50_ms"] for r in fused]),
            "import_p95_ms_median": _median(
                [r["import_p95_ms"] for r in fused]),
        },
        "independent": {
            "nd_docs_per_sec_sustained_median": _median(
                [r["nd_docs_per_sec_sustained"] for r in indep]),
            "trades_rows_per_sec_median": _median(
                [r["trades_achieved_rows_per_sec"] for r in indep]),
            "neardup_leg_p50_ms_median": _median(
                [r["doc_query_p50_ms"] for r in indep]),
            "import_p95_ms_median": _median(
                [r["import_p95_ms"] for r in indep]),
        },
        "runs": runs,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"fused": summary["fused"],
                      "independent": summary["independent"]}),
          flush=True)


if __name__ == "__main__":
    main()
