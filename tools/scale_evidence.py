"""One-command scale evidence: regenerate the large-SF fixtures, re-run
the differential gate and the bench at both scales, and emit the
ratio table SCALE.md's measured-scaling section is built from
(VERDICT r4 item 2 — the r4 evidence lived in gitignored fixtures that
no longer existed; this makes the whole chain re-executable).

    python tools/scale_evidence.py              # sf0.1 -> sf1 (x10)
    python tools/scale_evidence.py --sf 10      # sf1 -> sf10 (x100 gate)
    python tools/scale_evidence.py --no-selfcheck   # bench+ratios only

Pipeline (all deterministic — gen_sf.py has no randomness):

1. ``tools/gen_sf.py``: replicate sf0.1 10x into ``testdata_gen/sf1``
   (``--sf 10`` composes: sf1 is generated first if absent, then
   replicated 10x into ``testdata_gen/sf10``).
2. ``tools/selfcheck.py`` at the generated SF: every registered query
   re-proven against its DuckDB oracle at scale (skippable; the sf10
   oracles are feasible but slow).
3. ``bench.py`` at sf0.1 and at the generated SF (fresh interpreter per
   run, the driver protocol); per-query timings land in
   ``scale_evidence_bench_sf*.json`` next to this file.
4. ``tools/scale_ratios.py``-style ratio table printed and written to
   ``SCALE_EVIDENCE_sf<N>.md`` at the repo root (commit that file).

Expected runtimes on idle local[32] (README "Scale evidence"):
generation ~1 min (sf1) / ~10 min (sf10); selfcheck ~15 min at sf1;
the two bench runs ~2-4 min each (sf1) / ~15 min (sf10).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)
_GEN = os.path.join(_REPO, "testdata_gen")
_PY = sys.executable


def _run(cmd: list[str], env: dict | None = None) -> str:
    """Run a subprocess, stream stderr, return stdout text."""
    print(f"+ {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    proc = subprocess.run(cmd, cwd=_REPO, env=e, capture_output=True,
                          text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"step failed ({proc.returncode}): {cmd}")
    return proc.stdout


def ensure_fixtures(sf: int) -> str:
    """Generate testdata_gen/sf<sf> if absent; returns its path."""
    sf1 = os.path.join(_GEN, "sf1")
    if not os.path.exists(os.path.join(sf1, "embeddings.parquet")):
        _run([_PY, os.path.join(_TOOLS, "gen_sf.py"),
              "/root/testdata/sf0.1", sf1, "10"])
    if sf == 1:
        return sf1
    sf10 = os.path.join(_GEN, "sf10")
    if not os.path.exists(os.path.join(sf10, "embeddings.parquet")):
        _run([_PY, os.path.join(_TOOLS, "gen_sf.py"), sf1, sf10, "10"])
    return sf10


def bench_at(sf_dir: str, tag: str) -> dict:
    """bench.py in a fresh interpreter (driver protocol: cold session,
    warmup at sf0.001, timed at sf_dir); returns the per-query dict.

    The sf10 run gets a bigger driver heap (unless the caller already
    set one): the default 8g is sized for the driver's sf0.1 gate, and
    at 100x data the single local JVM also holds 100x-sized cached
    index relations — measured r10: the 8g JVM died at
    text_substring_dedup.  On a real cluster this is ordinary executor
    memory sizing, not a code path difference."""
    env = {"SPARK_GRAFT_SF_DIR": sf_dir}
    if tag == "sf10" and "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        env["SPARK_GRAFT_DRIVER_MEM"] = "32g"
    _run([_PY, os.path.join(_REPO, "bench.py")], env=env)
    src = os.path.join(_REPO, "BENCH_QUERIES.json")
    dst = os.path.join(_TOOLS, f"scale_evidence_bench_{tag}.json")
    shutil.copyfile(src, dst)
    with open(dst) as f:
        return json.load(f)


def ratio_table(a: dict, b: dict) -> str:
    qa, qb = a["queries"], b["queries"]
    rows = sorted(
        ((qb[n] / qa[n], n, qa[n], qb[n]) for n in qa
         if n in qb and qa[n] > 0 and qb[n] > 0),
        reverse=True)
    lines = [f"| query | sf{a['sf']} s | sf{b['sf']} s | ratio |",
             "|---|---|---|---|"]
    lines += [f"| {n} | {ta:.2f} | {tb:.2f} | {r:.1f}x |"
              for r, n, ta, tb in rows]
    lines.append(f"| **total** | {a['total_sec']:.2f} | "
                 f"{b['total_sec']:.2f} | "
                 f"{b['total_sec'] / a['total_sec']:.1f}x |")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, default=1, choices=(1, 10))
    ap.add_argument("--no-selfcheck", action="store_true",
                    help="skip the differential gate at the large SF")
    args = ap.parse_args()

    t0 = time.time()
    big_dir = ensure_fixtures(args.sf)

    selfcheck_tail = "(skipped)"
    if not args.no_selfcheck:
        # the sf10 selfcheck runs the same 100x-sized relations as the
        # bench — give it the same 32g heap default (ADVICE r10: the 8g
        # default OOMs the ~1.5h differential gate at sf10 unless the
        # user exports SPARK_GRAFT_DRIVER_MEM by hand)
        env = None
        if args.sf == 10 and "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
            env = {"SPARK_GRAFT_DRIVER_MEM": "32g"}
        out = _run([_PY, os.path.join(_TOOLS, "selfcheck.py"), big_dir],
                   env=env)
        selfcheck_tail = out.strip().splitlines()[-1]
        print("selfcheck:", selfcheck_tail, flush=True)
        if not selfcheck_tail.endswith(" 0"):
            raise SystemExit(f"selfcheck failed at {big_dir}: "
                             f"{selfcheck_tail}")

    small = bench_at("/root/testdata/sf0.1", "sf0.1")
    big = bench_at(big_dir, f"sf{args.sf}")
    table = ratio_table(small, big)
    print(table)

    out_path = os.path.join(_REPO, f"SCALE_EVIDENCE_sf{args.sf}.md")
    with open(out_path, "w") as f:
        f.write(
            f"# Scale evidence: sf0.1 -> sf{args.sf} "
            f"({'10x' if args.sf == 1 else '100x'} data)\n\n"
            f"Generated by `python tools/scale_evidence.py --sf "
            f"{args.sf}` (deterministic; fixtures rebuilt from "
            f"/root/testdata/sf0.1 via tools/gen_sf.py).\n\n"
            f"- selfcheck at sf{args.sf}: `{selfcheck_tail}`\n"
            f"- wall: {time.time() - t0:.0f}s end-to-end\n\n"
            f"{table}\n")
    print(f"wrote {out_path} ({time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
