"""Join two bench runs (BENCH_QUERIES.json shape) into an sfA->sfB
scaling table sorted by ratio, for SCALE.md's measured-scaling section.

Usage: python tools/scale_ratios.py bench_sfA.json bench_sfB.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(qa):
        if name in qb and qa[name] > 0 and qb[name] > 0:
            rows.append((qb[name] / qa[name], name, qa[name], qb[name]))
    rows.sort(reverse=True)
    print(f"| query | sf{a['sf']} s | sf{b['sf']} s | ratio |")
    print("|---|---|---|---|")
    for r, name, ta, tb in rows:
        print(f"| {name} | {ta:.2f} | {tb:.2f} | {r:.1f}x |")
    ta, tb = a["total_sec"], b["total_sec"]
    print(f"| **total** | {ta:.2f} | {tb:.2f} | {tb / ta:.1f}x |")


if __name__ == "__main__":
    main()
