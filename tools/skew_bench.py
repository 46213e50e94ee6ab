"""Skewed-join robustness evidence (VERDICT r9 directive 4): the
salted-join and AQE-skew machinery exists (operators/scaling.py,
session.py) and is plan-asserted — this tool makes it MEASURED, with
a hot-key corpus and un-mitigated vs mitigated timings + plan proof.

    python tools/skew_bench.py                  # sf1-scale, idle box
    python tools/skew_bench.py --n-fact 2000000 --n-dim 300000  # smoke

Corpus (generated once into --workdir as parquet, then every variant
reads the same files): a fact table of --n-fact rows where ONE key
carries --hot-frac (default 30%) of all mass and the rest is uniform
over the --n-dim key domain; a dimension table of --n-dim rows padded
past the broadcast threshold — the dim-too-big-to-broadcast regime
where a 100 TB join actually shuffles and a hot key actually hurts.

Variants, all computing the identical fact⨝dim count:

  unmitigated   AQE off, plain shuffle join — the hot key's shuffle
                partition is a straggler (~hot_frac x n_fact rows in
                one task while the average task holds n_fact/parts).
  aqe_skew      the session default (session.py): AQE skew-join
                splitting carves the hot partition at runtime; the
                final adaptive plan carries the skew=true marker,
                captured here as evidence.
  salted        AQE off + operators/scaling.salted_join: the explicit
                fallback for shapes AQE can't fix — the hot key is
                spread over n_salts shuffle keys at the cost of
                replicating the dim side n_salts times.

Two scale-model confs, both documented here because they are the
difference between measuring the mechanism and measuring nothing:

- ``autoBroadcastJoinThreshold=-1`` for every variant: at 100 TB the
  pruned dim is still far past any broadcast budget; locally Spark
  would broadcast a 2-column 1M-row dim and no variant would shuffle
  at all.
- the AQE variant scales the skew thresholds down with the data
  (skewedPartitionThresholdInBytes 4m / advisoryPartitionSizeInBytes
  2m vs the 256m/64m production defaults, same 5x skew factor): the
  hot partition here is tens of MB, at production scale tens of GB —
  the trigger ratio is what's being demonstrated, not the absolute
  byte count.

Output: one JSON line per variant + tools/skew_evidence.json
{variant: {wall_sec, rows, plan_evidence}} for the SCALE.md skew
section.  Run on an idle machine.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TOOLS)
sys.path.insert(0, _REPO)


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-fact", type=int, default=8_000_000)
    ap.add_argument("--n-dim", type=int, default=1_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.30)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/hotkey_bench")
    ap.add_argument("--out", default=os.path.join(_TOOLS,
                                                  "skew_evidence.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from currency_market_pulse_spark.operators.scaling import salted_join
    from currency_market_pulse_spark.session import get_spark

    spark = get_spark(app_name="skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # the dim-too-big-to-broadcast regime (module docstring): every
    # variant must actually shuffle, as the 100 TB join would
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    fact_path = os.path.join(args.workdir, "fact")
    dim_path = os.path.join(args.workdir, "dim")
    if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
        shutil.rmtree(args.workdir, ignore_errors=True)
        hot_mod = max(1, int(round(1.0 / args.hot_frac)))
        # key 0 takes every (id % hot_mod == 0) row = hot_frac of the
        # mass; the rest spread hash-uniformly over the dim domain
        (spark.range(args.n_fact).select(
            F.when(F.col("id") % hot_mod == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(args.n_dim)))
            .cast("long").alias("key"),
            (F.col("id") % 1000).cast("double").alias("v"))
         .write.mode("overwrite").parquet(fact_path))
        # 128-byte pad per row keeps the dim WELL past the broadcast
        # threshold: the join must shuffle, like any 100 TB fact-dim
        # join whose dim outgrew the driver
        (spark.range(args.n_dim).select(
            F.col("id").alias("key"),
            F.sha2(F.col("id").cast("string"), 512).alias("pad"),
            (F.col("id") % 7).cast("int").alias("grp"))
         .write.mode("overwrite").parquet(dim_path))

    def run(tag: str, aqe: bool, salts: int | None):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        if aqe:
            # scale the skew trigger down with the data (docstring):
            # production defaults are 256m threshold / 64m advisory
            spark.conf.set(
                "spark.sql.adaptive.skewJoin"
                ".skewedPartitionThresholdInBytes", "4m")
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        if salts:
            joined = salted_join(fact, dim, "key", n_salts=salts)
        else:
            joined = fact.join(dim, "key")
        out = joined.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        t0 = time.time()
        rows = out.collect()
        wall = time.time() - t0
        plan = _final_plan(out)
        evidence = [ln.strip()[:140] for ln in plan.splitlines()
                    if ("Join" in ln and "FileScan" not in ln)
                    or "AQEShuffleRead" in ln or "skewed" in ln]
        rec = {"variant": tag, "wall_sec": round(wall, 2),
               "groups": len(rows),
               "rows_joined": int(sum(r["n"] for r in rows)),
               "plan_evidence": evidence[:6]}
        print(json.dumps(rec), flush=True)
        return rec

    results = {}
    for tag, aqe, salts in (
            ("unmitigated", False, None),
            ("aqe_skew", True, None),
            ("salted", False, args.n_salts)):
        results[tag] = run(tag, aqe, salts)
    # restore the session default
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    results["config"] = {
        "n_fact": args.n_fact, "n_dim": args.n_dim,
        "hot_frac": args.hot_frac, "n_salts": args.n_salts,
        "shuffle_partitions":
            spark.conf.get("spark.sql.shuffle.partitions"),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
