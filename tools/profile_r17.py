"""Round-17 optimization profiler: per-query wall, plan-construction
time, Spark job count, and the formatted physical plan.

For each selected query (default: all registered), runs the identical
bench protocol (construct -> noop write) after the same prepare_indexes
warm-up bench.py performs, and records:

- construct_sec: DataFrame build time (Catalyst analysis happens lazily,
  so this is mostly Python-side plan assembly + any driver ACTIONS the
  query path triggers, e.g. adaptive-sizing counts)
- exec_sec: the noop write
- n_jobs: Spark jobs launched during construct+exec (via job-group
  tracking) — each job is a driver round-trip; queries whose search
  path should be action-free must show exactly 1
- plan file: plans/r17/<name>_before.txt (or _after with --after)

Usage: python tools/profile_r17.py [--after] [--sf DIR] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import __spark_entry__ as entrymod
from currency_market_pulse_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--after" in args:
        args.remove("--after")
        suffix = "_after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]

    spark = get_spark(app_name="cmp-profile-r17")
    sc = spark.sparkContext
    queries = entrymod.queries()
    names = args or list(queries)

    # same warm-up protocol as bench.py: catalog metadata + one warm
    # pass at sf0.001 (codegen/JIT), then the offline index build
    from currency_market_pulse_spark.sources.catalog import (
        TABLES, load_table,
    )
    for fn in queries.values():
        try:
            fn(spark, "/root/testdata/sf0.001").write.format(
                "noop").mode("overwrite").save()
        except Exception:
            pass
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t)
        except Exception:
            pass
    from currency_market_pulse_spark.plans.prepare import prepare_indexes
    prep = prepare_indexes(spark, sf_dir)

    plans_dir = os.path.join(_HERE, "plans", "r17")
    os.makedirs(plans_dir, exist_ok=True)

    tracker = sc.statusTracker()
    out: dict[str, dict] = {"_prepare": prep}
    for name in names:
        fn = queries[name]
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        sc.setJobDescription(f"profile: {name}")
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
        except Exception as e:
            out[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        finally:
            sc.setJobGroup(None, None)
            sc.setJobDescription(None)
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        out[name] = {
            "construct_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "total_sec": round(t2 - t0, 3),
            "n_jobs": len(jobs),
            "n_stages": n_stages,
        }
        try:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"),
                      "w") as f:
                f.write(plan)
        except Exception as e:
            out[name]["plan_err"] = str(e)[:120]
        print(f"{out[name].get('total_sec', -1):7.3f}s "
              f"jobs={out[name].get('n_jobs', '?'):>3} "
              f"stages={out[name].get('n_stages', '?'):>3} "
              f"(construct {out[name].get('construct_sec', -1):.3f}) "
              f"{name}", flush=True)

    with open(os.path.join(_HERE, f"PROFILE_r17{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
