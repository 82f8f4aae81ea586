#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1).

For each named query (default: all):
  - capture ``.explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``
  - time two runs (build + collect, the bench methodology) and report min
  - report Spark job/stage counts for the timed run (status tracker delta)

Usage:
  python tools/profile_queries.py [query ...] [--sf-dir DIR] [--tag r15]
         [--suffix before|after] [--json-out FILE] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as em
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources.catalog import (
        TESTDATA_TABLES,
        load_table,
    )

    spark = get_spark(app_name="profile-queries")
    sc = spark.sparkContext
    for t in TESTDATA_TABLES:  # same warm-up as bench.py
        load_table(spark, t, args.sf_dir).count()

    qs = em.queries()
    names = args.names or list(qs)
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"profile:{name}")
        best, jobs_delta = float("inf"), 0
        for rep in range(args.reps):
            j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
            j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            if dt < best:
                best, jobs_delta = dt, j1 - j0
        if not args.no_plans:
            # plan of the LAST build (stores exist by now — steady state)
            df = fn(spark, args.sf_dir)
            jvm = spark._jvm
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        out[name] = {"sec": round(best, 3), "jobs": jobs_delta}
        print(f"{best:7.3f}s  jobs={jobs_delta:3d}  {name}", flush=True)
        sc.setJobDescription(None)

    total = round(sum(v["sec"] for v in out.values()), 3)
    print(f"TOTAL {total}s over {len(out)} queries")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"total": total, "queries": out,
                       "sf_dir": args.sf_dir}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
