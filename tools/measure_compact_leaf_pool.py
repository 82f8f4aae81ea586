#!/usr/bin/env python
"""Measure compact_manifested's leaf-rewrite thread pool (r15, guide §2.6).

The compactor rewrites each Hive leaf with its own read→repartition→write
job. Serially, a store with L leaves pays L driver-sequential jobs — each
job's tail leaves the cluster idle while the driver plans the next. The
pool overlaps 2-4 rewrites so the next leaf's tasks back-fill the tail.

Builds a manifested store with ``--leaves`` partitions x ``--files`` small
files each, then runs compact_manifested twice on identical copies:
max_concurrent_leaf_rewrites=1 (the old serial shape) vs 4. Same inputs,
same result (one CAS commit of the identical add/remove sets — the fold is
sorted by leaf either way); only the wall differs.

Usage: python tools/measure_compact_leaf_pool.py [--leaves 32] [--files 4]
       [--rows-per-file 5000] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=32)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--rows-per-file", type=int, default=5000)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import sinks as sk

    spark = get_spark(app_name="measure-compact-leaf-pool")
    spark.range(1).count()  # session warm-up

    def build(path: str) -> None:
        for i in range(args.files):
            df = (
                spark.range(args.rows_per_file)
                .withColumn("part", (F.col("id") % args.leaves).cast("int"))
                .withColumn("payload", F.col("id") * 2 + i)
            )
            sk.write_manifested(spark, df, path, partition_by=["part"])

    out: dict = {"leaves": args.leaves, "files_per_leaf": args.files}
    for workers in (1, 4):
        root = tempfile.mkdtemp(prefix=f"compact_pool_w{workers}_")
        path = os.path.join(root, "store")
        build(path)
        t0 = time.perf_counter()
        rep = sk.compact_manifested(
            spark, path, min_files_to_compact=2,
            max_concurrent_leaf_rewrites=workers,
        )
        wall = time.perf_counter() - t0
        out[f"workers_{workers}"] = {
            "wall_s": round(wall, 2),
            "files_before": rep["files_before"],
            "files_after": rep["files_after"],
            "compacted": rep["compacted"],
        }
        print(f"workers={workers}: {wall:.2f}s  "
              f"{rep['files_before']}->{rep['files_after']} files", flush=True)
        shutil.rmtree(root, ignore_errors=True)
    w1 = out["workers_1"]["wall_s"]
    w4 = out["workers_4"]["wall_s"]
    out["speedup"] = round(w1 / w4, 2) if w4 else None
    print(f"speedup x{out['speedup']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
