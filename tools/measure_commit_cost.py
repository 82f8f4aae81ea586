"""Manifest commit cost vs store file count — the measured form of the
log-scaling question: a full-snapshot manifest rewrites the whole file
list on EVERY commit, so the per-commit cost grows with the store, not
the append. This tool times a 1-file append commit against stores of
increasing file count (entries synthesized straight into the log — the
commit path cost is the doc build/write, not data I/O), before and after
the delta+checkpoint log format.

Writes bench_runs_r11/commit_cost.json.
Usage: python tools/measure_commit_cost.py [sizes=1000,10000,100000]
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.sources.sinks import (  # noqa: E402
    _canon_uri, _hadoop_fs, _manifest_head, manifest_commit,
)


def main():
    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1 else [1_000, 10_000, 100_000]
    )
    spark = get_spark(app_name="measure-commit-cost", shuffle_partitions=8)
    out = {"protocol": {"sizes": sizes, "reps": 5, "stat": "median",
                        "op": "1-file append commit"}, "points": []}
    for n in sizes:
        root = tempfile.mkdtemp(prefix="commit_cost_")
        store = os.path.join(root, "s")
        try:
            # seed the store's log with n entries in one commit
            manifest_commit(
                spark, store,
                add=[(f"p={i % 64}/data-seed-{i:07d}.parquet", 1024)
                     for i in range(n)],
            )
            ts = []
            for r in range(5):
                t0 = time.perf_counter()
                manifest_commit(
                    spark, store,
                    add=[(f"p=0/data-app-{r:07d}.parquet", 1024)],
                )
                ts.append(time.perf_counter() - t0)
            # log size on disk + a changes-poll at this store size
            mdir = os.path.join(store, "_manifests")
            doc_bytes = max(
                os.path.getsize(os.path.join(mdir, f))
                for f in os.listdir(mdir)
            )
            fs, Path, root = _hadoop_fs(spark, store)
            root_str = _canon_uri(fs, root)
            t0 = time.perf_counter()
            _manifest_head(spark, fs, Path, root_str)
            resolve_s = time.perf_counter() - t0
            point = {
                "store_files": n,
                "append_commit_s": round(statistics.median(ts), 4),
                "largest_doc_bytes": doc_bytes,
                "head_resolve_s": round(resolve_s, 4),
            }
            out["points"].append(point)
            print(json.dumps(point))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    dest = os.path.join(REPO, "bench_runs_r11", "commit_cost.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
