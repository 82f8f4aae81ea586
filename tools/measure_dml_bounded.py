"""DML cost vs store size — the measured form of the r11 row-level-DML
claim: a single-key `merge_manifested` (and a span-bounded
`delete_manifested`) costs O(matched files), not O(store). Stats prune
candidates manifest-side, the semi-join reads only candidates, and the
rewrite touches exactly the matched files — so the wall time should stay
~flat while the store grows 16×.

Protocol: stores of N disjoint-span files (N in SIZES), each file 20k
rows with id stats recorded. Time (a) merge of ONE existing key, (b)
delete of an 11-row span with a matching `skip` bound, 3 reps median,
fresh store per size. Writes bench_runs_r11/dml_bounded.json.

Run ISOLATED per the bench protocol.
Usage: python tools/measure_dml_bounded.py
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
    delete_manifested, merge_manifested, write_manifested,
)

SIZES = [64, 256, 1024]
ROWS_PER_FILE = 20_000


def main():
    spark = get_spark(app_name="measure-dml-bounded", shuffle_partitions=8)
    out = {"protocol": {"sizes": SIZES, "rows_per_file": ROWS_PER_FILE,
                        "reps": 3, "stat": "median"}, "points": []}
    for n_files in SIZES:
        root = tempfile.mkdtemp(prefix="dml_bounded_")
        store = os.path.join(root, "s")
        try:
            # batched appends (16 files per commit) keep setup sane while
            # still giving per-file stats spans
            per_commit = 16
            for c in range(n_files // per_commit):
                lo = c * per_commit * ROWS_PER_FILE
                df = (
                    spark.range(lo, lo + per_commit * ROWS_PER_FILE)
                    .repartitionByRange(per_commit, "id")
                )
                write_manifested(spark, df, store, stats_cols=["id"])
            merge_ts, del_ts = [], []
            mres = dres = None
            for rep in range(3):
                key = (n_files // 2) * ROWS_PER_FILE + 7 + rep
                upd = spark.createDataFrame([(key,)], "id long")
                t0 = time.perf_counter()
                mres = merge_manifested(spark, upd, store, key="id")
                merge_ts.append(time.perf_counter() - t0)
                lo = (n_files // 3) * ROWS_PER_FILE + 100 * rep
                t0 = time.perf_counter()
                dres = delete_manifested(
                    spark, store, f"id BETWEEN {lo} AND {lo + 10}",
                    skip={"id": (lo, lo + 10)},
                )
                del_ts.append(time.perf_counter() - t0)
            point = {
                "store_files": n_files,
                "store_rows": n_files * ROWS_PER_FILE,
                "merge_s": round(statistics.median(merge_ts), 4),
                "merge_files_rewritten": mres["files_rewritten"],
                "delete_s": round(statistics.median(del_ts), 4),
                "delete_files_rewritten": dres["files_rewritten"],
                "delete_rows": dres["rows_deleted"],
            }
            out["points"].append(point)
            print(json.dumps(point))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    dest = os.path.join(REPO, "bench_runs_r11", "dml_bounded.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
