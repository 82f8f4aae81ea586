"""Incremental changes-read cost vs store size — the measured form of the
r11 CDC claim: `read_manifested_changes` is O(changed files) (a driver-side
manifest-log diff + an explicit-paths scan of the DELTA), while the only
alternative on a growing store — re-reading and re-deduplicating — is
O(store). A directory-listing incremental source is not even a contender
for the third axis (consumption across a compaction): it re-consumes every
fold output, so its cost after maintenance is also O(store) AND wrong.

Protocol: grow a manifest store by ROUNDS appends of APPEND_ROWS rows
(BATCH_FILES files each). After each growth step, time (a) consuming the
latest delta from the previous cursor, (b) a full `read_manifested` count
of the store, both COLD (fresh DataFrame per rep), 3 reps median. Then
run ONE compaction and time the consumer's next poll (should be ~resolve
cost only: zero rows delivered). Writes bench_runs_r11/changes_read.json.

Run ISOLATED per the bench protocol.
Usage: python tools/measure_changes_read.py [rounds=8] [files_per_append=64]
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
    compact_manifested, read_manifested, read_manifested_changes,
)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rows_per = files_per * 2000
    spark = get_spark(app_name="measure-changes-read", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="changes_read_")
    store = os.path.join(root, "store")
    from aeon_sleap_processing_spark.sources.sinks import write_manifested

    steps = []
    cursor = -1
    lo = 0
    try:
        for step in range(rounds):
            df = spark.range(lo, lo + rows_per).repartition(files_per)
            write_manifested(spark, df, store)
            lo += rows_per

            def consume():
                t0 = time.perf_counter()
                d, v = read_manifested_changes(spark, store, cursor)
                n = d.count() if d is not None else 0
                return time.perf_counter() - t0, n, v

            delta_ts, full_ts = [], []
            for _ in range(3):
                dt, n, v = consume()
                delta_ts.append(dt)
                t0 = time.perf_counter()
                total = read_manifested(spark, store).count()
                full_ts.append(time.perf_counter() - t0)
            cursor = v
            steps.append({
                "step": step,
                "store_files": files_per * (step + 1),
                "store_rows": lo,
                "delta_rows": n,
                "consume_delta_s": round(statistics.median(delta_ts), 4),
                "full_read_s": round(statistics.median(full_ts), 4),
                "total_rows_check": total,
            })
            print(json.dumps(steps[-1]))
        res = compact_manifested(spark, store, min_files_to_compact=2)
        t0 = time.perf_counter()
        d, cursor = read_manifested_changes(spark, store, cursor)
        post_compact_s = time.perf_counter() - t0
        assert d is None, "fold must deliver nothing"
        out = {
            "protocol": {
                "rounds": rounds, "files_per_append": files_per,
                "rows_per_append": rows_per, "reps": 3, "stat": "median",
            },
            "steps": steps,
            "post_compaction_poll": {
                "files_folded": res["files_before"],
                "rows_delivered": 0,
                "poll_s": round(post_compact_s, 4),
            },
        }
        dest = os.path.join(REPO, "bench_runs_r11", "changes_read.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", dest)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
