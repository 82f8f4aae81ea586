"""Manifest pruning vs directory listing on a MANY-FILE chunk store —
the measured form of the r11 storage claim: a narrow time-range scan on a
manifest store resolves from the head (prefix filter + per-file stats,
zero listings, zero footer reads of skipped files), while the listing
layout must walk the directory tree and open every surviving file's
footer before row-group skipping can drop anything.

Protocol: the SAME data written to both layouts — N_WRITES appends x
HOURS hour-chunks (one file per chunk per append ⇒ N_WRITES*HOURS data
files), then a 1-hour-wide range count timed COLD (fresh DataFrame each
rep; Spark's file-index caching is per-DataFrame) 5x per layout, plus the
resolve-only time (DataFrame construction, where listing happens).
Writes bench_runs_r11/manifest_pruning.json.

Run ISOLATED per the bench protocol.
Usage: python tools/measure_manifest_pruning.py [hours=128] [writes=8]
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

import pandas as pd  # noqa: E402

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.sources.chunked import (  # noqa: E402
    load_chunked, write_chunked,
)


def main():
    hours = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    writes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="manifest_pruning_")
    out = {"hours": hours, "writes": writes, "layouts": {}}
    try:
        for layout in ("manifest", "listing"):
            root = f"{work}/store_{layout}"
            for w in range(writes):
                pdf = pd.DataFrame({
                    "time": pd.date_range(
                        "2024-03-01", periods=hours * 4, freq="15min"
                    ) + pd.Timedelta(seconds=w),
                    "v": range(hours * 4),
                })
                write_chunked(
                    spark.createDataFrame(pdf), root, "CameraTop", 200,
                    mode="append", commit=layout,
                )
            start, end = "2024-03-02 06:00", "2024-03-02 07:10"
            # NOTE: inputFiles() reports the DataFrame FILE INDEX —
            # manifest-side pruning shrinks it before Spark exists;
            # the listing layout holds every file and relies on
            # Catalyst partition pruning at planning, so its index
            # stays store-sized. The resolve gap is the listing walk.
            resolves, walls, files = [], [], None
            for _ in range(5):
                t0 = time.monotonic()
                df = load_chunked(
                    spark, root, 200, "CameraTop", start=start, end=end
                )
                resolves.append(time.monotonic() - t0)
                t1 = time.monotonic()
                n = df.count()
                walls.append(time.monotonic() - t1)
                files = len(df.inputFiles())
            assert n == 5 * writes, n  # 06:00..07:00 inclusive hits 5 ticks
            out["layouts"][layout] = {
                "data_files_total": hours * writes,
                "file_index_size": files,
                "resolve_sec_median": round(statistics.median(resolves), 3),
                "count_sec_median": round(statistics.median(walls), 3),
            }
            print(layout, out["layouts"][layout], flush=True)
        os.makedirs(f"{REPO}/bench_runs_r11", exist_ok=True)
        path = f"{REPO}/bench_runs_r11/manifest_pruning.json"
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
