"""Bloom point-lookup vs full-scan — the measured form of the r11
sidecar claim: finding (or forgetting) one id-like value in a many-file
store should cost sidecar membership tests + a scan of only the
containing files, while the no-bloom alternative filters every file.

Protocol: one store of N_FILES files (unique doc ids, each id in exactly
one file), bloom_cols=["doc_id"]. Time (a) point read of one id with
``point=`` (record files scanned), (b) the same read without ``point=``
(full filter scan), 3 reps median, COLD DataFrames. Writes
bench_runs_r11/bloom_point.json.

Run ISOLATED per the bench protocol.
Usage: python tools/measure_bloom_point.py [files=128] [rows_per_file=20000]
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

from pyspark.sql import functions as F  # noqa: E402

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.sources.sinks import (  # noqa: E402
    read_manifested, write_manifested,
)


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="measure-bloom-point", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="bloom_point_")
    store = os.path.join(root, "s")
    try:
        df = (
            spark.range(0, n_files * rows)
            .withColumn("doc_id", F.format_string("doc-%09d", "id"))
            .repartitionByRange(n_files, "id")
        )
        write_manifested(spark, df, store, bloom_cols=["doc_id"])
        target = f"doc-{(n_files // 2) * rows + 7:09d}"
        pt_ts, full_ts, pt_files = [], [], None
        for _ in range(3):
            t0 = time.perf_counter()
            hit = read_manifested(spark, store, point={"doc_id": target})
            n = hit.where(F.col("doc_id") == target).count()
            pt_ts.append(time.perf_counter() - t0)
            pt_files = len(hit.inputFiles())
            assert n == 1
            t0 = time.perf_counter()
            n2 = (
                read_manifested(spark, store)
                .where(F.col("doc_id") == target).count()
            )
            full_ts.append(time.perf_counter() - t0)
            assert n2 == 1
        out = {
            "protocol": {"files": n_files, "rows_per_file": rows,
                         "reps": 3, "stat": "median"},
            "point_read_s": round(statistics.median(pt_ts), 4),
            "point_files_scanned": pt_files,
            "full_filter_s": round(statistics.median(full_ts), 4),
            "store_files": n_files,
        }
        dest = os.path.join(REPO, "bench_runs_r11", "bloom_point.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        print("wrote", dest)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
