"""Consumption-path throughput over one manifest store — the measured
form of the r11 CDC surface: the same 2M-row store drained by (a) the
`manifest_cdc` Structured Streaming source (Python DataSource, Arrow
batch hand-off), (b) the `watch_manifested` polling consumer (JVM
parquet scan per delta), and (c) a plain batch `read_manifested` count
(the floor — no streaming machinery at all). Writes
bench_runs_r11/cdc_source.json.

Run ISOLATED per the bench protocol.
Usage: python tools/measure_cdc_source.py [rows=2000000] [files=16]
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
    read_manifested, write_manifested,
)
from aeon_sleap_processing_spark.streaming import (  # noqa: E402
    ManifestCDCDataSource, watch_manifested,
)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="measure-cdc-source", shuffle_partitions=8)
    spark.dataSource.register(ManifestCDCDataSource)
    root = tempfile.mkdtemp(prefix="cdc_source_")
    store = os.path.join(root, "s")
    try:
        write_manifested(
            spark,
            spark.range(0, rows).selectExpr("id", "id * 2 AS y")
            .repartition(files),
            store,
        )
        legs: dict[str, list[float]] = {"stream_source": [], "watch": [],
                                        "batch_read": []}
        for rep in range(3):
            got = {"n": 0}
            t0 = time.perf_counter()
            q = (
                spark.readStream.format("manifest_cdc").load(store)
                .writeStream.foreachBatch(
                    lambda d, b: got.update(n=got["n"] + d.count())
                )
                .option("checkpointLocation",
                        os.path.join(root, f"ck_s{rep}"))
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(600)
            legs["stream_source"].append(time.perf_counter() - t0)
            assert got["n"] == rows

            got = {"n": 0}
            t0 = time.perf_counter()
            watch_manifested(
                spark, store,
                lambda d, v: got.update(n=got["n"] + d.count()),
                os.path.join(root, f"cur{rep}.json"),
            )
            legs["watch"].append(time.perf_counter() - t0)
            assert got["n"] == rows

            t0 = time.perf_counter()
            assert read_manifested(spark, store).count() == rows
            legs["batch_read"].append(time.perf_counter() - t0)
        out = {
            "protocol": {"rows": rows, "files": files, "reps": 3,
                         "stat": "median"},
            "legs_s": {k: round(statistics.median(v), 3)
                       for k, v in legs.items()},
            "rows_per_s": {
                k: int(rows / statistics.median(v))
                for k, v in legs.items()
            },
        }
        dest = os.path.join(REPO, "bench_runs_r11", "cdc_source.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        print("wrote", dest)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
