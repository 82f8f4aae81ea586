"""Measure the IVF cluster-by-cell layout's partition pruning (r9).

Writes the sf0.1 embeddings in cluster-by-cell layout under the trained
centroids (tools/ivf_centroids_trained.json) and reports files actually
scanned (input_file_name() post-pruning) for (a) ONE query at nprobe=4
— the point-lookup case, where pruning is exactly nprobe/n_cells — and
(b) a 10-query batch, where the scan is the UNION of probed cells (a
diverse batch legitimately touches most cells; pruning wins when the
batch is cell-correlated or small). Plus 3-run medians for the
clustered search vs the logical-only knn_ivf over the flat table. At
100 TB the pruned fraction IS the I/O fraction — the quantizer doubles
as the partition key.

Writes bench_runs_r9/ivf_layout.json.

Usage: python tools/measure_ivf_layout.py
"""

import glob
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    import aeon_sleap_processing_spark.operators.similarity as S
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    with open(os.path.join(REPO, "tools", "ivf_centroids_trained.json")) as f:
        cents = json.load(f)["centroids"]

    spark = get_spark(app_name="ivf-layout", shuffle_partitions=32)
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.1")
    queries = emb.where(F.col("vec_id") < 10)

    path = os.path.join(tempfile.mkdtemp(), "store")
    S.ivf_write_clustered(emb, cents, path)
    store_files = len(glob.glob(os.path.join(path, "cell=*", "*.parquet")))

    nprobe = 4
    got = S.knn_ivf_clustered(spark, path, cents, queries, nprobe=nprobe)

    # post-pruning file census for a probed-cell set
    cellN = S._probe_udf(__import__("numpy").asarray(cents, dtype=float), nprobe)

    def probed_cells(qdf):
        return sorted(
            {r["c"] for r in qdf.select(
                F.explode(cellN(F.col("embedding"))).alias("c")).distinct().collect()}
        )

    def files_scanned(cells):
        return (
            spark.read.parquet(path)
            .where(F.col("cell").isin(cells))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    probed_one = probed_cells(emb.where(F.col("vec_id") == 0))
    scanned_one = files_scanned(probed_one)
    probed = probed_cells(queries)
    scanned = files_scanned(probed)

    def med(fn):
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        return round(statistics.median(ts), 2)

    got.collect()  # warm
    out = {
        "n_cells": len(cents),
        "nprobe": nprobe,
        "store_files": store_files,
        "one_query": {
            "probed_cells": probed_one,
            "files_scanned": scanned_one,
            "scan_fraction": round(scanned_one / store_files, 3),
        },
        "batch_10_queries": {
            "probed_cells": probed,
            "files_scanned": scanned,
            "scan_fraction": round(scanned / store_files, 3),
        },
        "clustered_search_s": med(
            lambda: S.knn_ivf_clustered(spark, path, cents, queries, nprobe=nprobe)
        ),
        "flat_knn_ivf_s": med(
            lambda: S.knn_ivf(emb, queries, cents, nprobe=nprobe)
        ),
    }
    os.makedirs(os.path.join(REPO, "bench_runs_r9"), exist_ok=True)
    with open(os.path.join(REPO, "bench_runs_r9", "ivf_layout.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
