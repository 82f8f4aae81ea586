"""Measured multi-dimensional-layout skipping at sf0.1: write lineitem
three ways (linear sort on l_partkey, zorder_layout, hilbert_layout on
(l_partkey, l_suppkey)), audit parquet footers with
parquet_skipping_stats for a middle-10%-per-dim rectangular predicate,
and print row-groups/files touched for each layout.

This is the committed evidence behind the layout module's skipping
claims (README); the pytest twins run a smaller deterministic grid
(tests/test_layout.py).

Usage: python tools/measure_zorder_skipping.py [sf_dir]
"""

import json
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators.layout import (
    hilbert_layout,
    parquet_skipping_stats,
    zorder_layout,
)
from aeon_sleap_processing_spark.session import get_spark
from aeon_sleap_processing_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(shuffle_partitions=32)
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n = 256
    d = tempfile.mkdtemp(prefix="zorder_measure_")
    lin_path, z_path, h_path = d + "/linear", d + "/zorder", d + "/hilbert"
    try:
        (
            li.repartitionByRange(n, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.parquet(lin_path)
        )
        zorder_layout(
            li, ["l_partkey", "l_suppkey"], num_partitions=n
        ).write.parquet(z_path)
        hilbert_layout(
            li, ["l_partkey", "l_suppkey"], num_partitions=n
        ).write.parquet(h_path)
        b = li.agg(
            F.expr("percentile(l_partkey, 0.45)").alias("pl"),
            F.expr("percentile(l_partkey, 0.55)").alias("ph"),
            F.expr("percentile(l_suppkey, 0.45)").alias("sl"),
            F.expr("percentile(l_suppkey, 0.55)").alias("sh"),
        ).first()
        box = {
            "l_partkey": (b["pl"], b["ph"]),
            "l_suppkey": (b["sl"], b["sh"]),
        }
        lin = parquet_skipping_stats(lin_path, box)
        zo = parquet_skipping_stats(z_path, box)
        hi = parquet_skipping_stats(h_path, box)
        pred = (
            (F.col("l_partkey") >= b["pl"]) & (F.col("l_partkey") <= b["ph"])
            & (F.col("l_suppkey") >= b["sl"]) & (F.col("l_suppkey") <= b["sh"])
        )
        counts = {
            p: spark.read.parquet(p).filter(pred).count()
            for p in (lin_path, z_path, h_path)
        }
        keys = ("files", "files_hit", "row_groups", "row_groups_hit",
                "rows_in_hit_groups")
        print(json.dumps({
            "sf_dir": sf_dir,
            "rows": lin["rows"],
            "box": {k: list(v) for k, v in box.items()},
            "linear": {k: lin[k] for k in keys},
            "zorder": {k: zo[k] for k in keys},
            "hilbert": {k: hi[k] for k in keys},
            "results_match": len(set(counts.values())) == 1,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
