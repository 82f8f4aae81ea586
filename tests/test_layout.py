"""Z-order layout: Morton code correctness and clustering locality."""

from pyspark.sql import functions as F


class TestZorder:
    def test_morton_code_known_values(self, spark):
        """bits=2, dims (x, y): bit i of dim d lands at i*2+d, so
        (x=3, y=1) -> 0b0111 = 7 and (x=0, y=2) -> 0b1000 = 8. Feed inputs
        already spanning [0, 3] so the rescale grid is the identity."""
        from aeon_sleap_processing_spark.operators.layout import zorder_value

        df = spark.createDataFrame(
            [(0, 0), (3, 3), (3, 1), (0, 2)], "x long, y long"
        )
        z = {
            (r["x"], r["y"]): r["__z"]
            for r in zorder_value(df, ["x", "y"], bits=2).collect()
        }
        assert z[(0, 0)] == 0 and z[(3, 3)] == 15
        assert z[(3, 1)] == 7 and z[(0, 2)] == 8

    def test_bucket_spans_are_local(self, spark, sf_dir):
        """256 curve segments over 2 dims tile a 16x16 coarse grid: every
        bucket's per-dimension span must be a small fraction of the full
        range — the property min/max file skipping prunes on."""
        from aeon_sleap_processing_spark.operators.layout import zorder_bucket_stats
        from aeon_sleap_processing_spark.sources import load_table

        li = load_table(spark, "lineitem", sf_dir)
        stats = zorder_bucket_stats(
            li, ["l_partkey", "l_suppkey"], bits=16
        ).collect()
        rng = li.agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("rp"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("rs"),
        ).first()
        assert len(stats) > 50
        for r in stats:
            assert r["max_l_partkey"] - r["min_l_partkey"] <= rng["rp"] / 8
            assert r["max_l_suppkey"] - r["min_l_suppkey"] <= rng["rs"] / 8

    def test_layout_partitions_are_contiguous(self, spark):
        """zorder_layout range-partitions on the code: partition z-ranges
        must not interleave (each output file = one curve segment)."""
        from aeon_sleap_processing_spark.operators.layout import (
            zorder_layout,
            zorder_value,
        )

        df = spark.range(4096).selectExpr(
            "id % 64 AS x", "CAST(id / 64 AS long) AS y"
        )
        out = zorder_layout(df, ["x", "y"], bits=8, num_partitions=8)
        z = zorder_value(out, ["x", "y"], bits=8)
        spans = (
            z.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(spans) > 1
        for prev, cur in zip(spans, spans[1:]):
            assert prev["hi"] <= cur["lo"]
