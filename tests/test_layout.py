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

    def test_hilbert_matches_reference_xy2d(self, spark):
        """BOTH hilbert_value implementations (vectorized Arrow kernel and
        the JVM F.aggregate fold) must equal the classic xy2d recurrence
        exactly, over the full 16x16 grid (identity rescale)."""
        from aeon_sleap_processing_spark.operators.layout import hilbert_value

        def xy2d(n, x, y):
            d, s = 0, n // 2
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x, y = s - 1 - x, s - 1 - y
                    x, y = y, x
                s //= 2
            return d

        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x long, y long")
        exp = {(x, y): xy2d(16, x, y) for x, y in rows}
        for impl in ("kernel", "fold"):
            got = {
                (r.x, r.y): r["__h"]
                for r in hilbert_value(df, ["x", "y"], bits=4, impl=impl).collect()
            }
            assert got == exp, impl

    def test_hilbert_kernel_equals_fold_with_rescale(self, spark):
        """The two implementations agree bit-for-bit through the full
        non-identity rescale path at production bits=16."""
        import random

        from aeon_sleap_processing_spark.operators.layout import hilbert_value

        rng = random.Random(7)
        rows = [
            (rng.uniform(-50, 900), rng.randint(3, 10_000)) for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "x double, y long")
        a = {
            (r.x, r.y): r["__h"]
            for r in hilbert_value(df, ["x", "y"], bits=16, impl="kernel").collect()
        }
        b = {
            (r.x, r.y): r["__h"]
            for r in hilbert_value(df, ["x", "y"], bits=16, impl="fold").collect()
        }
        assert a == b and len(a) == 500

    def test_hilbert_skips_at_least_as_well_as_zorder(self, spark, tmp_path):
        """Jump-free curve: for the same box predicate and file count,
        the Hilbert layout must touch no more files than z-order (it ties
        on uniform grids, wins on the lineitem measurement in README)."""
        from aeon_sleap_processing_spark.operators.layout import (
            hilbert_layout,
            parquet_skipping_stats,
            zorder_layout,
        )

        df = spark.range(100_000).selectExpr(
            "id % 1000 AS x", "CAST((id * 48271) % 1000 AS long) AS y"
        )
        z_path, h_path = str(tmp_path / "z"), str(tmp_path / "h")
        zorder_layout(df, ["x", "y"], num_partitions=256).write.parquet(z_path)
        hilbert_layout(df, ["x", "y"], num_partitions=256).write.parquet(h_path)
        # aggregate over several boxes: per-box counts jitter by +-1-2
        # files from range-partitioner boundary sampling
        boxes = [
            {"x": (lo, lo + 199), "y": (lo2, lo2 + 199)}
            for lo, lo2 in [(400, 400), (100, 100), (700, 700), (100, 700), (700, 100)]
        ]
        zo = sum(parquet_skipping_stats(z_path, b)["files_hit"] for b in boxes)
        hi = sum(parquet_skipping_stats(h_path, b)["files_hit"] for b in boxes)
        assert hi <= zo + 2, (hi, zo)
        # and both layouts hold the same rows
        assert (
            spark.read.parquet(h_path).count()
            == spark.read.parquet(z_path).count()
            == 100_000
        )

    def test_zorder_actually_skips_row_groups(self, spark, tmp_path):
        """The skipping claim, measured: write the SAME table twice — a
        linear sort on x vs zorder_layout on (x, y) — then audit the
        parquet footers against a rectangular two-column predicate (the
        exact min/max stats Spark's pushed-down parquet filter prunes
        on). The z-ordered layout must touch fewer row groups AND fewer
        files, and both layouts must return identical filtered rows.

        Uses a deterministic 100k uniform grid: the advantage is
        box-area vs slab-width — linear touches ~f*N groups (one dim
        prunable), zorder ~(f + N^-1/2)^2 * N (both dims), which needs
        groups small relative to the box to show (at test-SF lineitem,
        47-row groups drown the effect in curve-granularity noise; the
        sf0.1 lineitem number lives in tools/measure_zorder_skipping.py
        and README)."""
        from aeon_sleap_processing_spark.operators.layout import (
            parquet_skipping_stats,
            zorder_layout,
        )

        # Weyl-sequence y: uniform, deterministic, independent-ish of x
        df = spark.range(100_000).selectExpr(
            "id % 1000 AS x",
            "CAST((id * 48271) % 1000 AS long) AS y",
            "id AS payload",
        )
        n = 256
        lin_path = str(tmp_path / "linear")
        z_path = str(tmp_path / "zorder")
        (
            df.repartitionByRange(n, "x")
            .sortWithinPartitions("x")
            .write.parquet(lin_path)
        )
        zorder_layout(df, ["x", "y"], num_partitions=n).write.parquet(z_path)
        box = {"x": (400, 599), "y": (400, 599)}  # middle 20% per dim
        lin = parquet_skipping_stats(lin_path, box)
        zo = parquet_skipping_stats(z_path, box)
        # theory: linear ~0.2*256=51 groups, zorder ~(0.2+1/16)^2*256=18
        assert zo["row_groups_hit"] < lin["row_groups_hit"] / 1.5, (zo, lin)
        assert zo["files_hit"] < lin["files_hit"] / 1.5, (zo, lin)
        # and the layouts are query-equivalent
        pred = (
            (F.col("x") >= 400) & (F.col("x") <= 599)
            & (F.col("y") >= 400) & (F.col("y") <= 599)
        )
        rows_lin = sorted(
            map(tuple, spark.read.parquet(lin_path).filter(pred).collect())
        )
        rows_z = sorted(
            map(tuple, spark.read.parquet(z_path).filter(pred).collect())
        )
        assert rows_lin == rows_z and len(rows_lin) > 0


class TestSkippingStatsPartitionedRoot:
    def test_recurses_into_partition_leaves(self, spark, tmp_path):
        """r8 ADVICE (low): pointed at a Hive-partitioned store root (as
        optimize_parquet produces), parquet_skipping_stats must audit
        the leaf files rather than silently returning all-zero counts."""
        from aeon_sleap_processing_spark.operators.layout import (
            parquet_skipping_stats,
        )

        path = str(tmp_path / "store")
        spark.range(100).selectExpr(
            "id % 2 AS part", "id AS x"
        ).write.partitionBy("part").parquet(path)
        out = parquet_skipping_stats(path, {"x": (0, 10)})
        assert out["files"] > 0 and out["rows"] == 100
        assert 0 < out["rows_in_hit_groups"] < 100

    def test_raises_on_empty_dir(self, tmp_path):
        import pytest as _pytest

        from aeon_sleap_processing_spark.operators.layout import (
            parquet_skipping_stats,
        )

        with _pytest.raises(FileNotFoundError):
            parquet_skipping_stats(str(tmp_path), {"x": (0, 1)})
