"""Per-file bloom sidecars (r11): the POINT-LOOKUP complement to the
manifest's min/max stats — id-like values hash uniformly across files so
span pruning is useless, but a 16 KB sidecar membership test bounds a
point read or a GDPR delete to the files that can contain the value."""

import glob

import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.sources.sinks import (
    delete_manifested,
    read_manifested,
    vacuum_manifested,
    write_manifested,
)


def _files(df) -> int:
    return len(df.inputFiles())


class TestBloomPointRead:
    def test_point_read_touches_one_file(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for lo in (0, 1000, 2000, 3000):
            write_manifested(
                spark, spark.range(lo, lo + 500).coalesce(1), path,
                bloom_cols=["id"],
            )
        full = read_manifested(spark, path)
        assert _files(full) == 4
        hit = read_manifested(spark, path, point={"id": 2123})
        assert _files(hit) <= 2  # 1 + possible false positives
        assert hit.where("id = 2123").count() == 1
        # sidecars exist, one per data file
        assert len(glob.glob(f"{path}/_index/**/*.bloom",
                             recursive=True)) == 4

    def test_absent_value_returns_empty_with_schema(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 100).coalesce(1), path,
                         bloom_cols=["id"])
        out = read_manifested(spark, path, point={"id": 987654})
        assert out.columns == ["id"]
        assert out.count() == 0

    def test_string_column_bloom(self, spark, tmp_path):
        path = str(tmp_path / "store")
        rows = [(i, f"doc-{i:04d}") for i in range(200)]
        df = spark.createDataFrame(rows, "id long, doc_id string")
        write_manifested(spark, df.where("id < 100").coalesce(1), path,
                         bloom_cols=["doc_id"])
        write_manifested(spark, df.where("id >= 100").coalesce(1), path,
                         bloom_cols=["doc_id"])
        hit = read_manifested(spark, path, point={"doc_id": "doc-0150"})
        assert _files(hit) == 1
        assert hit.where("doc_id = 'doc-0150'").count() == 1

    def test_files_without_bloom_kept_conservative(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 50).coalesce(1), path,
                         bloom_cols=["id"])
        write_manifested(spark, spark.range(50, 100).coalesce(1), path)
        # value lives in the bloom-less file: it must be scanned
        out = read_manifested(spark, path, point={"id": 75})
        assert out.where("id = 75").count() == 1

    def test_distributed_check_over_many_files(self, spark, tmp_path):
        """>64 bloom files takes the executor-distributed membership
        branch — same answer as the driver loop."""
        path = str(tmp_path / "store")
        df = spark.range(0, 7200).repartitionByRange(72, "id")
        write_manifested(spark, df, path, bloom_cols=["id"])
        hit = read_manifested(spark, path, point={"id": 4242})
        assert _files(hit) <= 4
        assert hit.where("id = 4242").count() == 1


class TestBloomDelete:
    def test_gdpr_delete_bounded_by_bloom(self, spark, tmp_path):
        path = str(tmp_path / "store")
        rows = [(i, f"user-{i % 40:03d}") for i in range(400)]
        df = spark.createDataFrame(rows, "id long, owner string")
        for lo in (0, 100, 200, 300):
            write_manifested(
                spark,
                df.where(f"id >= {lo} AND id < {lo + 100}").coalesce(1),
                path, bloom_cols=["owner"],
            )
        # owner user-007 appears in every file: bloom keeps all 4
        res = delete_manifested(
            spark, path, "owner = 'user-007'", point={"owner": "user-007"}
        )
        assert res["rows_deleted"] == 10 and res["files_rewritten"] == 4
        # a value that never existed: bloom prunes the scan to nothing
        res2 = delete_manifested(
            spark, path, "owner = 'user-999'", point={"owner": "user-999"}
        )
        assert res2 == {"files_rewritten": 0, "rows_deleted": 0,
                        "version": res2["version"]}
        back = read_manifested(spark, path)
        assert back.count() == 390
        assert back.where("owner = 'user-007'").count() == 0


class TestBloomLifecycle:
    def test_vacuum_reclaims_replaced_and_orphan_sidecars(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 50).coalesce(1), path,
                         bloom_cols=["id"])
        write_manifested(spark, spark.range(0, 60).coalesce(1), path,
                         bloom_cols=["id"], replace="all")
        assert len(glob.glob(f"{path}/_index/**/*.bloom",
                             recursive=True)) == 2
        vacuum_manifested(spark, path, keep_versions=1,
                          orphan_grace_seconds=0.0)
        left = glob.glob(f"{path}/_index/**/*.bloom", recursive=True)
        assert len(left) == 1, "replaced file's sidecar must be reclaimed"
        # the survivor still serves point reads
        hit = read_manifested(spark, path, point={"id": 55})
        assert hit.where("id = 55").count() == 1


class TestMultiValueAndMerge:
    def test_forget_many_users_point_list(self, spark, tmp_path):
        path = str(tmp_path / "store")
        rows = [(i, f"user-{i:04d}") for i in range(400)]
        df = spark.createDataFrame(rows, "id long, owner string")
        for lo in (0, 100, 200, 300):
            write_manifested(
                spark,
                df.where(f"id >= {lo} AND id < {lo + 100}").coalesce(1),
                path, bloom_cols=["owner"],
            )
        res = delete_manifested(
            spark, path,
            "owner IN ('user-0005', 'user-0105')",
            point={"owner": ["user-0005", "user-0105"]},
        )
        assert res["rows_deleted"] == 2 and res["files_rewritten"] == 2
        assert read_manifested(spark, path).count() == 398

    def test_merge_prunes_by_key_bloom(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            _canon_uri, _hadoop_fs, _manifest_head, merge_manifested,
        )

        path = str(tmp_path / "store")
        rows = [(i, f"doc-{i:04d}", "old") for i in range(400)]
        df = spark.createDataFrame(rows, "id long, doc_id string, v string")
        for lo in (0, 100, 200, 300):
            write_manifested(
                spark,
                df.where(f"id >= {lo} AND id < {lo + 100}").coalesce(1),
                path, bloom_cols=["doc_id"],
            )
        updates = spark.createDataFrame(
            [(999, "doc-0250", "new")], "id long, doc_id string, v string"
        )
        res = merge_manifested(spark, updates, path, key="doc_id")
        assert res["files_rewritten"] == 1, (
            "the key bloom must bound the rewrite to the containing file"
        )
        back = read_manifested(spark, path)
        got = {r.doc_id: r.v for r in back.collect()}
        assert got["doc-0250"] == "new" and got["doc-0249"] == "old"
        assert back.count() == 400


class TestReindex:
    def test_reindex_restores_point_pruning_after_compaction(
        self, spark, tmp_path
    ):
        from aeon_sleap_processing_spark.sources.sinks import (
            compact_manifested, read_manifested_changes, reindex_manifested,
        )

        path = str(tmp_path / "store")
        rows = [(i, f"doc-{i:05d}", i // 1000) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, doc_id string, p long")
        for lo in (0, 2000):
            write_manifested(
                spark,
                df.where(f"id >= {lo} AND id < {lo + 2000}")
                .repartition(4, "id"),
                path, partition_by=["p"], bloom_cols=["doc_id"],
            )
        _, cursor = read_manifested_changes(spark, path)
        assert compact_manifested(spark, path, min_files_to_compact=2)[
            "compacted"
        ]
        # compaction output lost its blooms: point read scans everything
        before = read_manifested(spark, path, point={"doc_id": "doc-02500"})
        n_all = len(read_manifested(spark, path).inputFiles())
        assert len(before.inputFiles()) == n_all
        res = reindex_manifested(spark, path, ["doc_id"])
        assert res["reindexed"] == n_all
        after = read_manifested(spark, path, point={"doc_id": "doc-02500"})
        assert len(after.inputFiles()) < n_all
        assert after.where("doc_id = 'doc-02500'").count() == 1
        # metadata-only and dataChange=false: CDC consumers see nothing
        d, _ = read_manifested_changes(spark, path, since_version=cursor)
        assert d is None
        # idempotent: a second pass finds nothing to do
        assert reindex_manifested(spark, path, ["doc_id"])["reindexed"] == 0

    def test_maintain_reindexes_when_asked(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import maintain

        path = str(tmp_path / "store")
        rows = [(i, f"doc-{i:05d}", i // 1000) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, doc_id string, p long")
        for lo in (0, 2000):
            write_manifested(
                spark,
                df.where(f"id >= {lo} AND id < {lo + 2000}")
                .repartition(4, "id"),
                path, partition_by=["p"], bloom_cols=["doc_id"],
            )
        rep = maintain(spark, path, min_files_to_compact=2,
                       bloom_cols=["doc_id"], orphan_grace_seconds=0.0)
        assert rep["reindex"]["reindexed"] >= 1
        hit = read_manifested(spark, path, point={"doc_id": "doc-02500"})
        assert len(hit.inputFiles()) < len(
            read_manifested(spark, path).inputFiles()
        )


class TestHashParity:
    def test_python_and_spark_positions_agree(self, spark):
        """The write side computes bloom positions with Spark expressions
        (md5 → conv slices), the test side with hashlib — if they ever
        drift, point reads get FALSE NEGATIVES (silently missing data),
        so pin bit-equality directly over mixed values."""
        from hypothesis import given, settings, HealthCheck
        from hypothesis import strategies as st

        from aeon_sleap_processing_spark.sources.sinks import (
            _bloom_position_exprs, _bloom_positions_py,
        )

        m = 1 << 17

        @settings(max_examples=5, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])
        @given(
            vals=st.lists(
                st.one_of(
                    st.integers(-(2 ** 62), 2 ** 62),
                    st.text(
                        alphabet=st.characters(codec="utf-8",
                                               blacklist_categories=["Cs"]),
                        min_size=0, max_size=40,
                    ),
                ),
                min_size=1, max_size=20,
            )
        )
        def check(vals):
            import pandas as pd

            from pyspark.sql import functions as F

            pdf = pd.DataFrame({"v": [str(x) for x in vals]})
            df = spark.createDataFrame(pdf)
            rows = df.select(
                "v", F.array(*_bloom_position_exprs("v", m)).alias("pos")
            ).collect()
            for r in rows:
                assert list(r["pos"]) == _bloom_positions_py(r["v"], m), r["v"]

        check()
