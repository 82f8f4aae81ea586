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


def _to_legacy_layout(spark, path):
    """Rebuild the pre-r13 per-file sidecar layout by hand from the
    consolidated objects, re-point the manifest, drop the objects."""
    import json
    import os

    from aeon_sleap_processing_spark.sources import sinks

    fs, Path, root = sinks._hadoop_fs(spark, path)
    root_str = sinks._canon_uri(fs, root)
    _, head, _ = sinks._manifest_head(spark, fs, Path, root_str)
    add = []
    for e in head["files"]:
        obj, _, member = e["bloom"].partition("#")
        doc = json.load(open(os.path.join(path, obj)))
        legacy_rel = f"_index/{e['path']}.bloom"
        target = os.path.join(path, legacy_rel)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        with open(target, "w") as f:
            json.dump(
                {"m": doc["m"], "k": doc["k"],
                 "cols": doc["files"][member]}, f,
            )
        add.append((e["path"], e["bytes"], e.get("stats"), legacy_rel))
    sinks.manifest_commit(
        spark, path, add=add, remove=[a[0] for a in add],
        require_remove_present=True, op="reindex", data_change=False,
    )
    for objpath in glob.glob(f"{path}/_index/bloomset-*.json"):
        os.unlink(objpath)
    return len(add)



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
        # consolidated sidecars: ONE bloomset object per COMMIT, not one
        # per data file (r13 — point reads issue O(commits) GETs)
        assert len(glob.glob(f"{path}/_index/bloomset-*.json")) == 4

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
        # a value that never existed: bloom prunes the scan to nothing
        # (probed BEFORE any delete — DML rewrites drop blooms)
        res2 = delete_manifested(
            spark, path, "owner = 'user-999'", point={"owner": "user-999"}
        )
        assert res2["files_rewritten"] == 0 and res2["rows_deleted"] == 0
        assert res2["files_scanned"] == 0, "bloom must prune ALL candidates"
        # owner user-007 appears in every file: bloom keeps all 4
        res = delete_manifested(
            spark, path, "owner = 'user-007'", point={"owner": "user-007"}
        )
        assert res["rows_deleted"] == 10 and res["files_rewritten"] == 4
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
        assert len(glob.glob(f"{path}/_index/bloomset-*.json")) == 2
        vacuum_manifested(spark, path, keep_versions=1,
                          orphan_grace_seconds=0.0)
        left = glob.glob(f"{path}/_index/bloomset-*.json")
        assert len(left) == 1, (
            "the replaced commit's bloomset must be reclaimed"
        )
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


class TestMergePlanningBounded:
    def test_merge_over_bloom_guard_never_builds_key_list(
        self, spark, tmp_path, monkeypatch
    ):
        """A merge with MORE than _BLOOM_PRUNE_MAX_KEYS distinct keys must
        never materialize the update-key list (r16, guide §5): the r15
        fused ``slice(collect_set(...))`` capped the DRIVER transfer but
        the single-group aggregation buffer still accumulated every
        distinct key in executor memory — an OOM risk on a 100 TB merge.
        Above the guard, bloom pruning is skipped outright (no
        _bloom_filter_rels call, no key collect); the merge itself must
        still be correct."""
        from aeon_sleap_processing_spark.sources import sinks

        calls: list = []
        real = sinks._bloom_filter_rels

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        monkeypatch.setattr(sinks, "_bloom_filter_rels", spy)

        path = str(tmp_path / "store")
        df = spark.range(0, 20_000).select(
            F.col("id"),
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            F.lit("old").alias("v"),
        )
        for lo in (0, 10_000):
            write_manifested(
                spark,
                df.where(f"id >= {lo} AND id < {lo + 10_000}").coalesce(1),
                path, bloom_cols=["doc_id"],
            )
        n_over = sinks._BLOOM_PRUNE_MAX_KEYS + 1  # 10_001 distinct keys
        updates = spark.range(0, n_over).select(
            F.col("id"),
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            F.lit("new").alias("v"),
        )
        res = sinks.merge_manifested(spark, updates, path, key="doc_id")
        assert calls == [], (
            "over-guard merge must skip bloom pruning entirely — the key "
            "list must never be collected or aggregated"
        )
        assert res["rows_matched"] == n_over
        back = read_manifested(spark, path)
        assert back.count() == 20_000
        got = {r.doc_id: r.v for r in back.where(
            F.col("id").isin(0, n_over - 1, n_over)
        ).collect()}
        assert got == {
            "doc-0": "new",
            f"doc-{n_over - 1}": "new",
            f"doc-{n_over}": "old",
        }

    def test_small_merge_key_fetch_still_prunes(
        self, spark, tmp_path, monkeypatch
    ):
        """Below the guard the distinct-key list is fetched in a second,
        bounded job and bloom pruning still bounds the rewrite — and the
        fetch only happens when some candidate actually carries a bloom."""
        from aeon_sleap_processing_spark.sources import sinks

        calls: list = []
        real = sinks._bloom_filter_rels

        def spy(*a, **k):
            calls.append(k or a)
            return real(*a, **k)

        monkeypatch.setattr(sinks, "_bloom_filter_rels", spy)

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
        res = sinks.merge_manifested(spark, updates, path, key="doc_id")
        assert len(calls) == 1, "bloom pruning must run for a small merge"
        assert res["files_rewritten"] == 1


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


class TestConsolidatedBloomsets:
    """r13 (r12 VERDICT task 1): a commit's per-file bitsets ride ONE
    ``_index/bloomset-<token>.json`` object, manifest pointers are
    ``<object>#<rel>`` — a point read issues O(commits touched) sidecar
    GETs instead of O(files), the term that dominated a 10k-file GDPR
    lookup on an object store (dml_scale.json r12: 10,241 GETs for one
    read)."""

    def test_point_read_gets_are_per_commit_not_per_file(
        self, spark, tmp_path
    ):
        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")
        for lo in (0, 2000, 4000):  # 3 commits × 8 files
            write_manifested(
                spark,
                spark.range(lo, lo + 2000).repartitionByRange(8, "id"),
                path, bloom_cols=["id"],
            )
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 4242})
        assert hit.where("id = 4242").count() == 1
        got = {
            k: sinks._BLOOM_GETS[k] - before[k] for k in sinks._BLOOM_GETS
        }
        assert got == {"objects": 3, "per_file": 0}, got
        assert _files(hit) < 24

    def test_legacy_per_file_sidecars_still_served(self, spark, tmp_path):
        """A pre-r13 store (one ``_index/<rel>.bloom`` per file) keeps
        its point-lookup pruning: rebuild the legacy layout by hand from
        the consolidated object, drop the object, and read."""
        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")
        for lo in (0, 3600):  # 72 files: >64 exercises the distributed
            write_manifested(  # legacy-sidecar branch, not just the loop
                spark,
                spark.range(lo, lo + 3600).repartitionByRange(36, "id"),
                path, bloom_cols=["id"],
            )
        assert _to_legacy_layout(spark, path) == 72
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 1501})
        assert hit.where("id = 1501").count() == 1
        assert _files(hit) < 72
        got = {
            k: sinks._BLOOM_GETS[k] - before[k] for k in sinks._BLOOM_GETS
        }
        assert got == {"objects": 0, "per_file": 72}, got
        # r13 migration: ONE metadata-only commit re-points everything
        # into one consolidated object; point reads drop to 1 GET
        res = sinks.consolidate_bloom_sidecars(spark, path)
        assert res["consolidated"] == 72 and res["objects"] == 1
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 1501})
        assert hit.where("id = 1501").count() == 1
        got = {
            k: sinks._BLOOM_GETS[k] - before[k] for k in sinks._BLOOM_GETS
        }
        assert got == {"objects": 1, "per_file": 0}, got
        # idempotent; legacy sidecars are now vacuum orphans
        assert sinks.consolidate_bloom_sidecars(spark, path)[
            "consolidated"
        ] == 0
        from aeon_sleap_processing_spark.sources.sinks import (
            vacuum_manifested as _vac,
        )

        _vac(spark, path, keep_versions=1, orphan_grace_seconds=0.0)
        assert not glob.glob(f"{path}/_index/**/*.bloom", recursive=True)
        hit = read_manifested(spark, path, point={"id": 1501})
        assert hit.where("id = 1501").count() == 1

    def test_vacuum_keeps_partially_live_bloomset(self, spark, tmp_path):
        """A DML rewrite replaces SOME of a commit's files: the commit's
        bloomset must survive vacuum while ANY surviving entry still
        points into it — and keep serving point reads."""
        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 2000).repartitionByRange(4, "id"),
            path, bloom_cols=["id"],
        )
        delete_manifested(spark, path, "id = 42", point={"id": 42})
        vacuum_manifested(spark, path, keep_versions=1,
                          orphan_grace_seconds=0.0)
        assert len(glob.glob(f"{path}/_index/bloomset-*.json")) == 1, (
            "3 of 4 entries still reference the commit's bloomset"
        )
        hit = read_manifested(spark, path, point={"id": 1503})
        assert hit.where("id = 1503").count() == 1
        assert _files(hit) < 4

    def test_reindex_consolidates_after_compaction(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            compact_manifested, reindex_manifested,
        )

        path = str(tmp_path / "store")
        for lo in (0, 1000):
            write_manifested(
                spark,
                spark.range(lo, lo + 1000).repartitionByRange(4, "id"),
                path, bloom_cols=["id"],
            )
        assert compact_manifested(spark, path, min_files_to_compact=2)[
            "compacted"
        ]
        n_objects = len(glob.glob(f"{path}/_index/bloomset-*.json"))
        res = reindex_manifested(spark, path, ["id"])
        assert res["reindexed"] >= 1
        assert (
            len(glob.glob(f"{path}/_index/bloomset-*.json"))
            == n_objects + 1
        ), "reindex writes ONE consolidated object for all stragglers"
        hit = read_manifested(spark, path, point={"id": 77})
        assert hit.where("id = 77").count() == 1


class TestCorruptIndexObject:
    def test_missing_bloomset_degrades_to_conservative_keep(
        self, spark, tmp_path
    ):
        """A damaged/missing index object is a lost optimization, not
        an error: every member file is kept and the row predicate stays
        authoritative."""
        import os

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 1000).repartitionByRange(4, "id"),
            path, bloom_cols=["id"],
        )
        for obj in glob.glob(f"{path}/_index/bloomset-*.json"):
            os.unlink(obj)
        hit = read_manifested(spark, path, point={"id": 123})
        assert _files(hit) == 4  # nothing pruned — nothing lost
        assert hit.where("id = 123").count() == 1


class TestEncodedRootUri:
    def test_percent_and_space_roots_survive_pyarrow_round_trip(
        self, tmp_path
    ):
        """The r12 ADVICE finding: pyarrow's from_uri percent-DECODES
        its input, so the DECODED _canon_uri rendering must be re-encoded
        first — a root with a literal '%2F' or a space otherwise resolves
        to a different (or no) path."""
        import pyarrow.fs as pafs

        from aeon_sleap_processing_spark.sources.sinks import (
            _encoded_root_uri,
        )

        root = tmp_path / "ro ot %2Fx"
        root.mkdir()
        (root / "probe.txt").write_bytes(b"hi")
        fs2, p = pafs.FileSystem.from_uri(
            _encoded_root_uri(f"file://{root}")
        )
        with fs2.open_input_stream(f"{p}/probe.txt") as f:
            assert f.read() == b"hi"


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


class TestMaintainMigratesLegacy:
    def test_maintain_consolidates_legacy_sidecars(self, spark, tmp_path):
        """maintain(bloom_cols=...) on a pre-r13 store migrates the
        per-file sidecars to consolidated objects automatically."""
        import os

        from aeon_sleap_processing_spark.sources import sinks
        from aeon_sleap_processing_spark.sources.sinks import maintain

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 1000).repartitionByRange(4, "id"),
            path, bloom_cols=["id"],
        )
        assert _to_legacy_layout(spark, path) == 4
        rep = maintain(spark, path, min_files_to_compact=99,
                       bloom_cols=["id"], orphan_grace_seconds=0.0)
        assert rep["consolidate_blooms"]["consolidated"] == 4
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 123})
        assert hit.where("id = 123").count() == 1
        got = {
            k: sinks._BLOOM_GETS[k] - before[k] for k in sinks._BLOOM_GETS
        }
        assert got["per_file"] == 0 and got["objects"] >= 1, got


class TestR14AdviceHardening:
    def test_malformed_bloomset_object_degrades_to_keep(
        self, spark, tmp_path
    ):
        """A bloomset that parses as JSON but lacks the 'm'/'files'
        shape (truncated or foreign file) must degrade to the same
        conservative keep-all as a MISSING object — not KeyError the
        point read (r13 ADVICE finding)."""
        import json
        import os

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 1000).repartitionByRange(4, "id"),
            path, bloom_cols=["id"],
        )
        for bad in ({"files": {}}, {"m": "x", "files": {}},
                    {"m": 1 << 17, "files": 3}, [1, 2], "nope"):
            for obj in glob.glob(f"{path}/_index/bloomset-*.json"):
                with open(obj, "w") as f:
                    json.dump(bad, f)
            hit = read_manifested(spark, path, point={"id": 123})
            assert _files(hit) == 4, bad  # nothing pruned — nothing lost
            assert hit.where("id = 123").count() == 1, bad

    def test_consolidate_skips_corrupt_legacy_sidecar(
        self, spark, tmp_path
    ):
        """One damaged legacy sidecar must not abort the whole
        migration (maintain() calls it): the entry is skipped, its
        manifest pointer left as-is, and reported in 'skipped' — the
        read path already treats the same corruption as a conservative
        keep (r13 ADVICE finding)."""
        import os

        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 1000).repartitionByRange(4, "id"),
            path, bloom_cols=["id"],
        )
        assert _to_legacy_layout(spark, path) == 4
        sidecars = sorted(
            glob.glob(f"{path}/_index/**/*.bloom", recursive=True)
        )
        with open(sidecars[0], "w") as f:
            f.write("{ not json")
        with open(sidecars[1], "w") as f:
            f.write('{"m": "not-an-int", "cols": {}}')
        os.unlink(sidecars[2])
        res = sinks.consolidate_bloom_sidecars(spark, path)
        assert res["skipped"] == 3 and res["consolidated"] == 1, res
        assert res["objects"] == 1
        # the store still answers correctly: the migrated file probes
        # its bloomset, the three skipped ones degrade to keep
        hit = read_manifested(spark, path, point={"id": 123})
        assert hit.where("id = 123").count() == 1
        # all-corrupt migration is a no-op report, never a raise
        for s in glob.glob(f"{path}/_index/**/*.bloom", recursive=True):
            with open(s, "w") as f:
                f.write("garbage")
        res2 = sinks.consolidate_bloom_sidecars(spark, path)
        assert res2["consolidated"] == 0 and res2["skipped"] >= 1

    def test_encoded_root_uri_schemeless_path(self, tmp_path):
        """A scheme-less root must not ValueError on the split — it is
        passed through unchanged, because from_uri treats a bare path
        LITERALLY (no percent-decoding), so encoding would relocate it
        (r13 ADVICE finding)."""
        import pyarrow.fs as pafs

        from aeon_sleap_processing_spark.sources.sinks import (
            _encoded_root_uri,
        )

        root = tmp_path / "ro ot %2Fx"
        root.mkdir()
        (root / "probe.txt").write_bytes(b"hi")
        enc = _encoded_root_uri(str(root))
        assert enc == str(root)
        fs2, p = pafs.FileSystem.from_uri(enc)
        with fs2.open_input_stream(f"{p}/probe.txt") as f:
            assert f.read() == b"hi"


class TestCompactBloomsets:
    """r13 VERDICT task 1: the write path emits ONE bloomset per commit,
    so a micro-commit streaming store accumulates O(commits) objects and
    the point-read GET bound decays. compact_bloomsets() repacks small
    objects across commits into count-capped ones."""

    def _micro_commit_store(self, spark, tmp_path, commits=12,
                            files_per=2, rows=120):
        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")
        per = rows // commits
        for i in range(commits):
            write_manifested(
                spark,
                spark.range(i * per, (i + 1) * per)
                .repartitionByRange(files_per, "id"),
                path, bloom_cols=["id"],
            )
        return path, sinks

    def test_point_read_gets_bounded_after_compaction(
        self, spark, tmp_path
    ):
        path, sinks = self._micro_commit_store(spark, tmp_path)
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        got = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
        assert got == {"objects": 12, "per_file": 0}, got  # O(commits)
        rep = sinks.compact_bloomsets(spark, path, target_members=16)
        assert rep["repacked_rels"] == 24 and rep["objects_before"] == 12
        assert rep["objects_after"] == 2, rep  # ceil(24/16)
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        got = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
        assert got == {"objects": 2, "per_file": 0}, got
        assert _files(hit) < 24  # pruning quality survived the repack
        # idempotent: the remainder object alone is never re-churned
        rep2 = sinks.compact_bloomsets(spark, path, target_members=16)
        assert rep2["repacked_rels"] == 0, rep2

    def test_dead_members_dropped_and_vacuum_reclaims(
        self, spark, tmp_path
    ):
        import glob as _glob

        path, sinks = self._micro_commit_store(spark, tmp_path)
        # a DML delete strands dead members inside old objects
        delete_manifested(spark, path, "id >= 100")
        n_objs = len(_glob.glob(f"{path}/_index/bloomset-*.json"))
        rep = sinks.compact_bloomsets(spark, path, target_members=512)
        assert rep["repacked_rels"] > 0
        assert rep["objects_after"] == 1, rep
        vacuum_manifested(spark, path, keep_versions=1,
                          orphan_grace_seconds=0.0)
        left = _glob.glob(f"{path}/_index/bloomset-*.json")
        assert len(left) == 1 and len(left) < n_objs
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        assert read_manifested(spark, path).count() == 100

    def test_unreadable_object_skipped_not_fatal(self, spark, tmp_path):
        import glob as _glob

        path, sinks = self._micro_commit_store(spark, tmp_path)
        objs = sorted(_glob.glob(f"{path}/_index/bloomset-*.json"))
        with open(objs[0], "w") as f:
            f.write("{ truncated")
        rep = sinks.compact_bloomsets(spark, path, target_members=512)
        assert rep["skipped"] >= 1 and rep["repacked_rels"] > 0
        # the corrupt object's members keep their old pointers and the
        # read degrades them to conservative keep — rows stay correct
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        assert read_manifested(spark, path).count() == 120

    def test_maintain_runs_compaction(self, spark, tmp_path):
        path, sinks = self._micro_commit_store(spark, tmp_path)
        rep = sinks.maintain(
            spark, path, min_files_to_compact=999,
            bloom_cols=["id"], orphan_grace_seconds=0.0,
        )
        assert rep["compact_blooms"]["repacked_rels"] > 0
        assert rep["compact_blooms"]["objects_after"] == 1
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        got = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
        assert got["objects"] == 1 and got["per_file"] == 0, got


class TestR15AdviceHardening:
    def test_corrupt_member_value_degrades_to_keep(self, spark, tmp_path):
        """r14 ADVICE (medium): the consolidated read validated the DOC
        shape but not the per-member VALUE — a non-dict member or a
        corrupt base64 bitset must degrade that member to conservative
        keep, not TypeError/binascii.Error the whole point read."""
        import json

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 1000).repartitionByRange(4, "id"),
            path, bloom_cols=["id"],
        )
        obj = glob.glob(f"{path}/_index/bloomset-*.json")[0]
        doc = json.load(open(obj))
        members = sorted(doc["files"])
        # member 0: non-dict value (truncated/foreign write)
        doc["files"][members[0]] = "garbage"
        # member 1: dict with a corrupt base64 bitset
        doc["files"][members[1]] = {"id": "!!!not-base64!!!"}
        # member 2: dict with a non-string bitset value
        doc["files"][members[2]] = {"id": 12345}
        with open(obj, "w") as f:
            json.dump(doc, f)
        # point read survives; the 3 damaged members are kept
        # conservatively, the intact one still prunes normally
        hit = read_manifested(spark, path, point={"id": 123})
        assert hit.where("id = 123").count() == 1
        assert _files(hit) >= 3  # damaged members all kept
        # a definite miss: the intact member still PRUNES its file, the
        # 3 damaged ones are kept conservatively (point= prunes files,
        # the row predicate stays the caller's job)
        miss = read_manifested(spark, path, point={"id": 10 ** 9})
        assert _files(miss) == 3
        assert miss.where(f"id = {10 ** 9}").count() == 0

    def test_compact_skipped_counts_rels_and_objects(
        self, spark, tmp_path
    ):
        """r14 ADVICE (low): 'skipped' mixed units (1/unreadable OBJECT
        but 1/absent MEMBER). Now 'skipped' counts rels consistently and
        'skipped_objects' counts whole unreadable objects."""
        import glob as _glob
        import json

        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")
        for i in range(6):
            write_manifested(
                spark,
                spark.range(i * 20, (i + 1) * 20)
                .repartitionByRange(2, "id"),
                path, bloom_cols=["id"],
            )
        objs = sorted(_glob.glob(f"{path}/_index/bloomset-*.json"))
        with open(objs[0], "w") as f:
            f.write("{ truncated")  # unreadable: 2 member rels skipped
        doc = json.load(open(objs[1]))
        dropped = sorted(doc["files"])[0]
        del doc["files"][dropped]  # readable, 1 member absent
        with open(objs[1], "w") as f:
            json.dump(doc, f)
        rep = sinks.compact_bloomsets(spark, path, target_members=512)
        assert rep["skipped"] == 3, rep  # 2 (object) + 1 (member): rels
        assert rep["skipped_objects"] == 1, rep
        assert rep["repacked_rels"] == 12 - 3, rep
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        assert read_manifested(spark, path).count() == 120


class TestCompactVacuumLoop:
    """r14 VERDICT task 6: compact_bloomsets makes replaced bloomset
    objects vacuum orphans — repeated compact+vacuum cycles must keep
    _index/ BOUNDED (objects and bytes), and no unreferenced bloomset
    object may survive a fenced vacuum."""

    def test_index_bounded_across_cycles_and_no_orphans_survive(
        self, spark, tmp_path
    ):
        import glob as _glob
        import json
        import os

        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")

        def index_state():
            objs = _glob.glob(f"{path}/_index/bloomset-*.json")
            return len(objs), sum(os.path.getsize(o) for o in objs)

        def live_objects():
            fs, Path, root = sinks._hadoop_fs(spark, path)
            root_str = sinks._canon_uri(fs, root)
            _, head, _ = sinks._manifest_head(spark, fs, Path, root_str)
            return {
                e["bloom"].partition("#")[0]
                for e in head["files"] if e.get("bloom")
            }

        sizes = []
        for cycle in range(3):
            # 8 fresh micro-commits per cycle, then compact + vacuum
            for i in range(8):
                write_manifested(
                    spark,
                    spark.range((cycle * 8 + i) * 10,
                                (cycle * 8 + i + 1) * 10).coalesce(1),
                    path, bloom_cols=["id"],
                )
            rep = sinks.compact_bloomsets(spark, path, target_members=512)
            assert rep["repacked_rels"] > 0, (cycle, rep)
            vacuum_manifested(spark, path, keep_versions=1,
                              orphan_grace_seconds=0.0)
            n_objs, n_bytes = index_state()
            sizes.append((n_objs, n_bytes))
            # on-disk objects == exactly the head's referenced objects:
            # nothing unreferenced survives the fenced vacuum
            on_disk = {
                "_index/" + os.path.basename(o)
                for o in _glob.glob(f"{path}/_index/bloomset-*.json")
            }
            assert on_disk == live_objects(), (cycle, on_disk)
        # bounded, not accumulating: each cycle ends with ONE compacted
        # object (all live members fit in 512); bytes grow only with
        # LIVE members (8 more per cycle), never with commit history
        assert [n for n, _ in sizes] == [1, 1, 1], sizes
        assert sizes[2][1] < sizes[0][1] * 4, sizes
        # the store still answers: every cycle's rows, point read prunes
        hit = read_manifested(spark, path, point={"id": 117})
        assert hit.where("id = 117").count() == 1
        assert len(hit.inputFiles()) == 1
        assert read_manifested(spark, path).count() == 240
