"""Copy-on-write MERGE (upsert) and row-level DELETE on the manifest
store (r11): only the files containing a matched key/predicate are
rewritten, one CAS commit, rewrite-validated against concurrent commits.
The table-format ops (`MERGE INTO`, GDPR delete) the listing store cannot
express atomically — and the row-level fixup path a training corpus needs
(relabel, patch metadata, forget a source)."""

import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.sources.sinks import (
    ManifestConflict,
    delete_manifested,
    manifest_commit,
    manifest_history,
    merge_manifested,
    read_manifested,
    read_manifested_changes,
    write_manifested,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


class TestMergeBasic:
    def test_update_and_insert(self, spark, tmp_path):
        path = str(tmp_path / "store")
        base = spark.range(0, 10).withColumn("v", F.lit("old"))
        write_manifested(spark, base, path)
        updates = spark.createDataFrame(
            [(3, "new"), (7, "new"), (100, "ins")], "id long, v string"
        )
        res = merge_manifested(spark, updates, path, key="id")
        assert res["rows_matched"] == 2 and res["updates_rows"] == 3
        back = read_manifested(spark, path)
        got = dict(_rows(back, "id", "v"))
        assert got[3] == "new" and got[7] == "new" and got[100] == "ins"
        assert got[0] == "old" and len(got) == 11

    def test_pure_insert_no_rewrite(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        res = merge_manifested(
            spark, spark.range(50, 55), path, key="id"
        )
        assert res["files_rewritten"] == 0 and res["rows_matched"] == 0
        assert read_manifested(spark, path).count() == 10

    def test_empty_updates_noop(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        res = merge_manifested(
            spark, spark.range(0, 5).where("id < 0"), path, key="id"
        )
        assert res["files_rewritten"] == 0 and res["updates_rows"] == 0


class TestMergeBounded:
    def test_only_matched_files_rewritten_via_stats(self, spark, tmp_path):
        """Disjoint-span appends with id stats: a merge touching one span
        must leave every other span's file entries byte-identical in the
        head (manifest-side pruning + semi-join — O(matched), not
        O(store))."""
        path = str(tmp_path / "store")
        for lo in (0, 100, 200, 300):
            write_manifested(
                spark,
                spark.range(lo, lo + 50).withColumn("v", F.lit("old"))
                .coalesce(1),
                path, stats_cols=["id"],
            )
        from aeon_sleap_processing_spark.sources.sinks import _manifest_head, _hadoop_fs, _canon_uri
        fs, Path, root = _hadoop_fs(spark, path)
        _, head0, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        before = {f["path"] for f in head0["files"]}
        updates = spark.createDataFrame([(210, "new")], "id long, v string")
        res = merge_manifested(spark, updates, path, key="id")
        assert res["files_rewritten"] == 1
        _, head1, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        after = {f["path"] for f in head1["files"]}
        assert len(before & after) == 3  # three spans untouched
        # rewritten file carries the store's stats discipline forward
        new_entries = [f for f in head1["files"] if f["path"] not in before]
        assert all("id" in (f.get("stats") or {}) for f in new_entries)
        got = dict(_rows(read_manifested(spark, path), "id", "v"))
        assert got[210] == "new" and got[209] == "old" and len(got) == 200

    def test_partitioned_store_and_cross_partition_move(self, spark, tmp_path):
        path = str(tmp_path / "store")
        df = spark.range(0, 20).withColumn("p", F.pmod("id", F.lit(2)))
        write_manifested(spark, df, path, partition_by=["p"])
        # move id=4 from p=0 to p=1 (partition cols inferred from head)
        updates = spark.createDataFrame([(4, 1)], "id long, p bigint")
        res = merge_manifested(spark, updates, path, key="id")
        assert res["rows_matched"] == 1
        back = read_manifested(spark, path)
        assert back.where("id = 4 AND p = 1").count() == 1
        assert back.where("p = 0").count() == 9
        assert back.count() == 20

    def test_conflict_on_concurrent_replace(self, spark, tmp_path):
        """A commit replacing a touched file between the merge's read and
        its commit must raise ManifestConflict (never resurrect the
        replaced rows)."""
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5).coalesce(1), path)

        def race():
            write_manifested(spark, spark.range(1000, 1005), path,
                             replace="all")

        with pytest.raises(ManifestConflict):
            merge_manifested(
                spark, spark.createDataFrame([(2,)], "id long"), path,
                key="id", _before_commit=race,
            )
        assert sorted(
            r.id for r in read_manifested(spark, path).collect()
        ) == list(range(1000, 1005))


class TestMergeSchemaAndCDC:
    def test_updates_can_widen_schema(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 6).coalesce(1), path)
        updates = spark.createDataFrame([(2, 0.9)], "id long, score double")
        merge_manifested(spark, updates, path, key="id")
        back = read_manifested(spark, path, merge_schema=True)
        assert set(back.columns) == {"id", "score"}
        assert back.where("score = 0.9").count() == 1
        assert back.where("score IS NULL").count() == 5

    def test_merge_is_a_data_change_for_consumers(self, spark, tmp_path):
        """Documented CDC contract: the merge's rewritten files are
        re-delivered in full (file-level CDC cannot split a file)."""
        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 5).withColumn("v", F.lit("old"))
            .coalesce(1), path,
        )
        _, cursor = read_manifested_changes(spark, path)
        merge_manifested(
            spark,
            spark.createDataFrame([(1, "new")], "id long, v string"),
            path, key="id",
        )
        df, _ = read_manifested_changes(spark, path, since_version=cursor)
        got = dict(_rows(df, "id", "v"))
        assert got[1] == "new" and len(got) == 5  # whole rewritten file
        hist = manifest_history(spark, path)
        assert hist[-1]["op"] == "merge" and hist[-1]["data_change"]


class TestDelete:
    def test_predicate_delete(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 20).withColumn("bad", F.col("id") % 5 == 0),
            path,
        )
        res = delete_manifested(spark, path, "bad")
        assert res["rows_deleted"] == 4
        back = read_manifested(spark, path)
        assert back.count() == 16 and back.where("bad").count() == 0

    def test_null_predicate_rows_survive(self, spark, tmp_path):
        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, "x"), (2, None), (3, "drop")], "id long, tag string"
        )
        write_manifested(spark, df, path)
        res = delete_manifested(spark, path, "tag = 'drop'")
        assert res["rows_deleted"] == 1
        assert sorted(
            r.id for r in read_manifested(spark, path).collect()
        ) == [1, 2], "NULL-evaluating rows must survive a DELETE"

    def test_no_match_noop(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        res = delete_manifested(spark, path, "id > 1000")
        assert res == {"files_rewritten": 0, "rows_deleted": 0,
                       "version": res["version"],
                       "files_scanned": res["files_scanned"]}

    def test_stats_skip_bounds_candidates(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for lo in (0, 100, 200):
            write_manifested(
                spark, spark.range(lo, lo + 50).coalesce(1), path,
                stats_cols=["id"],
            )
        res = delete_manifested(
            spark, path, "id BETWEEN 110 AND 120", skip={"id": (110, 120)}
        )
        assert res["files_rewritten"] == 1 and res["rows_deleted"] == 11
        assert read_manifested(spark, path).count() == 139

    def test_delete_whole_file_leaves_no_empty_add(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5).coalesce(1), path,
                         stats_cols=["id"])
        write_manifested(spark, spark.range(5, 10).coalesce(1), path,
                         stats_cols=["id"])
        res = delete_manifested(spark, path, "id < 5")
        assert res["rows_deleted"] == 5
        assert sorted(
            r.id for r in read_manifested(spark, path).collect()
        ) == list(range(5, 10))


class TestRestore:
    def test_rollback_bad_delete(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            restore_manifested, vacuum_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path)      # v0
        write_manifested(spark, spark.range(10, 20), path)     # v1
        delete_manifested(spark, path, "id >= 5")              # v2 (botched)
        assert read_manifested(spark, path).count() == 5
        res = restore_manifested(spark, path, 1)
        assert res["restored_from"] == 1
        assert sorted(
            r.id for r in read_manifested(spark, path).collect()
        ) == list(range(20))
        hist = manifest_history(spark, path)
        assert hist[-1]["op"] == "restore" and hist[-1]["data_change"]
        # CDC: the restore re-delivers what it brought back
        df, _ = read_manifested_changes(spark, path, since_version=2)
        assert df.count() >= 15  # the files the delete had dropped/rewritten

    def test_restore_past_vacuum_raises(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            ManifestCursorExpired, compact_manifested, restore_manifested,
            vacuum_manifested,
        )

        path = str(tmp_path / "store")
        for i in range(5):
            write_manifested(spark, spark.range(i * 2, i * 2 + 2), path)
        compact_manifested(spark, path, min_files_to_compact=2)
        vacuum_manifested(spark, path, keep_versions=1,
                          orphan_grace_seconds=0.0)
        with pytest.raises(ManifestCursorExpired):
            restore_manifested(spark, path, 0)


class TestUpdate:
    def test_predicate_update(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 10).withColumn("v", F.col("id") * 10), path,
        )
        res = update_manifested(
            spark, path, "id >= 8", {"v": "v + 1"}
        )
        assert res["rows_updated"] == 2
        got = dict(_rows(read_manifested(spark, path), "id", "v"))
        assert got[8] == 81 and got[9] == 91 and got[0] == 0

    def test_set_exprs_see_original_row(self, spark, tmp_path):
        """UPDATE SET a = b, b = a must SWAP (both expressions evaluate
        against the pre-update row, Delta semantics) — a sequential
        rewrite would set both to the same value."""
        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = str(tmp_path / "store")
        df = spark.createDataFrame([(1, 10, 20)], "id long, a long, b long")
        write_manifested(spark, df, path)
        update_manifested(spark, path, "id = 1", {"a": "b", "b": "a"})
        row = read_manifested(spark, path).collect()[0]
        assert (row.a, row.b) == (20, 10)

    def test_update_can_add_column(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 4).coalesce(1), path)
        res = update_manifested(
            spark, path, "id = 2", {"flag": "'hot'"}
        )
        assert res["rows_updated"] == 1
        back = read_manifested(spark, path, merge_schema=True)
        assert back.where("flag = 'hot'").count() == 1
        assert back.where("flag IS NULL").count() == 3

    def test_untouched_files_not_rewritten(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = str(tmp_path / "store")
        for lo in (0, 100):
            write_manifested(spark, spark.range(lo, lo + 50).coalesce(1),
                             path, stats_cols=["id"])
        res = update_manifested(
            spark, path, "id = 120", {"id": "id"}, skip={"id": (120, 120)}
        )
        assert res["files_rewritten"] == 1


class TestInsertOnlyMergePartitioned:
    def test_insert_only_merge_without_partition_column(
        self, spark, tmp_path
    ):
        """r13 regression (found by measure_dml_scale's prefixed leg):
        a MERGE that matches nothing and whose updates omit the store's
        partition column must land the inserts in the default partition
        (NULL), exactly where the union-with-survivors path puts them —
        not crash staging with 'partition column not found'."""
        path = str(tmp_path / "store")
        df = spark.range(0, 20).withColumn("p", F.pmod("id", F.lit(2)))
        write_manifested(spark, df, path, partition_by=["p"])
        ins = spark.createDataFrame([(500,)], "id long")
        res = merge_manifested(spark, ins, path, key="id")
        assert res["rows_matched"] == 0 and res["files_rewritten"] == 0
        back = read_manifested(spark, path)
        assert back.count() == 21
        assert back.where("id = 500 AND p IS NULL").count() == 1


class TestConcurrentDisjointMerges:
    def test_disjoint_key_merges_both_land(self, spark, tmp_path):
        """Two merges touching DIFFERENT files racing at the commit: the
        loser's CAS retry must rebuild on the winner's head (its removes
        are still present) so both merges land — no ManifestConflict for
        disjoint work."""
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 50).coalesce(1)
                         .withColumn("v", F.lit("old")), path,
                         stats_cols=["id"])
        write_manifested(spark, spark.range(100, 150).coalesce(1)
                         .withColumn("v", F.lit("old")), path,
                         stats_cols=["id"])

        fired = {"done": False}

        def race():
            # runs inside merge #1's commit window: merge #2 on the OTHER
            # file completes entirely, committing first
            if not fired["done"]:
                fired["done"] = True
                merge_manifested(
                    spark,
                    spark.createDataFrame([(110, "m2")], "id long, v string"),
                    path, key="id",
                )

        merge_manifested(
            spark, spark.createDataFrame([(10, "m1")], "id long, v string"),
            path, key="id", _before_commit=race,
        )
        got = dict(_rows(read_manifested(spark, path), "id", "v"))
        assert got[10] == "m1" and got[110] == "m2" and len(got) == 100


class TestDmlPrefixes:
    """r13 (r12 VERDICT task 2): `prefixes=` bounds a DML op's MATCH
    SCAN — not just its rewrite set — to the named partition slices,
    the same manifest-side contract as read_manifested(prefixes=...).
    Rows outside the slice are never examined, matched, or rewritten."""

    def _store(self, spark, tmp_path):
        path = str(tmp_path / "store")
        rows = [(i, f"k-{i % 25:03d}", "old", i % 4) for i in range(400)]
        # 25 % 4 == 1: each key has 16 rows, exactly 4 in every partition
        df = spark.createDataFrame(
            rows, "id long, key string, v string, p long"
        )
        write_manifested(
            spark, df.repartition(8, "id"), path, partition_by=["p"],
        )
        return path

    def _head_paths(self, spark, path):
        from aeon_sleap_processing_spark.sources.sinks import (
            _canon_uri, _hadoop_fs, _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, path)
        _, head, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        return {e["path"] for e in head["files"]}

    def test_merge_match_scan_and_rewrite_bounded(self, spark, tmp_path):
        path = self._store(spark, tmp_path)
        outside_before = {
            p for p in self._head_paths(spark, path)
            if not p.startswith("p=1/")
        }
        # key k-013 exists in EVERY partition; the caller scopes the
        # merge to p=1 and asserts that's where the fix belongs
        upd = spark.createDataFrame(
            [(9999, "k-013", "new", 1)],
            "id long, key string, v string, p long",
        )
        res = merge_manifested(
            spark, upd, path, key="key", prefixes=["p=1/"]
        )
        assert res["rows_matched"] == 4  # only p=1's four k-013 rows
        back = read_manifested(spark, path)
        assert back.where("key = 'k-013' AND p = 1 AND v = 'new'").count() == 1
        # copies outside the slice were never examined — still 'old'
        assert back.where("key = 'k-013' AND p != 1").count() == 12
        assert (
            back.where("key = 'k-013' AND p != 1 AND v = 'old'").count()
            == 12
        )
        # and their files were never rewritten
        outside_after = {
            p for p in self._head_paths(spark, path)
            if not p.startswith("p=1/")
        }
        assert outside_after == outside_before

    def test_delete_bounded_to_slice(self, spark, tmp_path):
        path = self._store(spark, tmp_path)
        outside_before = {
            p for p in self._head_paths(spark, path)
            if not p.startswith("p=2/")
        }
        res = delete_manifested(
            spark, path, "key = 'k-007'", prefixes=["p=2/"]
        )
        assert res["rows_deleted"] == 4
        back = read_manifested(spark, path)
        assert back.where("key = 'k-007' AND p = 2").count() == 0
        assert back.where("key = 'k-007' AND p != 2").count() == 12
        outside_after = {
            p for p in self._head_paths(spark, path)
            if not p.startswith("p=2/")
        }
        assert outside_after == outside_before

    def test_update_bounded_to_slice(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = self._store(spark, tmp_path)
        res = update_manifested(
            spark, path, "key = 'k-020'", {"v": "'patched'"},
            prefixes=["p=0/"],
        )
        assert res["rows_updated"] == 4
        back = read_manifested(spark, path)
        assert back.where("v = 'patched'").count() == 4
        assert back.where("key = 'k-020' AND v = 'old' AND p != 0").count() == 12


class TestMergeBroadcastGuard:
    def test_large_update_set_takes_the_shuffle_path(
        self, spark, tmp_path, monkeypatch
    ):
        """r12 VERDICT design note 1: above _MERGE_BROADCAST_MAX_KEYS
        the update-key relation must NOT be broadcast (a huge updates
        side would OOM the broadcast) — the merge degrades to a plain
        shuffle semijoin with identical results. >10k keys through the
        non-broadcast path, threshold pinned below the key count."""
        from aeon_sleap_processing_spark.sources import sinks

        path = str(tmp_path / "store")
        base = spark.range(0, 30_000).withColumn("v", F.lit("old"))
        write_manifested(spark, base.repartitionByRange(6, "id"), path,
                         stats_cols=["id"])
        monkeypatch.setattr(sinks, "_MERGE_BROADCAST_MAX_KEYS", 100)
        updates = (
            spark.range(0, 10_050)
            .select((F.col("id") * 2).alias("id"))  # 10,050 keys, even ids
            .withColumn("v", F.lit("new"))
        )
        res = merge_manifested(spark, updates, path, key="id")
        assert res["updates_rows"] == 10_050
        # every update key (even ids 0..20,098) exists in the store
        assert res["rows_matched"] == 10_050
        back = read_manifested(spark, path)
        assert back.where("v = 'new'").count() == 10_050
        assert back.count() == 30_000
