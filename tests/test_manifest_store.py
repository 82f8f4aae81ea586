"""Manifest-committed chunk store (r10): atomic append visibility, CAS
commit under contention, compaction that composes with concurrent writers
(zero loss, zero skipped_concurrent), reader snapshot isolation, vacuum."""

import json

import pytest

from aeon_sleap_processing_spark.sources.sinks import (
    compact_manifested,
    manifest_commit,
    read_manifested,
    vacuum_manifested,
    write_manifested,
)


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


class TestManifestWriteRead:
    def test_roundtrip_and_uncommitted_invisibility(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path)
        write_manifested(spark, spark.range(10, 20), path)
        assert _ids(read_manifested(spark, path)) == list(range(20))
        # a data file present on disk but in NO manifest (crashed writer
        # that died before its commit) is invisible to manifest readers —
        # the atomic-append property a directory listing cannot give
        spark.range(1000, 1010).coalesce(1).write.mode("append").parquet(path)
        assert _ids(read_manifested(spark, path)) == list(range(20))

    def test_hive_partitions_recovered(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        df = spark.range(0, 40).withColumn("p", F.pmod("id", F.lit(4)))
        write_manifested(spark, df, path, partition_by=["p"])
        back = read_manifested(spark, path)
        assert "p" in back.columns
        assert back.where("p = 2").count() == 10
        assert _ids(back) == list(range(40))

    def test_empty_store_raises_clearly(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_manifested(spark, str(tmp_path / "nothing"))


class TestManifestCommitCAS:
    def test_concurrent_commits_all_survive(self, spark, tmp_path):
        """N threads racing manifest_commit: every add must be in the final
        head (losers rebuild on the winner's head), versions contiguous."""
        from concurrent.futures import ThreadPoolExecutor

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 1), path)

        def add(i):
            return manifest_commit(
                spark, path, add=[(f"fake-{i}.parquet", 100 + i)]
            )

        with ThreadPoolExecutor(6) as ex:
            versions = list(ex.map(add, range(12)))
        assert sorted(versions) == list(range(1, 13))  # contiguous, no dupes
        from aeon_sleap_processing_spark.sources.sinks import (
            _hadoop_fs,
            _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, path)
        _, head, _ = _manifest_head(spark, fs, Path, str(root.toUri()))
        paths = {f["path"] for f in head["files"]}
        assert {f"fake-{i}.parquet" for i in range(12)} <= paths

    def test_concurrent_commits_survive_without_process_lock(
        self, spark, tmp_path, monkeypatch
    ):
        """Multi-PROCESS equivalence (late r11): the in-process lock is
        REMOVED (every caller gets its own null context, exactly like
        committers in different processes that share no memory) and 12
        racing commits must still land exactly once each — the hard-link
        slot publish is the only CAS. Before the os.link upgrade this
        interleaving could silently overwrite a slot on local fs (rename
        overwrites there; only the token verify caught it after the
        fact, and a reader in the gap saw a version file CHANGE)."""
        from concurrent.futures import ThreadPoolExecutor
        from contextlib import nullcontext

        from aeon_sleap_processing_spark.sources import sinks as sk

        monkeypatch.setattr(sk, "_manifest_lock", lambda root: nullcontext())
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 1), path)

        def add(i):
            return manifest_commit(
                spark, path, add=[(f"fake-{i}.parquet", 100 + i)]
            )

        with ThreadPoolExecutor(12) as ex:
            versions = list(ex.map(add, range(12)))
        assert sorted(versions) == list(range(1, 13))
        from aeon_sleap_processing_spark.sources.sinks import (
            _hadoop_fs,
            _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, path)
        _, head, _ = _manifest_head(spark, fs, Path, str(root.toUri()))
        paths = {f["path"] for f in head["files"]}
        assert {f"fake-{i}.parquet" for i in range(12)} <= paths
        # version files are immutable from first visibility: no .tmp
        # corpses, every retained slot parses
        import json as _json
        import os

        mdir = f"{path}/_manifests"
        names = sorted(os.listdir(mdir))
        assert not [n for n in names if n.startswith(".tmp-")]
        for n in names:
            with open(f"{mdir}/{n}") as f:
                _json.load(f)

    def test_corrupt_manifest_is_skipped(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        # a lost local-fs commit race can leave a garbage version file:
        # readers and committers walk past it
        with open(f"{path}/_manifests/{1:020d}.json", "w") as f:
            f.write("{ not json")
        assert _ids(read_manifested(spark, path)) == list(range(5))
        v = manifest_commit(spark, path, add=[("x.parquet", 1)])
        assert v == 2  # committed PAST the corpse, built on v0


class TestSchemaInLog:
    """Late r11: every commit records the running-union schema
    (Delta/Iceberg style) so the head doc is authoritative for
    footer-averse consumers and evolution survives maintenance."""

    def test_union_carried_through_maintenance_and_dml(
        self, spark, tmp_path
    ):
        import glob
        import json as _json

        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(spark, spark.createDataFrame([(1,)], "id long"), path)
        write_manifested(
            spark,
            spark.createDataFrame([(2, "x")], "id long, extra string"),
            path,
        )
        # an UPDATE adding a column must widen the recorded schema too
        update_manifested(spark, path, "id = 1", set={"score": "0.5"})
        compact_manifested(spark, path, min_files_to_compact=1)

        def head_fields():
            docs = sorted(glob.glob(f"{path}/_manifests/*.json"))
            return [
                f["name"]
                for f in _json.load(open(docs[-1]))["schema"]["fields"]
            ]

        assert head_fields() == ["id", "extra", "score"]
        got = read_manifested(spark, path, merge_schema=True)
        assert sorted(got.columns) == ["extra", "id", "score"]

    def test_version_pinned_read_gets_schema_as_of_version(
        self, spark, tmp_path
    ):
        """Time travel applies to the SCHEMA too (the table-format
        rule): a merge_schema read pinned to the pre-evolution version
        must not see the later column, while the head read does —
        both served from the log with zero planning-time footer I/O."""
        path = str(tmp_path / "store")
        write_manifested(spark, spark.createDataFrame([(1,)], "id long"), path)
        write_manifested(
            spark,
            spark.createDataFrame([(2, "x")], "id long, extra string"),
            path,
        )
        old = read_manifested(spark, path, version=0, merge_schema=True)
        assert old.columns == ["id"]
        head = read_manifested(spark, path, merge_schema=True)
        assert sorted(head.columns) == ["extra", "id"]
        assert [(r.id, r.extra) for r in head.orderBy("id").collect()] == [
            (1, None), (2, "x")
        ]


    def test_overwrite_all_resets_schema(self, spark, tmp_path):
        """replace='all' is Delta's overwriteSchema: the commit records
        its OWN schema, not the union — a narrowing rewrite must not
        leave the dropped column in the head doc forever, or
        merge_schema reads resurrect it as all-null."""
        import glob
        import json as _json

        path = str(tmp_path / "store")
        write_manifested(
            spark,
            spark.createDataFrame([(1, "x")], "id long, extra string"),
            path,
        )
        write_manifested(
            spark, spark.createDataFrame([(2,)], "id long"), path,
            replace="all",
        )
        docs = sorted(glob.glob(f"{path}/_manifests/*.json"))
        fields = [
            f["name"]
            for f in _json.load(open(docs[-1]))["schema"]["fields"]
        ]
        assert fields == ["id"]
        got = read_manifested(spark, path, merge_schema=True)
        assert got.columns == ["id"]
        assert [r.id for r in got.collect()] == [2]

    def test_restore_resets_schema(self, spark, tmp_path):
        """RESTORE rolls the schema back with the data (Delta RESTORE
        semantics): columns added after the target version do not
        survive as all-null resurrections."""
        from aeon_sleap_processing_spark.sources.sinks import (
            restore_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(spark, spark.createDataFrame([(1,)], "id long"), path)
        write_manifested(
            spark,
            spark.createDataFrame([(2, "x")], "id long, extra string"),
            path,
        )
        restore_manifested(spark, path, 0)
        got = read_manifested(spark, path, merge_schema=True)
        assert got.columns == ["id"]
        assert [r.id for r in got.collect()] == [1]


class TestHardLinkRootEncoding:
    def test_store_root_with_space_and_percent(self, spark, tmp_path):
        """The hard-link CAS branch slices the %-ENCODED canon URI to an
        os path: a root containing a space or '%' must be unquoted
        before open()/os.link() or every commit lands in a wrongly
        encoded directory (FileNotFoundError)."""
        path = str(tmp_path / "ro ot %40x")
        write_manifested(spark, spark.range(0, 3), path)
        write_manifested(spark, spark.range(3, 5), path)
        assert compact_manifested(spark, path, min_files_to_compact=1)[
            "compacted"
        ]
        got = sorted(r.id for r in read_manifested(spark, path).collect())
        assert got == list(range(5))
        import os

        names = sorted(os.listdir(os.path.join(path, "_manifests")))
        assert [n for n in names if n.endswith(".json")][:3] == [
            "00000000000000000000.json",
            "00000000000000000001.json",
            "00000000000000000002.json",
        ]


def _dml_race_merge_worker(args):
    """Spawned OS process: own JVM, own SparkSession — no in-process
    lock or session state shared with the parent. Issues `rounds`
    MERGEs over its private key range, retrying on ManifestConflict
    (the table-format contract when a concurrent rewrite replaced a
    touched file)."""
    path, wid, rounds = args
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources.sinks import (
        ManifestConflict,
        merge_manifested,
    )

    spark = get_spark(
        app_name=f"dml-race-{wid}",
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={
            "spark.driver.memory": "2g",
            "spark.ui.enabled": "false",
        },
    )
    try:
        for r in range(rounds):
            upd = spark.createDataFrame(
                [(k, f"w{wid}r{r}") for k in range(wid * 10, wid * 10 + 10)],
                "id long, v string",
            )
            for _ in range(60):
                try:
                    merge_manifested(spark, upd, path, "id")
                    break
                except ManifestConflict:
                    continue
            else:
                return (wid, "gave up after 60 conflicts")
        return (wid, "ok")
    finally:
        spark.stop()


class TestMultiProcessDml:
    def test_disjoint_merges_race_a_compactor_across_processes(
        self, spark, tmp_path
    ):
        """r11 proved the commit CAS across OS processes; this does the
        same for the DML paths' rewrite-validation: two child processes
        (own JVMs) MERGE disjoint key ranges while the parent compacts
        the store concurrently. require_remove_present must turn every
        lost interleaving into a retried ManifestConflict — zero lost
        updates, zero resurrected pre-merge rows, exactly one row per
        key at the end."""
        import multiprocessing as mp

        from aeon_sleap_processing_spark.sources.sinks import (
            ManifestConflict,
        )

        path = str(tmp_path / "store")
        base = spark.createDataFrame(
            [(k, "base") for k in range(30)], "id long, v string"
        ).repartition(6)
        write_manifested(spark, base, path, stats_cols=["id"])

        ROUNDS = 3
        ctx = mp.get_context("spawn")
        with ctx.Pool(2) as pool:
            async_res = pool.map_async(
                _dml_race_merge_worker,
                [(path, w, ROUNDS) for w in range(2)],
            )
            # compact in a loop until both mergers finish: every
            # compaction rewrite-validates too, so a merge landing
            # between its read and its commit raises here — retried,
            # never clobbering
            import time as _t

            while not async_res.ready():
                try:
                    compact_manifested(spark, path, min_files_to_compact=2)
                except ManifestConflict:
                    pass
                _t.sleep(0.2)
            results = async_res.get(timeout=300)
        assert [s for _, s in sorted(results)] == ["ok", "ok"]
        rows = sorted(
            (r.id, r.v) for r in read_manifested(spark, path).collect()
        )
        last = ROUNDS - 1
        expect = (
            [(k, f"w0r{last}") for k in range(10)]
            + [(k, f"w1r{last}") for k in range(10, 20)]
            + [(k, "base") for k in range(20, 30)]
        )
        assert rows == expect


class TestManifestCompaction:
    def test_compact_reduces_files_keeps_rows(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for i in range(6):
            write_manifested(spark, spark.range(i * 10, (i + 1) * 10), path)
        res = compact_manifested(spark, path)
        assert res["compacted"] and res["files_after"] < res["files_before"]
        assert _ids(read_manifested(spark, path)) == list(range(60))

    def test_interleaved_writer_compactor_reader_zero_loss(
        self, spark, tmp_path
    ):
        """THE manifest property: a writer landing a commit inside
        compaction's stage→commit window composes — the compactor's CAS
        retry rebuilds on the writer's head. Zero loss, zero double-reads,
        and no skipped_concurrent concept at all."""
        path = str(tmp_path / "store")
        for i in range(5):
            write_manifested(spark, spark.range(i * 10, (i + 1) * 10), path)
        pre = read_manifested(spark, path)  # reader pinned pre-compaction

        def concurrent_append():
            write_manifested(spark, spark.range(500, 510), path)

        res = compact_manifested(
            spark, path, _before_commit=concurrent_append
        )
        assert res["compacted"]
        got = _ids(read_manifested(spark, path))
        assert got == list(range(50)) + list(range(500, 510))  # exactly once
        # snapshot isolation: the pinned reader still resolves (old files
        # remain on disk until vacuum)
        assert _ids(pre) == list(range(50))

    def test_below_threshold_is_noop(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10).coalesce(2), path)
        res = compact_manifested(spark, path, min_files_to_compact=4)
        assert not res["compacted"]
        assert res["files_before"] == res["files_after"]

    def test_partitioned_store_compacts_per_leaf(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        for i in range(4):
            df = spark.range(i * 10, (i + 1) * 10).withColumn(
                "p", F.pmod("id", F.lit(2))
            )
            write_manifested(spark, df, path, partition_by=["p"])
        res = compact_manifested(spark, path, min_files_to_compact=2)
        assert res["compacted"]
        back = read_manifested(spark, path)
        assert _ids(back) == list(range(40))
        assert back.where("p = 1").count() == 20  # partition col preserved

    def test_pooled_leaf_rewrites_match_serial(self, spark, tmp_path):
        """r15: leaf rewrites overlap on a driver thread pool (guide §2.6).
        Pool and serial paths must produce the same store: same rows and
        same compacted file count — only file name tokens (uuid) differ."""
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.sinks import manifest_history

        stores = {}
        for tag, workers in (("serial", 1), ("pooled", 4)):
            path = str(tmp_path / tag)
            for i in range(3):
                df = spark.range(i * 40, (i + 1) * 40).withColumn(
                    "p", F.pmod("id", F.lit(8))
                ).withColumn("v", F.col("id") * 2)
                write_manifested(
                    spark, df, path, partition_by=["p"], stats_cols=["id"]
                )
            res = compact_manifested(
                spark, path, min_files_to_compact=2,
                max_concurrent_leaf_rewrites=workers,
            )
            assert res["compacted"]
            back = read_manifested(spark, path)
            rows = sorted(
                (r["id"], r["v"], r["p"]) for r in back.collect()
            )
            # manifest head: per-leaf file counts + carried id-stats spans,
            # with the uuid file tokens stripped (data-<token>-00000 →
            # (leaf, 00000)) — the pooled fold must carry the same
            # stats to the same leaves as the serial path
            head = manifest_history(spark, path)[-1]
            assert head["version"] == res["version"]
            from aeon_sleap_processing_spark.sources import sinks

            fs, Path, root = sinks._hadoop_fs(spark, path)
            _, head_doc, _ = sinks._manifest_head(
                spark, fs, Path, sinks._canon_uri(fs, root)
            )
            leaf_entries = sorted(
                (
                    e["path"].rsplit("/", 1)[0],
                    e["path"].rsplit("-", 1)[-1],
                    json.dumps(e.get("stats"), sort_keys=True),
                )
                for e in head_doc["files"]
            )
            stores[tag] = {
                "rows": rows,
                "files_after": res["files_after"],
                "leaf_entries": leaf_entries,
            }
        assert stores["serial"] == stores["pooled"]


class TestManifestVacuum:
    def test_vacuum_reclaims_replaced_and_orphans(self, spark, tmp_path):
        import glob

        path = str(tmp_path / "store")
        # past one checkpoint interval, so the log has a second anchor
        # for vacuum to trim back to
        for i in range(18):
            write_manifested(spark, spark.range(i * 10, (i + 1) * 10), path)
        # orphan: renamed-in but never committed
        spark.range(9000, 9010).coalesce(1).write.mode("append").parquet(path)
        compact_manifested(spark, path)
        n_before = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
        res = vacuum_manifested(spark, path, keep_versions=1)
        n_after = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
        assert res["deleted_files"] > 0 and n_after < n_before
        assert res["deleted_manifests"] > 0  # log trimmed to its anchor
        assert _ids(read_manifested(spark, path)) == list(range(180))

    def test_keep_versions_grace_window(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for i in range(4):
            write_manifested(spark, spark.range(i * 10, (i + 1) * 10), path)
        fs_head = json.load(
            open(sorted(__import__("glob").glob(f"{path}/_manifests/*.json"))[-1])
        )
        pin_version = fs_head["version"]
        pinned = read_manifested(spark, path, version=pin_version)
        compact_manifested(spark, path)
        vacuum_manifested(spark, path, keep_versions=2)
        # keep_versions=2 retains the pre-compaction head's files
        assert _ids(pinned) == list(range(40))


class TestManifestOptimize:
    def test_optimize_clusters_and_commits_atomically(self, spark, tmp_path):
        """optimize_manifested = OPTIMIZE-ZORDER with manifest commit
        semantics: rows preserved, files re-clustered (per-file key
        spans shrink vs the random layout), pinned reader unaffected."""
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.sinks import (
            optimize_manifested,
        )

        path = str(tmp_path / "store")
        # two appends with interleaved keys -> random layout
        df = (
            spark.range(0, 4000)
            .withColumn("x", (F.col("id") * 7919) % 1000)
            .withColumn("y", (F.col("id") * 104729) % 1000)
        )
        write_manifested(spark, df.repartition(8), path)
        pre = read_manifested(spark, path)
        res = optimize_manifested(
            spark, path, ["x", "y"], curve="zorder", target_bytes=64 * 1024
        )
        assert res["compacted"]
        back = read_manifested(spark, path)
        assert back.count() == 4000
        assert sorted(r.id for r in back.select("id").collect()) == list(
            range(4000)
        )
        # pinned pre-optimize reader still resolves (snapshot isolation)
        assert pre.count() == 4000


def test_concurrent_write_manifested_all_rows_exactly_once(spark, tmp_path):
    """Full-path contention (stage -> rename-in -> CAS commit) from 4
    threads: every append's rows land exactly once, no orphans left
    referenced, and the store reads clean after a vacuum."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "store")

    def append(i):
        return write_manifested(
            spark, spark.range(i * 100, (i + 1) * 100).coalesce(1), path
        )

    with ThreadPoolExecutor(4) as ex:
        rels = list(ex.map(append, range(8)))
    assert all(r for r in rels)
    assert _ids(read_manifested(spark, path)) == list(range(800))
    vacuum_manifested(spark, path, keep_versions=1)
    assert _ids(read_manifested(spark, path)) == list(range(800))


class TestVacuumInFlightFence:
    """r11: vacuum's orphan grace window — a slow writer's renamed-in but
    not-yet-committed files must survive a routine vacuum (the
    Delta/Iceberg staging-mtime convention)."""

    def test_tmp_manifest_debris_swept_under_grace(self, spark, tmp_path):
        """Late r11: a committer that dies between its tmp doc write and
        the link leaves .tmp-<token>.json in _manifests/ — never a
        version. A young tmp is an in-flight commit (skipped); past the
        grace it is debris (deleted). Version files are untouched."""
        import os

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        mdir = f"{path}/_manifests"
        with open(f"{mdir}/.tmp-deadbeef.json", "w") as f:
            f.write('{"version": 99}')
        res = vacuum_manifested(spark, path, orphan_grace_seconds=3600)
        assert os.path.exists(f"{mdir}/.tmp-deadbeef.json")
        assert res["skipped_in_flight"] >= 1
        vacuum_manifested(spark, path, orphan_grace_seconds=0)
        assert not os.path.exists(f"{mdir}/.tmp-deadbeef.json")
        assert _ids(read_manifested(spark, path)) == list(range(5))

    def test_vacuum_interleaved_with_slow_writer(self, spark, tmp_path):
        """Interleave: writer stages + renames in → VACUUM runs → writer
        commits. With the default grace the commit must land intact; with
        grace=0 the same vacuum would have eaten the files (pinned)."""
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path)

        # -- slow writer, step 1+2: stage and rename in (write_manifested
        # decomposed so the vacuum can land exactly in the commit gap)
        import glob
        import shutil

        stage = f"{path}/_staging/slowtoken"
        spark.range(100, 110).coalesce(1).write.parquet(stage)
        part = [
            f for f in glob.glob(f"{stage}/*.parquet")
            if not f.split("/")[-1].startswith(("_", "."))
        ][0]
        rel = "data-slowtoken-00000.parquet"
        nbytes = __import__("os").path.getsize(part)
        shutil.move(part, f"{path}/{rel}")

        # -- routine vacuum lands in the gap: must skip the young orphan
        # AND the young staging dir
        res = vacuum_manifested(spark, path, keep_versions=1)
        assert res["skipped_in_flight"] >= 1, res
        assert __import__("os").path.exists(f"{path}/{rel}")

        # -- writer finishes: commit succeeds, rows intact
        manifest_commit(spark, path, add=[(rel, nbytes)])
        assert _ids(read_manifested(spark, path)) == list(range(10)) + list(
            range(100, 110)
        )

        # pinned contrast: with the fence off, the same in-flight state
        # would have been reclaimed (fresh uncommitted file + grace=0)
        spark.range(999, 1000).coalesce(1).write.mode("append").parquet(path)
        res0 = vacuum_manifested(
            spark, path, keep_versions=1, orphan_grace_seconds=0
        )
        assert res0["deleted_files"] >= 1
        assert _ids(read_manifested(spark, path)) == list(range(10)) + list(
            range(100, 110)
        )

    def test_old_orphans_reclaimed_after_grace(self, spark, tmp_path):
        """Crash debris older than the grace is reclaimed even though it
        was never committed (mtime back-dated to simulate age)."""
        import os

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path)
        spark.range(50, 60).coalesce(1).write.mode("append").parquet(path)
        old = __import__("time").time() - 7200
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                os.utime(os.path.join(path, f), (old, old))
        # files committed in the manifest are LIVE regardless of mtime;
        # only the never-committed debris goes
        res = vacuum_manifested(
            spark, path, keep_versions=1, orphan_grace_seconds=1800
        )
        assert res["deleted_files"] == 1, res
        assert _ids(read_manifested(spark, path)) == list(range(10))


class TestMaintain:
    """r11: the one-call housekeeping entry point (compact/optimize +
    retention + fenced vacuum, mirroring the reference's operational
    polling+cleanup loop) — dry-run mutates nothing and reports what a
    real run would do."""

    def test_dry_run_reports_and_mutates_nothing(self, spark, tmp_path):
        import glob

        from aeon_sleap_processing_spark.sources.sinks import maintain

        path = str(tmp_path / "store")
        for i in range(5):
            write_manifested(spark, spark.range(i * 10, (i + 1) * 10), path)
        before = sorted(glob.glob(f"{path}/**/*", recursive=True))
        rep = maintain(
            spark, path, min_files_to_compact=4, dry_run=True,
            orphan_grace_seconds=0,
        )
        assert rep["dry_run"] and rep["compact"]["files"] >= 5
        assert rep["compact"]["eligible_leaves"], rep
        assert rep["vacuum"]["would_delete_files"] == 0
        assert sorted(glob.glob(f"{path}/**/*", recursive=True)) == before
        assert _ids(read_manifested(spark, path)) == list(range(50))

    def test_real_run_compacts_expires_and_vacuums(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.sinks import maintain

        path = str(tmp_path / "store")
        now = pd.Timestamp.now()
        df = spark.range(0, 100).select(
            "id",
            (F.lit(now) - F.make_interval(hours=F.col("id"))).alias("time"),
        )
        for lo in range(0, 100, 25):
            write_manifested(
                spark, df.where(f"id >= {lo} AND id < {lo + 25}"), path
            )
        rep = maintain(
            spark, path, min_files_to_compact=2, max_age="48h",
            keep_versions=1, orphan_grace_seconds=0,
        )
        assert rep["compact"]["compacted"]
        assert rep["retention"]["rows_expired"] > 0
        back = read_manifested(spark, path)
        ids = _ids(back)
        # cutoff = maintain-time now - 48h, a hair after `now`: ids 0..47
        # (strictly younger than 48h) survive, 48..99 expire
        assert ids == list(range(48)), (len(ids), ids[-3:])
        assert rep["vacuum"]["deleted_files"] > 0


class TestRetentionSweepManifested:
    def test_ttl_expires_chunks_metadata_only(self, spark, tmp_path):
        """Whole-chunk TTL on a manifest chunk store: one metadata commit,
        pinned pre-sweep readers keep resolving, vacuum reclaims."""
        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            list_chunks, load_chunked, write_chunked,
        )
        from aeon_sleap_processing_spark.sources.sinks import (
            retention_sweep_manifested, vacuum_manifested,
        )

        root = str(tmp_path / "store")
        for cam in ("CameraTop", "CameraSide"):
            pdf = pd.DataFrame({
                "time": pd.date_range("2024-03-01 08:00", periods=240, freq="1min"),
                "v": range(240),
            })
            write_chunked(spark.createDataFrame(pdf), root, cam, 200)
        pinned = load_chunked(spark, root, 200, "CameraTop")
        assert pinned.count() == 240  # resolve the pre-sweep snapshot

        expired = retention_sweep_manifested(
            spark, root, "chunk", keep_from="2024-03-01T10-00-00"
        )
        assert expired == ["2024-03-01T08-00-00", "2024-03-01T09-00-00"]
        for cam in ("CameraTop", "CameraSide"):  # both cameras' chunks expired
            assert list_chunks(spark, root, 200, cam) == [
                "2024-03-01T10-00-00", "2024-03-01T11-00-00",
            ]
            got = load_chunked(spark, root, 200, cam).toPandas()
            assert sorted(got["v"]) == list(range(120, 240))
        # snapshot isolation: the pinned pre-sweep reader still resolves
        # (files stay on disk until vacuum)
        assert pinned.count() == 240
        vacuum_manifested(spark, root, keep_versions=1, orphan_grace_seconds=0)
        assert load_chunked(spark, root, 200, "CameraTop").count() == 120

    def test_nothing_expired_is_noop(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            retention_sweep_manifested, write_manifested, read_manifested,
        )
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        df = spark.range(0, 20).withColumn(
            "day", F.concat(F.lit("2024-01-0"), (F.col("id") % 2 + 1))
        )
        write_manifested(spark, df, path, partition_by=["day"])
        assert retention_sweep_manifested(spark, path, "day", "2024-01-01") == []
        assert read_manifested(spark, path).count() == 20

    def test_maintain_partition_ttl_is_metadata_only(self, spark, tmp_path):
        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            load_chunked, write_chunked,
        )
        from aeon_sleap_processing_spark.sources.sinks import maintain

        root = str(tmp_path / "store")
        pdf = pd.DataFrame({
            "time": pd.date_range("2024-03-01 08:00", periods=180, freq="1min"),
            "v": range(180),
        })
        write_chunked(spark.createDataFrame(pdf), root, "CameraTop", 200)
        dry = maintain(
            spark, root, ttl_partition_col="chunk",
            ttl_keep_from="2024-03-01T09-00-00", dry_run=True,
        )
        assert dry["retention"]["partitions_expired"] == ["2024-03-01T08-00-00"]
        assert load_chunked(spark, root, 200, "CameraTop").count() == 180
        rep = maintain(
            spark, root, ttl_partition_col="chunk",
            ttl_keep_from="2024-03-01T09-00-00",
            min_files_to_compact=99, orphan_grace_seconds=0, keep_versions=1,
        )
        assert rep["retention"]["partitions_expired"] == ["2024-03-01T08-00-00"]
        got = load_chunked(spark, root, 200, "CameraTop").toPandas()
        assert sorted(got["v"]) == list(range(60, 180))


class TestManifestStats:
    """r11: Iceberg-style per-file column stats in the manifest — file
    skipping from the head alone, no listing, no footer reads."""

    def test_skip_prunes_files_and_preserves_rows(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )

        path = str(tmp_path / "store")
        for lo in (0, 100, 200, 300):
            write_manifested(
                spark, spark.range(lo, lo + 100).coalesce(1), path,
                stats_cols=["id"],
            )
        full = read_manifested(spark, path)
        assert len(full.inputFiles()) == 4
        narrow = read_manifested(spark, path, skip={"id": (150, 160)})
        assert len(narrow.inputFiles()) == 1  # 3 of 4 files skipped
        assert _ids(narrow.where("id between 150 and 160")) == list(
            range(150, 161)
        )
        half_open = read_manifested(spark, path, skip={"id": (250, None)})
        assert len(half_open.inputFiles()) == 2

    def test_fully_skipped_returns_empty_with_schema(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path, stats_cols=["id"])
        out = read_manifested(spark, path, skip={"id": (500, 600)})
        assert out.columns == ["id"] and out.count() == 0

    def test_stats_survive_unrelated_commits_and_drop_on_rewrite(
        self, spark, tmp_path
    ):
        """Full-entry rebuild: a commit that does not touch a file keeps
        its stats; compaction output carries none (conservative: never
        skipped)."""
        import glob

        from aeon_sleap_processing_spark.sources.sinks import (
            compact_manifested, manifest_commit, read_manifested,
            write_manifested,
        )

        path = str(tmp_path / "store")
        write_manifested(
            spark, spark.range(0, 50).coalesce(1), path, stats_cols=["id"]
        )
        manifest_commit(spark, path, add=[("unrelated.parquet", 1)])
        from aeon_sleap_processing_spark.sources.sinks import (
            _canon_uri, _hadoop_fs, _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, path)
        _, head, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        with_stats = [f for f in head["files"] if "stats" in f]
        assert len(with_stats) == 1
        assert with_stats[0]["stats"]["id"] == [0, 49]
        manifest_commit(spark, path, remove=["unrelated.parquet"])
        # skipping still effective after the unrelated commits
        assert (
            len(read_manifested(spark, path, skip={"id": (500, None)})
                .inputFiles()) == 0
        )
        for i in range(4):
            write_manifested(
                spark, spark.range(100 + i * 10, 110 + i * 10).coalesce(1),
                path, stats_cols=["id"],
            )
        compact_manifested(spark, path, min_files_to_compact=2)
        # compaction carries LEAF-SPAN stats forward without a scan: the
        # folded files inherit [min of mins, max of maxes], so a probe
        # outside the whole span still skips them; a probe inside one
        # member's old span now reads the (coarser) folded file
        out = read_manifested(spark, path, skip={"id": (500, 600)})
        assert len(out.inputFiles()) == 0
        assert out.count() == 0
        inside = read_manifested(spark, path, skip={"id": (100, 101)})
        assert len(inside.inputFiles()) >= 1
        assert _ids(inside.where("id BETWEEN 100 AND 101")) == [100, 101]

    def test_chunk_store_time_range_skips_files(self, spark, tmp_path):
        """The chunk store records per-file time stats: a narrow
        time-range scan reads fewer FILES than live in the chunk, not
        just fewer row groups."""
        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            load_chunked, write_chunked,
        )

        root = str(tmp_path / "store")
        # 3 appends into the SAME hour chunk, disjoint 20-min spans
        for i in range(3):
            pdf = pd.DataFrame({
                "time": pd.date_range(
                    f"2024-03-01 10:{i * 20:02d}", periods=20, freq="1min"
                ),
                "v": range(i * 100, i * 100 + 20),
            })
            write_chunked(
                spark.createDataFrame(pdf), root, "CameraTop", 200,
                mode="append",
            )
        allf = load_chunked(spark, root, 200, "CameraTop")
        assert allf.count() == 60 and len(allf.inputFiles()) == 3
        mid = load_chunked(
            spark, root, 200, "CameraTop",
            start="2024-03-01 10:25", end="2024-03-01 10:35",
        )
        assert len(mid.inputFiles()) == 1  # two sibling files stat-skipped
        got = mid.toPandas()
        assert sorted(got["v"]) == list(range(105, 116))

    def test_skip_soundness_over_random_ranges(self, spark, tmp_path):
        """Soundness property: for ANY probe range, stats-skip + row
        predicate returns exactly the rows the predicate alone returns —
        skipping may only drop files that cannot contain matches.
        Seeded-random file spans (overlapping, duplicated, reversed
        insertion order) x 12 probe ranges incl. boundary-exact ones."""
        import numpy as np

        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )

        rng = np.random.default_rng(42)
        path = str(tmp_path / "store")
        spans = []
        for _ in range(8):
            lo = int(rng.integers(0, 900))
            hi = lo + int(rng.integers(1, 120))
            spans.append((lo, hi))
            write_manifested(
                spark,
                spark.range(lo, hi).coalesce(1),
                path,
                stats_cols=["id"],
            )
        full = read_manifested(spark, path)
        probes = [tuple(sorted(rng.integers(0, 1000, 2))) for _ in range(8)]
        probes += [spans[0], (spans[1][1], spans[1][1]),  # boundary-exact
                   (0, 0), (999, 1500)]
        for lo, hi in probes:
            truth = sorted(
                r.id for r in full.where(f"id >= {lo} AND id <= {hi}").collect()
            )
            pruned = read_manifested(spark, path, skip={"id": (int(lo), int(hi))})
            got = sorted(
                r.id
                for r in pruned.where(f"id >= {lo} AND id <= {hi}").collect()
            )
            assert got == truth, (lo, hi)
            assert len(pruned.inputFiles()) <= len(full.inputFiles())


class TestSchemaEvolution:
    """Add-column evolution on a long-lived store: reads can opt into the
    union schema, and maintenance rewrites must NEVER drop an evolved
    column (a plain multi-file parquet read takes one file's schema — a
    compaction doing that silently loses the column's data)."""

    def test_merge_schema_read(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        write_manifested(
            spark, spark.range(5, 10).withColumn("score", F.lit(0.5)), path
        )
        wide = read_manifested(spark, path, merge_schema=True)
        assert set(wide.columns) == {"id", "score"}
        assert wide.where("score IS NULL").count() == 5  # pre-evolution rows
        assert wide.where("score = 0.5").count() == 5

    def test_compaction_preserves_evolved_column(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        write_manifested(
            spark, spark.range(5, 10).withColumn("score", F.lit(2.0)), path
        )
        res = compact_manifested(spark, path, min_files_to_compact=2)
        assert res["compacted"]
        back = read_manifested(spark, path, merge_schema=True)
        assert set(back.columns) == {"id", "score"}
        assert back.where("score = 2.0").count() == 5, (
            "the fold must rewrite with the UNION schema, not one file's"
        )
        assert sorted(r.id for r in back.select("id").collect()) == list(
            range(10)
        )


class TestDeltaLog:
    """The checkpoint+delta log (r11): commits between checkpoints record
    only their resolved {add, removed} delta, every
    _CHECKPOINT_INTERVAL-th commit embeds the full file list, and every
    reader resolves through the replay — commit cost is O(change)
    amortized instead of O(store) always (measured:
    bench_runs_r11/commit_cost.json)."""

    def test_deltas_between_checkpoints(self, spark, tmp_path):
        import glob
        import os

        path = str(tmp_path / "store")
        for i in range(6):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), path)
        docs = {}
        for m in sorted(glob.glob(f"{path}/_manifests/*.json")):
            v = int(os.path.basename(m)[:-5])
            docs[v] = json.load(open(m))
        assert "files" in docs[0], "first commit must checkpoint"
        for v in range(1, 6):
            assert "files" not in docs[v], f"v{v} should be a delta"
            assert docs[v]["add"] and docs[v]["removed"] == []
        # the resolved head is still the full store
        assert _ids(read_manifested(spark, path)) == list(range(30))
        # and a pinned mid-log version resolves through the replay
        assert _ids(read_manifested(spark, path, version=3)) == list(
            range(20)
        )

    def test_checkpoint_cadence(self, spark, tmp_path):
        import glob
        import os

        from aeon_sleap_processing_spark.sources.sinks import (
            _CHECKPOINT_INTERVAL,
        )

        path = str(tmp_path / "store")
        n = _CHECKPOINT_INTERVAL + 3
        for i in range(n):
            write_manifested(spark, spark.range(i, i + 1), path)
        ckpts = []
        for m in sorted(glob.glob(f"{path}/_manifests/*.json")):
            doc = json.load(open(m))
            if "files" in doc:
                ckpts.append(int(os.path.basename(m)[:-5]))
        assert ckpts == [0, _CHECKPOINT_INTERVAL]
        assert _ids(read_manifested(spark, path)) == list(range(n))

    def test_corrupt_corpse_mid_chain_is_skipped(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for i in range(4):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), path)
        # a lost-race corpse lands in a gap slot — never an acknowledged
        # head, must not derail the replay
        with open(f"{path}/_manifests/{2:020d}.json.tmp", "w") as f:
            f.write("{ corrupt")
        import os

        os.replace(
            f"{path}/_manifests/{2:020d}.json.tmp",
            f"{path}/_manifests/{99:020d}.json",
        )
        assert _ids(read_manifested(spark, path)) == list(range(20))
        # a commit slots PAST the corpse and the store keeps working
        write_manifested(spark, spark.range(100, 105), path)
        assert _ids(read_manifested(spark, path)) == list(range(20)) + list(
            range(100, 105)
        )

    def test_delta_removes_replayed(self, spark, tmp_path):
        """A delta commit's resolved removes (here: a partition overwrite
        expanding a prefix) must replay exactly."""
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        df0 = spark.range(0, 10).withColumn("p", F.lit(0))
        write_manifested(spark, df0, path, partition_by=["p"])
        df1 = spark.range(50, 55).withColumn("p", F.lit(0))
        write_manifested(spark, df1, path, partition_by=["p"],
                         replace="partitions")
        assert _ids(read_manifested(spark, path)) == list(range(50, 55))
        # pinned pre-overwrite version still resolves to the old rows
        assert _ids(read_manifested(spark, path, version=0)) == list(
            range(10)
        )

    def test_pinned_read_survives_vacuum_within_keep(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for i in range(5):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), path)
        vacuum_manifested(spark, path, keep_versions=3,
                          orphan_grace_seconds=0.0)
        # v2 is within the keep window: resolvable and fully present
        assert _ids(read_manifested(spark, path, version=2)) == list(
            range(15)
        )


def _pure_py_link_committer(args):
    """Runs in a CHILD PROCESS (no Spark, no shared memory): the same
    link-publish protocol manifest_commit speaks, reduced to stdlib —
    list the log, claim the next slot with os.link, rebuild on EEXIST."""
    root, wid, n_commits = args
    import json
    import os
    import uuid

    mdir = os.path.join(root, "_manifests")
    done = 0
    while done < n_commits:
        names = sorted(
            n for n in os.listdir(mdir)
            if n.endswith(".json") and not n.startswith(".")
        )
        next_v = int(names[-1][:-5]) + 1 if names else 0
        token = uuid.uuid4().hex
        doc = {
            "version": next_v, "token": token, "op": "append", "dc": True,
            "add": [{"path": f"proc-{wid}-{done}.parquet", "bytes": 1}],
            "removed": [],
        }
        tmp = os.path.join(mdir, f".tmp-{token}.json")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        try:
            os.link(tmp, os.path.join(mdir, f"{next_v:020d}.json"))
            done += 1
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
    return wid


class TestMultiProcessCas:
    def test_os_processes_race_the_jvm_committer(self, spark, tmp_path):
        """The claim the hard-link publish makes — multi-PROCESS commits
        are a true CAS on local fs — tested with actual OS processes:
        3 spawned children (own memory, no in-process lock reachable)
        each land 5 pure-stdlib link commits while the parent lands 5
        real manifest_commit calls through the JVM. Every commit must
        survive, versions contiguous, every slot parseable, and the
        JVM reader must resolve the union head."""
        import multiprocessing as mp

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 1).coalesce(1), path)

        ctx = mp.get_context("spawn")
        with ctx.Pool(3) as pool:
            async_res = pool.map_async(
                _pure_py_link_committer, [(path, w, 5) for w in range(3)]
            )
            versions = [
                manifest_commit(
                    spark, path, add=[(f"jvm-{i}.parquet", 10 + i)]
                )
                for i in range(5)
            ]
            assert async_res.get(timeout=120) == [0, 1, 2]
        assert len(set(versions)) == 5
        from aeon_sleap_processing_spark.sources.sinks import (
            _hadoop_fs,
            _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, path)
        head_v, head, _ = _manifest_head(spark, fs, Path, str(root.toUri()))
        assert head_v == 20  # v0 + 15 child commits + 5 JVM commits
        paths = {f["path"] for f in head["files"]}
        assert {f"jvm-{i}.parquet" for i in range(5)} <= paths
        assert {
            f"proc-{w}-{d}.parquet" for w in range(3) for d in range(5)
        } <= paths
        # every slot parses and is immutable-complete JSON
        import json as _json
        import os

        mdir = f"{path}/_manifests"
        names = sorted(os.listdir(mdir))
        assert not [n for n in names if n.startswith(".tmp-")]
        for n in names:
            with open(f"{mdir}/{n}") as f:
                assert _json.load(f)["version"] == int(n[:-5])


class TestSpecialCharPartitionValues:
    """Late r11: partition VALUES with Hive-escaped characters — 'c/d',
    'e=f', '50%', 'a b' (think source=<url/domain> in a corpus store) —
    must round-trip through every path. Before the raw-rel fix the
    staging move re-encoded the escaped dir name via its URI rendering
    (p=c%2Fd landed on disk as p=c%252Fd and read back as 'c%2Fd'),
    input_file_name-derived rels double-encoded in DML, and a DELETE
    emptying its touched files crashed the staging stats scan."""

    VALS = ["a b", "c/d", "e=f", "plain", "50%"]

    def _store(self, spark, tmp_path):
        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self.VALS)], "id long, p string"
        )
        write_manifested(
            spark, df, path, partition_by=["p"], stats_cols=["id"],
            bloom_cols=["id"],
        )
        return path

    def test_roundtrip_matches_plain_spark_layout(self, spark, tmp_path):
        import os

        path = self._store(spark, tmp_path)
        got = sorted((r.id, r.p) for r in read_manifested(spark, path).collect())
        assert got == sorted(enumerate(self.VALS))
        # disk layout is EXACTLY what Spark's own partitioned writer uses
        dirs = sorted(d for d in os.listdir(path) if d.startswith("p="))
        assert dirs == ["p=50%25", "p=a b", "p=c%2Fd", "p=e%3Df", "p=plain"]

    def test_dml_and_maintenance_on_escaped_partitions(self, spark, tmp_path):
        from aeon_sleap_processing_spark.sources.sinks import (
            delete_manifested,
            merge_manifested,
            read_manifested_changes,
            update_manifested,
        )

        path = self._store(spark, tmp_path)
        # delete that EMPTIES the touched file (the staged-zero-files edge)
        r = delete_manifested(spark, path, "p = 'c/d'")
        assert (r["rows_deleted"], r["files_rewritten"]) == (1, 1)
        ups = spark.createDataFrame([(50, "50%")], "id long, p string")
        assert merge_manifested(spark, ups, path, key="p")["rows_matched"] == 1
        assert update_manifested(
            spark, path, "p = 'a b'", set={"id": "id + 100"}
        )["rows_updated"] == 1
        vacuum_manifested(spark, path, keep_versions=1, orphan_grace_seconds=0)
        assert compact_manifested(spark, path, min_files_to_compact=1)["compacted"]
        snap, _ = read_manifested_changes(spark, path, since_version=-1)
        got = sorted((r.id, r.p) for r in snap.collect())
        assert got == [(2, "e=f"), (3, "plain"), (50, "50%"), (100, "a b")]
        assert got == sorted(
            (r.id, r.p) for r in read_manifested(spark, path).collect()
        )

    def test_null_and_unicode_partition_values(self, spark, tmp_path):
        """NULL lands in __HIVE_DEFAULT_PARTITION__ and non-ASCII stays
        raw in the dir name; a DML rewrite touching ONLY the null
        partition must not die on the VOID-typed partition column
        (partition types are value-inferred; all-null reads as VOID)."""
        from aeon_sleap_processing_spark.sources.sinks import (
            delete_manifested,
        )

        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, None), (2, "中文"), (3, "ok"), (4, None)],
            "id long, p string",
        )
        write_manifested(
            spark, df, path, partition_by=["p"], stats_cols=["id"]
        )
        got = sorted(
            (r.id, r.p) for r in read_manifested(spark, path).collect()
        )
        assert got == [(1, None), (2, "中文"), (3, "ok"), (4, None)]
        r = delete_manifested(spark, path, "p IS NULL AND id = 1")
        assert (r["rows_deleted"], r["files_rewritten"]) == (1, 1)
        assert compact_manifested(
            spark, path, min_files_to_compact=1
        )["compacted"]
        got = sorted(
            (r.id, r.p) for r in read_manifested(spark, path).collect()
        )
        assert got == [(2, "中文"), (3, "ok"), (4, None)]


class TestLogTypedReads:
    """r13 (two r12 ADVICE findings): reads get the LOG's declared
    schema, so (a) partition dir values parse at their declared types
    directly — no lossy infer-then-cast-back ('007' must stay '007' for
    a string partition column), agreeing with the CDC source; and (b)
    the sticky 'parts' record survives appends that don't restate the
    layout."""

    def test_noncanonical_string_partition_value_roundtrips(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, "007"), (2, "east"), (3, "12")], "id long, region string"
        )
        write_manifested(spark, df, path, partition_by=["region"])
        got = sorted(
            (r.id, r.region)
            for r in read_manifested(spark, path).collect()
        )
        assert got == [(1, "007"), (2, "east"), (3, "12")], (
            "'007' must not round-trip through long 7 to '7'"
        )
        # the all-digit SLICE alone must also stay string-typed ('007',
        # not 7): pre-r13 this read inferred long from the one dir name
        one = read_manifested(spark, path, prefixes=["region=007/"])
        assert [(r.id, r.region) for r in one.collect()] == [(1, "007")]
        assert dict(one.dtypes)["region"] == "string"

    def test_plain_append_keeps_sticky_parts(self, spark, tmp_path):
        import glob
        import json as _json

        from aeon_sleap_processing_spark.sources.sinks import (
            delete_manifested,
        )

        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, "007"), (2, "east")], "id long, region string"
        )
        write_manifested(spark, df, path, partition_by=["region"])
        # a plain append that does NOT restate the layout (the r12
        # ADVICE finding: this used to clobber 'parts' with []) — the
        # row lands unpartitioned; delete it again so the final read is
        # over the partitioned files (DML restates nothing either)
        extra = spark.createDataFrame([(9, "west")], "id long, region string")
        write_manifested(spark, extra, path)
        delete_manifested(spark, path, "id = 9", prefixes=["data-"])
        heads = sorted(glob.glob(f"{path}/_manifests/*.json"))
        doc = _json.load(open(heads[-1]))
        assert doc.get("parts") == ["region"], doc.get("parts")
        got = sorted(
            (r.id, r.region)
            for r in read_manifested(spark, path).collect()
        )
        assert got == [(1, "007"), (2, "east")]

    def test_lossy_rebuild_never_touches_session_conf(
        self, spark, tmp_path, monkeypatch
    ):
        """r13 ADVICE (medium): the phase-2 raw-partition rebuild used
        to toggle the SESSION-global
        spark.sql.sources.partitionColumnTypeInference.enabled — a
        concurrent read planned on another thread of the same session
        during the window silently parsed ALL its partition dirs as
        strings. The rebuild now passes an explicit per-reader schema;
        the session conf must never be written, and a plan constructed
        concurrently with the lossy read must keep normal inference."""
        calls = []
        real_set = type(spark.conf).set

        def _recording_set(self, key, value=None):
            calls.append(key)
            return real_set(self, key, value)

        monkeypatch.setattr(type(spark.conf), "set", _recording_set)
        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, "007"), (2, "east")], "id long, region string"
        )
        write_manifested(spark, df, path, partition_by=["region"])
        # an int-partitioned NON-manifest dir read planned right after
        # the lossy store's plan: inference must be intact
        other = str(tmp_path / "plain")
        spark.createDataFrame(
            [(1, 7), (2, 8)], "id long, n int"
        ).write.partitionBy("n").parquet(other)
        lossy = read_manifested(spark, path)
        concurrent = spark.read.parquet(other)
        assert dict(lossy.dtypes)["region"] == "string"
        assert sorted(r.region for r in lossy.collect()) == ["007", "east"]
        assert dict(concurrent.dtypes)["n"] == "int"
        key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        assert key not in calls, calls
        # pruning survives the explicit-schema rebuild: a prefix read
        # of the all-digit slice scans exactly one file
        one = read_manifested(spark, path, prefixes=["region=007/"])
        assert len(one.inputFiles()) == 1
        assert [(r.id, r.region) for r in one.collect()] == [(1, "007")]

    def test_replace_all_unpartitioned_resets_parts(self, spark, tmp_path):
        import glob
        import json as _json

        path = str(tmp_path / "store")
        df = spark.createDataFrame([(1, "a")], "id long, region string")
        write_manifested(spark, df, path, partition_by=["region"])
        write_manifested(
            spark, spark.range(0, 3), path, replace="all"
        )  # flattens the layout: parts must reset to []
        heads = sorted(glob.glob(f"{path}/_manifests/*.json"))
        doc = _json.load(open(heads[-1]))
        assert doc.get("parts") == []
        assert sorted(
            r.id for r in read_manifested(spark, path).collect()
        ) == [0, 1, 2]


class TestHeterogeneousChunkStore:
    def test_conflicting_column_types_across_streams(self, spark, tmp_path):
        """r13 regression: one manifest chunk store holds STREAMS whose
        same-named columns have DIFFERENT types (pose 'v' double vs blob
        'v' long — the reference's register files genuinely differ).
        A slice read must use the slice's own schema; supplying the
        log's union schema to a plain read fails with
        PARQUET_COLUMN_DATA_TYPE_MISMATCH (caught mid-r13 — the union
        schema is now opt-in via merge_schema only, and partition types
        still come from the log via raw-dir parsing)."""
        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            load_chunked, write_chunked,
        )

        root = str(tmp_path / "chunks")
        t0 = pd.Timestamp("2024-01-01 00:00:00")
        pose = spark.createDataFrame(
            pd.DataFrame({"time": [t0], "v": [1.5]})
        )
        blob = spark.createDataFrame(pd.DataFrame({"time": [t0], "v": [7]}))
        write_chunked(pose, root, camera="Top", register=5, time_col="time")
        write_chunked(blob, root, camera="Top", register=6, time_col="time")
        df5 = load_chunked(spark, root, register=5, camera="Top",
                           time_col="time")
        df6 = load_chunked(spark, root, register=6, camera="Top",
                           time_col="time")
        assert dict(df5.dtypes)["v"] == "double"
        assert dict(df6.dtypes)["v"] == "bigint"
        assert [r.v for r in df5.collect()] == [1.5]
        assert [r.v for r in df6.collect()] == [7]
        # partition columns still read at their log-declared types
        assert dict(df5.dtypes)["stream"] == "int"
        assert dict(df5.dtypes)["chunk"] == "string"

    def test_dml_rewrite_preserves_noncanonical_partition_dirs(
        self, spark, tmp_path
    ):
        """r13: DML reads parse partition dirs raw + cast to declared
        types, so a rewrite of region='007' re-stages under region=007/
        — inference would re-stage it as region=7/, silently renaming
        the partition on disk."""
        import os

        from aeon_sleap_processing_spark.sources.sinks import (
            update_manifested,
        )

        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, "007"), (2, "007"), (3, "east")], "id long, region string"
        )
        write_manifested(spark, df, path, partition_by=["region"])
        res = update_manifested(spark, path, "id = 1", {"id": "10"})
        assert res["rows_updated"] == 1
        got = sorted(
            (r.id, r.region)
            for r in read_manifested(spark, path).collect()
        )
        assert got == [(2, "007"), (3, "east"), (10, "007")]
        # the rewrite landed under the RAW dir name
        assert os.path.isdir(f"{path}/region=007")
        assert not os.path.isdir(f"{path}/region=7")

    def test_typed_partition_filters_still_prune(self, spark, tmp_path):
        """r13 regression (caught by the streaming A/B): log-typed
        partition reads must keep the partition column a plain
        attribute — a CAST there defeats Catalyst partition pruning,
        which cost the bucketed rep store's per-batch reads ~20%. The
        raw-dir rebuild runs ONLY for lossy (string-declared, non-
        string-inferred) layouts."""
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        df = spark.range(0, 80).withColumn(
            "vp", F.pmod("id", F.lit(8)).cast("int")
        )
        write_manifested(spark, df, path, partition_by=["vp"])
        back = read_manifested(spark, path)
        assert dict(back.dtypes)["vp"] == "int"  # declared type held
        plan = (
            back.where("vp = 3")
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "vp" in m.group(1) and "cast" not in m.group(1), (
            f"partition filter must reference the raw attribute: "
            f"{m.group(1) if m else plan[:400]}"
        )
