"""Incremental (CDC-style) consumption of the manifest-committed store
(r11): `read_manifested_changes` delivers each logical row exactly once
across maintenance rewrites — the capability Spark's directory-listing
file source cannot provide on a manifest store (it re-consumes every
compaction/fold/OPTIMIZE output) — plus the durable-cursor consumer
`watch_manifested` and the `manifest_history` commit log.

The reference's incremental loop is poll-every-30-min + existence checks
(`detect_fights_all_epochs.py`); here incrementality is a property of the
commit log itself."""

import json

import pytest

from aeon_sleap_processing_spark.sources.sinks import (
    ManifestCursorExpired,
    compact_manifested,
    manifest_history,
    optimize_manifested,
    read_manifested,
    read_manifested_changes,
    vacuum_manifested,
    write_manifested,
)
from aeon_sleap_processing_spark.streaming.watch import watch_manifested


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


class TestChangesBasic:
    def test_incremental_appends(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path)
        df, v1 = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(10))
        # caught up: nothing new, cursor unchanged
        df2, v2 = read_manifested_changes(spark, path, since_version=v1)
        assert df2 is None and v2 == v1
        write_manifested(spark, spark.range(10, 20), path)
        df3, v3 = read_manifested_changes(spark, path, since_version=v1)
        assert v3 > v1 and _ids(df3) == list(range(10, 20))

    def test_partition_columns_recovered(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        df = spark.range(0, 12).withColumn("p", F.pmod("id", F.lit(3)))
        write_manifested(spark, df, path, partition_by=["p"])
        out, _ = read_manifested_changes(spark, path)
        assert "p" in out.columns
        assert out.where("p = 1").count() == 4

    def test_empty_store_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_manifested_changes(spark, str(tmp_path / "nope"))


class TestMaintenanceInvisible:
    def test_compaction_adds_nothing_for_caught_up_consumer(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "store")
        for i in range(6):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), path)
        _, cursor = read_manifested_changes(spark, path)
        res = compact_manifested(spark, path, min_files_to_compact=2)
        assert res["compacted"]
        df, v = read_manifested_changes(spark, path, since_version=cursor)
        assert df is None, "a fold must be invisible to the consumer"
        assert v > cursor  # cursor still advances past the fold commit
        # and rows that land AFTER the fold flow normally
        write_manifested(spark, spark.range(100, 105), path)
        df2, _ = read_manifested_changes(spark, path, since_version=v)
        assert _ids(df2) == list(range(100, 105))

    def test_rows_replaced_by_fold_still_delivered_once(
        self, spark, tmp_path
    ):
        """The order every interleaving bug lives in: rows appended, FOLDED
        AWAY by compaction, and only then consumed. The pre-fold files are
        off the head but must still be delivered (they owe their one
        delivery and vacuum has not reclaimed them) — and the fold's own
        output files must NOT be delivered on top."""
        path = str(tmp_path / "store")
        for i in range(4):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), path)
        assert compact_manifested(spark, path, min_files_to_compact=2)[
            "compacted"
        ]
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(20))

    def test_optimize_invisible(self, spark, tmp_path):
        path = str(tmp_path / "store")
        from pyspark.sql import functions as F

        df = spark.range(0, 40).withColumn("x", F.pmod("id", F.lit(7)))
        write_manifested(spark, df, path)
        _, cursor = read_manifested_changes(spark, path)
        assert optimize_manifested(spark, path, ["x", "id"], bits=8)[
            "compacted"
        ]
        out, _ = read_manifested_changes(spark, path, since_version=cursor)
        assert out is None

    def test_fresh_consumer_after_many_folds_exact_once(self, spark, tmp_path):
        path = str(tmp_path / "store")
        for i in range(3):
            write_manifested(spark, spark.range(i * 4, i * 4 + 4), path)
            compact_manifested(spark, path, min_files_to_compact=2)
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(12))


class TestDataChangeRemovals:
    def test_partition_overwrite_converges_to_last_writer(
        self, spark, tmp_path
    ):
        """attempt 1 and its overwrite both land INSIDE one poll window —
        the consumer must deliver only the replacement (the replaced files
        were logically superseded, not reorganized)."""
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")

        def part(lo, hi):
            return (
                spark.range(lo, hi).withColumn("p", F.lit(0))
            )

        write_manifested(spark, part(0, 5), path, partition_by=["p"],
                         replace="partitions")
        write_manifested(spark, part(100, 105), path, partition_by=["p"],
                         replace="partitions")
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(100, 105))

    def test_streaming_replay_self_replace(self, spark, tmp_path):
        """b<id>- replay semantics: the retry drops its own earlier attempt
        in the same commit; a consumer polling after both sees one copy."""
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path,
                         filename_prefix="b7-", remove_prefixes=["b7-"])
        write_manifested(spark, spark.range(0, 5), path,
                         filename_prefix="b7-", remove_prefixes=["b7-"])
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(5))

    def test_ttl_expiry_cancels_pending_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.sinks import (
            retention_sweep_manifested,
        )

        path = str(tmp_path / "store")
        old = spark.range(0, 5).withColumn("chunk", F.lit("2024-01-01"))
        new = spark.range(10, 15).withColumn("chunk", F.lit("2024-06-01"))
        write_manifested(spark, old, path, partition_by=["chunk"])
        write_manifested(spark, new, path, partition_by=["chunk"])
        assert retention_sweep_manifested(
            spark, path, "chunk", "2024-03-01"
        ) == ["2024-01-01"]
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(10, 15)), (
            "TTL-expired rows must not be delivered to a fresh consumer"
        )


class TestWatchManifested:
    def test_catch_up_then_resume(self, spark, tmp_path):
        path = str(tmp_path / "store")
        cursor = str(tmp_path / "cursor.json")
        seen: list[list[int]] = []

        def sink(df, version):
            seen.append(_ids(df))

        write_manifested(spark, spark.range(0, 8), path)
        r1 = watch_manifested(spark, path, sink, cursor)
        assert r1["batches"] == 1 and seen[-1] == list(range(8))
        # drained run: no new batch, cursor stable
        r2 = watch_manifested(spark, path, sink, cursor)
        assert r2["batches"] == 0 and r2["cursor"] == r1["cursor"]
        # new data + a fold between runs: only the data is delivered
        write_manifested(spark, spark.range(8, 12), path)
        compact_manifested(spark, path, min_files_to_compact=2)
        r3 = watch_manifested(spark, path, sink, cursor)
        assert r3["batches"] == 1 and seen[-1] == list(range(8, 12))
        assert sum(len(s) for s in seen) == 12  # exactly once overall

    def test_failed_sink_replays_at_least_once(self, spark, tmp_path):
        """cursor commits AFTER process_batch — a sink crash must leave the
        cursor untouched so the next run replays the poll (foreachBatch
        contract)."""
        path = str(tmp_path / "store")
        cursor = str(tmp_path / "cursor.json")
        write_manifested(spark, spark.range(0, 6), path)

        def boom(df, version):
            raise RuntimeError("sink died")

        with pytest.raises(RuntimeError):
            watch_manifested(spark, path, boom, cursor)
        seen = []
        watch_manifested(spark, path, lambda d, v: seen.append(_ids(d)),
                         cursor)
        assert seen == [list(range(6))]


class TestSlicedConsumption:
    def test_prefix_pruned_changes(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        df = spark.range(0, 20).withColumn("p", F.pmod("id", F.lit(2)))
        write_manifested(spark, df, path, partition_by=["p"])
        out, v = read_manifested_changes(spark, path, prefixes=["p=1/"])
        assert _ids(out) == list(range(1, 20, 2))
        # the slice consumer's cursor is global: caught up for its slice
        out2, _ = read_manifested_changes(spark, path, since_version=v,
                                          prefixes=["p=1/"])
        assert out2 is None

    def test_two_slice_watchers_cover_chunk_store(self, spark, tmp_path):
        """Watch the ENGINE's chunk store (manifest commit is its default
        protocol) one camera slice at a time: two watchers with their own
        cursors, a fold between polls, union == every row exactly once."""
        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import write_chunked

        root = str(tmp_path / "chunks")
        times = pd.date_range("2024-03-01", periods=8, freq="30min")
        pdf = pd.DataFrame({"time": times, "x": range(8)})
        df = spark.createDataFrame(pdf)
        write_chunked(df, root, camera="Top", register=5)
        write_chunked(df.withColumn("x", df.x + 100), root,
                      camera="South", register=5)
        got: dict[str, list[int]] = {"Top": [], "South": []}

        def sink_for(cam):
            return lambda d, v: got[cam].extend(
                r.x for r in d.select("x").collect()
            )

        for cam in ("Top", "South"):
            watch_manifested(
                spark, root, sink_for(cam),
                str(tmp_path / f"cursor_{cam}.json"),
                prefixes=[f"stream=5/camera={cam}/"],
            )
        compact_manifested(spark, root, min_files_to_compact=1)
        write_chunked(
            df.withColumn("x", df.x + 200)
            .withColumn("time", F_shift(df.time)),
            root, camera="Top", register=5, mode="append",
        )
        for cam in ("Top", "South"):
            watch_manifested(
                spark, root, sink_for(cam),
                str(tmp_path / f"cursor_{cam}.json"),
                prefixes=[f"stream=5/camera={cam}/"],
            )
        assert sorted(got["Top"]) == list(range(8)) + list(range(200, 208))
        assert sorted(got["South"]) == list(range(100, 108))


def F_shift(col):
    """+10 days — lands the appended rows in fresh chunks."""
    from pyspark.sql import functions as F

    return col + F.expr("INTERVAL 10 DAYS")


class TestInterleavedWriterCompactorConsumer:
    def test_exactly_once_under_contention(self, spark, tmp_path):
        """Writers appending + a compactor folding + a consumer polling,
        all interleaved: the union of consumed batches must be every row
        exactly once — the end-to-end claim of the changes reader."""
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 10), path)
        consumed: list[int] = []
        cursor = -1
        lo = 10
        for step in range(6):
            df, cursor = read_manifested_changes(spark, path, cursor)
            if df is not None:
                consumed.extend(_ids(df))
            write_manifested(spark, spark.range(lo, lo + 10), path)
            lo += 10
            if step % 2 == 1:
                compact_manifested(spark, path, min_files_to_compact=2)
        df, cursor = read_manifested_changes(spark, path, cursor)
        if df is not None:
            consumed.extend(_ids(df))
        assert sorted(consumed) == list(range(lo))
        assert len(consumed) == lo  # no double delivery


class TestRetentionInterplay:
    def test_cursor_below_retained_history_raises(self, spark, tmp_path):
        """Enough commits to cross a CHECKPOINT boundary: vacuum anchors
        the log at the newest checkpoint at/below the keep window, so a
        cursor below that anchor is genuinely unresolvable."""
        path = str(tmp_path / "store")
        for i in range(18):
            write_manifested(spark, spark.range(i * 3, i * 3 + 3), path)
        compact_manifested(spark, path, min_files_to_compact=2)
        vacuum_manifested(spark, path, keep_versions=2,
                          orphan_grace_seconds=0.0)
        with pytest.raises(ManifestCursorExpired):
            read_manifested_changes(spark, path, since_version=0)

    def test_fresh_consumer_after_vacuum_sees_initial_snapshot(
        self, spark, tmp_path
    ):
        """Early history vacuumed away (the pre-fold data files are
        gone): a from-scratch consumer must still get the full row set —
        the initial snapshot is the resolved state at the head, whatever
        ops produced it."""
        path = str(tmp_path / "store")
        for i in range(6):
            write_manifested(spark, spark.range(i * 3, i * 3 + 3), path)
        compact_manifested(spark, path, min_files_to_compact=2)
        vacuum_manifested(spark, path, keep_versions=1,
                          orphan_grace_seconds=0.0)
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(18))
        assert _ids(read_manifested(spark, path)) == list(range(18))


class TestChangesSchemaEvolution:
    def test_delta_spanning_evolution_reads_union_schema(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 4), path)
        write_manifested(
            spark, spark.range(4, 8).withColumn("tag", F.lit("new")), path
        )
        df, _ = read_manifested_changes(spark, path, merge_schema=True)
        assert set(df.columns) == {"id", "tag"}
        assert df.where("tag IS NULL").count() == 4
        assert df.where("tag = 'new'").count() == 4


class TestHistoryAndCompat:
    def test_history_records_ops(self, spark, tmp_path):
        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 8), path)
        write_manifested(spark, spark.range(8, 16), path)
        compact_manifested(spark, path, min_files_to_compact=2)
        hist = manifest_history(spark, path)
        assert [h["op"] for h in hist] == ["append", "append", "compact"]
        assert [h["data_change"] for h in hist] == [True, True, False]
        assert all(h["ts"] is not None for h in hist)
        assert hist[2]["added"] >= 1 and hist[2]["removed"] >= 2
        assert [h["version"] for h in hist] == sorted(
            h["version"] for h in hist
        )

    def test_pre_r11_manifest_defaults_to_data_change(self, spark, tmp_path):
        """A manifest written before op/dc existed must read back as a
        data change (conservative) — strip the fields in place and
        re-walk."""
        import glob
        import os

        path = str(tmp_path / "store")
        write_manifested(spark, spark.range(0, 5), path)
        write_manifested(spark, spark.range(5, 10), path)
        for m in glob.glob(os.path.join(path, "_manifests", "*.json")):
            doc = json.load(open(m))
            doc.pop("op", None), doc.pop("dc", None), doc.pop("ts", None)
            json.dump(doc, open(m, "w"))
        hist = manifest_history(spark, path)
        assert all(h["op"] == "unknown" and h["data_change"] for h in hist)
        df, _ = read_manifested_changes(spark, path)
        assert _ids(df) == list(range(10))


class TestRelayExactlyOnce:
    def test_relay_with_transform_and_crash_replay(self, spark, tmp_path):
        """Store->store relay: a crash AFTER the destination commit but
        BEFORE the cursor write replays the poll; the replay must REPLACE
        its earlier output (v<version>- prefix self-replace), landing
        each source row exactly once downstream."""
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.streaming.watch import (
            relay_manifested,
        )

        src = str(tmp_path / "src")
        dest = str(tmp_path / "dest")
        cursor = str(tmp_path / "cur.json")
        write_manifested(spark, spark.range(0, 20), src)
        double = lambda d: d.withColumn("y", F.col("id") * 2)
        r1 = relay_manifested(spark, src, dest, cursor, transform=double,
                              stats_cols=["y"], bloom_cols=["id"])
        assert r1["batches"] == 1
        # the derived store carries the skipping discipline forward
        import glob as _glob

        assert _glob.glob(f"{dest}/_index/bloomset-*.json")
        pruned = read_manifested(spark, dest, skip={"y": (0, 4)})
        assert len(pruned.inputFiles()) <= len(
            read_manifested(spark, dest).inputFiles()
        )
        # simulate the crash window: wind the cursor back and relay again
        from aeon_sleap_processing_spark.streaming.watch import (
            _write_manifest_cursor,
        )

        _write_manifest_cursor(spark, cursor, -1)
        r2 = relay_manifested(spark, src, dest, cursor, transform=double)
        assert r2["batches"] == 1
        out = read_manifested(spark, dest)
        assert out.count() == 20, "replay must replace, not duplicate"
        assert sorted(r.y for r in out.collect()) == list(range(0, 40, 2))

    def test_relay_across_source_fold(self, spark, tmp_path):
        from aeon_sleap_processing_spark.streaming.watch import (
            relay_manifested,
        )

        src = str(tmp_path / "src")
        dest = str(tmp_path / "dest")
        cursor = str(tmp_path / "cur.json")
        for i in range(4):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), src)
        relay_manifested(spark, src, dest, cursor)
        compact_manifested(spark, src, min_files_to_compact=2)
        write_manifested(spark, spark.range(20, 25), src)
        r = relay_manifested(spark, src, dest, cursor)
        assert r["batches"] == 1  # only the post-fold append
        assert sorted(
            x.id for x in read_manifested(spark, dest).collect()
        ) == list(range(25))


class TestChangesPartitionTypes:
    def test_changes_read_preserves_noncanonical_partition_value(
        self, spark, tmp_path
    ):
        """r13: the incremental changes read parses partition dirs raw
        + casts at log-declared types, same as read_manifested — a
        string partition value '007' must survive the delta read (and
        the declared type must hold on the all-digit slice)."""
        path = str(tmp_path / "store")
        df = spark.createDataFrame(
            [(1, "007"), (2, "east")], "id long, region string"
        )
        write_manifested(spark, df, path, partition_by=["region"])
        snap, cur = read_manifested_changes(spark, path)
        got = sorted((r.id, r.region) for r in snap.collect())
        assert got == [(1, "007"), (2, "east")]
        assert dict(snap.dtypes)["region"] == "string"
        # an increment landing ONLY in the all-digit partition: the
        # delta's lone dir would re-infer long without the log types
        write_manifested(
            spark,
            spark.createDataFrame([(3, "007")], "id long, region string"),
            path, partition_by=["region"],
        )
        delta, _ = read_manifested_changes(spark, path, since_version=cur)
        assert [(r.id, r.region) for r in delta.collect()] == [(3, "007")]
        assert dict(delta.dtypes)["region"] == "string"
