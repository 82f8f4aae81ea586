"""Streaming append sink with built-in compaction: bounded file count
across micro-batches, exactly-once results across checkpoint restarts."""

import glob
import os

from aeon_sleap_processing_spark.streaming.watch import (
    read_compacted_store,
    stream_append_compacted,
)


def _data_files(root):
    return [
        f
        for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    ]


class TestStreamAppendCompacted:
    # the layout-pinning tests below exercise the r≤10 LISTING protocol's
    # two-tier internals explicitly; the manifest protocol (r11 default)
    # has its own class underneath
    def _run(self, spark, src, out, ckpt, max_segments=8, commit="listing"):
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_append_compacted(
            stream, out, ckpt, compact_every=3,
            target_bytes=64 * 1024 * 1024, max_segments=max_segments,
            commit=commit,
        )
        q.awaitTermination(120)

    def test_file_count_bounded_and_restart_safe(self, spark, tmp_path):
        """12 micro-batches across two checkpoint-restart cycles: the
        store must hold every source row exactly once, the compacted
        tier must exist, and total data files must stay far below one
        per batch (the unbounded-small-files failure mode)."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in range(7):  # batches 0..6 in cycle 1
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        self._run(spark, src, out, ckpt)
        got1 = sorted(r.id for r in read_compacted_store(spark, out).collect())
        assert got1 == list(range(70))

        # restart cycle: 5 more source files, SAME checkpoint — only the
        # new files are processed (batch ids continue), nothing replays
        for i in range(7, 12):
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        self._run(spark, src, out, ckpt)
        got2 = sorted(r.id for r in read_compacted_store(spark, out).collect())
        assert got2 == list(range(120))

        # compaction actually ran and bounded the layout: ingest holds at
        # most the batches since the last fold; each fold is one segment
        ingest_dirs = glob.glob(os.path.join(out, "ingest", "batch=*"))
        seg_dirs = glob.glob(os.path.join(out, "compacted", "seg=*"))
        assert seg_dirs, "compaction never ran"
        assert len(ingest_dirs) <= 3  # compact_every
        assert len(_data_files(out)) < 12  # << one file per batch

    def test_segment_tier_bounded_by_absorb_rounds(self, spark, tmp_path):
        """max_segments=2: every 2nd fold absorbs all existing segments,
        so the compacted tier stays bounded for any stream length and
        rows remain exactly-once through the second-level fold."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in range(11):  # batches 0..10 -> folds at 3, 6 (absorb), 9
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        self._run(spark, src, out, ckpt, max_segments=2)
        got = sorted(r.id for r in read_compacted_store(spark, out).collect())
        assert got == list(range(110))
        seg_dirs = glob.glob(os.path.join(out, "compacted", "seg=*"))
        assert 0 < len(seg_dirs) <= 2, seg_dirs

    def test_fold_replay_is_idempotent(self, spark, tmp_path):
        """Crash-replay of the folding batch: if the segment dir already
        exists, the fold must skip the rewrite and only re-delete
        leftover ingest dirs — rows appear exactly once either way."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "store")
        for i in range(4):
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        self._run(spark, src, out, str(tmp_path / "ckpt1"))
        before = sorted(r.id for r in read_compacted_store(spark, out).collect())
        # re-run the whole stream against a FRESH checkpoint but the same
        # store: every batch replays; ingest overwrites per batch dir and
        # the fold sees seg=3 already present
        self._run(spark, src, out, str(tmp_path / "ckpt2"))
        after = sorted(r.id for r in read_compacted_store(spark, out).collect())
        assert after == before == list(range(40))

    def test_replay_after_partial_absorb_deletes_stranded_segments(
        self, spark, tmp_path
    ):
        """r8 ADVICE (high): crash window in the absorb fold — seg=B
        written (+_SUCCESS), older INGEST dirs deleted, crash BEFORE the
        absorbed seg=X dirs are deleted. Batch B was not
        checkpoint-committed, so the fold replays with older == [];
        the replay must still re-delete the absorbed segments (their
        rows live in seg=B) instead of early-returning and leaving the
        store double-counting those rows forever."""
        from aeon_sleap_processing_spark.streaming.watch import _fold_compacted

        out = str(tmp_path / "store")
        # crash state: seg=3 (first fold: rows 0..29) stranded; the
        # absorb fold at batch 6 already wrote seg=6 = batches 3..5 +
        # absorbed seg=3 (rows 0..59) and deleted ingest batches 3..5;
        # ingest holds only the current batch=6 (rows 60..69)
        spark.range(0, 30).coalesce(1).write.parquet(
            f"{out}/compacted/seg=3"
        )
        spark.range(0, 60).coalesce(1).write.parquet(
            f"{out}/compacted/seg=6"
        )
        spark.range(60, 70).coalesce(1).write.parquet(
            f"{out}/ingest/batch=6"
        )
        before = sorted(
            r.id for r in read_compacted_store(spark, out).collect()
        )
        assert before != list(range(70))  # rows 0..29 duplicated

        # the replayed fold: absorb round (6//3 % 2 == 0), no older
        # ingest dirs, seg=6 _SUCCESS present -> no rewrite, but the
        # stranded seg=3 must be re-deleted
        _fold_compacted(
            spark, out, batch_id=6, compact_every=3,
            target_bytes=64 * 1024 * 1024, max_segments=2,
        )
        after = sorted(
            r.id for r in read_compacted_store(spark, out).collect()
        )
        assert after == list(range(70))
        assert not glob.glob(os.path.join(out, "compacted", "seg=3"))
        assert glob.glob(os.path.join(out, "compacted", "seg=6"))

class TestStreamAppendManifest:
    """r11: the streaming sink through the manifest commit protocol (the
    new default) — restart-cycle exactly-once, bounded flat layout, fold
    snapshot isolation, and writer/fold interleaving with zero loss."""

    def _run(self, spark, src, out, ckpt):
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_append_compacted(
            stream, out, ckpt, compact_every=3,
            target_bytes=64 * 1024 * 1024,
        )
        q.awaitTermination(120)

    def test_restart_cycles_exactly_once_and_bounded(self, spark, tmp_path):
        src = str(tmp_path / "src")
        out = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in range(7):
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        self._run(spark, src, out, ckpt)
        assert sorted(
            r.id for r in read_compacted_store(spark, out).collect()
        ) == list(range(70))
        # restart cycle: same checkpoint, 5 new source files — batch ids
        # continue, nothing replays, folds keep absorbing
        for i in range(7, 12):
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        self._run(spark, src, out, ckpt)
        assert sorted(
            r.id for r in read_compacted_store(spark, out).collect()
        ) == list(range(120))
        # LIVE file set (manifest head) is bounded: folds absorbed the
        # earlier batches; old files may linger for pinned readers until
        # vacuum, but the snapshot itself stays small
        from aeon_sleap_processing_spark.sources.sinks import (
            _canon_uri, _hadoop_fs, _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, out)
        _, head, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        assert len(head["files"]) < 12, head["files"]
        assert all(
            f["path"].startswith(("b", "seg-")) and "/" not in f["path"]
            for f in head["files"]
        )

    def test_batch_replay_drops_its_own_retry(self, spark, tmp_path):
        """Crash after the batch's manifest commit but before the stream
        checkpoint commit ⇒ the batch replays: the b<id>- remove-prefix
        must drop the first attempt's files in the same commit, keeping
        rows exactly-once."""
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )

        out = str(tmp_path / "store")
        df = spark.range(0, 25)
        write_manifested(
            spark, df, out, filename_prefix="b4-", remove_prefixes=["b4-"]
        )
        write_manifested(  # the replay
            spark, df, out, filename_prefix="b4-", remove_prefixes=["b4-"]
        )
        assert sorted(
            r.id for r in read_manifested(spark, out).collect()
        ) == list(range(25))

    def test_fold_composes_with_concurrent_append(self, spark, tmp_path):
        """An external write_manifested landing INSIDE the fold's
        stage→commit window (the _before_commit seam): the fold's CAS
        retry must rebuild on the writer's head — zero loss, zero
        double-reads, and the appended rows survive the fold's commit."""
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )
        from aeon_sleap_processing_spark.streaming.watch import (
            _fold_manifested,
        )

        out = str(tmp_path / "store")
        for b in range(3):
            write_manifested(
                spark, spark.range(b * 10, (b + 1) * 10), out,
                filename_prefix=f"b{b}-", remove_prefixes=[f"b{b}-"],
            )

        def racing_append():
            write_manifested(
                spark, spark.range(500, 510).coalesce(1), out,
                filename_prefix="b3-", remove_prefixes=["b3-"],
            )

        _fold_manifested(
            spark, out, batch_id=3, target_bytes=64 * 1024 * 1024,
            _before_commit=racing_append,
        )
        got = sorted(r.id for r in read_manifested(spark, out).collect())
        assert got == list(range(30)) + list(range(500, 510))
        # the fold really ran: b0..b2 replaced by seg- files, b3 untouched
        from aeon_sleap_processing_spark.sources.sinks import (
            _canon_uri, _hadoop_fs, _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, out)
        _, head, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        names = [f["path"] for f in head["files"]]
        assert any(p.startswith("seg-") for p in names)
        assert not any(p.startswith(("b0-", "b1-", "b2-")) for p in names)
        assert any(p.startswith("b3-") for p in names)

    def test_fold_crash_before_commit_is_invisible_and_replayable(
        self, spark, tmp_path
    ):
        """Crash between the fold's seg-file renames and its commit: the
        seg orphans are invisible to readers; the replayed fold re-runs
        from the unchanged head and converges; vacuum(grace=0) reclaims
        the orphaned first attempt."""
        import pytest

        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, vacuum_manifested, write_manifested,
        )
        from aeon_sleap_processing_spark.streaming.watch import (
            _fold_manifested,
        )

        out = str(tmp_path / "store")
        for b in range(3):
            write_manifested(
                spark, spark.range(b * 10, (b + 1) * 10), out,
                filename_prefix=f"b{b}-", remove_prefixes=[f"b{b}-"],
            )

        class Crash(RuntimeError):
            pass

        def boom():
            raise Crash()

        with pytest.raises(Crash):
            _fold_manifested(
                spark, out, batch_id=3, target_bytes=64 * 1024 * 1024,
                _before_commit=boom,
            )
        assert sorted(
            r.id for r in read_manifested(spark, out).collect()
        ) == list(range(30))
        _fold_manifested(spark, out, batch_id=3, target_bytes=64 * 1024 * 1024)
        assert sorted(
            r.id for r in read_manifested(spark, out).collect()
        ) == list(range(30))
        res = vacuum_manifested(
            spark, out, keep_versions=1, orphan_grace_seconds=0
        )
        assert res["deleted_files"] >= 1  # the crashed attempt's seg orphans
        assert sorted(
            r.id for r in read_manifested(spark, out).collect()
        ) == list(range(30))


class TestFoldSchemaEvolution:
    def test_fold_preserves_wider_restart_schema(self, spark, tmp_path):
        """A stream restarted with a wider schema leaves b<id>- files of
        both shapes in the head; the fold must rewrite with the union
        schema (a plain read would take one file's schema and silently
        drop the new column's data)."""
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )
        from aeon_sleap_processing_spark.streaming.watch import (
            _fold_manifested,
        )

        path = str(tmp_path / "sink")
        write_manifested(spark, spark.range(0, 4), path,
                         filename_prefix="b0-")
        write_manifested(
            spark, spark.range(4, 8).withColumn("q", F.lit(9)), path,
            filename_prefix="b1-",
        )
        _fold_manifested(spark, path, batch_id=2, target_bytes=1 << 30)
        back = read_manifested(spark, path, merge_schema=True)
        assert set(back.columns) == {"id", "q"}
        assert back.where("q = 9").count() == 4
        assert back.count() == 8


class TestStreamingBloomSelfMaintenance:
    """r15 (r14 VERDICT task 1): a micro-commit streaming store must keep
    point-read GETs bounded by LIVE FILES, not commit count, WITHOUT any
    external maintain() schedule — write_manifested's version-cadence
    compact_blooms_every hook, defaulted on in the streaming sinks."""

    def test_sink_self_compacts_blooms_no_maintain(self, spark, tmp_path):
        """24 micro-batches (maxFilesPerTrigger=1) through the manifest
        sink with bloom_cols and an every-8-commit cadence: the bloom
        index must end at ceil(live/512)=1 point-read GET with no
        maintain() call, rows exactly once, pruning intact."""
        from aeon_sleap_processing_spark.sources import sinks
        from aeon_sleap_processing_spark.sources.sinks import read_manifested

        src = str(tmp_path / "src")
        out = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in range(24):
            spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_append_compacted(
            stream, out, ckpt, compact_every=0,  # no folds: pure
            bloom_cols=["id"],                   # micro-commit decay case
            compact_blooms_every=8,
        )
        q.awaitTermination(300)
        assert sorted(
            r.id for r in read_compacted_store(spark, out).collect()
        ) == list(range(240))
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, out, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        got = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
        # bounded by the CADENCE, not the commit count: at most
        # ceil(live/512) compacted objects + (cadence-1) fresh ones
        # since the last trigger. The decayed state would be 24 (one
        # bloomset per commit); compaction commits shift the version
        # stream, so the exact end state depends on trigger alignment.
        assert got["per_file"] == 0 and 1 <= got["objects"] <= 8, got
        assert len(hit.inputFiles()) == 1  # pruning survived the repacks

    def test_fold_preserves_bloom_pruning(self, spark, tmp_path):
        """With folds ON and bloom_cols set, seg- outputs must carry
        fresh bloom sidecars (pre-r15 the fold silently dropped them,
        degrading every folded file to conservative keep forever)."""
        from aeon_sleap_processing_spark.sources.sinks import read_manifested

        src = str(tmp_path / "src")
        out = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in range(7):
            spark.range(i * 100, (i + 1) * 100).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_append_compacted(
            stream, out, ckpt, compact_every=3,
            target_bytes=8 * 1024,  # force multiple seg outputs
            bloom_cols=["id"], compact_blooms_every=64,
        )
        q.awaitTermination(300)
        from aeon_sleap_processing_spark.sources.sinks import (
            _canon_uri, _hadoop_fs, _manifest_head,
        )

        fs, Path, root = _hadoop_fs(spark, out)
        _, head, _ = _manifest_head(spark, fs, Path, _canon_uri(fs, root))
        segs = [f for f in head["files"] if f["path"].startswith("seg-")]
        assert segs, "fold never ran"
        assert all(f.get("bloom") for f in segs), segs  # blooms SURVIVE
        hit = read_manifested(spark, out, point={"id": 123})
        assert hit.where("id = 123").count() == 1
        # the point read prunes: strictly fewer files than the live set
        assert len(hit.inputFiles()) < len(head["files"])

    def test_write_manifested_cadence_and_remainder_idempotence(
        self, spark, tmp_path
    ):
        """The version-cadence trigger itself: 12 micro-commits with
        compact_blooms_every=4 → at most ceil(12/512)=1 live bloomset
        GET per point read; an extra triggered commit right after a
        compaction must NOT re-churn the remainder object (the
        no-GET-reduction guard)."""
        from aeon_sleap_processing_spark.sources import sinks
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested, write_manifested,
        )

        path = str(tmp_path / "store")
        for i in range(12):
            write_manifested(
                spark, spark.range(i * 10, (i + 1) * 10).coalesce(1),
                path, bloom_cols=["id"], compact_blooms_every=4,
            )
        before = dict(sinks._BLOOM_GETS)
        hit = read_manifested(spark, path, point={"id": 57})
        assert hit.where("id = 57").count() == 1
        got = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
        # cadence bound: ceil(12/512)=1 compacted object + at most
        # (cadence-1) fresh commits since the last trigger — never the
        # decayed 12
        assert got["per_file"] == 0 and 1 <= got["objects"] <= 4, got
        assert len(hit.inputFiles()) == 1
        # remainder rule: a compaction pass right after the cadence's own
        # leaves the store in a state where ANOTHER pass finds at most
        # one repack worth doing, and a further one finds none — no churn
        sinks.compact_bloomsets(spark, path)
        rep = sinks.compact_bloomsets(spark, path)
        assert rep["repacked_rels"] == 0, rep
