"""`manifest_cdc` Python DataSource (r11): the manifest store as a real
Structured Streaming SOURCE — offsets are manifest versions (Spark's own
offset log is the cursor), micro-batches are data-change deltas, and
maintenance rewrites never re-deliver. The integration the directory-
listing file source cannot provide (it would re-consume every fold)."""

import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.sources.sinks import (
    compact_manifested,
    write_manifested,
)
from aeon_sleap_processing_spark.streaming.cdc_source import (
    ManifestCDCDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ManifestCDCDataSource)
    return spark


# every _drain-based test runs twice: once on the plain-os local fast
# path and once FORCED through pyarrow.fs (LocalFileSystem via file://
# URI) — the same code path an s3://... root takes, so the object-store
# I/O abstraction is proven by the whole suite, not asserted
IOS = ["auto", "pyarrow"]


def _drain(spark, store, checkpoint, sink: list, io="auto"):
    q = (
        spark.readStream.format("manifest_cdc")
        .option("io", io)
        .load(store)
        .writeStream.foreachBatch(
            lambda df, bid: sink.extend(
                tuple(r) for r in df.collect()
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


class TestManifestCDCSource:
    @pytest.mark.parametrize("io", IOS)
    def test_initial_snapshot_then_increments(
        self, registered, tmp_path, io
    ):
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        write_manifested(spark, spark.range(0, 10), store)
        got: list = []
        _drain(spark, store, ckpt, got, io)
        assert sorted(x[0] for x in got) == list(range(10))
        # restart with the SAME checkpoint: only the new append arrives
        write_manifested(spark, spark.range(10, 15), store)
        _drain(spark, store, ckpt, got, io)
        assert sorted(x[0] for x in got) == list(range(15))

    @pytest.mark.parametrize("io", IOS)
    def test_compaction_invisible_to_stream(self, registered, tmp_path, io):
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        for i in range(4):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), store)
        got: list = []
        _drain(spark, store, ckpt, got, io)
        assert len(got) == 20
        assert compact_manifested(spark, store, min_files_to_compact=2)[
            "compacted"
        ]
        _drain(spark, store, ckpt, got, io)
        assert len(got) == 20, "a fold must not re-deliver rows"
        write_manifested(spark, spark.range(100, 103), store)
        _drain(spark, store, ckpt, got, io)
        assert sorted(x[0] for x in got) == list(range(20)) + [100, 101, 102]

    def test_partition_columns_recovered(self, registered, tmp_path):
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        df = spark.range(0, 12).withColumn("p", F.pmod("id", F.lit(3)))
        write_manifested(spark, df, store, partition_by=["p"])
        rows: list = []
        q = (
            spark.readStream.format("manifest_cdc")
            .load(store)
            .writeStream.foreachBatch(
                lambda d, b: rows.extend(
                    (r["id"], r["p"]) for r in d.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(rows) == [(i, i % 3) for i in range(12)]

    def test_streaming_agg_on_top(self, registered, tmp_path):
        """The point of being a REAL source: Spark aggregations compose on
        top of the CDC feed."""
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        df = spark.range(0, 30).withColumn("k", F.pmod("id", F.lit(3)))
        write_manifested(spark, df, store, partition_by=["k"])
        out: dict = {}

        def sink(d, bid):
            for r in d.collect():
                out[r["k"]] = r["n"]

        q = (
            spark.readStream.format("manifest_cdc")
            .load(store)
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert out == {0: 10, 1: 10, 2: 10}

    def test_watermarked_window_agg_across_restarts(
        self, registered, tmp_path
    ):
        """Watermarks + event-time windows compose on the CDC feed and
        their state survives restarts (the offset log + state store both
        live in the checkpoint): window w1 only EMITS (append mode) once
        a later append pushes the watermark past its end on the NEXT
        run, and a row arriving behind the watermark is dropped — w1
        stays at its on-time count."""
        from datetime import datetime

        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")

        def rows(*secs):
            return spark.createDataFrame(
                [(s, datetime(2024, 1, 1, 0, 0, 0)
                  .replace(minute=s // 60, second=s % 60)) for s in secs],
                "id long, ts timestamp",
            )

        emitted: dict = {}

        def run_stream():
            q = (
                spark.readStream.format("manifest_cdc")
                .load(store)
                .withWatermark("ts", "10 seconds")
                .groupBy(F.window("ts", "1 minute").alias("w"))
                .agg(F.count("*").alias("n"))
                .writeStream.foreachBatch(
                    lambda d, bid: emitted.update(
                        {r["w"].start.second + 60 * r["w"].start.minute:
                         r["n"] for r in d.collect()}
                    )
                )
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # each availableNow run = one micro-batch; the restored watermark
        # lags the data by a batch or two (it is computed from PRIOR
        # batches and round-trips through the checkpoint), so the test
        # pins INVARIANTS, not per-run emission timing: windows emit
        # exactly once across restarts, and a row arriving well behind
        # the watermark is dropped rather than re-opening its window
        write_manifested(spark, rows(5, 20, 40), store)   # w0: 3 rows
        run_stream()
        assert emitted == {}  # watermark cannot have passed w0 yet
        write_manifested(spark, rows(90, 105), store)     # w60: 2 rows
        run_stream()
        write_manifested(spark, rows(180), store)         # w120: 1 row
        run_stream()
        # 50 is now far behind any restored watermark (>= 01:35): dropped
        write_manifested(spark, rows(240, 50), store)
        run_stream()
        write_manifested(spark, rows(360), store)
        run_stream()
        assert emitted[0] == 3    # late row never re-opened/inflated w0
        assert emitted[60] == 2
        # deeper windows close as the (lagging) watermark reaches them
        assert emitted.get(120) in (None, 1)
        assert set(emitted) <= {0, 60, 120, 240}

    @pytest.mark.parametrize("io", IOS)
    def test_escaped_and_null_partition_values_decoded(
        self, registered, tmp_path, io
    ):
        """The python source must decode Hive dir segments exactly like
        the JVM reader: %-escapes un-escaped (p=c%2Fd -> 'c/d') and
        __HIVE_DEFAULT_PARTITION__ -> NULL (typed, not a null-type
        column)."""
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        df = spark.createDataFrame(
            [(1, "a b"), (2, "c/d"), (3, None), (4, "50%")],
            "id long, p string",
        )
        write_manifested(spark, df, store, partition_by=["p"])
        out = []
        q = (
            spark.readStream.format("manifest_cdc")
            .option("io", io)
            .load(store)
            .writeStream.foreachBatch(
                lambda d, b: out.extend((r.id, r.p) for r in d.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(out) == [
            (1, "a b"), (2, "c/d"), (3, None), (4, "50%")
        ]

    def test_schema_evolved_store_streams_union_schema(
        self, registered, tmp_path
    ):
        """The log records the running-union schema on every commit
        (late r11), so the stream source sees evolved columns no matter
        which file's footer it would have probed: rows from pre-
        evolution files read NULL (add-column semantics), and the union
        survives a compaction between producer and consumer."""
        from aeon_sleap_processing_spark.sources.sinks import (
            compact_manifested,
        )

        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        write_manifested(
            spark, spark.createDataFrame([(1,)], "id long"), store,
            filename_prefix="a-",
        )
        write_manifested(
            spark,
            spark.createDataFrame([(2, "x")], "id long, extra string"),
            store, filename_prefix="b-",
        )
        compact_manifested(spark, store, min_files_to_compact=1)
        out = []
        q = (
            spark.readStream.format("manifest_cdc")
            .load(store)
            .writeStream.foreachBatch(
                lambda d, b: out.extend(sorted(map(tuple, d.collect())))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(out) == [(1, None), (2, "x")]


class TestSliceAndContract:
    def test_prefixes_option_slices_the_stream(self, registered, tmp_path):
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        df = spark.range(0, 20).withColumn("p", F.pmod("id", F.lit(2)))
        write_manifested(spark, df, store, partition_by=["p"])
        rows: list = []
        q = (
            spark.readStream.format("manifest_cdc")
            .option("prefixes", "p=1/")
            .load(store)
            .writeStream.foreachBatch(
                lambda d, b: rows.extend(r["id"] for r in d.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(rows) == list(range(1, 20, 2))

    @pytest.mark.parametrize("io", IOS)
    def test_mirror_matches_jvm_reader(self, spark, tmp_path, io):
        """DIFFERENTIAL contract test: the source's pure-Python log mirror
        must deliver exactly the file sets read_manifested_changes (JVM
        Hadoop I/O) delivers, for every cursor, across appends, a
        partition overwrite, a TTL sweep, a compaction, and DML."""
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.sinks import (
            delete_manifested,
            read_manifested_changes,
            retention_sweep_manifested,
        )
        from aeon_sleap_processing_spark.streaming.cdc_source import (
            _ManifestLogMirror,
        )

        store = str(tmp_path / "store")

        def chunked(lo, hi, c):
            return (
                spark.range(lo, hi)
                .withColumn("chunk", F.lit(c))
                .withColumn("v", F.lit("a"))
            )

        write_manifested(spark, chunked(0, 5, "01"), store,
                         partition_by=["chunk"])
        write_manifested(spark, chunked(5, 10, "02"), store,
                         partition_by=["chunk"])
        write_manifested(spark, chunked(100, 105, "02"), store,
                         partition_by=["chunk"], replace="partitions")
        retention_sweep_manifested(spark, store, "chunk", "02")
        write_manifested(spark, chunked(200, 210, "03"), store,
                         partition_by=["chunk"])
        compact_manifested(spark, store, min_files_to_compact=1)
        delete_manifested(spark, store, "id = 205")
        mirror = _ManifestLogMirror(store, io)
        head = mirror.head_version()
        for since in range(-1, head + 1):
            expect_paths = None
            try:
                df, until = read_manifested_changes(
                    spark, store, since_version=since
                )
                expect_paths = (
                    sorted(
                        f.split(store + "/")[-1] for f in df.inputFiles()
                    )
                    if df is not None else []
                )
            except Exception:
                pass  # expired cursors raise on both sides or neither
            if expect_paths is None:
                continue
            got = sorted(mirror.changed_files(since, head))
            assert got == expect_paths, (since, got, expect_paths)


class TestFileSourceNegativeControl:
    def test_directory_listing_source_double_reads_after_fold(
        self, registered, tmp_path
    ):
        """The failure mode manifest_cdc exists to fix, pinned as a
        negative control: Spark's directory-listing file source over the
        SAME store re-consumes a compaction's output files (it cannot see
        dataChange=false), delivering duplicates."""
        spark = registered
        store = str(tmp_path / "store")
        for i in range(4):
            write_manifested(spark, spark.range(i * 5, i * 5 + 5), store)
        schema = "id long"
        got: list = []

        def drain_listing(ckpt_name):
            q = (
                spark.readStream.schema(schema)
                .parquet(store)
                .writeStream.foreachBatch(
                    lambda d, b: got.extend(r.id for r in d.collect())
                )
                .option(
                    "checkpointLocation", str(tmp_path / ckpt_name)
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        drain_listing("ckpt")
        assert sorted(got) == list(range(20))
        compact_manifested(spark, store, min_files_to_compact=2)
        drain_listing("ckpt")
        assert len(got) > 20, (
            "expected the file source to double-read the fold output — "
            "if this starts passing with len==20, the caveat in "
            "watch_chunk_store's docstring is stale"
        )
        # the manifest_cdc source on the same post-fold store: exactly once
        cdc: list = []
        q = (
            spark.readStream.format("manifest_cdc")
            .load(store)
            .writeStream.foreachBatch(
                lambda d, b: cdc.extend(r.id for r in d.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_cdc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(cdc) == list(range(20))


class TestSpecialCharRoot:
    @pytest.mark.parametrize("io", IOS)
    def test_store_root_with_space_and_percent(
        self, registered, tmp_path, io
    ):
        """A root with a space and '%' streams on both I/O paths — the
        forced-pyarrow half constructs LocalFileSystem directly (from_uri
        would reject the unencoded chars)."""
        spark = registered
        store = str(tmp_path / "ro ot %x")
        ckpt = str(tmp_path / "ckpt")
        write_manifested(spark, spark.range(0, 5), store)
        got: list = []
        _drain(spark, store, ckpt, got, io)
        assert sorted(x[0] for x in got) == list(range(5))


class TestSchemeBearingRoot:
    def test_executors_resolve_the_original_uri(
        self, registered, tmp_path
    ):
        """The r12 ADVICE high finding: io='mock' resolves ONLY while
        the 'mock://' scheme is attached (see _IO), so this drain fails
        unless the ORIGINAL load() URI — not the from_uri-stripped
        resolved root — reaches the executors' read(). This is the
        driver→executor hop every s3://... root takes."""
        spark = registered
        local = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        write_manifested(spark, spark.range(0, 12), local)
        got: list = []
        _drain(spark, f"mock://{local}", ckpt, got, io="mock")
        assert sorted(x[0] for x in got) == list(range(12))
        # increments flow through the same scheme-bearing cursor
        write_manifested(spark, spark.range(12, 15), local)
        _drain(spark, f"mock://{local}", ckpt, got, io="mock")
        assert sorted(x[0] for x in got) == list(range(15))

    def test_mock_io_rejects_scheme_stripped_roots(self, tmp_path):
        """The seam the mock scheme exists for: a resolved (scheme-less)
        root must raise, never fall back to reading a local path."""
        from aeon_sleap_processing_spark.streaming.cdc_source import _IO

        with pytest.raises(ValueError, match="scheme-bearing"):
            _IO(str(tmp_path / "store"), io="mock")


class TestStartingVersion:
    def test_starting_version_skips_the_snapshot(
        self, registered, tmp_path
    ):
        """option('starting_version', N) — Delta's startingVersion with
        Delta's INCLUSIVE convention: a fresh consumer begins WITH
        version N's own changes (so N=1 here delivers v1's rows but not
        v0's snapshot); the checkpoint owns the cursor from then on. A
        consumer porting a Delta pipeline must not silently lose
        commit N (the r12 ADVICE exclusive-semantics finding)."""
        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        write_manifested(spark, spark.range(0, 10), store)   # v0
        write_manifested(spark, spark.range(10, 15), store)  # v1
        got: list = []
        q = (
            spark.readStream.format("manifest_cdc")
            .option("starting_version", "1")
            .load(store)
            .writeStream.foreachBatch(
                lambda d, b: got.extend(r.id for r in d.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(got) == list(range(10, 15))
        # subsequent appends flow through the persisted cursor
        write_manifested(spark, spark.range(15, 18), store)
        _drain(spark, store, ckpt, got)
        assert sorted(x if isinstance(x, int) else x[0] for x in got) == \
            list(range(10, 18))


class TestPartitionTypesFromLog:
    @pytest.mark.parametrize("io", IOS)
    def test_mixed_digit_string_partition_and_null_head(
        self, registered, tmp_path, io
    ):
        """The r11 gap, closed: partition types come from the LOG (the
        writer's schema rides every commit), not from probing one file's
        dir segments. A store whose string partition value is all-digit
        in the probed file ("12") but not elsewhere ("east"), with an
        all-NULL-partition file sorting FIRST (the probe's worst case),
        must read p as STRING through both the JVM reader and the
        stream source."""
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested,
        )

        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        df = spark.createDataFrame(
            [(1, None), (2, "12"), (3, "east")], "id long, p string"
        )
        write_manifested(spark, df, store, partition_by=["p"])
        jvm = read_manifested(spark, store)
        assert dict(jvm.dtypes)["p"] == "string"
        assert sorted(
            (r.id, r.p) for r in jvm.collect()
        ) == [(1, None), (2, "12"), (3, "east")]
        # slice down to the all-digit partition: Spark's dir-name
        # re-inference would type it bigint; the log keeps it string
        sliced = read_manifested(spark, store, prefixes=["p=12/"])
        assert dict(sliced.dtypes)["p"] == "string"
        assert [(r.id, r.p) for r in sliced.collect()] == [(2, "12")]
        out: list = []
        _drain(spark, store, ckpt, out, io)
        assert sorted(out) == [(1, None), (2, "12"), (3, "east")]

    @pytest.mark.parametrize("io", IOS)
    def test_non_long_partition_types_cast_generically(
        self, registered, tmp_path, io
    ):
        """int/double/date/timestamp partition columns: the dir value is
        a string the source must cast to the recorded type (Arrow's own
        parser), not an int(v)-or-crash ladder."""
        import datetime

        spark = registered
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        row = (
            1, 7, 2.5, datetime.date(2024, 3, 1),
            datetime.datetime(2024, 3, 1, 12, 30, 0),
        )
        df = spark.createDataFrame(
            [row],
            "id long, pi int, pd double, pdt date, pts timestamp",
        )
        write_manifested(
            spark, df, store, partition_by=["pi", "pd", "pdt", "pts"]
        )
        out: list = []
        _drain(spark, store, ckpt, out, io)
        assert out == [row]
        from aeon_sleap_processing_spark.sources.sinks import (
            read_manifested,
        )

        jvm = read_manifested(spark, store)
        assert dict(jvm.dtypes) == {
            "id": "bigint", "pi": "int", "pd": "double",
            "pdt": "date", "pts": "timestamp",
        }
        assert [tuple(r) for r in jvm.collect()] == [row]


class TestCdcIntoSemanticDedup:
    def test_corpus_store_cdc_feeds_semantic_dedup(
        self, registered, tmp_path
    ):
        """End-to-end composition: a manifest CORPUS store's CDC feed
        drives the streaming semantic dedup — appends flow, a compaction
        between appends re-delivers nothing into the rep store, and the
        greedy keep/drop contract holds across micro-batches."""
        import numpy as np
        import pandas as pd

        from aeon_sleap_processing_spark.streaming.watch import (
            read_semantic_reps,
            stream_semantic_dedup,
        )

        spark = registered
        DIM = 8
        planes = np.random.default_rng(3).standard_normal((12, DIM)).tolist()

        def vec(axis, scale=1.0):
            v = [0.0] * DIM
            v[axis] = scale
            return v

        corpus = str(tmp_path / "corpus")
        out = str(tmp_path / "dedup")
        ckpt = str(tmp_path / "ckpt")

        def append(ids, vecs):
            pdf = pd.DataFrame({"vec_id": ids, "embedding": vecs})
            write_manifested(spark, spark.createDataFrame(pdf), corpus)

        def run():
            stream = (
                spark.readStream.format("manifest_cdc").load(corpus)
                .select("vec_id", "embedding")
            )
            q = stream_semantic_dedup(
                stream, out, ckpt, planes, threshold=0.95, n_tables=3,
                store_partitions=0,
            )
            q.awaitTermination(180)

        append([1, 2, 3], [vec(0), vec(1), vec(0, 2.0)])
        run()
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1, 2]
        # maintenance on the SOURCE between drains: invisible downstream
        compact_manifested(spark, corpus, min_files_to_compact=1)
        run()
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1, 2]
        # a later append dedups against the standing reps
        append([4, 5], [vec(0, 3.0), vec(2)])
        run()
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1, 2, 5]
