"""Streaming dedup (dropDuplicatesWithinWatermark) and stream-static enrichment."""

import pandas as pd

from aeon_sleap_processing_spark.streaming.watch import stream_dedup, stream_enrich

T0 = pd.Timestamp("2024-05-01 00:00:00")


class TestStreamDedup:
    def test_replayed_rows_dropped_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "dedup_src")
        # batch 1: events 1,2,3; batch 2 (separate file): replay of 2,3 + new 4.
        # File-source streams process per-file, so the replay arrives in a
        # later micro-batch — exactly the at-least-once redelivery shape.
        b1 = pd.DataFrame(
            {
                "time": [T0, T0 + pd.Timedelta(minutes=1), T0 + pd.Timedelta(minutes=2)],
                "event_id": [1, 2, 3],
            }
        )
        b2 = pd.DataFrame(
            {
                "time": [
                    T0 + pd.Timedelta(minutes=1),
                    T0 + pd.Timedelta(minutes=2),
                    T0 + pd.Timedelta(minutes=3),
                ],
                "event_id": [2, 3, 4],
            }
        )
        spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("time timestamp, event_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        deduped = stream_dedup(stream, ["event_id"], watermark="1 hour")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT event_id FROM dedup_out").toPandas()
        assert sorted(got.event_id) == [1, 2, 3, 4]

    def test_batch_parity(self, spark):
        # the same operator applied to a batch frame degrades to dropDuplicates
        pdf = pd.DataFrame(
            {"time": [T0, T0, T0 + pd.Timedelta(minutes=1)], "event_id": [1, 1, 2]}
        )
        df = spark.createDataFrame(pdf)
        assert df.dropDuplicates(["event_id"]).count() == 2


class TestStreamEnrich:
    def test_dim_join_per_microbatch(self, spark, tmp_path):
        src = str(tmp_path / "enrich_src")
        pdf = pd.DataFrame(
            {
                "time": [T0, T0 + pd.Timedelta(minutes=1)],
                "user_id": [7, 9],
            }
        )
        spark.createDataFrame(pdf).write.parquet(src)
        dim = spark.createDataFrame(
            pd.DataFrame({"user_id": [7, 8], "segment": ["a", "b"]})
        )
        stream = spark.readStream.schema("time timestamp, user_id long").parquet(src)
        enriched = stream_enrich(stream, dim, "user_id", "left")
        q = (
            enriched.writeStream.format("memory")
            .queryName("enrich_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM enrich_out").toPandas().sort_values("user_id")
        assert list(got.user_id) == [7, 9]
        assert list(got.segment.fillna("?")) == ["a", "?"]


class TestStreamAsofEnrich:
    def test_matches_batch_asof(self, spark, tmp_path):
        from aeon_sleap_processing_spark.operators.temporal import asof_join
        from aeon_sleap_processing_spark.streaming.watch import stream_asof_enrich

        src = str(tmp_path / "asof_src")
        rows = pd.DataFrame(
            {
                "time": [T0 + pd.Timedelta(seconds=s) for s in (5, 25, 45, 65)],
                "event_id": [1, 2, 3, 4],
            }
        )
        # two files -> two micro-batches
        spark.createDataFrame(rows.iloc[:2]).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(rows.iloc[2:]).coalesce(1).write.mode("append").parquet(src)

        static = spark.createDataFrame(
            pd.DataFrame(
                {
                    "time": [T0, T0 + pd.Timedelta(seconds=30), T0 + pd.Timedelta(seconds=60)],
                    "state": ["a", "b", "c"],
                }
            )
        )
        collected = []
        stream = (
            spark.readStream.schema("time timestamp, event_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        writer = stream_asof_enrich(
            stream,
            static,
            lambda df, _id: collected.extend(df.toPandas().to_dict("records")),
            on="time",
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)

        got = (
            pd.DataFrame(collected).sort_values("event_id").reset_index(drop=True)
        )
        exp = (
            asof_join(spark.createDataFrame(rows), static, on="time")
            .orderBy("event_id")
            .toPandas()
        )
        assert got.state.tolist() == exp.state.tolist() == ["a", "a", "b", "c"]


class TestStreamDedupRestart:
    """Dedup state must survive checkpoint restarts: keys first seen in an
    earlier run are still dropped after the query is stopped and restarted
    from the same checkpoint (3 run cycles, mirroring the stateful
    sessionize restart rigor)."""

    def _run(self, spark, src, ckpt, name):
        stream = (
            spark.readStream.schema("time timestamp, event_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rows: list = []
        q = (
            stream_dedup(stream, ["event_id"], watermark="1 hour")
            .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.event_id for r in rows)

    def test_seen_keys_survive_three_restarts(self, spark, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")

        def drop(ids, minutes, part):
            pdf = pd.DataFrame(
                {"time": [T0 + pd.Timedelta(minutes=m) for m in minutes],
                 "event_id": ids}
            )
            spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{src}/batch={part}")

        # run 1: fresh keys
        drop([1, 2, 3], [0, 1, 2], 1)
        assert self._run(spark, src, ckpt, "r1") == [1, 2, 3]

        # run 2 (restart): at-least-once redelivery of 2,3 + new 4 — the
        # replayed keys were first seen in run 1, so only 4 emits
        drop([2, 3, 4], [1, 2, 3], 2)
        assert self._run(spark, src, ckpt, "r2") == [4]

        # run 3 (restart): full replay of everything + new 5
        drop([1, 2, 3, 4, 5], [0, 1, 2, 3, 4], 3)
        assert self._run(spark, src, ckpt, "r3") == [5]


class TestStreamAsofEnrichRestart:
    """foreachBatch as-of enrichment across checkpoint restarts: each run
    processes only files the checkpoint has not seen, and the static side is
    re-resolved per run — a changed reference table applies to new batches
    only (slowly-changing-dimension behavior)."""

    def test_checkpoint_resume_and_static_refresh(self, spark, tmp_path):
        from aeon_sleap_processing_spark.operators.temporal import asof_join
        from aeon_sleap_processing_spark.streaming.watch import stream_asof_enrich

        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")

        def drop(seconds, ids, part):
            pdf = pd.DataFrame(
                {"time": [T0 + pd.Timedelta(seconds=s) for s in seconds],
                 "event_id": ids}
            )
            spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{src}/batch={part}")

        def run(static):
            collected: list = []
            stream = (
                spark.readStream.schema("time timestamp, event_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            writer = stream_asof_enrich(
                stream,
                static,
                lambda df, _id: collected.extend(df.collect()),
                on="time",
            )
            q = writer.option("checkpointLocation", ckpt).trigger(availableNow=True).start()
            q.awaitTermination(120)
            return pd.DataFrame([r.asDict() for r in collected])

        static1 = spark.createDataFrame(
            pd.DataFrame(
                {"time": [T0, T0 + pd.Timedelta(seconds=30)], "state": ["a", "b"]}
            )
        )
        # run 1: two events
        drop([5, 45], [1, 2], 1)
        got1 = run(static1)
        assert sorted(got1.event_id) == [1, 2]
        assert got1.sort_values("event_id").state.tolist() == ["a", "b"]

        # run 2 (restart): only the NEW file is processed — no reprocessing
        drop([65], [3], 2)
        got2 = run(static1)
        assert got2.event_id.tolist() == [3]

        # run 3 (restart): static snapshot changed — new batches enrich
        # against the refreshed table, old outputs untouched
        static2 = spark.createDataFrame(
            pd.DataFrame(
                {"time": [T0, T0 + pd.Timedelta(seconds=60)], "state": ["a", "c"]}
            )
        )
        drop([70], [4], 3)
        got3 = run(static2)
        assert got3.event_id.tolist() == [4]
        assert got3.state.tolist() == ["c"]
        exp = asof_join(
            spark.createDataFrame(
                pd.DataFrame({"time": [T0 + pd.Timedelta(seconds=70)], "event_id": [4]})
            ),
            static2,
            on="time",
        ).toPandas()
        assert exp.state.tolist() == ["c"]
