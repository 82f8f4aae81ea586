"""Streaming session-window sessionization (T3 streaming variant)."""

import time

import pandas as pd

from aeon_sleap_processing_spark.streaming.watch import (
    stream_sessionize,
    stream_sessionize_stateful,
)

T0 = pd.Timestamp("2024-05-01 00:00:00")


class TestStreamSessionize:
    def test_sessions_from_file_stream(self, spark, tmp_path):
        src = str(tmp_path / "events_src")
        # two users; user 7 has two sessions separated by > 30 min
        pdf = pd.DataFrame(
            {
                "time": [
                    T0,
                    T0 + pd.Timedelta(minutes=5),
                    T0 + pd.Timedelta(minutes=90),
                    T0 + pd.Timedelta(minutes=92),
                    T0 + pd.Timedelta(minutes=3),
                ],
                "user_id": [7, 7, 7, 7, 8],
            }
        )
        spark.createDataFrame(pdf).write.parquet(src)

        stream = spark.readStream.schema("time timestamp, user_id long").parquet(src)
        sessions = stream_sessionize(
            stream, gap="30 minutes", partition_by="user_id", watermark="0 seconds"
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sessions_out").toPandas()
        got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
        assert len(got) == 3
        u7 = got[got.user_id == 7]
        assert list(u7.n_events) == [2, 2]
        assert u7.session_start.iloc[0] == T0
        # session end = last event + gap (session_window semantics)
        assert u7.session_end.iloc[0] == T0 + pd.Timedelta(minutes=35)


class TestStreamSessionizeStateful:
    """Custom stateful operator (applyInPandasWithState): closed-session
    emission, state carried across micro-batches AND restarts (same
    checkpoint), watermark-timeout closing the final open session."""

    def _run(self, spark, src, ckpt):
        stream = spark.readStream.schema("time timestamp, user_id long").parquet(src)
        sessions = stream_sessionize_stateful(
            stream, gap=1800.0, partition_by="user_id", watermark="0 seconds"
        )
        rows: list = []
        q = (
            sessions.writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return pd.DataFrame([r.asDict() for r in rows]) if rows else pd.DataFrame(
            columns=["user_id", "session_start", "session_end", "n_events"]
        )

    def test_state_survives_restart_and_timeout_closes(self, spark, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")

        def drop(rows, part):
            pdf = pd.DataFrame(
                {"time": [T0 + pd.Timedelta(minutes=m) for m, _ in rows],
                 "user_id": [u for _, u in rows]}
            )
            spark.createDataFrame(pdf).write.parquet(f"{src}/batch={part}")

        # run 1: user 7 opens a session (2 events); user 8 opens one — no
        # session can close yet (no gap exceeded, watermark behind timeouts)
        drop([(0, 7), (5, 7), (3, 8)], 1)
        got1 = self._run(spark, src, ckpt)
        assert len(got1) == 0

        # run 2 (restart from checkpoint): user 7's new rows sit > 30 min past
        # the state carried over -> the run-1 session closes with BOTH its
        # rows, proving state survived the restart. User 8 got no new data,
        # but the watermark advanced past its last + gap, so the trailing
        # no-data micro-batch fires its event-time timeout and emits it too.
        drop([(90, 7), (92, 7)], 2)
        got2 = self._run(spark, src, ckpt)
        u7 = got2[got2.user_id == 7]
        assert len(u7) == 1
        assert u7.n_events.iloc[0] == 2
        assert u7.session_start.iloc[0] == T0
        assert u7.session_end.iloc[0] == T0 + pd.Timedelta(minutes=5)
        u8 = got2[got2.user_id == 8]
        assert len(u8) == 1
        assert u8.n_events.iloc[0] == 1
        assert u8.session_start.iloc[0] == T0 + pd.Timedelta(minutes=3)

        # run 3: an unrelated user pushes the watermark past user 7's OPEN
        # session (last 92' + 30' = 122') -> it times out on the restarted
        # query and emits
        drop([(130, 9)], 3)
        got3 = self._run(spark, src, ckpt)
        u7b = got3[got3.user_id == 7]
        assert len(u7b) == 1
        assert u7b.n_events.iloc[0] == 2
        assert u7b.session_start.iloc[0] == T0 + pd.Timedelta(minutes=90)
        assert u7b.session_end.iloc[0] == T0 + pd.Timedelta(minutes=92)

    def test_key_lagging_watermark_does_not_kill_query(self, spark, tmp_path):
        """A group whose micro-batch rows are ALL late-filtered is still
        invoked — with EMPTY input. The spurious-invocation re-arm used the
        stale state's ``last_us + gap``, which sits BELOW the watermark once
        another key pushed it ahead: INVALID_TIMEOUT_TIMESTAMP and the whole
        query died (first seen at 10M rows in
        tools/measure_stream_throughput.py, where file order != time
        order). The clamp must close the stale session via timeout
        instead of crashing."""
        import time as _time

        src = str(tmp_path / "lag_src")
        ckpt = str(tmp_path / "lag_ckpt")

        def drop(rows, part):
            pdf = pd.DataFrame(
                {"time": [T0 + pd.Timedelta(minutes=m) for m, _ in rows],
                 "user_id": [u for _, u in rows]}
            )
            # exactly ONE file per drop: with maxFilesPerTrigger=1 each
            # drop is its own micro-batch, in mtime order
            spark.createDataFrame(pdf).coalesce(1).write.parquet(
                f"{src}/batch={part}"
            )
            _time.sleep(1.1)

        # batch 1: user 2 opens a session at T0; user 1's event at T0+10h
        # pushes the watermark (0 s lag) to T0+10h for batch 2 — 9.5 h
        # past user 2's last + gap
        drop([(0, 2), (600, 1)], 1)
        # batch 2: user 2's row at T0+1min is late -> filtered -> EMPTY
        # group invocation against the stale (last=T0) state
        drop([(1, 2), (601, 1)], 2)

        stream = (
            spark.readStream.schema("time timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sessions = stream_sessionize_stateful(
            stream, gap=1800.0, partition_by="user_id", watermark="0 seconds"
        )
        rows: list = []
        q = (
            sessions.writeStream.foreachBatch(
                lambda df, _bid: rows.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # un-clamped, this raised STREAM_FAILED; False = still running
        # after 120 s, which would make the assertions below read a
        # partially-filled rows list — fail loudly instead
        assert q.awaitTermination(120)
        got = pd.DataFrame([r.asDict() for r in rows])
        u2 = got[got.user_id == 2]
        # emission SHAPE is engine-timing dependent (whether u2's pending
        # timeout fires in the same batch its late row arrives: one
        # (T0..T0+1, n=2) session, or (T0,n=1) + (T0+1,n=1)); the
        # regression property is the query SURVIVING and every u2 event
        # landing in some closed session
        assert len(u2) in (1, 2)
        assert u2.n_events.sum() == 2
        assert u2.session_start.min() == T0


class TestStreamWindowedAgg:
    def test_hopping_counts_match_batch(self, spark, tmp_path):
        from aeon_sleap_processing_spark.streaming.watch import stream_windowed_agg

        src = str(tmp_path / "win_src")
        times = [T0 + pd.Timedelta(minutes=m) for m in (0, 10, 20, 40, 70)]
        pdf = pd.DataFrame({"time": times, "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
        spark.createDataFrame(pdf).write.parquet(src)

        stream = spark.readStream.schema("time timestamp, value double").parquet(src)
        agg = stream_windowed_agg(
            stream, window="1 hour", slide="30 minutes",
            watermark="0 seconds", value_col="value",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("win_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql("SELECT * FROM win_out")
            .toPandas()
            .sort_values("window_start")
            .reset_index(drop=True)
        )
        # batch twin: explicit membership per 1h/30min hopping grid
        import collections

        expect = collections.Counter()
        sums = collections.Counter()
        for t, v in zip(times, pdf.value):
            base = int(t.timestamp()) // 1800
            for k in range(2):  # 1h window / 30min slide = 2 memberships
                ws = (base - k) * 1800
                expect[ws] += 1
                sums[ws] += v
        assert {
            int(r.window_start.timestamp()): r.n_events for r in got.itertuples()
        } == dict(expect)
        assert {
            int(r.window_start.timestamp()): r.sum_value for r in got.itertuples()
        } == dict(sums)
