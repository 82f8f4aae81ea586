"""Streaming session-window sessionization (T3 streaming variant)."""

import time

import pandas as pd

from aeon_sleap_processing_spark.streaming.watch import stream_sessionize

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
