"""HARP codec round-trip, chunk store pruning, and streaming watch tests."""

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.sources.chunked import (
    list_chunks,
    load_chunked,
    write_chunked,
)
from aeon_sleap_processing_spark.sources.harp import (
    decode_harp_bytes,
    encode_harp_messages,
    read_harp,
)
from aeon_sleap_processing_spark.streaming.watch import watch_chunk_store

T0 = pd.Timestamp("2024-03-01 10:00:00")


class TestHarpCodec:
    def test_round_trip(self, tmp_path, spark):
        times = pd.Series([T0 + pd.Timedelta(milliseconds=20 * i) for i in range(5)])
        payloads = [np.array([i, i + 0.5, 0.9], dtype="<f4").tobytes() for i in range(5)]
        raw = encode_harp_messages(times, payloads, address=222)
        dec = decode_harp_bytes(raw)
        assert len(dec) == 5
        assert (dec.address == 222).all()
        assert (dec.msg_type == 2).all()
        np.testing.assert_allclose(dec.vector.iloc[2], [2.0, 2.5, 0.9])
        # timestamps at 32 µs resolution
        deltas = (dec.time - times).abs()
        assert (deltas <= pd.Timedelta(microseconds=32)).all()

        # distributed read path
        p = tmp_path / "CameraTop_222_2024-03-01T10-00-00.bin"
        p.write_bytes(raw)
        df = read_harp(spark, str(tmp_path)).toPandas()
        assert len(df) == 5
        assert (df.address == 222).all()

    def test_truncated_tail_ignored(self):
        times = pd.Series([T0])
        raw = encode_harp_messages(times, [b"\x00\x00\x00\x00"], address=200)
        dec = decode_harp_bytes(raw + b"\x02\x10\x01")  # truncated junk tail
        assert len(dec) == 1


class TestChunkStore:
    @pytest.fixture(scope="class")
    def store(self, tmp_path_factory, spark):
        root = str(tmp_path_factory.mktemp("store"))
        pdf = pd.DataFrame(
            {
                "time": [T0 + pd.Timedelta(minutes=m) for m in range(0, 180, 10)],
                "x": np.arange(18, dtype=float),
            }
        )
        write_chunked(spark.createDataFrame(pdf), root, "CameraTop", 200)
        return root

    def test_pruned_load(self, spark, store):
        df = load_chunked(
            spark, store, 200, "CameraTop",
            start=T0 + pd.Timedelta(minutes=60), end=T0 + pd.Timedelta(minutes=119),
        )
        got = df.toPandas()
        assert len(got) == 6  # minutes 60..110
        # partition pruning visible in the physical plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "chunk" in plan

    def test_list_chunks(self, spark, store):
        chunks = list_chunks(spark, store, 200, "CameraTop")
        assert chunks == [
            "2024-03-01T10-00-00",
            "2024-03-01T11-00-00",
            "2024-03-01T12-00-00",
        ]

    def test_idempotent_rewrite(self, spark, store):
        # dynamic overwrite of one chunk leaves the others intact
        pdf = pd.DataFrame({"time": [T0 + pd.Timedelta(minutes=5)], "x": [99.0]})
        write_chunked(spark.createDataFrame(pdf), store, "CameraTop", 200)
        got = load_chunked(spark, store, 200, "CameraTop").toPandas()
        assert len(got) == 1 + 12  # chunk 10:00 replaced (1 row), 11:00+12:00 intact
        assert 99.0 in set(got.x)


class TestStreamingWatch:
    def test_available_now_processes_new_chunks(self, tmp_path, spark):
        root = str(tmp_path / "stream_store")
        ckpt = str(tmp_path / "ckpt")
        pdf1 = pd.DataFrame({"time": [T0], "x": [1.0]})
        write_chunked(spark.createDataFrame(pdf1), root, "CameraTop", 200)

        seen: list[int] = []

        def on_batch(df, batch_id):
            seen.append(df.count())

        schema = "time timestamp, x double, stream int, camera string, chunk string"
        from pyspark.sql.types import _parse_datatype_string

        q = watch_chunk_store(
            spark, root, _parse_datatype_string(schema), on_batch, ckpt,
            register=200, camera="CameraTop",
        )
        q.awaitTermination(60)
        assert sum(seen) == 1

        # a new chunk lands; a second availableNow pass picks up ONLY the new file
        pdf2 = pd.DataFrame({"time": [T0 + pd.Timedelta(hours=5)], "x": [2.0]})
        write_chunked(spark.createDataFrame(pdf2), root, "CameraTop", 200, mode="append")
        seen.clear()
        q2 = watch_chunk_store(
            spark, root, _parse_datatype_string(schema), on_batch, ckpt,
            register=200, camera="CameraTop",
        )
        q2.awaitTermination(60)
        assert sum(seen) == 1  # checkpoint = durable processed-set


class TestOrcChunkStore:
    def test_orc_round_trip_with_pruning(self, spark, tmp_path):
        """The chunk store is format-agnostic columnar: ORC round-trips with
        the same partition pruning and pushed time filters as parquet."""
        import pandas as pd
        from pyspark.sql import functions as F

        from aeon_sleap_processing_spark.sources.chunked import load_chunked, write_chunked

        t0 = pd.Timestamp("2024-01-01 00:00:00")
        pdf = pd.DataFrame(
            {
                "time": [t0 + pd.Timedelta(minutes=20 * i) for i in range(9)],  # 3 chunks
                "v": range(9),
            }
        )
        root = str(tmp_path / "orc_store")
        write_chunked(
            spark.createDataFrame(pdf), root, "CameraTop", 202, file_format="orc"
        )
        got = load_chunked(
            spark,
            root,
            202,
            "CameraTop",
            start=t0 + pd.Timedelta(hours=1),
            end=t0 + pd.Timedelta(hours=2),
            file_format="orc",
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        vals = sorted(r["v"] for r in got.select("v").collect())
        assert vals == [3, 4, 5, 6]  # rows in [1h, 2h]

    def test_bad_format_rejected(self, spark):
        import pandas as pd
        import pytest

        from aeon_sleap_processing_spark.sources.chunked import write_chunked

        df = spark.createDataFrame(pd.DataFrame({"time": [pd.Timestamp("2024-01-01")], "v": [1]}))
        with pytest.raises(ValueError, match="unsupported"):
            write_chunked(df, "/tmp/x", "CameraTop", 202, file_format="avro")


class TestChunkStoreManifestContention:
    """r11 done-criterion: interleaved writer + compactor + reader on the
    CHUNK store itself (not just the standalone manifest store) — zero
    loss, zero double-reads, snapshot-isolated reads."""

    def test_concurrent_chunk_writers_compose(self, spark, tmp_path):
        """4 threads each writing a DIFFERENT hour chunk of the same
        camera, racing a compactor: every row lands exactly once."""
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            list_chunks, load_chunked, write_chunked,
        )
        from aeon_sleap_processing_spark.sources.sinks import (
            compact_manifested, is_manifested,
        )

        root = str(tmp_path / "store")

        def write_hour(h):
            pdf = pd.DataFrame({
                "time": pd.date_range(
                    f"2024-03-01 {h:02d}:00", periods=50, freq="10s"
                ),
                "v": range(h * 1000, h * 1000 + 50),
            })
            write_chunked(
                spark.createDataFrame(pdf), root, "CameraTop", 200
            )

        with ThreadPoolExecutor(4) as ex:
            list(ex.map(write_hour, range(4)))
            fut = ex.submit(compact_manifested, spark, root, 1 << 20, 2)
            fut.result()
        assert is_manifested(spark, root)
        got = load_chunked(spark, root, 200, "CameraTop").toPandas()
        assert sorted(got["v"]) == sorted(
            v for h in range(4) for v in range(h * 1000, h * 1000 + 50)
        )
        assert list_chunks(spark, root, 200, "CameraTop") == [
            f"2024-03-01T{h:02d}-00-00" for h in range(4)
        ]

    def test_chunk_replace_races_compactor_last_writer_wins(
        self, spark, tmp_path
    ):
        """A chunk REWRITE landing inside the compactor's stage→commit
        window: the compactor's CAS rebuild must not resurrect the
        replaced files — the rewrite's rows win, exactly once."""
        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            load_chunked, write_chunked,
        )
        from aeon_sleap_processing_spark.sources.sinks import (
            compact_manifested,
        )

        root = str(tmp_path / "store")

        def mk(v0):
            return spark.createDataFrame(pd.DataFrame({
                "time": pd.date_range("2024-03-01 10:00", periods=40, freq="10s"),
                "v": range(v0, v0 + 40),
            }))

        # several small appends into ONE chunk -> compactable leaf
        write_chunked(mk(0), root, "CameraTop", 200)
        write_chunked(mk(100), root, "CameraTop", 200, mode="append")
        write_chunked(mk(200), root, "CameraTop", 200, mode="append")

        def racing_replace():
            write_chunked(mk(9000), root, "CameraTop", 200)  # overwrite chunk

        res = compact_manifested(
            spark, root, target_bytes=1 << 20, min_files_to_compact=2,
            _before_commit=racing_replace,
        )
        # the replace invalidated the compactor's read snapshot: rewrite
        # validation must ABORT the fold (conflict), never commit staged
        # output that would resurrect the replaced chunk's old rows
        assert res.get("conflict") is True and not res["compacted"], res
        got = load_chunked(spark, root, 200, "CameraTop").toPandas()
        assert sorted(got["v"]) == list(range(9000, 9040)), (
            "stale fold resurrected replaced rows"
        )

    def test_same_chunk_replace_race_no_mixing(self, spark, tmp_path):
        """Two threads overwriting the SAME chunk concurrently: the CAS
        prefix-drop is re-evaluated on every rebuild, so the final head
        must be exactly ONE writer's complete file set — never a mix of
        the two, never a union."""
        from concurrent.futures import ThreadPoolExecutor

        import pandas as pd

        from aeon_sleap_processing_spark.sources.chunked import (
            load_chunked, write_chunked,
        )

        root = str(tmp_path / "store")

        def replace(v0):
            pdf = pd.DataFrame({
                "time": pd.date_range("2024-03-01 10:00", periods=30, freq="30s"),
                "v": range(v0, v0 + 30),
            })
            # two files per write so a torn mix would be detectable
            write_chunked(
                spark.createDataFrame(pdf).repartition(2), root,
                "CameraTop", 200,
            )

        for trial in range(3):
            with ThreadPoolExecutor(2) as ex:
                list(ex.map(replace, [1000 * (trial + 1), 5000 * (trial + 1)]))
            got = sorted(
                load_chunked(spark, root, 200, "CameraTop").toPandas()["v"]
            )
            a = list(range(1000 * (trial + 1), 1000 * (trial + 1) + 30))
            b = list(range(5000 * (trial + 1), 5000 * (trial + 1) + 30))
            assert got == a or got == b, (trial, got[:5], got[-5:], len(got))
