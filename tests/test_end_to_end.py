"""End-to-end workflow parity test (FIXTURES.md §Sizing, medium fixture):
the full chain a reference user runs, on engine-native storage.

    HARP ingest → chunk store → pruned load → maintenance exclusion →
    tube-test detection (periodized with overlap) → CSV sink;
    plus combine output → HARP binary round trip.
"""

import glob

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.plans.maintenance import (
    exclude_maintenance_data,
    get_experiment_times,
)
from aeon_sleap_processing_spark.plans.orchestration import plan_periods, run_periodized
from aeon_sleap_processing_spark.plans.tube_test import detect_tube_tests
from aeon_sleap_processing_spark.sources.chunked import load_chunked, write_chunked
from aeon_sleap_processing_spark.sources.harp import decode_harp_bytes, encode_harp_messages
from aeon_sleap_processing_spark.sources.sinks import write_events_csv
from tests.fixture_pose import FPS, IDS, METADATA, T0, tube_test_pose


class TestEndToEnd:
    def test_full_workflow(self, spark, tmp_path):
        root = str(tmp_path / "store")

        # 1. ingest: fixture pose stream → chunk store (register 222)
        pose_pdf = tube_test_pose()
        write_chunked(spark.createDataFrame(pose_pdf), root, "CameraTop", 222)

        # 2. chunk-pruned load over the analysis range
        pose = load_chunked(
            spark, root, 222, "CameraTop", start=T0, end=T0 + pd.Timedelta(minutes=5)
        )
        assert pose.count() == len(pose_pdf)

        # 3. maintenance exclusion: scene C (flip decoy, ~20s in) falls in a
        # maintenance window — excluded before detection
        env = spark.createDataFrame(
            pd.DataFrame(
                {
                    "time": [T0, T0 + pd.Timedelta(seconds=15), T0 + pd.Timedelta(seconds=25)],
                    "state": ["Experiment", "Maintenance", "Maintenance"],
                }
            )
        )
        iv = get_experiment_times(env, T0, T0 + pd.Timedelta(minutes=5))
        filtered = exclude_maintenance_data(pose, iv)

        # 4. periodized detection with overlap (edge-safe)
        def detect(ws, we):
            sliced = filtered.where(F.col("time").between(F.lit(ws), F.lit(we)))
            return detect_tube_tests(sliced, FPS, METADATA)

        periods = plan_periods(
            T0,
            T0 + pd.Timedelta(seconds=15),
            period=pd.Timedelta(seconds=10),
            overlap=pd.Timedelta(seconds=5),
        )
        events = run_periodized(detect, periods, on_error="skip")
        got = events.toPandas()
        assert len(got) == 1
        assert got.winner_identity.iloc[0] == IDS[0]
        assert got.start_timestamp.iloc[0] == T0

        # 5. CSV sink with reference-compatible header
        out_csv = str(tmp_path / "tube_tests_csv")
        write_events_csv(events, out_csv)
        csv_file = glob.glob(f"{out_csv}/*.csv")[0]
        lines = open(csv_file).read().strip().splitlines()
        assert lines[0] == "start_timestamp,end_timestamp,winner_identity"
        assert len(lines) == 2  # header + the one event

    def test_harp_round_trip_of_stream(self, spark, tmp_path):
        """K2 byte-compat: pose coordinates → HARP write-message stream →
        decode → identical values and 32 µs-accurate timestamps."""
        pose_pdf = tube_test_pose().head(200).sort_values(["time", "identity", "part"])
        times = pose_pdf["time"].reset_index(drop=True)
        payloads = [
            np.array([r.x, r.y, r.part_likelihood], dtype="<f4").tobytes()
            for r in pose_pdf.itertuples()
        ]
        raw = encode_harp_messages(times, payloads, address=222)
        dec = decode_harp_bytes(raw)
        assert len(dec) == 200
        np.testing.assert_allclose(
            np.vstack(dec.vector.values)[:, 0], pose_pdf.x.values, rtol=1e-6
        )
        drift = (dec.time.reset_index(drop=True) - times).abs()
        assert (drift <= pd.Timedelta(microseconds=32)).all()
