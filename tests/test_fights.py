"""Golden-output test for the fight-detection pipeline."""

import pandas as pd
import pytest

from aeon_sleap_processing_spark.plans.fights import blob_speed, detect_fights
from tests.fixture_pose import FPS, T0, fight_blob, fight_pose


class TestFightPipeline:
    def test_detects_merged_event_across_empty_bridge(self, spark):
        pose = spark.createDataFrame(fight_pose())
        blob = spark.createDataFrame(fight_blob())
        events = detect_fights(pose, blob, FPS).toPandas()
        assert len(events) == 1, f"expected one merged fight, got\n{events}"
        ev = events.iloc[0]
        assert ev.start_timestamp == T0
        assert ev.end_timestamp == T0 + pd.Timedelta(milliseconds=320 * 20)
        assert ev.duration_seconds == pytest.approx(6.4)
        # fight end = mouse midpoint at the last valid trimmed frame (319)
        assert ev.fight_end_x == pytest.approx(1075.0)
        assert ev.fight_end_y == pytest.approx(500.0)

    def test_slow_mice_rejected(self, spark):
        # same geometry but static mice → centroid speeds ~0 → no fight
        pdf = fight_pose()
        static = pdf.copy()
        static["x"] = static.groupby(["identity", "part"])["x"].transform("first")
        pose = spark.createDataFrame(static)
        blob = spark.createDataFrame(fight_blob())
        events = detect_fights(pose, blob, FPS).toPandas()
        assert len(events) == 0

    def test_blob_speed_drops_abnormal_rows(self, spark):
        bs = blob_speed(spark.createDataFrame(fight_blob()), cm2px=5.4).toPandas()
        # 341 raw rows, 1 abnormal dropped; labels keep original positions
        assert len(bs) == 340
        assert bs.frame_id.max() == 340  # labels shifted past the dropped row
        # steady-state smoothed speed ≈ 10 px / 20 ms / 5.4 ≈ 92.6 cm/s
        mid = bs[(bs.frame_id > 30) & (bs.frame_id < 300)]
        assert (mid.speed > 80).all()

    def test_pipeline_chunk_invariant(self, spark):
        """The full candidate pipeline on the chunked path (forced
        frame_chunk) must be bit-equal to the global path: chunked_ffill,
        chunked blob_speed, and both chunked sessionization phases all
        carry state across the ~14 chunk borders the fixture produces."""
        from aeon_sleap_processing_spark.plans.fights import fight_candidate_sessions

        pose = spark.createDataFrame(fight_pose())
        blob = spark.createDataFrame(fight_blob())
        glob = fight_candidate_sessions(pose, blob, FPS).orderBy("session_id").toPandas()
        chunked = (
            fight_candidate_sessions(pose, blob, FPS, frame_chunk=500)
            .orderBy("session_id")
            .toPandas()
        )
        pd.testing.assert_frame_equal(chunked, glob)

    def test_detect_fights_chunked_path(self, spark):
        """Kernel events are identical on the chunked path."""
        from aeon_sleap_processing_spark.plans.fights import detect_fights

        pose = spark.createDataFrame(fight_pose())
        blob = spark.createDataFrame(fight_blob())
        events = detect_fights(pose, blob, FPS, frame_chunk=500).toPandas()
        assert len(events) == 1
        assert events.iloc[0].duration_seconds == pytest.approx(6.4)

    @pytest.mark.parametrize("chunk", [0.25, 0.777, 2.0])
    def test_blob_speed_chunk_invariant(self, spark, chunk):
        """The chunked plan must be bit-equal to the single-chunk plan for
        any chunk size: row labels, the Δt drop filter, the lag-seeded
        speeds, and the ±(5,4) smoothing all carry state across chunk
        borders. The fixture spans ~6.8 s, so chunk=0.25 s cuts it into
        ~28 chunks with the dropped row, null rows, and smoothing windows
        straddling borders."""
        df = spark.createDataFrame(fight_blob())
        got = blob_speed(df, cm2px=5.4, chunk=chunk).orderBy("frame_id").toPandas()
        exp = blob_speed(df, cm2px=5.4, chunk=1e6).orderBy("frame_id").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))

    def test_blob_speed_chunked_with_nulls(self, spark):
        """Randomized stream: null coordinates and sub-10 ms rows planted
        directly before/after chunk borders."""
        import numpy as np

        rng = np.random.default_rng(11)
        t = np.cumsum(rng.choice([0.005, 0.02, 0.04], size=400, p=[0.1, 0.8, 0.1]))
        x = rng.uniform(0, 1000, 400)
        y = rng.uniform(0, 1000, 400)
        x[rng.uniform(0, 1, 400) < 0.15] = np.nan
        pdf = pd.DataFrame(
            {"time": [T0 + pd.Timedelta(seconds=s) for s in t], "x": x, "y": y}
        )
        pdf.loc[x != x, "y"] = np.nan
        df = spark.createDataFrame(pdf)
        got = blob_speed(df, cm2px=5.4, chunk=0.5).orderBy("frame_id").toPandas()
        exp = blob_speed(df, cm2px=5.4, chunk=1e6).orderBy("frame_id").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))
