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
