"""Golden-output test for the tube-test pipeline (SURVEY §5 test strategy)."""

import pandas as pd
import pytest

from aeon_sleap_processing_spark.plans.tube_test import detect_tube_tests
from tests.fixture_pose import FPS, IDS, METADATA, T0, tube_test_pose


@pytest.fixture(scope="module")
def pose_df(spark):
    return spark.createDataFrame(tube_test_pose())


class TestTubeTestPipeline:
    def test_detects_planted_event_and_rejects_decoys(self, spark, pose_df):
        events = (
            detect_tube_tests(pose_df, FPS, METADATA)
            .toPandas()
            .sort_values("start_timestamp")
            .reset_index(drop=True)
        )
        # Scenes A and D detect; B and C are rejected
        assert len(events) == 2, f"expected the two planted events, got\n{events}"
        ev = events.iloc[0]
        assert ev.start_timestamp == T0
        assert ev.end_timestamp == T0 + pd.Timedelta(milliseconds=400)  # frame 20
        assert ev.winner_identity == IDS[0]
        # Scene D: identical outcome 2000 frames later — the 5-frame
        # identity-label glitch is undone by the greedy scan (keep-majority,
        # no global flip)
        ev2 = events.iloc[1]
        assert ev2.start_timestamp == T0 + pd.Timedelta(seconds=40)
        assert ev2.end_timestamp == T0 + pd.Timedelta(seconds=40, milliseconds=400)
        assert ev2.winner_identity == IDS[0]

    def test_bad_parameter_key_raises(self, spark, pose_df):
        with pytest.raises(ValueError, match="Invalid parameter key"):
            detect_tube_tests(pose_df, FPS, METADATA, parameters={"bogus": 1})

    def test_single_identity_raises(self, spark, pose_df):
        solo = pose_df.where(pose_df.identity == IDS[0])
        with pytest.raises(ValueError, match="exactly 2"):
            detect_tube_tests(solo, FPS, METADATA)
