"""Identity-swap correction (SURVEY W8/A8): direct kernel unit tests plus a
golden pipeline test with labels swapped mid-event (FIXTURES.md §1)."""

import numpy as np
import pandas as pd
import pytest

from aeon_sleap_processing_spark.operators.kernels import greedy_identity_scan
from aeon_sleap_processing_spark.plans.tube_test import detect_tube_tests
from tests.fixture_pose import FPS, IDS, METADATA, T0, tube_test_pose


class TestGreedyScan:
    def test_no_swap_straight_tracks(self):
        n = 20
        c0 = np.vstack([np.linspace(0, 19, n), np.zeros(n)])
        c1 = np.vstack([np.linspace(100, 119, n), np.zeros(n)])
        swaps, votes = greedy_identity_scan(c0, c1)
        assert swaps == []
        assert votes[0, 0] == n and votes[0, 1] == 0

    def test_label_swap_detected(self):
        # tracks cross labels at i=10: labeled c0 jumps to the other mouse
        n = 20
        a = np.vstack([np.linspace(0, 19, n), np.zeros(n)])
        b = np.vstack([np.linspace(100, 119, n), np.zeros(n)])
        c0, c1 = a.copy(), b.copy()
        c0[:, 10:], c1[:, 10:] = b[:, 10:], a[:, 10:]
        swaps, votes = greedy_identity_scan(c0, c1)
        assert swaps == list(range(10, 20))
        assert votes[0, 1] == 10 and votes[0, 0] == 10

    def test_nan_frames_skipped_without_updating(self):
        c0 = np.array([[0.0, np.nan, 2.0], [0.0, np.nan, 0.0]])
        c1 = np.array([[100.0, np.nan, 102.0], [0.0, np.nan, 0.0]])
        swaps, votes = greedy_identity_scan(c0, c1)
        assert swaps == []
        assert votes[0, 0] == 2  # first frame + frame 2; NaN frame skipped

    def test_involutive_flip(self):
        # applying the majority flip twice restores the original swap set
        total, swaps = 10, [2, 3, 7]
        flipped = sorted(set(range(total)) - set(swaps))
        assert sorted(set(range(total)) - set(flipped)) == swaps


class TestSwappedLabelsPipeline:
    def test_winner_follows_majority_labeling(self, spark):
        pdf = tube_test_pose()
        # swap identity labels from frame 10 onward inside scene A (frames <70)
        frame = ((pdf.time - T0).dt.total_seconds() * FPS).round().astype(int)
        in_swap = (frame >= 10) & (frame < 70)
        swapped = pdf.copy()
        swapped.loc[in_swap & (pdf.identity == IDS[0]), "identity"] = "__tmp__"
        swapped.loc[in_swap & (pdf.identity == IDS[1]), "identity"] = IDS[0]
        swapped.loc[swapped.identity == "__tmp__", "identity"] = IDS[1]

        events = (
            detect_tube_tests(spark.createDataFrame(swapped), FPS, METADATA)
            .toPandas()
            .sort_values("start_timestamp")
            .reset_index(drop=True)
        )
        # Scene A (label-swapped here) + Scene D (untouched by this swap)
        assert len(events) == 2
        ev = events.iloc[0]
        # same event boundaries as the clean fixture
        assert ev.start_timestamp == T0
        assert ev.end_timestamp == T0 + pd.Timedelta(milliseconds=400)
        # majority of frames carry the swapped labeling, so the majority vote
        # flips the early frames: the true winner (static mouse) is labeled
        # IDS[1] in the majority labeling
        assert ev.winner_identity == IDS[1]
        # Scene D sits outside this test's label swap — unchanged outcome
        assert events.iloc[1].winner_identity == IDS[0]
