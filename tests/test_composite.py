"""Quadrant-camera selection tests: geometry + per-timestamp resolution +
tick-grid schedule."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.functions.geometry import (
    point_in_convex_quad,
    transformed_corners,
)
from aeon_sleap_processing_spark.plans.composite import (
    composite_schedule,
    select_quadrant_cameras,
)

T0 = pd.Timestamp("2024-01-01 00:00:00")
CAMS = ["CameraNorth", "CameraEast", "CameraSouth", "CameraWest"]


def _h(tx, ty):
    """translation homography placing a 100x100 FOV with top-left at (tx,ty)"""
    return np.array([[1.0, 0.0, tx], [0.0, 1.0, ty], [0.0, 0.0, 1.0]])


# four non-overlapping 100x100 FOVs in a 2x2 layout (img 100x100)
HOMS = {
    "CameraNorth": _h(0, 0),
    "CameraEast": _h(100, 0),
    "CameraSouth": _h(0, 100),
    "CameraWest": _h(100, 100),
}
SHAPE = (100, 100)


class TestGeometry:
    def test_corner_transform_identity(self):
        c = transformed_corners(np.eye(3), (1080, 1440))
        np.testing.assert_allclose(
            c, [[0, 0], [1439, 0], [1439, 1079], [0, 1079]]
        )

    def test_point_in_quad(self, spark):
        corners = transformed_corners(np.eye(3), (100, 100))
        df = spark.createDataFrame(
            pd.DataFrame({"x": [50.0, 0.0, 150.0], "y": [50.0, 0.0, 50.0]})
        )
        got = df.select(point_in_convex_quad(F.col("x"), F.col("y"), corners).alias("inq")).toPandas()
        assert got.inq.tolist() == [True, False, False]  # boundary excluded


class TestSelection:
    def _centroids(self, spark, rows):
        pdf = pd.DataFrame(rows, columns=["time", "identity", "x", "y"])
        return spark.createDataFrame(pdf)

    def test_both_in_same_fov(self, spark):
        t = T0
        df = self._centroids(
            spark, [(t, "A", 20.0, 20.0), (t, "B", 60.0, 60.0)]
        )
        out = select_quadrant_cameras(df, HOMS, CAMS, SHAPE).toPandas()
        assert list(out.selected_quadrant.iloc[0]) == [0]
        assert list(out.selected_camera_name.iloc[0]) == ["CameraNorth"]

    def test_mice_in_different_fovs(self, spark):
        t = T0
        df = self._centroids(
            spark, [(t, "A", 20.0, 20.0), (t, "B", 150.0, 20.0)]
        )
        out = select_quadrant_cameras(df, HOMS, CAMS, SHAPE).toPandas()
        # no common FOV → both mice's most-central quadrants
        assert list(out.selected_quadrant.iloc[0]) == [0, 1]
        assert list(out.selected_camera_name.iloc[0]) == ["CameraNorth", "CameraEast"]

    def test_outside_all_fovs_uses_closest(self, spark):
        t = T0
        df = self._centroids(
            spark, [(t, "A", -10.0, -10.0), (t, "B", -12.0, -12.0)]
        )
        out = select_quadrant_cameras(df, HOMS, CAMS, SHAPE).toPandas()
        assert list(out.selected_quadrant.iloc[0]) == [0]  # closest FOV center

    def test_schedule_gap_fill(self, spark):
        rows = []
        for i in list(range(0, 5)) + list(range(8, 12)):  # 3-tick hole
            rows.append((T0 + pd.Timedelta(microseconds=20_000 * i), "A", 20.0, 20.0))
            rows.append((T0 + pd.Timedelta(microseconds=20_000 * i), "B", 60.0, 60.0))
        sel = select_quadrant_cameras(self._centroids(spark, rows), HOMS, CAMS, SHAPE)
        sched = composite_schedule(
            sel, T0, T0 + pd.Timedelta(microseconds=20_000 * 11), fps=50.0
        ).orderBy("time").toPandas()
        assert len(sched) == 12
        # hole flanked by identical camera lists within 15 s → filled
        assert all(list(c) == ["CameraNorth"] for c in sched.selected_camera_name)
        assert not sched.unfillable.any()
