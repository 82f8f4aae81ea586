"""Geometry helpers for quadrant-camera selection (SURVEY M8/M9;
reference `id_model/step2_composite_videos/generate_composite_quadrant_videos.py:224-266`).

Corner transformation and FOV centers are driver-side NumPy over 4 points per
camera (constants, broadcast as literals). Point-in-quadrilateral is expressed
as half-plane sign tests — pure column arithmetic, codegen-friendly, matching
shapely's ``Polygon.contains`` (strict interior, boundary excluded) for convex
quadrilaterals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["transformed_corners", "fov_center", "point_in_convex_quad"]


def transformed_corners(H: np.ndarray, img_shape: tuple[int, int]) -> np.ndarray:
    """Project the image corners through H and order them
    [top_left, top_right, bottom_right, bottom_left] (reference `:224-237`)."""
    h, w = img_shape
    corners = np.array([[0, 0, 1], [0, h - 1, 1], [w - 1, 0, 1], [w - 1, h - 1, 1]], dtype=float)
    t = (np.asarray(H, dtype=float) @ corners.T).T
    t = t[:, :2] / t[:, [2]]
    by_x = sorted(t.tolist(), key=lambda p: (p[0], p[1]))
    top_left, bottom_left = sorted(by_x[:2], key=lambda p: p[1])
    top_right, bottom_right = sorted(by_x[2:], key=lambda p: p[1])
    return np.array([top_left, top_right, bottom_right, bottom_left])


def fov_center(corners: np.ndarray) -> tuple[float, float]:
    return float(np.mean(corners[:, 0])), float(np.mean(corners[:, 1]))


def point_in_convex_quad(x: Column, y: Column, corners: np.ndarray) -> Column:
    """Strict interior test for a convex quadrilateral with ordered corners:
    the point is inside iff the cross product against every edge has the same
    (strict) sign. Null-safe false."""
    signs = []
    n = len(corners)
    for i in range(n):
        x1, y1 = corners[i]
        x2, y2 = corners[(i + 1) % n]
        cross = (F.lit(float(x2 - x1)) * (y - F.lit(float(y1)))) - (
            F.lit(float(y2 - y1)) * (x - F.lit(float(x1)))
        )
        signs.append(cross)
    all_pos = signs[0] > 0
    all_neg = signs[0] < 0
    for s in signs[1:]:
        all_pos = all_pos & (s > 0)
        all_neg = all_neg & (s < 0)
    return F.coalesce(all_pos | all_neg, F.lit(False))
