"""Kinematics as native Spark column expressions (SURVEY §2.5 M1–M9).

All pure arithmetic — whole-stage codegen, no UDFs. Numeric semantics pinned to
the reference's NumPy formulas:

- ``isclose_deg`` replicates ``np.isclose(a, b, atol=tol)`` INCLUDING the
  default rtol=1e-5 term and the deliberate absence of circular wrap-around at
  0/360 (reference `social_behaviour_detection.py:208-211` — SURVEY M3 notes
  this as intentional bug-compat).
- ``frame_index`` uses HALF_EVEN rounding (``F.bround``) to match
  ``np.round`` banker's rounding (`social_behaviour_detection.py:138`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "euclid",
    "wrap_deg",
    "orientation_deg",
    "isclose_deg",
    "frame_index",
    "homography_project",
    "annulus_contains",
    "speed_cm_s",
]


def euclid(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Euclidean distance (M1): `np.linalg.norm(a - b)`."""
    return F.hypot(ax - bx, ay - by)


def wrap_deg(angle: Column) -> Column:
    """Wrap degrees to [0, 360) the reference's way: add 360 only when < 0
    (`social_behaviour_detection.py:203-204`)."""
    return F.when(angle < 0, angle + 360).otherwise(angle)


def orientation_deg(
    tail_x: Column, tail_y: Column, tip_x: Column, tip_y: Column
) -> Column:
    """Orientation angle (M2): degrees(arctan2(-dy, dx)) wrapped to [0,360).
    0 deg = toward the nest; counterclockwise positive
    (`social_behaviour_detection.py:194-205`)."""
    return wrap_deg(F.degrees(F.atan2(-(tip_y - tail_y), tip_x - tail_x)))


def isclose_deg(a: Column, b: Column, atol: float, rtol: float = 1e-5) -> Column:
    """np.isclose(a, b, atol=atol): |a-b| <= atol + rtol*|b|; null-safe false.

    The reference compares orientations this way WITHOUT circular wrap, so
    359 deg vs 1 deg is NOT close — preserved deliberately (SURVEY M3)."""
    return F.coalesce(F.abs(a - b) <= (F.lit(atol) + F.lit(rtol) * F.abs(b)), F.lit(False))


def frame_index(time: Column, min_time: Column | str, fps: float) -> Column:
    """Frame id from timestamp (M5): round((t - t0) * fps) with banker's
    rounding to match np.round (`social_behaviour_detection.py:138`)."""
    t0 = F.lit(min_time).cast("timestamp") if isinstance(min_time, str) else min_time
    delta = time.cast("double") - t0.cast("double")
    return F.bround(delta * fps).cast("long")


def homography_project(x: Column, y: Column, H: list[list[float]]) -> tuple[Column, Column]:
    """Closed-form 3x3 homography projection (M8): homogeneous transform with
    perspective divide (`combine_pose_id_chunk.py:21-33`). H is a driver-side
    constant (broadcast literal), so this stays whole-stage codegen."""
    (h00, h01, h02), (h10, h11, h12), (h20, h21, h22) = H
    w = F.lit(h20) * x + F.lit(h21) * y + F.lit(h22)
    px = (F.lit(h00) * x + F.lit(h01) * y + F.lit(h02)) / w
    py = (F.lit(h10) * x + F.lit(h11) * y + F.lit(h12)) / w
    return px, py


def annulus_contains(
    x: Column, y: Column, cx: float, cy: float, r_inner: float, r_outer: float
) -> Column:
    """Squared-distance annulus predicate (M4): inner^2 <= d^2 <= outer^2
    (`social_behaviour_detection.py:245-250`). Null-safe false."""
    d2 = (x - F.lit(cx)) ** 2 + (y - F.lit(cy)) ** 2
    return F.coalesce((d2 >= r_inner**2) & (d2 <= r_outer**2), F.lit(False))


def speed_cm_s(dx: Column, dy: Column, dt_ms: Column, cm2px: float) -> Column:
    """Speed in cm/s from pixel deltas and integer-ms time deltas (M6):
    norm(dxy)/dt_ms/cm2px*1000 (`social_behaviour_detection.py:599`)."""
    return F.hypot(dx, dy) / dt_ms / F.lit(cm2px) * 1000.0
