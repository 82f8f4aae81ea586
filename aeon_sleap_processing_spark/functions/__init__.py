from .kinematics import (
    euclid,
    frame_index,
    isclose_deg,
    orientation_deg,
    wrap_deg,
)

__all__ = ["euclid", "frame_index", "isclose_deg", "orientation_deg", "wrap_deg"]
