"""Synthetic pose fixtures with planted events (FIXTURES.md §1).

Scripted scenes on a 50 fps grid inside a synthetic arena:
- Scene A (frames 0-69): a clean tube test — mice meet head-on in the
  corridor annulus, then mouse 1 turns and retreats (mouse 0 wins).
- Scene B (frames 500-530): side-by-side decoy — passes orientation+distance
  but fails the relative-spine condition (never a candidate).
- Scene C (frames 1000-1021): flip-veto decoy — a long candidate run with two
  skeleton-flipped frames inside, which must veto the event.
- Scene D (frames 2000-2069): Scene A's geometry with a 5-frame identity-label
  glitch inside the standoff (the tracker swaps which mouse is which) — the
  greedy identity scan must detect and undo the swap, the keep-majority vote
  must NOT trigger the global flip, and the event must come out identical to
  Scene A's (winner = mouse 0).
"""

from __future__ import annotations

import pandas as pd

T0 = pd.Timestamp("2024-01-01 00:00:00")
FPS = 50.0
IDS = ["BAA-1104045", "BAA-1104047"]
PARTS4 = {"nose": "nose", "head": "head", "centroid": "spine2", "tail_base": "spine4"}

METADATA = {
    "ActiveRegion": {
        "ArenaInnerRadius": 300.0,
        "ArenaOuterRadius": 400.0,
        "ArenaCenter": {"X": 720.0, "Y": 540.0},
        "NestRegion": {
            "ArrayOfPoint": [
                {"X": 1100.0, "Y": 480.0},
                {"X": 1100.0, "Y": 500.0},
                {"X": 1100.0, "Y": 580.0},
            ]
        },
    },
    "Devices": {
        "GateRfid1": {"Location": {"X": 720.0, "Y": 140.0}},
    },
}


def _mouse_rows(rows, frame, identity, y, xs):
    """xs: dict part -> x (all on one horizontal line y)."""
    t = T0 + pd.Timedelta(microseconds=int(frame * 20_000))
    for part, x in xs.items():
        rows.append(
            {
                "time": t,
                "model": "222/1",
                "identity": identity,
                "part": part,
                "x": float(x),
                "y": float(y),
                "part_likelihood": 1.0,
            }
        )


def _m0_facing_right(x_nose, y=540.0):
    return {"nose": x_nose, "head": x_nose - 4, "spine2": x_nose - 12, "spine4": x_nose - 24}


def _m1_facing_left(x_nose, y=540.0):
    return {"nose": x_nose, "head": x_nose + 4, "spine2": x_nose + 12, "spine4": x_nose + 24}


def _m1_facing_right(x_tail):
    # turned around: tail at left, nose at right
    return {"spine4": x_tail, "spine2": x_tail + 12, "head": x_tail + 20, "nose": x_tail + 24}


def tube_test_pose() -> pd.DataFrame:
    rows: list[dict] = []

    # --- Scene A: planted tube test --------------------------------------
    # start phase, frames 0..19: head-on standoff in the corridor (left side)
    for f in range(0, 20):
        _mouse_rows(rows, f, IDS[0], 540.0, _m0_facing_right(370.0))
        _mouse_rows(rows, f, IDS[1], 540.0, _m1_facing_left(390.0))
    # retreat phase, frames 20..69: mouse1 turned, moving right 3 px/frame
    for i, f in enumerate(range(20, 70), start=1):
        _mouse_rows(rows, f, IDS[0], 540.0, _m0_facing_right(370.0))
        _mouse_rows(rows, f, IDS[1], 540.0, _m1_facing_right(390.0 + 3.0 * i))

    # --- Scene B: side-by-side decoy (rel-spine condition fails) ---------
    for f in range(500, 531):
        _mouse_rows(rows, f, IDS[0], 540.0, _m0_facing_right(370.0))
        _mouse_rows(rows, f, IDS[1], 548.0, {"nose": 346.0, "head": 350.0, "spine2": 358.0, "spine4": 370.0})

    # --- Scene C: flip-veto decoy ----------------------------------------
    for f in range(1000, 1022):
        if f in (1010, 1011):  # skeleton flip: mouse1 reported facing right
            _mouse_rows(rows, f, IDS[0], 540.0, _m0_facing_right(370.0))
            _mouse_rows(rows, f, IDS[1], 540.0, _m1_facing_right(390.0))
        else:
            _mouse_rows(rows, f, IDS[0], 540.0, _m0_facing_right(370.0))
            _mouse_rows(rows, f, IDS[1], 540.0, _m1_facing_left(390.0))

    # --- Scene D: Scene A + identity-swap glitch -------------------------
    # frames 2010-2014 carry each mouse's pose under the OTHER identity
    # label; everything else replays Scene A 2000 frames later
    for f in range(2000, 2020):
        m0_pose, m1_pose = _m0_facing_right(370.0), _m1_facing_left(390.0)
        if 2010 <= f <= 2014:
            _mouse_rows(rows, f, IDS[0], 540.0, m1_pose)
            _mouse_rows(rows, f, IDS[1], 540.0, m0_pose)
        else:
            _mouse_rows(rows, f, IDS[0], 540.0, m0_pose)
            _mouse_rows(rows, f, IDS[1], 540.0, m1_pose)
    for i, f in enumerate(range(2020, 2070), start=1):
        _mouse_rows(rows, f, IDS[0], 540.0, _m0_facing_right(370.0))
        _mouse_rows(rows, f, IDS[1], 540.0, _m1_facing_right(390.0 + 3.0 * i))

    return pd.DataFrame(rows)


# --------------------------------------------------------------------------
# fight fixture: two fast-motion bursts bridged by empty frames
# --------------------------------------------------------------------------

FIGHT_PARTS = ["nose", "head", "spine1", "spine2", "spine3", "spine4"]


def _fight_mouse(base_x):
    return {
        "nose": base_x,
        "head": base_x - 10,  # nose-head 10 px > 7 (implausible skeleton)
        "spine1": base_x - 15,
        "spine2": base_x - 20,
        "spine3": base_x - 25,
        "spine4": base_x - 30,  # interspinal mean 5 px < 10
    }


def fight_pose() -> pd.DataFrame:
    """Burst 1 frames 0-50 and burst 2 frames 260-320 (candidate gap 210 >
    max_frame_gap 200 → two phase-1 sessions), bridged by empty frames at
    100/150/200/250 (gaps <= 100 → one merged phase-2 event). Mice move
    10 px/frame (~92 cm/s) 10 px apart."""
    rows: list[dict] = []
    for f in range(0, 51):
        x0 = 500.0 + 10.0 * f
        for part, x in _fight_mouse(x0).items():
            _one(rows, f, IDS[0], part, x, 500.0)
        for part, x in _fight_mouse(x0 + 10).items():
            _one(rows, f, IDS[1], part, x, 500.0)
    for f in range(260, 321):
        x0 = 500.0 + 10.0 * (f - 260)
        for part, x in _fight_mouse(x0).items():
            _one(rows, f, IDS[0], part, x, 500.0)
        for part, x in _fight_mouse(x0 + 10).items():
            _one(rows, f, IDS[1], part, x, 500.0)
    return pd.DataFrame(rows)


def _one(rows, frame, identity, part, x, y):
    rows.append(
        {
            "time": T0 + pd.Timedelta(microseconds=int(frame * 20_000)),
            "model": "222/1",
            "identity": identity,
            "part": part,
            "x": float(x),
            "y": float(y),
            "part_likelihood": 1.0,
        }
    )


def fight_blob() -> pd.DataFrame:
    """Blob midpoint stream on the same 50 fps grid, moving 10 px/frame
    (speed ~92 cm/s > 3), with one abnormal sub-10ms row (must be dropped)."""
    recs = []
    for i in range(0, 340):
        recs.append({"time": T0 + pd.Timedelta(microseconds=i * 20_000), "x": 500.0 + 10.0 * i, "y": 500.0})
    # abnormal row 1 ms after row 17 — the reference drops it before speeds
    recs.append({"time": T0 + pd.Timedelta(microseconds=17 * 20_000 + 1_000), "x": 999.0, "y": 999.0})
    return pd.DataFrame(sorted(recs, key=lambda r: r["time"]))
