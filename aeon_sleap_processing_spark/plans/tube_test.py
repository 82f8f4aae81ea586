"""Tube-test detection, Spark-first (reference
`social_behavior_detection/social_behaviour_detection.py:15-392`).

Plan shape (SURVEY §3.1):
  pose scan → maintenance exclusion (broadcast interval semi-join)
  → wide frame grid + kinematic columns (whole-stage codegen)
  → candidate predicate + ROI (column expressions)
  → gap sessionization (one window) → event-bounds table (tiny)
  → broadcast range-join events back onto frames
  → ``applyInPandas`` per-event kernel for the sequential logic
    (skeleton-flip veto, end-window conditions, greedy identity cleanup,
    winner/loser, movement check).

Everything before the kernel is a single lazy DataFrame DAG; Catalyst keeps
the expensive kernel behind the cheap filters. At scale the only shuffles are:
groupBy(frame_id) for the pivot, the sessionization window, and the kernel's
groupBy(event_id) — all on dense integer keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.kernels import greedy_identity_scan
from ..operators.temporal import chunked_sessionize, sessionize
from .pose_features import FrameGrid, build_frame_grid, mcol, tube_test_features

__all__ = [
    "FRAME_CHUNK",
    "TUBE_TEST_PARAMS",
    "TUBE_TEST_SKELETON",
    "detect_tube_tests",
    "tube_test_candidate_sessions",
]

# frame-axis chunk for the unkeyed time-axis operators in the detection
# pipelines: 1 h at 50 fps (the reference's chunk geometry). Sessions/fills
# merge bit-equal across chunk borders (chunked_sessionize/chunked_ffill),
# so this only sets the unit of parallelism — a 24 h period plans ~24
# parallel window sorts instead of one whole-period single-partition sort.
FRAME_CHUNK = 180_000

# auto-switch point between the plain single-window plans and the chunked
# forms. MEASURED, not asserted (tools/bench_pipelines.py --crossover,
# local[32]/24g, committed table in README): below ~1M frames the global
# plan's 1-2 stages beat the chunked machinery's fixed cost (chunked =
# 1.15-1.5x slower); between 1.1M and 2.2M frames the paths cross; at 2.2M+
# the chunked form wins (0.81x at 2.2M, 0.83x at 4.3M — one reference
# period) and its advantage grows with data while the global plan is capped
# at ONE sort task regardless of cluster size. 6 h of frames ≈ the measured
# crossover's lower edge; switching a little early costs percent-level
# constants, switching late risks the unbounded single-task sort.
CHUNKED_SWITCH_FRAMES = 1_080_000


def _resolve_frame_chunk(frame_chunk: int | None, num_frames: int) -> int | None:
    """None → auto (chunked iff the grid exceeds CHUNKED_SWITCH_FRAMES; the
    chunk size is FRAME_CHUNK); a positive size forces the chunked path
    with that chunk; 0 forces the global single-window path regardless of
    size (benchmarking/debug)."""
    if frame_chunk is not None:
        return int(frame_chunk) or None
    return FRAME_CHUNK if num_frames > CHUNKED_SWITCH_FRAMES else None

TUBE_TEST_PARAMS = {
    "angle_tolerance": 45,
    "max_distance_start": 50,
    "max_frame_gap": 20,
    "min_tube_test_start_frames": 15,
    "search_window_seconds": 1,
    "min_distance": 30,
    "max_distance_end": 60,
    "movement_threshold": 2,
    "gate_width": 20,
}

TUBE_TEST_SKELETON = {
    "nose": "nose",
    "head": "head",
    "centroid": "spine2",
    "tail_base": "spine4",
}

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("start_timestamp", T.TimestampType()),
        T.StructField("end_timestamp", T.TimestampType()),
        T.StructField("winner_identity", T.StringType()),
    ]
)


def _validate(params: dict | None, defaults: dict, what: str) -> dict:
    params = dict(params or {})
    bad = set(params) - set(defaults)
    if bad:
        raise ValueError(f"Invalid {what} key(s): {bad}. Allowed: {set(defaults)}")
    for k, v in defaults.items():
        params.setdefault(k, v)
    return params


def _sessionize_frames(
    cand: DataFrame, gap: int, min_size: int | None, fc: int | None
) -> DataFrame:
    """Adaptive sessionization over the frame axis: global single-window
    when the period fits one chunk (fc None), chunked above it."""
    if fc is None:
        return sessionize(cand, "frame_id", gap=gap, min_size=min_size)
    return chunked_sessionize(cand, "frame_id", gap=gap, chunk=fc, min_size=min_size)


def detect_tube_tests(
    pose: DataFrame,
    fps: float,
    metadata: dict,
    parameters: dict | None = None,
    skeleton: dict | None = None,
    grid: FrameGrid | None = None,
    frame_chunk: int | None = None,
) -> DataFrame:
    """pose (long, maintenance-filtered) → tube-test events
    (start_timestamp, end_timestamp, winner_identity).

    ``grid`` lets callers running several detectors over one period reuse a
    prebuilt frame grid (the dominant per-pipeline cost) — only valid when it
    was built with THIS skeleton's part list: frame_ts and the frame count
    are derived from part-filtered rows, so a different part set changes
    reference semantics. ``frame_chunk`` forces the chunked time-axis path
    (see FRAME_CHUNK)."""
    p = _validate(parameters, TUBE_TEST_PARAMS, "parameter")
    sk = _validate(skeleton, TUBE_TEST_SKELETON, "skeleton")
    parts = [sk["nose"], sk["head"], sk["centroid"], sk["tail_base"]]

    if grid is None:
        grid = build_frame_grid(pose, fps, parts)
    fc = _resolve_frame_chunk(frame_chunk, grid.num_frames)
    frames = tube_test_features(grid, sk, metadata, p)

    # sessionize candidate frames: gap > max_frame_gap splits, keep sessions
    # with MORE than min frames (strict >, reference `:271-273`)
    cand = frames.where("is_candidate").select("frame_id")
    sessions = _sessionize_frames(
        cand, p["max_frame_gap"], p["min_tube_test_start_frames"], fc
    )
    events = sessions.groupBy("session_id").agg(
        F.min("frame_id").alias("first_f"), F.max("frame_id").alias("last_f")
    )

    import math

    window = int(math.ceil(fps * p["search_window_seconds"]))
    cent = sk["centroid"]
    keep_cols = [
        "frame_id",
        "frame_ts",
        "is_candidate",
        "o0",
        "o1",
        "cdist",
        "e_t0h1",
        "e_t1h0",
        mcol(0, cent, "x"),
        mcol(0, cent, "y"),
        mcol(1, cent, "x"),
        mcol(1, cent, "y"),
    ]
    ev_frames = frames.select(*keep_cols).join(
        F.broadcast(events),
        (F.col("frame_id") >= F.col("first_f"))
        & (F.col("frame_id") < F.col("last_f") + window),
    )

    kernel = _make_kernel(grid, p, window, cent)
    return ev_frames.groupBy("session_id").applyInPandas(kernel, _EVENT_SCHEMA)


def tube_test_candidate_sessions(
    pose: DataFrame,
    fps: float,
    metadata: dict,
    parameters: dict | None = None,
    skeleton: dict | None = None,
    frame_chunk: int | None = None,
) -> DataFrame:
    """The fully-relational prefix of ``detect_tube_tests`` (reference
    `social_behaviour_detection.py:211-273`): frame grid → kinematics →
    candidate predicate + ROI → gap sessionization → session bounds.

    One row per surviving candidate session: ``(session_id, first_f,
    last_f, n_frames)``. This is the oracle-checkable slice of the pipeline
    — everything downstream (the per-event kernel) is sequential NumPy and
    deliberately excluded."""
    p = _validate(parameters, TUBE_TEST_PARAMS, "parameter")
    sk = _validate(skeleton, TUBE_TEST_SKELETON, "skeleton")
    parts = [sk["nose"], sk["head"], sk["centroid"], sk["tail_base"]]
    grid = build_frame_grid(pose, fps, parts)
    fc = _resolve_frame_chunk(frame_chunk, grid.num_frames)
    frames = tube_test_features(grid, sk, metadata, p)
    cand = frames.where("is_candidate").select("frame_id")
    sessions = _sessionize_frames(
        cand, p["max_frame_gap"], p["min_tube_test_start_frames"], fc
    )
    return sessions.groupBy("session_id").agg(
        F.min("frame_id").alias("first_f"),
        F.max("frame_id").alias("last_f"),
        F.count(F.lit(1)).alias("n_frames"),
    )


def _make_kernel(grid: FrameGrid, p: dict, window: int, cent: str):
    """Per-event sequential logic; pandas/NumPy inside Arrow batches."""
    import numpy as np

    identities = grid.identities
    min_time = pd.Timestamp(grid.min_time)
    fps = grid.fps
    atol = p["angle_tolerance"]
    c0x, c0y = mcol(0, cent, "x"), mcol(0, cent, "y")
    c1x, c1y = mcol(1, cent, "x"), mcol(1, cent, "y")

    def frame_time(pdf: pd.DataFrame, f: int) -> pd.Timestamp:
        row = pdf.loc[pdf.frame_id == f, "frame_ts"]
        if len(row) and pd.notna(row.iloc[0]):
            return row.iloc[0]
        return min_time + pd.Timedelta(seconds=f / fps)

    def isclose(a, b):
        with np.errstate(invalid="ignore"):
            return np.isclose(a, b, atol=atol)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame_id").reset_index(drop=True)
        first = int(pdf.first_f.iloc[0])
        last = int(pdf.last_f.iloc[0])
        empty = pd.DataFrame(
            {
                "start_timestamp": pd.Series([], dtype="datetime64[ns]"),
                "end_timestamp": pd.Series([], dtype="datetime64[ns]"),
                "winner_identity": pd.Series([], dtype="object"),
            }
        )

        # skeleton-flip veto over [first, last] (reference `:281-287`)
        in_start = pdf[(pdf.frame_id >= first) & (pdf.frame_id <= last)]
        if np.count_nonzero(isclose(in_start.o0.values, in_start.o1.values)) > 1:
            return empty

        # end-window conditions over [last, last+window) (`:292-301`)
        endw = pdf[(pdf.frame_id >= last) & (pdf.frame_id < last + window)]
        end_ok = (
            isclose(endw.o0.values, endw.o1.values)
            & (endw.cdist.values > p["min_distance"])
            & (endw.cdist.values < p["max_distance_end"])
        )
        possible_ends = endw.frame_id.values[end_ok]
        if len(possible_ends) == 0:
            return empty

        # greedy identity cleanup over [first, last+window) (`:306-348`)
        trim = pdf[(pdf.frame_id >= first) & (pdf.frame_id < last + window)]
        c0 = trim[[c0x, c0y]].to_numpy().T
        c1 = trim[[c1x, c1y]].to_numpy().T
        id_swaps, votes = greedy_identity_scan(c0, c1, count_votes=True)
        if votes[0, 1] > votes[0, 0]:
            total = c0.shape[1]
            id_swaps = sorted(set(range(total)) - set(id_swaps))

        swap_mask = np.zeros(c0.shape[1], dtype=bool)
        swap_mask[np.asarray(id_swaps, dtype=int)] = True

        # winner/loser from cleaned orientations (`:351-358`)
        o = np.vstack([trim.o0.values, trim.o1.values])
        o[:, swap_mask] = o[::-1, swap_mask]
        cand_mask = (trim.is_candidate.values) & (trim.frame_id.values <= last)
        end_mask = np.isin(trim.frame_id.values, possible_ends)
        with np.errstate(invalid="ignore"):
            start_or = np.nanmean(o[:, cand_mask], axis=1)
            end_or = np.nanmean(o[:, end_mask], axis=1)
        loser = int(np.argmax(np.abs(start_or - end_or)))
        winner = 1 - loser

        # front-mouse condition on cleaned extremity distances (`:361-366`)
        e = np.vstack([trim.e_t0h1.values, trim.e_t1h0.values])
        e[:, swap_mask] = e[::-1, swap_mask]
        with np.errstate(invalid="ignore"):
            m_t0h1 = np.nanmean(e[0, end_mask])
            m_t1h0 = np.nanmean(e[1, end_mask])
        front_ok = m_t0h1 < m_t1h0 if loser == 0 else m_t1h0 < m_t0h1

        # loser movement condition (`:368-373`)
        c = np.stack([np.vstack([c0[0], c0[1]]), np.vstack([c1[0], c1[1]])])
        c[:, :, swap_mask] = c[::-1, :, swap_mask]
        seg = c[loser][:, (last - first) : ]
        diffs = seg[:, 1:] - seg[:, :-1]
        with np.errstate(invalid="ignore"):
            mean_mv = np.nanmean(np.sqrt((diffs**2).sum(axis=0)))
        move_ok = mean_mv > p["movement_threshold"]

        if not (front_ok and move_ok):
            return empty
        return pd.DataFrame(
            {
                "start_timestamp": [frame_time(pdf, first)],
                "end_timestamp": [frame_time(pdf, int(possible_ends[0]))],
                "winner_identity": [identities[winner]],
            }
        )

    return kernel
