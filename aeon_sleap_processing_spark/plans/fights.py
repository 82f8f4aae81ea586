"""Fight detection, Spark-first (reference
`social_behavior_detection/social_behaviour_detection.py:394-762`).

Same plan shape as tube_test.py with fight-specific stages:
- second source: blob Position stream (register 200) with abnormal-Δt dedup,
  speed + 10-frame zero-pad smoothing (SURVEY M6/M7) — all window expressions;
- two-phase sessionization: candidates (gap 200, keep > 5) → union with
  empty-frames-near-contact → regroup (gap 100), keep sessions containing at
  least one surviving candidate (SURVEY J7/W4, reference `:618-642`);
- per-event kernel: greedy identity cleanup → per-mouse speed check →
  backward search for the fight-end location (SURVEY W8/W9).

The blob row POSITION (not its timestamp) indexes into the pose frame grid —
a deliberate reference behavior (blob row i ≈ frame i at the shared camera
rate); preserved here via row_number-1 as ``frame_id``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.kernels import greedy_identity_scan
from ..operators.temporal import sessionize
from .pose_features import FrameGrid, build_frame_grid, mcol, pair_distance
from .tube_test import _validate

__all__ = [
    "FIGHT_PARAMS",
    "FIGHT_SKELETON",
    "detect_fights",
    "blob_speed",
    "fight_candidate_sessions",
]

FIGHT_PARAMS = {
    "cm2px": 5.4,
    "max_distance": 20,
    "max_nose_head_distance": 7,
    "max_interspinal_distance": 10,
    "min_blob_speed": 3,
    "max_frame_gap": 200,
    "min_num_frames": 5,
    "max_frame_gap_w_empty_frames": 100,
    "min_centroid_speed": 20,
    "min_both_centroid_speed": 15,
}

FIGHT_SKELETON = {
    "nose": "nose",
    "head": "head",
    "right_ear": "right_ear",
    "left_ear": "left_ear",
    "upper_spine": "spine1",
    "centroid": "spine2",
    "lower_spine": "spine3",
    "tail_base": "spine4",
}

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("start_timestamp", T.TimestampType()),
        T.StructField("end_timestamp", T.TimestampType()),
        T.StructField("duration_seconds", T.DoubleType()),
        T.StructField("fight_end_x", T.DoubleType()),
        T.StructField("fight_end_y", T.DoubleType()),
    ]
)


def blob_speed(blob: DataFrame, cm2px: float, min_expected_dt_ms: float = 10.0) -> DataFrame:
    """Blob centroid stream → (frame_id, speed) with the reference's exact
    numeric path (`social_behaviour_detection.py:579-601`):

    row_number−1 (original row position) → drop rows whose Δt from the
    previous ORIGINAL row is < 10 ms → recompute Δ over survivors →
    speed = |Δxy| / int-ms-Δt / cm2px * 1000, first row 0 →
    10-row centered zero-pad running mean.
    """
    w = W.orderBy("time")
    # row position assigned BEFORE the NaN drop: the reference resets the index
    # and then drops, so surviving rows keep their original positions (`:562-563`)
    b = (
        blob.withColumn("frame_id", F.row_number().over(w) - 1)
        .dropna(subset=["x", "y"])
        .withColumn("__dt_us", F.unix_micros("time") - F.unix_micros(F.lag("time").over(w)))
        .where(F.col("__dt_us").isNull() | (F.col("__dt_us") / 1000.0 >= min_expected_dt_ms))
    )
    w2 = W.orderBy("time")
    dt_ms = F.floor(
        (F.unix_micros("time") - F.unix_micros(F.lag("time").over(w2))) / 1000
    ).cast("long")
    raw_speed = (
        F.hypot(
            F.col("x") - F.lag("x").over(w2), F.col("y") - F.lag("y").over(w2)
        )
        / dt_ms
        / cm2px
        * 1000.0
    )
    b = b.withColumn("__speed", F.coalesce(raw_speed, F.lit(0.0)))
    smooth = F.sum("__speed").over(W.orderBy("time").rowsBetween(-5, 4)) / 10.0
    return b.select("frame_id", smooth.alias("speed"))


def detect_fights(
    pose: DataFrame,
    blob: DataFrame,
    fps: float,
    parameters: dict | None = None,
    skeleton: dict | None = None,
    grid: FrameGrid | None = None,
) -> DataFrame:
    """pose (long, maintenance-filtered) + blob position stream → fight events
    (start_timestamp, end_timestamp, duration_seconds, fight_end_x/y).

    ``grid`` reuses a prebuilt frame grid — only valid when built with THIS
    skeleton's part list (see ``detect_tube_tests``)."""
    p = _validate(parameters, FIGHT_PARAMS, "parameter")
    sk = _validate(skeleton, FIGHT_SKELETON, "skeleton")
    parts = [
        sk["nose"], sk["head"], sk["right_ear"], sk["left_ear"],
        sk["upper_spine"], sk["centroid"], sk["lower_spine"], sk["tail_base"],
    ]

    if grid is None:
        grid = build_frame_grid(pose, fps, parts)
    cent = sk["centroid"]
    fr = _fight_condition_frames(grid, blob, sk, parts, p)

    # phase-1/phase-2 sessionization → event bounds
    events = _fight_sessions(fr, p).select("session_id", "first_f", "last_f")

    ev_frames = fr.select(
        "frame_id",
        "frame_ts",
        mcol(0, cent, "x"),
        mcol(0, cent, "y"),
        mcol(1, cent, "x"),
        mcol(1, cent, "y"),
    ).join(
        F.broadcast(events),
        (F.col("frame_id") >= F.col("first_f") - 1) & (F.col("frame_id") <= F.col("last_f")),
    )

    kernel = _make_kernel(grid, p, cent)
    return ev_frames.groupBy("session_id").applyInPandas(kernel, _EVENT_SCHEMA)


def fight_candidate_sessions(
    pose: DataFrame,
    blob: DataFrame,
    fps: float,
    parameters: dict | None = None,
    skeleton: dict | None = None,
) -> DataFrame:
    """The fully-relational prefix of ``detect_fights`` (reference
    `social_behaviour_detection.py:530-642`): frame grid → proximity /
    plausibility / blob-speed conditions → two-phase sessionization
    (strict candidates gap 200, then regroup with empty-frames gap 100) →
    session bounds.

    One row per surviving phase-2 session: ``(session_id, first_f, last_f,
    n_frames)`` — the oracle-checkable slice; the per-event kernel
    (identity cleanup + speed checks) is excluded."""
    p = _validate(parameters, FIGHT_PARAMS, "parameter")
    sk = _validate(skeleton, FIGHT_SKELETON, "skeleton")
    parts = [
        sk["nose"], sk["head"], sk["right_ear"], sk["left_ear"],
        sk["upper_spine"], sk["centroid"], sk["lower_spine"], sk["tail_base"],
    ]
    grid = build_frame_grid(pose, fps, parts)
    fr = _fight_condition_frames(grid, blob, sk, parts, p)
    return _fight_sessions(fr, p)


def _fight_condition_frames(
    grid: FrameGrid, blob: DataFrame, sk: dict, parts: list[str], p: dict
) -> DataFrame:
    """Frame grid → cond1/cond2/cond3 + empty-frame flag columns."""
    fr = grid.frames
    cent = sk["centroid"]

    # centroid distance, forward-filled over the dense frame order (`:564-565`)
    cdist = pair_distance(fr, (0, cent), (1, cent))
    fr = fr.withColumn("cdist", cdist)
    wff = W.orderBy("frame_id").rowsBetween(W.unboundedPreceding, 0)
    fr = fr.withColumn("cdist_ffill", F.last("cdist", ignorenulls=True).over(wff))

    # skeleton plausibility (`:570-577`): nose-head distance per mouse and the
    # nanmean of the last four internode (spine chain) distances
    def interspinal(m: int):
        pairs = [
            (sk["head"], sk["upper_spine"]),
            (sk["upper_spine"], sk["centroid"]),
            (sk["centroid"], sk["lower_spine"]),
            (sk["lower_spine"], sk["tail_base"]),
        ]
        ds = [pair_distance(fr, (m, a), (m, b)) for a, b in pairs]
        arr = F.array(*ds)
        nn = F.filter(arr, lambda v: v.isNotNull())
        return F.when(
            F.size(nn) > 0,
            F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x) / F.size(nn),
        )

    nh0 = pair_distance(fr, (0, sk["nose"]), (0, sk["head"]))
    nh1 = pair_distance(fr, (1, sk["nose"]), (1, sk["head"]))
    cond2 = (
        F.coalesce(nh0 > p["max_nose_head_distance"], F.lit(False))
        | F.coalesce(nh1 > p["max_nose_head_distance"], F.lit(False))
        | F.coalesce(interspinal(0) > p["max_interspinal_distance"], F.lit(False))
        | F.coalesce(interspinal(1) > p["max_interspinal_distance"], F.lit(False))
    )
    cond1 = F.coalesce(F.col("cdist_ffill") < p["max_distance"], F.lit(False))
    empty_frame = F.lit(True)
    for m in (0, 1):
        for part in parts:
            for coord in ("x", "y"):
                empty_frame = empty_frame & F.col(mcol(m, part, coord)).isNull()

    # blob speed condition joined by row-position frame id (`:596-607`)
    bs = blob_speed(blob, p["cm2px"])
    return (
        fr.withColumn("cond1", cond1)
        .withColumn("cond2", cond2)
        .withColumn("is_empty", empty_frame)
        .join(bs, "frame_id", "left")
        .withColumn("cond3", F.coalesce(F.col("speed") > p["min_blob_speed"], F.lit(False)))
    )


def _fight_sessions(fr: DataFrame, p: dict) -> DataFrame:
    """Two-phase sessionization over condition frames (`:618-642`)."""
    # phase-1 sessionization: strict candidates, gap 200, keep > min frames
    cand = fr.where(F.col("cond1") & F.col("cond2") & F.col("cond3")).select("frame_id")
    s1 = sessionize(cand, "frame_id", gap=p["max_frame_gap"], min_size=p["min_num_frames"])
    kept = s1.select("frame_id", F.lit(True).alias("is_orig"))

    # phase-2: union empty frames near contact, regroup with gap 100, keep
    # sessions containing >= 1 surviving candidate and > min frames
    empty_cand = (
        fr.where(F.col("is_empty") & F.col("cond1"))
        .select("frame_id", F.lit(False).alias("is_orig"))
        .join(kept.select("frame_id"), "frame_id", "left_anti")
    )
    u = kept.unionByName(empty_cand)
    s2 = sessionize(u, "frame_id", gap=p["max_frame_gap_w_empty_frames"])
    return (
        s2.groupBy("session_id")
        .agg(
            F.min("frame_id").alias("first_f"),
            F.max("frame_id").alias("last_f"),
            F.count(F.lit(1)).alias("n_frames"),
            F.max("is_orig").alias("has_orig"),
        )
        .where(F.col("has_orig") & (F.col("n_frames") > p["min_num_frames"]))
        .select("session_id", "first_f", "last_f", "n_frames")
    )


def _make_kernel(grid: FrameGrid, p: dict, cent: str):
    import numpy as np

    min_time = pd.Timestamp(grid.min_time)
    fps = grid.fps
    c0x, c0y = mcol(0, cent, "x"), mcol(0, cent, "y")
    c1x, c1y = mcol(1, cent, "x"), mcol(1, cent, "y")

    def frame_time(pdf: pd.DataFrame, f: int) -> pd.Timestamp:
        row = pdf.loc[pdf.frame_id == f, "frame_ts"]
        if len(row) and pd.notna(row.iloc[0]):
            return row.iloc[0]
        return min_time + pd.Timedelta(seconds=f / fps)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame_id").reset_index(drop=True)
        first = int(pdf.first_f.iloc[0])
        last = int(pdf.last_f.iloc[0])
        empty = pd.DataFrame(
            {
                "start_timestamp": pd.Series([], dtype="datetime64[ns]"),
                "end_timestamp": pd.Series([], dtype="datetime64[ns]"),
                "duration_seconds": pd.Series([], dtype="float"),
                "fight_end_x": pd.Series([], dtype="float"),
                "fight_end_y": pd.Series([], dtype="float"),
            }
        )

        # trim [first-1, last) — the reference's start_frame = sub[0]-1 and
        # EXCLUSIVE end slice (`:652-656`)
        trim = pdf[(pdf.frame_id >= first - 1) & (pdf.frame_id < last)]
        c0 = trim[[c0x, c0y]].to_numpy().T
        c1 = trim[[c1x, c1y]].to_numpy().T
        if c0.shape[1] < 2:
            return empty
        id_swaps, _ = greedy_identity_scan(c0, c1, count_votes=False)
        cl0, cl1 = c0.copy(), c1.copy()
        sw = np.asarray(id_swaps, dtype=int)
        cl0[:, sw], cl1[:, sw] = c1[:, sw], c0[:, sw]

        # per-mouse speeds over valid (non-NaN) frames (`:680-696`)
        def mean_speed(cl: np.ndarray) -> float:
            df = pd.DataFrame(cl.T, columns=["x", "y"]).dropna()
            if len(df) < 2:
                return float("nan")
            dt = np.diff(df.index.values * 1000 / fps).astype(int)
            dxy = df[["x", "y"]].diff().values[1:]
            speeds = np.linalg.norm(dxy, axis=1) / dt / p["cm2px"] * 1000
            return float(pd.Series(speeds).mean())

        s0, s1 = mean_speed(cl0), mean_speed(cl1)
        with np.errstate(invalid="ignore"):
            s_both = np.nanmean([s0, s1])
        if not (
            (s0 > p["min_centroid_speed"])
            or (s1 > p["min_centroid_speed"])
            or (s_both > p["min_both_centroid_speed"])
        ):
            return empty

        # fight-end location: last trimmed frame, searching backward past NaNs
        # (`:700-730`)
        idx = cl0.shape[1] - 1
        end_x = end_y = float("nan")
        while idx >= 0:
            p0, p1 = cl0[:, idx], cl1[:, idx]
            if not np.isnan(p0).any() and not np.isnan(p1).any():
                end_x = float((p0[0] + p1[0]) / 2)
                end_y = float((p0[1] + p1[1]) / 2)
                break
            idx -= 1

        start_ts = frame_time(pdf, first)
        end_ts = frame_time(pdf, last)
        duration = (end_ts - start_ts).total_seconds()
        if duration <= 1:
            return empty
        return pd.DataFrame(
            {
                "start_timestamp": [start_ts],
                "end_timestamp": [end_ts],
                "duration_seconds": [duration],
                "fight_end_x": [end_x],
                "fight_end_y": [end_y],
            }
        )

    return kernel
