"""Dense per-frame wide table — the Spark-native replacement for the
reference's 4-D NumPy tensor [mouse x coord x part x frame]
(`social_behaviour_detection.py:147-168,530-551`).

Instead of materializing a tensor, one row per frame with a column per
(mouse, part, coord) — built by a single map-side-combinable groupBy on
``frame_id`` and left-joined onto the full frame grid so frames with no
detections exist as all-null rows (the reference gets this implicitly from
``np.full(..., nan)``; the fight pipeline's empty-frame logic depends on it).

Scale: the groupBy shuffles once on frame_id (dense long key, no skew); the
grid is generated with ``F.sequence`` + explode and joined on the same key, so
AQE plans a cheap join. Kinematic feature columns are pure expressions on the
wide rows — whole-stage codegen end to end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.kinematics import euclid, frame_index, isclose_deg, orientation_deg

__all__ = ["FrameGrid", "build_frame_grid", "frame_grid_scalars", "mcol"]


@dataclass
class FrameGrid:
    """Wide per-frame table + the driver-side scalars the pipelines need."""

    frames: DataFrame  # frame_id, frame_ts, m{0,1}_<part>_{x,y}
    identities: list[str]  # code -> original identity (order of first appearance)
    min_time: object  # pd.Timestamp of earliest pose row (pre part-filter)
    num_frames: int
    fps: float


def mcol(mouse: int, part: str, coord: str) -> str:
    return f"m{mouse}_{part}_{coord}"


def frame_grid_scalars(
    pose: DataFrame, fps: float, parts: list[str]
) -> tuple[list[str], object, int]:
    """The driver-side scalars of ``build_frame_grid`` — (identities,
    min_time, num_frames) from ONE collect job, WITHOUT building the pivot.

    Split out so pipelines can resolve their time-axis strategy
    (``_resolve_frame_chunk`` needs ``num_frames``) and kick off independent
    eager work (e.g. ``blob_speed``'s survivor checkpoint) BEFORE paying for
    the grid pivot — the two materializations then overlap."""
    # per-identity first-seen (null identity included as its own group so
    # the global min_time is still over ALL rows), plus the part-filtered
    # max time for the frame count. Three separate actions here previously
    # re-scanned the pose input three times.
    id_rows = (
        pose.groupBy("identity")
        .agg(
            F.min("time").alias("first_seen"),
            F.max(F.when(F.col("part").isin(parts), F.col("time"))).alias("last_part_time"),
        )
        .collect()
    )
    identities = [
        r["identity"]
        for r in sorted(
            (r for r in id_rows if r["identity"] is not None),
            key=lambda r: (r["first_seen"], r["identity"]),
        )
    ]
    if len(identities) != 2:
        raise ValueError("There should be exactly 2 unique identities in the data.")
    min_time = min(r["first_seen"] for r in id_rows)
    max_part_time = max(
        (r["last_part_time"] for r in id_rows if r["last_part_time"] is not None),
        default=None,
    )
    if max_part_time is None:
        raise ValueError(f"No pose rows for parts {parts}.")

    # frame_index is monotone in t, so the max frame id comes from the max
    # part-filtered time — replicated driver-side with the exact arithmetic
    # of frame_index (per-timestamp double cast THEN subtract, banker's round)
    import pandas as pd

    lo_s = (pd.Timestamp(min_time).value // 1000) / 1e6
    hi_s = (pd.Timestamp(max_part_time).value // 1000) / 1e6
    num_frames = int(round((hi_s - lo_s) * fps)) + 1
    return identities, min_time, num_frames


def build_frame_grid(
    pose: DataFrame,
    fps: float,
    parts: list[str],
    scalars: tuple[list[str], object, int] | None = None,
) -> FrameGrid:
    """pose (long: time, identity, part, x, y) → dense wide frame grid.

    Mirrors the reference's normalization exactly:
    - identity codes by order of first appearance in (time, identity) order
      (`social_behaviour_detection.py:118-121`);
    - ``min_time`` over ALL rows, BEFORE the part filter (`:127` precedes `:134`);
    - frame_id = banker's-rounded (t - min_time) * fps;
    - duplicate (frame, mouse, part) rows: last write wins (NumPy advanced
      indexing overwrite) → ``max_by(coord, time)``;
    - frame timestamp = first row's time per frame of the part-filtered,
      sorted frame group (= min time).

    ``scalars`` takes a precomputed ``frame_grid_scalars`` result so callers
    that already ran the scalar job don't pay it twice.
    """
    spark = pose.sparkSession
    identities, min_time, num_frames = (
        scalars if scalars is not None else frame_grid_scalars(pose, fps, parts)
    )

    code = (
        F.when(F.col("identity") == identities[0], F.lit(0))
        .when(F.col("identity") == identities[1], F.lit(1))
        .otherwise(F.lit(None))
    )
    fid = frame_index(F.col("time"), F.lit(min_time), fps)
    norm = (
        pose.where(F.col("part").isin(parts))
        .select(
            fid.alias("frame_id"),
            F.col("time"),
            code.alias("code"),
            F.col("part"),
            F.col("x").cast("double").alias("x"),
            F.col("y").cast("double").alias("y"),
        )
    )

    # one F.expr per aggregate (SQL string) instead of Column algebra:
    # the 4*|parts| max_by's were the single largest py4j hot spot of the
    # detection pipelines (~1000 driver round-trips per build; CASE WHEN
    # parses to the same Catalyst nodes). Null-key rows are ignored by
    # max_by, exactly like the F.when form.
    aggs: list[Column] = [F.min("time").alias("frame_ts")]
    for m in (0, 1):
        for p in parts:
            cond = f"code = {m} AND part = '{p}'"
            for coord in ("x", "y"):
                aggs.append(
                    F.expr(
                        f"max_by(CASE WHEN {cond} THEN {coord} END, "
                        f"CASE WHEN {cond} THEN time END)"
                    ).alias(mcol(m, p, coord))
                )
    wide = norm.groupBy("frame_id").agg(*aggs)

    grid = spark.range(num_frames).select(F.col("id").alias("frame_id"))
    # Materialize the pivot ONCE and truncate lineage (eager localCheckpoint):
    # 1. every detection pipeline references the grid from several subtrees
    #    (candidate sessionization AND the event join-back), and Spark does
    #    not dedupe common subplans — un-materialized, the 17-agg shuffle
    #    re-executes once per subtree;
    # 2. the classic DataFrame API re-analyzes the full logical tree on every
    #    transformation, so the downstream feature/session/join builders pay
    #    seconds of driver-side analysis against the deep pivot plan; after
    #    truncation they analyze against a flat in-memory scan.
    # Per-chunk bounded (num_frames rows, ~20 cols; a 24 h period ≈ 4.3 M
    # rows ≈ 0.7 GB) — sized for one executor at the reference's geometry.
    frames = grid.join(wide, "frame_id", "left").localCheckpoint(eager=True)
    return FrameGrid(
        frames=frames,
        identities=identities,
        min_time=min_time,
        num_frames=num_frames,
        fps=fps,
    )


def orientation_cols(
    frames: DataFrame, nose: str, head: str, tail: str
) -> DataFrame:
    """Per-mouse orientation with nose→head NaN-fallback (SURVEY M2)."""
    out = frames
    for m in (0, 1):
        tn = orientation_deg(
            F.col(mcol(m, tail, "x")),
            F.col(mcol(m, tail, "y")),
            F.col(mcol(m, nose, "x")),
            F.col(mcol(m, nose, "y")),
        )
        th = orientation_deg(
            F.col(mcol(m, tail, "x")),
            F.col(mcol(m, tail, "y")),
            F.col(mcol(m, head, "x")),
            F.col(mcol(m, head, "y")),
        )
        out = out.withColumn(f"o{m}", F.coalesce(tn, th))
    return out


def pair_distance(frames: DataFrame, a: tuple[int, str], b: tuple[int, str]) -> Column:
    (ma, pa), (mb, pb) = a, b
    return euclid(
        F.col(mcol(ma, pa, "x")),
        F.col(mcol(ma, pa, "y")),
        F.col(mcol(mb, pb, "x")),
        F.col(mcol(mb, pb, "y")),
    )


def _f(c: Column) -> Column:
    """null-safe boolean (NaN comparisons are False in NumPy)."""
    return F.coalesce(c, F.lit(False))


def tube_test_features(
    grid: FrameGrid,
    skeleton: dict[str, str],
    metadata: dict,
    params: dict,
) -> DataFrame:
    """Candidate-start conditions + ROI filter (stages 7–9 of SURVEY §3.1),
    all as column expressions over the wide frame table."""
    nose, head = skeleton["nose"], skeleton["head"]
    cent, tail = skeleton["centroid"], skeleton["tail_base"]
    fr = orientation_cols(grid.frames, nose, head, tail)

    cdist = pair_distance(fr, (0, cent), (1, cent))
    rel0 = pair_distance(fr, (0, tail), (0, head))
    rel1 = pair_distance(fr, (0, tail), (1, head))
    e_hh = pair_distance(fr, (0, head), (1, head))
    e_tt = pair_distance(fr, (0, tail), (1, tail))
    e_t0h1 = pair_distance(fr, (0, tail), (1, head))
    e_t1h0 = pair_distance(fr, (1, tail), (0, head))
    adjusted = (F.col("o1") + 180) % 360

    fr = (
        fr.withColumn("cdist", cdist)
        .withColumn("e_t0h1", e_t0h1)
        .withColumn("e_t1h0", e_t1h0)
        .withColumn(
            "cond_start",
            _f(isclose_deg(F.col("o0"), adjusted, params["angle_tolerance"]))
            & _f(cdist < params["max_distance_start"])
            & _f(rel1 > rel0)
            & _f(e_tt > e_hh),
        )
    )

    # ROI: both mice inside the corridor annulus, neither in nest/gate regions
    cx = float(metadata["ActiveRegion"]["ArenaCenter"]["X"])
    cy = float(metadata["ActiveRegion"]["ArenaCenter"]["Y"])
    r_in = float(metadata["ActiveRegion"]["ArenaInnerRadius"])
    r_out = float(metadata["ActiveRegion"]["ArenaOuterRadius"])
    nest_pts = metadata["ActiveRegion"]["NestRegion"]["ArrayOfPoint"]
    nest_y1, nest_y2 = float(nest_pts[1]["Y"]), float(nest_pts[2]["Y"])
    gates = [
        (float(d["Location"]["X"]), float(d["Location"]["Y"]))
        for name, d in metadata.get("Devices", {}).items()
        if "Gate" in name and "Rfid" in name and d.get("Location")
    ]

    roi_both = F.lit(True)
    any_excluded = F.lit(False)
    for m in (0, 1):
        sx, sy = F.col(mcol(m, cent, "x")), F.col(mcol(m, cent, "y"))
        d2 = (sx - cx) ** 2 + (sy - cy) ** 2
        within = _f((d2 >= r_in**2) & (d2 <= r_out**2))
        in_nest = _f((sx > cx) & (sy >= nest_y1) & (sy <= nest_y2))
        in_gate = F.lit(False)
        for gx, gy in gates:
            in_gate = in_gate | _f(
                ((sx - gx) ** 2 + (sy - gy) ** 2) <= params["gate_width"] ** 2
            )
        roi_both = roi_both & within
        any_excluded = any_excluded | in_nest | in_gate

    return fr.withColumn(
        "is_candidate", F.col("cond_start") & roi_both & ~any_excluded
    )
