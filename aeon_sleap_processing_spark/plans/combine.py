"""Pose+ID combine pipeline, Spark-first (reference
`pose_id_combine/step2_combining_SLEAP_predictions/combine_pose_id_chunk.py`).

Reference shape (SURVEY §3.2): per 1-hour chunk, build an expected tick grid
(period 1/fps, tolerance 1/(4·fps)), slice every stream per tick, build a
cost matrix (−identity_likelihood, feasible iff nearest-anchor distance ≤
40 px), solve Hungarian assignment, infer the single missing pairing, then
left-join the updates back onto the full-pose stream.

Spark shape — three ideas replace the reference's machinery:

1. **Tick quantization instead of per-tick window slicing**: tolerance is a
   quarter period, so windows never overlap — each row's tick is just
   ``round((t − start)·fps)`` kept iff |t − tick_time| ≤ tol. O(1) per row,
   no grid join, no 180k-iteration loop.
2. **One tall union** of the three streams (full pose / top ID / projected
   quadrant ID) tagged by source, so a single ``groupBy`` feeds the kernel.
3. **Per-minute ``applyInPandas``** (the reference's joblib fan-out becomes
   Spark partitioning): each group runs the per-tick assignment loop in
   NumPy/SciPy. ~60 groups per chunk × thousands of chunks = full cluster
   parallelism at 100 TB.

Homography projection (SURVEY M8) is a closed-form column expression with the
3×3 matrix inlined as literals — no UDF, stays in codegen.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.kinematics import homography_project
from ..operators.kernels import hungarian_assign

__all__ = ["combine_pose_id", "project_quadrants", "chunk_bounds", "quantize_ticks"]


def chunk_bounds(start: pd.Timestamp, fps: float) -> tuple[pd.Timestamp, pd.Timestamp, float]:
    """1-hour chunk window + tolerance (reference `:239-241`):
    end = start + 1h − (1/fps − tol), tol = (1/fps)/4."""
    tol = (1.0 / fps) / 4.0
    end = start + pd.Timedelta(hours=1) - pd.Timedelta(seconds=1.0 / fps - tol)
    return start, end, tol


def project_quadrants(
    quad_streams: dict[str, DataFrame], homographies: dict[str, "np.ndarray"]
) -> DataFrame:
    """Project each quadrant ID stream to top-camera coordinates and union
    (reference `:261-274`). Keeps only anchor parts."""
    parts = []
    for camera, df in quad_streams.items():
        H = [[float(v) for v in row] for row in homographies[camera]]
        px, py = homography_project(F.col("x").cast("double"), F.col("y").cast("double"), H)
        parts.append(
            df.withColumn("camera", F.lit(camera))
            .withColumn("x_top", px)
            .withColumn("y_top", py)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("part").contains("anchor"))


def quantize_ticks(
    df: DataFrame,
    start_us: int,
    period_us: int,
    n_ticks: int,
    tol_us: int,
    time_col: str = "time",
    tick_col: str = "tick",
) -> DataFrame:
    """Tick quantization (reference `combine_pose_id_chunk.py:239-253`'s
    per-tick window slicing, O(1) per row): assign each row the nearest
    grid tick and keep it iff |t − tick_time| ≤ tolerance and the tick is
    inside [0, n_ticks). Tolerance ≤ period/2 guarantees windows never
    overlap, so this is exactly the reference's slicing without the grid
    join. Pure column expressions — codegen, no shuffle."""
    t_us = F.unix_micros(time_col)
    tick = F.round((t_us - F.lit(start_us)) / F.lit(period_us)).cast("long")
    tick_us = F.lit(start_us) + tick * F.lit(period_us)
    ok = (
        (tick >= 0)
        & (tick < n_ticks)
        & (F.abs(t_us - tick_us) <= F.lit(tol_us))
    )
    return df.withColumn(tick_col, tick).where(ok)


_UPDATE_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("skeleton_identifier", T.StringType()),
        T.StructField("matched_identity", T.StringType()),
        T.StructField(
            "matched_identity_likelihood", T.MapType(T.StringType(), T.DoubleType())
        ),
    ]
)


def combine_pose_id(
    top_pose: DataFrame,
    top_id: DataFrame,
    quad_id: DataFrame,
    start: pd.Timestamp,
    end: pd.Timestamp,
    fps: float = 50.0,
    tolerance: float | None = None,
    max_distance: float = 40.0,
) -> DataFrame:
    """Assign identities to full-pose skeletons; returns the register-222
    combined stream (pose schema, identity/likelihood overwritten, unmatched
    rows dropped — reference `:185-196,319`).

    ``quad_id`` must already be projected (``project_quadrants``); ``top_id``
    and ``quad_id`` carry anchor rows with ``identity_likelihood`` maps.
    """
    tol = tolerance if tolerance is not None else (1.0 / fps) / 4.0
    period_us = round(1_000_000 / fps)
    n_ticks = math.floor((end - start).total_seconds() * fps) + 1
    start_us = int(start.value // 1000)

    # global candidate-identity set (reference `:148`: whole-chunk top-ID ids)
    unique_ids = sorted(
        r["identity"]
        for r in top_id.select("identity").where(F.col("identity").isNotNull()).distinct().collect()
    )

    def with_tick(df: DataFrame) -> DataFrame:
        return quantize_ticks(df, start_us, period_us, n_ticks, int(tol * 1_000_000))

    def tall(df: DataFrame, src: str, x_col: str, y_col: str, with_lik: bool) -> DataFrame:
        # the kernel reads likelihood maps only from ID rows; shipping the
        # map<string,double> for 2.88M pose rows through Arrow dominates the
        # kernel's input cost, so pose rows carry NULL instead
        lik = (
            F.col("identity_likelihood")
            if with_lik
            else F.lit(None).cast("map<string,double>").alias("identity_likelihood")
        )
        return with_tick(df).select(
            "tick",
            "time",
            F.lit(src).alias("src"),
            F.col("identity"),
            lik.alias("identity_likelihood"),
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
        )

    # Every stream enters the kernel anchor-only: the matcher uses only anchor
    # coordinates (reference `:60,78-80`), so non-anchor pose rows (7/8 of the
    # stream) never reach Python. Deviation: a malformed tick whose frames
    # carry no anchor part is skipped like an empty tick instead of raising
    # (the reference raises "No anchor points found").
    u = (
        tall(top_pose.where(F.col("part").contains("anchor")), "pose", "x", "y", False)
        .unionByName(
            tall(top_id.where(F.col("part").contains("anchor")), "topid", "x", "y", True)
        )
        .unionByName(tall(quad_id, "quad", "x_top", "y_top", True))
        .withColumn("minute", (F.col("tick") * F.lit(period_us) / F.lit(60_000_000)).cast("long"))
    )

    kernel = _make_assign_kernel(unique_ids, max_distance)
    updates = u.groupBy("minute").applyInPandas(kernel, _UPDATE_SCHEMA)

    # left equi-join updates onto the full-pose stream on (time, identity)
    # (SURVEY J1: the update side is small relative to poses — AQE picks the
    # strategy; null-safe equality mirrors pandas' NaN-key matching)
    joined = top_pose.join(
        updates,
        (top_pose["time"] == updates["time"])
        & (top_pose["identity"].eqNullSafe(updates["skeleton_identifier"])),
        "left",
    ).drop(updates["time"])
    # In the reference, pre-combine identities are float track indices and the
    # final `isinstance(x, float)` drop (`:319`) keeps exactly the matched
    # rows; expressed directly as a match filter here.
    return (
        joined.where(F.col("matched_identity").isNotNull())
        .withColumn("identity", F.col("matched_identity"))
        .withColumn("identity_likelihood", F.col("matched_identity_likelihood"))
        .drop("skeleton_identifier", "matched_identity", "matched_identity_likelihood")
    )


def _make_assign_kernel(unique_ids: list[str], max_distance: float):
    """Per-minute kernel: loop this minute's ticks, replicate the reference's
    per-tick matching (`combine_pose_id_chunk.py:35-143`).

    The minute's columns are converted to NumPy arrays ONCE and each tick
    operates on index slices — per-row pandas access (`.iloc`) would make the
    per-chunk cost pandas-bound (~5x slower measured at full chunk scale)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["tick"].to_numpy(), kind="stable")
        tick = pdf["tick"].to_numpy()[order]
        src = pdf["src"].to_numpy()[order]
        ident = pdf["identity"].to_numpy()[order]
        xs = pdf["x"].to_numpy(dtype=float)[order]
        ys = pdf["y"].to_numpy(dtype=float)[order]
        liks = pdf["identity_likelihood"].to_numpy()[order]
        times = pdf["time"].to_numpy()[order]

        uniq_ticks, starts = np.unique(tick, return_index=True)
        bounds = np.append(starts, len(tick))
        out_rows: list[dict] = []
        for k, t in enumerate(uniq_ticks):
            sl = slice(bounds[k], bounds[k + 1])
            s_src = src[sl]
            # all rows are anchor rows (filtered plan-side before the union)
            pose_mask = s_src == "pose"
            if not pose_mask.any():
                continue
            pose_ts = times[sl][pose_mask][0]
            pose_ids = ident[sl][pose_mask]
            pose_coords = np.column_stack([xs[sl][pose_mask], ys[sl][pose_mask]])

            id_mask = s_src == "quad"
            if not id_mask.any():
                id_mask = s_src == "topid"
            if not id_mask.any():
                continue
            id_ids = ident[sl][id_mask]
            id_coords = np.column_stack([xs[sl][id_mask], ys[sl][id_mask]])
            id_liks = liks[sl][id_mask]

            ids_here: list = []
            for v in id_ids:
                if v not in ids_here:
                    ids_here.append(v)
            cost = np.full((len(pose_coords), len(ids_here)), np.inf)
            cand = np.full(cost.shape, -1, dtype=int)
            for j in range(len(id_coords)):
                dists = np.sqrt(np.sum((pose_coords - id_coords[j]) ** 2, axis=1))
                if dists.min() > max_distance:
                    continue
                r = int(dists.argmin())
                c = ids_here.index(id_ids[j])
                # direct key indexing: a likelihood map missing its own
                # identity is malformed data and must fail loudly (the
                # reference indexes the same way, `:95`); a NaN cost here
                # would silently drop the candidate instead
                cost_val = -(id_liks[j] or {})[id_ids[j]]
                if cost_val < cost[r, c]:
                    cost[r, c] = cost_val
                    cand[r, c] = j
            if np.all(np.isinf(cost)):
                continue

            assigned_ids: set = set()
            assigned_poses: set = set()
            for r, c in hungarian_assign(cost):
                j = cand[r, c]
                assigned_ids.add(id_ids[j])
                assigned_poses.add(pose_ids[r])
                out_rows.append(
                    {
                        "time": pose_ts,
                        "skeleton_identifier": pose_ids[r],
                        "matched_identity": id_ids[j],
                        "matched_identity_likelihood": dict(id_liks[j] or {}),
                    }
                )
            # single-missing-pairing inference (reference `:137-141`)
            missing = set(unique_ids) - assigned_ids
            unassigned = set(pose_ids) - assigned_poses
            if len(missing) == 1 and len(unassigned) == 1:
                out_rows.append(
                    {
                        "time": pose_ts,
                        "skeleton_identifier": next(iter(unassigned)),
                        "matched_identity": next(iter(missing)),
                        "matched_identity_likelihood": {u: float("nan") for u in unique_ids},
                    }
                )
        if not out_rows:
            return pd.DataFrame(
                {
                    "time": pd.Series([], dtype="datetime64[ns]"),
                    "skeleton_identifier": pd.Series([], dtype="object"),
                    "matched_identity": pd.Series([], dtype="object"),
                    "matched_identity_likelihood": pd.Series([], dtype="object"),
                }
            )
        return pd.DataFrame(out_rows)

    return kernel
