#!/usr/bin/env python
"""Pipeline throughput benchmark at the reference's chunk geometry.

Generates one 1-hour chunk of synthetic pose data at 50 fps (180k frames;
BASELINE.md geometry) with planted events, then times the three end-to-end
pipelines. Reference envelopes to beat (BASELINE.md): combine = 2 h wall /
chunk; detection = 12 h wall / 24 h period (i.e. ~30 min per hour of data).

Usage: python tools/bench_pipelines.py [--minutes 60]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = pd.Timestamp("2024-01-01 00:00:00")
FPS = 50.0
IDS = ["BAA-1104045", "BAA-1104047"]
ARENA = dict(cx=720.0, cy=540.0, r_in=300.0, r_out=400.0)

METADATA = {
    "ActiveRegion": {
        "ArenaInnerRadius": ARENA["r_in"],
        "ArenaOuterRadius": ARENA["r_out"],
        "ArenaCenter": {"X": ARENA["cx"], "Y": ARENA["cy"]},
        "NestRegion": {
            "ArrayOfPoint": [
                {"X": 1100.0, "Y": 480.0},
                {"X": 1100.0, "Y": 500.0},
                {"X": 1100.0, "Y": 580.0},
            ]
        },
    },
    "Devices": {"GateRfid1": {"Location": {"X": 720.0, "Y": 140.0}}},
}


def gen_pose(n_frames: int, parts: list[str], rng) -> pd.DataFrame:
    """Vectorized chunk generator: two mice orbiting the annulus on opposite
    sides (no events), NaN dropout, small jitter. One row per
    (frame, mouse, part)."""
    t = np.arange(n_frames)
    # slow orbits at mid-annulus radius, opposite phases
    th0 = 0.0005 * t
    th1 = 0.0005 * t + np.pi
    r = 350.0
    base = {
        0: (ARENA["cx"] + r * np.cos(th0), ARENA["cy"] + r * np.sin(th0)),
        1: (ARENA["cx"] + r * np.cos(th1), ARENA["cy"] + r * np.sin(th1)),
    }
    # part offsets along the direction of motion
    offsets = {p: -6.0 * i for i, p in enumerate(parts)}
    frames = np.tile(t, len(parts) * 2)
    rows = []
    for m in (0, 1):
        bx, by = base[m]
        dirx, diry = -np.sin(th0 if m == 0 else th1), np.cos(th0 if m == 0 else th1)
        for p in parts:
            o = offsets[p]
            rows.append(
                pd.DataFrame(
                    {
                        "frame": t,
                        "identity": IDS[m],
                        "part": p,
                        "x": bx + o * dirx + rng.normal(0, 0.3, n_frames),
                        "y": by + o * diry + rng.normal(0, 0.3, n_frames),
                    }
                )
            )
    pdf = pd.concat(rows, ignore_index=True)
    # 2% random dropout (lost tracking)
    pdf = pdf[rng.random(len(pdf)) > 0.02].copy()
    pdf["time"] = T0 + pd.to_timedelta(pdf["frame"] * 20_000, unit="us")
    pdf["model"] = "222/1"
    pdf["part_likelihood"] = 1.0
    return pdf.drop(columns=["frame"])


def stage(pdf: pd.DataFrame, root: str, name: str, spark):
    """Write a generated frame to parquet and read it back — pipelines are
    timed against the engine's real scan path (production inputs are parquet
    chunk stores), not driver-side `createDataFrame` re-serialization, which
    measured 2-7x slower per scan at this geometry. µs timestamps keep Spark's
    TimestampType (the session reads TIMESTAMP(NANOS) as long for the
    testdata tables)."""
    from pyspark.sql import functions as F

    path = os.path.join(root, f"{name}.parquet")
    pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    df = spark.read.parquet(path)
    for c, dt in df.dtypes:
        if dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def crossover(scales_minutes: list[int], reps: int, relaxed: bool = False) -> None:
    """Measure the chunked-vs-global crossover of the fight pipeline
    (VERDICT r6 #5): run ``fight_candidate_sessions`` with frame_chunk=0
    (forced global single-window plan) and frame_chunk=FRAME_CHUNK (the
    production chunk, 180k frames = 1 h at 50 fps) at several period
    lengths, and verify both paths emit identical session bounds. Prints
    one JSON line per scale with the min-of-reps wall time for each path."""
    import tempfile

    from aeon_sleap_processing_spark.plans.fights import fight_candidate_sessions
    from aeon_sleap_processing_spark.plans.tube_test import FRAME_CHUNK
    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="crossover-bench")
    parts8 = ["nose", "head", "right_ear", "left_ear", "spine1", "spine2", "spine3", "spine4"]
    # --relaxed: thresholds that make (almost) every frame a candidate, so
    # sessions exist, MERGE across every chunk boundary, and the
    # global-vs-chunked equality check compares real session bounds instead
    # of two empty lists (the default generator plants no events)
    params = (
        {"max_distance": 1e9, "min_blob_speed": -1.0, "max_nose_head_distance": 0.0}
        if relaxed
        else None
    )
    for minutes in scales_minutes:
        rng = np.random.default_rng(42)
        n_frames = int(minutes * 60 * FPS)
        pose_pdf = gen_pose(n_frames, parts8, rng)
        blob_pdf = pd.DataFrame(
            {
                "time": T0 + pd.to_timedelta(np.arange(n_frames) * 20_000, unit="us"),
                "x": ARENA["cx"] + 350.0 * np.cos(0.0005 * np.arange(n_frames)),
                "y": ARENA["cy"] + 350.0 * np.sin(0.0005 * np.arange(n_frames)),
            }
        )
        stage_dir = tempfile.mkdtemp(prefix="aeon_xover_")
        pose = stage(pose_pdf, stage_dir, "pose", spark)
        blob = stage(blob_pdf, stage_dir, "blob", spark)
        pose.count(), blob.count()  # warm the scans

        res: dict = {"minutes": minutes, "n_frames": n_frames}
        outs: dict = {}
        for mode, fcv in (("global", 0), ("chunked", FRAME_CHUNK)):
            best = None
            for _ in range(reps):
                t0 = time.time()
                rows = sorted(
                    map(
                        tuple,
                        fight_candidate_sessions(
                            pose, blob, FPS, parameters=params, frame_chunk=fcv
                        ).collect(),
                    )
                )
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            outs[mode] = rows
            res[f"{mode}_seconds"] = round(best, 2)
        res["outputs_equal"] = outs["global"] == outs["chunked"]
        res["n_sessions"] = len(outs["global"])
        res["chunked_over_global"] = round(
            res["chunked_seconds"] / res["global_seconds"], 3
        )
        print(json.dumps(res), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=int, default=60)
    ap.add_argument("--crossover", action="store_true")
    ap.add_argument(
        "--scales", type=int, nargs="+", default=[15, 60, 180, 360],
        help="period lengths in minutes for --crossover",
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--relaxed", action="store_true")
    args = ap.parse_args()
    if args.crossover:
        crossover(args.scales, args.reps, relaxed=args.relaxed)
        return
    n_frames = int(args.minutes * 60 * FPS)

    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.plans.combine import chunk_bounds, combine_pose_id
    from aeon_sleap_processing_spark.plans.fights import detect_fights
    from aeon_sleap_processing_spark.plans.tube_test import detect_tube_tests
    from aeon_sleap_processing_spark.session import get_spark

    rng = np.random.default_rng(42)
    spark = get_spark(app_name="pipeline-bench")

    parts8 = ["nose", "head", "right_ear", "left_ear", "spine1", "spine2", "spine3", "spine4"]
    t_gen0 = time.time()
    pose_pdf = gen_pose(n_frames, parts8, rng)
    blob_pdf = pd.DataFrame(
        {
            "time": T0 + pd.to_timedelta(np.arange(n_frames) * 20_000, unit="us"),
            "x": ARENA["cx"] + 350.0 * np.cos(0.0005 * np.arange(n_frames)),
            "y": ARENA["cy"] + 350.0 * np.sin(0.0005 * np.arange(n_frames)),
        }
    )
    gen_s = time.time() - t_gen0

    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="aeon_bench_")
    t_stage0 = time.time()
    pose = stage(pose_pdf, stage_dir, "pose", spark)
    blob = stage(blob_pdf, stage_dir, "blob", spark)
    stage_s = time.time() - t_stage0
    n_rows = pose.count()
    blob.count()

    res: dict[str, float] = {}

    t0 = time.time()
    n_tt = detect_tube_tests(pose, FPS, METADATA).count()
    res["tube_test_seconds"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_f = detect_fights(pose, blob, FPS).count()
    res["fights_seconds"] = round(time.time() - t0, 2)

    # combine: 212 full pose + 202 anchor streams at the same geometry.
    # Anchor rows are dropout-free (the reference's pose windows hard-require
    # an anchor per tick, `combine_pose_id_chunk.py:60-62`): regenerate them
    # densely from the trajectory formula.
    t_arr = np.arange(n_frames)
    anchor_rows = []
    for m, phase in ((0, 0.0), (1, np.pi)):
        th = 0.0005 * t_arr + phase
        anchor_rows.append(
            pd.DataFrame(
                {
                    "time": T0 + pd.to_timedelta(t_arr * 20_000, unit="us"),
                    "identity": IDS[m],
                    "part": "anchor",
                    "x": ARENA["cx"] + 350.0 * np.cos(th),
                    "y": ARENA["cy"] + 350.0 * np.sin(th),
                    "model": "202/1",
                    "part_likelihood": 1.0,
                }
            )
        )
    anchor_pdf = pd.concat(anchor_rows, ignore_index=True)
    lik = F.create_map(F.lit(IDS[0]), F.lit(0.9), F.lit(IDS[1]), F.lit(0.1))
    anchor_df = stage(anchor_pdf, stage_dir, "anchor", spark)
    top_pose = pose.unionByName(anchor_df).withColumn(
        "identity_likelihood", F.lit(None).cast("map<string,double>")
    )
    anchors = anchor_df.withColumn("identity_likelihood", lik)
    quad = anchors.limit(0).withColumn("x_top", F.col("x")).withColumn("y_top", F.col("y"))
    start, end, _ = chunk_bounds(T0, FPS)
    t0 = time.time()
    n_c = combine_pose_id(top_pose, anchors, quad, start, end, FPS).count()
    res["combine_seconds"] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "n_frames": n_frames,
                "pose_rows": n_rows,
                "gen_seconds": round(gen_s, 1),
                "stage_seconds": round(stage_s, 1),
                "events": {"tube_tests": n_tt, "fights": n_f, "combined_rows": n_c},
                **res,
            }
        )
    )


if __name__ == "__main__":
    main()
