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
from ..operators.temporal import chunked_ffill
from .pose_features import FrameGrid, build_frame_grid, mcol, pair_distance
from .tube_test import FRAME_CHUNK, _resolve_frame_chunk, _sessionize_frames, _validate

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


def blob_speed(
    blob: DataFrame,
    cm2px: float,
    min_expected_dt_ms: float = 10.0,
    chunk: float | None = 3600.0,
) -> DataFrame:
    """Blob centroid stream → (frame_id, speed) with the reference's exact
    numeric path (`social_behaviour_detection.py:579-601`):

    row_number−1 (original row position) → drop rows whose Δt from the
    previous ORIGINAL row is < 10 ms → recompute Δ over survivors →
    speed = |Δxy| / int-ms-Δt / cm2px * 1000, first row 0 →
    10-row centered zero-pad running mean.

    Every stage is sequential over the time axis, so the naive plan is a
    chain of single-partition windows over the whole stream.
    ``chunk=None`` selects exactly that plan — 2 stages, the right shape
    for an in-memory-sized period (the fight pipeline picks it below
    tube_test.CHUNKED_SWITCH_FRAMES). Otherwise the axis is pre-partitioned into
    ``chunk``-second chunks (same scheme as ``chunked_sessionize``/
    ``chunked_ffill``) and each sequential stage carries exactly the
    boundary state it needs across chunks via a one-row-per-chunk summary
    table:

    - global row position  = per-chunk row_number + cumulative chunk counts;
    - Δt filter            = per-chunk lag, seeded with the previous chunk's
                             last surviving timestamp;
    - speed lag            = per-chunk lag, seeded with the previous chunk's
                             last surviving (time, x, y);
    - ±(5,4) zero-pad mean = per-chunk running sum, corrected at the chunk
                             edges with the previous chunks' last 5 and
                             following chunks' first 4 speeds (carried as
                             arrays on the summary table).

    Equal to the global form for any chunk size up to last-ULP float
    reassociation in the smoothing stage: the row positions, Δt filter, and
    per-row speeds are bit-equal (integer/exact per-row math with identical
    seeds), but the edge correction adds the carried before/after sums to
    the chunk-local running sum in a different order than the global
    in-order scan, so a smoothed speed can differ in its last bit. Every
    downstream use compares against thresholds (min_blob_speed) orders of
    magnitude above ULP scale, and the session outputs are integers — the
    chunked pipeline's shared DuckDB oracle hash therefore holds. (Ties in
    ``time`` can reorder under either form; real streams are strictly
    increasing.)
    """
    if chunk is None:
        w = W.orderBy("time")
        b = (
            blob.withColumn("frame_id", F.row_number().over(w) - 1)
            .dropna(subset=["x", "y"])
            .withColumn(
                "__dt_us", F.unix_micros("time") - F.unix_micros(F.lag("time").over(w))
            )
            .where(
                F.col("__dt_us").isNull()
                | (F.col("__dt_us") / 1000.0 >= min_expected_dt_ms)
            )
        )
        dt_ms = F.floor(
            (F.unix_micros("time") - F.unix_micros(F.lag("time").over(w))) / 1000
        ).cast("long")
        raw_speed = (
            F.hypot(F.col("x") - F.lag("x").over(w), F.col("y") - F.lag("y").over(w))
            / dt_ms
            / cm2px
            * 1000.0
        )
        b = b.withColumn("__speed", F.coalesce(raw_speed, F.lit(0.0)))
        smooth = F.sum("__speed").over(W.orderBy("time").rowsBetween(-5, 4)) / 10.0
        return b.select("frame_id", smooth.alias("speed"))

    chunk_us = int(round(chunk * 1e6))
    b0 = blob.withColumn("__chunk", F.floor(F.unix_micros("time") / F.lit(chunk_us)))

    # ---- fused per-chunk summary #1, from the RAW rows: row-count offsets
    # (global row position BEFORE the NaN drop — the reference resets the
    # index and then drops, so surviving rows keep their original positions,
    # `:562-563`) + the previous chunk's last surviving timestamp (the
    # Δt-filter seed). Both ride ONE aggregation + one ordered scan of the
    # tiny table + ONE broadcast join — they were two branches (two
    # aggregations, two joins) before, and every summary branch is a
    # scheduled job at fixture scale / a barrier at cluster scale.
    wc = W.orderBy("__chunk")  # one row per chunk: tiny, single partition OK
    s1 = b0.groupBy("__chunk").agg(
        F.count(F.lit(1)).alias("__n_rows"),
        F.max(
            F.when(F.col("x").isNotNull() & F.col("y").isNotNull(), F.col("time"))
        ).alias("__t"),
    )
    s1 = s1.select(
        "__chunk",
        F.coalesce(
            F.sum("__n_rows").over(wc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("__row_off"),
        # nearest EARLIER chunk with a surviving row — all-NaN chunks carry
        # a null __t and are skipped, the same chain the two-table form
        # (chunks-with-survivors only) built
        F.last("__t", ignorenulls=True)
        .over(wc.rowsBetween(W.unboundedPreceding, -1))
        .alias("__prev_t"),
    )
    wch = W.partitionBy("__chunk").orderBy("time")
    b1 = (
        b0.join(F.broadcast(s1), "__chunk")
        .withColumn("frame_id", F.row_number().over(wch) - 1 + F.col("__row_off"))
        .dropna(subset=["x", "y"])
    )
    prev_t = F.coalesce(F.lag("time").over(wch), F.col("__prev_t"))
    b2 = b1.withColumn(
        "__dt_us", F.unix_micros("time") - F.unix_micros(prev_t)
    ).where(F.col("__dt_us").isNull() | (F.col("__dt_us") / 1000.0 >= min_expected_dt_ms))
    # Materialize the survivor stream ONCE and truncate lineage (same
    # rationale as build_frame_grid): the speed/smoothing stages reference it
    # from two subtrees each (per-chunk summary + join-back), and Spark does
    # not dedupe common subplans — un-truncated, the row-numbering window and
    # Δt filter replicate once per reference and the replicas compound
    # through the remaining stages. Bounded: one slim row per blob sample.
    b2 = b2.select(
        "__chunk", "time", "x", "y", "frame_id"
    ).localCheckpoint(eager=True)

    # ---- fused per-chunk summary #2, from the survivors: speed-lag seed
    # (previous chunk's last surviving row), per-chunk count, AND the
    # smoothing edge arrays — one aggregation + one ordered scan + ONE
    # broadcast join (previously two of each: last_row/row_carry +
    # edges/spill). Speeds are computed chunk-locally first (null for each
    # chunk's first row); the first-row speed needs the cross-chunk carry,
    # so it is computed ON the tiny summary from (prev chunk's last row,
    # this chunk's first row) — identical arithmetic on identical inputs,
    # bit-equal to the joined-carry form — and patched into the edge
    # arrays there. Edge arrays are collected CONDITIONALLY (__p <= 4 /
    # __q <= 5), so the aggregation state stays bounded per chunk — the
    # previous form collected the whole chunk's speed array (O(chunk) in
    # one agg buffer) and sliced afterwards.
    prev_l = F.lag(F.struct("time", "x", "y")).over(wch)
    dt_l = F.floor(
        (F.unix_micros("time") - F.unix_micros(prev_l.getField("time"))) / 1000
    ).cast("long")
    speed_l = (
        F.hypot(F.col("x") - prev_l.getField("x"), F.col("y") - prev_l.getField("y"))
        / dt_l
        / cm2px
        * 1000.0
    )
    b3 = b2.select(
        "*", speed_l.alias("__speed_l"), (F.row_number().over(wch)).alias("__p")
    ).withColumn(
        "__q",
        F.count(F.lit(1)).over(W.partitionBy("__chunk")) - F.col("__p") + 1,
    )
    s2 = b3.groupBy("__chunk").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min_by(F.struct("time", "x", "y"), "time").alias("__firstrow"),
        F.max_by(F.struct("time", "x", "y"), "time").alias("__lastrow"),
        F.array_sort(
            F.collect_list(F.when(F.col("__p") <= 4, F.struct("__p", "__speed_l")))
        ).alias("__head"),
        F.array_sort(
            F.collect_list(F.when(F.col("__q") <= 5, F.struct("__p", "__speed_l")))
        ).alias("__tail"),
    )
    s2 = s2.select(
        "*",
        F.last("__lastrow")
        .over(wc.rowsBetween(W.unboundedPreceding, -1))
        .alias("__prevrow"),
    )
    first_speed = F.coalesce(
        F.hypot(
            F.col("__firstrow.x") - F.col("__prevrow.x"),
            F.col("__firstrow.y") - F.col("__prevrow.y"),
        )
        / F.floor(
            (F.unix_micros(F.col("__firstrow.time")) - F.unix_micros(F.col("__prevrow.time")))
            / 1000
        ).cast("long")
        / cm2px
        * 1000.0,
        F.lit(0.0),
    )
    s2 = s2.withColumn("__fs", first_speed)

    def _patch(arr):
        # materialize edge speeds: the chunk's first row (__p == 1) takes the
        # carry-corrected speed, everything else its (0.0-coalesced) local one
        return F.transform(
            arr,
            lambda s: F.when(s.getField("__p") == 1, F.col("__fs")).otherwise(
                F.coalesce(s.getField("__speed_l"), F.lit(0.0))
            ),
        )

    s2 = s2.select(
        "__chunk", "__n", "__fs", _patch("__tail").alias("__tail5"), _patch("__head").alias("__head4")
    )
    spill = s2.select(
        "__chunk",
        "__n",
        "__fs",
        F.reverse(
            F.slice(
                F.reverse(
                    F.flatten(
                        F.coalesce(
                            F.collect_list("__tail5").over(
                                wc.rowsBetween(W.unboundedPreceding, -1)
                            ),
                            F.array(),
                        )
                    )
                ),
                1,
                5,
            )
        ).alias("__prev5"),
        F.slice(
            F.flatten(
                F.coalesce(
                    F.collect_list("__head4").over(
                        wc.rowsBetween(1, W.unboundedFollowing)
                    ),
                    F.array(),
                )
            ),
            1,
            4,
        ).alias("__next4"),
    )

    def _arr_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    j = b3.join(F.broadcast(spill), "__chunk").withColumn(
        "__speed",
        F.coalesce(
            F.when(F.col("__p") == 1, F.col("__fs")).otherwise(F.col("__speed_l")),
            F.lit(0.0),
        ),
    )
    local_sum = F.sum("__speed").over(wch.rowsBetween(-5, 4))
    # the global window wants 5 rows before / 4 after this row; whatever the
    # chunk-local window couldn't see comes from the carried edge arrays
    k_b = F.greatest(F.lit(0), F.lit(6) - F.col("__p")).cast("int")
    k_a = F.greatest(F.lit(0), F.col("__p") + F.lit(4) - F.col("__n")).cast("int")
    sum_b = _arr_sum(
        F.when(
            k_b >= F.size("__prev5"), F.col("__prev5")
        ).otherwise(F.slice("__prev5", F.size("__prev5") - k_b + 1, k_b))
    )
    sum_a = _arr_sum(F.slice("__next4", 1, k_a))
    smooth = (local_sum + F.coalesce(sum_b, F.lit(0.0)) + F.coalesce(sum_a, F.lit(0.0))) / 10.0
    return j.select("frame_id", smooth.alias("speed"))


def detect_fights(
    pose: DataFrame,
    blob: DataFrame,
    fps: float,
    parameters: dict | None = None,
    skeleton: dict | None = None,
    grid: FrameGrid | None = None,
    frame_chunk: int | None = None,
) -> DataFrame:
    """pose (long, maintenance-filtered) + blob position stream → fight events
    (start_timestamp, end_timestamp, duration_seconds, fight_end_x/y).

    ``grid`` reuses a prebuilt frame grid — only valid when built with THIS
    skeleton's part list (see ``detect_tube_tests``). ``frame_chunk`` forces
    the chunked time-axis path (see tube_test.FRAME_CHUNK)."""
    p = _validate(parameters, FIGHT_PARAMS, "parameter")
    sk = _validate(skeleton, FIGHT_SKELETON, "skeleton")
    parts = [
        sk["nose"], sk["head"], sk["right_ear"], sk["left_ear"],
        sk["upper_spine"], sk["centroid"], sk["lower_spine"], sk["tail_base"],
    ]

    if grid is None:
        grid, bs = _grid_and_blob_speed(pose, blob, fps, parts, p, frame_chunk)
        fc = _resolve_frame_chunk(frame_chunk, grid.num_frames)
    else:
        fc = _resolve_frame_chunk(frame_chunk, grid.num_frames)
        bs = blob_speed(blob, p["cm2px"], chunk=None if fc is None else fc / grid.fps)
    cent = sk["centroid"]
    fr = _fight_condition_frames(grid, blob, sk, parts, p, fc, bs)

    # phase-1/phase-2 sessionization → event bounds
    events = _fight_sessions(fr, p, fc).select("session_id", "first_f", "last_f")

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
    frame_chunk: int | None = None,
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
    grid, bs = _grid_and_blob_speed(pose, blob, fps, parts, p, frame_chunk)
    fc = _resolve_frame_chunk(frame_chunk, grid.num_frames)
    fr = _fight_condition_frames(grid, blob, sk, parts, p, fc, bs)
    return _fight_sessions(fr, p, fc)


def _grid_and_blob_speed(
    pose: DataFrame,
    blob: DataFrame,
    fps: float,
    parts: list[str],
    p: dict,
    frame_chunk: int | None,
) -> tuple[FrameGrid, DataFrame]:
    """Build the frame grid and the blob-speed stream, OVERLAPPING their
    eager materializations: the grid pivot's localCheckpoint and chunked
    ``blob_speed``'s survivor checkpoint are independent jobs, so the blob
    side builds on a second thread (Spark job submission is thread-safe)
    while the main thread pays for the pivot. The scalar collect runs first
    (it decides the time-axis strategy); on the global path blob_speed is
    lazy, so there is nothing to overlap and it builds inline."""
    from ..plans.pose_features import frame_grid_scalars

    scalars = frame_grid_scalars(pose, fps, parts)
    fc = _resolve_frame_chunk(frame_chunk, scalars[2])
    bs_box: dict = {}
    th = None
    if fc is not None:
        import threading

        def _build() -> None:
            try:
                bs_box["bs"] = blob_speed(blob, p["cm2px"], chunk=fc / fps)
            except BaseException as exc:  # noqa: BLE001 - re-raised on join
                bs_box["err"] = exc

        th = threading.Thread(target=_build, name="blob-speed-build")
        th.start()
    grid = build_frame_grid(pose, fps, parts, scalars=scalars)
    if th is not None:
        th.join()
        if "err" in bs_box:
            raise bs_box["err"]
        return grid, bs_box["bs"]
    return grid, blob_speed(blob, p["cm2px"], chunk=None)


def _fight_condition_frames(
    grid: FrameGrid,
    blob: DataFrame,
    sk: dict,
    parts: list[str],
    p: dict,
    fc: int | None = None,
    bs: DataFrame | None = None,
) -> DataFrame:
    """Frame grid → cond1/cond2/cond3 + empty-frame flag columns. ``fc``
    selects the time-axis strategy (None → global single-window forms,
    else chunked with that many frames per chunk; see FRAME_CHUNK)."""
    fr = grid.frames
    cent = sk["centroid"]

    # Expression construction here goes through SQL strings (ONE F.expr =
    # one py4j round-trip) instead of Column algebra (~6 round-trips per
    # node): this subtree is ~700 expression nodes and the Column form
    # measured ~1.8 s of driver-side py4j chatter per build at any data
    # size. The parsed trees are the same Catalyst nodes either way.
    def dist_sql(a: tuple[int, str], b: tuple[int, str]) -> str:
        (ma, pa), (mb, pb) = a, b
        return (
            f"hypot({mcol(ma, pa, 'x')} - {mcol(mb, pb, 'x')}, "
            f"{mcol(ma, pa, 'y')} - {mcol(mb, pb, 'y')})"
        )

    # centroid distance, forward-filled over the dense frame order (`:564-565`)
    # — chunked over the frame axis so the fill never plans a whole-period
    # single-partition window (operators/temporal.py chunked_ffill)
    cdist = dist_sql((0, cent), (1, cent))
    fr = fr.selectExpr(
        "*", f"{cdist} AS cdist", f"{cdist} AS cdist_ffill"
    )
    if fc is None:
        wff = W.orderBy("frame_id").rowsBetween(W.unboundedPreceding, 0)
        fr = fr.withColumn("cdist_ffill", F.last("cdist_ffill", ignorenulls=True).over(wff))
    else:
        fr = chunked_ffill(fr, "cdist_ffill", order_col="frame_id", chunk=fc)

    # skeleton plausibility (`:570-577`): nose-head distance per mouse and the
    # nanmean of the last four internode (spine chain) distances
    def interspinal(m: int) -> str:
        pairs = [
            (sk["head"], sk["upper_spine"]),
            (sk["upper_spine"], sk["centroid"]),
            (sk["centroid"], sk["lower_spine"]),
            (sk["lower_spine"], sk["tail_base"]),
        ]
        ds = ", ".join(dist_sql((m, a), (m, b)) for a, b in pairs)
        nn = f"filter(array({ds}), v -> v IS NOT NULL)"
        return (
            f"CASE WHEN size({nn}) > 0 THEN "
            f"aggregate({nn}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            f" / size({nn}) END"
        )

    nh0 = dist_sql((0, sk["nose"]), (0, sk["head"]))
    nh1 = dist_sql((1, sk["nose"]), (1, sk["head"]))
    # CAST(... AS DOUBLE) keeps literal types identical to F.lit(float)
    # (a bare SQL numeric literal parses as DECIMAL)
    nh_t = f"CAST({p['max_nose_head_distance']!r} AS DOUBLE)"
    is_t = f"CAST({p['max_interspinal_distance']!r} AS DOUBLE)"
    cond2 = F.expr(
        f"coalesce({nh0} > {nh_t}, false)"
        f" OR coalesce({nh1} > {nh_t}, false)"
        f" OR coalesce(({interspinal(0)}) > {is_t}, false)"
        f" OR coalesce(({interspinal(1)}) > {is_t}, false)"
    )
    cond1 = F.expr(
        f"coalesce(cdist_ffill < CAST({p['max_distance']!r} AS DOUBLE), false)"
    )
    empty_frame = F.expr(
        " AND ".join(
            f"{mcol(m, part, coord)} IS NULL"
            for m in (0, 1)
            for part in parts
            for coord in ("x", "y")
        )
    )

    # blob speed condition joined by row-position frame id (`:596-607`);
    # the blob stream covers the same period as the grid, so the frame chunk
    # converts to seconds at the grid rate. A caller that already built it
    # (overlapped with the grid pivot — _grid_and_blob_speed) passes it in.
    if bs is None:
        bs = blob_speed(blob, p["cm2px"], chunk=None if fc is None else fc / grid.fps)
    out = (
        fr.withColumns(
            {"cond1": cond1, "cond2": cond2, "is_empty": empty_frame}
        )
        .join(bs, "frame_id", "left")
        .withColumn("cond3", F.coalesce(F.col("speed") > p["min_blob_speed"], F.lit(False)))
    )
    # On the chunked path, materialize the condition frames ONCE
    # (build_frame_grid rationale): phase-1 candidates, phase-2 empty-frame
    # regroup, and the event join-back all reference this subtree, and each
    # chunked operator above references its own input twice (rows + boundary
    # summary) — without truncation the kinematic/ffill/blob plans
    # re-execute once per reference and the replicas compound (measured 2x
    # end-to-end on the fixture). Materialize ONLY the columns downstream
    # reads — frame id/ts, the two centroids (event join-back + kernel),
    # the three conditions and the empty flag — not the ~40-column grid:
    # at 4.3 M frames (one reference period) that cuts the cached bytes
    # ~4x, which is the difference between the checkpoint fitting executor
    # storage and it spilling.
    # On the global path the subtree above the (already-checkpointed) grid
    # is cheap codegen + one window, and the checkpoint's materialization
    # job costs more than the recompute it saves (measured 3.7 s vs 2.4 s
    # on the fixture) — stay lazy.
    if fc is None:
        return out
    keep = [
        "frame_id",
        "frame_ts",
        mcol(0, cent, "x"),
        mcol(0, cent, "y"),
        mcol(1, cent, "x"),
        mcol(1, cent, "y"),
        "cond1",
        "cond2",
        "cond3",
        "is_empty",
    ]
    # LAZY (r16, guide §5.3): phase-1's first job materializes this as a
    # side effect — its consumers inside that job are dependency-ordered
    # (the chunk-offset broadcast must build before the join stage reads
    # the rows again), so the subtree still computes exactly once and
    # the dedicated count() job disappears from the serial driver chain.
    return out.select(*keep).localCheckpoint(eager=False)


def _fight_sessions(fr: DataFrame, p: dict, fc: int | None = None) -> DataFrame:
    """Two-phase sessionization over condition frames (`:618-642`), both
    phases chunked over the frame axis (operators/temporal.py
    chunked_sessionize, bit-equal to the global scan) so neither pass plans
    a whole-period single-partition window."""
    # phase-1 sessionization: strict candidates, gap 200, keep > min frames
    cand = fr.where(F.col("cond1") & F.col("cond2") & F.col("cond3")).select("frame_id")
    s1 = _sessionize_frames(cand, p["max_frame_gap"], p["min_num_frames"], fc)
    kept = s1.select("frame_id", F.lit(True).alias("is_orig"))
    if fc is not None:
        # phase-1 output feeds TWO phase-2 subtrees (the union and the
        # anti-join below) — un-truncated, the whole phase-1 window/join
        # chain replicates in the DAG and every phase-2 transformation
        # re-analyzes it. Bounded: candidate frame ids only, two slim
        # columns, a small subset of the stream. LAZY (r16): phase-2's
        # anti-join broadcast build is the first consumer and
        # materializes it; the union side then reads the persisted rows
        # — one fewer dedicated count() job in the serial chain.
        kept = kept.localCheckpoint(eager=False)

    # phase-2: union empty frames near contact, regroup with gap 100, keep
    # sessions containing >= 1 surviving candidate and > min frames
    empty_cand = (
        fr.where(F.col("is_empty") & F.col("cond1"))
        .select("frame_id", F.lit(False).alias("is_orig"))
        .join(kept.select("frame_id"), "frame_id", "left_anti")
    )
    u = kept.unionByName(empty_cand)
    s2 = _sessionize_frames(u, p["max_frame_gap_w_empty_frames"], None, fc)
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
