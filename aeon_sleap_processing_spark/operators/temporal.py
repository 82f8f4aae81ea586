"""Reusable temporal operator kit (SURVEY.md §2.6, §7.1 item 3).

Every operator here is a pure DataFrame→DataFrame function built from native
window/join primitives — no Python UDFs — so Catalyst can push filters through
them and whole-stage codegen applies.

Scale notes (100 TB):
- ``asof_join`` uses the union-tag + ordered-window strategy: ONE shuffle on
  ``(by, time)`` instead of the naive range-join (which explodes to
  |left|x|right| candidate pairs per key). With ``by`` keys the sort
  distributes; without keys, pre-partition the time axis (chunk column) and
  apply per-chunk with overlap.
- ``sessionize`` is the classic gap-flag + running-sum pattern: one window sort,
  no self-join.
- ``interval_filter`` broadcasts the (tiny) interval table — the maintenance
  interval set in the reference is a handful of rows
  (`social_behaviour_detection.py:790,848-853`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "chunked_asof_join",
    "sessionize",
    "chunked_sessionize",
    "interval_filter",
    "resample_ticks",
    "ffill",
    "chunked_ffill",
    "bfill",
    "rolling_mean",
    "gap_fill_bounded",
    "interpolate_linear",
    "state_changes",
    "dedup_keep_first",
    "top1_per_group",
    "mode_per_group",
]

_L, _R = 1, 0  # union tags: right rows sort "around" left rows at equal time


def _as_list(x: str | Sequence[str] | None) -> list[str]:
    if x is None:
        return []
    if isinstance(x, str):
        return [x]
    return list(x)


def _axis_scale(df: DataFrame, col: str) -> tuple[Column, int]:
    """Exact order axis + per-second scale. Timestamps → integer µs (double-cast
    endpoints only resolve ~2.4e-7 s at 2024 epochs, so a delta landing exactly
    on a seconds threshold can flip vs exact epoch-µs arithmetic); numeric
    columns → double with scale 1. Second-denominated thresholds must be
    multiplied by the returned scale before comparing against axis deltas."""
    if dict(df.dtypes)[col].startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp")), 1_000_000
    return F.col(col).cast("double"), 1


def _is_ts(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col].startswith("timestamp")


def _asof_axis(df: DataFrame, col: str, is_ts: bool) -> Column:
    """As-of order column in an EXACT domain: integer µs for timestamps
    (double seconds at epoch ~1.7e9 only resolve ~2.4e-7 s, so µs deltas at
    the tolerance boundary get corrupted), double for numeric columns."""
    if is_ts:
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: str | Sequence[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: attach to each left row the temporally closest right row.

    Semantics follow ``pd.merge_asof`` as used by the reference
    (`generate_composite_quadrant_videos.py:112-118` nearest ±9ms; step3
    notebook nearest ±1ms): inclusive match, unmatched left rows kept with
    nulls, ``tolerance`` in SECONDS (float) limits |Δt|.

    direction: 'backward' (right.on <= left.on), 'forward' (>=), 'nearest'.

    Implementation: union-tag + ordered window (single shuffle). Right value
    columns that collide with left column names get ``suffix``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    by = _as_list(by)
    val_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in val_cols}

    is_ts = _is_ts(left, on)
    on_sec = _asof_axis(left, on, is_ts)
    # tolerance in the same exact domain as the axis (integer µs for timestamps)
    tol = None if tolerance is None else (int(round(tolerance * 1e6)) if is_ts else tolerance)
    axis_type = "long" if is_ts else "double"

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(_L).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias("__r_" + c) for c in val_cols],
        F.lit(None).cast(axis_type).alias("__r_on"),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(_R).alias("__tag"),
        *[F.col(c).alias("__r_" + c) for c in val_cols],
        _asof_axis(right, on, is_ts).alias("__r_on"),
    ).select(*lhs.columns)  # align column order for union
    u = lhs.unionByName(rhs)

    # pack the right row's on-value and ALL value columns into one struct:
    # the ignorenulls window fill then picks the nearest right ROW atomically.
    # (Filling value columns individually would skip legitimate NULL values
    # and reach back to an older — possibly out-of-tolerance — right row.)
    pack = F.when(
        F.col("__tag") == _R,
        F.struct(
            F.col("__r_on").alias("__on"),
            *[F.col("__r_" + c).alias(c) for c in val_cols],
        ),
    )
    u = u.withColumn("__r_pack", pack)

    need_bwd = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    picked: dict[str, Column] = {}

    if need_bwd:
        # right rows at equal time sort BEFORE left rows → inclusive backward
        wb = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__tag").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        bwd_pack = F.last("__r_pack", ignorenulls=True).over(wb)
        bwd = {c: bwd_pack[c] for c in val_cols}
        bwd_on = bwd_pack["__on"]
    if need_fwd:
        # right rows at equal time sort AFTER left rows → inclusive forward
        wf = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__tag").desc())
            .rowsBetween(0, W.unboundedFollowing)
        )
        fwd_pack = F.first("__r_pack", ignorenulls=True).over(wf)
        fwd = {c: fwd_pack[c] for c in val_cols}
        fwd_on = fwd_pack["__on"]

    if direction == "backward":
        delta = on_sec - bwd_on
        ok = bwd_on.isNotNull() & ((delta <= tol) if tol is not None else F.lit(True))
        picked = {c: F.when(ok, bwd[c]) for c in val_cols}
    elif direction == "forward":
        delta = fwd_on - on_sec
        ok = fwd_on.isNotNull() & ((delta <= tol) if tol is not None else F.lit(True))
        picked = {c: F.when(ok, fwd[c]) for c in val_cols}
    else:  # nearest: pick min |Δt| among the two candidates, ties → backward
        d_b = on_sec - bwd_on
        d_f = fwd_on - on_sec
        tol_ok_b = (d_b <= tol) if tol is not None else F.lit(True)
        tol_ok_f = (d_f <= tol) if tol is not None else F.lit(True)
        b_valid = bwd_on.isNotNull() & tol_ok_b
        f_valid = fwd_on.isNotNull() & tol_ok_f
        use_b = b_valid & (~f_valid | (d_b <= d_f))
        picked = {
            c: F.when(use_b, bwd[c]).when(f_valid, fwd[c]) for c in val_cols
        }

    res = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__tag"),
        *[picked[c].alias(out_names[c]) for c in val_cols],
    )
    return res.where(F.col("__tag") == _L).drop("__tag")


def chunked_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: str | Sequence[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    chunk: float = 3600.0,
) -> DataFrame:
    """``asof_join`` with the time axis pre-partitioned into fixed chunks —
    the scale path for unkeyed (or weakly-keyed) as-of joins.

    The reference splits the time axis into SLURM periods and documents the
    resulting defect: "period splitting cuts continuous videos … you could
    miss events on the edges" (`social_behavior_detection/README.md` step 3,
    `detect_fights_all_epochs.py:96-168`). This operator is the same
    fan-out WITHOUT the edge loss: boundary rows are carried across chunk
    borders, so the chunked result is exactly the global one.

    A plain ``asof_join`` with no ``by`` key is a single-partition window
    sort: one task sorts both inputs end to end. This wrapper makes the
    documented mitigation (module docstring: "pre-partition the time axis …
    with overlap") callable:

    1. both sides get ``chunk_id = floor(axis / chunk)`` (``chunk`` in
       seconds for timestamp axes, axis units otherwise);
    2. per ``(by, chunk_id)`` the right side is reduced to boundary
       summaries — the latest and earliest right ROW per chunk (one
       ``max_by``/``min_by`` struct each, map-side combinable; the summary
       table has one row per chunk per key, coarse by construction);
    3. the summaries are UNIONED with the distinct left chunk ids into one
       tiny spine, and an ordered window over it carries the latest right
       row BEFORE each left chunk (and the earliest AFTER it, for
       forward/nearest) into that chunk as an extra right row with its true
       timestamp — the "overlap + dedup" rows, except only the one row that
       can actually win is replicated, not a whole overlap band. (A union +
       window, not a join: a full-outer join of the two chunk lists would
       plan a sort-merge join for the same result.) Within a chunk the left
       marker sorts before the summary for the backward carry (strictly
       earlier chunks only) and after it for the forward carry;
    4. ``asof_join`` runs with ``by = [*by, chunk_id]``, so every window
       sort is per-chunk and the shuffle key is dense.

    Exactly equivalent to the global join for every direction/tolerance
    combination: the global backward match for a left row is either inside
    its own chunk or is precisely the carried latest-before-chunk row (and
    symmetrically forward); ``nearest`` picks among both, and the tolerance
    filter is applied by ``asof_join`` identically.
    """
    reserved = {"__chunk", "__last", "__first", "__from_left"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"column name(s) {sorted(clash)} are reserved")
    by = _as_list(by)
    is_ts = _is_ts(left, on)
    chunk_size = int(round(chunk * 1e6)) if is_ts else chunk
    if chunk_size <= 0:
        raise ValueError(f"chunk must be positive, got {chunk!r}")

    l_axis = _asof_axis(left, on, is_ts)
    r_axis = _asof_axis(right, on, is_ts)
    left_c = left.withColumn("__chunk", F.floor(l_axis / F.lit(chunk_size)))
    right_c = right.withColumn("__chunk", F.floor(r_axis / F.lit(chunk_size)))

    need_bwd = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")

    from pyspark.sql import types as T

    r_struct = F.struct(*[F.col(c) for c in right.columns])
    r_struct_type = T.StructType(list(right.schema.fields))
    summ = (
        right_c.groupBy(*by, "__chunk")
        .agg(
            F.max_by(r_struct, r_axis).alias("__last"),
            F.min_by(r_struct, r_axis).alias("__first"),
        )
        .withColumn("__from_left", F.lit(False))
    )
    l_marks = (
        left_c.select(*by, "__chunk")
        .distinct()
        .select(
            *by,
            "__chunk",
            F.lit(None).cast(r_struct_type).alias("__last"),
            F.lit(None).cast(r_struct_type).alias("__first"),
            F.lit(True).alias("__from_left"),
        )
    )
    spine = l_marks.unionByName(summ.select(*l_marks.columns))
    # backward: the left marker sorts BEFORE its own chunk's summary, so the
    # strictly-preceding frame sees only earlier chunks' last rows; forward
    # symmetric with the marker sorting AFTER the summary.
    wb = (
        W.partitionBy(*by)
        .orderBy(F.col("__chunk").asc(), F.col("__from_left").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wf = (
        W.partitionBy(*by)
        .orderBy(F.col("__chunk").asc(), F.col("__from_left").asc())
        .rowsBetween(1, W.unboundedFollowing)
    )

    def _unpack(carry_col: str) -> DataFrame:
        return (
            spine.where(F.col("__from_left") & F.col(carry_col).isNotNull())
            .select(
                *[F.col(carry_col)[c].alias(c) for c in right.columns],
                F.col("__chunk"),
            )
        )

    aug = right_c
    if need_bwd:
        spine = spine.withColumn("__carry_b", F.last("__last", ignorenulls=True).over(wb))
        aug = aug.unionByName(_unpack("__carry_b"))
    if need_fwd:
        spine = spine.withColumn("__carry_f", F.first("__first", ignorenulls=True).over(wf))
        aug = aug.unionByName(_unpack("__carry_f"))

    res = asof_join(
        left_c,
        aug,
        on=on,
        by=[*by, "__chunk"],
        tolerance=tolerance,
        direction=direction,
        suffix=suffix,
    )
    return res.drop("__chunk")


def sessionize(
    df: DataFrame,
    order_col: str,
    gap: float,
    partition_by: str | Sequence[str] | None = None,
    session_col: str = "session_id",
    min_size: int | None = None,
) -> DataFrame:
    """Gap-based sessionization (SURVEY W4; reference
    `social_behaviour_detection.py:267-273,620-625`).

    Rows whose ``order_col`` delta from the previous row exceeds ``gap`` start a
    new session. ``order_col`` may be numeric (frame ids, gap in same units) or
    a timestamp (gap in seconds). ``min_size`` drops sessions with fewer rows
    (reference: "keep sessions with > min frames" — strictly greater).
    """
    pb = _as_list(partition_by)
    ord_val, scale = _axis_scale(df, order_col)
    gap_t = int(round(gap * scale)) if scale != 1 else gap
    w = W.partitionBy(*pb).orderBy(order_col)
    delta = ord_val - F.lag(ord_val).over(w)
    new_flag = F.when(delta.isNull() | (delta > gap_t), F.lit(1)).otherwise(F.lit(0))
    out = df.withColumn(
        session_col,
        F.sum(new_flag).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    if min_size is not None:
        cnt = F.count(F.lit(1)).over(W.partitionBy(*pb, session_col))
        out = out.withColumn("__sess_n", cnt).where(F.col("__sess_n") > min_size).drop("__sess_n")
    return out


def chunked_sessionize(
    df: DataFrame,
    order_col: str,
    gap: float,
    chunk: float = 3600.0,
    session_col: str = "session_id",
    min_size: int | None = None,
) -> DataFrame:
    """``sessionize`` with the time axis pre-partitioned into fixed chunks —
    the scale path for UNKEYED gap sessionization (the keyed form already
    distributes on its partition keys). Same edge-safety story as
    ``chunked_asof_join``: the reference's period splitting loses sessions
    straddling a boundary (`social_behavior_detection/README.md` step 3);
    here boundary sessions MERGE across chunks, bit-equal to the global
    scan.

    Two-level scan, exactly equivalent to the global window:

    1. rows get ``chunk_id = floor(axis / chunk)`` and sessionize locally
       per chunk (window partitioned by chunk — dense key, parallel sorts);
    2. a per-chunk boundary summary (first/last axis value, local session
       count — one row per chunk, map-side combinable) is scanned with ONE
       ordered window over the tiny table: chunk k's first local session
       continues chunk k-1's last session iff the boundary delta is within
       ``gap``; the cumulative session counts minus cumulative merges give
       each chunk a global id offset;
    3. offsets broadcast-join back on chunk id; global
       ``session_id = offset + local_id``. ``min_size`` is applied on the
       GLOBAL ids (a merged boundary session counts all its rows).

    Global session numbering matches ``sessionize``'s (1-based, in time
    order), so results are drop-in comparable."""
    reserved = {"__chunk", "__axis", "__lsid", "__offset", "__sess_n"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"column name(s) {sorted(clash)} are reserved")
    ord_val, scale = _axis_scale(df, order_col)
    gap_t = int(round(gap * scale)) if scale != 1 else gap
    chunk_size = int(round(chunk * scale)) if scale != 1 else chunk
    if chunk_size <= 0:
        raise ValueError(f"chunk must be positive, got {chunk!r}")

    # single-projection column adds (not withColumn chains): each
    # withColumn is a separate JVM round trip + plan-tree analysis, and the
    # chunked operators sit on the construction critical path of every
    # chunked pipeline
    base = df.select(
        "*",
        ord_val.alias("__axis"),
        F.floor(ord_val / F.lit(chunk_size)).alias("__chunk"),
    )
    w = W.partitionBy("__chunk").orderBy(order_col)
    delta = F.col("__axis") - F.lag("__axis").over(w)
    new_flag = F.when(delta.isNull() | (delta > gap_t), F.lit(1)).otherwise(F.lit(0))
    local = base.withColumn(
        "__lsid", F.sum(new_flag).over(w.rowsBetween(W.unboundedPreceding, 0))
    )

    bounds = local.groupBy("__chunk").agg(
        F.min("__axis").alias("__first"),
        F.max("__axis").alias("__last"),
        F.max("__lsid").alias("__n_sess"),
    )
    wc = W.orderBy("__chunk")  # one row per chunk: tiny, single partition OK
    merges = F.when(
        (F.col("__first") - F.lag("__last").over(wc)) <= gap_t, F.lit(1)
    ).otherwise(F.lit(0))
    offsets = bounds.select(
        "__chunk",
        (
            F.coalesce(
                F.sum("__n_sess").over(wc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
            )
            - F.sum(merges).over(wc.rowsBetween(W.unboundedPreceding, 0))
        ).alias("__offset"),
    )

    out = local.join(F.broadcast(offsets), "__chunk").withColumn(
        session_col, F.col("__offset") + F.col("__lsid")
    )
    if min_size is not None and min_size >= 8:
        # per-session counts via map-side-combinable aggregation + semi-join
        # of the PASSING session ids. A per-session WINDOW would route every
        # row of a session to one task — a single giant merged session (e.g.
        # an always-on condition) serializes the whole stream (measured 2.1x
        # pipeline slowdown at 4.3M frames). The passing set is rows/min_size
        # — usually small, but UNBOUNDED in absolute terms (a multi-billion-
        # row stream at min_size=8 exceeds the broadcast/driver limits), so
        # no forced broadcast hint: AQE picks broadcast when the built set is
        # actually small and falls back to a shuffle join when it isn't.
        counts = out.groupBy(session_col).agg(F.count(F.lit(1)).alias("__sess_n"))
        keep = counts.where(F.col("__sess_n") > min_size).select(session_col)
        out = out.join(keep, session_col, "semi")
    elif min_size is not None:
        # tiny min_size: the passing set can approach one row per session —
        # unbounded — so stay with the windowed count
        cnt = F.count(F.lit(1)).over(W.partitionBy(session_col))
        out = out.withColumn("__sess_n", cnt).where(F.col("__sess_n") > min_size).drop(
            "__sess_n"
        )
    return out.drop("__axis", "__chunk", "__lsid", "__offset")


def interval_filter(
    df: DataFrame,
    intervals: DataFrame,
    time_col: str = "time",
    start_col: str = "start",
    end_col: str = "end",
    mode: str = "semi",
) -> DataFrame:
    """Point-in-interval filter (SURVEY J3): keep rows inside (semi) or outside
    (anti) any ``[start, end]`` interval. The interval table is broadcast —
    it is tiny (maintenance windows, reference
    `social_behaviour_detection.py:857-878`)."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"bad mode {mode!r}")
    cond = (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) <= F.col(end_col))
    return df.join(F.broadcast(intervals), cond, "left_" + mode)


def resample_ticks(
    spark_df: DataFrame,
    start: str | Column,
    end: str | Column,
    interval_micros: int,
    tick_col: str = "tick",
) -> DataFrame:
    """Build an expected tick grid (SURVEY W7; reference
    `combine_pose_id_chunk.py:309-314`): timestamps from start to end at a fixed
    microsecond period, as a DataFrame with one ``tick`` column.

    Uses integer microsecond arithmetic (not float freq strings) to avoid the
    reference's 19.999981 ms float-drift problem (SURVEY §7.2 risk 5).

    For string endpoints the tick count is known driver-side, so the grid is
    generated with a distributed ``spark.range`` (parallel partitions from
    the first stage — a 24 h period at 20 ms is 4.3 M rows, and a
    single-row ``sequence``+explode would build them all in ONE task).
    Column endpoints fall back to the sequence path.
    """
    spark = spark_df.sparkSession
    if isinstance(start, str) and isinstance(end, str):
        # resolve the string endpoints with Spark's OWN cast in a one-row
        # job — bit-exact parity with the column path by construction,
        # including session-timezone, offset-bearing strings, and DST
        # ambiguous/nonexistent local times (a driver-side pd.Timestamp
        # .tz_localize disagreed on all three)
        row = spark.range(1).select(
            F.unix_micros(F.lit(start).cast("timestamp")).alias("s"),
            F.unix_micros(F.lit(end).cast("timestamp")).alias("e"),
        ).first()
        # under ANSI the cast above throws on malformed strings (same as the
        # column path); with ANSI off it yields null — catch that here
        s_us, e_us = row["s"], row["e"]
        if s_us is None or e_us is None:
            raise ValueError(
                f"resample_ticks: unparseable timestamp string "
                f"(start={start!r}, end={end!r})"
            )
        if e_us < s_us:
            raise ValueError(f"resample_ticks: end {end!r} precedes start {start!r}")
        n = (e_us - s_us) // interval_micros + 1
        return spark.range(n).select(
            F.timestamp_micros(F.lit(s_us) + F.col("id") * F.lit(interval_micros)).alias(
                tick_col
            )
        )
    s = F.lit(start).cast("timestamp") if isinstance(start, str) else start
    e = F.lit(end).cast("timestamp") if isinstance(end, str) else end
    row = spark.range(1).select(
        F.sequence(
            (s.cast("double") * 1_000_000).cast("long"),
            (e.cast("double") * 1_000_000).cast("long"),
            F.lit(interval_micros),
        ).alias("us")
    )
    return row.select(F.explode("us").alias("us")).select(
        F.timestamp_micros(F.col("us")).alias(tick_col)
    )


def ffill(
    df: DataFrame,
    cols: str | Sequence[str],
    order_col: str = "time",
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Forward-fill nulls (SURVEY W3; reference `social_behaviour_detection.py:565`)."""
    pb = _as_list(partition_by)
    w = W.partitionBy(*pb).orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in _as_list(cols)}
    )


def chunked_ffill(
    df: DataFrame,
    cols: str | Sequence[str],
    order_col: str = "time",
    chunk: float = 3600.0,
) -> DataFrame:
    """``ffill`` with the time axis pre-partitioned into fixed chunks — the
    scale path for UNKEYED forward fill (the keyed form already distributes
    on its partition keys). Same two-level scan as ``chunked_sessionize``:

    1. rows get ``chunk_id = floor(axis / chunk)`` and forward-fill locally
       per chunk (window partitioned by chunk — dense key, parallel sorts);
    2. a per-chunk boundary summary (the LAST non-null value per column —
       one ``max_by`` per column, map-side combinable, one row per chunk)
       is scanned with one ordered window over the tiny table, carrying the
       latest non-null value from STRICTLY EARLIER chunks into each chunk;
    3. the carry broadcast-joins back on chunk id and fills whatever the
       local pass left null (exactly the rows whose nearest non-null
       predecessor lives in an earlier chunk).

    Bit-equal to the global ``ffill`` for any chunk size."""
    cols = _as_list(cols)
    reserved = {"__chunk", "__axis"} | {f"__carry_{c}" for c in cols}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"column name(s) {sorted(clash)} are reserved")
    ord_val, scale = _axis_scale(df, order_col)
    chunk_size = int(round(chunk * scale)) if scale != 1 else chunk
    if chunk_size <= 0:
        raise ValueError(f"chunk must be positive, got {chunk!r}")

    base = df.select(
        "*",
        ord_val.alias("__axis"),
        F.floor(ord_val / F.lit(chunk_size)).alias("__chunk"),
    )
    w = W.partitionBy("__chunk").orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    # one projection for all filled columns (each fill reads the ORIGINAL
    # column, so batching cannot change semantics)
    local = base.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in cols}
    )

    # per-chunk last non-null per column (null sort keys are ignored by
    # max_by, so chunks that are all-null for a column summarize to null)
    bounds = base.groupBy("__chunk").agg(
        *[
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), F.col("__axis"))).alias(c)
            for c in cols
        ]
    )
    wc = W.orderBy("__chunk")  # one row per chunk: tiny, single partition OK
    carry = bounds.select(
        "__chunk",
        *[
            F.last(c, ignorenulls=True)
            .over(wc.rowsBetween(W.unboundedPreceding, -1))
            .alias(f"__carry_{c}")
            for c in cols
        ],
    )
    out = local.join(F.broadcast(carry), "__chunk", "left").withColumns(
        {c: F.coalesce(F.col(c), F.col(f"__carry_{c}")) for c in cols}
    )
    return out.drop("__axis", "__chunk", *[f"__carry_{c}" for c in cols])


def bfill(
    df: DataFrame,
    cols: str | Sequence[str],
    order_col: str = "time",
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Backward-fill nulls."""
    pb = _as_list(partition_by)
    w = W.partitionBy(*pb).orderBy(order_col).rowsBetween(0, W.unboundedFollowing)
    return df.withColumns(
        {c: F.first(c, ignorenulls=True).over(w) for c in _as_list(cols)}
    )


def rolling_mean(
    df: DataFrame,
    col: str,
    out_col: str,
    order_col: str = "time",
    partition_by: str | Sequence[str] | None = None,
    before: int = 5,
    after: int = 4,
    mode: str = "zero_pad",
) -> DataFrame:
    """Centered running average (SURVEY M7).

    ``mode='zero_pad'`` replicates ``np.convolve(x, ones(n)/n, 'same')`` exactly
    (reference `social_behaviour_detection.py:600-601`): edge windows divide by
    the FULL window size n (zeros padded), not the number of present rows.
    ``mode='mean'`` is the cleaner mean-of-present-rows variant.
    """
    pb = _as_list(partition_by)
    w = W.partitionBy(*pb).orderBy(order_col).rowsBetween(-before, after)
    n = before + after + 1
    if mode == "zero_pad":
        expr = F.sum(col).over(w) / F.lit(n)
    elif mode == "mean":
        expr = F.avg(col).over(w)
    else:
        raise ValueError(f"bad mode {mode!r}")
    return df.withColumn(out_col, expr)


def gap_fill_bounded(
    df: DataFrame,
    col: str,
    order_col: str = "time",
    partition_by: str | Sequence[str] | None = None,
    fill_any_max: float | None = 0.1,
    fill_equal_max: float | None = 15.0,
    flag_col: str | None = None,
) -> DataFrame:
    """Bounded gap-fill with flank-equality (SURVEY W6; reference
    `generate_composite_quadrant_videos.py:129-157`).

    Null runs in ``col`` are filled with the previous non-null value when:
    - the surrounding non-null timestamps are <= ``fill_any_max`` seconds apart
      (reference: always fill <= 100 ms), OR
    - they are <= ``fill_equal_max`` seconds apart AND the flanking values are
      EQUAL (reference: fill <= 15 s iff flanking cameras equal, else raise).

    Longer / unequal-flank runs stay null; pass ``flag_col`` to get a boolean
    marking those rows (the caller decides whether to raise, mirroring the
    reference's hard failure)."""
    pb = _as_list(partition_by)
    wb = W.partitionBy(*pb).orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    wf = W.partitionBy(*pb).orderBy(order_col).rowsBetween(1, W.unboundedFollowing)
    t, scale = _axis_scale(df, order_col)
    prev_v = F.last(col, ignorenulls=True).over(wb)
    next_v = F.first(col, ignorenulls=True).over(wf)
    prev_t = F.last(F.when(F.col(col).isNotNull(), t), ignorenulls=True).over(wb)
    next_t = F.first(F.when(F.col(col).isNotNull(), t), ignorenulls=True).over(wf)
    run_span = next_t - prev_t
    fillable = F.lit(False)
    if fill_any_max is not None:
        fillable = fillable | (run_span <= fill_any_max * scale)
    if fill_equal_max is not None:
        fillable = fillable | ((run_span <= fill_equal_max * scale) & (prev_v == next_v))
    fillable = fillable & prev_v.isNotNull() & next_v.isNotNull()
    is_null = F.col(col).isNull()
    out = df.withColumn(col, F.when(is_null & fillable, prev_v).otherwise(F.col(col)))
    if flag_col is not None:
        out = out.withColumn(flag_col, is_null & ~F.coalesce(fillable, F.lit(False)))
    return out


def interpolate_linear(
    df: DataFrame,
    col: str,
    order_col: str = "time",
    partition_by: str | Sequence[str] | None = None,
    max_gap: float | None = None,
) -> DataFrame:
    """Linear interpolation of null runs (pandas ``interpolate('time')`` /
    the time-weighted interpolation of hypertable gap-fill): each null row
    gets ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` from
    its flanking non-null values. Leading/trailing runs (one flank missing)
    stay null; ``max_gap`` (seconds) leaves runs with wider flank spans
    unfilled — the "don't invent data across an outage" guard.

    Complements ``ffill``/``gap_fill_bounded`` (step-fill semantics): same
    four flanking-value windows, one arithmetic expression, no UDF. Keyed
    windows when ``partition_by`` is given; for unkeyed global use at scale,
    chunk the axis first (``chunked_ffill``'s pattern, :538)."""
    pb = _as_list(partition_by)
    wb = W.partitionBy(*pb).orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    wf = W.partitionBy(*pb).orderBy(order_col).rowsBetween(1, W.unboundedFollowing)
    t, scale = _axis_scale(df, order_col)
    prev_v = F.last(col, ignorenulls=True).over(wb)
    next_v = F.first(col, ignorenulls=True).over(wf)
    prev_t = F.last(F.when(F.col(col).isNotNull(), t), ignorenulls=True).over(wb)
    next_t = F.first(F.when(F.col(col).isNotNull(), t), ignorenulls=True).over(wf)
    span = (next_t - prev_t).cast("double")
    frac = (t - prev_t).cast("double") / span
    interp = prev_v + (next_v - prev_v) * frac
    ok = prev_v.isNotNull() & next_v.isNotNull()
    if max_gap is not None:
        ok = ok & (span <= max_gap * scale)
    return df.withColumn(
        col, F.when(F.col(col).isNull() & ok, interp).otherwise(F.col(col))
    )


def state_changes(
    df: DataFrame,
    col: str,
    order_col: str = "time",
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Keep only rows where ``col`` differs from the previous row (SURVEY W5;
    reference `social_behaviour_detection.py:831` ``state.ne(state.shift())``)."""
    pb = _as_list(partition_by)
    w = W.partitionBy(*pb).orderBy(order_col)
    prev = F.lag(col).over(w)
    return (
        df.withColumn("__prev", prev)
        .where(F.col("__prev").isNull() | (F.col(col) != F.col("__prev")))
        .drop("__prev")
    )


def dedup_keep_first(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Deterministic dedup: first row per key by ``order_col`` (SURVEY P6;
    reference `~index.duplicated(keep='first')`)."""
    ks = _as_list(keys)
    w = W.partitionBy(*ks).orderBy(order_col, *tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    )


def top1_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: Column | Sequence[Column],
) -> DataFrame:
    """argmin/argmax per group via row_number (SURVEY W12)."""
    ks = _as_list(keys)
    obs = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = W.partitionBy(*ks).orderBy(*obs)
    return (
        df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    )


def mode_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    out_col: str = "mode",
    count_col: str | None = None,
) -> DataFrame:
    """Most frequent value per group, ties broken by smallest value (SURVEY A6;
    reference quadrant tie-breaking `generate_composite_quadrant_videos.py:319-325`).
    ``count_col`` additionally emits the winning value's frequency."""
    ks = _as_list(keys)
    counted = df.groupBy(*ks, value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w = W.partitionBy(*ks).orderBy(F.col("__cnt").desc(), F.col(value_col).asc())
    out_cols = [*ks, F.col(value_col).alias(out_col)]
    if count_col is not None:
        out_cols.append(F.col("__cnt").alias(count_col))
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*out_cols)
    )
