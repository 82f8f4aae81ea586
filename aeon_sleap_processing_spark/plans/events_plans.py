"""Temporal/window query surface over the ``events`` stream table.

These re-express the reference's window/sequence operator inventory (SURVEY
§2.6) on the driver's generic events table so each has a DuckDB oracle:
sessionization (W4), as-of join (J2/W11), interval filter (J3), lag/diff (W2),
forward-fill (W3), rolling mean (M7), state-change detection (W5), time
truncation (M10), 2-D histogram (A7), mode (A6), JSON access (M14).

All are single-shuffle window plans partitioned by ``user_id`` — at 100 TB the
user key distributes the sort; no global ordering is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.temporal import (
    asof_join,
    dedup_keep_first,
    gap_fill_bounded,
    interval_filter,
    mode_per_group,
    sessionize,
)
from ..operators.text import md5_long
from ..sources.catalog import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user (30 min gap), session summary rows."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "ts", gap=1800.0, partition_by="user_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J2): each event ← most recent order of the same user at or
    before the event time; per-user rollup of the matches."""
    ev = _events(spark, sf_dir).withColumnRenamed("ts", "etime")
    od = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("etime"),
        "o_orderkey",
        "o_totalprice",
    )
    # dedupe equal-timestamp orders per user so the as-of pick is deterministic
    od = dedup_keep_first(od, ["user_id", "etime"], "o_orderkey")
    j = asof_join(ev, od, on="etime", by="user_id", direction="backward")
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("o_orderkey").alias("n_matched"),
        F.countDistinct("o_orderkey").alias("n_distinct_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_matched_price"),
    )


def q_interval_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval semi-join filter (J3, the maintenance-exclusion pattern):
    keep events inside ±1 h of any error event's hour, count per type."""
    ev = _events(spark, sf_dir)
    intervals = (
        ev.where(F.col("event_type") == "error")
        .select(
            F.date_trunc("hour", F.col("ts")).alias("start"),
            (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")).alias("end"),
        )
        .distinct()
    )
    kept = interval_filter(ev, intervals, time_col="ts", mode="semi")
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_lag_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/diff → rate (W2/M6, the speed pattern): per-user mean of
    Δvalue/Δt over consecutive events."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value").over(w)
    # exact integer µs delta divided ONCE — double-cast endpoints (ulp ~2.4e-7 s
    # at 2024 epochs) can flip a 6-decimal rounding boundary vs the oracle
    ts_us = F.unix_micros(F.col("ts"))
    dt = (ts_us - F.lag(ts_us).over(w)) / F.lit(1e6)
    return (
        ev.withColumn("rate", dv / dt)
        .where(F.col("rate").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.round(F.avg("rate"), 6).alias("avg_rate"),
        )
    )


def q_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (W3): carry the last purchase value forward per user,
    then sum it over all events."""
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    filled = F.last(purchase_val, ignorenulls=True).over(w)
    return (
        ev.withColumn("last_purchase", filled)
        .groupBy("user_id")
        .agg(
            F.count("last_purchase").alias("n_filled"),
            F.round(F.sum("last_purchase"), 4).alias("sum_filled"),
        )
    )


def q_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered rolling mean (M7) per user over 5 rows, rolled up."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 2)
    return (
        ev.withColumn("sm", F.avg("value").over(w))
        .groupBy("user_id")
        .agg(
            F.round(F.avg("sm"), 6).alias("avg_smoothed"),
            F.round(F.max("sm"), 6).alias("max_smoothed"),
        )
    )


def q_state_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-change detection (W5): count event_type transitions per user."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        ev.withColumn("prev_type", prev)
        .where(F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type")))
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time truncation + agg (M10/A2): hourly event counts and value sums."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (A7, the binned_statistic_2d pattern): value decile ×
    hour-of-day counts."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("value_bin", F.least(F.floor(F.col("value") / 10.0), F.lit(9)).cast("int"))
        .withColumn("hour_of_day", F.hour("ts"))
        .groupBy("value_bin", "hour_of_day")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode per group with deterministic tie-break (A6)."""
    ev = _events(spark, sf_dir)
    return mode_per_group(ev, "user_id", "event_type", out_col="top_type", count_col="n")


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access (M14): extract props.k, aggregate per event_type."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


def q_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup (P6): first event per (user, type), rolled up per type."""
    ev = _events(spark, sf_dir)
    first = dedup_keep_first(ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"])
    return first.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_first"),
        F.round(F.sum("value"), 4).alias("sum_first_value"),
    )


def q_resample_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-grid resample + backward as-of (W7+J2, the reference's expected-
    tick alignment): minute grid over January, nearest event at or before
    each tick within a 2-minute tolerance, rolled up per day.

    Uses ``chunked_asof_join`` (6 h time chunks): the unkeyed as-of has no
    ``by`` column to distribute its sort, so the chunk id becomes the window
    partition key — per-chunk sorts instead of one single-partition sort."""
    from ..operators.temporal import chunked_asof_join, resample_ticks

    ev = _events(spark, sf_dir).select(F.col("ts").alias("time"), "value")
    ticks = resample_ticks(
        ev, "2024-01-01 00:00:00", "2024-01-30 23:59:00", 60_000_000, tick_col="time"
    )
    j = chunked_asof_join(
        ticks, ev, on="time", direction="backward", tolerance=120.0, chunk=21600.0
    )
    return (
        j.withColumn("day", F.date_trunc("day", F.col("time")))
        .groupBy("day")
        .agg(
            F.count("value").alias("n_matched"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (P11): hash-based 10% per event_type.

    Uses md5-derived selection (not Spark's RNG sampler) so the oracle can
    reproduce the exact same subset."""
    ev = _events(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    return (
        ev.where(bucket % 10 == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence/funnel detection (streaming CEP pattern, batch form): per
    user, the share of 'view' events followed by a 'purchase' within 1 hour.

    Single ordered window per user — the classic next-matching-event lookup
    via a reversed min over following rows; no self-join, so no |views| x
    |purchases| blowup per user at scale."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    next_purchase = F.min(F.when(F.col("event_type") == "purchase", us)).over(w)
    converted = F.when(
        next_purchase.isNotNull() & ((next_purchase - us) <= 3_600_000_000),
        F.lit(1),
    )
    return (
        ev.withColumn("us", us)
        .withColumn("conv", converted)
        .where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.count("conv").alias("n_converted"),
            F.round(F.count("conv").cast("double") / F.count(F.lit(1)), 6).alias(
                "conv_rate"
            ),
        )
    )


# EWMA weights: exact float literals shared verbatim with the SQL oracle so
# both engines add bit-identical terms in the same left-to-right order.
EWMA_ALPHA = 0.3
EWMA_HORIZON = 10
EWMA_WEIGHTS = [(1.0 - EWMA_ALPHA) ** j for j in range(EWMA_HORIZON)]


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-horizon exponentially-weighted moving average (pandas
    ``ewm(adjust=True)`` semantics truncated at 10 lags): per-user EWMA of
    value, rolled up. Ten unrolled lag terms stay inside whole-stage codegen —
    no recursion, no UDF."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j, wt in enumerate(EWMA_WEIGHTS):
        x = F.col("value") if j == 0 else F.lag("value", j).over(w)
        num = num + F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return (
        ev.withColumn("ewma", num / den)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("ewma"), 6).alias("avg_ewma"),
            F.round(F.max("ewma"), 6).alias("max_ewma"),
        )
    )


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the irregular-sampling mean): each value is
    weighted by its holding time until the next event of the same user; the
    user's last event carries no weight. Weights are exact integer µs deltas
    divided once, so both engines form identical terms."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (F.lead(us).over(w) - us) / F.lit(1e6)
    return (
        ev.withColumn("dt", dt)
        .where(F.col("dt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_held"),
            F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias("twa_value"),
        )
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the classic training-corpus freshness /user-activity
    matrix): users grouped by first-event week, counted as active in each
    later week; one row per (cohort_week, week_offset).

    Two shuffles total: the per-user min (map-side combinable) and the final
    distinct-count — the user×week dedup rides the same exchange."""
    ev = _events(spark, sf_dir)
    first_w = W.partitionBy("user_id")
    weekly = (
        ev.withColumn("week", F.date_trunc("week", F.col("ts")))
        .withColumn("cohort_week", F.min("week").over(first_w))
        .select("user_id", "cohort_week", "week")
        .distinct()
    )
    day_us = 86_400_000_000
    offset = (
        (F.unix_micros(F.col("week")) - F.unix_micros(F.col("cohort_week")))
        / F.lit(7 * day_us)
    ).cast("long")
    return (
        weekly.withColumn("week_offset", offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier detection (anomaly flagging): events whose
    value deviates >2 sample standard deviations from the user's mean,
    counted per event type."""
    ev = _events(spark, sf_dir)
    stats = ev.groupBy(F.col("user_id").alias("uid")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.abs(F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(stats, F.col("user_id") == F.col("uid"))
        .where(z > 2.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding (W5 aggregate form): consecutive same-type runs
    per user, summarized per event_type — run id = running count of type
    changes, the standard two-window RLE."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = (
        ev.withColumn("chg", chg)
        .withColumn("run_id", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "event_type", "run_id")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.round(F.avg("run_len"), 6).alias("avg_run_len"),
        F.max("run_len").alias("max_run_len"),
    )


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with tolerance (J2 'nearest', the
    reference's ±9 ms frame alignment shape): each error event ← the nearest
    purchase of the same user within ±1 h, ties to the earlier side; per-user
    rollup of matched values."""
    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    pur = dedup_keep_first(pur, ["user_id", "ts"], "purchase_value")
    j = asof_join(err, pur, on="ts", by="user_id", direction="nearest", tolerance=3600.0)
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.count("purchase_value").alias("n_matched"),
        F.round(F.sum("purchase_value"), 4).alias("sum_matched_value"),
    )


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-direction as-of join with tolerance (J2 'forward'): each
    signup event ← the next error of the same user within 2 h; per-user
    rollup. Completes the oracle-checked as-of family (backward:
    ``q_asof_join``, nearest: ``q_asof_nearest``)."""
    ev = _events(spark, sf_dir)
    sign = ev.where(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    errs = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("error_value")
    )
    errs = dedup_keep_first(errs, ["user_id", "ts"], "error_value")
    j = asof_join(sign, errs, on="ts", by="user_id", direction="forward", tolerance=7200.0)
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count("error_value").alias("n_matched"),
        F.round(F.sum("error_value"), 4).alias("sum_matched_value"),
    )


def q_session_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-size distribution: sessionize (30 min gap) then histogram the
    per-session event counts — the count-of-counts shape over W4 output."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "ts", gap=1800.0, partition_by="user_id")
    sizes = s.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))
    return sizes.groupBy("n_events").agg(F.count(F.lit(1)).alias("n_sessions"))


def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping/sliding window aggregation (1 h windows every 15 min): each
    event explodes into exactly 4 window memberships via integer-µs grid
    arithmetic — the batch twin of streaming ``window(ts, '1 hour',
    '15 minutes')``, with a deterministic explicit formulation the SQL oracle
    reproduces."""
    ev = _events(spark, sf_dir)
    slide = 900_000_000  # 15 min in µs
    k = F.explode(F.array(*[F.lit(i) for i in range(4)]))
    return (
        ev.withColumn("us", F.unix_micros(F.col("ts")))
        .withColumn("base", F.expr(f"us div {slide}"))  # exact integer division
        .withColumn("k", k)
        .withColumn(
            "window_start",
            F.timestamp_micros((F.col("base") - F.col("k")) * F.lit(slide)),
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded gap-fill with flank equality (SURVEY W6; reference
    `generate_composite_quadrant_videos.py:129-157`): deterministically knock
    out ~30% of event_type values (md5-keyed so both engines null the same
    rows), then fill null runs spanning <= 60 s unconditionally and <= 3600 s
    only when the flanking values agree — per-user accounting plus an
    md5 checksum of the filled values so the oracle checks WHICH value was
    filled, not just how many.

    Scale: one window partition per user — the fill never needs a global sort,
    and the two flank lookups share the same partitioned sort order."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.when(md5_long(F.col("event_id").cast("string")) % 10 < 3, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("etype"),
    )
    ev = ev.withColumn("was_null", F.col("etype").isNull())
    filled = gap_fill_bounded(
        ev,
        "etype",
        order_col="ts",
        partition_by="user_id",
        fill_any_max=60.0,
        fill_equal_max=3600.0,
    )
    got = F.col("was_null") & F.col("etype").isNotNull()
    return filled.groupBy("user_id").agg(
        F.sum(F.when(got, 1).otherwise(0)).alias("n_filled"),
        F.sum(F.when(F.col("was_null") & F.col("etype").isNull(), 1).otherwise(0)).alias(
            "n_unfilled"
        ),
        F.sum(F.when(got, md5_long(F.col("etype"))).otherwise(F.lit(0))).alias(
            "fill_checksum"
        ),
    )


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing sensor values (W6's arithmetic
    sibling): deterministically null ~30% of ``value`` (md5-keyed so both
    engines null the same rows), time-weighted-interpolate per user with a
    48 h flank-span cap, and return each filled row's value — a per-row
    equality check of the interpolation arithmetic, not just counts.

    Scale: per-user keyed windows; the same four flank lookups as
    gap_fill_bounded over one partitioned sort."""
    from ..operators.temporal import interpolate_linear

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.when(md5_long(F.col("event_id").cast("string")) % 10 < 3, F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    ev = ev.withColumn("was_null", F.col("v").isNull())
    filled = interpolate_linear(
        ev, "v", order_col="ts", partition_by="user_id", max_gap=172800.0
    )
    return filled.where(F.col("was_null") & F.col("v").isNotNull()).select(
        "event_id", "user_id", F.round("v", 6).alias("interp_value")
    )


def q_sessionize_unkeyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNKEYED gap sessionization at scale (W4 without a distribution key):
    sessions over the whole event stream (2 min gap) via ``chunked_sessionize``
    — the time axis is chunked into 6 h windows so the session scan is
    per-chunk sorts plus one tiny boundary-merge window, never a
    single-partition sort over the full stream."""
    from ..operators.temporal import chunked_sessionize

    ev = _events(spark, sf_dir)
    s = chunked_sessionize(ev, "ts", gap=120.0, chunk=21600.0)
    return s.groupBy("session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )
