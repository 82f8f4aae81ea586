"""Round-2 relational surface: subquery/outer-join TPC-H shapes, the full
window-function suite, grouping sets, pivot/unpivot, percentiles/statistics,
validated approximate sketches, and the salted-aggregation path.

These widen SURVEY §2 coverage beyond the reference's own inventory with the
standard analytics shapes any engine user expects (§2.4 note: grouping sets /
distinct-agg / sketches are free in Spark). Conventions match ``relational.py``:
every computed column aliased identically to the DuckDB oracle, float
aggregates rounded to fixed decimals, every top-k fully tie-broken.

Scale notes (100 TB):
- Scalar subqueries (avg thresholds) become one-row broadcasts, never a
  shuffle (`q17_small_qty_orders`, `q_idle_customers`).
- Outer joins keep the big side unshuffled where the filtered side is small
  (`q13_order_distribution` filters orders BEFORE the join).
- Window suites all partition by a key — no global-order windows.
- `q_skew_salted_agg` demonstrates the two-phase salted aggregation that
  survives a single hot key owning 90% of a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.util import salted_agg
from ..sources.catalog import load_table

_DAY_US = 86_400_000_000  # one day in microseconds


# ---------------------------------------------------------------------------
# TPC-H subquery / outer-join shapes
# ---------------------------------------------------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year — two roles of the
    same dimension (supplier nation vs customer nation) + disjunctive pair
    predicate + year extraction."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter, then a
    count-of-counts distribution (two cascaded aggregations)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q17_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery → self-join of
    lineitem against its own per-key aggregate (0.5·avg quantity threshold).

    The threshold compare is exact cross-engine: quantities are integral, so
    sum/count divides identical doubles in both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_brand") == "Brand#1")
    thr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thr, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate — orders whose
    total quantity exceeds 240 (integral sums; no float boundary), joined
    back to customers, top-20."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 240)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("price"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (broadcast one-row avg) +
    anti join (no orders in 1997), rolled up per nation."""
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders97 = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders97, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def q_semi_anti_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit semi+anti composition (SURVEY J7): parts shipped in 1997
    (semi) with no 1997 return (anti), per brand."""
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    shipped97 = li.where(in97).select("l_partkey")
    returned = li.where(in97 & (F.col("l_returnflag") == "R")).select(
        F.col("l_partkey").alias("r_partkey")
    )
    return (
        part.join(shipped97, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .join(returned, F.col("p_partkey") == F.col("r_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            # decimal sum → exact, order-independent mean (a plain double avg
            # flipped the 4th decimal vs the oracle at sf0.1)
            F.round(
                F.sum(F.col("p_retailprice").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# window-function suite
# ---------------------------------------------------------------------------


def q_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-function suite: rank / dense_rank / percent_rank /
    cume_dist / ntile(4) over customers per segment; top-5 per segment.

    The order (acctbal DESC, custkey ASC) is a total order, so every ranking
    function is deterministic cross-engine."""
    cust = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rnk") <= 5)
    )


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per order, count and
    sum of the same customer's orders in the preceding 30 days inclusive.

    Spark's rangeBetween needs a numeric axis → exact integer µs; the DuckDB
    oracle uses RANGE BETWEEN INTERVAL 30 DAYS PRECEDING — identical frames
    because both are value-inclusive and µs-exact."""
    orders = load_table(spark, "orders", sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate")))
        .rangeBetween(-30 * _DAY_US, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_recent"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("recent_total"),
    )


def q_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() inter-order gap: days to the customer's next order, averaged
    per market segment (exact integer-µs delta divided once)."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    us = F.unix_micros(F.col("o_orderdate"))
    gap_days = (F.lead(us).over(w) - us) / F.lit(float(_DAY_US))
    return (
        orders.withColumn("gap_days", gap_days)
        .where(F.col("gap_days").isNotNull())
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
            F.round(F.max("gap_days"), 4).alias("max_gap_days"),
        )
    )


def q_nth_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / nth_value / last_value over the full partition frame:
    each customer's first, second, and latest order price by date."""
    orders = load_table(spark, "orders", sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wn = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
            F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
            F.count(F.lit(1)).over(w).alias("n_orders"),
            F.row_number().over(wn).alias("__rn"),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# grouping sets / pivot / unpivot
# ---------------------------------------------------------------------------


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((rf,ls),(rf),(ls)) — an asymmetric set neither
    ROLLUP nor CUBE produces; null group markers coalesced to 'ALL'."""
    li = load_table(spark, "lineitem", sf_dir)
    gs = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )
    return gs.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
        "n_rows",
        "revenue",
    )


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status as a wide table (explicit
    pivot values keep the plan single-pass, no distinct-scan)."""
    orders = load_table(spark, "orders", sf_dir)
    p = orders.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).agg(
        F.count(F.lit(1))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


def q_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: part (p_size, p_retailprice) → long (metric, val), then
    per-metric stats — the wide→long normalization every ML feature pipeline
    needs."""
    part = load_table(spark, "part", sf_dir)
    long = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot(["p_partkey"], ["p_size", "p_retailprice"], "metric", "val")
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 4).alias("mean_val"),
    )


# ---------------------------------------------------------------------------
# percentiles / statistics / sketches
# ---------------------------------------------------------------------------


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/median/p90) per market segment —
    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    rank = p·(n−1) linear-interpolation definition."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


def q_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev, population variance, Pearson
    correlation, population covariance of quantity vs extended price."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
    )


def q_approx_validated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches validated against exact values IN the query:
    the oracle emits the exact values plus literal TRUE flags, so the hash
    comparison proves the sketch landed within tolerance. This keeps
    approx_count_distinct / approx_percentile under the strict gate instead
    of a weaker rows-only check."""
    ev = load_table(spark, "events", sf_dir)
    # Distinct-count aggs in the same Aggregate as percentile aggs force an
    # EXPAND of every input row per distinct column + a sort-based aggregate
    # over the inflated set (~25x slower at sf0.1). Split: pre-distinct the
    # (type, user) pairs for the count side, percentiles on the raw scan,
    # broadcast-join the two 5-row results.
    pairs = ev.select("event_type", "user_id").distinct()
    dcnt = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users_exact"),
        F.approx_count_distinct("user_id").alias("acd"),
    )
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50_exact"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
    )
    agg = dcnt.join(pct, "event_type")
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("acd") - F.col("n_users_exact"))
            <= 0.1 * F.col("n_users_exact")
        ).alias("acd_ok"),
        F.round("p50_exact", 4).alias("p50"),
        (F.abs(F.col("p50_approx") - F.col("p50_exact")) <= F.lit(2.0)).alias("p50_ok"),
    )


# ---------------------------------------------------------------------------
# date/string function coverage + salted aggregation
# ---------------------------------------------------------------------------


def q_date_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar decomposition: per (year, quarter, month) order counts, value,
    and weekend share (dayofweek normalized to DuckDB's Sunday=0)."""
    orders = load_table(spark, "orders", sf_dir)
    dow = F.dayofweek("o_orderdate") - 1  # Spark: 1=Sunday → DuckDB: 0=Sunday
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.sum(F.when(dow.isin(0, 6), 1).otherwise(0)).alias("n_weekend"),
        )
    )


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: case, length, split_part, levenshtein,
    lpad, regexp_replace, concat_ws — all JVM-native, per part row."""
    part = load_table(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").alias("name_len"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.levenshtein("p_brand", F.lit("Brand#3")).alias("lev_to_b3"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (hot-key resilience): result is identical
    to a plain groupBy — the oracle IS the plain groupBy — proving the
    salt/merge decomposition. l_returnflag has only 3 values, so at 100 TB a
    plain groupBy funnels ~33% of rows into single reducers; the salted plan
    spreads each key over 32 tasks with map-side partials."""
    li = load_table(spark, "lineitem", sf_dir)
    out = salted_agg(
        li,
        "l_returnflag",
        {"l_quantity": "sum", "l_extendedprice": "max", "l_orderkey": "count"},
    )
    return out.select(
        "l_returnflag",
        F.col("l_orderkey_count").alias("n_rows"),
        F.round("l_quantity_sum", 2).alias("sum_qty"),
        F.round("l_extendedprice_max", 2).alias("max_price"),
    )
