"""Generic relational query surface over the TPC-H-ish star schema (TESTDATA.md).

The reference's analyses are bespoke pipelines, but the engine must expose a
general DataFrame/SQL surface (SURVEY §0 consequence, §2.4 note). These plans
exercise hash aggregation, multi-way joins, semi joins, window top-k — all
native Catalyst; broadcast hints are applied where a dimension side is
guaranteed small (region/nation/supplier scale with SF but stay tiny).

Every computed column is aliased to match the DuckDB oracle SQL in
``__spark_entry__.py``; float aggregates are rounded to fixed decimals so the
driver's value-hash comparison is immune to summation-order ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + hash agg, fully pushdown-friendly."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-heavy top-k: customer ⋈ orders ⋈ lineitem, revenue top-10."""
    cust = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcast dims, agg by nation."""
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


def q_market_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, count per priority."""
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late_items = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp"))
        .select("l_orderkey")
    )
    return (
        orders.join(late_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue top-20 customers with deterministic tie-break."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        F.round(F.avg("p_size"), 4).alias("avg_size"),
    )


def q_nation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation rollup — dim joins broadcast."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


def q_customer_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (SURVEY W12 generalized): top-3 orders per customer."""
    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rnk")
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (SURVEY §2.7): nations with customers vs with suppliers —
    UNION / INTERSECT / EXCEPT rolled into one labeled result."""
    cust_n = (
        load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk")).distinct()
    )
    supp_n = (
        load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk")).distinct()
    )
    both = cust_n.intersect(supp_n).withColumn("category", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("category", F.lit("customers_only"))
    either = cust_n.union(supp_n).distinct().withColumn("category", F.lit("either"))
    return (
        both.unionByName(cust_only)
        .unionByName(either)
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.sum("nk").alias("sum_keys"))
    )


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.4 note: free in Spark, absent in the
    reference) over (returnflag, linestatus)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


def q_lineitem_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (SURVEY P6): first lineitem per (orderkey, partkey) by
    linenumber, then stable rollup."""
    li = load_table(spark, "lineitem", sf_dir)
    # full tiebreak: the data contains duplicate (orderkey, partkey, linenumber)
    # rows with different payloads. r16: settled BACK on the row_number()
    # window form per the r15 verdict's re-measure ask — the r15
    # min(struct(...)) rewrite compiled to SortAggregate with Sorts on
    # BOTH sides (not the hoped partial/final HashAggregate), while the
    # window plan's partial WindowGroupLimit already prunes to one
    # candidate per key per partition map-side; measured equal-to-faster
    # for the window form (paired A/B medians 1.11 s vs 1.19 s at sf0.1;
    # driver r14->r15 read the min-struct rev at 0.89x). Identical
    # results either way (asserted in the A/B, oracle-verified).
    from pyspark.sql import Window as W

    w = W.partitionBy("l_orderkey", "l_partkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    return (
        li.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.

    lineitem filtered to returns joins orders (date-windowed) then the
    customer/nation dims broadcast; top-k via rounded-revenue + key
    tie-break (TakeOrdered, no global sort shuffle)."""
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate over a
    broadcast part join, one scalar row."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-08-01").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates across a
    broadcast part join — exercises OR-of-ANDs predicate planning."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 21))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return j.where(cond).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (priority, status) — all four aggregation
    granularities in one shuffle (SURVEY §2.4 note: the reference has no
    grouping sets; Spark gives them natively)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
