"""Round-3 relational surface: the remaining partsupp-free TPC-H shapes
(Q8 market share, Q15 top supplier), correlated EXISTS, top-k-per-group,
exact percentiles, cumulative-share windows, equi-width histograms, and a
dimension-grid outer join.

Conventions match ``relational.py``/``relational2.py``: every computed column
aliased identically to the DuckDB oracle, float aggregates rounded, every
top-k fully tie-broken on the ROUNDED metric plus id columns.

Scale notes (100 TB):
- Q8 joins fact→dims with every dimension broadcast; the only shuffle is the
  final tiny groupBy on (year).
- Q15's scalar max is a one-row broadcast back against the per-supplier
  aggregate — no second shuffle of lineitem.
- ``q_top3_parts_per_brand`` ranks inside a (brand) hash partition — no
  global sort; the per-group state is one heap of size k.
- ``q_cumulative_share`` partitions the window by nation — the running sum
  never needs a global order.
- ``q_exists_correlated``'s per-nation average is a 25-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1 suppliers' share of revenue per order-year
    among orders from customers in REGION_0 — two nation roles, a region
    restriction, and a conditional-sum-over-sum share."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "REGION_0")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # decimal sums: order-independent, so the share ratio and the
            # rounded total are bit-deterministic vs the oracle
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", vol)
                    .otherwise(F.lit(0.0))
                    .cast("decimal(18,4)")
                ).cast("double")
                / F.sum(vol.cast("decimal(18,4)")).cast("double"),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol.cast("decimal(18,4)")), 2).cast("double").alias("total_volume"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view over a shipdate quarter, then the
    supplier(s) achieving the scalar MAX revenue (broadcast one-row join —
    never a sort of the aggregate)."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, "supplier", sf_dir)
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (general W12): top-3 parts by lineitem revenue within
    each brand, ranked on the ROUNDED revenue with p_partkey tie-break so both
    engines pick identical rows."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    per_part = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    w = W.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rank")
    )


def q_percentile_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (A-series): median / p90 of
    customer balance per market segment. Spark ``percentile`` and DuckDB
    ``quantile_cont`` share linear-interpolation semantics."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


def q_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-share window (running sum / partition total): per customer
    nation, monthly revenue and its running share of the nation's total.
    Share divides a ROUNDED running sum by a ROUNDED total so both engines
    quantize identically before the division."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    # DECIMAL-typed sum: exact and order-independent, so a monthly total
    # landing on a cent boundary (observed: 2305604.135) cannot round
    # differently under Spark's vs the oracle's partial-sum order. Each
    # double term quantizes identically in both engines (same input double,
    # ties at the 4th decimal never exact in binary), and decimal addition
    # is associative — the one trick plain double sums can't offer.
    term = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.sum(term).alias("rev_dec"))
    )
    w = W.partitionBy("n_name").orderBy("month").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy("n_name")
    return monthly.select(
        "n_name",
        "month",
        F.round(F.col("rev_dec"), 2).cast("double").alias("rev"),
        F.round(
            F.sum("rev_dec").over(w).cast("double") / F.sum("rev_dec").over(wt).cast("double"),
            6,
        ).alias("cum_share"),
    )


def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + correlated scalar threshold: customers with at
    least one URGENT order AND balance above their nation's average, counted
    per nation. The per-nation average is a 25-row broadcast; EXISTS is a
    left-semi join (no row multiplication)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    nation = load_table(spark, "nation", sf_dir)
    nat_avg = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(nat_avg), F.col("c_nationkey") == F.col("nk"))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rich_active"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (A7 1-D form): order totals bucketed at width
    20000, with count and rounded sum per bucket — floor arithmetic shared
    verbatim with the oracle."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.withColumn("bucket", F.floor(F.col("o_totalprice") / F.lit(20000.0)).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


def q_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-grid outer join: the full region × order-status cross grid
    (cross join of two tiny dims) left-joined against observed counts,
    absent cells filled with zero — the dense-reporting reshape."""
    region = load_table(spark, "region", sf_dir).select("r_name")
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    statuses = orders.select(F.col("o_orderstatus").alias("status")).distinct()
    grid = region.crossJoin(statuses)
    observed = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(load_table(spark, "region", sf_dir)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("g_region"), F.col("o_orderstatus").alias("g_status"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        # observed is a |regions|x|statuses| aggregate (tiny) — broadcast it
        # so the grid join never sort-merges
        grid.join(
            F.broadcast(observed),
            (F.col("r_name") == F.col("g_region")) & (F.col("status") == F.col("g_status")),
            "left",
        )
        .select(
            "r_name",
            "status",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure predicate scan-aggregate, no join. All three
    predicates (shipdate range, discount band, quantity cap) push down to the
    parquet scan; at 100 TB this is a single map-side partial-agg pass with a
    one-row exchange — the cheapest possible full-table query."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q12_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: testdata has no l_shipmode, so l_linestatus
    plays the ship-mode role): per linestatus, conditional two-way counts of
    high- vs low-priority orders shipped in 1997. One fact→fact equi-join on
    orderkey, then CASE-sum aggregation — the join shuffles once on orderkey
    and the agg is map-side combinable on 2 groups."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 join topology (adapted: no l_receiptdate, so l_returnflag='R'
    plays the late-delivery role): suppliers whose item was returned in a
    multi-supplier order where NO other supplier's item was returned —
    a correlated EXISTS + NOT EXISTS pair, expressed as a left-semi and a
    left-anti self-join on lineitem keyed by orderkey with a supplier
    inequality residual.

    Scale: both self-joins shuffle on l_orderkey only (the inequality is a
    post-join residual on the equi-hash match), so all three lineitem legs
    co-partition — one exchange each, no cartesian blowup. Supplier/nation
    are broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).where(F.col("n_name").isin("NATION_1", "NATION_2"))
    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    others_r = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            others_r,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )
