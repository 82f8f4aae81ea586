"""Round-2 relational surface: structural invariants at sf0.001.

Value-level correctness is gated by the DuckDB oracle comparison
(tools/check_correctness.py); these tests pin the shape invariants that the
hash comparison can't express (rank bounds, frame containment, salt
equivalence to the plain plan).
"""

import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators.text import tfidf_top_terms
from aeon_sleap_processing_spark.plans import relational2 as r2
from aeon_sleap_processing_spark.sources.catalog import load_table


class TestSubqueryShapes:
    def test_q13_distribution_accounts_for_every_customer(self, spark, sf_dir):
        got = r2.q13_order_distribution(spark, sf_dir).toPandas()
        n_cust = load_table(spark, "customer", sf_dir).count()
        assert got.custdist.sum() == n_cust

    def test_q17_threshold_filters_strictly(self, spark, sf_dir):
        got = r2.q17_small_qty_orders(spark, sf_dir).toPandas()
        assert len(got) == 1
        assert got.n_items[0] >= 0

    def test_q18_ordered_and_bounded(self, spark, sf_dir):
        got = r2.q18_large_volume_orders(spark, sf_dir).toPandas()
        assert len(got) <= 20
        assert (got.total_qty > 240).all()
        assert (got.total_qty.diff().dropna() <= 0).all()

    def test_idle_customers_have_no_97_orders(self, spark, sf_dir):
        got = r2.q_idle_customers(spark, sf_dir)
        orders = load_table(spark, "orders", sf_dir)
        # re-derive the anti set and confirm the rollup matches its size
        cust = load_table(spark, "customer", sf_dir)
        avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
        o97 = orders.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        expected = (
            cust.where(F.col("c_acctbal") > avg_bal)
            .join(o97, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .count()
        )
        assert got.agg(F.sum("n_cust")).first()[0] == expected


class TestWindowSuite:
    def test_rank_suite_bounds(self, spark, sf_dir):
        got = r2.q_rank_suite(spark, sf_dir).toPandas()
        assert set(got.rnk) <= {1, 2, 3, 4, 5}
        assert ((got.prnk >= 0) & (got.prnk <= 1)).all()
        assert ((got.cume > 0) & (got.cume <= 1)).all()
        assert set(got.quartile) <= {1, 2, 3, 4}
        # 5 segments x top-5 (acctbal is 2-dec over thousands of customers;
        # rank ties within the top 5 would need exact acctbal collisions)
        assert len(got) >= 5

    def test_range_frame_contains_current_row(self, spark, sf_dir):
        got = r2.q_range_frame(spark, sf_dir).toPandas()
        assert (got.n_recent >= 1).all()
        assert len(got) == load_table(spark, "orders", sf_dir).count()

    def test_nth_order_value_one_row_per_customer(self, spark, sf_dir):
        got = r2.q_nth_order_value(spark, sf_dir).toPandas()
        assert got.o_custkey.is_unique
        single = got[got.n_orders == 1]
        assert single.second_price.isna().all()
        multi = got[got.n_orders >= 2]
        assert multi.second_price.notna().all()


class TestReshapes:
    def test_grouping_sets_three_granularities(self, spark, sf_dir):
        got = r2.q_grouping_sets(spark, sf_dir).toPandas()
        has_rf = got[(got.rf != "ALL") & (got.ls == "ALL")]
        has_ls = got[(got.rf == "ALL") & (got.ls != "ALL")]
        has_both = got[(got.rf != "ALL") & (got.ls != "ALL")]
        assert len(has_rf) and len(has_ls) and len(has_both)
        assert not len(got[(got.rf == "ALL") & (got.ls == "ALL")])  # no () set
        n_li = load_table(spark, "lineitem", sf_dir).count()
        assert has_rf.n_rows.sum() == n_li == has_ls.n_rows.sum()

    def test_pivot_row_sums_match_orders(self, spark, sf_dir):
        got = r2.q_pivot_status(spark, sf_dir).toPandas()
        n_orders = load_table(spark, "orders", sf_dir).count()
        assert (got.n_f + got.n_o + got.n_p).sum() == n_orders

    def test_unpivot_doubles_rows(self, spark, sf_dir):
        got = r2.q_unpivot_part(spark, sf_dir).toPandas()
        n_parts = load_table(spark, "part", sf_dir).count()
        assert sorted(got.metric) == ["p_retailprice", "p_size"]
        assert (got.n == n_parts).all()


class TestStats:
    def test_percentiles_ordered(self, spark, sf_dir):
        got = r2.q_percentiles(spark, sf_dir).toPandas()
        assert ((got.p25 <= got["median"]) & (got["median"] <= got.p90)).all()

    def test_approx_sketches_within_tolerance(self, spark, sf_dir):
        got = r2.q_approx_validated(spark, sf_dir).toPandas()
        assert got.acd_ok.all()
        assert got.p50_ok.all()

    def test_salted_agg_equals_plain_groupby(self, spark, sf_dir):
        got = r2.q_skew_salted_agg(spark, sf_dir).toPandas().set_index("l_returnflag")
        plain = (
            load_table(spark, "lineitem", sf_dir)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            )
            .toPandas()
            .set_index("l_returnflag")
        )
        assert got.sort_index().equals(plain.sort_index())


class TestTfidf:
    def test_topk_and_rank_contiguous(self, spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        got = tfidf_top_terms(docs, top_k=3).toPandas()
        per_doc = got.groupby("doc_id")["rank"].agg(["min", "max", "count"])
        assert (per_doc["min"] == 1).all()
        assert (per_doc["max"] == per_doc["count"]).all()
        assert (per_doc["count"] <= 3).all()
        assert (got.tfidf >= 0).all()

    def test_scores_descend_within_doc(self, spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        got = tfidf_top_terms(docs, top_k=3).toPandas().sort_values(["doc_id", "rank"])
        for _, grp in got.groupby("doc_id"):
            assert (grp.tfidf.diff().dropna() <= 1e-12).all()


class TestStreamingFlavored:
    def test_funnel_rates_bounded(self, spark, sf_dir):
        from aeon_sleap_processing_spark.plans import events_plans as ep

        got = ep.q_funnel(spark, sf_dir).toPandas()
        assert (got.n_converted <= got.n_views).all()
        assert ((got.conv_rate >= 0) & (got.conv_rate <= 1)).all()

    def test_ewma_one_row_per_user(self, spark, sf_dir):
        from aeon_sleap_processing_spark.plans import events_plans as ep

        got = ep.q_ewma(spark, sf_dir).toPandas()
        ev = load_table(spark, "events", sf_dir)
        assert len(got) == ev.select("user_id").distinct().count()
        assert got.avg_ewma.notna().all()

    def test_hopping_window_explodes_4x(self, spark, sf_dir):
        from aeon_sleap_processing_spark.plans import events_plans as ep

        got = ep.q_hopping_window(spark, sf_dir).toPandas()
        n_events = load_table(spark, "events", sf_dir).count()
        assert got.n_events.sum() == 4 * n_events
        # window starts sit on the 15-minute grid
        assert (got.window_start.dt.minute % 15 == 0).all()
        assert (got.window_start.dt.second == 0).all()
