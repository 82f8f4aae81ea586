"""The engine exposes a plain spark.sql surface over registered views."""

from pyspark.sql import functions as F

from aeon_sleap_processing_spark.sources.catalog import register_views


class TestSqlSurface:
    def test_register_views_and_query(self, spark, sf_dir):
        register_views(spark, sf_dir)
        got = spark.sql(
            """
            SELECT c_mktsegment, count(*) AS n
            FROM customer GROUP BY c_mktsegment ORDER BY n DESC
            """
        ).toPandas()
        assert len(got) == 5
        assert got.n.sum() == spark.table("customer").count()

    def test_views_cover_all_tables(self, spark, sf_dir):
        register_views(spark, sf_dir)
        for t in ["region", "nation", "lineitem", "events", "documents", "embeddings"]:
            assert spark.table(t).count() > 0

    def test_nanos_table_queryable_via_sql(self, spark, sf_dir):
        register_views(spark, sf_dir)
        got = spark.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM events").first()
        assert got["lo"].year == 2024
