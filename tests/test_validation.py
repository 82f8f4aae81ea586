"""Declarative constraint checking: one-pass evaluation, failure
reporting, and the raising pre-flight form (SURVEY P10 generalized)."""

import pytest


class TestCheckConstraints:
    def test_metrics_and_failures(self, spark):
        from aeon_sleap_processing_spark.operators.validation import (
            check_constraints,
        )

        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", 7.0), (3, None, 2.0), (3, "b", -1.0)],
            "id long, tag string, val double",
        )
        rules = [
            {"name": "id_not_null", "kind": "not_null", "column": "id"},
            {"name": "tag_not_null", "kind": "not_null", "column": "tag"},
            {"name": "id_unique", "kind": "unique", "columns": ["id"]},
            {"name": "val_min", "kind": "min", "column": "val", "lo": 0.0},
            {"name": "val_rng", "kind": "between", "column": "val", "lo": 0.0, "hi": 10.0},
            {"name": "tag_domain", "kind": "accepted_values", "column": "tag",
             "values": ["a", "b"]},
            {"name": "enough_rows", "kind": "row_count_min", "n": 3},
        ]
        out = {r["rule"]: r for r in check_constraints(df, rules).collect()}
        assert out["id_not_null"]["passed"] and out["id_not_null"]["metric"] == 1.0
        assert not out["tag_not_null"]["passed"] and out["tag_not_null"]["metric"] == 0.75
        assert not out["id_unique"]["passed"] and out["id_unique"]["metric"] == 0.75
        assert not out["val_min"]["passed"] and out["val_min"]["metric"] == -1.0
        assert out["val_rng"]["metric"] == 0.75
        assert out["tag_domain"]["passed"]  # nulls excluded, a/a/b all in set
        assert out["enough_rows"]["passed"] and out["enough_rows"]["metric"] == 4.0

    def test_single_job(self, spark):
        """The whole suite must cost ONE aggregation scan — count Spark jobs."""
        from aeon_sleap_processing_spark.operators.validation import (
            check_constraints,
        )

        df = spark.range(1000).selectExpr("id", "id % 7 AS g")
        rules = [
            {"name": "a", "kind": "not_null", "column": "id"},
            {"name": "b", "kind": "min", "column": "g", "lo": 0},
            {"name": "c", "kind": "row_count_min", "n": 10},
        ]
        st = spark.sparkContext.statusTracker()
        check_constraints(df, rules).collect()  # warm
        j0 = max(st.getJobIdsForGroup() or [0])
        check_constraints(df, rules).collect()
        j1 = max(st.getJobIdsForGroup() or [0])
        assert j1 - j0 <= 2  # AQE may split once; N rules must not mean N jobs

    def test_fast_unique_happy_path_single_scan(self, spark):
        """check_constraints_fast on truly-unique keys: the approx HLL
        read passes the 1-3*rsd bar, so the suite stays ONE aggregation
        (no exact confirmation job)."""
        from aeon_sleap_processing_spark.operators.validation import (
            check_constraints_fast,
        )

        df = spark.range(20_000).selectExpr("id", "id % 7 AS g")
        rules = [
            {"name": "pk", "kind": "unique", "columns": ["id"]},
            {"name": "nn", "kind": "not_null", "column": "g"},
        ]
        st = spark.sparkContext.statusTracker()
        check_constraints_fast(df, rules).collect()  # warm
        j0 = max(st.getJobIdsForGroup() or [0])
        out = {r["rule"]: r for r in check_constraints_fast(df, rules).collect()}
        j1 = max(st.getJobIdsForGroup() or [0])
        assert out["pk"]["passed"] and out["nn"]["passed"]
        assert 0.9 <= out["pk"]["metric"] <= 1.0
        # one agg over df (<=2 with an AQE split) + the one-row local
        # createDataFrame collect; NO exact-confirmation scan of df
        # (which would add its own 1-2 jobs — see violation test).
        assert j1 - j0 <= 3

    def test_fast_unique_violation_confirmed_exactly(self, spark):
        """A real violation (25% dups) drops the approx ratio far below
        the bar -> the exact confirmation pass replaces the metric with
        the exact value, so the reported failure is never a false
        alarm."""
        from aeon_sleap_processing_spark.operators.validation import (
            check_constraints_fast,
        )

        df = spark.range(1000).selectExpr("id % 750 AS k")
        out = {
            r["rule"]: r
            for r in check_constraints_fast(
                df, [{"name": "k_unique", "kind": "unique", "columns": ["k"]}]
            ).collect()
        }
        assert not out["k_unique"]["passed"]
        assert out["k_unique"]["metric"] == 0.75  # exact, not approx

    def test_assert_raises_with_names(self, spark):
        from aeon_sleap_processing_spark.operators.validation import (
            assert_constraints,
        )

        df = spark.createDataFrame([(1,), (1,)], "id long")
        with pytest.raises(ValueError, match="id_unique"):
            assert_constraints(
                df, [{"name": "id_unique", "kind": "unique", "columns": ["id"]}]
            )


class TestStreamConstraints:
    def test_per_batch_audit_rows(self, spark, tmp_path):
        """Two micro-batches, the second violating a rule: the audit sink
        holds one row per (batch, rule) with the violation localized to its
        batch — continuous ingest-time DQ monitoring."""
        import pandas as pd

        from aeon_sleap_processing_spark.streaming.watch import (
            stream_check_constraints,
        )

        T0 = pd.Timestamp("2024-05-01 00:00:00")
        src, audit = str(tmp_path / "src"), str(tmp_path / "audit")
        good = pd.DataFrame({"time": [T0], "val": [5.0]})
        bad = pd.DataFrame({"time": [T0 + pd.Timedelta(minutes=1)], "val": [-3.0]})
        spark.createDataFrame(good).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(bad).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("time timestamp, val double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rules = [{"name": "val_min", "kind": "min", "column": "val", "lo": 0.0}]
        q = (
            stream_check_constraints(stream, rules, audit)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(audit).orderBy("batch_id").collect()
        assert len(rows) == 2
        assert {r["passed"] for r in rows} == {True, False}
        failed = [r for r in rows if not r["passed"]][0]
        assert failed["rule"] == "val_min" and failed["metric"] == -3.0

    def test_fast_unique_monitor(self, spark, tmp_path):
        """fast_unique=True on the streaming monitor: a duplicated key in
        one micro-batch is reported with the EXACT metric (confirmation
        pass), unique batches pass on the approx read."""
        from aeon_sleap_processing_spark.streaming.watch import (
            stream_check_constraints,
        )

        src, audit = str(tmp_path / "src"), str(tmp_path / "audit")
        spark.range(100).coalesce(1).write.mode("append").parquet(src)
        spark.range(100).selectExpr("id % 50 AS id").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        rules = [{"name": "id_unique", "kind": "unique", "columns": ["id"]}]
        q = (
            stream_check_constraints(stream, rules, audit, fast_unique=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {r["batch_id"]: r for r in spark.read.parquet(audit).collect()}
        assert rows[0]["passed"]
        assert not rows[1]["passed"] and rows[1]["metric"] == 0.5  # exact


class TestFastUniqueNullKeys:
    def test_null_heavy_composite_key_fails_like_exact(self, spark):
        """r8 ADVICE (medium): count_distinct(*cols) drops any-null
        tuples, so a composite key with an always-null column has exact
        metric ~0 (FAIL); the approx path must not count those tuples via
        a never-null struct() and report a false PASS. The null-gated
        approx ratio lands near 0, triggers the exact confirmation, and
        the fast result equals the exact one."""
        from aeon_sleap_processing_spark.operators.validation import (
            check_constraints,
            check_constraints_fast,
        )

        df = spark.range(1000).selectExpr(
            "id", "CAST(NULL AS STRING) AS col2"
        )
        rules = [{"name": "ck", "kind": "unique", "columns": ["id", "col2"]}]
        exact = check_constraints(df, rules).collect()[0]
        fast = check_constraints_fast(df, rules).collect()[0]
        assert not exact["passed"]
        assert not fast["passed"]
        assert fast["metric"] == exact["metric"] == 0.0

    def test_partial_null_key_matches_exact_semantics(self, spark):
        """Half the key tuples contain a null: exact metric = 0.5 (only
        non-null tuples counted, denominator all rows); fast must agree
        after confirmation rather than reading ~1.0."""
        from aeon_sleap_processing_spark.operators.validation import (
            check_constraints,
            check_constraints_fast,
        )

        df = spark.range(1000).selectExpr(
            "id", "CASE WHEN id % 2 = 0 THEN id END AS col2"
        )
        rules = [{"name": "ck", "kind": "unique", "columns": ["id", "col2"]}]
        exact = check_constraints(df, rules).collect()[0]
        fast = check_constraints_fast(df, rules).collect()[0]
        assert exact["metric"] == 0.5 and not exact["passed"]
        assert fast["metric"] == 0.5 and not fast["passed"]
