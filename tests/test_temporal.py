"""Temporal operator kit vs pandas oracles (SURVEY §5: differential tests)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators import temporal as Tm


def _ts(sec):
    return pd.Timestamp("2024-01-01") + pd.to_timedelta(sec, unit="s")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestAsofJoin:
    def _frames(self, spark, rng, n_left=200, n_right=80):
        lt = np.sort(rng.uniform(0, 100, n_left))
        rt = np.sort(rng.uniform(0, 100, n_right))
        left = pd.DataFrame({"time": [_ts(t) for t in lt], "lv": np.arange(n_left)})
        right = pd.DataFrame({"time": [_ts(t) for t in rt], "rv": np.arange(n_right) * 10.0})
        return left, right, spark.createDataFrame(left), spark.createDataFrame(right)

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("tolerance", [None, 0.5])
    def test_matches_pandas_merge_asof(self, spark, rng, direction, tolerance):
        lpd, rpd, lsp, rsp = self._frames(spark, rng)
        got = (
            Tm.asof_join(lsp, rsp, on="time", tolerance=tolerance, direction=direction)
            .orderBy("lv")
            .toPandas()
        )
        tol = pd.Timedelta(seconds=tolerance) if tolerance else None
        exp = pd.merge_asof(lpd, rpd, on="time", direction=direction, tolerance=tol)
        assert len(got) == len(exp)
        pd.testing.assert_series_equal(
            got["rv"].reset_index(drop=True), exp["rv"].reset_index(drop=True), check_names=False
        )

    def test_by_keys(self, spark, rng):
        lt = np.sort(rng.uniform(0, 50, 120))
        rt = np.sort(rng.uniform(0, 50, 60))
        left = pd.DataFrame(
            {"time": [_ts(t) for t in lt], "k": rng.integers(0, 3, 120), "lv": np.arange(120)}
        )
        right = pd.DataFrame(
            {"time": [_ts(t) for t in rt], "k": rng.integers(0, 3, 60), "rv": np.arange(60) * 1.0}
        )
        got = (
            Tm.asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="time",
                by="k",
                direction="backward",
            )
            .orderBy("lv")
            .toPandas()
        )
        exp = pd.merge_asof(
            left.sort_values("time"), right.sort_values("time"), on="time", by="k"
        ).sort_values("lv")
        pd.testing.assert_series_equal(
            got["rv"].reset_index(drop=True), exp["rv"].reset_index(drop=True), check_names=False
        )

    def test_name_collision_suffix(self, spark, rng):
        _, _, lsp, rsp = self._frames(spark, rng, 10, 5)
        rsp2 = rsp.withColumnRenamed("rv", "lv")
        out = Tm.asof_join(lsp, rsp2, on="time")
        assert "lv_right" in out.columns and "lv" in out.columns


class TestChunkedAsofJoin:
    """chunked_asof_join must be exactly equivalent to the global asof_join
    for every direction/tolerance combination — the chunking is a physical
    re-partitioning, not a semantics change."""

    def _frames(self, spark, rng, n_left=300, n_right=60):
        # right rows clustered in bursts with long empty stretches, so carry
        # rows must cross several EMPTY chunks (the hard case)
        lt = np.sort(rng.uniform(0, 200, n_left))
        rt = np.sort(
            np.concatenate([rng.uniform(10, 25, n_right // 2), rng.uniform(150, 160, n_right // 2)])
        )
        left = pd.DataFrame({"time": [_ts(t) for t in lt], "lv": np.arange(n_left)})
        right = pd.DataFrame({"time": [_ts(t) for t in rt], "rv": np.arange(len(rt)) * 10.0})
        return spark.createDataFrame(left), spark.createDataFrame(right)

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("tolerance", [None, 3.0])
    def test_equivalent_to_global(self, spark, rng, direction, tolerance):
        lsp, rsp = self._frames(spark, rng)
        got = (
            Tm.chunked_asof_join(
                lsp, rsp, on="time", tolerance=tolerance, direction=direction, chunk=20.0
            )
            .orderBy("lv")
            .toPandas()
        )
        exp = (
            Tm.asof_join(lsp, rsp, on="time", tolerance=tolerance, direction=direction)
            .orderBy("lv")
            .toPandas()
        )
        assert list(got.columns) == list(exp.columns)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True)
        )

    def test_with_by_keys(self, spark, rng):
        lt = np.sort(rng.uniform(0, 100, 200))
        rt = np.sort(rng.uniform(0, 100, 50))
        left = pd.DataFrame(
            {"time": [_ts(t) for t in lt], "k": rng.integers(0, 3, 200), "lv": np.arange(200)}
        )
        right = pd.DataFrame(
            {"time": [_ts(t) for t in rt], "k": rng.integers(0, 3, 50), "rv": np.arange(50) * 1.0}
        )
        lsp, rsp = spark.createDataFrame(left), spark.createDataFrame(right)
        got = (
            Tm.chunked_asof_join(lsp, rsp, on="time", by="k", direction="nearest", chunk=10.0)
            .orderBy("lv")
            .toPandas()
        )
        exp = Tm.asof_join(lsp, rsp, on="time", by="k", direction="nearest").orderBy("lv").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))

    def test_numeric_axis(self, spark, rng):
        left = pd.DataFrame({"x": np.sort(rng.uniform(0, 1000, 150)), "lv": np.arange(150)})
        right = pd.DataFrame({"x": np.sort(rng.uniform(0, 1000, 40)), "rv": np.arange(40) * 1.0})
        lsp, rsp = spark.createDataFrame(left), spark.createDataFrame(right)
        got = (
            Tm.chunked_asof_join(lsp, rsp, on="x", direction="backward", tolerance=50.0, chunk=100.0)
            .orderBy("lv")
            .toPandas()
        )
        exp = (
            Tm.asof_join(lsp, rsp, on="x", direction="backward", tolerance=50.0)
            .orderBy("lv")
            .toPandas()
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))

    def test_partitioned_sort_in_plan(self, spark, rng):
        lsp, rsp = self._frames(spark, rng, 50, 20)
        plan = (
            Tm.chunked_asof_join(lsp, rsp, on="time", chunk=20.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the asof window must be partitioned by the chunk key, not global
        assert "__chunk" in plan


class TestSessionize:
    def test_frame_gap_sessions(self, spark):
        # gaps > 20 split; sessions with <= 3 rows dropped (reference gap 20 / min 15 shape)
        frames = [0, 1, 2, 3, 50, 51, 100, 101, 102, 103, 104]
        df = spark.createDataFrame(pd.DataFrame({"frame_id": frames}))
        out = Tm.sessionize(df, "frame_id", gap=20, min_size=3).toPandas()
        sessions = out.groupby("session_id")["frame_id"].agg(["min", "max", "count"])
        assert len(sessions) == 2  # [0..3] and [100..104]; [50,51] dropped
        assert set(sessions["count"]) == {4, 5}

    def test_no_intra_session_gap_property(self, spark, rng):
        vals = np.unique(rng.integers(0, 1000, 300))
        df = spark.createDataFrame(pd.DataFrame({"frame_id": [int(v) for v in vals]}))
        out = Tm.sessionize(df, "frame_id", gap=10).toPandas().sort_values("frame_id")
        for _, grp in out.groupby("session_id"):
            assert grp["frame_id"].diff().dropna().max() <= 10 if len(grp) > 1 else True
        # consecutive sessions separated by > gap
        bounds = out.groupby("session_id")["frame_id"].agg(["min", "max"]).sort_values("min")
        gaps = bounds["min"].values[1:] - bounds["max"].values[:-1]
        assert (gaps > 10).all()

    def test_timestamp_gap(self, spark):
        times = [_ts(s) for s in [0, 0.02, 0.04, 5.0, 5.02]]
        df = spark.createDataFrame(pd.DataFrame({"time": times}))
        out = Tm.sessionize(df, "time", gap=1.0).toPandas()
        assert out["session_id"].nunique() == 2


class TestIntervalFilter:
    def test_semi_and_anti(self, spark):
        data = pd.DataFrame({"time": [_ts(s) for s in range(10)], "v": range(10)})
        iv = pd.DataFrame({"start": [_ts(2), _ts(7)], "end": [_ts(4), _ts(8)]})
        df, ivdf = spark.createDataFrame(data), spark.createDataFrame(iv)
        inside = Tm.interval_filter(df, ivdf, mode="semi").toPandas()["v"].tolist()
        outside = Tm.interval_filter(df, ivdf, mode="anti").toPandas()["v"].tolist()
        assert sorted(inside) == [2, 3, 4, 7, 8]
        assert sorted(outside) == [0, 1, 5, 6, 9]


class TestFills:
    def test_ffill_matches_pandas(self, spark, rng):
        v = rng.uniform(0, 1, 50)
        v[rng.random(50) < 0.4] = np.nan
        df = pd.DataFrame({"time": [_ts(i) for i in range(50)], "v": v})
        got = Tm.ffill(spark.createDataFrame(df), "v", "time").orderBy("time").toPandas()
        exp = df["v"].ffill()
        np.testing.assert_allclose(got["v"].values, exp.values)

    def test_rolling_mean_zero_pad_matches_convolve(self, spark, rng):
        v = rng.uniform(0, 10, 40)
        df = pd.DataFrame({"time": [_ts(i) for i in range(40)], "v": v})
        got = (
            Tm.rolling_mean(spark.createDataFrame(df), "v", "sm", "time", before=5, after=4)
            .orderBy("time")
            .toPandas()
        )
        exp = np.convolve(v, np.ones(10) / 10, mode="same")
        np.testing.assert_allclose(got["sm"].values, exp, rtol=1e-9)

    def test_gap_fill_bounded(self, spark):
        # run of 2 nulls flanked by equal values within 15s → filled;
        # run flanked by different values and > fill_any span → left null
        t = [_ts(s) for s in [0, 1, 2, 3, 4, 20, 21, 22]]
        v = ["A", None, None, "A", "B", None, None, "C"]
        df = spark.createDataFrame(pd.DataFrame({"time": t, "v": v}))
        out = (
            Tm.gap_fill_bounded(df, "v", "time", fill_any_max=0.1, fill_equal_max=15.0, flag_col="bad")
            .orderBy("time")
            .toPandas()
        )
        assert out["v"].tolist() == ["A", "A", "A", "A", "B", None, None, "C"]
        assert out["bad"].tolist() == [False, False, False, False, False, True, True, False]


class TestMisc:
    def test_state_changes(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"time": [_ts(i) for i in range(6)], "s": ["E", "E", "M", "M", "E", "E"]}
            )
        )
        out = Tm.state_changes(df, "s", "time").orderBy("time").toPandas()
        assert out["s"].tolist() == ["E", "M", "E"]

    def test_dedup_keep_first(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"k": [1, 1, 2], "t": [5, 3, 1], "v": ["a", "b", "c"]})
        )
        out = Tm.dedup_keep_first(df, "k", "t").orderBy("k").toPandas()
        assert out["v"].tolist() == ["b", "c"]

    def test_mode_per_group(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"g": [1, 1, 1, 2, 2], "v": ["x", "x", "y", "z", "w"]})
        )
        out = Tm.mode_per_group(df, "g", "v").orderBy("g").toPandas()
        assert out["mode"].tolist() == ["x", "w"]  # tie in g=2 → smallest value

    def test_resample_ticks(self, spark):
        base = spark.range(1)
        out = Tm.resample_ticks(base, "2024-01-01 00:00:00", "2024-01-01 00:00:01", 20_000)
        ticks = out.toPandas()["tick"]
        assert len(ticks) == 51  # inclusive 1s span at 20ms
        deltas = ticks.diff().dropna().dt.total_seconds().unique()
        np.testing.assert_allclose(deltas, [0.02])

    def test_resample_ticks_string_path_matches_column_path(self, spark):
        """The string fast path must resolve endpoints exactly like the
        column path's cast('timestamp') — including offset-bearing strings,
        which a naive driver-side tz_localize rejects."""
        base = spark.range(1)
        for s, e in [
            ("2024-01-01 00:00:00", "2024-01-01 00:00:01"),
            ("2024-01-01 00:00:00+05:30", "2024-01-01 00:00:01+05:30"),
        ]:
            fast = Tm.resample_ticks(base, s, e, 250_000).toPandas()["tick"]
            slow = Tm.resample_ticks(
                base, F.lit(s).cast("timestamp"), F.lit(e).cast("timestamp"), 250_000
            ).toPandas()["tick"]
            assert fast.tolist() == slow.tolist()

    def test_resample_ticks_unparseable_raises(self, spark):
        # under ANSI (Spark 4 default) the cast itself throws — the same
        # error the column path produces; with ANSI off the null-check
        # raises ValueError. Either way: a clear error, not a bad grid.
        from pyspark.errors.exceptions.captured import DateTimeException

        with pytest.raises((ValueError, DateTimeException)):
            Tm.resample_ticks(spark.range(1), "not-a-time", "2024-01-01", 1_000_000)


class TestAsofNullValues:
    def test_null_value_in_nearest_row_not_skipped(self, spark):
        """A matched right row with a NULL value column must yield NULL —
        not reach back to an older (out-of-tolerance) right row."""
        left = pd.DataFrame({"time": [_ts(3.0)], "lv": [0]})
        right = pd.DataFrame({"time": [_ts(1.0), _ts(2.0)], "rv": [5.0, np.nan]})
        got = (
            Tm.asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="time",
                direction="backward",
                tolerance=1.5,
            )
            .toPandas()
        )
        exp = pd.merge_asof(
            left, right, on="time", direction="backward",
            tolerance=pd.Timedelta(seconds=1.5),
        )
        # pandas matches the t=2.0 row whose value is NaN
        assert np.isnan(exp.rv.iloc[0])
        assert pd.isna(got.rv.iloc[0])

    def test_multiple_value_columns_same_row(self, spark, rng):
        """All value columns must come from the SAME matched right row."""
        left = pd.DataFrame({"time": [_ts(10.0)], "lv": [0]})
        right = pd.DataFrame(
            {"time": [_ts(5.0), _ts(9.0)], "a": [1.0, np.nan], "b": [np.nan, 2.0]}
        )
        got = Tm.asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), on="time"
        ).toPandas()
        # nearest row (t=9.0) has a=NaN, b=2.0 — no mixing with the t=5.0 row
        assert pd.isna(got.a.iloc[0])
        assert got.b.iloc[0] == 2.0


class TestChunkedSessionize:
    """chunked_sessionize must match the global sessionize exactly, including
    session numbering, sessions spanning several (possibly empty) chunks, and
    the min_size filter applied on merged sessions."""

    def _df(self, spark, rng, n=400):
        # bursts with gaps both smaller and larger than the session gap, laid
        # across many chunk boundaries
        t = np.cumsum(rng.choice([0.5, 1.0, 30.0, 130.0], size=n, p=[0.5, 0.3, 0.15, 0.05]))
        return spark.createDataFrame(
            pd.DataFrame({"time": [_ts(x) for x in t], "v": np.arange(n)})
        )

    @pytest.mark.parametrize("min_size", [None, 3])
    def test_equivalent_to_global(self, spark, rng, min_size):
        df = self._df(spark, rng)
        got = (
            Tm.chunked_sessionize(df, "time", gap=60.0, chunk=100.0, min_size=min_size)
            .orderBy("v")
            .toPandas()
        )
        exp = (
            Tm.sessionize(df, "time", gap=60.0, min_size=min_size)
            .orderBy("v")
            .toPandas()
        )
        assert list(got.columns) == list(exp.columns)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))

    def test_session_spanning_empty_chunks(self, spark):
        # rows at 0s and 90s with chunk=30s: chunks 0 and 3, chunks 1-2 empty;
        # gap 120s keeps them in ONE session across the empty chunks
        df = spark.createDataFrame(
            pd.DataFrame({"time": [_ts(0), _ts(90)], "v": [0, 1]})
        )
        got = Tm.chunked_sessionize(df, "time", gap=120.0, chunk=30.0).toPandas()
        assert got.session_id.nunique() == 1
        got2 = Tm.chunked_sessionize(df, "time", gap=60.0, chunk=30.0).toPandas()
        assert sorted(got2.session_id) == [1, 2]

    def test_numeric_axis(self, spark, rng):
        df = spark.createDataFrame(
            pd.DataFrame({"x": np.sort(rng.uniform(0, 5000, 300)), "v": np.arange(300)})
        )
        got = Tm.chunked_sessionize(df, "x", gap=25.0, chunk=500.0).orderBy("v").toPandas()
        exp = Tm.sessionize(df, "x", gap=25.0).orderBy("v").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))


class TestChunkedFfill:
    """chunked_ffill must match the global ffill exactly: fills crossing one
    or many (possibly all-null) chunks, several columns with different null
    patterns, leading nulls, numeric and timestamp axes."""

    def _df(self, rng, n=500):
        a = rng.uniform(0, 1, n)
        b = rng.uniform(0, 1, n)
        # a: scattered nulls; b: long null runs spanning whole chunks,
        # plus leading nulls on both
        a[rng.uniform(0, 1, n) < 0.4] = np.nan
        b[50:320] = np.nan
        a[:3] = np.nan
        b[:3] = np.nan
        return pd.DataFrame(
            {"time": [_ts(x) for x in np.sort(rng.uniform(0, 1000, n))], "a": a, "b": b,
             "v": np.arange(n)}
        )

    @pytest.mark.parametrize("chunk", [37.0, 100.0, 10000.0])
    def test_equivalent_to_global(self, spark, rng, chunk):
        pdf = self._df(rng)
        df = spark.createDataFrame(pdf)
        got = (
            Tm.chunked_ffill(df, ["a", "b"], order_col="time", chunk=chunk)
            .orderBy("v")
            .toPandas()
        )
        exp = Tm.ffill(df, ["a", "b"], order_col="time").orderBy("v").toPandas()
        assert list(got.columns) == list(exp.columns)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))

    def test_numeric_axis(self, spark, rng):
        n = 300
        vals = rng.uniform(0, 1, n)
        vals[rng.uniform(0, 1, n) < 0.6] = np.nan
        pdf = pd.DataFrame({"x": np.sort(rng.uniform(0, 3000, n)), "a": vals, "v": np.arange(n)})
        df = spark.createDataFrame(pdf)
        got = Tm.chunked_ffill(df, "a", order_col="x", chunk=250.0).orderBy("v").toPandas()
        exp = Tm.ffill(df, "a", order_col="x").orderBy("v").toPandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True))


class TestInterpolateLinear:
    def test_linear_values_and_caps(self, spark):
        import pandas as pd

        from aeon_sleap_processing_spark.operators.temporal import interpolate_linear

        t0 = pd.Timestamp("2024-01-01")
        pdf = pd.DataFrame(
            {
                "k": ["a"] * 7,
                "time": [t0 + pd.Timedelta(seconds=s) for s in (0, 10, 20, 30, 40, 100, 160)],
                "v": [1.0, None, None, 4.0, None, None, 16.0],
            }
        )
        got = (
            interpolate_linear(
                spark.createDataFrame(pdf), "v", partition_by="k", max_gap=50.0
            )
            .toPandas()
            .sort_values("time", ignore_index=True)
        )
        # 0..30 s span (30 s <= cap): linear 1 -> 4
        assert got.v[1] == 2.0 and got.v[2] == 3.0
        # 30..160 s span (130 s > cap): stays null
        assert pd.isna(got.v[4]) and pd.isna(got.v[5])

    def test_edges_stay_null(self, spark):
        import pandas as pd

        from aeon_sleap_processing_spark.operators.temporal import interpolate_linear

        t0 = pd.Timestamp("2024-01-01")
        pdf = pd.DataFrame(
            {
                "k": ["a"] * 3,
                "time": [t0 + pd.Timedelta(seconds=s) for s in (0, 10, 20)],
                "v": [None, 5.0, None],
            }
        )
        got = (
            interpolate_linear(spark.createDataFrame(pdf), "v", partition_by="k")
            .toPandas()
            .sort_values("time", ignore_index=True)
        )
        assert pd.isna(got.v[0]) and got.v[1] == 5.0 and pd.isna(got.v[2])

    def test_numeric_axis(self, spark):
        import pandas as pd

        from aeon_sleap_processing_spark.operators.temporal import interpolate_linear

        pdf = pd.DataFrame(
            {"k": ["a"] * 3, "time": [0.0, 1.0, 4.0], "v": [0.0, None, 8.0]}
        )
        got = (
            interpolate_linear(spark.createDataFrame(pdf), "v", partition_by="k")
            .toPandas()
            .sort_values("time", ignore_index=True)
        )
        assert got.v[1] == 2.0  # 0 + (8-0) * (1-0)/(4-0)
