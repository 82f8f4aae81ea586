"""Property-based tests (hypothesis) for the temporal kit invariants
(SURVEY §5: as-of |Δt| ≤ tolerance & nearest; sessionization gap bounds)."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aeon_sleap_processing_spark.operators import temporal as Tm

_T0 = pd.Timestamp("2024-01-01")


def _ts(sec):
    return _T0 + pd.to_timedelta(sec, unit="s")


times = st.lists(
    st.floats(min_value=0, max_value=100, allow_nan=False), min_size=1, max_size=40
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(lt=times, rt=times, tol=st.floats(min_value=0.01, max_value=10))
def test_asof_nearest_properties(spark_global, lt, rt, tol):
    # quantize to Spark's µs timestamp resolution before dedup; the tolerance
    # is quantized by asof_join itself, so mirror it here too
    lt = sorted({round(t * 1e6) / 1e6 for t in lt})
    rt = sorted({round(t * 1e6) / 1e6 for t in rt})
    tol = round(tol * 1e6) / 1e6
    left = pd.DataFrame({"time": [_ts(t) for t in lt], "lsec": lt})
    right = pd.DataFrame({"time": [_ts(t) for t in rt], "rsec": rt})
    got = (
        Tm.asof_join(
            spark_global.createDataFrame(left),
            spark_global.createDataFrame(right),
            on="time",
            tolerance=tol,
            direction="nearest",
        )
        .toPandas()
        .sort_values("lsec")
    )
    assert len(got) == len(lt)  # left rows always preserved
    for _, row in got.iterrows():
        deltas = np.abs(np.array(rt) - row.lsec)
        if pd.isna(row.rsec):
            assert deltas.min() > tol + 1e-9  # unmatched iff nothing in reach
        else:
            d = abs(row.rsec - row.lsec)
            assert d <= tol + 1e-9
            assert d <= deltas.min() + 1e-9  # nearest


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    frames=st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=60),
    gap=st.integers(min_value=1, max_value=50),
)
def test_sessionize_gap_invariants(spark_global, frames, gap):
    frames = sorted(set(frames))
    df = spark_global.createDataFrame(pd.DataFrame({"frame_id": frames}))
    out = Tm.sessionize(df, "frame_id", gap=gap).toPandas().sort_values("frame_id")
    # every row assigned; session ids contiguous from 1
    assert len(out) == len(frames)
    bounds = out.groupby("session_id")["frame_id"].agg(["min", "max"]).sort_values("min")
    # intra-session gaps <= gap
    for sid, grp in out.groupby("session_id"):
        diffs = grp["frame_id"].diff().dropna()
        assert (diffs <= gap).all()
    # inter-session gaps > gap
    inter = bounds["min"].values[1:] - bounds["max"].values[:-1]
    assert (inter > gap).all()


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lt=times,
    rt=times,
    tol=st.one_of(st.none(), st.floats(min_value=0.01, max_value=10)),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    chunk=st.floats(min_value=1.0, max_value=40.0),
)
def test_chunked_asof_equals_global(spark_global, lt, rt, tol, direction, chunk):
    """chunked_asof_join(…, chunk) ≡ asof_join for ANY chunk size: chunking
    is physical partitioning, never a semantics change."""
    lt = sorted({round(t * 1e6) / 1e6 for t in lt})
    rt = sorted({round(t * 1e6) / 1e6 for t in rt})
    left = pd.DataFrame({"time": [_ts(t) for t in lt], "lsec": lt})
    right = pd.DataFrame({"time": [_ts(t) for t in rt], "rsec": rt})
    lsp = spark_global.createDataFrame(left)
    rsp = spark_global.createDataFrame(right)
    got = (
        Tm.chunked_asof_join(lsp, rsp, on="time", tolerance=tol, direction=direction, chunk=chunk)
        .toPandas()
        .sort_values("lsec")
        .reset_index(drop=True)
    )
    exp = (
        Tm.asof_join(lsp, rsp, on="time", tolerance=tol, direction=direction)
        .toPandas()
        .sort_values("lsec")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    frames=st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=60),
    gap=st.integers(min_value=1, max_value=50),
    chunk=st.integers(min_value=1, max_value=500),
)
def test_chunked_sessionize_equals_global(spark_global, frames, gap, chunk):
    """chunked_sessionize(…, chunk) ≡ sessionize for ANY chunk size,
    including session ids."""
    frames = sorted(set(frames))
    df = spark_global.createDataFrame(pd.DataFrame({"frame_id": frames}))
    got = (
        Tm.chunked_sessionize(df, "frame_id", gap=gap, chunk=chunk)
        .toPandas()
        .sort_values("frame_id")
        .reset_index(drop=True)
    )
    exp = (
        Tm.sessionize(df, "frame_id", gap=gap)
        .toPandas()
        .sort_values("frame_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
