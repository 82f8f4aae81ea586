"""Pose+ID combine pipeline tests: tick quantization, quad→top fallback,
Hungarian assignment, missing-ID inference, homography projection."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aeon_sleap_processing_spark.plans.combine import (
    chunk_bounds,
    combine_pose_id,
    project_quadrants,
)

T0 = pd.Timestamp("2024-01-01 01:00:00")


def _all_nanish(m):
    return all(v is None or (isinstance(v, float) and np.isnan(v)) for v in m.values())
FPS = 50.0
TICK = pd.Timedelta(microseconds=20_000)

_POSE_FIELDS = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("identity", T.StringType()),
        T.StructField("identity_likelihood", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("part", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)


def _rows(spark, rows):
    rows = [(t.to_pydatetime(), *rest) for t, *rest in rows]
    return spark.createDataFrame(rows, schema=_POSE_FIELDS)


@pytest.fixture(scope="module")
def streams(spark):
    def pose(t, ident, part, x, y):
        return (t, ident, None, part, x, y)

    def idrow(t, ident, lik, x, y):
        return (t, ident, lik, "anchor", x, y)

    t0, t1, t2 = T0, T0 + TICK, T0 + 2 * TICK
    top_pose = _rows(
        spark,
        [
            # tick 0: two skeletons
            pose(t0, "0", "anchor", 100.0, 100.0),
            pose(t0, "0", "nose", 104.0, 100.0),
            pose(t0, "1", "anchor", 200.0, 200.0),
            pose(t0, "1", "nose", 204.0, 200.0),
            # tick 1 (+3 ms jitter, inside the 5 ms tolerance)
            pose(t1 + pd.Timedelta(milliseconds=3), "0", "anchor", 110.0, 110.0),
            pose(t1 + pd.Timedelta(milliseconds=3), "1", "anchor", 210.0, 210.0),
            # tick 2
            pose(t2, "0", "anchor", 120.0, 120.0),
            pose(t2, "1", "anchor", 220.0, 220.0),
            # off-grid row (+8 ms > tolerance) — must be dropped entirely
            pose(t1 + pd.Timedelta(milliseconds=8), "0", "anchor", 999.0, 999.0),
        ],
    )
    top_id = _rows(
        spark,
        [
            idrow(t1 + pd.Timedelta(milliseconds=1), "A", {"A": 0.95, "B": 0.05}, 111.0, 110.0),
            idrow(t1 + pd.Timedelta(milliseconds=1), "B", {"A": 0.1, "B": 0.9}, 211.0, 210.0),
            idrow(t2, "A", {"A": 0.9, "B": 0.1}, 121.0, 120.0),
            idrow(t2, "B", {"A": 0.2, "B": 0.8}, 500.0, 500.0),  # too far (>40 px)
        ],
    )
    quad_id = _rows(
        spark,
        [
            # only tick 0 has quadrant coverage: identity A near skeleton 0
            idrow(t0 + pd.Timedelta(milliseconds=2), "A", {"A": 0.8, "B": 0.2}, 101.0, 101.0),
        ],
    ).withColumn("x_top", F.col("x")).withColumn("y_top", F.col("y"))
    return top_pose, top_id, quad_id


class TestCombine:
    def test_assignments(self, spark, streams):
        top_pose, top_id, quad_id = streams
        start, end, tol = chunk_bounds(T0, FPS)
        out = combine_pose_id(top_pose, top_id, quad_id, start, end, FPS).toPandas()
        out["tick"] = ((out.time - T0).dt.total_seconds() * FPS).round().astype(int)
        by = {(r.tick, r.part): r for r in out.itertuples()}

        # off-grid row dropped
        assert not (out.x == 999.0).any()

        # tick 0: quad gives A→skeleton0 (all 4 parts of skeleton 0 renamed);
        # B inferred for skeleton 1 with NaN likelihood map
        t0 = out[out.tick == 0]
        assert set(t0.identity) == {"A", "B"}
        a_rows = t0[t0.identity == "A"]
        assert set(a_rows.part) == {"anchor", "nose"}
        assert a_rows.iloc[0].identity_likelihood["A"] == pytest.approx(0.8)
        b_rows = t0[t0.identity == "B"]
        assert _all_nanish(b_rows.iloc[0].identity_likelihood)

        # tick 1: top-ID fallback matches both directly
        t1 = out[out.tick == 1]
        assert set(t1.identity) == {"A", "B"}
        assert t1[t1.identity == "A"].iloc[0].identity_likelihood["A"] == pytest.approx(0.95)

        # tick 2: B infeasible (too far) → A matched, B inferred
        t2 = out[out.tick == 2]
        assert set(t2.identity) == {"A", "B"}
        assert _all_nanish(t2[t2.identity == "B"].iloc[0].identity_likelihood)

    def test_homography_projection(self, spark):
        # pure translation homography: x+10, y-5
        H = np.array([[1.0, 0.0, 10.0], [0.0, 1.0, -5.0], [0.0, 0.0, 1.0]])
        df = _rows(spark, [(T0, "A", None, "anchor", 3.0, 4.0)])
        out = project_quadrants({"CameraNorth": df}, {"CameraNorth": H}).toPandas()
        assert out.x_top.iloc[0] == pytest.approx(13.0)
        assert out.y_top.iloc[0] == pytest.approx(-1.0)
        # perspective homography with w != 1
        H2 = np.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
        out2 = project_quadrants({"CameraNorth": df}, {"CameraNorth": H2}).toPandas()
        assert out2.x_top.iloc[0] == pytest.approx(3.0)  # scale cancels via w
