"""get_experiment_times / exclude_maintenance_data edge cases (FIXTURES.md §3)."""

import pandas as pd
import pytest

from aeon_sleap_processing_spark.plans.maintenance import (
    exclude_maintenance_data,
    get_experiment_times,
)

T0 = pd.Timestamp("2024-01-01 00:00:00")


def _env(spark, times_states):
    pdf = pd.DataFrame(
        {
            "time": [T0 + pd.Timedelta(minutes=m) for m, _ in times_states],
            "state": [s for _, s in times_states],
        }
    )
    return spark.createDataFrame(pdf)


class TestGetExperimentTimes:
    def test_normal_alternation(self, spark):
        env = _env(spark, [(0, "Experiment"), (30, "Maintenance"), (40, "Experiment"), (60, "Maintenance")])
        iv = get_experiment_times(env, T0, T0 + pd.Timedelta(hours=2))
        assert list(iv["start"]) == [T0, T0 + pd.Timedelta(minutes=40)]
        assert list(iv["stop"]) == [T0 + pd.Timedelta(minutes=30), T0 + pd.Timedelta(minutes=60)]

    def test_empty_uses_bounds(self, spark):
        env = spark.createDataFrame([], schema="time timestamp, state string")
        end = T0 + pd.Timedelta(hours=1)
        with pytest.warns(UserWarning, match="empty"):
            iv = get_experiment_times(env, T0, end)
        assert list(iv["start"]) == [T0] and list(iv["stop"]) == [end]

    def test_missing_trailing_maintenance_pads_end(self, spark):
        env = _env(spark, [(0, "Experiment"), (30, "Maintenance"), (40, "Experiment")])
        end = T0 + pd.Timedelta(hours=1)
        with pytest.warns(UserWarning, match="Maintenance"):
            iv = get_experiment_times(env, T0, end)
        assert list(iv["stop"])[-1] == end

    def test_leading_maintenance_pads_start(self, spark):
        env = _env(spark, [(10, "Maintenance"), (20, "Experiment"), (50, "Maintenance")])
        with pytest.warns(UserWarning):
            iv = get_experiment_times(env, T0, T0 + pd.Timedelta(hours=1))
        assert list(iv["start"])[0] == T0

    def test_repeated_states_collapse(self, spark):
        env = _env(
            spark,
            [(0, "Experiment"), (10, "Experiment"), (30, "Maintenance"), (35, "Maintenance")],
        )
        iv = get_experiment_times(env, T0, T0 + pd.Timedelta(hours=1))
        assert len(iv) == 1
        assert iv["stop"].iloc[0] == T0 + pd.Timedelta(minutes=30)


class TestExcludeMaintenance:
    def test_inclusive_slices(self, spark):
        data = spark.createDataFrame(
            pd.DataFrame(
                {
                    "time": [T0 + pd.Timedelta(minutes=m) for m in range(0, 70, 10)],
                    "v": list(range(7)),
                }
            )
        )
        iv = pd.DataFrame(
            {"start": [T0], "stop": [T0 + pd.Timedelta(minutes=30)]}
        )
        kept = exclude_maintenance_data(data, iv).toPandas()
        assert sorted(kept["v"]) == [0, 1, 2, 3]  # minute 30 inclusive
