"""Experiment/maintenance interval extraction + exclusion filter.

Re-expresses `get_experiment_times` / `exclude_maintenance_data`
(reference `social_behavior_detection/social_behaviour_detection.py:764-878`).

The EnvironmentState stream is a handful of rows per day (sparse operator-mode
events), so interval derivation runs driver-side on collected rows — the same
scale decision the reference makes implicitly. The *exclusion* of pose rows is
the expensive part and stays distributed: a broadcast interval semi-join
(SURVEY J3) against the billions-of-rows pose table.

Semantics preserved exactly:
- empty state table → warn, whole [start, end] counts as experiment;
- no trailing Maintenance → pad one at `end`;
- duplicate timestamps → keep first;
- trim to [first event >= start, last event <= last Maintenance];
- keep only state CHANGES (experiment/maintenance pairs);
- leading Maintenance → pad an Experiment at `start`;
- inclusive [start, stop] slices (pandas .loc semantics).
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.temporal import interval_filter

__all__ = ["get_experiment_times", "exclude_maintenance_data"]


def get_experiment_times(
    env_states: DataFrame,
    start_time: pd.Timestamp,
    end_time: pd.Timestamp,
) -> pd.DataFrame:
    """Derive [exp_start, exp_stop] interval pairs from an EnvironmentState
    stream (columns: time, state). Returns a small pandas DataFrame with
    columns ``start``/``stop`` — broadcast by the caller."""
    pdf = (
        env_states.where(F.col("time").between(F.lit(start_time), F.lit(end_time)))
        .orderBy("time")
        .toPandas()
    )
    if pdf.empty:
        warnings.warn(
            "The environment state df is empty. Using input start/end as experiment times."
        )
        return pd.DataFrame({"start": [start_time], "stop": [end_time]})

    pdf = pdf.set_index("time")
    if pdf["state"].iloc[-1] != "Maintenance":
        warnings.warn("No 'Maintenance' event at the end; padding one at end_time.")
        pdf = pd.concat(
            [pdf, pd.DataFrame({"state": ["Maintenance"]}, index=[end_time])]
        )
    end_time = pdf[pdf["state"] == "Maintenance"].index[-1]
    pdf = pdf[~pdf.index.duplicated(keep="first")]
    lo = pdf.index.get_indexer([start_time], method="bfill")[0]
    hi = pdf.index.get_indexer([end_time], method="ffill")[0]
    pdf = pdf.iloc[lo : hi + 1]
    pdf = pdf[pdf["state"].ne(pdf["state"].shift())]
    if pdf["state"].iloc[0] == "Maintenance":
        warnings.warn("No 'Experiment' event at the start; padding one at start_time.")
        pdf = pd.concat(
            [pd.DataFrame({"state": ["Experiment"]}, index=[start_time]), pdf]
        )
    starts = pdf[pdf["state"] == "Experiment"].index.to_list()
    stops = pdf[pdf["state"] == "Maintenance"].index.to_list()
    return pd.DataFrame({"start": starts, "stop": stops[: len(starts)]})


def exclude_maintenance_data(
    data: DataFrame, experiment_times: pd.DataFrame, time_col: str = "time"
) -> DataFrame:
    """Keep rows inside any [start, stop] experiment interval (inclusive) —
    broadcast interval semi-join over the big pose stream."""
    spark = data.sparkSession
    iv = spark.createDataFrame(experiment_times.rename(columns={"stop": "end"}))
    return interval_filter(data, iv, time_col=time_col, mode="semi")
