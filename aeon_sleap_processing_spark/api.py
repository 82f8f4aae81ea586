"""Reference-shaped entry points (drop-in call signatures).

The reference's analyses are invoked as ``detect_tube_tests(root, start, end,
parameters, skeleton, video_config)`` over a chunked data root
(`social_behavior_detection/detect_tube_tests.py:17-127`). This facade keeps
that call shape over the engine's chunk store:

    root/
      metadata.json                          — nested arena/device config (S4)
      stream=<register>/camera=<name>/chunk=<ts>/part-*.parquet

Registers follow the reference: 200 blob position, 202 identity, 212 full
pose, 222 combined; EnvironmentState is stored as stream=1 /
camera=Environment.

fps resolution mirrors the reference (`social_behaviour_detection.py:96-98`):
``Devices.CameraTop.TriggerFrequency`` keys into ``Devices.VideoController``;
falls back to a top-level ``fps`` and then 50.
"""

from __future__ import annotations

import os
import warnings

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .plans.fights import detect_fights as _detect_fights
from .plans.maintenance import exclude_maintenance_data, get_experiment_times
from .plans.tube_test import detect_tube_tests as _detect_tube_tests
from .sources.chunked import load_chunked
from .sources.sinks import load_metadata

__all__ = ["detect_tube_tests", "detect_fights", "ENV_STATE_REGISTER"]

ENV_STATE_REGISTER = 1


def _fps_from_metadata(metadata: dict) -> float:
    try:
        trigger = metadata["Devices"]["CameraTop"]["TriggerFrequency"]
        return float(metadata["Devices"]["VideoController"][trigger])
    except (KeyError, TypeError, ValueError):
        pass
    try:
        return float(metadata["fps"])
    except (KeyError, TypeError, ValueError):
        return 50.0


def _prepare(
    spark: SparkSession,
    root: str,
    start: pd.Timestamp,
    end: pd.Timestamp,
    register: int,
) -> tuple[DataFrame, dict, float]:
    metadata = load_metadata(spark, os.path.join(root, "metadata.json"))
    fps = _fps_from_metadata(metadata)
    pose = load_chunked(spark, root, register, "CameraTop", start, end)
    try:
        env = load_chunked(spark, root, ENV_STATE_REGISTER, "Environment", start, end)
        experiment_times = get_experiment_times(env.select("time", "state"), start, end)
        pose = exclude_maintenance_data(pose, experiment_times)
    except Exception as exc:  # no env stream in store → whole range counts
        warnings.warn(f"EnvironmentState unavailable ({exc}); using full range.")
    return pose, metadata, fps


def detect_tube_tests(
    root: str,
    start,
    end,
    parameters: dict | None = None,
    skeleton: dict | None = None,
    video_config: dict | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Reference-signature tube-test detection over a chunk-store root."""
    spark = spark or SparkSession.active()
    start, end = pd.Timestamp(start), pd.Timestamp(end)
    if video_config and video_config.get("gen_vids"):
        warnings.warn("gen_vids requested but video encode is unavailable; skipping.")
    pose, metadata, fps = _prepare(spark, root, start, end, register=222)
    return _detect_tube_tests(pose, fps, metadata, parameters, skeleton)


def detect_fights(
    root: str,
    start,
    end,
    parameters: dict | None = None,
    skeleton: dict | None = None,
    video_config: dict | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Reference-signature fight detection over a chunk-store root."""
    spark = spark or SparkSession.active()
    start, end = pd.Timestamp(start), pd.Timestamp(end)
    if video_config and video_config.get("gen_vids"):
        warnings.warn("gen_vids requested but video encode is unavailable; skipping.")
    pose, metadata, fps = _prepare(spark, root, start, end, register=222)
    blob = load_chunked(spark, root, 200, "CameraTop", start, end)
    return _detect_fights(pose, blob, fps, parameters, skeleton)
