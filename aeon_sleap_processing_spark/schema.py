"""Schemas + experiment registry (SURVEY.md §1.3–§1.5).

The reference declares fixed per-register schemas in reader classes and selects
them dynamically by experiment name via ``importlib`` (reference:
``social_behavior_detection/social_behaviour_detection.py:93-95,906-908``). Here
that becomes explicit ``StructType``s plus a plain registry dict — schema-on-write
Parquet needs no runtime inference.

Register tags (reference ``combine_pose_id_chunk.py:263,276,281,325``):
200 = blob position, 202 = SLEAP identity, 212 = SLEAP full pose,
222 = combined pose+ID.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "POSE_SCHEMA",
    "BLOB_POSITION_SCHEMA",
    "ENV_STATE_SCHEMA",
    "VIDEO_INDEX_SCHEMA",
    "METADATA_SCHEMA",
    "FIGHT_EVENT_SCHEMA",
    "TUBE_TEST_EVENT_SCHEMA",
    "REGISTER",
    "SKELETON_PARTS",
    "schema_for_register",
    "register_experiment",
    "experiment_schema",
]

# 8-part skeleton (reference `social_behaviour_detection.py:437-446` and
# `pose_model/.../training_config.json` part_names)
SKELETON_PARTS = [
    "nose",
    "head",
    "right_ear",
    "left_ear",
    "spine1",
    "spine2",
    "spine3",
    "spine4",
]

REGISTER = {"blob_position": 200, "sleap_identity": 202, "sleap_pose": 212, "combined": 222}

# Pose stream (registers 202/212/222). Long/tidy: one row per (time, identity, part).
# `identity_likelihood` is a map identity→likelihood (reference
# `combine_pose_id_chunk.py:95,141` indexes it per-candidate).
POSE_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("model", T.StringType(), True),
        T.StructField("identity", T.StringType(), True),
        T.StructField("identity_likelihood", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("part", T.StringType(), False),
        T.StructField("x", T.FloatType(), True),
        T.StructField("y", T.FloatType(), True),
        T.StructField("part_likelihood", T.FloatType(), True),
    ]
)

# Blob centroid stream, register 200 (reference `social_behaviour_detection.py:553-558`).
BLOB_POSITION_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("x", T.FloatType(), True),
        T.StructField("y", T.FloatType(), True),
    ]
)

# EnvironmentState CSV stream (reference `social_behaviour_detection.py:791-796`).
ENV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("state", T.StringType(), False),
    ]
)

# Per-frame video manifest (reference `generate_composite_quadrant_videos.py:173-208`).
VIDEO_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("camera", T.StringType(), False),
        T.StructField("_frame", T.LongType(), False),
        T.StructField("_path", T.StringType(), False),
    ]
)

# Nested per-epoch arena/device config (reference
# `social_behaviour_detection.py:93-98,222-232,909-911`). Values stored as strings
# to preserve the reference's float()-at-use behavior; dynamic device keys
# (*Gate*Rfid*) live in a map.
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.StringType(), False),
        T.StructField(
            "devices",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("TriggerFrequency", T.StringType(), True),
                        T.StructField(
                            "Location",
                            T.StructType(
                                [
                                    T.StructField("X", T.DoubleType(), True),
                                    T.StructField("Y", T.DoubleType(), True),
                                ]
                            ),
                            True,
                        ),
                    ]
                ),
            ),
            True,
        ),
        T.StructField("video_controller", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "active_region",
            T.StructType(
                [
                    T.StructField("ArenaInnerRadius", T.DoubleType(), True),
                    T.StructField("ArenaOuterRadius", T.DoubleType(), True),
                    T.StructField(
                        "ArenaCenter",
                        T.StructType(
                            [
                                T.StructField("X", T.DoubleType(), True),
                                T.StructField("Y", T.DoubleType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField(
                        "NestRegion",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("X", T.DoubleType(), True),
                                    T.StructField("Y", T.DoubleType(), True),
                                ]
                            )
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

# Event outputs (reference `social_behaviour_detection.py:733-757` and `:276,376-387`).
FIGHT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("start_timestamp", T.TimestampType(), False),
        T.StructField("end_timestamp", T.TimestampType(), False),
        T.StructField("duration_seconds", T.DoubleType(), False),
        T.StructField("fight_end_x", T.DoubleType(), True),
        T.StructField("fight_end_y", T.DoubleType(), True),
    ]
)

TUBE_TEST_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("start_timestamp", T.TimestampType(), False),
        T.StructField("end_timestamp", T.TimestampType(), False),
        T.StructField("winner_identity", T.StringType(), True),
    ]
)

_REGISTER_SCHEMAS: dict[int, T.StructType] = {
    200: BLOB_POSITION_SCHEMA,
    202: POSE_SCHEMA,
    212: POSE_SCHEMA,
    222: POSE_SCHEMA,
}

# experiment-name → register→schema overrides (mirrors the importlib registry,
# reference `social_behaviour_detection.py:93-95`).
_EXPERIMENTS: dict[str, dict[int, T.StructType]] = {"social02": dict(_REGISTER_SCHEMAS)}


def schema_for_register(register: int) -> T.StructType:
    return _REGISTER_SCHEMAS[register]


def register_experiment(name: str, schemas: dict[int, T.StructType]) -> None:
    _EXPERIMENTS[name] = {**_REGISTER_SCHEMAS, **schemas}


def experiment_schema(name: str, register: int) -> T.StructType:
    try:
        return _EXPERIMENTS[name][register]
    except KeyError as exc:  # mirror reference's getattr failure mode
        raise KeyError(f"unknown experiment/register: {name}/{register}") from exc
