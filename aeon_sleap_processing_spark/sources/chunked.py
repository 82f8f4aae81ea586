"""Chunk-partitioned stream store (SURVEY §1.2 Spark mapping; S1/S2/K4).

The reference's directory layout
``root/<epoch>/<Camera>/<Camera>_<register>_<chunkstart>.bin`` becomes a
Hive-partitioned Parquet table::

    root/stream=<register>/camera=<name>/chunk=<ISO hour>/part-*.parquet

``api.load(root, reader, start, end)``'s filename-based time filter becomes
partition pruning on ``chunk`` plus Parquet min/max row-group skipping on
``time`` — both visible in ``.explain`` as PartitionFilters/PushedFilters.

Writes use dynamic partition overwrite: re-running a chunk atomically replaces
exactly that chunk's files — a strict upgrade over the reference's
skip-if-output-exists idempotency guard (K4, `combine_pose_id_chunk.py:245-249`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_chunked", "load_chunked", "list_chunks"]


def _chunk_col(time_col: str) -> F.Column:
    # hour-aligned chunk key, stored as a sortable ISO string partition value
    return F.date_format(F.date_trunc("hour", F.col(time_col)), "yyyy-MM-dd'T'HH-mm-ss")


def write_chunked(
    df: DataFrame,
    root: str,
    camera: str,
    register: int,
    time_col: str = "time",
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Write a stream DataFrame into the chunk store, idempotently per chunk.

    ``file_format``: ``parquet`` (default) or ``orc`` — both columnar with
    min/max stride skipping and identical partition-pruning behavior; ORC is
    offered for ecosystems standardized on it (Hive ACID, some object-store
    catalogs)."""
    if file_format not in ("parquet", "orc"):
        raise ValueError(f"unsupported chunk-store format {file_format!r}")
    (
        df.withColumn("stream", F.lit(register))
        .withColumn("camera", F.lit(camera))
        .withColumn("chunk", _chunk_col(time_col))
        .repartition("chunk")  # one shuffle → few well-sized files per chunk
        .sortWithinPartitions(time_col)  # time-sorted row groups → min/max skipping
        .write.mode(mode)
        .partitionBy("stream", "camera", "chunk")
        .format(file_format)
        .save(root)
    )


def load_chunked(
    spark: SparkSession,
    root: str,
    register: int,
    camera: str,
    start: pd.Timestamp | str | None = None,
    end: pd.Timestamp | str | None = None,
    time_col: str = "time",
    file_format: str = "parquet",
) -> DataFrame:
    """Chunk-pruned time-range scan (SURVEY S1): partition filters on
    (stream, camera, chunk) + a pushed-down range predicate on time."""
    # scope the scan to the stream/camera DIRECTORIES: streams have different
    # schemas (pose vs env-state vs blob), so schema inference must see only
    # the requested stream's files; pruning happens at the listing level
    df = (
        spark.read.option("basePath", root)
        .format(file_format)
        .load(f"{root}/stream={register}/camera={camera}")
    )
    if start is not None:
        start = pd.Timestamp(start)
        chunk_floor = start.floor("h").strftime("%Y-%m-%dT%H-%M-%S")
        df = df.where((F.col("chunk") >= chunk_floor) & (F.col(time_col) >= F.lit(start)))
    if end is not None:
        end = pd.Timestamp(end)
        chunk_ceil = end.floor("h").strftime("%Y-%m-%dT%H-%M-%S")
        df = df.where((F.col("chunk") <= chunk_ceil) & (F.col(time_col) <= F.lit(end)))
    return df


def list_chunks(
    spark: SparkSession,
    root: str,
    register: int | None = None,
    camera: str | None = None,
    file_format: str = "parquet",
) -> list[str]:
    """Chunk discovery (SURVEY S3): distinct chunk partition values, pruned
    by stream/camera when given — a metadata-only listing query."""
    path = f"{root}/stream={register if register is not None else '*'}"
    path += f"/camera={camera if camera is not None else '*'}"
    df = spark.read.option("basePath", root).format(file_format).load(path)
    # partition columns only — safe even when the glob spans mixed schemas
    return sorted(r["chunk"] for r in df.select("chunk").distinct().collect())
