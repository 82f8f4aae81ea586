"""Incremental chunk processing via Structured Streaming (SURVEY §2.8 T1).

The reference polls the filesystem every 30 minutes, diffs against an
in-memory ``processed_chunks`` dict, and submits SLURM jobs for new chunks
(`combine_pose_id_automated.py:149-185`). That state dies with the process.

Here the same behavior is a Structured Streaming file source over the chunk
store: the checkpoint directory IS the processed-set, durable across
restarts. ``Trigger.AvailableNow`` gives catch-up batch semantics (process
everything new, then stop) — the mode the driver loop approximates; a
processing-time trigger gives the reference's 30-minute cadence.

Late/ragged data (T2): a chunk file that lands late is still discovered —
file-source discovery is by path, not by event time; downstream watermarking
is the consumer's choice.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

__all__ = ["watch_chunk_store", "stream_sessionize"]


def stream_sessionize(
    stream: DataFrame,
    time_col: str = "time",
    gap: str = "30 minutes",
    partition_by: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization (SURVEY T3): the batch ``sessionize``
    operator's event-time twin via ``session_window`` + watermark.

    Sessions close when the watermark passes their gap; late rows within the
    watermark merge into their session (the reference's batch loop re-derives
    everything instead). Returns (keys, session_start, session_end, n_events)."""
    keys = [F.col(partition_by)] if partition_by else []
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(*keys, F.session_window(F.col(time_col), gap).alias("session"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *([partition_by] if partition_by else []),
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def watch_chunk_store(
    spark: SparkSession,
    root: str,
    schema: T.StructType,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    register: int | None = None,
    camera: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Watch the chunk store; run ``process_batch(df, batch_id)`` on each new
    micro-batch of rows from newly-landed chunk files.

    ``trigger`` defaults to ``{"availableNow": True}`` (catch-up then stop);
    pass ``{"processingTime": "30 minutes"}`` for the reference's polling
    cadence.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", root)
        .parquet(root)
    )
    if register is not None:
        stream = stream.where(F.col("stream") == register)
    if camera is not None:
        stream = stream.where(F.col("camera") == camera)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
