"""Chunk-partitioned stream store (SURVEY §1.2 Spark mapping; S1/S2/K4).

The reference's directory layout
``root/<epoch>/<Camera>/<Camera>_<register>_<chunkstart>.bin`` becomes a
Hive-partitioned Parquet table::

    root/stream=<register>/camera=<name>/chunk=<ISO hour>/part-*.parquet

``api.load(root, reader, start, end)``'s filename-based time filter becomes
partition pruning on ``chunk`` plus Parquet min/max row-group skipping on
``time`` — both visible in ``.explain`` as PartitionFilters/PushedFilters.

COMMIT PROTOCOL (r11): parquet chunk stores commit through the MANIFEST log
by default (:func:`~..sources.sinks.manifest_commit` family) — re-running a
chunk is an atomic dynamic-partition replace (one CAS commit drops the
chunk's old files and adds the new ones), concurrent writers of different
chunks compose instead of clobbering, readers keep snapshot isolation
through compaction, and the time-range scan prunes MANIFEST-SIDE (an
O(head) string filter on the driver) instead of recursively listing
directories — the property that matters at 100 TB. This strictly dominates
the reference's skip-if-output-exists idempotency guard (K4,
`combine_pose_id_chunk.py:245-249, 284-288`). ``commit="listing"`` keeps
the r≤10 dynamic-partition-overwrite layout (and is the automatic path for
ORC, which the manifest stager does not cover); reads auto-detect which
protocol a store uses, so the two layouts share one reader API.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import is_manifested, read_manifested, write_manifested

__all__ = ["write_chunked", "load_chunked", "list_chunks"]


def _chunk_col(time_col: str) -> F.Column:
    # hour-aligned chunk key, stored as a sortable ISO string partition value
    return F.date_format(F.date_trunc("hour", F.col(time_col)), "yyyy-MM-dd'T'HH-mm-ss")


def _resolve_commit(commit: str | None, file_format: str) -> str:
    if commit not in (None, "manifest", "listing", "auto"):
        raise ValueError(f"unknown commit protocol {commit!r}")
    if commit in (None, "auto"):
        # manifest staging moves parquet part files; ORC stays on listing
        return "manifest" if file_format == "parquet" else "listing"
    if commit == "manifest" and file_format != "parquet":
        raise ValueError("commit='manifest' supports parquet chunk stores only")
    return commit


def write_chunked(
    df: DataFrame,
    root: str,
    camera: str,
    register: int,
    time_col: str = "time",
    mode: str = "overwrite",
    file_format: str = "parquet",
    commit: str | None = None,
) -> None:
    """Write a stream DataFrame into the chunk store, idempotently per chunk.

    ``mode="overwrite"`` replaces exactly the chunks present in ``df``
    (dynamic partition overwrite); ``"append"`` adds files to them.

    ``commit``: ``None``/``"auto"`` → manifest protocol for parquet,
    listing for ORC; or force ``"manifest"``/``"listing"``. Under the
    manifest protocol the replace is ONE atomic CAS commit — a reader
    never sees a chunk half-replaced, and a concurrent writer of another
    chunk is composed with, not skipped (K4 at multi-writer scale).

    ``file_format``: ``parquet`` (default) or ``orc`` — both columnar with
    min/max stride skipping and identical partition-pruning behavior; ORC is
    offered for ecosystems standardized on it (Hive ACID, some object-store
    catalogs)."""
    if file_format not in ("parquet", "orc"):
        raise ValueError(f"unsupported chunk-store format {file_format!r}")
    protocol = _resolve_commit(commit, file_format)
    prepared = (
        df.withColumn("stream", F.lit(register))
        .withColumn("camera", F.lit(camera))
        .withColumn("chunk", _chunk_col(time_col))
        .repartition("chunk")  # one shuffle → few well-sized files per chunk
        .sortWithinPartitions(time_col)  # time-sorted row groups → min/max skipping
    )
    if protocol == "manifest":
        write_manifested(
            df.sparkSession,
            prepared,
            root,
            partition_by=["stream", "camera", "chunk"],
            replace="partitions" if mode == "overwrite" else None,
            # per-file time min/max in the manifest: sub-chunk file
            # skipping on time-range scans, straight from the head
            stats_cols=[time_col],
        )
        return
    (
        prepared.write.mode(mode)
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
    commit: str = "auto",
) -> DataFrame:
    """Chunk-pruned time-range scan (SURVEY S1): partition filters on
    (stream, camera, chunk) + a pushed-down range predicate on time.

    ``commit="auto"`` detects the store's protocol: a manifest-committed
    store resolves its CURRENT snapshot's file set from the manifest head
    and prunes to the stream/camera prefix driver-side — no directory
    listing, no torn reads during a concurrent chunk replace; the chunk
    range then prunes in Catalyst from the path-derived partition values
    of that explicit file list (still zero file I/O). Listing stores scan
    the stream/camera directory exactly as before."""
    use_manifest = commit == "manifest" or (
        commit == "auto" and file_format == "parquet" and is_manifested(spark, root)
    )
    if use_manifest:
        # scope to the stream/camera prefix manifest-side: schema inference
        # must see only this stream's files (streams differ in schema), and
        # the prefix filter replaces the recursive listing wholesale; the
        # time range additionally skips FILES via the per-file stats the
        # chunk writer records (sub-chunk granularity, zero footer reads) —
        # the row-level predicates below still apply on what remains
        skip = None
        if start is not None or end is not None:
            skip = {
                time_col: (
                    pd.Timestamp(start) if start is not None else None,
                    pd.Timestamp(end) if end is not None else None,
                )
            }
        df = read_manifested(
            spark, root,
            prefixes=[f"stream={register}/camera={camera}/"],
            skip=skip,
        )
    else:
        # scope the scan to the stream/camera DIRECTORIES: streams have
        # different schemas (pose vs env-state vs blob), so schema inference
        # must see only the requested stream's files; pruning happens at the
        # listing level
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
    commit: str = "auto",
) -> list[str]:
    """Chunk discovery (SURVEY S3): distinct chunk partition values, pruned
    by stream/camera when given. On a manifest-committed store this is a
    PURE-METADATA query — chunk values parse out of the head's relative
    paths, zero file listings, zero file reads."""
    use_manifest = commit == "manifest" or (
        commit == "auto" and file_format == "parquet" and is_manifested(spark, root)
    )
    if use_manifest:
        from .sinks import _canon_uri, _hadoop_fs, _manifest_head

        fs, Path, jroot = _hadoop_fs(spark, root)
        root_str = _canon_uri(fs, jroot)
        _, head, _ = _manifest_head(spark, fs, Path, root_str)
        if head is None:
            raise FileNotFoundError(f"no manifest under {root}")
        want_stream = f"stream={register}" if register is not None else None
        want_camera = f"camera={camera}" if camera is not None else None
        chunks = set()
        for f in head["files"]:
            parts = f["path"].split("/")
            vals = {p.split("=", 1)[0]: p for p in parts[:-1] if "=" in p}
            if want_stream is not None and vals.get("stream") != want_stream:
                continue
            if want_camera is not None and vals.get("camera") != want_camera:
                continue
            if "chunk" in vals:
                chunks.add(vals["chunk"].split("=", 1)[1])
        return sorted(chunks)
    path = f"{root}/stream={register if register is not None else '*'}"
    path += f"/camera={camera if camera is not None else '*'}"
    df = spark.read.option("basePath", root).format(file_format).load(path)
    # partition columns only — safe even when the glob spans mixed schemas
    return sorted(r["chunk"] for r in df.select("chunk").distinct().collect())
