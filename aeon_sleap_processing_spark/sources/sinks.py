"""Output sinks (SURVEY K1/K3/K5/K6) and auxiliary sources (S4/S6).

- ``write_events_csv`` — event tables → one CSV per period (K1), with the
  reference's exact output column names (`detect_fights.py:132`:
  ``duration (seconds)``).
- ``write_empty_marker`` — records "processing ran, no data" (K3); the chunk
  store's dynamic overwrite already gives K4 idempotency.
- ``export_event_videos`` — K5: per-event video export is executor-side
  OpenCV in the reference; stubbed here (no cv2 in this environment) with the
  real driver loop + frame-manifest slicing so the plumbing is testable.
- ``merge_model_configs`` — K6 driver-side JSON config merge
  (`combine_pose_id_chunk.py:291-307`).
- ``load_metadata`` — S4 nested-config scan → python dict (broadcast by use).
- ``read_jdbc`` — S6: the DataJoint/MySQL join-project-restrict source as a
  thin ``spark.read.jdbc`` wrapper (no database in this environment; the
  query pushdown shape is what matters).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_events_csv",
    "write_empty_marker",
    "export_event_videos",
    "merge_model_configs",
    "load_metadata",
    "read_jdbc",
    "write_bucketed",
    "compact_parquet",
    "optimize_parquet",
    "retention_sweep",
]

# engine-internal → reference CSV header names (`social_behaviour_detection.py:733-757`)
_REFERENCE_EVENT_COLUMNS = {"duration_seconds": "duration (seconds)"}


def write_events_csv(events: DataFrame, path: str, reference_names: bool = True) -> None:
    """Event table → a single CSV with header (K1). ``coalesce(1)`` is correct
    here: event tables are tiny (rows = detected events, not frames)."""
    out = events
    if reference_names:
        for ours, theirs in _REFERENCE_EVENT_COLUMNS.items():
            if ours in out.columns:
                out = out.withColumnRenamed(ours, theirs)
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_empty_marker(path: str, name: str = "_EMPTY") -> str:
    """0-byte marker recording that processing ran and found no data (K3,
    `combine_pose_id_chunk.py:284-288`)."""
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, name)
    with open(marker, "wb"):
        pass
    return marker


def export_event_videos(
    events: DataFrame,
    video_index: DataFrame,
    save_dir: str,
    padding_seconds: float = 1.0,
    video_name_prefix: str = "",
    encode: bool = False,
    frame_col: str | None = None,
    fallback_fps: float = 50.0,
) -> list[tuple[str, int]]:
    """K5: per event, slice the frame manifest to [start−pad, end+pad] and
    (optionally) export a clip — the reference's `aeon.io.video.export`
    (`social_behaviour_detection.py:880-921`), OpenCV-free.

    Frame selection is a real DataFrame range query. With ``encode=True``
    and ``frame_col`` naming a PNG binary column on ``video_index``, each
    event's frames are decoded (pure-numpy PNG codec,
    operators/multimodal.py), stacked in time order, and written to
    ``save_dir`` as an uncompressed-DIB AVI (pure-stdlib RIFF writer) by an
    ``applyInPandas`` kernel — one task per event, executor-side encode.
    ``encode=True`` without a frame column raises: the manifest carries no
    pixels to encode.

    ONE Spark job regardless of event count: the (tiny) padded event table
    is broadcast range-joined onto the manifest and counted per event —
    previously this collected the events and ran one count job each, a
    driver-side loop that would serialize thousands of events. Events whose
    padded window matches no frames still emit (name, 0) via the final left
    join against the event list.

    Returns [(clip_name, n_frames)] ordered by event start; events sharing
    a start order by their (start, end) rank in the input event table.
    """
    if encode and frame_col is None:
        raise NotImplementedError(
            "encode=True needs frame_col (a PNG binary column on video_index) "
            "to supply pixels; the manifest alone carries none. "
            "Manifest slicing works with encode=False."
        )
    pad = F.expr(f"INTERVAL {padding_seconds} SECONDS")
    from pyspark.sql import Window as W

    # unique per-event key: events sharing a start_timestamp (or even a full
    # window) must still count independently — grouping by the timestamp
    # alone would merge them and double-count shared frames. The event table
    # is tiny (rows = detected events), so the unkeyed numbering window is a
    # non-issue.
    ev = events.select(
        F.col("start_timestamp").alias("__start"),
        (F.col("start_timestamp") - pad).alias("__lo"),
        (F.col("end_timestamp") + pad).alias("__hi"),
    ).withColumn(
        "__eid", F.row_number().over(W.orderBy("__start", "__hi"))
    )
    # clip names computed ONCE, collision-proofed: the reference scheme is
    # second-resolution, so events starting within the same wall-clock
    # second would share a path and silently overwrite each other — the
    # 2nd, 3rd, ... event in a second gets an _2/_3 suffix (__eid order)
    sec = F.date_format("__start", "yyyy-MM-dd_HH-mm-ss")
    dup_rank = F.row_number().over(W.partitionBy(sec).orderBy("__eid"))
    ev = ev.withColumn(
        "__clip",
        F.concat(
            F.lit(video_name_prefix),
            sec,
            F.when(dup_rank > 1, F.concat(F.lit("_"), dup_rank.cast("string"))).otherwise(
                F.lit("")
            ),
            F.lit(".avi"),
        ),
    )
    joined = video_index.join(
        F.broadcast(ev),
        (F.col("time") >= F.col("__lo")) & (F.col("time") <= F.col("__hi")),
    )
    if encode:
        # the clip kernel already counts each event's frames — ONE action
        # drives both the writes and the counts (no second manifest scan)
        counts = _write_event_clips(joined, frame_col, save_dir, fallback_fps).select(
            "__eid", F.col("n_frames").alias("__n")
        )
    else:
        counts = joined.groupBy("__eid").agg(F.count(F.lit(1)).alias("__n"))
    rows = (
        ev.select("__eid", "__clip", "__start")
        .join(counts, "__eid", "left")
        .select(
            "__clip", "__start", "__eid", F.coalesce(F.col("__n"), F.lit(0)).alias("__n")
        )
        # ties on start_timestamp break by __eid (the input-derived event
        # number), NOT by frame count — manifests keep the caller's event
        # ordering even for events sharing a start
        .orderBy("__start", "__eid")
        .collect()
    )
    return [(r["__clip"], r["__n"]) for r in rows]


def _write_event_clips(
    joined: DataFrame, frame_col: str, save_dir: str, fallback_fps: float = 50.0
) -> DataFrame:
    """One AVI per event via ``applyInPandas`` keyed on the event id: decode
    each frame's PNG bytes (pure-numpy codec), stack in time order, write an
    uncompressed-DIB AVI under the event's precomputed collision-safe
    ``__clip`` name. Executor-side encode — one task per event, no pixel
    bytes ever reach the driver; the kernel creates ``save_dir`` itself
    (driver-side makedirs would not exist on remote executors, and at
    cluster scale ``save_dir`` must be shared storage). Frames within an
    event must share dimensions AND channel count (the reference's fixed
    camera geometry) — a mixed event raises a ValueError naming the clip
    rather than an opaque np.stack shape error. The clip fps is inferred
    from the median frame interval; single-frame events and zero/negative
    medians (duplicate timestamps) fall back to ``fallback_fps``.

    Returns the per-event stats frame (__eid, clip, n_frames, n_bytes) —
    tiny, one row per event — so the caller's single action drives both the
    writes and the counts."""
    import os

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.multimodal import decode_png, encode_avi

    out_schema = T.StructType(
        [
            T.StructField("__eid", T.IntegerType()),
            T.StructField("clip", T.StringType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time").reset_index(drop=True)
        name = pdf["__clip"].iloc[0]
        decoded = [decode_png(bytes(b)) for b in pdf[frame_col]]
        shapes = {a.shape for a in decoded}
        if len(shapes) > 1:
            raise ValueError(
                f"event clip {name!r}: frames disagree in dimensions/channels "
                f"{sorted(shapes)}; all frames of one event must share shape"
            )
        frames = np.stack(decoded)
        dt = pdf["time"].diff().dt.total_seconds().dropna()
        fps = (
            1.0 / float(dt.median())
            if len(dt) and dt.median() > 0
            else fallback_fps
        )
        data = encode_avi(frames, fps=fps)
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, name), "wb") as f:
            f.write(data)
        return pd.DataFrame(
            [
                {
                    "__eid": int(pdf["__eid"].iloc[0]),
                    "clip": name,
                    "n_frames": len(pdf),
                    "n_bytes": len(data),
                }
            ]
        )

    return (
        joined.select("__eid", "__clip", "time", frame_col)
        .groupBy("__eid")
        .applyInPandas(kernel, out_schema)
    )


def merge_model_configs(pose_config: dict, id_config: dict) -> dict:
    """K6: graft the pose model's anchor_part/part_names into the ID model's
    top-down head config (`combine_pose_id_chunk.py:298-305`)."""
    combined = json.loads(json.dumps(id_config))  # deep copy
    confmaps = combined["model"]["heads"]["multi_class_topdown"]["confmaps"]
    centered = pose_config["model"]["heads"]["centered_instance"]
    confmaps["anchor_part"] = centered["anchor_part"]
    confmaps["part_names"] = centered["part_names"]
    return combined


def load_metadata(spark: SparkSession, path: str) -> dict:
    """S4: nested per-epoch config → one python dict (multiLine JSON scan;
    single row, broadcast by closure wherever used)."""
    df = spark.read.option("multiLine", True).json(path)
    row = df.first()
    return row.asDict(recursive=True) if row is not None else {}


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str | None = None,
    table: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """S6: relational source with the DataJoint join-project-restrict pushed
    into the database as a subquery; optional range partitioning for parallel
    reads at scale.

    Pass ``query`` to push an arbitrary join-project-restrict into the DB, or
    ``table`` to expose the table and let Catalyst push filters/projections
    through the JDBC relation (``PushedFilters`` in the scan — exercised for
    real against embedded Derby in tests; Derby's dialect rejects the
    ``query``-option subquery alias, so table mode is the portable path)."""
    if (query is None) == (table is None):
        raise ValueError("pass exactly one of query= or table=")
    reader = spark.read.format("jdbc").option("url", url)
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if user:
        reader = reader.option("user", user)
    if password:
        reader = reader.option("password", password)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join/agg keys —
    the co-located-join layout for 100 TB fact tables.

    Two tables bucketed on the same keys with the same bucket count join with
    ZERO exchanges (and zero sorts when ``sort_by`` matches): the shuffle is
    paid once at write time and amortized over every subsequent join/agg on
    those keys. This is the physical design the chunk store would use for
    pose/events fact tables keyed by (chunk, camera) at scale — Spark's
    equivalent of the reference's directory-per-chunk layout, but with the
    join locality made visible to the optimizer.

    Bucketing requires the table catalog (``saveAsTable``) — plain
    ``.parquet(path)`` writes lose the bucket metadata."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class, resolved Path) for ``path`` via the Hadoop
    FileSystem API — the filesystem-agnostic layer every Spark deployment
    already has configured (local file://, HDFS, S3A, ABFS...). All
    housekeeping ops below go through this, never POSIX os.*."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jvm.org.apache.hadoop.fs.Path, jpath


def _list_data_files(fs, jpath) -> list:
    """Recursive FileStatus list of parquet data files under ``jpath``
    (skips _metadata/_SUCCESS/hidden, like Spark's own listing)."""
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(st)
    return out


def _leaf_data_dirs(fs, Path, jpath) -> list:
    """Directories that directly contain parquet data files — one entry
    for an unpartitioned store, one per ``col=value`` leaf for a
    Hive-partitioned store. Compaction runs PER LEAF so partition
    directory names (and therefore pruning and partition-value types) are
    preserved byte-for-byte."""
    leaves = {}
    for st in _list_data_files(fs, jpath):
        parent = st.getPath().getParent()
        leaves[str(parent.toUri().getPath())] = parent
    return list(leaves.values())


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
    _plan_fn=None,
) -> dict:
    """Small-file compaction — the perpetual housekeeping op of a streaming
    chunk store (each micro-batch/chunk append leaves small files; scan
    task count and NameNode/listing pressure grow without bound). Rewrites
    each LEAF data directory under ``path`` in place to ~``target_bytes``
    files when it holds at least ``min_files_to_compact`` data files;
    leaves below the threshold are untouched. Hive-partitioned layouts
    (``col=value`` dirs) are compacted per partition directory, so
    partition names, pruning, and partition-value types are preserved
    exactly — the data files never absorb re-inferred partition columns.

    Runs entirely on the Hadoop FileSystem API (local/HDFS/S3A/...), not
    POSIX. Each leaf stages into a sibling ``__compacting`` dir and swaps
    via two renames; a leftover ``__precompact`` from a crash between the
    renames is recovered on entry, and a failed swap restores the
    original. CAVEAT: directory rename is atomic on HDFS/local but
    copy+delete on object stores (S3A) — there, prefer a manifest-based
    table format for the swap; the staging logic is still correct, just
    not atomic.

    SINGLE-WRITER CONTRACT: run compaction when no other writer appends
    to the store (the streaming sink ``stream_append_compacted`` enforces
    this by construction with batch-id dirs). As a guard against
    violations, each leaf's file set is SNAPSHOTTED before the rewrite
    (the rewrite reads exactly the snapshot files) and RE-LISTED
    immediately before the stage-out rename: if the set changed — a
    concurrent append — the staged rewrite is discarded and the leaf is
    skipped untouched (reported in ``skipped_concurrent``), so the new
    file's rows are never silently dropped. The guard shrinks the race
    window from the whole rewrite job to the list→rename gap; it does
    not replace the contract (only a manifest table format can).

    Returns {files_before, files_after, bytes, compacted,
    skipped_concurrent}."""
    import math

    fs, Path, root = _hadoop_fs(spark, path)

    def _recover(base: str) -> None:
        # Crash window recovery: if a previous run renamed the leaf away
        # but died before renaming the staged dir in, finish or roll back.
        leaf = Path(base)
        pre = Path(base + "__precompact")
        tmp = Path(base + "__compacting")
        if fs.exists(pre) and not fs.exists(leaf):
            if fs.exists(tmp):
                fs.rename(tmp, leaf)   # staged rewrite was complete: finish
                fs.delete(pre, True)
            else:
                fs.rename(pre, leaf)   # roll back to the original
        elif fs.exists(pre):
            fs.delete(pre, True)       # both exist: swap finished, clean up
        if fs.exists(tmp):
            fs.delete(tmp, True)       # stale stage from an aborted rewrite

    # The ROOT itself may have been renamed away mid-swap — recover it
    # before anything lists it. A crashed LEAF may only be visible through
    # its __precompact / __compacting sibling (the original dir is gone),
    # so derive recovery bases from leaf-dir names, stripping the
    # housekeeping suffixes.
    root_base = str(root.toUri().getPath())
    _recover(root_base)
    if not fs.exists(root):
        return {
            "files_before": 0,
            "files_after": 0,
            "bytes": 0,
            "compacted": False,
            "skipped_concurrent": [],
        }
    bases = set()
    for leaf in _leaf_data_dirs(fs, Path, root):
        name = str(leaf.toUri().getPath())
        for suffix in ("__precompact", "__compacting"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        if name != root_base:
            bases.add(name)
    for base in sorted(bases):
        _recover(base)

    def _file_set(files) -> set:
        return {(str(st.getPath().toUri()), st.getLen()) for st in files}

    stats_before = _list_data_files(fs, root)
    total = sum(st.getLen() for st in stats_before)
    compacted_any = False
    skipped_concurrent: list[str] = []
    for leaf in _leaf_data_dirs(fs, Path, root):
        leaf_files = _list_data_files(fs, leaf)
        if len(leaf_files) < min_files_to_compact:
            continue
        leaf_bytes = sum(st.getLen() for st in leaf_files)
        n_out = max(1, math.ceil(leaf_bytes / target_bytes))
        leaf_uri = str(leaf.toUri())
        tmp = Path(str(leaf) + "__compacting")
        # read the SNAPSHOT file list, not the directory: the rewrite
        # must contain exactly the files compared by the guard below (a
        # directory read lists again at job time and could silently
        # include a concurrent append that the guard then misses)
        snapshot = _file_set(leaf_files)
        leaf_df = spark.read.parquet(
            *[str(st.getPath().toUri()) for st in leaf_files]
        )
        planned = (
            _plan_fn(leaf_df, n_out) if _plan_fn is not None
            else leaf_df.repartition(n_out)
        )
        planned.write.mode("overwrite").parquet(str(tmp.toUri()))
        # concurrent-writer guard: re-list immediately before the
        # stage-out rename; any change since the snapshot means another
        # writer touched the leaf — discard the stage, keep the leaf
        if _file_set(_list_data_files(fs, leaf)) != snapshot:
            fs.delete(tmp, True)
            skipped_concurrent.append(leaf_uri)
            continue
        old = Path(str(leaf) + "__precompact")
        if not fs.rename(leaf, old):
            fs.delete(tmp, True)
            raise IOError(f"compact_parquet: stage-out failed for {leaf_uri}")
        if not fs.rename(tmp, leaf):
            fs.rename(old, leaf)  # restore; staged dir left for inspection
            raise IOError(f"compact_parquet: swap failed for {leaf_uri}")
        fs.delete(old, True)
        compacted_any = True
    return {
        "files_before": len(stats_before),
        "files_after": len(_list_data_files(fs, root)),
        "bytes": total,
        "compacted": compacted_any,
        "skipped_concurrent": skipped_concurrent,
    }


def optimize_parquet(
    spark: SparkSession,
    path: str,
    cols: list[str],
    curve: str = "hilbert",
    bits: int = 16,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """OPTIMIZE-with-clustering for a plain-parquet store — the Delta /
    Iceberg ``OPTIMIZE ZORDER`` operation without a table format: rewrite
    every leaf data directory so its files are clustered along the
    space-filling curve of ``cols`` (``curve`` = "hilbert" for 2 columns,
    "zorder" for any), sized to ``target_bytes``. After the rewrite,
    min/max row-group skipping prunes on ANY of ``cols`` (measured 2.4×
    [z-order] / 3.7× [Hilbert] fewer files touched than a linear sort in
    README).

    Same machinery as :func:`compact_parquet`: Hadoop FileSystem API,
    per-leaf stage-and-swap with entry-time crash recovery, partition
    directories preserved. Every leaf is rewritten regardless of file
    count (the point is the layout, not the file count)."""
    from ..operators.layout import hilbert_layout, zorder_layout

    if curve == "hilbert":
        plan = lambda df, n: hilbert_layout(df, cols, bits, num_partitions=n)
    elif curve == "zorder":
        plan = lambda df, n: zorder_layout(df, cols, bits, num_partitions=n)
    else:
        raise ValueError(f"unknown curve {curve!r}")
    return compact_parquet(
        spark, path, target_bytes=target_bytes,
        min_files_to_compact=1, _plan_fn=plan,
    )


def retention_sweep(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """Retention/TTL delete on a partitioned store: remove whole
    ``partition_col=<value>`` directories whose value sorts BELOW
    ``keep_from`` — a pure directory operation, no data scan, the same
    partition-pruning contract reads rely on (values must be
    lexicographically ordered, e.g. ISO timestamps or zero-padded ids —
    exactly how the chunk store names epoch/chunk partitions).

    Uses the Hadoop FileSystem API, so it works against HDFS/S3A/local
    alike. Returns the deleted partition values (empty when nothing
    expired)."""
    fs, Path, root = _hadoop_fs(spark, path)
    deleted = []
    prefix = f"{partition_col}="
    for st in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        value = name[len(prefix):]
        if value < keep_from:
            fs.delete(st.getPath(), True)
            deleted.append(value)
    return deleted
