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
import re

import pandas as pd
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
    "manifest_commit",
    "write_manifested",
    "read_manifested",
    "compact_manifested",
    "optimize_manifested",
    "vacuum_manifested",
    "is_manifested",
    "maintain",
    "retention_sweep_manifested",
    "ManifestConflict",
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


class _FileInfo:
    """A FileStatus parsed driver-side from the bulk listing string —
    plain Python fields, ZERO py4j round trips to inspect. ``uri`` is the
    :func:`_canon_uri` rendering (``FileStatus.toString`` prints
    ``Path.toString()``, which is scheme(+authority) plus the DECODED
    ``URI.getPath()`` — the same form), so slicing against a
    ``_canon_uri`` root and rebuilding with ``Path(uri)`` both hold."""

    __slots__ = ("uri", "length", "mtime")

    def __init__(self, uri: str, length: int, mtime: int):
        self.uri = uri
        self.length = length
        self.mtime = mtime

    @property
    def name(self) -> str:
        return self.uri.rsplit("/", 1)[-1]

    @property
    def parent_uri(self) -> str:
        return self.uri.rsplit("/", 1)[0]

    # FileStatus-compatible accessors (getPath deliberately absent: a
    # Java Path costs a round trip — callers that need one build
    # ``Path(fi.uri)`` explicitly so the cost is visible)
    def getLen(self) -> int:
        return self.length

    def getModificationTime(self) -> int:
        return self.mtime


# One entry of ``ScalaRunTime.stringOf(FileStatus[])``. The class simple
# name varies (FileStatus / LocatedFileStatus / DeprecatedRawLocalFileStatus)
# but the field order is fixed in Hadoop's FileStatus.toString; directories
# print no length/replication/blocksize block. A pathological file name
# containing "; isDirectory=" would desynchronize the match — the caller
# compares match count against the Java array length and falls back to the
# per-element iterator when they disagree, so the fast path can only ever
# return exactly what the slow path would.
_FSTAT_RE = re.compile(
    r"FileStatus\{path=(?P<path>.*?); isDirectory=(?P<dir>true|false); "
    r"(?:length=(?P<len>\d+); replication=\d+; blocksize=\d+; )?"
    r"modification_time=(?P<mtime>\d+); access_time=\d+; "
)


def _ls_status(jvm, fs, jpath):
    """One-round-trip directory listing: (files, dirs) of ``_FileInfo``
    directly under ``jpath``, or None when the bulk rendering cannot be
    parsed (caller falls back to per-element iteration). Three py4j calls
    total (listStatus, len, stringOf) instead of ~4 per entry."""
    arr = fs.listStatus(jpath)
    n = len(arr)
    if n == 0:
        return [], []
    s = jvm.scala.runtime.ScalaRunTime.stringOf(arr)
    ms = list(_FSTAT_RE.finditer(s))
    if len(ms) != n:
        return None
    files, dirs = [], []
    for m in ms:
        fi = _FileInfo(
            m.group("path"), int(m.group("len") or 0), int(m.group("mtime"))
        )
        (dirs if m.group("dir") == "true" else files).append(fi)
    return files, dirs


def _list_data_files(fs, jpath) -> list[_FileInfo]:
    """Recursive ``_FileInfo`` list of parquet data files under ``jpath``
    (skips _metadata/_SUCCESS/hidden, like Spark's own listing). Bulk
    string-parsed listing per directory (r15, guide §5.3/§7.3: the
    RemoteIterator form paid ~4 driver→JVM round trips PER FILE — a
    10k-file store spent tens of seconds of serial driver latency just
    listing itself; this form pays 3 per DIRECTORY), with the iterator
    path kept as the parse-mismatch fallback."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:  # no JVM gateway to bulk-render through
        return _list_data_files_slow(fs, jpath)
    jvm = sc._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    out: list[_FileInfo] = []
    stack = [jpath]
    while stack:
        cur = stack.pop()
        res = _ls_status(jvm, fs, cur)
        if res is None:
            return _list_data_files_slow(fs, jpath)
        files, dirs = res
        for fi in files:
            if fi.name.endswith(".parquet") and not fi.name.startswith(("_", ".")):
                out.append(fi)
        stack.extend(Path(d.uri) for d in dirs if not d.name.startswith(("_", ".")))
    return out


def _list_data_files_slow(fs, jpath) -> list[_FileInfo]:
    """Per-element RemoteIterator fallback — same result, O(files) round
    trips. Kept for FileStatus.toString renderings the regex cannot read."""
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            u = p.toUri()
            auth = u.getAuthority()
            uri = (
                f"{u.getScheme()}://{auth}{u.getPath()}"
                if auth
                else f"{u.getScheme()}:{u.getPath()}"
            )
            out.append(_FileInfo(uri, st.getLen(), st.getModificationTime()))
    return out


def _uri_path(uri: str) -> str:
    """Bare path component of a canonical (decoded) URI string —
    ``file:/tmp/x`` → ``/tmp/x``, ``hdfs://nn:8020/d/x`` → ``/d/x``. The
    string twin of ``Path.toUri().getPath()`` for ``_canon_uri``-rendered
    strings (whose path part is already decoded, so no unquoting here)."""
    rest = uri.split(":", 1)[1] if ":" in uri else uri
    if rest.startswith("//"):
        # scheme://authority/path — drop the authority segment
        idx = rest.find("/", 2)
        return rest[idx:] if idx >= 0 else "/"
    return rest


def _leaf_data_dirs(fs, Path, jpath) -> list[str]:
    """Canonical URIs of directories that directly contain parquet data
    files — one entry for an unpartitioned store, one per ``col=value``
    leaf for a Hive-partitioned store. Compaction runs PER LEAF so
    partition directory names (and therefore pruning and partition-value
    types) are preserved byte-for-byte."""
    leaves: dict[str, str] = {}
    for fi in _list_data_files(fs, jpath):
        leaves.setdefault(fi.parent_uri, fi.parent_uri)
    return list(leaves.values())


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
    max_concurrent_leaf_rewrites: int = 4,
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
    (the rewrite reads exactly the snapshot files), RE-LISTED
    immediately before the stage-out rename, and re-checked AGAIN after
    it (a file appended in the list→rename gap travels with the leaf
    into ``__precompact`` — the post-rename compare rolls the leaf back
    before anything is deleted): if the set changed — a concurrent
    append — the staged rewrite is discarded and the leaf is skipped
    untouched (reported in ``skipped_concurrent``), so the new file's
    rows are never silently dropped. The guard's residual window is the
    rename's own atomicity; it does not replace the contract — for true
    multi-writer stores use the manifest protocol
    (:func:`write_manifested` / :func:`compact_manifested`), which
    needs no ``skipped_concurrent`` at all.

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
    for leaf_uri in _leaf_data_dirs(fs, Path, root):
        # strip scheme(+authority) → bare path, as _recover expects
        name = _uri_path(leaf_uri)
        for suffix in ("__precompact", "__compacting"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        if name != root_base:
            bases.add(name)
    for base in sorted(bases):
        _recover(base)

    def _file_set(files) -> set:
        return {(fi.uri, fi.length) for fi in files}

    stats_before = _list_data_files(fs, root)
    total = sum(fi.length for fi in stats_before)

    def _compact_leaf(leaf_uri: str) -> tuple[str, bool, bool]:
        """One leaf's stage-and-swap; returns (leaf_uri, compacted,
        skipped_concurrent). Leaf-local throughout — every path, guard,
        and rename touches only this leaf's dir and its __compacting /
        __precompact siblings."""
        leaf = Path(leaf_uri)
        leaf_files = _list_data_files(fs, leaf)
        if len(leaf_files) < min_files_to_compact:
            return leaf_uri, False, False
        leaf_bytes = sum(fi.length for fi in leaf_files)
        n_out = max(1, math.ceil(leaf_bytes / target_bytes))
        tmp = Path(leaf_uri + "__compacting")
        # read the SNAPSHOT file list, not the directory: the rewrite
        # must contain exactly the files compared by the guard below (a
        # directory read lists again at job time and could silently
        # include a concurrent append that the guard then misses)
        snapshot = _file_set(leaf_files)
        leaf_df = spark.read.parquet(*[fi.uri for fi in leaf_files])
        planned = (
            _plan_fn(leaf_df, n_out) if _plan_fn is not None
            else leaf_df.repartition(n_out)
        )
        planned.write.mode("overwrite").parquet(leaf_uri + "__compacting")
        # concurrent-writer guard: re-list immediately before the
        # stage-out rename; any change since the snapshot means another
        # writer touched the leaf — discard the stage, keep the leaf
        if _file_set(_list_data_files(fs, leaf)) != snapshot:
            fs.delete(tmp, True)
            return leaf_uri, False, True
        old = Path(leaf_uri + "__precompact")
        if not fs.rename(leaf, old):
            fs.delete(tmp, True)
            raise IOError(f"compact_parquet: stage-out failed for {leaf_uri}")
        # POST-rename guard (ADVICE r9): a file appended between the
        # re-list above and the rename traveled WITH the leaf into
        # `old` and would be deleted below — silent row loss. Re-list
        # `old` and compare by (name, len) (the URI prefix changed with
        # the rename); on mismatch roll the leaf back and skip it. This
        # closes the window to the rename's own atomicity.
        snap_names = {(u.rsplit("/", 1)[-1], ln) for u, ln in snapshot}
        old_names = {
            (fi.name, fi.length) for fi in _list_data_files(fs, old)
        }
        if old_names != snap_names:
            if not fs.rename(old, leaf):
                raise IOError(
                    f"compact_parquet: rollback failed for {leaf_uri}; "
                    "original data is intact under __precompact"
                )
            fs.delete(tmp, True)
            return leaf_uri, False, True
        if not fs.rename(tmp, leaf):
            fs.rename(old, leaf)  # restore; staged dir left for inspection
            raise IOError(f"compact_parquet: swap failed for {leaf_uri}")
        fs.delete(old, True)
        return leaf_uri, True, False

    # Leaves compact independently (leaf-local staging, guards, swap), so
    # overlap them on a small driver pool (guide §2.6) exactly like
    # compact_manifested: the streaming chunk store this op maintains
    # accumulates one leaf per batch dir, and a serial loop pays one
    # driver-sequential read→write job per leaf. A failed leaf propagates
    # after the pool drains; its own crash contract (__precompact /
    # __compacting recovery on next entry) is unchanged, and sibling
    # leaves are untouched or already swapped — the same states a serial
    # crash leaves behind. Results fold in sorted-leaf order.
    leaf_uris = sorted(_leaf_data_dirs(fs, Path, root))
    # Degenerate layouts (ADVICE r15): data files directly in a
    # NON-LEAF dir (e.g. the root) alongside partition leaf dirs make
    # that dir itself a "leaf" — but its rewrite would recursively
    # absorb every nested leaf's files (losing their dir-derived
    # partition values) and its stage-and-swap renames the whole
    # subtree away under concurrently-swapping descendants. Such
    # ancestor leaves are SKIPPED untouched (their files stay
    # uncompacted; descendants compact normally): a descendant of `a`
    # sorts at the insertion point of "a/", so one bisect per leaf
    # finds the nesting.
    import bisect

    ancestors = {
        a
        for a in leaf_uris
        if (i := bisect.bisect_left(leaf_uris, a + "/")) < len(leaf_uris)
        and leaf_uris[i].startswith(a + "/")
    }
    leaf_uris = [u for u in leaf_uris if u not in ancestors]
    pool_n = max(1, min(int(max_concurrent_leaf_rewrites), len(leaf_uris)))
    if leaf_uris and pool_n > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(
            max_workers=pool_n, thread_name_prefix="compact-leaf"
        ) as pool:
            results = list(
                pool.map(inheritable_thread_target(_compact_leaf), leaf_uris)
            )
    else:
        results = [_compact_leaf(u) for u in leaf_uris]
    results.sort(key=lambda t: t[0])
    compacted_any = any(c for _, c, _ in results)
    skipped_concurrent = [u for u, _, s in results if s]
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


# --------------------------------------------------------------------------
# Manifest-committed store (r10): the minimal transaction log that closes
# compact_parquet's residual list→rename race and gives readers snapshot
# isolation during compaction — the one capability the directory-listing
# store lacked vs a table format. Strictly dominates the reference's
# existence-check/empty-marker protocol (`combine_pose_id_chunk.py:245-249,
# 284-288`): that records "this chunk was processed"; the manifest records
# exactly WHICH files are live, atomically, with history.
#
# Layout:   <root>/_manifests/<version 20-digit>.json   (the log)
#           <root>/<partition dirs>/data-<token>-<i>.parquet (immutable data)
#           <root>/_staging/<token>/                    (writer scratch)
# A version doc is a CHECKPOINT {"version", "token", "op", "dc", "ts",
# "files": [{"path", "bytes", "stats"?}]} or a DELTA (same metadata with
# "add"/"removed" lists instead of "files") — the Delta-log design: every
# _CHECKPOINT_INTERVAL-th commit embeds the full list, the rest record
# only their resolved change, so commit cost is O(change) amortized (a
# full-snapshot-every-commit log paid O(store) per append: measured 0.57 s
# + a 5.9 MB doc rewrite per 1-file append at 100k files vs 0.10 s after —
# bench_runs_r11/commit_cost.json). Readers resolve state by replaying
# from the nearest checkpoint (≤ interval small doc reads, memoized —
# version files are immutable once acknowledged). A data file not (yet)
# referenced is invisible, so a crashed writer can never corrupt a read
# and compaction's swap is one atomic commit, not N dir renames.
#
# Commit concurrency: a version file is written to a hidden tmp name and
# RENAMED into its slot — readers can never observe a half-written
# manifest (create-then-write would expose partial JSON on every
# filesystem, and a racer reading a partial head builds on a stale file
# set: a lost add). The rename is the CAS: on HDFS it fails if the slot
# is taken; on raw local file:// rename overwrites, so commits also hold
# a per-store in-process lock (Spark commits are driver-side, and one
# driver per store is the normal file:// deployment) and re-read the slot
# to verify their embedded token — a loser rebuilds against the winner's
# head and retries, so a lost race is a retry, never a lost row. True
# multi-DRIVER commit safety needs a filesystem whose rename (HDFS) or
# conditional put (S3) is exclusive — same contract as every table
# format. Readers skip unparseable manifests (walk down from the head);
# committers slot PAST any corpse.
# --------------------------------------------------------------------------

_MANIFEST_DIR = "_manifests"
_MANIFEST_LOCKS: dict = {}
_MANIFEST_LOCKS_GUARD = __import__("threading").Lock()


def _manifest_lock(root_str: str):
    with _MANIFEST_LOCKS_GUARD:
        return _MANIFEST_LOCKS.setdefault(
            root_str, __import__("threading").Lock()
        )


def _canon_uri(fs, jpath) -> str:
    """Canonical qualified path string for ``jpath`` — scheme(+authority)
    plus the DECODED path (``URI.getPath()``), e.g. ``file:/tmp/ro ot/x``,
    ``hdfs://nn:8020/data/p=c%2Fd``. ALWAYS compare/slice paths through
    this, and always rebuild with ``Path(f"{canon}/{rel}")``.

    Decoded, not ``str(uri)``: Hadoop's ``Path(String)`` keeps percent
    escapes as LITERAL characters (the multi-arg URI constructor quotes
    them internally and getPath() unquotes), so a string that
    round-trips through ``Path`` must be the raw on-disk rendering. The
    previous encoded form was self-consistent for ASCII-safe roots but
    RELOCATED any store whose root contains a space/%/non-ASCII char
    into a literally-percent-encoded directory (``ro ot`` → ``ro%20ot``
    on disk), and slices needed a one-level unquote to recover raw
    partition dir names. One decoded rendering removes both. The
    empty-authority local scheme also renders consistently here
    (``file:/tmp/...`` whether qualified fresh or from a FileStatus)."""
    u = fs.makeQualified(jpath).toUri()
    auth = u.getAuthority()
    p = u.getPath()
    return (
        f"{u.getScheme()}://{auth}{p}" if auth else f"{u.getScheme()}:{p}"
    )


def _canon_uri_str(uri: str) -> str:
    """Pure-Python :func:`_canon_uri` for an ALREADY-QUALIFIED encoded URI
    string (e.g. ``input_file_name()`` output, ``file:///tmp/a%20b``):
    decode the path, normalize the empty-authority local form — zero py4j
    round trips. Only for qualified inputs; a bare path has no scheme to
    preserve and must go through the JVM qualifier."""
    from urllib.parse import unquote

    scheme, rest = uri.split(":", 1)
    if rest.startswith("//"):
        idx = rest.find("/", 2)
        auth = rest[2:idx] if idx >= 0 else rest[2:]
        p = unquote(rest[idx:]) if idx >= 0 else ""
        return f"{scheme}://{auth}{p}" if auth else f"{scheme}:{p}"
    return f"{scheme}:{unquote(rest)}"


def _merge_schema_json(a: dict | None, b: dict | None) -> dict | None:
    """Union two ``StructType.jsonValue()`` docs by field name — the
    add-column evolution rule (first occurrence keeps its type, new
    names append). Commits record the running union (see
    :func:`manifest_commit`'s ``schema``), so the head doc always
    carries the store's full schema even after months of evolution and
    any number of compactions."""
    if a is None:
        return b
    if b is None:
        return a
    fields = list(a["fields"])
    seen = {f["name"] for f in fields}
    for f in b["fields"]:
        if f["name"] not in seen:
            fields.append(f)
            seen.add(f["name"])
    return {"type": "struct", "fields": fields}


def _raw_fs(fs):
    """The checksum-free filesystem under a local ChecksumFileSystem, else
    ``fs`` itself. Manifest files are read/written RAW: the checksum layer
    pairs every file with a ``.crc`` sibling, and the (file, crc) rename
    pair is not atomic — a reader catching the gap gets a spurious
    ChecksumException, reads a STALE head, and a racing committer would
    build on it (a lost add). Raw I/O makes the tmp→slot rename the single
    atomic event; HDFS/object stores have no such wrapper and fall
    through."""
    try:
        return fs.getRawFileSystem()
    except Exception:
        return fs


def _manifest_read_text(spark, fs, jpath) -> str:
    stream = _raw_fs(fs).open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _manifest_versions(fs, Path, root_str: str) -> list[int]:
    mdir = Path(f"{root_str}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    # bulk-parsed listing (r15): 3 py4j round trips for the whole log dir
    # instead of ~3 per version file — _manifest_head runs this on every
    # public storage op, so a long-lived store paid O(versions) driver
    # latency per call. Same fallback discipline as _list_data_files.
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    res = _ls_status(sc._jvm, fs, mdir) if sc is not None else None
    if res is not None:
        files, _dirs = res
        return sorted(
            int(fi.name[:-5])
            for fi in files
            if fi.name.endswith(".json") and fi.name[:-5].isdigit()
        )
    vs = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".json") and name[:-5].isdigit():
            vs.append(int(name[:-5]))
    return sorted(vs)


# Every _CHECKPOINT_INTERVAL-th commit embeds the FULL file list (a
# checkpoint); the commits between record only their {add, removed}
# delta — so commit cost is O(change) amortized, not O(store) always
# (measured before the change, tools/measure_commit_cost.py: a 1-file
# append against a 100k-file store cost 0.57 s and a 5.9 MB doc rewrite
# — the Delta-log checkpoint+delta design removes exactly that term).
_CHECKPOINT_INTERVAL = 16


def _doc_is_valid(doc) -> bool:
    """A committed doc is a CHECKPOINT (full ``files`` list — every
    pre-delta-log doc is one) or a DELTA (explicit ``add``/``removed``
    lists, resolved at commit time)."""
    if not isinstance(doc, dict):
        return False
    if isinstance(doc.get("files"), list):
        return True
    return isinstance(doc.get("add"), list) and isinstance(
        doc.get("removed"), list
    )


def _apply_doc(state: dict, doc: dict) -> dict:
    """Replay one committed doc onto ``state`` (path -> entry). The
    universal rule: a checkpoint RESETS state; a delta applies its
    resolved removes then its adds (an add replacing the same path
    overwrites by key)."""
    if isinstance(doc.get("files"), list):
        return {f["path"]: f for f in doc["files"]}
    for p in doc["removed"]:
        state.pop(p, None)
    for f in doc["add"]:
        state[f["path"]] = f
    return state


# resolved-state cache: an acknowledged version file is immutable (local
# fs: hard-link publish — the slot inode can never be replaced; HDFS:
# rename-to-existing fails), so (store, version) →
# resolved file list is a pure function — caching it turns the per-commit
# O(head) re-parse in commit-heavy loops (the streaming sink: one commit
# per micro-batch) into a dict hit. Tiny and bounded; thread-safe under
# the GIL for the dict ops that matter.
_STATE_CACHE: dict = {}
_STATE_CACHE_MAX = 8


def _resolve_state_at(spark, fs, Path, root_str: str, version: int,
                      versions: list[int]):
    """(files AS OF ``version``, deltas since the nearest checkpoint) —
    the memoized replay core. None when the version's doc is
    missing/corrupt or no checkpoint survives below it (vacuum retains
    back to a checkpoint precisely so this cannot happen on a maintained
    store). Corrupt docs mid-chain are skipped — they were never
    acknowledged heads, so they carry no changes. Recursion depth is
    bounded by the checkpoint interval."""
    key = (root_str, version)
    hit = _STATE_CACHE.get(key)
    if hit is not None:
        return hit
    doc = _manifest_doc(spark, fs, Path, root_str, version)
    if doc is None:
        return None
    if "files" in doc:
        res = (list(doc["files"]), 0)
    else:
        sub = None
        for v in reversed([x for x in versions if x < version]):
            sub = _resolve_state_at(spark, fs, Path, root_str, v, versions)
            if sub is not None:
                break
        if sub is None:
            return None  # no checkpoint below — unresolvable
        state = _apply_doc({f["path"]: f for f in sub[0]}, doc)
        res = ([state[p] for p in sorted(state)], sub[1] + 1)
    if len(_STATE_CACHE) >= _STATE_CACHE_MAX:
        _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
    _STATE_CACHE[key] = res
    return res


def _resolve_files_at(spark, fs, Path, root_str: str, version: int,
                      versions: list[int] | None = None):
    """The store's full file state AS OF ``version`` (see
    :func:`_resolve_state_at`); None when unresolvable."""
    if versions is None:
        versions = _manifest_versions(fs, Path, root_str)
    res = _resolve_state_at(spark, fs, Path, root_str, version, versions)
    return None if res is None else res[0]


def _manifest_head(spark, fs, Path, root_str: str):
    """Newest RESOLVABLE manifest as (head_version, doc, next_free_slot),
    the doc's ``files`` materialized through the checkpoint+delta replay —
    walks down past any corrupt version file a lost commit race left
    behind. CRITICAL: head and next slot come from the SAME directory
    listing — sampling them separately lets a version land in the gap and
    be slotted PAST without ever being read, committing a head that drops
    its changes. The returned doc carries ``_ckpt_dist`` (commits since
    the newest checkpoint — the commit path's checkpoint cadence input).
    (-1, None, 0) on a store with no manifests yet."""
    versions = _manifest_versions(fs, Path, root_str)
    next_slot = (versions[-1] + 1) if versions else 0
    for v in reversed(versions):
        doc = _manifest_doc(spark, fs, Path, root_str, v)
        if doc is None:
            continue  # corrupt corpse — never an acknowledged head
        res = _resolve_state_at(spark, fs, Path, root_str, v, versions)
        if res is None:
            # a parseable delta with no checkpoint below: someone deleted
            # log files by hand (vacuum retains back to a checkpoint).
            # Treating this as an empty store would let the next commit
            # checkpoint over the surviving history — refuse instead.
            raise IOError(
                f"manifest log under {root_str} has delta commits but no "
                f"reachable checkpoint — the log was externally truncated"
            )
        out = dict(doc)
        out["files"] = res[0]
        out["_ckpt_dist"] = res[1]
        return v, out, next_slot
    return -1, None, next_slot


class ManifestConflict(RuntimeError):
    """A rewrite commit's read snapshot was invalidated: some file it
    rewrote was removed/replaced by a concurrent commit. The rewrite's
    output is stale — committing it would RESURRECT replaced rows — so
    the caller must discard it (the files stay invisible orphans for
    vacuum) and retry from the new head if still worthwhile. Appends
    never see this; it is the Delta/Iceberg rewrite-validation rule."""


def manifest_commit(
    spark: SparkSession,
    path: str,
    add: list[tuple[str, int]] = (),
    remove: list[str] = (),
    remove_prefixes: list[str] = (),
    max_retries: int = 50,
    require_remove_present: bool = False,
    op: str = "append",
    data_change: bool = True,
    schema: dict | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Atomically commit a file-set change to the manifest log: the new
    head = newest parseable head minus ``remove`` (relative paths) minus
    every path starting with one of ``remove_prefixes`` plus ``add``
    ((relative path, bytes) pairs). Optimistic CAS loop — on a lost race
    the change is rebuilt against the winner's head, so concurrent
    writers/compactors compose instead of clobbering.

    ``remove_prefixes`` is the dynamic-partition-overwrite primitive: a
    static ``remove`` list names exactly the files the caller READ, while
    a prefix drops whatever files live under a partition/batch dir AT
    COMMIT TIME — re-evaluated on every CAS rebuild, so "replace chunk X"
    stays correct even when a racing writer appended to chunk X between
    our build and our commit (the racer's files are under the prefix and
    are replaced, exactly the last-writer-wins contract of a partition
    overwrite).

    ``require_remove_present=True`` is for REWRITE commits (compaction,
    optimize, the streaming fold): if any path in ``remove`` is already
    gone from the head at commit time, a concurrent commit replaced a
    file this rewrite read — its staged output would resurrect replaced
    rows — so :class:`ManifestConflict` is raised instead of committing.

    ``op``/``data_change`` are recorded in the manifest doc (plus a
    wall-clock ``ts``) — the Delta/Iceberg ``dataChange`` convention.
    ``data_change=False`` marks a REWRITE: the commit reorganizes bytes
    (compaction, OPTIMIZE, the streaming fold) without changing the
    logical row set, so :func:`read_manifested_changes` skips its adds
    and does not treat its removes as replacements. Leave the default
    for anything that adds/overwrites/expires rows. Manifests written
    before these fields existed read back as data changes (conservative).
    Returns the committed version number."""
    import time as _time
    import uuid

    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    fs.mkdirs(Path(f"{root_str}/{_MANIFEST_DIR}"))
    drop = set(remove)
    prefixes = tuple(remove_prefixes)
    for _ in range(max_retries):
        # head and target slot from ONE listing (see _manifest_head); the
        # slot is past every existing version file, parseable or not — a
        # corrupt corpse must be slotted over, not retried into forever
        head_v, head, next_v = _manifest_head(spark, fs, Path, root_str)
        # full entries, not just bytes: per-file stats (and any future
        # metadata) must survive commits that do not touch the file
        cur = {f["path"]: f for f in (head["files"] if head else [])}
        if require_remove_present:
            gone = sorted(drop - set(cur))
            if gone:
                raise ManifestConflict(
                    f"rewrite under {path} is stale: {len(gone)} of its "
                    f"source files were replaced by a concurrent commit "
                    f"(e.g. {gone[0]!r}) — discarding the rewrite"
                )
        nxt = {
            p: e
            for p, e in cur.items()
            if p not in drop
            and not (prefixes and p.startswith(prefixes))
        }
        added_paths = []
        for item in add:
            p, b = item[0], item[1]
            entry = {"path": p, "bytes": b}
            if len(item) > 2 and item[2]:
                entry["stats"] = item[2]
            if len(item) > 3 and item[3]:
                entry["bloom"] = item[3]
            nxt[p] = entry
            added_paths.append(p)
        token = uuid.uuid4().hex
        body = {
            "version": next_v,
            "token": token,
            "op": op,
            "dc": bool(data_change),
            "ts": _time.time(),
        }
        # the store's schema rides the log (Delta/Iceberg style): every
        # commit records the running union of (head schema, this
        # commit's schema), so maintenance rewrites carry evolution
        # forward and the head doc is authoritative for consumers that
        # cannot afford O(files) footer reads (the manifest_cdc stream
        # source). Pre-upgrade docs simply lack the field (consumers
        # fall back to footers). Exception: a full-store replace or a
        # RESTORE RESETS the schema to the commit's own (Delta's
        # overwriteSchema/RESTORE rule) — the union would keep dropped
        # columns alive forever and merge_schema reads would resurrect
        # them as all-null.
        if op in ("overwrite-all", "restore") and schema is not None:
            doc_schema = schema
        else:
            doc_schema = _merge_schema_json(
                (head or {}).get("schema"), schema
            )
        if doc_schema is not None:
            body["schema"] = doc_schema
        # partition-column NAMES ride the log too (their types are in
        # the schema doc — df.schema includes partition columns at
        # write time, unlike the data-file footers Spark strips them
        # from). Consumers (the manifest_cdc source) use this to fill
        # dir-derived columns at their true write-time types instead of
        # probing one file's directory segments and guessing
        # Long-vs-String. Sticky across commits that don't restate it
        # (maintenance rewrites don't know the layout).
        doc_parts = (
            list(partition_cols) if partition_cols is not None
            else (head or {}).get("parts")
        )
        if doc_parts is not None:
            body["parts"] = doc_parts
        if head is None or head["_ckpt_dist"] + 1 >= _CHECKPOINT_INTERVAL:
            # checkpoint cadence: embed the full list so resolution stays
            # O(interval) doc reads and vacuum can trim the log. The
            # delta lists are OMITTED here — a checkpoint resets replay
            # state, and the changes walk derives its delta by set-diff
            # against the running state
            body["files"] = [nxt[p] for p in sorted(nxt)]
        else:
            # the RESOLVED delta (prefix removes expanded against this
            # head) — replayable without re-deriving anything
            body["add"] = [nxt[p] for p in dict.fromkeys(added_paths)]
            body["removed"] = sorted(p for p in cur if p not in nxt)
        doc = json.dumps(body).encode()
        target = Path(f"{root_str}/{_MANIFEST_DIR}/{next_v:020d}.json")
        tmp = Path(f"{root_str}/{_MANIFEST_DIR}/.tmp-{token}.json")
        rfs = _raw_fs(fs)
        if root_str.startswith("file:") and not root_str.startswith(
            "file://"
        ):
            # LOCAL fs: hard-link publish — a TRUE multi-process CAS.
            # os.link raises FileExistsError when the slot is taken, and
            # the linked inode is fully written before it becomes
            # visible, so a version file is IMMUTABLE from the first
            # moment any reader can see it: no rename-overwrite window,
            # no token verify, no transiently-differing doc for a reader
            # caught between two racing committers. The in-process lock
            # stays only to cheapen same-process races (fewer wasted
            # rebuilds); correctness no longer depends on it. Guarded to
            # the empty-authority form (_canon_uri renders it file:/…) —
            # a file://host/… URI is not slice-able to an os path.
            # root_str is the DECODED rendering (_canon_uri), i.e. the
            # literal on-disk name — sliceable straight to an os path.
            import os as _os

            mdir_local = f"{root_str[len('file:'):]}/{_MANIFEST_DIR}"
            tmp_local = f"{mdir_local}/.tmp-{token}.json"
            target_local = f"{mdir_local}/{next_v:020d}.json"
            with _manifest_lock(root_str):
                with open(tmp_local, "wb") as fh:
                    fh.write(doc)
                try:
                    _os.link(tmp_local, target_local)
                except FileExistsError:
                    continue  # lost the race — rebuild on winner's head
                finally:
                    _os.unlink(tmp_local)
            return next_v
        with _manifest_lock(root_str):
            if rfs.exists(target):
                continue  # slot taken while we built our doc — rebuild
            out = rfs.create(tmp, True)
            try:
                out.write(bytearray(doc))
            finally:
                out.close()
            # rename INTO the slot: readers never see partial JSON, and
            # on HDFS a taken slot makes the rename fail (the CAS)
            if not rfs.rename(tmp, target):
                rfs.delete(tmp, False)
                continue
        # hedge for remote filesystems whose rename silently overwrites:
        # verify our token won (HDFS rename-to-existing fails, so this
        # read normally just confirms)
        try:
            back = json.loads(_manifest_read_text(spark, fs, target))
        except Exception:
            continue
        if back.get("token") == token:
            return next_v
    raise IOError(
        f"manifest_commit: lost {max_retries} consecutive commit races "
        f"under {path} — check for a runaway writer loop"
    )


def _stat_val(v):
    """JSON-safe, ORDER-PRESERVING encoding for a per-file stat bound:
    numbers stay numbers; timestamps/dates/strings become ISO-ish strings
    whose lexicographic order matches their natural order (pandas
    isoformat is zero-padded; a '.123456' fraction suffix still compares
    correctly against its unfractioned prefix)."""
    if v is None or isinstance(v, (int, float)):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


_BLOOM_DIR = "_index"
_BLOOM_K = 4

# observability counter for the sidecar-GET claim (tools/
# measure_dml_scale.py reads it): how many sidecar OBJECTS a bloom
# pass actually fetched — consolidated bloomsets (one per commit) vs
# legacy per-file sidecars. Process-local, test/measurement use only.
_BLOOM_GETS = {"objects": 0, "per_file": 0}

# measurement hook (tools/measure_bloom_compaction.py): seconds of
# injected latency per driver-side sidecar GET, simulating object-store
# round trips against the local fixture. 0.0 (production) is a no-op;
# executor-side GETs (the >64-legacy distributed branch) don't see it.
_SIDECAR_LATENCY_S = 0.0


def _encoded_root_uri(root_str: str) -> str:
    """Re-encode a canonical DECODED root (:func:`_canon_uri` rendering)
    into the strictly-encoded URI ``pyarrow.fs.FileSystem.from_uri``
    demands. from_uri percent-DECODES its input, so feeding it the
    decoded rendering silently relocates any root containing a literal
    ``%xx`` sequence and rejects spaces/non-ASCII outright (the r12
    ADVICE finding: the distributed sidecar probe then quietly degraded
    to the sequential driver loop). A SCHEME-LESS root (bare path —
    nothing :func:`_canon_uri` emits today, but callers pass user
    strings through) is returned UNCHANGED: ``from_uri`` treats a bare
    path as a literal local path and does NOT percent-decode it, so
    encoding would relocate it — previously the ``split(':')`` unpack
    raised ValueError here (r13 ADVICE finding)."""
    from urllib.parse import quote

    if ":" not in root_str:
        return root_str
    scheme, rest = root_str.split(":", 1)
    if rest.startswith("//"):
        authority, sep, p = rest[2:].partition("/")
        return (
            f"{scheme}://{authority}/{quote(p)}" if sep
            else f"{scheme}://{authority}"
        )
    return f"{scheme}:{quote(rest)}"


def _bloom_position_exprs(col: str, m: int) -> list:
    """k Spark Column position expressions for a value's bloom bits —
    md5 of the value's STRING form, k disjoint 8-hex-digit slices mod m.
    md5-on-string is the one hash both engines compute identically
    (python: :func:`_bloom_positions_py`); restrict bloom columns to
    string/integer types so the string form is canonical. Built as ONE
    parsed SQL expression per slice (r15): the Column-algebra form paid
    ~5 py4j round trips per slice per column on every sidecar-computing
    commit; the parsed trees are the same Catalyst nodes."""
    return [F.expr(_bloom_position_sql(col, m, i)) for i in range(_BLOOM_K)]


def _bloom_position_sql(col: str, m: int, i: int) -> str:
    return (
        f"pmod(cast(conv(substring(md5(cast(`{col}` as string)), "
        f"{1 + 8 * i}, 8), 16, 10) as bigint), {m})"
    )


def _bloom_positions_py(value, m: int) -> list[int]:
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    return [int(h[8 * i: 8 * i + 8], 16) % m for i in range(_BLOOM_K)]


def _bloom_might_contain(bits: bytes, m: int, value) -> bool:
    return all(
        bits[p >> 3] & (1 << (p & 7)) for p in _bloom_positions_py(value, m)
    )


def _bloom_filter_rels(
    spark, fs, Path, root_str: str,
    with_bloom: list[tuple[str, str]], point: dict,
) -> set[str]:
    """The rel paths whose bloom sidecars MIGHT contain every point
    value — a value may be a LIST (file kept when ANY listed value might
    be present: the forget-these-users / merge-by-keys shape).

    Two sidecar formats (the r12 VERDICT's top item — per-file sidecars
    mean O(files) GETs per point read on an object store):

    - CONSOLIDATED (the current writer): one ``_index/bloomset-*.json``
      per COMMIT holding every staged file's bitsets under ``files``;
      manifest entries point at ``<object>#<rel>``. A point read issues
      O(commits touched) GETs, not O(files) — read driver-side, one GET
      per distinct object (thread-pooled), never data I/O.
    - LEGACY per-file (``_index/<rel>.bloom``, pre-r13 stores): one tiny
      object each. Executor-distributed above 64 files (plain open() on
      a local root, pyarrow.fs elsewhere); sequential driver loop only
      for roots pyarrow has no handler for (logged — silent degradation
      was the r12 ADVICE finding)."""
    import base64

    vals = {
        c: (list(v) if isinstance(v, (list, tuple, set)) else [v])
        for c, v in point.items()
    }

    def _test(m: int, cols: dict) -> bool:
        for c, vlist in vals.items():
            if c not in cols:
                return True  # no bloom for this column — conservative
            bits = base64.b64decode(cols[c])
            if not any(_bloom_might_contain(bits, m, v) for v in vlist):
                return False
        return True

    local_root = None
    if root_str.startswith("file:") and not root_str.startswith("file://"):
        local_root = root_str[len("file:"):]

    consolidated: dict[str, list[tuple[str, str]]] = {}
    legacy: list[tuple[str, str]] = []
    for rel, ptr in with_bloom:
        if "#" in ptr:
            obj, _, member = ptr.partition("#")
            consolidated.setdefault(obj, []).append((rel, member))
        else:
            legacy.append((rel, ptr))
    out: set[str] = set()
    _BLOOM_GETS["objects"] += len(consolidated)
    _BLOOM_GETS["per_file"] += len(legacy)

    if consolidated:
        def _read_obj(obj: str) -> dict | None:
            # a missing/corrupt index object is a lost OPTIMIZATION, not
            # an error: every member file is conservatively kept (the
            # row predicate stays authoritative) — same degradation
            # rule as a file with no bloom at all. "Corrupt" includes
            # parses-as-JSON-but-wrong-shape (truncated/foreign file):
            # a doc without an int "m" and dict "files" degrades to
            # keep-all exactly like a missing object, instead of
            # KeyError-ing the point read (r13 ADVICE finding).
            if _SIDECAR_LATENCY_S:
                __import__("time").sleep(_SIDECAR_LATENCY_S)
            try:
                if local_root is not None:
                    with open(os.path.join(local_root, obj)) as f:
                        doc = json.load(f)
                else:
                    doc = json.loads(_manifest_read_text(
                        spark, fs, Path(f"{root_str}/{obj}")
                    ))
            except Exception:
                return None
            if (
                not isinstance(doc, dict)
                or not isinstance(doc.get("m"), int)
                or not isinstance(doc.get("files"), dict)
            ):
                return None
            return doc

        objs = list(consolidated)
        if len(objs) > 4:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=16) as pool:
                docs = dict(zip(objs, pool.map(_read_obj, objs)))
        else:
            docs = {o: _read_obj(o) for o in objs}
        for obj, members in consolidated.items():
            doc = docs[obj]
            per_file = {} if doc is None else doc.get("files", {})
            for rel, member in members:
                cols = per_file.get(member)
                if cols is None or not isinstance(cols, dict):
                    # missing member/object, or a non-dict member value
                    # (truncated/foreign write) — conservative keep
                    out.add(rel)
                    continue
                try:
                    prune = not _test(doc["m"], cols)
                except Exception:
                    # corrupt base64 bitset / wrong value types inside a
                    # member: degrade to keep, same rule as the legacy
                    # per-file branches — never fail the point read
                    prune = False
                if not prune:
                    out.add(rel)

    if not legacy:
        return out
    pa_ok = False
    if local_root is None and len(legacy) > 64:
        # executor-side sidecar access for the per-file format: plain
        # open() for a local root; for any other scheme, pyarrow.fs
        # resolved from the RE-ENCODED root URI on each executor (the
        # same shim discipline as the manifest_cdc stream source).
        try:
            import pyarrow.fs as pafs

            pafs.FileSystem.from_uri(_encoded_root_uri(root_str))  # probe
            pa_ok = True
        except Exception:
            import warnings

            warnings.warn(
                f"bloom sidecar probe: pyarrow has no handler for "
                f"{root_str!r} — falling back to a sequential driver "
                f"loop of {len(legacy)} Hadoop reads",
                RuntimeWarning,
                stacklevel=2,
            )

    if (local_root is not None or pa_ok) and len(legacy) > 64:
        pairs = spark.createDataFrame(
            pd.DataFrame(legacy, columns=["rel", "sidecar"])
        )
        root_for_task = _encoded_root_uri(root_str)

        def _check(batches):
            pfs = proot = None
            if local_root is None:
                import pyarrow.fs as pafs

                pfs, proot = pafs.FileSystem.from_uri(root_for_task)

            def _read(sidecar: str) -> dict:
                if pfs is None:
                    with open(os.path.join(local_root, sidecar)) as f:
                        return json.load(f)
                with pfs.open_input_stream(f"{proot}/{sidecar}") as f:
                    return json.loads(f.read())

            for pdf in batches:
                keep = []
                for rel, sidecar in zip(pdf["rel"], pdf["sidecar"]):
                    # same degrade rule as the consolidated branch: a
                    # missing/corrupt/misshapen sidecar keeps its file
                    try:
                        doc = _read(sidecar)
                        prune = isinstance(doc.get("m"), int) and \
                            not _test(doc["m"], doc["cols"])
                    except Exception:
                        prune = False
                    if not prune:
                        keep.append(rel)
                yield pd.DataFrame({"rel": keep})

        out.update(
            r.rel
            for r in pairs.mapInPandas(_check, "rel string").collect()
        )
        return out
    for rel, sidecar in legacy:
        if _SIDECAR_LATENCY_S:
            __import__("time").sleep(_SIDECAR_LATENCY_S)
        try:
            doc = json.loads(
                _manifest_read_text(spark, fs, Path(f"{root_str}/{sidecar}"))
            )
            prune = isinstance(doc.get("m"), int) and \
                not _test(doc["m"], doc["cols"])
        except Exception:
            prune = False  # unreadable sidecar — conservative keep
        if not prune:
            out.add(rel)
    return out


def _stage_files(
    spark: SparkSession,
    df: DataFrame,
    fs,
    Path,
    root_str: str,
    partition_by: list[str] | None,
    filename_prefix: str,
    stats_cols: list[str] | None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 17,
) -> tuple[list[tuple[str, int]], dict[str, dict], set[str], dict[str, str]]:
    """Write ``df`` under ``_staging/<token>`` and move the part files to
    their final (partition) dirs under unique token names — the shared
    stage step of every data-adding commit (append/overwrite/merge/
    delete). NOTHING becomes visible until the caller's
    :func:`manifest_commit`; a crash leaves only invisible orphans for
    vacuum. Returns (adds [(rel, bytes[, stats])-compatible pairs],
    per-rel stats, staged partition dirs, per-rel bloom sidecar paths)."""
    import uuid

    token = uuid.uuid4().hex
    stage_str = f"{root_str}/_staging/{token}"
    if partition_by:
        # a DML rewrite touching ONLY the __HIVE_DEFAULT_PARTITION__
        # file reads its partition column as all-null VOID (partition
        # types are inferred from values); Spark refuses to partition
        # by VOID — cast to string, which round-trips null back to the
        # default-partition dir unchanged
        from pyspark.sql.types import NullType

        for fld in df.schema.fields:
            if fld.name in partition_by and isinstance(fld.dataType, NullType):
                df = df.withColumn(fld.name, F.col(fld.name).cast("string"))
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage_str)
    # an empty df (e.g. a DELETE whose touched files lose every row)
    # stages no part files: skip the stats/bloom scans (a parquet read
    # of a fileless dir cannot infer a schema) and return zero adds
    staged = _list_data_files(fs, Path(stage_str))
    if not staged:
        stats_cols = bloom_cols = None
    stats_by_file: dict[str, dict] = {}
    bloom_by_file: dict[str, dict] = {}
    if stats_cols or bloom_cols:
        # ONE scan of the staged write (bounded by it, never the store)
        # computes BOTH sidecar families per file: min/max stats and the
        # distinct bloom BIT POSITIONS (md5-slice hash — see
        # _bloom_position_exprs; the driver packs them into bitsets).
        # r15: these were two separate read+groupBy+collect jobs when a
        # write asked for both — same aggregation tree, one pass now.
        aggs = []
        for c in stats_cols or []:
            aggs += [
                F.expr(f"min(`{c}`) as `__lo_{c}`"),
                F.expr(f"max(`{c}`) as `__hi_{c}`"),
            ]
        aggs += [
            F.expr(
                "array_distinct(flatten(collect_list(array("
                + ", ".join(
                    _bloom_position_sql(c, bloom_bits, i)
                    for i in range(_BLOOM_K)
                )
                + f")))) as `__bp_{c}`"
            )
            for c in bloom_cols or []
        ]
        # the staged dir was JUST written from ``df`` — its data-file
        # schema is df minus the partition columns, so serve it to the
        # reader explicitly and skip the distributed footer-inference
        # job every sidecar-computing commit otherwise pays (r15, guide
        # §5.3; the _dml_read log-schema rule applied to staging). Only
        # when a sidecar col IS a partition col does the read need
        # partition-dir values — that rare shape keeps the inferring
        # reader (identical to the pre-r15 path).
        part = set(partition_by or [])
        sidecar_cols = set(stats_cols or []) | set(bloom_cols or [])
        rd = spark.read
        if not (sidecar_cols & part):
            from pyspark.sql.types import StructType

            rd = rd.schema(
                StructType([f for f in df.schema.fields if f.name not in part])
            )
        for row in (
            rd.parquet(stage_str)
            .groupBy(F.input_file_name().alias("__f"))
            .agg(*aggs)
            .collect()
        ):
            if stats_cols:
                stats_by_file[row["__f"]] = {
                    c: [_stat_val(row[f"__lo_{c}"]), _stat_val(row[f"__hi_{c}"])]
                    for c in stats_cols
                }
            if bloom_cols:
                bloom_by_file[row["__f"]] = {
                    c: row[f"__bp_{c}"] for c in bloom_cols
                }
    add_stats: dict[str, dict] = {}
    bloom_positions: dict[str, dict] = {}
    staged_dirs: set[str] = set()
    # canon the agg keys with ZERO py4j calls (r15): input_file_name()
    # and FileStatus render the same file with different scheme
    # spellings, so matching must be canonical. `_canon_uri_str` is the
    # pure-Python twin of `_canon_uri` (decode + normalize authority);
    # if any canonized key fails to land on a staged file — an encoding
    # the Python decode renders differently than Java's URI.getPath() —
    # rebuild both maps through the JVM canon (the pre-r15 path), so a
    # mismatch can only ever cost round trips, never drop a sidecar.
    staged_uris = {fi.uri for fi in staged}
    stats_by_canon = {_canon_uri_str(k): v for k, v in stats_by_file.items()}
    bloom_by_canon = {_canon_uri_str(k): v for k, v in bloom_by_file.items()}
    if not (set(stats_by_canon) <= staged_uris and set(bloom_by_canon) <= staged_uris):
        stats_by_canon = {
            _canon_uri(fs, Path(k)): v for k, v in stats_by_file.items()
        }
        bloom_by_canon = {
            _canon_uri(fs, Path(k)): v for k, v in bloom_by_file.items()
        }
    moves: list[tuple] = []
    made_dirs: set[str] = set()
    for i, fi in enumerate(staged):
        # partition subpath between the staging root and the file — RAW
        # names (canon strings are decoded, so the slice IS the raw name)
        rel_dir = fi.parent_uri[len(stage_str):].strip("/")
        staged_dirs.add(f"{rel_dir}/" if rel_dir else "")
        name = f"{filename_prefix}data-{token}-{i:05d}.parquet"
        rel = f"{rel_dir}/{name}" if rel_dir else name
        if rel_dir not in made_dirs:  # one mkdirs per partition dir
            fs.mkdirs(Path(f"{root_str}/{rel}").getParent())
            made_dirs.add(rel_dir)
        if stats_by_canon or bloom_by_canon:
            if fi.uri in stats_by_canon:
                add_stats[rel] = stats_by_canon[fi.uri]
            if fi.uri in bloom_by_canon:
                bloom_positions[rel] = bloom_by_canon[fi.uri]
        moves.append((fi.uri, f"{root_str}/{rel}", rel, fi.length))

    # parallel publish: each rename is one blocking driver→JVM round
    # trip; py4j gives every Python thread its own gateway connection
    # and Hadoop FileSystem is thread-safe, so overlapping them turns a
    # large commit's move phase from O(files) sequential latency into
    # O(files / pool). Destinations are token-unique — no two moves
    # conflict.
    def _mv(m) -> None:
        src_uri, dest_uri, rel, _ = m
        if not fs.rename(Path(src_uri), Path(dest_uri)):
            raise IOError(f"_stage_files: rename failed for {rel}")

    if len(moves) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(_mv, moves))
    else:
        for m in moves:
            _mv(m)
    adds: list[tuple[str, int]] = [(rel, ln) for _, _, rel, ln in moves]
    fs.delete(Path(stage_str), True)
    # ONE consolidated bloomset object per commit (r12 VERDICT task 1):
    # the per-file-sidecar format made a point read issue O(files) GETs
    # on an object store (dml_scale.json measured 10,241 sidecar reads
    # for one lookup) — packing a commit's bitsets into one object keyed
    # by rel path makes it O(commits touched), same bytes, and the
    # commit's sidecar phase is one create instead of O(files). Lands
    # under _index/ BEFORE the caller's commit — invisible until the
    # manifest entries reference it (as "<object>#<rel>"); vacuum's
    # grace fence covers the window like any staged artifact. The
    # per-file format stays readable (pre-r13 stores).
    add_blooms: dict[str, str] = {}
    if bloom_positions:
        add_blooms = _write_bloomset(
            fs, Path, root_str, token, bloom_positions, bloom_bits
        )
    return adds, add_stats, staged_dirs, add_blooms


def _write_bloomset(
    fs, Path, root_str: str, token: str,
    bloom_positions: dict[str, dict], bloom_bits: int,
) -> dict[str, str]:
    """Pack per-rel bloom bit positions into ONE
    ``_index/bloomset-<token>.json`` object (``{"m", "k", "files":
    {rel: {col: b64-bitset}}}``) and return the per-rel manifest
    pointers (``<object>#<rel>``)."""
    import base64

    rfs = _raw_fs(fs)
    files: dict[str, dict] = {}
    for rel, by_col in bloom_positions.items():
        cols_b64 = {}
        for c, positions in by_col.items():
            bits = bytearray(bloom_bits >> 3)
            for p in positions:
                bits[p >> 3] |= 1 << (p & 7)
            cols_b64[c] = base64.b64encode(bytes(bits)).decode()
        files[rel] = cols_b64
    obj = f"{_BLOOM_DIR}/bloomset-{token}.json"
    rfs.mkdirs(Path(f"{root_str}/{_BLOOM_DIR}"))
    out = rfs.create(Path(f"{root_str}/{obj}"), True)
    try:
        out.write(bytearray(json.dumps(
            {"m": bloom_bits, "k": _BLOOM_K, "files": files}
        ).encode()))
    finally:
        out.close()
    return {rel: f"{obj}#{rel}" for rel in bloom_positions}


def write_manifested(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    filename_prefix: str = "",
    replace: str | None = None,
    remove_prefixes: list[str] = (),
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 17,
    compact_blooms_every: int | None = None,
) -> list[str]:
    """Append ``df`` to a manifest-committed store: stage the write under
    ``_staging/<token>``, move the part files into their final (partition)
    directories under unique token names, then make them live with ONE
    :func:`manifest_commit`. A crash anywhere before the commit leaves
    only invisible orphans (vacuum reclaims them) — readers never see a
    partial append. Returns the committed relative paths.

    ``replace`` selects the overwrite semantics of the commit:

    - ``None`` (default): pure append.
    - ``"partitions"``: dynamic partition overwrite — every partition
      directory this write STAGED has its pre-existing manifest entries
      dropped in the same commit (Spark's partitionOverwriteMode=dynamic,
      but atomic and composable with concurrent appends to OTHER
      partitions via the CAS rebuild). Unpartitioned writes degrade to
      full replace, exactly like mode=overwrite.
    - ``"all"``: full-store replace in one commit.

    ``filename_prefix`` namespaces this write's files (e.g. a streaming
    sink's ``b<batch_id>-``) so an idempotent replay can drop exactly its
    own earlier attempt via ``remove_prefixes`` — extra prefixes are
    passed through to :func:`manifest_commit` untouched.

    ``stats_cols`` records per-file min/max of the named columns IN THE
    MANIFEST (the Iceberg manifest-stats idea): one extra Spark agg over
    the staged files at write time buys readers predicate-based FILE
    skipping from the head alone — no footer reads, no listing — via
    :func:`read_manifested`'s ``skip``. Order-preserving encoding via
    :func:`_stat_val`; files without stats are never skipped
    (conservative — compaction output currently carries no stats).

    ``bloom_cols`` records a per-file BLOOM FILTER sidecar
    (``_index/<rel>.bloom``, ``bloom_bits`` bits, md5-slice hashing)
    referenced from the manifest entry — the POINT-LOOKUP complement to
    ``stats_cols``: id-like columns hash uniformly across files, so
    min/max spans prune nothing, but a 16 KB bloom test per file finds
    the files that can contain one value without touching data (the
    GDPR-delete shape — see :func:`read_manifested`'s ``point`` and
    :func:`delete_manifested`'s ``point``). Use on string/integer
    columns (the hash is over the canonical string form).

    ``compact_blooms_every=N`` makes the bloom index SELF-MAINTAINING
    under micro-commit churn: after a commit whose version is a multiple
    of N, :func:`compact_bloomsets` runs inline (metadata-only,
    idempotent, conflict-tolerant), so point-read GETs stay bounded by
    live files — not commit count — without an external ``maintain()``
    schedule (the r14 VERDICT's top item: a year of 5-minute batches
    otherwise decays back to O(commits) GETs between maintain() runs).
    The VERSION cadence (not a caller-side counter) survives process
    restarts and stays aligned across concurrent writers. Default
    ``None`` = never (batch writers compact via ``maintain()``); the
    streaming sinks (``stream_append_compacted``, ``relay_manifested``)
    default it ON."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    adds, add_stats, staged_dirs, add_blooms = _stage_files(
        spark, df, fs, Path, root_str, partition_by, filename_prefix,
        stats_cols, bloom_cols, bloom_bits,
    )
    if replace is None:
        drop_pre = list(remove_prefixes)
    elif replace == "partitions":
        drop_pre = sorted(staged_dirs) + list(remove_prefixes)
    elif replace == "all":
        drop_pre = [""]
    else:
        raise ValueError(f"unknown replace mode {replace!r}")
    # our own files must survive their covering prefix: commit drops the
    # prefix set first, then adds — manifest_commit applies add AFTER the
    # removes, so the staged files always land in the new head
    v = manifest_commit(
        spark, path,
        add=[(p, b, add_stats.get(p), add_blooms.get(p)) for p, b in adds],
        remove_prefixes=drop_pre,
        op="append" if replace is None else f"overwrite-{replace}",
        schema=df.schema.jsonValue(),
        # None (not []) when the caller omits partition_by on a plain
        # append/partition-overwrite: the sticky 'parts' record from
        # prior commits must survive a write that doesn't restate the
        # layout (r12 ADVICE: passing [] clobbered it, losing log-typed
        # partition casting on later reads). The explicit [] reset is
        # reserved for replace='all', which actually flattens the store.
        partition_cols=(
            list(partition_by) if partition_by is not None
            else ([] if replace == "all" else None)
        ),
    )
    if (
        compact_blooms_every
        and bloom_cols
        # versions are 0-based: (v+1) = commit count, so this fires on
        # every Nth commit, deterministically across restarts/writers
        and (v + 1) % compact_blooms_every == 0
    ):
        # inline self-maintenance: metadata-only, idempotent (the
        # remainder rule never re-churns), and ManifestConflict inside
        # compact_bloomsets degrades to a no-op report — a concurrent
        # writer can never fail this append
        compact_bloomsets(spark, path)
    return [p for p, _ in adds]


def read_manifested(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prefixes: list[str] | None = None,
    skip: dict | None = None,
    merge_schema: bool = False,
    point: dict | None = None,
) -> DataFrame:
    """Read a manifest-committed store AS OF its newest manifest (or a
    pinned ``version`` — snapshot isolation: a compaction committing
    mid-read swaps the head but never deletes files a retained manifest
    references until :func:`vacuum_manifested`). Hive partition columns
    are recovered via basePath, exactly as a directory-listing read
    would.

    ``prefixes`` prunes the file set MANIFEST-SIDE before Spark ever sees
    it: only files whose relative path starts with one of the prefixes
    (e.g. ``["stream=5/camera=Top/", "cell=3/"]``) enter the scan. At
    100 TB this is the point of the manifest — partition pruning becomes
    an O(head) string filter on the driver instead of a recursive
    directory listing; Catalyst still sees the partition values (from the
    paths, via basePath) for any residual pruning. An empty selection
    raises rather than returning a schemaless scan.

    ``skip`` prunes by PER-FILE COLUMN STATS recorded at write time
    (``write_manifested(stats_cols=...)``): ``{col: (lo, hi)}`` drops
    every file whose recorded [min, max] cannot intersect [lo, hi]
    (either bound may be None for a half-open range). This is parquet
    row-group skipping LIFTED INTO THE MANIFEST — the files are excluded
    before Spark lists, opens, or footer-reads anything. Files without
    stats for a named column are conservatively kept, so ``skip`` is a
    pure optimization: callers must still apply the row-level predicate.
    A fully-skipped selection returns an EMPTY DataFrame with the
    store's schema (unlike prefixes, stats-skip expresses a row
    predicate, and zero matching rows is a valid answer).

    ``merge_schema=True`` reads the UNION schema across files (parquet
    ``mergeSchema``) — required to see a column only some appends carry
    on a schema-evolved store (rows from older files read NULL, the
    Delta/Iceberg add-column semantics). Off by default: it footer-reads
    every selected file at planning time, and an un-evolved store does
    not need it. Maintenance rewrites (:func:`compact_manifested`,
    the streaming fold) always merge — see there.

    ``point`` is BLOOM point-lookup pruning (``{col: value}``): files
    whose ``write_manifested(bloom_cols=...)`` sidecar proves the value
    absent are dropped before the scan — the complement to ``skip`` for
    id-like columns whose min/max spans prune nothing. 16 KB sidecar
    tests instead of data reads; files without a bloom are kept
    (conservative — rewrites currently drop blooms), and a false
    positive only costs a scanned file, so callers still apply the row
    predicate. Composes with ``prefixes``/``skip``."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    doc_schema = doc_parts = None
    if version is None:
        version, head, _ = _manifest_head(spark, fs, Path, root_str)
        if head is None:
            raise FileNotFoundError(f"no manifest under {path}")
        entries = list(head["files"])
        doc_schema = head.get("schema")
        doc_parts = head.get("parts")
    else:
        entries = _resolve_files_at(spark, fs, Path, root_str, version)
        if entries is None:
            raise FileNotFoundError(
                f"manifest v{version} of {path} is missing, corrupt, or "
                f"unresolvable (vacuumed past its checkpoint)"
            )
        d = _manifest_doc(spark, fs, Path, root_str, version)
        doc_schema = (d or {}).get("schema")  # schema AS OF that version
        doc_parts = (d or {}).get("parts")
    if prefixes is not None:
        pre = tuple(prefixes)
        entries = [f for f in entries if f["path"].startswith(pre)]
    if not entries:
        raise ValueError(
            f"manifest v{version} of {path} lists no files"
            + (f" under prefixes {list(prefixes)}" if prefixes is not None
               else " (empty store)")
        )
    kept = entries
    if skip:
        want = {c: (_stat_val(lo), _stat_val(hi)) for c, (lo, hi) in skip.items()}

        def _live(f) -> bool:
            st = f.get("stats") or {}
            for c, (lo, hi) in want.items():
                if c not in st:
                    continue  # no stats recorded — keep (conservative)
                fmin, fmax = st[c]
                if fmin is None or fmax is None:
                    continue  # nulls-only or unknown — keep
                if lo is not None and fmax < lo:
                    return False
                if hi is not None and fmin > hi:
                    return False
            return True

        kept = [f for f in entries if _live(f)]
    if point:
        with_bloom = [
            (e["path"], e["bloom"]) for e in kept if "bloom" in e
        ]
        if with_bloom:
            ok = _bloom_filter_rels(
                spark, fs, Path, root_str, with_bloom, point
            )
            kept = [
                e for e in kept if "bloom" not in e or e["path"] in ok
            ]
    reader = spark.read.option("basePath", root_str)
    # raw-dir partition parsing needs the declared types to cast to
    typed_parts = _declared_part_types(doc_schema, doc_parts)
    if merge_schema:
        if doc_schema is not None:
            # the log records the running-union schema (manifest_commit
            # schema=): give it to the reader directly — the union read
            # costs ZERO planning-time footer I/O instead of one footer
            # per selected file, the term that grows with the store.
            # Version-pinned reads get the schema AS OF that version
            # (time travel applies to the schema too, the table-format
            # rule). Pre-upgrade stores fall back to footer merging.
            # NOT applied to plain reads: a chunk store legitimately
            # holds STREAMS with conflicting same-named column types
            # (pose double vs blob long), and the union schema would
            # fail their slice reads — merge_schema is the caller's
            # assertion that one union schema fits the selection.
            from pyspark.sql.types import StructType as _ST

            reader = reader.schema(_ST.fromJson(doc_schema))
        else:
            reader = reader.option("mergeSchema", "true")
    if not kept:
        # valid empty answer: derive the schema from one real file
        probe = _read_rawpart(
            spark, reader, [f"{root_str}/{entries[0]['path']}"],
            typed_parts,
        )
        return _cast_partition_types(
            probe.where(F.lit(False)), doc_schema, doc_parts
        )
    return _cast_partition_types(
        _read_rawpart(
            spark, reader,
            [f"{root_str}/{f['path']}" for f in kept], typed_parts,
        ),
        doc_schema, doc_parts,
    )


def _declared_part_types(doc_schema, doc_parts) -> dict | None:
    """{partition column: declared simpleString type} from the log, or
    None when either record is missing (pre-upgrade store)."""
    if not doc_parts or not isinstance(doc_schema, dict):
        return None
    from pyspark.sql.types import StructType as _ST

    names = set(doc_parts)
    return {
        f.name: f.dataType.simpleString()
        for f in _ST.fromJson(doc_schema).fields
        if f.name in names
    }


def _read_rawpart(spark, reader, paths: list[str], doc_parts):
    """Two-phase partition-typed scan construction.

    Phase 1 (the fast path, ~every store): Spark's normal partition
    type inference. :func:`_cast_partition_types` then fixes benign
    type drift (inferred long vs declared int) — those casts were
    already r12 behavior.

    Phase 2, ONLY when phase 1 was LOSSY: the scan is rebuilt with an
    EXPLICIT user schema (phase 1's resolved schema, lossy partition
    columns forced to their declared string type). Spark parses raw
    Hive dir values AT the user-specified partition type (SPARK-26188
    semantics — raw string in, not infer-then-cast), so '007' surfaces
    as '007' and partition PRUNING on the string column survives — the
    exact semantics of the CDC source's `_const_column`. Lossy means a
    partition column the log declares STRING inferred as something
    else: '007' inferred long 7 would cast back to '7' (the r12 ADVICE
    finding), and '2024-1-1' inferred date would cast back
    '2024-01-02'-style canonical forms. Detection is a dtype comparison
    on the constructed plan — zero extra I/O; the rebuild re-lists the
    already-warm file index. The per-read user schema replaces the
    r13 session-conf toggle
    (``spark.sql.sources.partitionColumnTypeInference.enabled``): the
    toggle was session-GLOBAL, so a concurrent read planned on another
    thread of the same SparkSession during the window silently parsed
    all ITS partition dirs as strings (the r13 ADVICE finding) — the
    schema is scoped to this one reader, no cross-thread blast radius,
    no lock.

    Phase 2 is deliberately NOT the default: declared-type casts on
    partition columns defeat Catalyst partition PRUNING (a filter on
    ``CAST(vp AS INT)`` prunes nothing), and the always-raw variant of
    this function measurably cost the bucketed rep store's per-batch
    pruned reads ~20% (caught by the r13 streaming A/B). Lossy stores
    keep their string partition columns cast-free (string == string),
    so pruning survives exactly where the raw values matter."""
    df = reader.parquet(*paths)
    if not doc_parts:
        return df
    have = dict(df.dtypes)
    lossy = {
        c for c, dt in doc_parts.items()
        if dt == "string" and have.get(c) not in (None, "string")
    }
    if not lossy:
        return df
    from pyspark.sql.types import StringType, StructField, StructType

    raw_schema = StructType([
        StructField(f.name, StringType(), f.nullable)
        if f.name in lossy else f
        for f in df.schema.fields
    ])
    return reader.schema(raw_schema).parquet(*paths)


def _cast_partition_types(df, doc_schema, doc_parts):
    """Partition columns at their WRITE-TIME types, from the log. On a
    post-upgrade store this is a NO-OP belt: :func:`read_manifested`
    hands the reader the log's declared schema, so partition dir values
    parse at their true types directly — no inference, and no lossy
    infer-then-cast-back ('007' inferred long 7 then cast to '7', the
    r12 ADVICE finding). The cast remains for any residual mismatch and
    costs nothing in the plan; a pre-upgrade store (no recorded parts)
    keeps Spark's inference behavior."""
    if not doc_parts or not isinstance(doc_schema, dict):
        return df
    from pyspark.sql.types import StructType as _ST

    names = set(doc_parts)
    want = {
        f.name: f.dataType
        for f in _ST.fromJson(doc_schema).fields
        if f.name in names
    }
    have = {f.name: f.dataType for f in df.schema.fields}
    for c, dt in want.items():
        if c in have and have[c] != dt:
            df = df.withColumn(c, F.col(c).cast(dt))
    return df


def is_manifested(spark: SparkSession, path: str) -> bool:
    """True when ``path`` is a manifest-committed store (has a
    ``_manifests`` log dir) — the auto-detect used by every engine read
    path so listing-committed and manifest-committed stores share one
    reader API."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    return bool(fs.exists(Path(f"{root_str}/{_MANIFEST_DIR}")))


class ManifestCursorExpired(RuntimeError):
    """An incremental consumer's cursor points below the store's retained
    manifest history (``vacuum_manifested`` reclaimed the versions — or
    the physical files — the changes walk needs). The consumer cannot
    resume exactly-once; reprocess from scratch (``since_version=-1``)
    or size ``vacuum_manifested(keep_versions=...)`` to cover the
    consumer's worst-case lag — the same contract Delta/Iceberg CDC
    places on log retention."""


# parsed-doc cache (r15): the same write-once invariant _STATE_CACHE
# documents above — an acknowledged version file's bytes never change —
# makes (store, version) → parsed doc a pure function. Every
# _manifest_head call was re-reading the head's JSON over py4j (open +
# IOUtils + close, ~6 round trips plus the whole payload — megabytes for
# a checkpoint) even when the resolved state below it was cache-hit; a
# 4-commit write loop paid that dozens of times. A hit is REVALIDATED
# with one getFileStatus against the cached (length, mtime) — ~3 round
# trips and no payload — so an out-of-protocol in-place edit (hand-built
# legacy fixtures, foreign tooling) is still observed; the pure
# invariant only saves the bytes, it never overrides the filesystem.
# Only VALID docs are cached — a None (missing file or mid-write corpse)
# may become readable later and must stay uncached. Consumers never
# mutate doc dicts (the _STATE_CACHE sharing precedent).
_DOC_CACHE: dict = {}
_DOC_CACHE_MAX = 512


def _manifest_doc(spark, fs, Path, root_str: str, version: int):
    """Parse one manifest version (checkpoint or delta); None when
    missing/corrupt (a corpse a lost commit race left — it was never an
    acknowledged head)."""
    key = (root_str, version)
    p = Path(f"{root_str}/{_MANIFEST_DIR}/{version:020d}.json")
    hit = _DOC_CACHE.get(key)
    if hit is not None:
        doc, ln, mt = hit
        try:
            st = fs.getFileStatus(p)
            if st.getLen() == ln and st.getModificationTime() == mt:
                return doc
        except Exception:
            pass  # deleted/unstatable — fall through to the real read
        _DOC_CACHE.pop(key, None)
    try:
        st = fs.getFileStatus(p)
        doc = json.loads(_manifest_read_text(spark, fs, p))
        if not _doc_is_valid(doc):
            return None
    except Exception:
        return None
    if len(_DOC_CACHE) >= _DOC_CACHE_MAX:
        _DOC_CACHE.pop(next(iter(_DOC_CACHE)))
    _DOC_CACHE[key] = (doc, st.getLen(), st.getModificationTime())
    return doc


def manifest_history(spark: SparkSession, path: str) -> list[dict]:
    """The store's commit log, oldest first: one dict per parseable
    manifest version with ``{version, op, data_change, ts, files, bytes,
    added, removed}`` where added/removed are the file-path deltas vs the
    previous parseable version. Pre-r11 manifests (no op metadata) read
    back as ``op="unknown", data_change=True, ts=None``. The walk is
    O(retained versions) driver-side JSON reads — the observability
    surface the reference's SLURM-email loop lacks entirely
    (`detect_fights_all_epochs.py:226-236`)."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    out: list[dict] = []
    prev: set[str] = set()
    state: dict = {}
    for v in _manifest_versions(fs, Path, root_str):
        doc = _manifest_doc(spark, fs, Path, root_str, v)
        if doc is None:
            continue
        state = _apply_doc(state, doc)
        paths = set(state)
        if isinstance(doc.get("add"), list):
            added, removed = len(doc["add"]), len(doc["removed"])
        else:  # pre-delta-log doc: derive from consecutive states
            added, removed = len(paths - prev), len(prev - paths)
        out.append({
            "version": v,
            "op": doc.get("op", "unknown"),
            "data_change": bool(doc.get("dc", True)),
            "ts": doc.get("ts"),
            "checkpoint": "files" in doc,
            "files": len(state),
            "bytes": sum(e["bytes"] for e in state.values()),
            "added": added,
            "removed": removed,
        })
        prev = paths
    return out


def read_manifested_changes(
    spark: SparkSession,
    path: str,
    since_version: int = -1,
    until_version: int | None = None,
    prefixes: list[str] | None = None,
    merge_schema: bool = False,
) -> tuple[DataFrame | None, int]:
    """Incremental (CDC-style) read of a manifest-committed store: the
    rows ADDED by data-change commits in ``(since_version,
    until_version]``, exactly once per logical row across maintenance.
    Returns ``(df_or_None, until_version)`` — None when the range adds
    nothing; commit the returned version as the next cursor.

    This is the consumption path a directory-listing incremental source
    CANNOT provide on a manifest store: Spark's file streaming source
    sees a compaction/fold/OPTIMIZE output as brand-new files and
    re-consumes every row it rewrites (and keeps seeing replaced files
    until vacuum). Here maintenance is invisible by construction:

    - adds from ``data_change=False`` commits (compact/optimize/fold)
      are SKIPPED — they reorganize bytes, not rows;
    - removes by ``data_change=False`` commits do NOT cancel a pending
      candidate — the rows still owe a delivery, and the pre-rewrite
      file stays on disk (vacuum's retained-manifest fence) so it is
      still readable;
    - removes by ``data_change=True`` commits (a partition overwrite, a
      streaming replay's ``b<id>-`` self-replace, a TTL sweep) DO cancel
      pending candidates — the rows were logically replaced/expired, and
      their replacement (if any) is consumed instead.

    At-least-once caveat inherited from upstream replays: a consumer
    that already delivered attempt 1 of a batch before a replay replaced
    it will also deliver attempt 2 (the replacement is a genuine
    data-change add) — the same contract as ``foreachBatch``; dedup
    downstream if the upstream can replay across consumer polls.

    ``since_version=-1`` (a from-scratch consumer) delivers the INITIAL
    SNAPSHOT: the full resolved state at ``until_version``, whole, in
    one poll — then subsequent polls walk the log from there (the Delta
    CDC rule; the snapshot's files are the live set, so a fresh
    consumer never trips on vacuum). A cursor BELOW the retained log
    raises :class:`ManifestCursorExpired`; so does a candidate file
    vacuum already reclaimed.

    ``merge_schema=True`` reads the union schema across the delta's
    files (see :func:`read_manifested`) — use it when consuming across
    a schema-evolving producer.

    ``prefixes`` prunes the delivered files by relative-path prefix, the
    same manifest-side partition pruning as :func:`read_manifested` —
    e.g. ``["stream=5/camera=Top/"]`` watches one register/camera slice
    of the chunk store incrementally. The cursor stays GLOBAL (it is a
    store version, not a per-slice offset), so one consumer per slice
    each keeps its own cursor file and none of them ever scans another
    slice's files.

    Scale: the walk is O(versions in range) driver-side JSON reads plus
    one explicit-paths parquet scan bounded by the CHANGED files — never
    a listing or scan of the whole store."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    versions = [
        v for v in _manifest_versions(fs, Path, root_str)
        if _manifest_doc(spark, fs, Path, root_str, v) is not None
    ]
    if not versions:
        raise FileNotFoundError(f"no manifest under {path}")
    if until_version is None:
        until_version = versions[-1]
    if until_version <= since_version:
        return None, since_version
    # candidates: rel path -> version that added it (insertion-ordered)
    candidates: dict[str, int] = {}
    if since_version >= 0:
        bases = [v for v in versions if v <= since_version]
        base_files = (
            _resolve_files_at(spark, fs, Path, root_str, bases[-1], versions)
            if bases else None
        )
        if base_files is None:
            raise ManifestCursorExpired(
                f"cursor v{since_version} of {path} predates the retained "
                f"manifest history (oldest retained: v{versions[0]}) — "
                f"vacuum reclaimed it; reprocess from since_version=-1 or "
                f"raise vacuum keep_versions"
            )
        state = {f["path"]: f for f in base_files}
        walk = [v for v in versions if since_version < v <= until_version]
    else:
        # a from-scratch consumer's first poll IS the initial snapshot:
        # the resolved state at until_version, delivered whole (Delta's
        # CDC rule) — no history walk, and the files are live by
        # definition (they are the current snapshot)
        files0 = _resolve_files_at(
            spark, fs, Path, root_str, until_version, versions
        )
        if files0 is None:
            raise ManifestCursorExpired(
                f"until_version {until_version} of {path} is missing or "
                f"unresolvable — the log was truncated below a checkpoint"
            )
        state = {f["path"]: f for f in files0}
        candidates.update({p: until_version for p in state})
        walk = []
    for v in walk:
        doc = _manifest_doc(spark, fs, Path, root_str, v)
        if isinstance(doc.get("add"), list):
            adds = [f["path"] for f in doc["add"]]
            removed = list(doc["removed"])
        else:  # pre-delta-log doc: derive the delta from the states
            paths = {f["path"] for f in doc["files"]}
            adds = sorted(paths - set(state))
            removed = sorted(set(state) - paths)
        state = _apply_doc(state, doc)
        if bool(doc.get("dc", True)):
            for p in adds:
                candidates[p] = v
            for p in removed:
                candidates.pop(p, None)  # logically replaced/expired
    if prefixes is not None:
        pre = tuple(prefixes)
        candidates = {p: v for p, v in candidates.items() if p.startswith(pre)}
    if not candidates:
        return None, until_version
    uris = [f"{root_str}/{p}" for p in candidates]
    missing = [u for u in uris if not fs.exists(Path(u))]
    if missing:
        raise ManifestCursorExpired(
            f"{len(missing)} changed file(s) under {path} were vacuumed "
            f"before consumption (e.g. {missing[0]!r}) — the cursor lags "
            f"past the vacuum retention; reprocess from since_version=-1 "
            f"or raise vacuum keep_versions"
        )
    reader = spark.read.option("basePath", root_str)
    d_until = _manifest_doc(spark, fs, Path, root_str, until_version) or {}
    if merge_schema:
        if isinstance(d_until.get("schema"), dict):
            # union schema FROM THE LOG as of until_version — zero
            # planning-time footer I/O, same as read_manifested; the
            # doc's running union covers every file ≤ until_version.
            # Opt-in only (see read_manifested): a heterogeneous chunk
            # store's union schema would fail slice reads.
            from pyspark.sql.types import StructType as _ST

            reader = reader.schema(_ST.fromJson(d_until["schema"]))
        else:
            reader = reader.option("mergeSchema", "true")
    typed_parts = _declared_part_types(
        d_until.get("schema"), d_until.get("parts")
    )
    return (
        _cast_partition_types(
            _read_rawpart(spark, reader, uris, typed_parts),
            d_until.get("schema"), d_until.get("parts"),
        ),
        until_version,
    )


def _infer_partition_cols(entries: list[dict]) -> list[str]:
    """Hive partition columns from a manifest entry's directory path —
    engine-written stores are uniform, so the first entry is
    authoritative. [] on an empty head (a fully-TTL'd store)."""
    if not entries:
        return []
    parts = entries[0]["path"].split("/")[:-1]
    return [p.split("=", 1)[0] for p in parts if "=" in p]


def _entry_stats_cols(entries: list[dict]) -> list[str]:
    """Union of stat columns any entry carries — the store's stats
    discipline, carried forward onto rewrite output."""
    cols: set[str] = set()
    for e in entries:
        cols.update(e.get("stats") or {})
    return sorted(cols)


def _touched_rel_paths(spark, fs, Path, root_str, uris) -> list[str]:
    """input_file_name() URIs → manifest-relative paths (canonical-form
    slice; the two APIs render the same file with different scheme
    spellings). The incoming string is an ENCODED URI — unquote it to
    raw chars before Path() (which treats '%' literally; wrapping the
    encoded form directly would address a different, double-encoded
    file); the canon slice is then already the raw rel name."""
    from urllib.parse import unquote

    rels = []
    for u in uris:
        cu = _canon_uri(fs, Path(unquote(u)))
        rels.append(cu[len(root_str):].strip("/"))
    return rels


def _dml_read(spark, root_str: str, rels: list[str], head: dict,
              merge_schema: bool = True):
    """Candidate/touched-file read for the DML paths: basePath read with
    partition values parsed RAW then cast to their log-declared types
    (the same discipline as read_manifested). Without it, a rewrite of
    a store whose string partition value is all-digit ('007') re-infers
    long and re-stages the dir as region=7 — silently RENAMING the
    partition on disk."""
    reader = spark.read.option("basePath", root_str)
    doc_schema = (head or {}).get("schema")
    doc_parts = (head or {}).get("parts")
    if merge_schema:
        if isinstance(doc_schema, dict):
            # the log records the running-union schema — serve it to the
            # reader directly (the same zero-footer-I/O rule as
            # read_manifested's merge path; r15: the DML reads were still
            # paying one distributed footer-merge job per candidate/touched
            # read, the term that grows with the store). Files from before
            # an add-column read NULL, exactly as mergeSchema unions would.
            from pyspark.sql.types import StructType as _ST

            reader = reader.schema(_ST.fromJson(doc_schema))
        else:
            reader = reader.option("mergeSchema", "true")
    typed = _declared_part_types(doc_schema, doc_parts)
    return _cast_partition_types(
        _read_rawpart(
            spark, reader, [f"{root_str}/{r}" for r in rels], typed
        ),
        doc_schema, doc_parts,
    )


# MERGE broadcasts its update-key relation for the match scan; above
# this many update rows the keys stop being "the small side" and the
# join degrades to a plain shuffle semijoin instead of risking a
# broadcast OOM. At ~40 B/key this caps the broadcast near 100 MB.
_MERGE_BROADCAST_MAX_KEYS = 2_000_000

# Bloom-sidecar pruning probes every distinct update key against each
# candidate file's bloom; above this many update rows the probe set is
# no longer cheap to carry on the planning row and pruning is skipped
# (same 10k bound the key-list collect used before it was fused into
# the planning aggregate).
_BLOOM_PRUNE_MAX_KEYS = 10_000


def merge_manifested(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key: str | list[str],
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    prefixes: list[str] | None = None,
    _before_commit=None,
) -> dict:
    """Copy-on-write MERGE (upsert) into a manifest-committed store — the
    Delta/Iceberg ``MERGE INTO`` for the row-level fixups a training
    corpus needs (relabel documents, patch metadata, backfill scores)
    without rewriting the store: rows in ``updates`` REPLACE store rows
    with the same ``key`` (whole-row update), unmatched update rows are
    INSERTED, and only the files that actually contain a matched key are
    rewritten — everything else is untouched manifest metadata.

    Plan, all bounded by the MATCHED files, never the store:
    (1) candidate files by manifest stats when a single ``key`` column
    has recorded min/max (the updates' key span prunes manifest-side,
    zero I/O); (2) touched files = candidates semi-joined to the
    updates' keys (broadcast — updates are the small side by contract);
    (3) rewrite = touched rows anti-join updates, union ALL updates;
    (4) ONE CAS commit (add rewritten, remove touched,
    ``require_remove_present`` — a concurrent commit replacing a touched
    file raises :class:`ManifestConflict`: re-run the merge against the
    new head, exactly the table-format rule).

    ``updates`` must carry one row per key (duplicate update keys all
    survive — Delta raises instead; here the caller owns dedup) and, on
    a partitioned store, the partition columns. ``partition_by``/
    ``stats_cols`` default to the store's own layout/stats discipline
    (inferred from the head). An update row may MOVE a row across
    partitions (the old copy's file is rewritten without it; the new row
    lands under its new partition dir).

    ``prefixes`` is the partition-pruning escape hatch (the r12
    VERDICT's measured gap: a merge key with no stats/bloom match-scans
    the whole store — 27.4 s over 10,240 files for one hot key whose
    rows all live in one partition): the same manifest-side slice
    contract as :func:`read_manifested` — only files whose relative
    path starts with one of the prefixes (``["p=0/"]``) are MATCH-
    SCANNED or rewritten. The caller thereby ASSERTS no matching key
    lives outside the slice (Delta's partition-predicate-in-MERGE
    convention); rows outside are never examined, so a key that does
    live elsewhere silently keeps its old copy alongside the update.

    CDC interplay: a merge is a data change — its rewritten files are
    re-delivered by :func:`read_manifested_changes` in full (survivor
    rows included; file-level CDC cannot split a file, same behavior as
    Delta CDC without the CDF column — dedup downstream on key).
    Returns {"files_rewritten", "rows_matched", "updates_rows",
    "version", "files_scanned"} — files_scanned is the candidate count
    the match scan actually read (the pruning observability the scale
    measurements track)."""
    keys = [key] if isinstance(key, str) else list(key)
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    entries = list(head["files"])
    if partition_by is None:
        partition_by = _infer_partition_cols(entries)
    if stats_cols is None:
        stats_cols = _entry_stats_cols(entries)
    # LAZY checkpoint + ONE planning aggregate (r15, guide §5.3): the
    # previous shape ran four driver-sequential jobs before the match
    # scan (eager checkpoint, count, key-span agg, distinct-keys
    # collect). The single agg below materializes the checkpoint as a
    # side effect and returns the row count and key span in one job.
    # The distinct-key list for bloom pruning is fetched in a SECOND
    # job, gated on n ≤ _BLOOM_PRUNE_MAX_KEYS (r16, guide §5): the r15
    # fused slice(collect_set(...)) capped the DRIVER transfer but not
    # the aggregation buffer — a single-group collect_set on a 100 TB
    # merge with a high-cardinality key accumulates every distinct key
    # in executor memory. One extra job on small merges is the correct
    # trade; huge merges never build the set at all.
    updates = updates.localCheckpoint(eager=False)
    single_key = keys[0] if len(keys) == 1 else None
    aggs = [F.count(F.lit(1)).alias("__n")]
    if single_key is not None:
        aggs += [
            F.min(single_key).alias("__lo"),
            F.max(single_key).alias("__hi"),
        ]
    plan_row = updates.agg(*aggs).collect()[0]
    n_updates = plan_row["__n"]
    if n_updates == 0:
        return {"files_rewritten": 0, "rows_matched": 0,
                "updates_rows": 0, "version": head_v,
                "files_scanned": 0}
    # manifest-side candidate pruning: caller's partition slice first
    # (an O(head) string filter), then the updates' key span
    candidates = entries
    if prefixes is not None:
        pre = tuple(prefixes)
        candidates = [e for e in candidates if e["path"].startswith(pre)]
    if single_key is not None and any(
        single_key in (e.get("stats") or {}) for e in candidates
    ):
        lo, hi = _stat_val(plan_row["__lo"]), _stat_val(plan_row["__hi"])
        if lo is not None:
            def _may_match(e) -> bool:
                st = (e.get("stats") or {}).get(single_key)
                if not st or st[0] is None or st[1] is None:
                    return True  # no stats — conservative
                return not (st[1] < lo or st[0] > hi)

            candidates = [e for e in candidates if _may_match(e)]
    if single_key is not None and n_updates <= _BLOOM_PRUNE_MAX_KEYS:
        # bloom pruning on the key column (any-match over the update
        # keys) — the id-key merge where stats spans prune nothing.
        # The key list is fetched here, only when it can matter (some
        # candidate carries a bloom) and only under the n ≤ 10k guard,
        # so the collect is bounded by the contract: ≤ n_updates scalar
        # keys off a checkpointed relation.
        with_bloom = [
            (e["path"], e["bloom"]) for e in candidates if "bloom" in e
        ]
        if with_bloom:
            kv = [
                r[0]
                for r in updates.select(single_key).dropDuplicates().collect()
            ]
            ok = _bloom_filter_rels(
                spark, fs, Path, root_str, with_bloom, {single_key: kv}
            )
            candidates = [
                e for e in candidates
                if "bloom" not in e or e["path"] in ok
            ]
    ukeys = updates.select(*keys).dropDuplicates()
    # broadcast the update keys only inside the bounded-updates contract
    # (they are normally the tiny side); above the guard a huge updates
    # relation degrades to a plain shuffle semijoin instead of a
    # broadcast OOM on the driver/executors (r12 VERDICT design note 1)
    if n_updates <= _MERGE_BROADCAST_MAX_KEYS:
        ukeys_join = F.broadcast(ukeys)
    else:
        ukeys_join = ukeys
    touched_rel: list[str] = []
    rows_matched = 0
    if candidates:
        cand = _dml_read(
            spark, root_str, [e["path"] for e in candidates], head,
            merge_schema=False,
        )
        # ONE match-scan job yields the touched-file set AND the per-file
        # matched-row counts (r15: the previous shape re-read the touched
        # files twice more — old.count() and survivors.count() — just to
        # report rows_matched; a matched row only exists in a touched
        # file, so sum(per-file matches) is the same number)
        matched = (
            cand.withColumn("__f", F.input_file_name())
            .join(ukeys_join, on=keys, how="leftsemi")
            .groupBy("__f").count().collect()
        )
        touched_rel = _touched_rel_paths(
            spark, fs, Path, root_str, [r["__f"] for r in matched]
        )
        rows_matched = sum(r["count"] for r in matched)
    if touched_rel:
        old = _dml_read(spark, root_str, touched_rel, head)
        survivors = old.join(ukeys_join, on=keys, how="left_anti")
        new_df = survivors.unionByName(updates, allowMissingColumns=True)
    else:
        # pure insert: no survivors to union with, so partition columns
        # the updates omit must be added explicitly as NULL — the same
        # default-partition landing the union path gives them (without
        # this, staging raises 'partition column not found' whenever an
        # insert-only merge omits the layout columns)
        new_df = updates
        for c in partition_by or []:
            if c not in new_df.columns:
                new_df = new_df.withColumn(c, F.lit(None).cast("string"))
    adds, add_stats, _, _ = _stage_files(
        spark, new_df, fs, Path, root_str, partition_by or None, "",
        stats_cols or None,
    )
    if _before_commit is not None:
        _before_commit()
    v = manifest_commit(
        spark, path,
        add=[(p, b, add_stats.get(p)) for p, b in adds],
        remove=touched_rel,
        require_remove_present=bool(touched_rel),
        op="merge",
        schema=new_df.schema.jsonValue(),
    )
    return {"files_rewritten": len(touched_rel), "rows_matched": rows_matched,
            "updates_rows": n_updates, "version": v,
            "files_scanned": len(candidates)}


def delete_manifested(
    spark: SparkSession,
    path: str,
    predicate: str,
    skip: dict | None = None,
    point: dict | None = None,
    prefixes: list[str] | None = None,
) -> dict:
    """Copy-on-write row-level DELETE from a manifest-committed store:
    rewrite only the files containing a row matching the SQL
    ``predicate``, drop those rows, ONE CAS commit (``op="delete"``,
    rewrite-validated like :func:`merge_manifested`). Rows where the
    predicate evaluates NULL survive (SQL semantics — DELETE removes
    only WHERE-true rows). ``skip`` bounds the candidate scan by
    manifest stats (``{col: (lo, hi)}``, as :func:`read_manifested`) —
    give it whenever the predicate implies a span over a stats column;
    without it the match scan reads every file ONCE (Catalyst still
    prunes row-groups via parquet footers) but only matched files are
    rewritten. Partition layout and stats discipline carry forward from
    the head. The GDPR-style forget op: cost is O(files containing the
    rows), not O(store). ``point`` ({col: value}) bounds the candidates
    by the per-file BLOOM sidecars when the predicate pins an id-like
    value stats cannot span (``delete_manifested(path, "doc_id = 'x'",
    point={"doc_id": "x"})`` — the GDPR shape); the predicate stays
    authoritative. ``prefixes`` bounds BOTH the match scan and the
    rewrite to files under the named partition slices (the same
    contract as :func:`read_manifested` — and :func:`merge_manifested`,
    see there): the caller asserts no WHERE-true row lives outside the
    slice; rows outside are never examined, never deleted. Returns
    {"files_rewritten", "rows_deleted", "version", "files_scanned"}."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    entries = list(head["files"])
    partition_by = _infer_partition_cols(entries)
    stats_cols = _entry_stats_cols(entries)
    candidates = entries
    if prefixes is not None:
        pre = tuple(prefixes)
        candidates = [e for e in candidates if e["path"].startswith(pre)]
    if skip:
        want = {c: (_stat_val(lo), _stat_val(hi)) for c, (lo, hi) in skip.items()}

        def _may(e) -> bool:
            st = e.get("stats") or {}
            for c, (lo, hi) in want.items():
                if c not in st or st[c][0] is None or st[c][1] is None:
                    continue
                if (lo is not None and st[c][1] < lo) or (
                    hi is not None and st[c][0] > hi
                ):
                    return False
            return True

        candidates = [e for e in candidates if _may(e)]
    if point:
        # bloom point pruning — THE GDPR-delete shape: id-like values
        # hash uniformly across files (stats prune nothing), but a 16 KB
        # sidecar test per file bounds the match scan to files that can
        # contain the ids. The predicate stays authoritative; point only
        # bounds the candidates.
        with_bloom = [
            (e["path"], e["bloom"]) for e in candidates if "bloom" in e
        ]
        if with_bloom:
            ok = _bloom_filter_rels(
                spark, fs, Path, root_str, with_bloom, point
            )
            candidates = [
                e for e in candidates
                if "bloom" not in e or e["path"] in ok
            ]
    if not candidates:
        return {"files_rewritten": 0, "rows_deleted": 0, "version": head_v,
                "files_scanned": 0}
    hit = F.coalesce(F.expr(predicate), F.lit(False))
    cand = _dml_read(
        spark, root_str, [e["path"] for e in candidates], head
    )
    # ONE match-scan job yields both the touched-file set AND the per-file
    # hit counts (r15: the previous shape re-read the touched files twice
    # more — old.count() and survivors.count() — just to report
    # rows_deleted; a WHERE-true row only exists in a touched file, so
    # sum(per-file hits) is the same number, for two fewer jobs per op)
    matched = (
        cand.where(hit)
        .groupBy(F.input_file_name().alias("__f"))
        .count()
        .collect()
    )
    touched_uris = [r["__f"] for r in matched]
    if not touched_uris:
        return {"files_rewritten": 0, "rows_deleted": 0, "version": head_v,
                "files_scanned": len(candidates)}
    rows_deleted = sum(r["count"] for r in matched)
    touched_rel = _touched_rel_paths(spark, fs, Path, root_str, touched_uris)
    old = _dml_read(spark, root_str, touched_rel, head)
    survivors = old.where(~hit)
    adds, add_stats, _, _ = _stage_files(
        spark, survivors, fs, Path, root_str, partition_by or None, "",
        stats_cols or None,
    )
    v = manifest_commit(
        spark, path,
        add=[(p, b, add_stats.get(p)) for p, b in adds],
        remove=touched_rel,
        require_remove_present=True,
        op="delete",
        schema=survivors.schema.jsonValue(),
    )
    return {"files_rewritten": len(touched_rel),
            "rows_deleted": rows_deleted, "version": v,
            "files_scanned": len(candidates)}


def update_manifested(
    spark: SparkSession,
    path: str,
    predicate: str,
    set: dict[str, str],
    skip: dict | None = None,
    prefixes: list[str] | None = None,
) -> dict:
    """Copy-on-write row-level UPDATE: in files containing a WHERE-true
    row, rewrite matched rows with each ``set`` column assigned its SQL
    expression (evaluated per row; other rows and files untouched) —
    Delta's ``UPDATE ... SET ... WHERE``. A ``set`` column not yet in
    the store's schema is ADDED (non-matched rows read NULL — the same
    add-column semantics as evolution). Candidate bounding, NULL
    semantics, stats/partition carry-forward, rewrite validation and
    the CDC re-delivery contract are exactly :func:`delete_manifested`'s
    (``prefixes`` included: the match scan and the rewrite are bounded
    to the named partition slices, and the caller asserts no WHERE-true
    row lives outside them). Returns {"files_rewritten", "rows_updated",
    "version", "files_scanned"}."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    entries = list(head["files"])
    partition_by = _infer_partition_cols(entries)
    stats_cols = _entry_stats_cols(entries)
    candidates = entries
    if prefixes is not None:
        pre = tuple(prefixes)
        candidates = [e for e in candidates if e["path"].startswith(pre)]
    if skip:
        want = {c: (_stat_val(lo), _stat_val(hi)) for c, (lo, hi) in skip.items()}

        def _may(e) -> bool:
            st = e.get("stats") or {}
            for c, (lo, hi) in want.items():
                if c not in st or st[c][0] is None or st[c][1] is None:
                    continue
                if (lo is not None and st[c][1] < lo) or (
                    hi is not None and st[c][0] > hi
                ):
                    return False
            return True

        candidates = [e for e in candidates if _may(e)]
    if not candidates:
        return {"files_rewritten": 0, "rows_updated": 0, "version": head_v,
                "files_scanned": 0}
    hit = F.coalesce(F.expr(predicate), F.lit(False))
    cand = _dml_read(
        spark, root_str, [e["path"] for e in candidates], head
    )
    # one job: touched files + per-file hit counts (see delete_manifested)
    matched = (
        cand.where(hit)
        .groupBy(F.input_file_name().alias("__f"))
        .count()
        .collect()
    )
    touched_uris = [r["__f"] for r in matched]
    if not touched_uris:
        return {"files_rewritten": 0, "rows_updated": 0, "version": head_v,
                "files_scanned": len(candidates)}
    rows_updated = sum(r["count"] for r in matched)
    touched_rel = _touched_rel_paths(spark, fs, Path, root_str, touched_uris)
    old = _dml_read(spark, root_str, touched_rel, head)
    # every SET expression (and the predicate) evaluates against the
    # ORIGINAL row — materialize them as temp columns BEFORE any target
    # column changes (sequential withColumn on the targets would let a
    # later SET read an earlier SET's result; Delta evaluates all against
    # the pre-update row)
    new_df = old.withColumn("__hit", hit)
    tmp = {c: f"__set_{i}" for i, c in enumerate(set)}
    for c, expr in set.items():
        new_df = new_df.withColumn(tmp[c], F.expr(expr))
    for c in set:
        keep = F.col(c) if c in old.columns else F.lit(None)
        new_df = new_df.withColumn(
            c, F.when(F.col("__hit"), F.col(tmp[c])).otherwise(keep)
        )
    new_df = new_df.drop("__hit", *tmp.values())
    adds, add_stats, _, _ = _stage_files(
        spark, new_df, fs, Path, root_str, partition_by or None, "",
        stats_cols or None,
    )
    v = manifest_commit(
        spark, path,
        add=[(p, b, add_stats.get(p)) for p, b in adds],
        remove=touched_rel,
        require_remove_present=True,
        op="update",
        schema=new_df.schema.jsonValue(),
    )
    return {"files_rewritten": len(touched_rel),
            "rows_updated": rows_updated, "version": v,
            "files_scanned": len(candidates)}


def reindex_manifested(
    spark: SparkSession,
    path: str,
    bloom_cols: list[str],
    bloom_bits: int = 1 << 17,
) -> dict:
    """Recompute bloom sidecars for head files that LACK them for the
    given columns (maintenance rewrites — compaction/OPTIMIZE/fold/DML
    output — drop blooms), restoring point-lookup coverage with ONE
    metadata-only commit: the scan is bounded by the UN-bloomed files,
    no data file is rewritten, and the commit is ``data_change=False``
    (rows unchanged — CDC consumers see nothing). Run it after
    ``maintain()`` on point-lookup stores. Returns {"reindexed",
    "version"}."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    todo = [
        e for e in head["files"]
        if "bloom" not in e  # present sidecars keep their column set
    ]
    if not todo:
        return {"reindexed": 0, "version": head_v}
    by_rel = {e["path"]: e for e in todo}
    pos_by_file: dict[str, dict] = {}
    aggs = [
        F.array_distinct(
            F.flatten(
                F.collect_list(F.array(*_bloom_position_exprs(c, bloom_bits)))
            )
        ).alias(f"__bp_{c}")
        for c in bloom_cols
    ]
    for row in (
        spark.read.parquet(*[f"{root_str}/{r}" for r in by_rel])
        .groupBy(F.input_file_name().alias("__f"))
        .agg(*aggs)
        .collect()
    ):
        pos_by_file[row["__f"]] = {c: row[f"__bp_{c}"] for c in bloom_cols}
    # canon the agg keys with zero py4j calls (same _canon_uri_str +
    # JVM-fallback discipline as _stage_files): rel targets are
    # f"{root_str}/{rel}" which is ALREADY the canonical rendering, so
    # only the input_file_name keys need decoding
    pos_by_canon = {_canon_uri_str(k): v for k, v in pos_by_file.items()}
    targets = {f"{root_str}/{rel}": rel for rel in by_rel}
    if not (set(pos_by_canon) <= set(targets)):
        pos_by_canon = {
            _canon_uri(fs, Path(k)): v for k, v in pos_by_file.items()
        }
    positions: dict[str, dict] = {}
    for uri, rel in targets.items():
        by_col = pos_by_canon.get(uri)
        if by_col is not None:  # None: matched no scanned rows (empty)
            positions[rel] = by_col
    if not positions:
        return {"reindexed": 0, "version": head_v}
    # ONE consolidated bloomset for every straggler (same format as the
    # write path): reindex after maintenance compacts per-file sidecar
    # debt into one object, so point reads stay O(commits) GETs
    import uuid

    pointers = _write_bloomset(
        fs, Path, root_str, uuid.uuid4().hex, positions, bloom_bits
    )
    add = [
        (rel, by_rel[rel]["bytes"], by_rel[rel].get("stats"), ptr)
        for rel, ptr in pointers.items()
    ]
    try:
        v = manifest_commit(
            spark, path, add=add, remove=[rel for rel, *_ in add],
            require_remove_present=True, op="reindex", data_change=False,
        )
    except ManifestConflict:
        # a concurrent commit replaced a reindexed file — its sidecar is
        # an orphan for vacuum; the next reindex covers the new head
        return {"reindexed": 0, "version": head_v, "conflict": True}
    return {"reindexed": len(add), "version": v}


def consolidate_bloom_sidecars(spark: SparkSession, path: str) -> dict:
    """Migrate LEGACY per-file bloom sidecars (``_index/<rel>.bloom``,
    one tiny object each — pre-r13 stores) into consolidated bloomset
    objects, re-pointing the manifest entries in ONE ``data_change=
    False`` commit: afterwards a point read issues O(bloomset objects)
    GETs instead of O(files), the same contract new writes get. Zero
    data I/O — the bitsets are read from the old sidecars, never
    recomputed; the old sidecars become vacuum orphans. One object per
    distinct bloom size ``m`` (a store reindexed with different
    ``bloom_bits`` over its life migrates into one object per size).
    Idempotent; safe to run any time (``maintain()`` runs it after
    reindex). A missing/corrupt legacy sidecar is SKIPPED (its manifest
    pointer left untouched, counted in ``skipped``) rather than aborting
    the migration — the read path treats the same corruption as a
    conservative keep, so maintenance must not be stricter than reads
    (r13 ADVICE finding). Returns {"consolidated", "objects",
    "skipped", "version"}."""
    import uuid

    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    legacy = [
        e for e in head["files"]
        if "bloom" in e and "#" not in e["bloom"]
    ]
    if not legacy:
        return {"consolidated": 0, "objects": 0, "skipped": 0,
                "version": head_v}
    local_root = None
    if root_str.startswith("file:") and not root_str.startswith("file://"):
        local_root = root_str[len("file:"):]

    def _read(e) -> dict | None:
        # per-entry tolerance: an unreadable or malformed sidecar is
        # skipped (pointer left as-is), never a migration abort
        try:
            if local_root is not None:
                with open(os.path.join(local_root, e["bloom"])) as f:
                    doc = json.load(f)
            else:
                doc = json.loads(_manifest_read_text(
                    spark, fs, Path(f"{root_str}/{e['bloom']}")
                ))
        except Exception:
            return None
        if (
            not isinstance(doc, dict)
            or not isinstance(doc.get("m"), int)
            or not isinstance(doc.get("cols"), dict)
        ):
            return None
        return doc

    if len(legacy) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            docs = list(pool.map(_read, legacy))
    else:
        docs = [_read(e) for e in legacy]
    skipped = sum(1 for d in docs if d is None)
    by_m: dict[int, dict[str, dict]] = {}
    k_by_m: dict[int, int] = {}
    for e, doc in zip(legacy, docs):
        if doc is None:
            continue
        by_m.setdefault(doc["m"], {})[e["path"]] = doc["cols"]
        k_by_m[doc["m"]] = doc.get("k", _BLOOM_K)
    if not by_m:
        return {"consolidated": 0, "objects": 0, "skipped": skipped,
                "version": head_v}
    rfs = _raw_fs(fs)
    rfs.mkdirs(Path(f"{root_str}/{_BLOOM_DIR}"))
    by_rel = {e["path"]: e for e in legacy}
    add: list[tuple] = []
    for m, files in by_m.items():
        obj = f"{_BLOOM_DIR}/bloomset-{uuid.uuid4().hex}.json"
        out = rfs.create(Path(f"{root_str}/{obj}"), True)
        try:
            out.write(bytearray(json.dumps(
                {"m": m, "k": k_by_m[m], "files": files}
            ).encode()))
        finally:
            out.close()
        for rel in files:
            e = by_rel[rel]
            add.append((rel, e["bytes"], e.get("stats"), f"{obj}#{rel}"))
    try:
        v = manifest_commit(
            spark, path, add=add, remove=[rel for rel, *_ in add],
            require_remove_present=True, op="reindex", data_change=False,
        )
    except ManifestConflict:
        # a concurrent commit replaced a migrated file — its new object
        # is an orphan for vacuum; the next pass covers the new head
        return {"consolidated": 0, "objects": 0, "skipped": skipped,
                "version": head_v, "conflict": True}
    return {"consolidated": len(add), "objects": len(by_m),
            "skipped": skipped, "version": v}


def compact_bloomsets(
    spark: SparkSession,
    path: str,
    target_members: int = 512,
) -> dict:
    """Merge SMALL consolidated bloomset objects ACROSS commits into
    count-capped packed objects, re-pointing the manifest in ONE
    ``data_change=False`` commit. The write path emits one bloomset per
    commit (the right shape for bulk loads), so a streaming-ingest
    store committing every micro-batch accumulates one tiny object per
    commit and a point read decays back to O(commits) GETs — ~100k
    objects for a year of 5-minute batches (the r13 VERDICT's top
    item). After compaction a point read is O(live files /
    ``target_members``) GETs regardless of commit history.

    ``target_members`` caps rels per packed object: the cap bounds the
    BYTES one point-read GET fetches (each member bitset is ~m/8 B ≈
    16 KiB b64 at the default m=2^17, so 512 members ≈ 10 MiB/object —
    one s3 GET, not a hot-spot). Only objects whose LIVE member count
    is below the cap are repacked (a full object is already optimal);
    repacking also drops DEAD members (rels no longer at head) that
    DML rewrites stranded inside old objects. Objects are grouped by
    ``(m, k)`` — bitsets of different geometries never share an object.
    Unreadable/malformed objects are skipped (their entries keep their
    pointers; reads already degrade those to conservative keep).
    Metadata-only, zero data-file I/O, CDC-invisible, idempotent
    (a second run finds nothing mergeable); the replaced objects become
    vacuum orphans. ``maintain()`` runs it after reindex. Returns
    {"repacked_rels", "objects_before", "objects_after", "skipped",
    "skipped_objects", "version"} — ``skipped`` counts RELS left on
    their old pointer (every member of an unreadable object, plus
    members absent from a readable one); ``skipped_objects`` counts
    whole objects that failed to read (r14 ADVICE: the two units were
    previously mixed in one counter).

    Scale analog: the reference bounds its per-chunk file lookups by
    filename convention (combine_pose_id_automated.py:31-43); at 100 TB
    the equivalent bound is "point-read index GETs independent of
    commit count", which this pass restores after micro-commit churn."""
    import uuid

    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    by_obj: dict[str, list] = {}  # object -> [(rel, member, entry)]
    for e in head["files"]:
        ptr = e.get("bloom")
        if ptr and "#" in ptr:
            obj, _, member = ptr.partition("#")
            by_obj.setdefault(obj, []).append((e["path"], member, e))
    small = {o: ms for o, ms in by_obj.items() if len(ms) < target_members}
    if len(small) < 2:
        return {"repacked_rels": 0, "objects_before": len(by_obj),
                "objects_after": len(by_obj), "skipped": 0,
                "skipped_objects": 0, "version": head_v}
    local_root = None
    if root_str.startswith("file:") and not root_str.startswith("file://"):
        local_root = root_str[len("file:"):]

    def _read_obj(obj: str) -> dict | None:
        try:
            if local_root is not None:
                with open(os.path.join(local_root, obj)) as f:
                    doc = json.load(f)
            else:
                doc = json.loads(_manifest_read_text(
                    spark, fs, Path(f"{root_str}/{obj}")
                ))
        except Exception:
            return None
        if (
            not isinstance(doc, dict)
            or not isinstance(doc.get("m"), int)
            or not isinstance(doc.get("files"), dict)
        ):
            return None
        return doc

    objs = sorted(small)
    if len(objs) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            docs = dict(zip(objs, pool.map(_read_obj, objs)))
    else:
        docs = {o: _read_obj(o) for o in objs}
    # (m, k) -> [(rel, cols_b64, entry)] — LIVE members only, in a
    # deterministic order so repeated runs pack identically
    groups: dict[tuple, list] = {}
    skipped = 0  # RELS kept on their old pointer
    skipped_objects = 0  # whole objects that failed to read
    for obj in objs:
        doc = docs[obj]
        if doc is None:
            skipped_objects += 1
            skipped += len(by_obj[obj])  # every member keeps its ptr
            continue
        per_file = doc["files"]
        for rel, member, e in sorted(by_obj[obj]):
            cols = per_file.get(member)
            if not isinstance(cols, dict):
                skipped += 1  # member absent from its object — keep ptr
                continue
            groups.setdefault(
                (doc["m"], doc.get("k", _BLOOM_K)), []
            ).append((rel, cols, e, obj))
    rfs = _raw_fs(fs)
    add: list[tuple] = []
    for (m, k), members in sorted(groups.items()):
        n_chunks = -(-len(members) // target_members)
        if n_chunks >= len({src for *_, src in members}):
            # no GET reduction for this geometry (e.g. a second run
            # finding only last round's remainder object) — repacking
            # would churn bytes and manifest entries for nothing
            continue
        for i in range(0, len(members), target_members):
            chunk = members[i:i + target_members]
            obj = f"{_BLOOM_DIR}/bloomset-{uuid.uuid4().hex}.json"
            out = rfs.create(Path(f"{root_str}/{obj}"), True)
            try:
                out.write(bytearray(json.dumps({
                    "m": m, "k": k,
                    "files": {rel: cols for rel, cols, *_ in chunk},
                }).encode()))
            finally:
                out.close()
            for rel, _, e, _src in chunk:
                add.append((rel, e["bytes"], e.get("stats"), f"{obj}#{rel}"))
    if not add:
        return {"repacked_rels": 0, "objects_before": len(by_obj),
                "objects_after": len(by_obj), "skipped": skipped,
                "skipped_objects": skipped_objects, "version": head_v}
    # distinct objects the head references AFTER the re-point: old
    # pointers overlaid with the repacked ones (skipped members keep
    # their old object alive, so count from the final pointer map)
    final_ptr = {
        rel: obj for obj, ms in by_obj.items() for rel, _, _ in ms
    }
    for rel, *_, ptr in add:
        final_ptr[rel] = ptr.partition("#")[0]
    objects_after = len(set(final_ptr.values()))
    try:
        v = manifest_commit(
            spark, path, add=add, remove=[rel for rel, *_ in add],
            require_remove_present=True, op="reindex", data_change=False,
        )
    except ManifestConflict:
        # a concurrent commit replaced a repacked file — the new objects
        # are orphans for vacuum; the next maintain() covers the new head
        return {"repacked_rels": 0, "objects_before": len(by_obj),
                "objects_after": len(by_obj), "skipped": skipped,
                "skipped_objects": skipped_objects,
                "version": head_v, "conflict": True}
    return {
        "repacked_rels": len(add),
        "objects_before": len(by_obj),
        "objects_after": objects_after,
        "skipped": skipped,
        "skipped_objects": skipped_objects,
        "version": v,
    }


def restore_manifested(
    spark: SparkSession,
    path: str,
    version: int,
) -> dict:
    """Roll the store back to snapshot ``version`` — ONE metadata-only
    commit whose file set is the target manifest's (Delta ``RESTORE``):
    zero data I/O, atomic, composable (a concurrent append between the
    build and the CAS is replaced — restore is full-state by definition,
    last-writer-wins). The bad-commit undo: a botched merge/delete/
    overwrite is reverted in O(head) driver work as long as vacuum has
    not reclaimed the target's files — every target file is existence-
    checked first and :class:`ManifestCursorExpired` names the failure
    (size ``keep_versions`` to the rollback window you want, the same
    knob as consumer lag). CDC interplay: a restore is a data change —
    rows it brings back are re-delivered, rows it un-commits cancel.
    Returns {"version", "restored_from", "files"}."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    files = _resolve_files_at(spark, fs, Path, root_str, version)
    if files is None:
        raise ManifestCursorExpired(
            f"manifest v{version} of {path} is missing, corrupt, or "
            f"unresolvable — vacuum may have reclaimed it (retained: "
            f"{_manifest_versions(fs, Path, root_str)[:3]}...)"
        )
    missing = [
        f["path"] for f in files
        if not fs.exists(Path(f"{root_str}/{f['path']}"))
    ]
    if missing:
        raise ManifestCursorExpired(
            f"cannot restore {path} to v{version}: {len(missing)} of its "
            f"files were vacuumed (e.g. {missing[0]!r})"
        )
    # time travel applies to the SCHEMA too (the table-format rule):
    # restore records the restored version's schema doc verbatim —
    # manifest_commit's op="restore" branch skips the running union, so
    # columns added after `version` do not survive the rollback as
    # all-null resurrections. Pre-upgrade targets lack the doc (union
    # fallback keeps the head schema — conservative).
    tgt_doc = _manifest_doc(spark, fs, Path, root_str, version) or {}
    v = manifest_commit(
        spark, path,
        add=[(f["path"], f["bytes"], f.get("stats")) for f in files],
        remove_prefixes=[""],
        op="restore",
        schema=tgt_doc.get("schema"),
        partition_cols=tgt_doc.get("parts"),
    )
    return {"version": v, "restored_from": version, "files": len(files)}


def compact_manifested(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
    max_concurrent_leaf_rewrites: int = 4,
    _before_commit=None,
    _plan_fn=None,
    _op: str = "compact",
) -> dict:
    """:func:`compact_parquet` for a manifest-committed store — and the
    reason the manifest exists: the rewrite stages NEW files next to the
    old ones and swaps them in with ONE CAS commit, so

    - a concurrent :func:`write_manifested` composes instead of being
      skipped: if it wins the version race, the compactor's retry
      rebuilds on the writer's head (its files survive untouched — they
      are not in the compactor's remove-set); zero loss, zero
      ``skipped_concurrent``, no single-writer contract;
    - readers keep snapshot isolation: pre-swap manifests still resolve
      to the old files, which stay on disk until
      :func:`vacuum_manifested`.

    ``_before_commit`` is a test seam (fires between staging and commit —
    the window every interleaving bug lives in).
    Returns {files_before, files_after, bytes, compacted, version}."""
    import math
    import uuid

    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        return {
            "files_before": 0, "files_after": 0, "bytes": 0,
            "compacted": False, "version": head_v,
        }
    files = [(f["path"], f["bytes"]) for f in head["files"]]
    by_leaf: dict[str, list[dict]] = {}
    for f in head["files"]:
        leaf = f["path"].rsplit("/", 1)[0] if "/" in f["path"] else ""
        by_leaf.setdefault(leaf, []).append(f)
    adds: list[tuple] = []
    removes: list[str] = []
    work = [
        (leaf, members)
        for leaf, members in sorted(by_leaf.items())
        if len(members) >= min_files_to_compact
    ]

    def _rewrite_leaf(item: tuple) -> tuple:
        leaf, members = item
        leaf_bytes = sum(m["bytes"] for m in members)
        n_out = max(1, math.ceil(leaf_bytes / target_bytes))
        # carry stats forward WITHOUT a scan: when every member has stats
        # for a column, the leaf's [min of mins, max of maxes] is a SOUND
        # (leaf-granular) bound for every output file — min/max bounds
        # need not be tight, only never-exclude; columns any member lacks
        # are dropped (those rows' span is unknown)
        leaf_stats: dict = {}
        cols = set.intersection(
            *[set((m.get("stats") or {})) for m in members]
        ) if members else set()
        for c in cols:
            los = [m["stats"][c][0] for m in members]
            his = [m["stats"][c][1] for m in members]
            if None not in los and None not in his:
                leaf_stats[c] = [min(los), max(his)]
        token = uuid.uuid4().hex
        stage_str = f"{root_str}/_staging/{token}"
        # plain read of the member FILES (no basePath): partition values
        # stay in the directory name, never absorbed into data files.
        # mergeSchema ALWAYS: without it a mixed-schema leaf (a column
        # added by a later append) is rewritten with ONE file's schema —
        # the evolved column's data would be silently dropped. The cost
        # is footer reads bounded by the leaf being rewritten anyway.
        leaf_df = spark.read.option("mergeSchema", "true").parquet(
            *[f"{root_str}/{m['path']}" for m in members]
        )
        planned = (
            _plan_fn(leaf_df, n_out) if _plan_fn is not None
            else leaf_df.repartition(n_out)
        )
        planned.write.mode("overwrite").parquet(stage_str)
        leaf_adds: list[tuple] = []
        for i, fi in enumerate(_list_data_files(fs, Path(stage_str))):
            name = f"data-{token}-{i:05d}.parquet"
            rel = f"{leaf}/{name}" if leaf else name
            dest = Path(f"{root_str}/{rel}")
            fs.mkdirs(dest.getParent())
            if not fs.rename(Path(fi.uri), dest):
                raise IOError(f"compact_manifested: rename failed for {rel}")
            leaf_adds.append((rel, fi.length, leaf_stats or None))
        fs.delete(Path(stage_str), True)
        return leaf, leaf_adds, [m["path"] for m in members]

    # Leaf rewrites are mutually independent (each stages under its own
    # uuid dir and touches only its own members) and the swap is ONE CAS
    # commit at the end, so they overlap on a small driver thread pool
    # (guide §2.6: a store with thousands of partitions otherwise pays a
    # driver-SERIAL chain of read→repartition→write jobs — the tail of
    # each leaf's job leaves the cluster idle while the driver plans the
    # next). 2-4 in flight fills the tail without thrashing; results are
    # folded in sorted-leaf order so the manifest's adds/removes lists
    # stay byte-deterministic. A failed leaf propagates after the pool
    # drains; sibling leaves still mid-rewrite leave _staging/ orphans,
    # while a sibling whose _rewrite_leaf COMPLETED before the failure
    # has already renamed its token-named outputs into the live leaf
    # dirs — uncommitted either way, so invisible to manifest readers,
    # and vacuum_manifested reclaims both (the no-manifest fence /
    # orphan grace) — the same states as a crash mid-rewrite on the
    # serial path.
    pool_n = max(1, min(int(max_concurrent_leaf_rewrites), len(work)))
    if work and pool_n > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(
            max_workers=pool_n, thread_name_prefix="compact-leaf"
        ) as pool:
            results = list(pool.map(inheritable_thread_target(_rewrite_leaf), work))
    else:
        results = [_rewrite_leaf(w) for w in work]
    for _leaf, leaf_adds, leaf_removes in sorted(results, key=lambda t: t[0]):
        adds.extend(leaf_adds)
        removes.extend(leaf_removes)
    if not removes:
        return {
            "files_before": len(files), "files_after": len(files),
            "bytes": sum(b for _, b in files), "compacted": False,
            "version": head_v,
        }
    if _before_commit is not None:
        _before_commit()
    try:
        # rewrite validation: if a concurrent commit replaced any source
        # file (e.g. a chunk overwrite landed mid-compaction), committing
        # the fold would resurrect the replaced rows — abort instead; the
        # staged files stay invisible orphans for vacuum, and the next
        # maintenance pass compacts the new head
        v = manifest_commit(
            spark, path, add=adds, remove=removes,
            require_remove_present=True,
            op=_op, data_change=False,
        )
    except ManifestConflict:
        return {
            "files_before": len(files), "files_after": len(files),
            "bytes": sum(b for _, b in files), "compacted": False,
            "version": head_v, "conflict": True,
        }
    _, new_head, _ = _manifest_head(spark, fs, Path, root_str)
    return {
        "files_before": len(files),
        "files_after": len(new_head["files"]),
        "bytes": sum(b for _, b in files),
        "compacted": True,
        "version": v,
    }


def vacuum_manifested(
    spark: SparkSession,
    path: str,
    keep_versions: int = 2,
    orphan_grace_seconds: float = 1800.0,
) -> dict:
    """Reclaim files no retained manifest references: keeps the newest
    ``keep_versions`` manifests' file sets live (the snapshot-isolation
    grace window for readers pinned to a recent version), deletes every
    other data file (and its bloom sidecar), older manifest versions,
    and _staging leftovers. Log retention anchors at the newest
    CHECKPOINT at/below the oldest kept version (kept versions must stay
    resolvable under the delta log), so the log holds at most
    ``keep_versions + _CHECKPOINT_INTERVAL`` files after a vacuum —
    ``keep_versions`` is also the CDC consumers' maximum safe lag and
    :func:`restore_manifested`'s rollback window.

    IN-FLIGHT-WRITER FENCE (the Delta/Iceberg convention, r11): a file
    that is (a) referenced by NO manifest version at all — so it was
    never committed, i.e. it may belong to a writer that has renamed
    files in but not yet won its commit — and (b) younger than
    ``orphan_grace_seconds`` by filesystem mtime, is SKIPPED; so are
    ``_staging/<token>`` dirs younger than the grace. Files an existing
    manifest once committed and a later commit replaced carry no such
    ambiguity (no writer still owns them) and are reclaimed regardless of
    age. A routine vacuum therefore cannot eat a slow writer's files as
    long as the writer's stage→rename→commit span stays under the grace
    window; truly-orphaned crash debris is reclaimed by any vacuum run
    after the grace expires. Set ``orphan_grace_seconds=0`` only when the
    caller externally guarantees no in-flight writer."""
    import time

    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    versions = _manifest_versions(fs, Path, root_str)
    if not versions:
        return {"deleted_files": 0, "deleted_manifests": 0, "skipped_in_flight": 0}
    keep = set(versions[-keep_versions:])
    # one forward replay of the retained log: the union of every state is
    # every path ever committed; the states AT the kept versions are the
    # live set pinned readers may still resolve
    live: set[str] = set()
    live_blooms: set[str] = set()  # sidecar OBJECTS kept entries reference
    ever_committed: set[str] = set()
    checkpoints: list[int] = []
    state: dict = {}
    for v in versions:
        doc = _manifest_doc(spark, fs, Path, root_str, v)
        if doc is None:
            continue
        if "files" in doc:
            checkpoints.append(v)
        state = _apply_doc(state, doc)
        ever_committed.update(state)
        if v in keep:
            live.update(state)
            for e in state.values():
                b = e.get("bloom")
                if b:
                    # consolidated pointers are "<object>#<rel>"; legacy
                    # per-file pointers are the object path itself
                    live_blooms.add(b.partition("#")[0])
    cutoff_ms = (time.time() - orphan_grace_seconds) * 1000.0
    skipped_in_flight = 0
    doomed: list[tuple] = []
    for fi in _list_data_files(fs, root):
        rel = fi.uri[len(root_str):].strip("/")
        if rel.startswith((f"{_MANIFEST_DIR}/", "_staging/")):
            continue
        if rel in live:
            continue
        if rel not in ever_committed and fi.mtime > cutoff_ms:
            skipped_in_flight += 1  # possibly an uncommitted in-flight write
            continue
        doomed.append((fi.uri, rel))

    # parallel reclaim (same pool discipline as _stage_files' publish):
    # two blocking JVM deletes per dead file — data + its bloom sidecar
    # — serialize a big vacuum otherwise; targets are distinct files, so
    # deletes never conflict
    def _reclaim(item) -> None:
        uri, rel = item
        fs.delete(Path(uri), False)
        # a data file's bloom sidecar dies with it
        fs.delete(Path(f"{root_str}/{_BLOOM_DIR}/{rel}.bloom"), False)

    if len(doomed) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(_reclaim, doomed))
    else:
        for it in doomed:
            _reclaim(it)
    deleted_files = len(doomed)
    # log retention anchors at the newest CHECKPOINT at/below the oldest
    # kept version: the kept versions' states must stay resolvable, so
    # the anchor checkpoint and every delta above it survive (bounded by
    # the checkpoint interval — the log never re-grows past
    # keep_versions + _CHECKPOINT_INTERVAL files)
    min_keep = min(keep)
    anchor = max((c for c in checkpoints if c <= min_keep), default=min_keep)
    deleted_manifests = 0
    for v in versions:
        if v < anchor:
            fs.delete(
                Path(f"{root_str}/{_MANIFEST_DIR}/{v:020d}.json"), False
            )
            deleted_manifests += 1
    staging = Path(f"{root_str}/_staging")
    if fs.exists(staging):
        for st in fs.listStatus(staging):
            if st.getModificationTime() > cutoff_ms:
                skipped_in_flight += 1  # a writer still staging
                continue
            fs.delete(st.getPath(), True)
    # a committer that died between its tmp doc write and the link/rename
    # leaves .tmp-<token>.json debris in _manifests — never a version, so
    # sweep it under the same grace fence (young tmp = a commit in flight)
    mdir = Path(f"{root_str}/{_MANIFEST_DIR}")
    if fs.exists(mdir):
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if not name.startswith(".tmp-"):
                continue
            if st.getModificationTime() > cutoff_ms:
                skipped_in_flight += 1
                continue
            fs.delete(st.getPath(), False)
    # orphaned bloom sidecars — consolidated bloomset objects and legacy
    # per-file sidecars no retained manifest entry references (their
    # data files vacuumed, or never committed) — same grace fence as
    # staging: a writer lands its sidecar just before its commit
    index_dir = Path(f"{root_str}/{_BLOOM_DIR}")
    if fs.exists(index_dir):
        it = fs.listFiles(index_dir, True)
        while it.hasNext():
            st = it.next()
            rel = _canon_uri(fs, st.getPath())[len(root_str):].strip("/")
            if rel in live_blooms:
                continue
            if st.getModificationTime() > cutoff_ms:
                skipped_in_flight += 1
                continue
            fs.delete(st.getPath(), False)
    return {
        "deleted_files": deleted_files,
        "deleted_manifests": deleted_manifests,
        "skipped_in_flight": skipped_in_flight,
    }


def optimize_manifested(
    spark: SparkSession,
    path: str,
    cols: list[str],
    curve: str = "hilbert",
    bits: int = 16,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """:func:`optimize_parquet` for a manifest-committed store — the
    OPTIMIZE-ZORDER rewrite (cluster every leaf's files along the
    space-filling curve of ``cols``) with the manifest's commit
    semantics instead of directory renames: readers keep snapshot
    isolation through the swap, a concurrent append composes via the
    CAS retry, and old files survive for pinned readers until
    :func:`vacuum_manifested`. Every leaf rewrites regardless of file
    count (the point is the layout, not the count)."""
    from ..operators.layout import hilbert_layout, zorder_layout

    if curve == "hilbert":
        plan = lambda df, n: hilbert_layout(df, cols, bits, num_partitions=n)
    elif curve == "zorder":
        plan = lambda df, n: zorder_layout(df, cols, bits, num_partitions=n)
    else:
        raise ValueError(f"unknown curve {curve!r}")
    return compact_manifested(
        spark, path, target_bytes=target_bytes,
        min_files_to_compact=1, _plan_fn=plan, _op="optimize",
    )


def retention_sweep_manifested(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """:func:`retention_sweep` for a manifest-committed store — TTL-expire
    every ``partition_col=<value>`` whose value sorts below ``keep_from``
    with ONE metadata-only commit (``remove_prefixes``): zero data I/O,
    atomic (a reader never sees a chunk half-expired), snapshot-isolated
    (pinned readers keep resolving the expired files until
    :func:`vacuum_manifested` reclaims them), and composable — a writer
    appending a LIVE chunk concurrently is untouched by the prefix drop,
    while a straggler writing into an EXPIRED chunk loses to the sweep's
    commit or re-adds past it (at which point the next sweep expires it
    again — TTL converges). The partition may sit at ANY depth of the
    Hive path (the chunk store's is stream=/camera=/chunk=). Values must
    sort lexicographically (ISO timestamps, zero-padded ids), the same
    contract as the listing form. Returns the expired partition values."""
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    _, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"no manifest under {path}")
    pre = f"{partition_col}="
    values: set[str] = set()
    prefixes: set[str] = set()  # full path prefixes — the same chunk value
    for f in head["files"]:     # can recur under many stream/camera dirs
        parts = f["path"].split("/")[:-1]
        for i, p in enumerate(parts):
            if p.startswith(pre) and p[len(pre):] < keep_from:
                values.add(p[len(pre):])
                prefixes.add("/".join(parts[: i + 1]) + "/")
    if not values:
        return []
    manifest_commit(
        spark, path, remove_prefixes=sorted(prefixes), op="ttl",
    )
    return sorted(values)


def maintain(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
    optimize_cols: list[str] | None = None,
    curve: str = "hilbert",
    keep_versions: int = 2,
    orphan_grace_seconds: float = 1800.0,
    max_age: "pd.Timedelta | str | None" = None,
    time_col: str = "time",
    ttl_partition_col: str | None = None,
    ttl_keep_from: str | None = None,
    bloom_cols: list[str] | None = None,
    dry_run: bool = False,
) -> dict:
    """ONE housekeeping entry point for a manifest-committed store — the
    scheduled-job analog of the reference's operational polling + cleanup
    loop (`detect_fights_all_epochs.py` run-forever maintenance): in
    order, (1) small-file compaction — or the OPTIMIZE-ZORDER rewrite
    when ``optimize_cols`` is given, (2) retention —
    ``ttl_partition_col``/``ttl_keep_from`` runs the partition-aligned
    form (:func:`retention_sweep_manifested`: whole partitions expire in
    ONE metadata-only commit, zero data I/O — the right op for
    chunk/time-partitioned stores), while ``max_age`` on ``time_col``
    does row-level expiry via a full rewrite (only for stores whose
    layout does not align with the TTL; both skipped when unset), (3)
    ``bloom_cols`` re-indexes point-lookup sidecars the rewrites above
    dropped (:func:`reindex_manifested` — metadata-only, CDC-invisible),
    then migrates any pre-r13 per-file sidecars
    (:func:`consolidate_bloom_sidecars`) and repacks small per-commit
    bloomset objects across commits (:func:`compact_bloomsets`) so
    point-read sidecar GETs stay bounded by live files rather than
    commit count on micro-commit streaming stores,
    (4) vacuum with the in-flight-writer grace fence. Every step uses the
    manifest commit path, so the whole job composes with concurrent
    writers and readers keep snapshot isolation throughout.

    ``dry_run=True`` mutates NOTHING and returns the report a real run
    would act on: per-leaf file counts/bytes and which leaves are
    compaction-eligible, the rows/files the retention step would expire,
    and the files/manifests vacuum would reclaim (honoring the same
    grace fence). Returns {"dry_run", "compact"|"optimize", "retention",
    "vacuum"}.

    STREAMING-SINK CAVEAT: on a :func:`~..streaming.watch.stream_append_compacted`
    store, run maintain's COMPACTION step only while the stream is
    stopped after a clean drain (checkpoint fully committed): the sink's
    replay idempotency drops a replayed batch's files by ``b<id>-``
    prefix, and an external compaction that folded those files away
    breaks that contract (the replay would re-add its rows beside the
    fold). The sink's own in-stream fold is always safe (it folds only
    strictly-earlier batches); vacuum composes with the running stream
    (the grace fence covers its staging)."""
    import time

    report: dict = {"dry_run": dry_run}
    fs, Path, root = _hadoop_fs(spark, path)
    root_str = _canon_uri(fs, root)
    head_v, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        raise FileNotFoundError(f"maintain: no manifest under {path}")

    if dry_run:
        by_leaf: dict[str, list[int]] = {}
        for f in head["files"]:
            leaf = f["path"].rsplit("/", 1)[0] if "/" in f["path"] else ""
            by_leaf.setdefault(leaf, []).append(f["bytes"])
        eligible = {
            leaf: {"files": len(bs), "bytes": sum(bs)}
            for leaf, bs in sorted(by_leaf.items())
            if len(bs) >= (1 if optimize_cols else min_files_to_compact)
        }
        report["compact" if optimize_cols is None else "optimize"] = {
            "leaves": len(by_leaf),
            "eligible_leaves": eligible,
            "files": sum(len(bs) for bs in by_leaf.values()),
        }
        if ttl_partition_col is not None and ttl_keep_from is not None:
            pre = f"{ttl_partition_col}="
            vals = {
                p[len(pre):]
                for f in head["files"]
                for p in f["path"].split("/")[:-1]
                if p.startswith(pre) and p[len(pre):] < ttl_keep_from
            }
            report["retention"] = {"partitions_expired": sorted(vals)}
        elif max_age is not None:
            cutoff = pd.Timestamp.now() - pd.Timedelta(max_age)
            expired = (
                read_manifested(spark, path)
                .where(F.col(time_col) < F.lit(cutoff))
                .count()
            )
            report["retention"] = {"rows_expired": int(expired),
                                   "cutoff": str(cutoff)}
        else:
            report["retention"] = None
        # vacuum preview: same replay walk as the real pass, no deletes
        versions = _manifest_versions(fs, Path, root_str)
        keep = set(versions[-keep_versions:])
        live: set[str] = set()
        ever: set[str] = set()
        checkpoints: list[int] = []
        vstate: dict = {}
        for v in versions:
            doc = _manifest_doc(spark, fs, Path, root_str, v)
            if doc is None:
                continue
            if "files" in doc:
                checkpoints.append(v)
            vstate = _apply_doc(vstate, doc)
            ever.update(vstate)
            if v in keep:
                live.update(vstate)
        cutoff_ms = (time.time() - orphan_grace_seconds) * 1000.0
        would_delete = would_skip = 0
        for fi in _list_data_files(fs, root):
            rel = fi.uri[len(root_str):].strip("/")
            if rel.startswith((f"{_MANIFEST_DIR}/", "_staging/")) or rel in live:
                continue
            if rel not in ever and fi.mtime > cutoff_ms:
                would_skip += 1
            else:
                would_delete += 1
        min_keep = min(keep)
        anchor = max(
            (c for c in checkpoints if c <= min_keep), default=min_keep
        )
        report["vacuum"] = {
            "would_delete_files": would_delete,
            "would_skip_in_flight": would_skip,
            "would_delete_manifests": sum(1 for v in versions if v < anchor),
        }
        return report

    if optimize_cols is not None:
        report["optimize"] = optimize_manifested(
            spark, path, optimize_cols, curve=curve, target_bytes=target_bytes
        )
    else:
        report["compact"] = compact_manifested(
            spark, path, target_bytes=target_bytes,
            min_files_to_compact=min_files_to_compact,
        )
    if ttl_partition_col is not None and ttl_keep_from is not None:
        report["retention"] = {
            "partitions_expired": retention_sweep_manifested(
                spark, path, ttl_partition_col, ttl_keep_from
            )
        }
    elif max_age is not None:
        cutoff = pd.Timestamp.now() - pd.Timedelta(max_age)
        kept = read_manifested(spark, path).where(
            F.col(time_col) >= F.lit(cutoff)
        )
        before = read_manifested(spark, path).count()
        write_manifested(spark, kept, path, replace="all")
        after = read_manifested(spark, path).count()
        report["retention"] = {"rows_expired": int(before - after),
                               "cutoff": str(cutoff)}
    else:
        report["retention"] = None
    if bloom_cols:
        # restore point-lookup coverage the rewrites above dropped —
        # metadata-only, scans only un-bloomed files, CDC-invisible
        report["reindex"] = reindex_manifested(spark, path, bloom_cols)
        # migrate any pre-r13 per-file sidecars to consolidated objects
        # (no-op on new stores; metadata-only, CDC-invisible)
        legacy_rep = consolidate_bloom_sidecars(spark, path)
        if legacy_rep["consolidated"] or legacy_rep.get("skipped"):
            # skipped-only is still worth surfacing: damaged sidecars
            # were found and left in place (reads degrade to keep)
            report["consolidate_blooms"] = legacy_rep
        # merge micro-commit bloomsets so point-read GETs stay bounded
        # by live-file count, not commit count (r13 VERDICT task 1)
        pack_rep = compact_bloomsets(spark, path)
        if pack_rep["repacked_rels"]:
            report["compact_blooms"] = pack_rep
    report["vacuum"] = vacuum_manifested(
        spark, path, keep_versions=keep_versions,
        orphan_grace_seconds=orphan_grace_seconds,
    )
    return report
