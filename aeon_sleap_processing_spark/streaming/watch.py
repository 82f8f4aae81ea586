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

__all__ = [
    "watch_chunk_store",
    "stream_sessionize",
    "stream_sessionize_stateful",
    "stream_windowed_agg",
    "stream_dedup",
    "stream_enrich",
    "stream_asof_enrich",
    "stream_pack_sequences",
    "stream_append_compacted",
    "read_compacted_store",
    "stream_semantic_dedup",
    "read_semantic_reps",
]


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


def stream_sessionize_stateful(
    stream: DataFrame,
    time_col: str = "time",
    gap: float = 1800.0,
    partition_by: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Data-driven gap sessions as a CUSTOM stateful streaming operator
    (SURVEY §2.9 / T3 — `applyInPandasWithState`).

    ``session_window`` (see :func:`stream_sessionize`) covers the
    fixed-gap-in-event-time case; this operator is the template for session
    semantics Spark can't express built-in (the reference's detection
    pipelines sessionize on FRAME-ID gaps and filter sessions by content).
    Per key it keeps one open session (start, last, count) in the state
    store — durable across micro-batches AND restarts via the checkpoint:

    - a row landing within ``gap`` seconds of the open session extends it;
    - a row landing beyond the gap CLOSES the open session (emitted) and
      opens a new one;
    - when the event-time watermark passes ``last + gap`` the open session
      times out and is emitted (the streaming analog of "no more rows can
      join this session", guaranteed by the watermark contract).

    Emits closed sessions only (append mode):
    (``partition_by``, session_start, session_end, n_events).
    """
    import pandas as pd  # local: executors resolve by name

    key_type = stream.schema[partition_by].dataType
    out_schema = T.StructType(
        [
            T.StructField(partition_by, key_type),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    gap_us = int(gap * 1_000_000)

    def fn(key, pdfs, state):
        def arm_timeout(last_us: int) -> None:
            # A key whose last event trails the stream's max by more than
            # the gap has last+gap BELOW the current watermark — Spark
            # rejects a timeout in the past (INVALID_TIMEOUT_TIMESTAMP and
            # the query DIES; first seen at 10M rows where file order !=
            # time order, tools/measure_stream_throughput.py). Clamp to
            # watermark+1ms: the session is already closeable, so the
            # earliest legal timeout fires it in the next (or trailing
            # no-data) micro-batch — same emission the un-clamped
            # timestamp would have produced.
            state.setTimeoutTimestamp(
                max((last_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
            )

        def to_row(start_us: int, last_us: int, n: int) -> dict:
            return {
                partition_by: key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
            }

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([to_row(start_us, last_us, n)])
            return

        import numpy as np

        batches = [pdf[time_col] for pdf in pdfs]
        t = pd.concat(batches).sort_values()
        us = (t.astype("int64") // 1000).to_numpy()
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        if len(us) == 0:  # spurious invocation: keep state, re-arm timeout
            if last_us is not None:
                state.update((start_us, last_us, n))
                arm_timeout(last_us)
            return
        closed: list[dict] = []
        # vectorized run split: session boundaries where the sorted gap
        # exceeds the threshold (no per-row python)
        brk = np.nonzero(np.diff(us) > gap_us)[0] + 1
        starts = np.concatenate(([0], brk))
        ends = np.concatenate((brk, [len(us)]))
        for k, (i, j) in enumerate(zip(starts, ends)):
            s, e, cnt = int(us[i]), int(us[j - 1]), int(j - i)
            if k == 0 and last_us is not None:
                if s - last_us <= gap_us:  # first run extends the open session
                    s, cnt = start_us, cnt + n
                else:
                    closed.append(to_row(start_us, last_us, n))
            if j < len(us):  # every run but the last closes here
                closed.append(to_row(s, e, cnt))
            else:
                start_us, last_us, n = s, e, cnt
        state.update((start_us, last_us, n))
        # close the open session once no on-time row can still extend it
        arm_timeout(last_us)
        if closed:
            yield pd.DataFrame(closed)

    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(partition_by)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", "EventTimeTimeout")
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

    MANIFEST-STORE CAVEAT: this is Spark's directory-listing file source.
    On a manifest-committed store it stays exactly-once only while NO
    maintenance rewrite runs: a ``compact_manifested``/``maintain`` fold
    writes new physical files holding already-consumed rows, and the file
    source would re-consume every one of them (it cannot see the
    manifest's ``data_change=False``). Watch a manifest store with
    :func:`watch_manifested` instead — it walks the commit log, so
    compaction/OPTIMIZE/fold are invisible by construction.
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


def _read_manifest_cursor(spark: SparkSession, cursor_path: str) -> int:
    """Last-committed manifest version from a cursor file, -1 when the
    consumer has never committed (fresh start)."""
    import json as _json

    from ..sources.sinks import (
        _canon_uri, _hadoop_fs, _manifest_read_text, _raw_fs,
    )

    fs, Path, p = _hadoop_fs(spark, cursor_path)
    if not _raw_fs(fs).exists(Path(_canon_uri(fs, p))):
        return -1
    return int(_json.loads(
        _manifest_read_text(spark, fs, Path(_canon_uri(fs, p)))
    )["version"])


def _write_manifest_cursor(
    spark: SparkSession, cursor_path: str, version: int
) -> None:
    """Atomically persist the consumer cursor: tmp write + rename, raw fs
    (same single-atomic-event argument as the manifest log itself)."""
    import json as _json

    from ..sources.sinks import _canon_uri, _hadoop_fs, _raw_fs

    fs, Path, p = _hadoop_fs(spark, cursor_path)
    target = _canon_uri(fs, p)
    rfs = _raw_fs(fs)
    rfs.mkdirs(Path(target).getParent())
    tmp = Path(f"{target}.tmp-{version}")
    out = rfs.create(tmp, True)
    try:
        out.write(bytearray(_json.dumps({"version": version}).encode()))
    finally:
        out.close()
    rfs.delete(Path(target), False)
    if not rfs.rename(tmp, Path(target)):
        raise IOError(f"cursor rename failed for {cursor_path}")


def watch_manifested(
    spark: SparkSession,
    path: str,
    process_batch: Callable[[DataFrame, int], None],
    cursor_path: str,
    poll_interval: float | None = None,
    max_polls: int | None = None,
    prefixes: list[str] | None = None,
) -> dict:
    """Incremental consumer for a MANIFEST-committed store — the
    manifest-aware replacement for :func:`watch_chunk_store`'s
    directory-listing file source (which re-consumes every compaction/
    fold/OPTIMIZE output, see its caveat). Each poll reads the rows
    added by data-change commits past the durable cursor
    (:func:`~..sources.sinks.read_manifested_changes`), runs
    ``process_batch(df, until_version)``, then advances the cursor file
    — so maintenance rewrites are invisible and a restart resumes from
    the last committed version.

    Delivery is at-least-once at the poll boundary (cursor commits AFTER
    ``process_batch`` returns — a crash between the two replays the
    poll's rows, exactly the ``foreachBatch`` contract; make the sink
    idempotent on ``until_version`` for exactly-once).

    ``poll_interval=None`` (default) is availableNow semantics: drain
    whatever is committed, then return. A float polls on that cadence —
    the reference's 30-minute SLURM loop (`detect_fights_all_epochs.py`)
    — until ``max_polls``. ``prefixes`` watches one partition slice
    (e.g. ``["stream=5/camera=Top/"]`` — `watch_chunk_store`'s
    register/camera selector, manifest-side): give each slice consumer
    its own ``cursor_path``. Returns {"polls", "batches", "cursor"}."""
    import time as _time

    from ..sources.sinks import read_manifested_changes

    polls = batches = 0
    cursor = _read_manifest_cursor(spark, cursor_path)
    while True:
        df, until = read_manifested_changes(
            spark, path, cursor, prefixes=prefixes
        )
        polls += 1
        if df is not None:
            process_batch(df, until)
            batches += 1
        if until != cursor:
            _write_manifest_cursor(spark, cursor_path, until)
            cursor = until
        if poll_interval is None:
            if df is None:
                break  # drained — availableNow semantics
        else:
            if max_polls is not None and polls >= max_polls:
                break
            _time.sleep(poll_interval)
    return {"polls": polls, "batches": batches, "cursor": cursor}


def relay_manifested(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    cursor_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    prefixes: list[str] | None = None,
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    poll_interval: float | None = None,
    max_polls: int | None = None,
    compact_blooms_every: int | None = 64,
) -> dict:
    """EXACTLY-ONCE store→store relay: consume a manifest store's change
    deltas by cursor, optionally ``transform`` each delta DataFrame, and
    append it to another manifest store — the materialized-view /
    derived-table primitive (filter a corpus into a curated store, project
    pose features off raw ticks, fan a landing store out per team).

    Exactly-once is BY CONSTRUCTION, not by luck: each poll's output
    lands under a ``v<until_version>-`` filename prefix whose commit
    drops that same prefix first (the streaming sink's replay rule) — a
    crash AFTER the destination commit but BEFORE the cursor write
    replays the poll, and the replay REPLACES its own earlier output
    instead of duplicating it. The cursor advances only after the
    destination commit, so no delta is ever skipped. (The bare
    :func:`watch_manifested` leaves idempotency to the caller's sink;
    this is the ready-made sink that has it.)

    ``transform`` must be deterministic per delta for byte-stable
    replays (a nondeterministic transform still lands exactly one
    version of each poll — the replaced attempt vanishes atomically).
    Maintenance on the SOURCE (compact/optimize/fold) delivers nothing,
    so the relay copies each logical row once even across folds;
    source-side merges re-deliver rewritten files (file-level CDC —
    see :func:`~..sources.sinks.read_manifested_changes`), which the
    version-prefix replace keeps idempotent per poll but a source DML
    fixup DOES re-append its file's rows downstream: dedup there if the
    source is DML-active. Returns {"polls", "batches", "cursor"}.

    When ``bloom_cols`` is set, the destination's bloom index
    self-compacts every ``compact_blooms_every`` destination commits
    (default 64 — the r14 VERDICT item: a micro-commit relay otherwise
    decays point reads back to O(commits) GETs between external
    maintain() runs; the inline pass is metadata-only and idempotent)."""
    import time as _time

    from ..sources.sinks import read_manifested_changes, write_manifested

    polls = batches = 0
    cursor = _read_manifest_cursor(spark, cursor_path)
    while True:
        df, until = read_manifested_changes(
            spark, src_path, cursor, prefixes=prefixes
        )
        polls += 1
        if df is not None:
            out = transform(df) if transform is not None else df
            write_manifested(
                spark, out, dest_path,
                partition_by=partition_by,
                filename_prefix=f"v{until}-",
                remove_prefixes=[f"v{until}-"],  # replay replaces itself
                stats_cols=stats_cols,   # derived store keeps the same
                bloom_cols=bloom_cols,   # skipping discipline as a write
                compact_blooms_every=compact_blooms_every,
            )
            batches += 1
        if until != cursor:
            _write_manifest_cursor(spark, cursor_path, until)
            cursor = until
        if poll_interval is None:
            if df is None:
                break
        else:
            if max_polls is not None and polls >= max_polls:
                break
            _time.sleep(poll_interval)
    return {"polls": polls, "batches": batches, "cursor": cursor}


def stream_append_compacted(
    stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    compact_every: int = 4,
    target_bytes: int = 128 * 1024 * 1024,
    max_segments: int = 8,
    trigger: dict | None = None,
    commit: str = "manifest",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    compact_blooms_every: int | None = 64,
) -> StreamingQuery:
    """Parquet append sink with BUILT-IN small-file compaction — the watch
    loop no longer accumulates one small file per micro-batch forever
    (the r7 compactor existed but was standalone; this wires it into the
    stream on a batch-count cadence).

    ``commit="manifest"`` (the r11 default — engine-created stores use the
    multi-writer-safe protocol by default): every micro-batch lands as ONE
    atomic :func:`~..sources.sinks.write_manifested` commit of flat
    ``b<batch_id>-data-*.parquet`` files whose replay (crash after write,
    before checkpoint commit) drops its own earlier attempt via the
    ``b<batch_id>-`` remove-prefix — exactly-once without batch-id dirs.
    Every ``compact_every`` batches, :func:`_fold_manifested` rewrites all
    committed-by-construction files (``b<j>-`` with j < current batch, plus
    prior ``seg-`` outputs) into ~``target_bytes`` ``seg-`` files and swaps
    them in with ONE CAS commit, so — unlike the listing layout below —
    readers keep SNAPSHOT ISOLATION through the fold (the r≤10 documented
    transient-double-read tradeoff is gone), and a concurrent external
    :func:`write_manifested` append composes via the CAS rebuild instead of
    being lost or skipped. Old files stay for pinned readers until
    :func:`~..sources.sinks.vacuum_manifested` (run it on the maintenance
    cadence; its in-flight grace fence keeps it safe beside the stream).
    ``max_segments`` is moot here — every fold already absorbs prior
    ``seg-`` files, and boundedness comes from the manifest, not dir
    counts.

    ``commit="listing"`` keeps the r≤10 two-tier directory layout,
    exactly-once across restarts:

    - ``out_path/ingest/batch=<id>``: each micro-batch written with
      OVERWRITE into its own batch-id dir, so a replayed batch (crash
      after write, before checkpoint commit) just rewrites the same dir —
      idempotent.
    - ``out_path/compacted/seg=<id>``: every ``compact_every`` batches,
      all ingest dirs with id < current (strictly earlier ⇒ already
      checkpoint-committed, never replayed) are folded into one
      ~``target_bytes``-file segment, then deleted. The fold is guarded
      by the segment dir's existence: a replay that finds ``seg=<B>``
      already present skips the rewrite and only re-deletes leftover
      ingest dirs — so a crash anywhere in the fold is safe (the rewrite
      itself is mode=overwrite).

    File count stays BOUNDED, not merely slowed: the ingest tier holds at
    most ``compact_every`` batch dirs, and when the compacted tier
    reaches ``max_segments`` segments the fold absorbs the existing
    segments too (they are all strictly-earlier, committed data — the
    same exactly-once argument applies), collapsing the tier back to one
    segment. Steady state ≈ ``max_segments`` segment dirs of
    ~``target_bytes`` files + ``compact_every`` ingest dirs, for any
    stream length. Readers during a fold can transiently see a folded
    row in both the new segment and a not-yet-deleted source (no
    snapshot isolation without a manifest table format — documented
    tradeoff; folds are idempotent so the store always converges).
    Read the store with :func:`read_compacted_store` (it auto-detects the
    protocol; under listing the two tiers have different partition dir
    names, so a naive root read would trip partition inference). All
    directory ops go through the Hadoop FileSystem API — local/HDFS/S3A
    alike.

    ``stats_cols``/``bloom_cols`` (manifest protocol only) give the sink
    the same skipping discipline as a batch :func:`write_manifested`;
    with ``bloom_cols`` set, the bloom index SELF-COMPACTS every
    ``compact_blooms_every`` commits (default 64) so a long-running
    micro-batch stream keeps point-read GETs bounded by live files, not
    commit count, without any external ``maintain()`` schedule (the r14
    VERDICT's top item — the inline pass is metadata-only, idempotent,
    and conflict-tolerant)."""
    if commit not in ("manifest", "listing"):
        raise ValueError(f"unknown commit protocol {commit!r}")
    if commit == "listing" and (stats_cols or bloom_cols):
        raise ValueError(
            "stats_cols/bloom_cols need the manifest commit protocol"
        )
    spark = stream.sparkSession
    ingest = out_path.rstrip("/") + "/ingest"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if commit == "manifest":
            from ..sources.sinks import write_manifested

            write_manifested(
                spark, batch_df, out_path,
                filename_prefix=f"b{batch_id}-",
                remove_prefixes=[f"b{batch_id}-"],  # replay drops its own retry
                stats_cols=stats_cols,
                bloom_cols=bloom_cols,
                compact_blooms_every=compact_blooms_every,
            )
        else:
            (
                batch_df.write.mode("overwrite")
                .parquet(f"{ingest}/batch={batch_id}")
            )
        if compact_every > 0 and batch_id > 0 and batch_id % compact_every == 0:
            if commit == "manifest":
                _fold_manifested(
                    spark, out_path, batch_id, target_bytes,
                    stats_cols=stats_cols, bloom_cols=bloom_cols,
                )
            else:
                _fold_compacted(
                    spark, out_path, batch_id, compact_every,
                    target_bytes, max_segments,
                )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def _fold_manifested(
    spark: SparkSession,
    out_path: str,
    batch_id: int,
    target_bytes: int,
    _before_commit=None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 17,
) -> None:
    """The fold step of :func:`stream_append_compacted` under the manifest
    protocol: rewrite every head file from a STRICTLY-EARLIER batch
    (``b<j>-`` with j < ``batch_id`` — earlier ⇒ its micro-batch is
    checkpoint-committed, never replayed) plus every prior fold output
    (``seg-`` — committed by definition) into ~``target_bytes`` ``seg-``
    files, and swap them in with ONE CAS commit. Replay-safe from any
    crash point: pre-commit crashes leave only invisible staged orphans
    (vacuum's grace fence reclaims them later), and a re-run recomputes
    the same fold from the unchanged head. Concurrent appends compose —
    the remove-set names exactly the files this fold READ, so the CAS
    rebuild keeps a racing writer's files untouched. ``_before_commit``
    is the test seam (fires between staging and commit — the window every
    interleaving bug lives in).

    ``stats_cols``/``bloom_cols`` keep the SINK's skipping discipline
    across folds: the rewrite stages through the same
    :func:`~..sources.sinks._stage_files` machinery as a batch append,
    so ``seg-`` outputs carry fresh per-file stats and bloom sidecars
    instead of silently losing the ``b<j>-`` inputs' pruning (the one
    scan each costs is bounded by the fold's own rewrite)."""
    import math
    import re

    from ..sources.sinks import (
        _canon_uri, _hadoop_fs, _manifest_head, _stage_files,
        manifest_commit,
    )

    fs, Path, root = _hadoop_fs(spark, out_path)
    root_str = _canon_uri(fs, root)
    _, head, _ = _manifest_head(spark, fs, Path, root_str)
    if head is None:
        return
    committed = re.compile(r"^(?:b(\d+)-|seg-)")
    sources = []
    for f in head["files"]:
        m = committed.match(f["path"])
        if not m:
            continue  # an external append — not this fold's to rewrite
        if m.group(1) is not None and int(m.group(1)) >= batch_id:
            continue  # current/replayable batch: leave for a later fold
        sources.append((f["path"], f["bytes"]))
    if len(sources) <= 1:
        return
    n_out = max(1, math.ceil(sum(b for _, b in sources) / target_bytes))
    folded = (
        # mergeSchema: an external append with a wider schema must not
        # have its evolved column dropped by the fold's rewrite (same
        # soundness rule as compact_manifested)
        spark.read.option("mergeSchema", "true")
        .parquet(*[f"{root_str}/{p}" for p, _ in sources])
        .repartition(n_out)
    )
    adds, add_stats, _dirs, add_blooms = _stage_files(
        spark, folded, fs, Path, root_str, None, "seg-",
        stats_cols, bloom_cols, bloom_bits,
    )
    if _before_commit is not None:
        _before_commit()
    from ..sources.sinks import ManifestConflict

    try:
        # rewrite validation: a concurrent commit replacing one of the
        # fold's sources (external chunk-replace tooling, say) makes this
        # fold stale — drop it (staged segs stay invisible orphans for
        # vacuum) and let the next fold cadence redo it from the new head
        manifest_commit(
            spark, out_path,
            add=[(p, b, add_stats.get(p), add_blooms.get(p))
                 for p, b in adds],
            remove=[p for p, _ in sources],
            require_remove_present=True,
            op="fold", data_change=False,
        )
    except ManifestConflict:
        return


def _fold_compacted(
    spark: SparkSession,
    out_path: str,
    batch_id: int,
    compact_every: int,
    target_bytes: int,
    max_segments: int,
) -> None:
    """The fold step of :func:`stream_append_compacted`, module-level so
    crash-replay states can be driven directly in tests. Idempotent: safe
    to re-run for the same ``batch_id`` from ANY intermediate crash point
    (partial segment write, post-write pre-delete, partial deletes)."""
    import math

    from ..sources.sinks import _hadoop_fs, _list_data_files

    ingest = out_path.rstrip("/") + "/ingest"
    compacted = out_path.rstrip("/") + "/compacted"
    fs, Path, _ = _hadoop_fs(spark, out_path)
    seg = Path(f"{compacted}/seg={batch_id}")
    ingest_root = Path(ingest)
    older = []
    if fs.exists(ingest_root):
        older = [
            st.getPath()
            for st in fs.listStatus(ingest_root)
            if st.isDirectory()
            and st.getPath().getName().startswith("batch=")
            and int(st.getPath().getName().split("=", 1)[1]) < batch_id
        ]
    # second-level fold: every max_segments-th fold absorbs ALL
    # existing segments (each folded from strictly-earlier batches),
    # so segment count is bounded for any stream length. The absorb
    # decision is a PURE FUNCTION of batch_id — a replayed fold makes
    # the identical decision, so a crash between the segment write
    # and the source deletes re-deletes exactly the same sources
    # (a runtime-count-based decision would diverge on replay and
    # strand absorbed rows in both places).
    absorb_round = (batch_id // compact_every) % max_segments == 0
    absorb = []
    comp_root = Path(compacted)
    if absorb_round and fs.exists(comp_root):
        absorb = [
            st.getPath()
            for st in fs.listStatus(comp_root)
            if st.isDirectory()
            and st.getPath().getName().startswith("seg=")
            and int(st.getPath().getName().split("=", 1)[1]) < batch_id
        ]
    # bail ONLY when both lists are empty: an early `if not older:
    # return` would strand absorbed segments on replay (crash after
    # the ingest-dir deletes but before the absorbed-segment deletes
    # leaves older == [] while absorb is non-empty — the replay must
    # still re-delete those segments, whose rows live in seg=B).
    if not older and not absorb:
        return
    sources = older + absorb
    # completion guard: the parquet commit's _SUCCESS marker, not dir
    # existence — a crash mid-write leaves a partial seg dir, which a
    # replay must overwrite (sources are still intact: deletes only
    # happen after a complete write)
    if not fs.exists(Path(str(seg) + "/_SUCCESS")):
        src = [str(p.toUri()) for p in sources]
        files = []
        for p in sources:
            files += _list_data_files(fs, p)
        n_out = max(
            1, math.ceil(sum(st.getLen() for st in files) / target_bytes)
        )
        (
            spark.read.parquet(*src)
            .repartition(n_out)
            .write.mode("overwrite")
            .parquet(str(seg.toUri()))
        )
    for p in sources:  # replay-safe: re-deleting already-gone dirs is a no-op
        fs.delete(p, True)


def read_compacted_store(spark: SparkSession, out_path: str) -> DataFrame:
    """Snapshot view over a :func:`stream_append_compacted` store. Auto-
    detects the protocol: a manifest-committed store resolves ONE
    consistent snapshot from the manifest head (immune to a concurrent
    fold — snapshot isolation); a listing store unions both tiers
    (missing tiers contribute nothing)."""
    from ..sources.sinks import _hadoop_fs, is_manifested, read_manifested

    if is_manifested(spark, out_path):
        return read_manifested(spark, out_path)

    fs, Path, _ = _hadoop_fs(spark, out_path)
    parts = []
    for tier in ("ingest", "compacted"):
        p = out_path.rstrip("/") + "/" + tier
        if fs.exists(Path(p)):
            # drop the tier's bookkeeping partition column (batch= / seg=)
            parts.append(
                spark.read.option("basePath", p).parquet(p).drop("batch", "seg")
            )
    if not parts:
        raise FileNotFoundError(f"no ingest/compacted tier under {out_path}")
    cols = parts[0].columns
    df = parts[0]
    for other in parts[1:]:
        df = df.select(*cols).unionByName(
            other.select(*cols), allowMissingColumns=False
        )
    return df


def stream_windowed_agg(
    stream: DataFrame,
    time_col: str = "time",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    partition_by: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Streaming tumbling/hopping window aggregation (SURVEY §2.8 T3, the
    fixed-window twin of ``q_hopping_window``'s batch µs-grid form):
    ``window(time, window, slide)`` + watermark; emits count (+ sum of
    ``value_col``) per window once the watermark passes its end.

    At scale the window spec is the shuffle key — state is bounded by
    (watermark / slide) open windows per key, and late rows beyond the
    watermark are dropped (the reference's batch loop instead reprocesses
    whole chunks, `combine_pose_id_automated.py:149-185`)."""
    keys = [F.col(partition_by)] if partition_by else []
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    w = F.window(F.col(time_col), window, slide) if slide else F.window(F.col(time_col), window)
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(*keys, w.alias("win"))
        .agg(*aggs)
        .select(
            *([partition_by] if partition_by else []),
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup (SURVEY §2.8 T2 + the dedup kit's ingest twin):
    drop rows whose key was already seen within the watermark horizon via
    ``dropDuplicatesWithinWatermark`` — the streaming analog of
    ``exact_dedup``/``incremental_dedup`` for at-least-once upstream replays
    (the reference's empty-marker + re-submit loop can deliver a chunk twice;
    this makes re-delivery a no-op).

    State is bounded: Spark evicts seen-keys older than the watermark, so
    memory is O(keys per horizon), not O(all history) — the property that
    lets it run unbounded at ingest scale."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def _rep_dirs_with_data(spark, reps_root: str, before_batch: int) -> list[str]:
    """``batch=N`` dirs under ``reps_root`` with ``N < before_batch`` that
    contain at least one data file. Spark's parquet writer preserves the
    schema on empty writes (an all-dropped batch dir holds a 0-row part
    file — tested), but a sink/filesystem that skips empty files would
    leave a ``_SUCCESS``-only dir, and reading a file-less dir set cannot
    infer a parquet schema — it would wedge every checkpoint replay on
    the same crash. File-less dirs hold no reps, so skipping them is
    exact, not an approximation."""
    from ..sources.sinks import _hadoop_fs

    fs, Path, _ = _hadoop_fs(spark, reps_root)
    root = Path(reps_root)
    if not fs.exists(root):
        return []
    dirs = [
        st.getPath()
        for st in fs.listStatus(root)
        if st.isDirectory()
        and st.getPath().getName().startswith("batch=")
        and int(st.getPath().getName().split("=", 1)[1]) < before_batch
    ]
    # recursive emptiness check: the bucketed layout nests vp=/t=/hp=
    # partition dirs under each batch dir
    return [str(d.toUri()) for d in _dirs_with_data(fs, dirs, 2)]


def _dirs_with_data(fs, dirs, depth: int = 2):
    """Subset of ``dirs`` (Hadoop Paths) holding at least one data file at
    any depth up to ``depth`` — the :func:`_rep_dirs_with_data` emptiness
    rule generalized to Hive-partitioned batch dirs (``vp=``/``t=``/``hp=``
    nesting), so file-less dirs never wedge a parquet schema inference."""
    out = []
    for d in dirs:
        stack = [(d, 0)]
        found = False
        while stack and not found:
            cur, lvl = stack.pop()
            for st in fs.listStatus(cur):
                name = st.getPath().getName()
                if st.isFile() and not name.startswith(("_", ".")):
                    found = True
                    break
                if st.isDirectory() and lvl < depth:
                    stack.append((st.getPath(), lvl + 1))
        if found:
            out.append(d)
    return out


def _part_dirs(spark, root: str, before_batch: int, levels: int):
    """Enumerate Hive partition leaf dirs of the first ``levels`` partition
    keys under ``root``'s ``batch=N`` dirs with N < ``before_batch``.
    Returns (partition-values-tuple, leaf Path) pairs — partition values
    parsed as ints. Listing is metadata-only: batches x fan-out entries,
    never a data read; the caller prunes this list against the
    micro-batch's key set BEFORE any parquet scan."""
    from ..sources.sinks import _hadoop_fs

    fs, Path, _ = _hadoop_fs(spark, root)
    if not fs.exists(Path(root)):
        return fs, []
    batch_dirs = [
        st.getPath()
        for st in fs.listStatus(Path(root))
        if st.isDirectory()
        and st.getPath().getName().startswith("batch=")
        and int(st.getPath().getName().split("=", 1)[1]) < before_batch
    ]
    leaves = []

    def walk(d, vals, lvl):
        if lvl == levels:
            leaves.append((tuple(vals), d))
            return
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name:
                walk(st.getPath(), vals + [int(name.split("=", 1)[1])], lvl + 1)

    for b in batch_dirs:
        walk(b, [], 0)
    return fs, leaves


def _budget_cap_sides(
    pool_keys: DataFrame, idc: str, repc: str, m_cap: int
):
    """BOTH pair-budget candidate-join side caps in ONE window pass
    (r16, guide §2.4 — see the budget contract in
    :func:`stream_semantic_dedup`). The former shape ranked each side
    with its own window: two exchanges of the keys relation, and (flat
    path) two full evaluations of the bucket-UDF subtree feeding them,
    because the side filters below the exchanges made the subtrees
    differ. One ranking over the POOL ordered by (rep DESC, id) serves
    both: side b keeps rank ≤ m_cap verbatim (reps first, then smallest
    id — its contract ordering); and because every rep sorts before
    every batch row within a (t, h) cell, a non-rep row's rank among
    non-reps (side a's contract: plain id order) is exactly its pool
    rank minus the cell's rep count. Identical row sets to the per-side
    windows (pinned by test_fused_side_caps_match_two_window_reference
    and the flat≡bucketed budget tests); the two branch filters sit
    ABOVE a now-identical exchange subtree, so it computes once
    (ReusedExchange). Returns (a, b): a = (id_a, t, h),
    b = (id_b, rep_b, t, h)."""
    from pyspark.sql.window import Window

    seq = Window.partitionBy("t", "h").orderBy(
        F.col(repc).desc(), F.col(idc)
    )
    cell = Window.partitionBy("t", "h")
    ranked = pool_keys.withColumn(
        "__rnb", F.row_number().over(seq)
    ).withColumn(
        "__nrep", F.sum(F.when(F.col(repc), 1).otherwise(0)).over(cell)
    )
    b = ranked.where(F.col("__rnb") <= m_cap).select(
        F.col(idc).alias("id_b"), F.col(repc).alias("rep_b"), "t", "h"
    )
    a = ranked.where(
        (~F.col(repc)) & ((F.col("__rnb") - F.col("__nrep")) <= m_cap)
    ).select(F.col(idc).alias("id_a"), "t", "h")
    return a, b


def stream_semantic_dedup(
    stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    hyperplanes: list[list[float]] | None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 6,
    trigger: dict | None = None,
    store_partitions: int = 16,
    expected_rows: int | None = None,
    dim: int | None = None,
    target_recall: float = 0.95,
    plan_seed: int = 0,
    max_pairs_per_bucket: int | None = None,
) -> StreamingQuery:
    """Streaming semantic (embedding) dedup — the ingest twin of
    ``operators.similarity.semantic_dedup``: each arriving vector is kept
    only if it has NO near-duplicate (exact cosine ≥ ``threshold``) among
    the representatives kept so far or among smaller-id vectors of its own
    micro-batch; kept vectors become representatives for every later batch.

    The "state" is a REPRESENTATIVE STORE on disk
    (``out_path/reps/batch=<id>``), not the streaming state store: vectors
    are far too large to ride per-key state at corpus scale, and the dedup
    decision is a bucket-keyed JOIN (the OR-amplified sign-LSH candidate
    generation of ``embedding_near_dups``, same planes/tables/threshold
    semantics), so per-batch work is batch-vs-store collisions — never an
    all-pairs product, and executor memory stays O(batch + collisions)
    regardless of store size.

    BUCKET-PARTITIONED STORE (``store_partitions`` = P > 0, the default):
    the store is two tiers, both Hive-partitioned so each micro-batch
    reads only the store fraction its own keys can collide with —
    file-listing-level pruning, no full-store scan per batch:

    - ``reps/batch=B/vp=<xxhash64(id) mod P>`` — (id, vector), each rep
      once. Read twice per batch, both times pruned: the redelivery
      anti-join touches only the batch's own vp cells (ids column only,
      parquet column pruning), the verify fetch only the colliding reps'
      cells.
    - ``repkeys/batch=B/t=<table>/hp=<bucket mod P>`` — (id, h) scalar
      LSH keys, n_tables rows per rep (vectors are NOT duplicated).
      Candidate generation reads only the (t, hp) cells present in the
      batch — ≤ n_tables·P dirs however big the store grows.

    Partition values to prune on are collected per batch, each bounded
    by P or n_tables·P (never row data); the colliding-candidate set is
    persisted for the one extra pass that derives the verify cells. With
    P = 0 the pre-r10 single-tier layout (``reps/batch=B``, full-store
    scan every batch — throughput decays linearly with store size) is
    kept for comparison. Measured curve
    (tools/measure_repstore_layout.py, bench_runs_r10): 2k-vector probe
    vs 50k/200k/800k stores — flat 3.8/4.0/20.9 s, bucketed
    7.9/8.9/10.6 s; the bucketed tax is ~5 s of fixed per-batch work,
    so the crossover is ~300k stored vectors — pass 0 only for small
    BOUNDED corpora. Listing cost grows with the batch-dir count — fold
    old batch dirs with :func:`compact_rep_store` on the maintenance
    cadence when micro-batches are small. Size ``hyperplanes``/
    ``n_tables`` for the EXPECTED FINAL corpus with
    ``operators.similarity.lsh_planes_for(expected_rows, dim,
    threshold)`` — the store only grows, and under-banding shows up as
    the quadratic random-collision floor of the r10 second-decade
    measurement.

    NULL embeddings (routine at 100 TB) are kept — a null vector has no
    cosine, so it is never anyone's near-dup — but carry NO LSH keys: left
    unfiltered they hash to bucket 0 in every table and collide with the
    entire bucket-0 population (the O(n_nulls²) product the ADVICE r9
    audit flagged); here they bypass candidate generation entirely and go
    straight to the kept set.

    Exactly-once across restarts, by the strictly-earlier argument of
    :func:`stream_append_compacted`: batch B reads only ``batch=<id> < B``
    rep dirs (already checkpoint-committed, never replayed), writes its
    kept set with OVERWRITE into ``batch=B``, and id-anti-joins the store
    first so an at-least-once redelivery of an already-kept id is a no-op.
    A crash anywhere between write and checkpoint commit replays batch B
    against the identical earlier-store ⇒ identical decision ⇒ identical
    rewrite.

    GREEDY streaming contract (documented divergence from the batch
    operator): the batch ``semantic_dedup`` picks one representative per
    connected near-dup CLUSTER; this operator drops a vector on ANY
    near-dup edge to an earlier survivor-or-batch-predecessor, so a chain
    a–b–c arriving in order can keep only ``a`` where the batch form
    (same cluster) would also keep only one — but a chain SPLIT ACROSS
    batches can over-drop relative to re-clustering history. Over-dropping
    near-dups is the conservative direction for dedup; the batch operator
    remains the end-of-corpus authority. Read the kept set with
    :func:`read_semantic_reps`.

    Pass ``hyperplanes=None`` with ``expected_rows`` + ``dim`` to size
    the plan from the measured b ≈ log₂(n)+margin law
    (``operators.similarity.lsh_planes_for`` — ``n_tables`` is then
    derived from ``threshold``/``target_recall`` and the argument
    ignored). A stream cannot count its corpus up front, so the EXPECTED
    FINAL size is the caller's to provide — size for where the store
    ends, not where it starts; the plan is fixed for the stream's
    lifetime (keys are precomputed per plan, see the repkeys tier).

    ``max_pairs_per_bucket`` is the streaming twin of the batch
    operator's pair budget (``embedding_near_dups`` r14): each
    (table, bucket) cell of the per-batch candidate join keeps only its
    m = ⌊(1+√(1+8·budget))/2⌋ highest-priority members PER SIDE
    (deterministic: store reps first — dropping a rep candidate is the
    costlier miss — then smallest id), bounding the cell's product at
    ~m² ≈ 2·budget however duplicate-dense one micro-batch or store
    bucket becomes (a boilerplate flood arriving in one trigger).
    DIRECTION CAVEAT, same as batch: a dropped candidate can
    UNDER-drop — a duplicate slips into the kept set — which is the
    non-conservative direction for dedup; the budget is a wall-time
    backstop for adversarial density, not a fidelity knob, and the
    batch ``semantic_dedup`` remains the end-of-corpus authority.
    Default None = exact prior behavior."""
    from ..operators import similarity as sim

    if hyperplanes is None:
        if expected_rows is None or dim is None:
            raise ValueError(
                "pass hyperplanes, or expected_rows + dim to auto-size the plan"
            )
        hyperplanes, n_tables = sim.lsh_planes_for(
            expected_rows, dim, threshold=threshold,
            target_recall=target_recall, seed=plan_seed,
        )

    spark = stream.sparkSession
    reps_root = out_path.rstrip("/") + "/reps"
    keys_root = out_path.rstrip("/") + "/repkeys"
    bucket = sim._bucket_udf(sim._split_tables(hyperplanes, n_tables))
    P = store_partitions
    m_cap = (
        None if max_pairs_per_bucket is None
        else sim._bucket_member_cap(max_pairs_per_bucket)
    )

    def _cap_sides(pool_keys: DataFrame, idc: str, repc: str):
        return _budget_cap_sides(pool_keys, idc, repc, m_cap)

    def _verify_and_keep(batch, cand, va, vb):
        # shared verify/drop tail: cand = (id_a batch-row, id_b, rep_b).
        # round-then-compare matches the batch authority
        # (embedding_near_dups) at threshold-boundary cosines. Norms are
        # computed once per side row (r15: the verify kernel previously
        # re-derived both self-dots per PAIR — cosine_kernel_prenorm is
        # bit-identical at a third of the LTR dots).
        p = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .where(
                F.round(
                    sim.cosine_kernel_prenorm(
                        F.col("__va"), F.col("__vb"),
                        F.col("__na"), F.col("__nb"),
                    ),
                    6,
                )
                >= threshold
            )
        )
        # rep_b → the right side survives (it's a rep), drop the batch row
        # id_a; both-batch → drop the larger id (id_a < id_b enforced in
        # cand). One projection, not two filtered re-evaluations of the
        # candidate pipeline — Spark does not dedupe common subplans.
        drop_ids = p.select(
            F.when(F.col("rep_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias(id_col)
        ).distinct()
        return batch.join(drop_ids, id_col, "left_anti")

    def _process_flat(batch_df: DataFrame, batch_id: int) -> None:
        # legacy single-tier layout (store_partitions=0): every batch
        # scans the whole rep store — kept for the layout A/B measurement
        batch = batch_df.select(F.col(id_col), F.col(vec_col)).dropDuplicates(
            [id_col]
        )
        dirs = _rep_dirs_with_data(spark, reps_root, batch_id)
        if dirs:
            # explicit schema (r15): the flat store holds exactly the batch
            # columns by construction (kept = batch projection), so the
            # per-batch parquet schema-inference job is driver-serial waste
            # (guide §5.3). NOTE: pinning (persist) of the batch/keys
            # subtrees was A/B'd here and REJECTED — with AQE unable to
            # coalesce under the cache (canChangeCachedPlanOutputPartitioning
            # false) batches ran 2.1+2.9 s -> 2.9+4.5 s, and with the conf
            # flipped true the 4-rep steady-state min was still no better
            # than the unpinned path (5.85 s vs 6.29/6.38 s query total):
            # the subtrees are small enough that recomputation beats
            # cache-materialization task overhead at any bench scale.
            reps = spark.read.schema(batch.schema).parquet(*dirs).select(
                id_col, vec_col
            )
            # at-least-once redelivery of an already-kept id: no-op
            batch = batch.join(reps.select(id_col), id_col, "left_anti")
            pool = batch.withColumn("__rep", F.lit(False)).unionByName(
                reps.withColumn("__rep", F.lit(True))
            )
        else:
            pool = batch.withColumn("__rep", F.lit(False))
        # ASYMMETRIC candidate join: only BATCH rows on the left, so
        # rep-rep collisions are never generated, let alone verified —
        # per-batch work is batch-vs-pool collisions, independent of the
        # store's internal collision count. Right side takes any rep
        # (drop the batch row) or a LARGER-id batch row (drop that one).
        # NULL vectors carry no keys (ADVICE r9: unfiltered they bucket
        # to 0 in every table) and reach the kept set unconditionally.
        keys = pool.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("__kid"),
            F.col("__rep"),
            F.posexplode(bucket(F.col(vec_col))).alias("t", "h"),
        )
        # cap the two join SIDES separately (batch-left, pool-right with
        # rep priority) — capping the union could evict a bucket's batch
        # rows entirely behind its reps, silencing the store comparison.
        # Budgeted: both caps ride ONE window pass over the pool keys
        # (r16 — see _cap_sides); unbudgeted: plain side projections.
        if m_cap is None:
            a = keys.where(~F.col("__rep")).select(
                F.col("__kid").alias("id_a"), "t", "h"
            )
            b = keys.select(
                F.col("__kid").alias("id_b"),
                F.col("__rep").alias("rep_b"), "t", "h",
            )
        else:
            a, b = _cap_sides(keys, "__kid", "__rep")
        cand = (
            a.join(
                b,
                (a["t"] == b["t"])
                & (a["h"] == b["h"])
                & (F.col("rep_b") | (F.col("id_a") < F.col("id_b"))),
            )
            .select("id_a", "id_b", "rep_b")
            # pair dedup with an EXPLICIT partition count (r15, mirrors
            # embedding_near_dups): the verify kernel runs on this
            # exchange's partitioning, and AQE's byte-based coalescing
            # would single-thread it (scalar pair rows, heavy per-row
            # kernel CPU). rep_b is functionally dependent on id_b, so
            # dedup over all three columns equals dedup over the pair key.
            .repartition(sim._kernel_parallelism(batch), "id_a", "id_b")
            .dropDuplicates()
        )
        # id_a is always a batch row (a is built from ~__rep and the store
        # anti-join keeps batch ids disjoint from rep ids) — project the
        # left vectors from the BATCH, not the pool, so the rep store's
        # vectors are scanned once per micro-batch (vb), not twice
        va = batch.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            sim.vector_norm(F.col(vec_col)).alias("__na"),
        )
        vb = pool.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            sim.vector_norm(F.col(vec_col)).alias("__nb"),
        )
        kept = _verify_and_keep(batch, cand, va, vb)
        kept.write.mode("overwrite").parquet(f"{reps_root}/batch={batch_id}")

    def _process_bucketed(batch_df: DataFrame, batch_id: int) -> None:
        pinned = []

        def pin(df):
            pinned.append(df.persist())
            return pinned[-1]

        batch = pin(
            batch_df.select(F.col(id_col), F.col(vec_col))
            .dropDuplicates([id_col])
            .withColumn("vp", F.pmod(F.xxhash64(F.col(id_col)), F.lit(P)))
        )
        try:
            fs, vec_leaves = _part_dirs(spark, reps_root, batch_id, 1)
            # (vp → leaf uris) map, empty leaves dropped
            vec_map: dict[int, list[str]] = {}
            nonempty = {
                str(d.toUri())
                for d in _dirs_with_data(fs, [d for _, d in vec_leaves], 1)
            }
            for vals, d in vec_leaves:
                u = str(d.toUri())
                if u in nonempty:
                    vec_map.setdefault(vals[0], []).append(u)
            if vec_map:
                # redelivery anti-join pruned to the batch's OWN vp cells:
                # ids column only — parquet reads nothing else
                bvps = {
                    r[0] for r in batch.select("vp").distinct().collect()
                }
                paths = [u for vp in sorted(bvps) for u in vec_map.get(vp, [])]
                if paths:
                    prior_ids = (
                        spark.read.option("basePath", reps_root)
                        .parquet(*paths)
                        .select(id_col)
                    )
                    batch = pin(batch.join(prior_ids, id_col, "left_anti"))
            # batch-side LSH keys (non-null vectors only)
            bkeys = pin(
                batch.where(F.col(vec_col).isNotNull())
                .select(
                    F.col(id_col).alias("id_a"),
                    F.posexplode(bucket(F.col(vec_col))).alias("t", "h"),
                )
                .withColumn("hp", F.pmod(F.col("h"), F.lit(P)))
            )
            thps = {(r.t, r.hp) for r in bkeys.select("t", "hp").distinct().collect()}
            _, key_leaves = _part_dirs(spark, keys_root, batch_id, 2)
            kpaths = [
                str(d.toUri()) for vals, d in key_leaves if (vals[0], vals[1]) in thps
            ]
            right = bkeys.select(
                F.col("id_a").alias("id_b"), "t", "h"
            ).withColumn("rep_b", F.lit(False))
            if kpaths:
                rkeys = (
                    spark.read.option("basePath", keys_root)
                    .parquet(*kpaths)
                    .select(
                        F.col(id_col).alias("id_b"),
                        F.col("t").cast("int"),
                        F.col("h"),
                        F.lit(True).alias("rep_b"),
                    )
                )
                right = right.unionByName(rkeys)
            if m_cap is None:
                a = bkeys.select("id_a", "t", "h")
            else:
                # one ranking of the pool serves both side caps (r16 —
                # see _cap_sides): the non-rep slice of `right` IS
                # bkeys (rep_b=False rows), so deriving side a from the
                # ranked pool keeps the row sets identical while
                # dropping the second window exchange
                a, right = _cap_sides(right, "id_b", "rep_b")
            cand = pin(
                a.join(
                    right,
                    (a["t"] == right["t"])
                    & (a["h"] == right["h"])
                    & (F.col("rep_b") | (F.col("id_a") < F.col("id_b"))),
                )
                .select("id_a", "id_b", "rep_b")
                # explicit-count pair dedup — see _process_flat's cand
                .repartition(sim._kernel_parallelism(batch), "id_a", "id_b")
                .dropDuplicates()
            )
            # verify fetch pruned to the COLLIDING reps' vp cells — vp is
            # derivable from the id (pmod(xxhash64,P)), never stored twice.
            # The collect is partition VALUES (≤ P ints), not row data.
            rvps = {
                r[0]
                for r in cand.where("rep_b")
                .select(F.pmod(F.xxhash64(F.col("id_b")), F.lit(P)))
                .distinct()
                .collect()
            }
            rpaths = [u for vp in sorted(rvps) for u in vec_map.get(vp, [])]
            vb = batch.select(
                F.col(id_col).alias("id_b"),
                F.col(vec_col).alias("__vb"),
                sim.vector_norm(F.col(vec_col)).alias("__nb"),
            )
            if rpaths:
                vb = vb.unionByName(
                    spark.read.option("basePath", reps_root)
                    .parquet(*rpaths)
                    .select(
                        F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("__vb"),
                        sim.vector_norm(F.col(vec_col)).alias("__nb"),
                    )
                )
            va = batch.select(
                F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("__va"),
                sim.vector_norm(F.col(vec_col)).alias("__na"),
            )
            kept = pin(_verify_and_keep(batch, cand, va, vb))
            # repartition ON the partition columns before partitionBy:
            # without it every task writes a file into every cell it
            # touches — n_tasks x n_cells tiny files PER BATCH (measured
            # 5x the flat layout's wall from write amplification alone);
            # with it, file count per batch = touched cells
            (
                kept.repartition(F.col("vp"))
                .write.partitionBy("vp")
                .mode("overwrite")
                .parquet(f"{reps_root}/batch={batch_id}")
            )
            (
                kept.where(F.col(vec_col).isNotNull())
                .select(
                    F.col(id_col),
                    F.posexplode(bucket(F.col(vec_col))).alias("t", "h"),
                )
                .withColumn("hp", F.pmod(F.col("h"), F.lit(P)))
                .repartition(F.col("t"), F.col("hp"))
                .write.partitionBy("t", "hp")
                .mode("overwrite")
                .parquet(f"{keys_root}/batch={batch_id}")
            )
        finally:
            for df in pinned:
                try:
                    df.unpersist()
                except Exception:
                    pass

    return (
        stream.writeStream.foreachBatch(
            _process_bucketed if P > 0 else _process_flat
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_semantic_reps(spark: SparkSession, out_path: str) -> DataFrame:
    """All representatives kept by :func:`stream_semantic_dedup` (each id
    appears in exactly one batch dir). Handles both store layouts: the
    bucketed two-tier store (``batch``/``vp`` partition cols dropped; the
    ``repkeys`` tier is an internal index, never surfaced) and the flat
    pre-r10 layout (``batch`` only)."""
    from ..sources.sinks import _hadoop_fs

    reps_root = out_path.rstrip("/") + "/reps"
    fs, Path, _ = _hadoop_fs(spark, out_path)
    if not fs.exists(Path(reps_root)):
        raise FileNotFoundError(f"no reps tier under {out_path}")
    return (
        spark.read.option("basePath", reps_root)
        .parquet(reps_root)
        .drop("batch", "vp")
    )


def compact_rep_store(
    spark: SparkSession,
    out_path: str,
    hyperplanes: list[list[float]],
    n_tables: int = 6,
    store_partitions: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Offline housekeeping for :func:`stream_semantic_dedup`'s bucketed
    store: FOLD every existing ``batch=N`` dir of both tiers into a
    single ``batch=0`` (rewriting per-cell files at full size), so the
    per-micro-batch file-listing cost — which grows with the batch-dir
    count, the one documented growth term of the bucketed layout —
    resets to one dir per tier.

    OFFLINE CONTRACT (same as ``compact_parquet``'s single-writer rule):
    run while the stream is stopped. Correctness is layout-independent:
    readers consume dirs with batch id strictly below the CURRENT batch,
    and the checkpoint's next batch id only grows, so folding history
    into batch=0 preserves the strictly-earlier property; the kept set
    is unchanged (asserted by the test via read_semantic_reps parity).
    Keys are REGENERATED from the folded vectors with the stream's own
    plane split rather than copied — one code path to trust, and it
    makes the fold idempotent after a crash (re-run rewrites both tiers
    from the vector tier, the durable source of truth).

    Returns {batches_folded, reps}."""
    from ..operators import similarity as sim
    from ..sources.sinks import _hadoop_fs

    reps_root = out_path.rstrip("/") + "/reps"
    keys_root = out_path.rstrip("/") + "/repkeys"
    fs, Path, _ = _hadoop_fs(spark, out_path)
    if not fs.exists(Path(reps_root)):
        raise FileNotFoundError(f"no reps tier under {out_path}")
    def _batches(root: str) -> int:
        p = Path(root)
        if not fs.exists(p):
            return 0
        return sum(
            1
            for st in fs.listStatus(p)
            if st.isDirectory() and st.getPath().getName().startswith("batch=")
        )

    n_batches = _batches(reps_root)
    # already folded ONLY if the keys tier is folded too — a crash
    # between the two tier swaps leaves vectors folded but keys
    # stale/missing, and the repair is exactly a re-run
    if n_batches <= 1 and _batches(keys_root) == n_batches:
        kept = read_semantic_reps(spark, out_path).count()
        return {"batches_folded": 0, "reps": kept}
    P = store_partitions
    kept = read_semantic_reps(spark, out_path).localCheckpoint()
    n_reps = kept.count()
    bucket = sim._bucket_udf(sim._split_tables(hyperplanes, n_tables))
    stage_reps = f"{reps_root.rstrip('/')}__folding"
    (
        kept.withColumn("vp", F.pmod(F.xxhash64(F.col(id_col)), F.lit(P)))
        .repartition(F.col("vp"))
        .write.partitionBy("vp")
        .mode("overwrite")
        .parquet(f"{stage_reps}/batch=0")
    )
    stage_keys = f"{keys_root.rstrip('/')}__folding"
    (
        kept.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col), F.posexplode(bucket(F.col(vec_col))).alias("t", "h")
        )
        .withColumn("hp", F.pmod(F.col("h"), F.lit(P)))
        .repartition(F.col("t"), F.col("hp"))
        .write.partitionBy("t", "hp")
        .mode("overwrite")
        .parquet(f"{stage_keys}/batch=0")
    )
    # swap: stage dirs become the tiers (crash between the two swaps is
    # repaired by re-running the fold — the vector tier is authoritative)
    for root, stage in ((reps_root, stage_reps), (keys_root, stage_keys)):
        old = Path(root + "__prefold")
        if fs.exists(Path(root)):
            if not fs.rename(Path(root), old):
                raise IOError(f"compact_rep_store: stage-out failed for {root}")
        if not fs.rename(Path(stage), Path(root)):
            fs.rename(old, Path(root))
            raise IOError(f"compact_rep_store: swap failed for {root}")
        fs.delete(old, True)
    return {"batches_folded": n_batches, "reps": n_reps}


def stream_pack_sequences(
    stream: DataFrame,
    capacity: int = 512,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Streaming concat-and-cut sequence packing — the ingest twin of
    ``operators.curation.pack_sequences``: documents arriving on a shard are
    laid token-after-token onto that shard's stream and cut every
    ``capacity`` tokens; a sequence is emitted once it is FULL (no later
    document can touch it). The one open (partial) sequence per shard rides
    the state store, so token offsets survive micro-batch boundaries AND
    restarts.

    Per-shard state: (offset, open-sequence aggregates). Each batch walks
    its documents in ``id_col`` order, extends or closes sequences, emits
    the closed ones: (shard, seq_id, n_docs, n_tokens, n_starts). Document
    order is therefore ``id_col`` WITHIN a micro-batch but arrival order
    ACROSS batches: a smaller-id document landing in a later batch packs
    after larger-id documents from earlier batches, so results match the
    batch operator only when each shard's documents arrive in id order.
    The final partial sequence of a stream is never emitted (it is never
    full) — the batch operator is the end-of-corpus authority; this
    operator exists for unbounded ingest where "full" is the only closure
    signal.

    Scale: one state row per SHARD (a handful of aggregates), not per
    sequence — state is O(shards), emission is append-only, and shards
    partition the work exactly like the batch operator's id-chunks."""
    import pandas as pd  # local: executors resolve by name

    key_type = stream.schema[shard_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(shard_col, key_type),
            T.StructField("seq_id", T.LongType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_starts", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("offset", T.LongType()),
            T.StructField("open_docs", T.LongType()),
            T.StructField("open_starts", T.LongType()),
        ]
    )

    def fn(key, pdfs, state):
        shard = key[0]
        offset, open_docs, open_starts = state.get if state.exists else (0, 0, 0)
        batches = [pdf for pdf in pdfs]
        if not batches:
            if state.exists:
                state.update((offset, open_docs, open_starts))
            return
        docs = pd.concat(batches).sort_values(id_col)
        closed: list[dict] = []
        for n in docs[tokens_col].astype("int64"):
            if n <= 0:
                continue
            s0, s1 = offset // capacity, (offset + n - 1) // capacity
            # the doc touches [s0, s1]; every one of those but the last is
            # now full and closes (the doc counts toward each; its START
            # belongs to s0 only)
            for s in range(s0, s1):
                closed.append(
                    {
                        shard_col: shard,
                        "seq_id": int(s),
                        "n_docs": int(open_docs + 1),
                        "n_tokens": int(capacity),
                        "n_starts": int(open_starts + (1 if s == s0 else 0)),
                    }
                )
                open_docs, open_starts = 0, 0
            open_docs += 1  # the doc rides into the (new) open sequence s1
            if s1 == s0:
                open_starts += 1
            offset += int(n)
            if offset % capacity == 0:  # doc ends exactly on a boundary
                closed.append(
                    {
                        shard_col: shard,
                        "seq_id": int(offset // capacity - 1),
                        "n_docs": int(open_docs),
                        "n_tokens": int(capacity),
                        "n_starts": int(open_starts),
                    }
                )
                open_docs, open_starts = 0, 0
        state.update((offset, open_docs, open_starts))
        if closed:
            yield pd.DataFrame(closed)

    return (
        stream.groupBy(shard_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", "NoTimeout")
    )


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch broadcast-joins the
    static dimension snapshot (SURVEY S6/J1's streaming form — e.g. pose
    stream x experiment-metadata). Stream-static joins need no watermark and
    keep no join state; the dim is re-resolved per micro-batch, so a catalog
    table picks up slowly-changing updates between batches."""
    return stream.join(F.broadcast(dim), on, how)


def stream_check_constraints(
    stream: DataFrame,
    rules: list[dict],
    out_path: str,
    fast_unique: bool = False,
):
    """Ingest-time data-quality monitoring: evaluate a declarative
    constraint suite (operators/validation.py:check_constraints — one
    aggregation, N rules, no UDF) on EVERY micro-batch and append
    ``(batch_id, rule, metric, passed)`` rows to a parquet audit sink.

    ``fast_unique=True`` switches ``unique`` rules to the
    ``check_constraints_fast`` path (approx_count_distinct in the same
    single scan, exact confirmation only on a suspected violation) — the
    right default for monitoring CADENCES on wide streams, where the
    happy path then never pays an exact count-distinct per micro-batch;
    the documented 3*rsd tolerance applies (validation.py).

    Returns the configured ``DataStreamWriter`` (caller adds checkpoint/
    trigger and ``.start()``). ``batch_id`` comes from foreachBatch, so a
    restart that replays a batch writes rows with the same id — downstream
    readers dedup on (batch_id, rule) for exactly-once audit semantics.
    This is the streaming face of the same suite the batch gate runs: the
    reference's pre-flight asserts (2-identity check) become continuous
    monitors at ingest."""
    from ..operators.validation import check_constraints, check_constraints_fast

    check = check_constraints_fast if fast_unique else check_constraints

    def _run(batch_df: DataFrame, batch_id: int) -> None:
        (
            check(batch_df, rules)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return stream.writeStream.foreachBatch(_run)


def stream_asof_enrich(
    stream: DataFrame,
    static: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    on: str = "time",
    by: str | list[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
):
    """Stream-static AS-OF enrichment (SURVEY J2's streaming form — e.g.
    live pose rows ← most recent experiment/config state at or before each
    row's timestamp).

    Window functions aren't allowed on unbounded streams, so the as-of runs
    inside ``foreachBatch``: each micro-batch is a plain DataFrame,
    ``asof_join``-ed against the static snapshot and handed to ``batch_fn``
    (write, upsert, publish…). Per-batch cost is the batch's own union-tag
    window — the static side is re-resolved every batch, so slowly-changing
    reference tables are picked up between triggers.

    Returns a ``DataStreamWriter`` — caller picks trigger/checkpoint and
    calls ``.start()``."""
    from ..operators.temporal import asof_join

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        enriched = asof_join(
            batch_df, static, on=on, by=by, tolerance=tolerance, direction=direction
        )
        batch_fn(enriched, batch_id)

    return stream.writeStream.foreachBatch(_process)
