"""`manifest_cdc` — a PySpark Python DataSource (Spark 4 API) that turns a
manifest-committed store into a first-class Structured Streaming SOURCE:

    spark.dataSource.register(ManifestCDCDataSource)
    df = spark.readStream.format("manifest_cdc").load(store_path)

Offsets ARE manifest versions, so Spark's own offset log gives exactly-once
across restarts with no separate cursor file; each micro-batch is the
store's data-change delta under the same rules as
:func:`~..sources.sinks.read_manifested_changes` (maintenance rewrites
invisible; replaced files cancel; the first batch is the initial
snapshot). Unlike the directory-listing file source this never re-consumes
a compaction/fold/OPTIMIZE output — and unlike
:func:`~.watch.watch_manifested` it composes with watermarks, windowed
aggregations and `applyInPandasWithState` downstream, because it IS a
stream source, not a polling loop.

Implementation notes — the driver/executor halves of a Python DataSource
run OUTSIDE the JVM (no Hadoop FileSystem), so this module re-reads the
manifest JSON contract with :class:`_IO`: plain-Python ``os`` I/O for
local paths (the fast path — no FFI per stat) and ``pyarrow.fs`` for
everything else, resolved from the URI scheme (``s3://``, ``hdfs://``,
``gs://`` — whatever pyarrow's handlers support), so the source reaches
the same object stores the JVM writer commits to. ``option("io",
"pyarrow")`` forces the pyarrow path even for local roots — the test
hook proving the abstraction is real. The log format itself is the
contract (sinks.py's checkpoint+delta docs); this mirror is deliberately
tiny.

Partition columns come from the log: commits record partition-column
NAMES (``parts``) and the store's running-union schema carries their
write-time TYPES (``df.schema`` includes partition columns, unlike the
data-file footers Spark strips them from), so dir-derived values are
cast to their true types. Only a pre-upgrade store (no schema doc in the
log) falls back to probing one file's Hive dir segments and guessing
Long-vs-String."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MANIFEST_DIR = "_manifests"


def _localize(path: str) -> str:
    if path.startswith("file://"):
        path = path[len("file://"):]
    elif path.startswith("file:"):
        path = path[len("file:"):]
    return path


class _IO:
    """Filesystem shim for the non-JVM halves of the source. ``fs`` is
    None for the plain-``os`` local fast path, else a
    ``pyarrow.fs.FileSystem`` resolved from the root URI — the same
    object ``pyarrow.parquet`` accepts as ``filesystem=``, so log reads
    and data reads go through one abstraction. Constructed per (root,
    io) and cached per process (driver once; each executor worker once —
    S3/HDFS clients are connection pools worth reusing across
    micro-batches)."""

    def __init__(self, root: str, io: str = "auto"):
        scheme = root.split(":", 1)[0] if ":" in root else ""
        local = scheme in ("", "file") or "/" in scheme
        if io == "mock":
            # test hook one level beyond option("io","pyarrow"): a
            # "mock://<abs-path>" URI that resolves ONLY while its
            # scheme is attached (to LocalFileSystem under the hood) —
            # simulating an object store whose paths are meaningless
            # once the scheme is stripped. Tests drain through this to
            # prove the ORIGINAL URI reaches the executors: shipping a
            # from_uri-stripped root ('bucket/key') would raise here
            # instead of silently reading a coincidental local path.
            import pyarrow.fs as pafs

            if "://" not in root:
                raise ValueError(
                    f"io='mock' requires a scheme-bearing root URI, got "
                    f"{root!r} — a scheme-stripped path cannot be "
                    f"re-resolved to its filesystem"
                )
            self.fs = pafs.LocalFileSystem()
            self.root = (
                "/" + root.split("://", 1)[1].lstrip("/")
            ).rstrip("/")
        elif local and io != "pyarrow":
            self.fs = None
            self.root = _localize(root).rstrip("/")
        elif local:
            # forced-pyarrow on a local root: construct LocalFileSystem
            # directly — from_uri demands a strictly-encoded URI and a
            # root with a space/% would need round-trip quoting
            import pyarrow.fs as pafs

            self.fs = pafs.LocalFileSystem()
            self.root = os.path.abspath(_localize(root)).rstrip("/")
        else:
            import pyarrow.fs as pafs

            self.fs, self.root = pafs.FileSystem.from_uri(root)
            self.root = self.root.rstrip("/")

    def listdir(self, path: str) -> list[str]:
        if self.fs is None:
            return os.listdir(path) if os.path.isdir(path) else []
        import pyarrow.fs as pafs

        sel = pafs.FileSelector(path, allow_not_found=True)
        return [i.base_name for i in self.fs.get_file_info(sel)]

    def read_bytes(self, path: str) -> bytes:
        if self.fs is None:
            with open(path, "rb") as f:
                return f.read()
        with self.fs.open_input_stream(path) as f:
            return f.read()


_IO_CACHE: dict = {}


def _io_for(root: str, io: str = "auto") -> _IO:
    key = (root, io)
    got = _IO_CACHE.get(key)
    if got is None:
        got = _IO_CACHE[key] = _IO(root, io)
    return got


class _ManifestLogMirror:
    """Plain-Python reader of the manifest log (sinks.py writes it): the
    checkpoint+delta replay, valid-doc rule and data-change semantics,
    without a JVM. I/O through :class:`_IO` (local ``os`` or
    ``pyarrow.fs``)."""

    def __init__(self, root: str, io: str = "auto"):
        self.io = _io_for(root, io)
        self.root = self.io.root
        self.mdir = f"{self.root}/{_MANIFEST_DIR}"

    def versions(self) -> list[int]:
        out = []
        for name in self.io.listdir(self.mdir):
            if name.endswith(".json") and name[:-5].isdigit():
                out.append(int(name[:-5]))
        return sorted(out)

    def doc(self, version: int):
        p = f"{self.mdir}/{version:020d}.json"
        try:
            d = json.loads(self.io.read_bytes(p))
        except Exception:
            return None
        if isinstance(d.get("files"), list):
            return d
        if isinstance(d.get("add"), list) and isinstance(
            d.get("removed"), list
        ):
            return d
        return None

    @staticmethod
    def _apply(state: dict, doc: dict) -> dict:
        if isinstance(doc.get("files"), list):
            return {f["path"]: f for f in doc["files"]}
        for p in doc["removed"]:
            state.pop(p, None)
        for f in doc["add"]:
            state[f["path"]] = f
        return state

    def resolve(self, version: int, versions: list[int]) -> dict | None:
        chain = []
        target = self.doc(version)
        if target is None:
            return None
        chain.append(target)
        if "files" not in target:
            for v in reversed([x for x in versions if x < version]):
                d = self.doc(v)
                if d is None:
                    continue
                chain.append(d)
                if "files" in d:
                    break
            else:
                return None
        state: dict = {}
        for d in reversed(chain):
            state = self._apply(state, d)
        return state

    def head_version(self) -> int:
        vs = self.versions()
        for v in reversed(vs):
            if self.doc(v) is not None:
                return v
        return -1

    def changed_files(self, since: int, until: int) -> list[str]:
        """read_manifested_changes' candidate rule, mirrored: initial
        snapshot at `until` for since=-1, else the delta walk with
        data-change removes cancelling pending candidates."""
        versions = self.versions()
        if until <= since:
            return []
        if since < 0:
            state = self.resolve(until, versions)
            if state is None:
                raise RuntimeError(
                    f"manifest v{until} of {self.root} unresolvable"
                )
            return sorted(state)
        bases = [v for v in versions if v <= since]
        state = self.resolve(bases[-1], versions) if bases else None
        if state is None:
            raise RuntimeError(
                f"cursor v{since} of {self.root} predates the retained "
                f"log — reprocess from scratch or raise vacuum "
                f"keep_versions"
            )
        candidates: dict[str, int] = {}
        for v in [x for x in versions if since < x <= until]:
            doc = self.doc(v)
            if doc is None:
                continue
            if isinstance(doc.get("add"), list):
                adds = [f["path"] for f in doc["add"]]
                removed = list(doc["removed"])
            else:
                paths = {f["path"] for f in doc["files"]}
                adds = sorted(paths - set(state))
                removed = sorted(set(state) - paths)
            state = self._apply(state, doc)
            if bool(doc.get("dc", True)):
                for p in adds:
                    candidates[p] = v
                for p in removed:
                    candidates.pop(p, None)
        return list(candidates)


def _partition_cols(rel: str) -> list[tuple[str, str | None]]:
    """Hive dir segments → (name, value) with the JVM reader's decoding:
    escaped chars un-%-escaped (p=c%2Fd → 'c/d') and the default
    partition read back as NULL — without this the python source
    disagrees with read_manifested on any escaped partition value."""
    from urllib.parse import unquote

    out: list[tuple[str, str | None]] = []
    for seg in rel.split("/")[:-1]:
        if "=" not in seg:
            continue
        name, value = seg.split("=", 1)
        out.append(
            (unquote(name),
             None if value == "__HIVE_DEFAULT_PARTITION__" else unquote(value))
        )
    return out


def _const_column(value, n: int, dtype, col_name: str):
    """An n-row Arrow column holding one partition value (a Hive dir
    STRING, or None) at the schema's true type: string-array → cast,
    Arrow's own parser for every type it can read back (ints, floats,
    bools, dates, timestamps, decimals) — not a hand-rolled per-type
    ladder that crashes on the first IntegerType partition column."""
    import pyarrow as pa

    try:
        from pyspark.sql.pandas.types import to_arrow_type

        at = to_arrow_type(dtype)
    except Exception:
        at = pa.string()
    if value is None:
        return pa.nulls(n, type=at)
    src = pa.array([value] * n, type=pa.string())
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return src
    try:
        if pa.types.is_timestamp(at) and at.tz is not None:
            # Hive dir values are NAIVE wall-time strings in the Spark
            # session timezone; the engine pins that to UTC
            # (session.py) and to_arrow_type maps TimestampType to
            # tz=UTC, so assume the target tz rather than demanding a
            # zone offset the dir string never carries
            import pyarrow.compute as pc

            return pc.assume_timezone(
                src.cast(pa.timestamp(at.unit)), at.tz
            )
        return src.cast(at)
    except Exception as e:
        raise ValueError(
            f"partition column {col_name!r}: dir value {value!r} does "
            f"not parse as its recorded type {dtype.simpleString()} "
            f"({e})"
        ) from e


@dataclass
class _FilePartition(InputPartition):
    # `root` is the ORIGINAL store URI exactly as given to load(), NOT
    # the _IO-resolved root: pyarrow's from_uri strips the scheme
    # (s3://bucket/key -> 'bucket/key'), so a resolved root shipped to
    # an executor could not be re-resolved to the same filesystem — the
    # executor's _io_for would see no scheme, take the plain-os local
    # branch, and read a nonexistent (or coincidentally-existing) LOCAL
    # path. Executors re-run the full URI through _io_for themselves.
    root: str
    rel: str
    io: str


class _ManifestCDCStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.io = options.get("io", "auto")
        self.path = options["path"]  # original URI — see _FilePartition
        self.log = _ManifestLogMirror(self.path, self.io)
        self.root = self.log.root
        self.schema = schema
        # option("prefixes", "stream=5/camera=Top/,cell=3/") — the same
        # manifest-side slice pruning as read_manifested_changes
        pre = options.get("prefixes")
        self.prefixes = tuple(
            p for p in (pre.split(",") if pre else []) if p
        ) or None
        # option("starting_version", N) — Delta's startingVersion, with
        # Delta's INCLUSIVE convention: the stream begins with version
        # N's own changes (N=0 is equivalent to the default initial
        # snapshot). Only consulted on a fresh checkpoint (Spark
        # persists the real cursor afterwards). Requires version N-1 to
        # still be resolvable from the retained log.
        self.start_version = int(options.get("starting_version", 0))

    def initialOffset(self) -> dict:
        return {"version": max(self.start_version - 1, -1)}

    def latestOffset(self) -> dict:
        return {"version": self.log.head_version()}

    def partitions(self, start: dict, end: dict):
        rels = self.log.changed_files(start["version"], end["version"])
        if self.prefixes:
            rels = [r for r in rels if r.startswith(self.prefixes)]
        return [_FilePartition(self.path, r, self.io) for r in rels]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        fio = _io_for(partition.root, partition.io)
        table = pq.read_table(
            f"{fio.root}/{partition.rel}", filesystem=fio.fs
        )
        parts = dict(_partition_cols(partition.rel))
        # Arrow-vectorized hand-off (Spark 4 python data sources accept
        # RecordBatch yields — SPARK-48493): no per-row python tuples
        cols, names = [], []
        for f in self.schema.fields:
            names.append(f.name)
            if f.name in table.column_names:
                col = table.column(f.name)
                # Spark's INT96 parquet timestamps read back as Arrow
                # ns, which Spark's Arrow ingestion rejects — down-cast
                # to us (Spark's native unit; same convention as the
                # catalog's nanos handling) so event-time columns flow
                # through watermarks/windows untouched
                t = col.type
                if pa.types.is_timestamp(t) and t.unit == "ns":
                    col = col.cast(pa.timestamp("us", tz=t.tz))
                cols.append(col)
            else:
                # absent from this file: a partition column (value from
                # the dir name, cast to its log-recorded type) or a
                # schema-evolved column this older file predates (NULL —
                # the add-column read semantics). Explicit Arrow type
                # either way: an all-None column must not degrade to
                # the null type.
                cols.append(
                    _const_column(
                        parts.get(f.name), table.num_rows, f.dataType,
                        f.name,
                    )
                )
        yield from pa.table(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the cursor


class ManifestCDCDataSource(DataSource):
    """``spark.readStream.format("manifest_cdc").load(path)`` — see the
    module docstring. Register once per session with
    ``spark.dataSource.register(ManifestCDCDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_cdc"

    def schema(self) -> StructType:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        io = self.options.get("io", "auto")
        log = _ManifestLogMirror(self.options["path"], io)
        versions = log.versions()
        head = log.head_version()
        if head < 0:
            raise FileNotFoundError(
                f"no manifest under {self.options['path']}"
            )
        state = log.resolve(head, versions)
        if not state:
            raise FileNotFoundError(
                f"manifest head of {self.options['path']} lists no files"
            )
        rel = sorted(state)[0]
        # the log records the store's RUNNING-UNION schema on every
        # commit (sinks.manifest_commit schema=) — authoritative on an
        # evolved store, where any single file's footer under-reports
        # columns, and it already CONTAINS the partition columns at
        # their write-time types (the writer's df.schema has them;
        # only the data-file footers don't). Pre-upgrade stores fall
        # back to the footer probe + dir-segment type guessing.
        head_doc = log.doc(head) or {}
        if isinstance(head_doc.get("schema"), dict):
            fields = list(StructType.fromJson(head_doc["schema"]).fields)
        else:
            arrow = pq.read_schema(
                f"{log.root}/{rel}", filesystem=log.io.fs
            )
            fields = list(from_arrow_schema(arrow).fields)
        data_names = {f.name for f in fields}
        for name, value in _partition_cols(rel):
            if name in data_names:
                continue
            # legacy guess — reachable only on a pre-schema-doc store
            dt = (
                LongType()
                if value is not None and value.lstrip("-").isdigit()
                else StringType()  # null (default partition) probes string
            )
            fields.append(
                StructField(name, dt, True, metadata={"hive_part": True})
            )
        return StructType(fields)

    def streamReader(self, schema: StructType):
        return _ManifestCDCStreamReader(schema, self.options)
