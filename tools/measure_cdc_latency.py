"""CDC stream source I/O chattiness against a latency-shaped filesystem
(r12 VERDICT task 6): the pyarrow path is correctness-proven, but a
per-call latency (an object store's ~10-50 ms/GET) would expose any
per-file stat/open chattiness in the MIRROR WALK — the same class of
issue the r12 O(n²) commit-publish fix caught on the write side.

Counts, per micro-batch planning cycle (latestOffset + partitions):
  - listdir calls (manifest dir listings)
  - read_bytes calls (manifest doc reads)
and, for the per-partition READ path, the filesystem calls one
pq.read_table issues (via a counting pyarrow PyFileSystem handler).

The claim under test: planning calls are O(delta versions + checkpoint
interval) per batch — INDEPENDENT of the store's file count — and a
file read is O(1) opens. With that shape, a drain's wall time on a
30 ms/call store is (calls × 30 ms) + data time, and calls don't grow
with the store.

Writes bench_runs_r13/cdc_latency.json.
Usage: python tools/measure_cdc_latency.py [commits=24] [files_per_commit=48]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LATENCY_S = 0.030  # per-call injected latency (S3-ish GET)


class CountingIO:
    """Wraps a cdc_source._IO: counts calls, injects per-call latency."""

    def __init__(self, inner, latency=0.0):
        self.inner = inner
        self.latency = latency
        self.fs = inner.fs
        self.root = inner.root
        self.calls = {"listdir": 0, "read_bytes": 0}

    def listdir(self, path):
        self.calls["listdir"] += 1
        if self.latency:
            time.sleep(self.latency)
        return self.inner.listdir(path)

    def read_bytes(self, path):
        self.calls["read_bytes"] += 1
        if self.latency:
            time.sleep(self.latency)
        return self.inner.read_bytes(path)

    def snap(self):
        c = dict(self.calls)
        self.calls = {k: 0 for k in self.calls}
        return c


def counting_pyarrow_fs(base_dir):
    """A pyarrow PyFileSystem that delegates to LocalFileSystem and
    counts get_file_info / open calls — what pq.read_table actually
    issues per file on an object store."""
    import pyarrow.fs as pafs

    counts = {"get_file_info": 0, "open_input_file": 0,
              "open_input_stream": 0}

    class Handler(pafs.FileSystemHandler):
        def __init__(self):
            self._fs = pafs.LocalFileSystem()

        def get_type_name(self):
            return "counting-local"

        def __eq__(self, other):
            return isinstance(other, Handler)

        def __ne__(self, other):
            return not isinstance(other, Handler)

        def get_file_info(self, paths):
            counts["get_file_info"] += 1
            return self._fs.get_file_info(paths)

        def get_file_info_selector(self, selector):
            counts["get_file_info"] += 1
            return self._fs.get_file_info(selector)

        def open_input_file(self, path):
            counts["open_input_file"] += 1
            return self._fs.open_input_file(path)

        def open_input_stream(self, path):
            counts["open_input_stream"] += 1
            return self._fs.open_input_stream(path)

        def normalize_path(self, path):
            return self._fs.normalize_path(path)

        # unused surfaces — delegate where harmless, refuse writes
        def create_dir(self, path, recursive):
            raise NotImplementedError

        def delete_dir(self, path):
            raise NotImplementedError

        def delete_dir_contents(self, path, missing_dir_ok=False):
            raise NotImplementedError

        def delete_root_dir_contents(self):
            raise NotImplementedError

        def delete_file(self, path):
            raise NotImplementedError

        def move(self, src, dest):
            raise NotImplementedError

        def copy_file(self, src, dest):
            raise NotImplementedError

        def open_output_stream(self, path, metadata):
            raise NotImplementedError

        def open_append_stream(self, path, metadata):
            raise NotImplementedError

    return pafs.PyFileSystem(Handler()), counts


def main():
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources.sinks import write_manifested
    from aeon_sleap_processing_spark.streaming.cdc_source import (
        _IO, _ManifestLogMirror,
    )

    spark = get_spark(app_name="measure-cdc-latency", shuffle_partitions=16)
    root = tempfile.mkdtemp(prefix="cdc_lat_")
    store = os.path.join(root, "s")
    out = {"protocol": {
        "commits": n_commits, "files_per_commit": files_per,
        "total_files": n_commits * files_per,
        "injected_latency_ms_per_call": LATENCY_S * 1000,
    }}
    try:
        rows_per = files_per * 100
        for c in range(n_commits):
            lo = c * rows_per
            write_manifested(
                spark,
                spark.range(lo, lo + rows_per)
                .repartitionByRange(files_per, "id"),
                store,
            )
        spark.stop()  # everything below is plain-Python (the mirror)

        mirror = _ManifestLogMirror(store, io="pyarrow")
        cio = CountingIO(mirror.io, latency=0.0)
        mirror.io = cio

        # --- planning cycle 1: fresh consumer, initial snapshot ---
        head = mirror.head_version()
        rels = mirror.changed_files(-1, head)
        snap_calls = cio.snap()
        out["plan_initial_snapshot"] = {
            "files_delivered": len(rels),
            "calls": snap_calls,
            "projected_sec_at_30ms": round(
                sum(snap_calls.values()) * LATENCY_S, 2
            ),
        }

        # --- steady-state: one new commit per batch, B batches ---
        # (reuse the log: plan (v, v+1] for each retained version — the
        # exact walk latestOffset+partitions does per micro-batch)
        per_batch = []
        for v in range(0, head):
            mirror.head_version()      # latestOffset
            mirror.changed_files(v, v + 1)  # partitions
            per_batch.append(sum(cio.snap().values()))
        out["plan_per_incremental_batch"] = {
            "batches": len(per_batch),
            "calls_min": min(per_batch),
            "calls_max": max(per_batch),
            "calls_mean": round(sum(per_batch) / len(per_batch), 1),
            "projected_sec_at_30ms_worst": round(
                max(per_batch) * LATENCY_S, 2
            ),
            "note": "bounded by delta versions + checkpoint interval, "
                    "independent of the store's file count",
        }

        # --- the read path: calls per file for pq.read_table ---
        import pyarrow.parquet as pq

        cfs, counts = counting_pyarrow_fs(root)
        one_rel = sorted(rels)[0]
        t0 = time.perf_counter()
        tbl = pq.read_table(f"{store}/{one_rel}", filesystem=cfs)
        out["read_one_file"] = {
            "rows": tbl.num_rows,
            "fs_calls": dict(counts),
            "note": "per-partition read() cost on an object store: "
                    "O(1) calls per file",
        }

        # --- a real latency-shaped drain of the mirror walk ---
        lat = CountingIO(_IO(store, io="pyarrow"), latency=LATENCY_S)
        m2 = _ManifestLogMirror.__new__(_ManifestLogMirror)
        m2.io = lat
        m2.root = lat.root
        m2.mdir = f"{lat.root}/_manifests"
        t0 = time.perf_counter()
        h2 = m2.head_version()
        m2.changed_files(-1, h2)
        out["snapshot_plan_wall_sec_at_30ms"] = round(
            time.perf_counter() - t0, 2
        )
        out["verdict"] = (
            "planning calls per batch do not scale with file count; "
            "see calls_max vs total_files"
        )

        outdir = os.path.join(
            REPO, os.environ.get("BENCH_AB_OUTDIR", "bench_runs_r13")
        )
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, "cdc_latency.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
        print("wrote", path)
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
