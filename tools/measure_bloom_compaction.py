"""Point-read sidecar GETs vs COMMIT COUNT — the r13 VERDICT's top item
measured: the write path emits one consolidated bloomset per commit, so a
micro-commit streaming store (5-minute batches for a year ≈ 100k commits)
decays the point read back to O(commits) GETs even though each GET is
small. compact_bloomsets() must restore GETs = O(live files /
target_members), independent of commit history.

Protocol: synthesize a REAL manifest store of N micro-commits (one
parquet data file + one bloomset object + one manifest_commit each —
the exact byte layout write_manifested produces, built driver-side so a
1k-commit store takes seconds, not a Spark job per commit). Then:

  (a) point read of one id — record _BLOOM_GETS and wall time, 3 reps
      median, with sinks._SIDECAR_LATENCY_S injecting a per-GET delay
      (default 30 ms — an S3 GET first-byte RTT) so the local fixture
      is latency-shaped like an object store (same discipline as
      tools/measure_cdc_latency.py);
  (b) compact_bloomsets(target_members) — record its report + wall;
  (c) the same point read again — GETs must be ceil(files/target) and
      the injected-latency wall must collapse accordingly.

Also records the SERIAL projection (gets × latency) on both sides: the
driver pools GETs 16-wide, so wall ≈ gets/16 × latency; the serial
number is the per-GET bound a 1-connection client would pay.

Run ISOLATED per the bench protocol. Writes
bench_runs_r14/bloom_compaction.json.
Usage: python tools/measure_bloom_compaction.py [commits=1024]
       [rows_per=64] [target_members=512] [latency_ms=30]
"""

import base64
import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.sources import sinks  # noqa: E402
from aeon_sleap_processing_spark.sources.sinks import (  # noqa: E402
    _BLOOM_K,
    _bloom_positions_py,
    compact_bloomsets,
    manifest_commit,
    read_manifested,
)

M_BITS = 1 << 17


def _synth_commit(spark, store: str, i: int, rows_per: int) -> None:
    """One micro-commit: a real parquet file, a real one-member bloomset
    object, one manifest_commit — byte-identical to what
    write_manifested(bloom_cols=["id"]) leaves behind for a 1-file
    batch."""
    lo = i * rows_per
    ids = list(range(lo, lo + rows_per))
    rel = f"data-synth-{i:05d}.parquet"
    fp = os.path.join(store, rel)
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), fp)
    bits = bytearray(M_BITS >> 3)
    for v in ids:
        for p in _bloom_positions_py(v, M_BITS):
            bits[p >> 3] |= 1 << (p & 7)
    obj = f"_index/bloomset-{uuid.uuid4().hex}.json"
    os.makedirs(os.path.join(store, "_index"), exist_ok=True)
    with open(os.path.join(store, obj), "w") as f:
        json.dump({
            "m": M_BITS, "k": _BLOOM_K,
            "files": {rel: {"id": base64.b64encode(bytes(bits)).decode()}},
        }, f)
    manifest_commit(
        spark, store,
        add=[(rel, os.path.getsize(fp), None, f"{obj}#{rel}")],
    )


def _point_read(spark, store: str, target: int, latency_s: float) -> dict:
    ts = []
    gets = None
    for _ in range(3):
        sinks._SIDECAR_LATENCY_S = latency_s
        before = dict(sinks._BLOOM_GETS)
        t0 = time.perf_counter()
        try:
            hit = read_manifested(spark, store, point={"id": target})
            n = hit.where(f"id = {target}").count()
        finally:
            sinks._SIDECAR_LATENCY_S = 0.0
        ts.append(time.perf_counter() - t0)
        assert n == 1, n
        gets = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
        files_scanned = len(hit.inputFiles())
    return {
        "sidecar_gets": gets,
        "files_scanned": files_scanned,
        "wall_s_median": round(statistics.median(ts), 3),
        "serial_projection_s": round(gets["objects"] * latency_s, 3),
    }


def main():
    commits = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    target = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    latency_s = (float(sys.argv[4]) if len(sys.argv) > 4 else 30.0) / 1e3
    spark = get_spark(app_name="measure-bloom-compaction",
                      shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="bloom_compact_")
    store = os.path.join(root, "s")
    os.makedirs(store)
    try:
        t0 = time.perf_counter()
        for i in range(commits):
            _synth_commit(spark, store, i, rows_per)
        build_s = time.perf_counter() - t0
        point = (commits // 2) * rows_per + 7
        pre = _point_read(spark, store, point, latency_s)
        t0 = time.perf_counter()
        rep = compact_bloomsets(spark, store, target_members=target)
        compact_s = time.perf_counter() - t0
        post = _point_read(spark, store, point, latency_s)
        rerun = compact_bloomsets(spark, store, target_members=target)
        out = {
            "commits": commits,
            "rows_per_commit": rows_per,
            "target_members": target,
            "injected_latency_ms_per_get": latency_s * 1e3,
            "store_build_s": round(build_s, 1),
            "point_read_before": pre,
            "compact_report": {k: v for k, v in rep.items()},
            "compact_wall_s": round(compact_s, 2),
            "point_read_after": post,
            "idempotent_rerun_repacked": rerun["repacked_rels"],
            "note": (
                "GETs are the number that matters: before = one bloomset "
                "object per COMMIT (O(commits) GETs, the micro-commit "
                "decay), after = ceil(files/target_members) objects. "
                "Wall is latency-shaped at the injected per-GET delay "
                "(driver pools GETs 16-wide); serial_projection_s is "
                "gets x latency, the 1-connection bound."
            ),
        }
        os.makedirs(os.path.join(REPO, "bench_runs_r14"), exist_ok=True)
        dest = os.path.join(REPO, "bench_runs_r14", "bloom_compaction.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
