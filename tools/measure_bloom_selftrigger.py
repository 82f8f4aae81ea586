"""r15 (r14 VERDICT task 1 artifact): the bloom_compaction measurement
RE-MEASURED THROUGH THE SINK PATH — 256 real micro-commits through
stream_append_compacted (manifest protocol, maxFilesPerTrigger=1, one
source file per batch), two legs:

  - decay leg:  bloom_cols on, compact_blooms_every=None — the pre-r15
    state: one bloomset object per commit, point reads pay O(commits)
    GETs until an EXTERNAL maintain() runs.
  - trigger leg: compact_blooms_every=64 — the version-cadence inline
    compaction; point-read GETs must end bounded by the cadence rule
    (ceil(live/512) compacted objects + at most 63 fresh commits since
    the last trigger), with NO maintain() call anywhere.

Each leg records: total sink wall (the inline trigger's cost rides the
stream — it must be noise), per-commit mean, point-read GETs and
latency-shaped wall at 30 ms/GET (the S3 first-byte discipline of
measure_bloom_compaction), and the serial 1-connection projection.

Run ISOLATED per the bench protocol. Writes
bench_runs_r15/bloom_selftrigger_sink.json.
Usage: python tools/measure_bloom_selftrigger.py [commits=256] [every=64]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.sources import sinks  # noqa: E402
from aeon_sleap_processing_spark.sources.sinks import read_manifested  # noqa: E402
from aeon_sleap_processing_spark.streaming.watch import (  # noqa: E402
    stream_append_compacted,
)

LATENCY_S = 0.030


def _point_read(spark, store: str, point_id: int) -> dict:
    walls = []
    try:
        sinks._SIDECAR_LATENCY_S = LATENCY_S
        for _ in range(3):
            before = dict(sinks._BLOOM_GETS)
            t0 = time.perf_counter()
            hit = read_manifested(spark, store, point={"id": point_id})
            n = hit.where(f"id = {point_id}").count()
            walls.append(time.perf_counter() - t0)
            gets = {k: sinks._BLOOM_GETS[k] - before[k] for k in before}
            assert n == 1, (point_id, n)
    finally:
        sinks._SIDECAR_LATENCY_S = 0.0
    return {
        "gets": gets,
        "files_scanned": len(hit.inputFiles()),
        "wall_s_median": round(sorted(walls)[1], 3),
        "serial_projection_s": round(gets["objects"] * LATENCY_S, 3),
    }


def _leg(spark, src: str, commits: int, every) -> dict:
    root = tempfile.mkdtemp(prefix="bloom_trig_")
    out, ckpt = os.path.join(root, "store"), os.path.join(root, "ckpt")
    try:
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = stream_append_compacted(
            stream, out, ckpt, compact_every=0,  # no folds: pure decay case
            bloom_cols=["id"], compact_blooms_every=every,
        )
        q.awaitTermination(3600)
        wall = time.perf_counter() - t0
        assert read_manifested(spark, out).count() == commits * 8
        pr = _point_read(spark, out, commits * 4 + 3)
        return {
            "compact_blooms_every": every,
            "sink_wall_s": round(wall, 1),
            "per_commit_s": round(wall / commits, 3),
            "point_read": pr,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    commits = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="measure-bloom-selftrigger",
                      shuffle_partitions=8)
    src_root = tempfile.mkdtemp(prefix="bloom_trig_src_")
    src = os.path.join(src_root, "src")
    try:
        for i in range(commits):
            (
                spark.range(i * 8, (i + 1) * 8).coalesce(1)
                .write.mode("append").parquet(src)
            )
        decay = _leg(spark, src, commits, None)
        trig = _leg(spark, src, commits, every)
        cadence_bound = 1 + (every - 1)  # ceil(live/512)=1 + fresh tail
        out = {
            "commits": commits,
            "rows_per_commit": 8,
            "injected_latency_ms_per_get": LATENCY_S * 1e3,
            "decay_leg": decay,
            "trigger_leg": trig,
            "cadence_get_bound": cadence_bound,
            "trigger_overhead_pct": round(
                100.0 * (trig["sink_wall_s"] / decay["sink_wall_s"] - 1), 1
            ),
            "note": (
                "decay leg GETs == commits (one bloomset per commit); "
                "trigger leg GETs <= 1 + (every-1) with zero maintain() "
                "calls — the O(commits) decay path is closed at the sink. "
                "trigger_overhead_pct is the inline compaction's total "
                "tax on the stream (4 compactions / 256 commits)."
            ),
        }
        assert decay["point_read"]["gets"]["objects"] == commits, decay
        assert trig["point_read"]["gets"]["objects"] <= cadence_bound, trig
        os.makedirs(os.path.join(REPO, "bench_runs_r15"), exist_ok=True)
        dest = os.path.join(REPO, "bench_runs_r15",
                            "bloom_selftrigger_sink.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
    finally:
        shutil.rmtree(src_root, ignore_errors=True)


if __name__ == "__main__":
    main()
