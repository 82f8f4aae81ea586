"""Row-level DML + bloom sidecars at a NON-TOY file count (r11 VERDICT
task 5): the 100 TB story for the DML paths was extrapolated from
128-file stores; this measures it at 10k+ files across 16 Hive
partitions, on ONE store:

  (a) GDPR point-delete (`delete_manifested` with a bloom-bounded
      predicate): wall time, files rewritten, candidate files the bloom
      pass let through;
  (b) MERGE on a skewed key: every 5th row of partition p=0 shares one
      hot `host` value — the merge's match scan is O(store) (no
      stats/bloom on host, the honest worst case) but the REWRITE must
      stay bounded by the files that contain the key (p=0's files
      only);
  (c) bloom-bounded 100-key MERGE on the bloom'd `doc_id` column — the
      relabel-these-documents shape; candidates bound by sidecar tests;
  (d) sidecar read amplification for one point lookup: total sidecar
      bytes tested vs data bytes NOT scanned because of them;
  plus the build itself (files/sec through write_manifested) and a
  1-file append's commit cost at head (the O(head) resolve claim at
  10k files).

Writes bench_runs_r12/dml_scale.json. Run ISOLATED per the bench
protocol.
Usage: python tools/measure_dml_scale.py [files=10240] [rows_per_file=2000]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.sources import sinks  # noqa: E402
from aeon_sleap_processing_spark.sources.sinks import (  # noqa: E402
    delete_manifested, merge_manifested, read_manifested,
    write_manifested,
)

N_PARTS = 16


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_240
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    files_per_part = n_files // N_PARTS
    spark = get_spark(app_name="measure-dml-scale", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="dml_scale_")
    store = os.path.join(root, "s")
    out = {"protocol": {
        "files": n_files, "rows_per_file": rows, "partitions": N_PARTS,
        "stats_cols": ["id"], "bloom_cols": ["doc_id"],
        "skew": "p=0: every 5th row host='host-hot'",
    }}
    try:
        t_build = time.perf_counter()
        for p in range(N_PARTS):
            lo = p * files_per_part * rows
            hi = lo + files_per_part * rows
            df = (
                spark.range(lo, hi)
                .withColumn("doc_id", F.format_string("doc-%09d", "id"))
                .withColumn(
                    "host",
                    F.when(
                        (F.lit(p) == 0) & (F.pmod("id", F.lit(5)) == 0),
                        F.lit("host-hot"),
                    ).otherwise(F.format_string("host-%09d", "id")),
                )
                .withColumn("p", F.lit(p))
                .repartitionByRange(files_per_part, "id")
            )
            write_manifested(
                spark, df, store, partition_by=["p"],
                stats_cols=["id"], bloom_cols=["doc_id"],
            )
        build_sec = time.perf_counter() - t_build
        out["build"] = {
            "sec": round(build_sec, 1),
            "files_per_sec": round(n_files / build_sec, 1),
        }
        print("built:", out["build"], flush=True)

        # commit cost at head: one 1-file append against the 10k store
        one = spark.range(10**9, 10**9 + 10).withColumn(
            "doc_id", F.format_string("doc-%09d", "id")
        ).withColumn("host", F.lit("x")).withColumn(
            "p", F.lit(0)
        ).coalesce(1)
        t0 = time.perf_counter()
        write_manifested(spark, one, store, partition_by=["p"],
                         stats_cols=["id"], bloom_cols=["doc_id"])
        out["append_1file_sec"] = round(time.perf_counter() - t0, 3)

        # (d)+(a) — point lookup then GDPR delete of one doc_id
        target = f"doc-{(n_files // 2) * rows + 7:09d}"
        gets0 = dict(sinks._BLOOM_GETS)
        t0 = time.perf_counter()
        hit = read_manifested(spark, store, point={"doc_id": target})
        n = hit.where(F.col("doc_id") == target).count()
        point_read_sec = time.perf_counter() - t0
        files_scanned = len(hit.inputFiles())
        assert n == 1, n
        sidecar_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs_ in os.walk(os.path.join(store, "_index"))
            for f in fs_
        )
        data_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs_ in os.walk(store)
            for f in fs_
            if f.endswith(".parquet")
        )
        out["bloom_point_read"] = {
            "sec": round(point_read_sec, 2),
            "files_scanned": files_scanned,
            "files_total": n_files + 1,
            # r13: consolidated bloomsets — GETs are O(commits), not
            # O(files); r12 measured 10,241 per-file sidecar reads here
            "sidecar_gets": {
                k: sinks._BLOOM_GETS[k] - gets0[k]
                for k in sinks._BLOOM_GETS
            },
            "sidecar_bytes_tested": sidecar_bytes,
            "data_bytes_avoided": data_bytes,
            "read_amplification_vs_fullscan": round(
                sidecar_bytes / max(1, data_bytes), 4
            ),
        }
        print("point read:", out["bloom_point_read"], flush=True)

        t0 = time.perf_counter()
        dres = delete_manifested(
            spark, store, f"doc_id = '{target}'",
            point={"doc_id": target},
        )
        out["gdpr_point_delete"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "files_rewritten": dres["files_rewritten"],
            "rows_deleted": dres["rows_deleted"],
            "files_scanned": dres["files_scanned"],
        }
        print("gdpr delete:", out["gdpr_point_delete"], flush=True)

        # (c) bloom-bounded 100-key merge on doc_id
        stride = (n_files * rows) // 100  # one key per ~1% of the store
        keys = [f"doc-{i * stride + 7:09d}" for i in range(100)]
        upd = spark.createDataFrame(
            [(k, "relabeled") for k in keys], "doc_id string, host string"
        )
        t0 = time.perf_counter()
        mres = merge_manifested(spark, upd, store, "doc_id")
        out["merge_100_keys_bloom"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "files_rewritten": mres["files_rewritten"],
            "rows_matched": mres["rows_matched"],
            "files_scanned": mres["files_scanned"],
        }
        print("100-key merge:", out["merge_100_keys_bloom"], flush=True)

        # (b) skewed-key merge: one hot host value, present in every
        # p=0 file (match scan O(store): no stats/bloom on host;
        # rewrite bounded by p=0's files)
        upd = spark.createDataFrame(
            [("host-hot", "doc-hot-replacement", 0)],
            "host string, doc_id string, p int",
        )
        t0 = time.perf_counter()
        mres = merge_manifested(spark, upd, store, "host")
        out["merge_skewed_hot_key"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "files_rewritten": mres["files_rewritten"],
            "rows_matched": mres["rows_matched"],
            "files_scanned": mres["files_scanned"],
            "note": "match scan is O(store) without stats/bloom on the "
                    "key; rewrite bounded by the hot key's files "
                    f"(p=0 holds {files_per_part} of {n_files})",
        }
        print("skewed merge:", out["merge_skewed_hot_key"], flush=True)

        # (b2) the r12 VERDICT escape hatch: the SAME hot key merged
        # with prefixes=["p=0/"] — the match scan is bounded to the
        # partition the caller knows the key lives in, not the store
        upd = spark.createDataFrame(
            [("host-hot", "doc-hot-2", 0)],
            "host string, doc_id string, p int",
        )
        t0 = time.perf_counter()
        mres = merge_manifested(
            spark, upd, store, "host", prefixes=["p=0/"]
        )
        out["merge_skewed_hot_key_prefixed"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "files_rewritten": mres["files_rewritten"],
            "rows_matched": mres["rows_matched"],
            "files_scanned": mres["files_scanned"],
            "note": "same key, match scan bounded by prefixes=['p=0/'] "
                    f"to the hot partition's {mres['files_scanned']} "
                    f"current files (leg (b)'s rewrite compacted p=0) "
                    f"instead of the whole store",
        }
        print("skewed merge (prefixed):",
              out["merge_skewed_hot_key_prefixed"], flush=True)

        outdir = os.path.join(
            REPO, os.environ.get("BENCH_AB_OUTDIR", "bench_runs_r13")
        )
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, "dml_scale.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", path)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
