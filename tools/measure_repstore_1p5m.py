"""Rep-store layout curve PAST the r10 measurement (r10 VERDICT task #5):
drive stream_semantic_dedup to a ≥1.5M-row representative store through a
REAL multi-batch stream (16 micro-batches of 100k — the store accrues one
batch-dir pair per micro-batch, exactly the dir-listing growth term the
r10 curve left unmeasured past 800k), then time the standard 2,000-vector
probe (the bench_runs_r10/repstore_layout.json protocol) in three states:

  1. grown      — 16 accumulated batch dirs (the long-running-stream state)
  2. folded     — after compact_rep_store (history folded to batch=0)
  3. refolded probe after one more ingest batch (fold + live stream compose)

Both layouts (flat store_partitions=0, bucketed P=16). The claim under
test: bucketed per-batch work tracks (batch keys + colliding cells), so
the probe stays flat from 800k→1.6M except the dir-listing term, which
the fold resets; flat keeps decaying linearly with store size.

Writes bench_runs_r11/repstore_1p5m.json.
Run ISOLATED (no concurrent Spark jobs) per the bench protocol.
Usage: python tools/measure_repstore_1p5m.py [n_batches=16] [rows_per_batch=100000]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.streaming import watch as W  # noqa: E402

DIM = 64
P = 16
N_TABLES = 6
PROBE_ROWS = 2_000
THRESHOLD = 0.95


def _vec_df(spark, start_id: int, n: int, seed: int):
    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                rng_local = np.random.default_rng(seed + lo)
                m = rng_local.standard_normal((hi - lo, DIM))
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(lo, hi, dtype=np.int64),
                        "embedding": list(m.astype(np.float64)),
                    }
                )

    n_slices = 32
    bounds = np.linspace(start_id, start_id + n, n_slices + 1, dtype=np.int64)
    ranges = spark.createDataFrame(
        pd.DataFrame({"lo": bounds[:-1], "hi": bounds[1:]})
    ).repartition(n_slices)
    return ranges.mapInPandas(gen, "vec_id long, embedding array<double>")


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    planes = (
        np.random.default_rng(7).standard_normal((N_TABLES * 16, DIM)).tolist()
    )
    out_doc = {
        "dim": DIM, "n_tables": N_TABLES, "planes": N_TABLES * 16,
        "threshold": THRESHOLD, "n_batches": n_batches,
        "rows_per_batch": per_batch, "probe_rows": PROBE_ROWS,
        "results": [],
    }
    for layout, p in (("flat", 0), ("bucketed", P)):
        work = tempfile.mkdtemp(prefix=f"repstore1p5m_{layout}_")
        out, ckpt, src = f"{work}/out", f"{work}/ckpt", f"{work}/src"

        def drain():
            stream = (
                spark.readStream.schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = W.stream_semantic_dedup(
                stream, out, ckpt, planes, threshold=THRESHOLD,
                n_tables=N_TABLES, store_partitions=p,
            )
            q.awaitTermination(3600)

        # ---- grow the store through the real stream: one file per batch
        for b in range(n_batches):
            _vec_df(
                spark, b * per_batch, per_batch, 2
            ).coalesce(1).write.parquet(f"{src}/f={b}")
        t0 = time.monotonic()
        drain()
        grow_sec = round(time.monotonic() - t0, 1)
        store_rows = W.read_semantic_reps(spark, out).count()

        probe_offsets = {"grown": 0, "folded": 1, "postfold2": 2}

        def probe(tag: str) -> dict:
            _vec_df(
                spark, 50_000_000 + probe_offsets[tag] * 1_000_000,
                PROBE_ROWS, 3,
            ).coalesce(1).write.parquet(f"{src}/f={tag}")
            t0 = time.monotonic()
            drain()
            return {f"probe_{tag}_sec": round(time.monotonic() - t0, 2)}

        res = {
            "layout": layout, "store_rows": int(store_rows),
            "grow_sec": grow_sec,
            "grow_vec_per_sec": round(n_batches * per_batch / grow_sec),
        }
        res.update(probe("grown"))  # state 1: n_batches accumulated dirs
        n_probes = 1
        if p > 0:  # the fold is the bucketed layout's housekeeping op
            t0 = time.monotonic()
            fold = W.compact_rep_store(
                spark, out, planes, n_tables=N_TABLES, store_partitions=p,
            )
            res["fold_sec"] = round(time.monotonic() - t0, 1)
            res["fold_batches_folded"] = fold["batches_folded"]
            res.update(probe("folded"))  # state 2: history folded to batch=0
            res.update(probe("postfold2"))  # state 3: fold + live stream compose
            n_probes = 3
        kept = W.read_semantic_reps(spark, out).count()
        assert kept >= store_rows + n_probes * PROBE_ROWS * 0.9, (layout, kept)
        res["final_rows"] = int(kept)
        out_doc["results"].append(res)
        print(res, flush=True)
        shutil.rmtree(work, ignore_errors=True)
    os.makedirs(f"{REPO}/bench_runs_r11", exist_ok=True)
    path = f"{REPO}/bench_runs_r11/repstore_1p5m.json"
    with open(path, "w") as f:
        json.dump(out_doc, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
