"""Streaming semantic-dedup rep-store layout A/B: per-batch wall as a
function of store size, flat (pre-r10, store_partitions=0) vs bucketed
two-tier (r10 default).

The r9 VERDICT finding: the flat layout re-reads AND re-hashes the whole
rep store every micro-batch (bucket UDF over every stored vector), so
throughput decays linearly with store size. The bucketed layout stores
LSH keys once at write time (repkeys/ tier) and prunes both tiers to the
cells the batch can collide with — per-batch cost should track the
batch, not the store.

Protocol (per layout x store size): seed reps/batch=0 (+ repkeys for the
bucketed layout) DIRECTLY in the target layout with N random vectors,
run one warm-up micro-batch through stream_semantic_dedup to initialize
the checkpoint, then time ONE 2,000-vector probe micro-batch end-to-end
(query start -> availableNow drain). Random near-orthogonal vectors at
threshold 0.95 keep genuine collisions rare, isolating the scan/hash
cost the layout governs. Writes bench_runs_r10/repstore_layout.json.

Run ISOLATED (no concurrent Spark jobs) per the bench protocol.
Usage: python tools/measure_repstore_layout.py
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
from pyspark.sql import functions as F  # noqa: E402

from aeon_sleap_processing_spark.operators import similarity as sim  # noqa: E402
from aeon_sleap_processing_spark.session import get_spark  # noqa: E402
from aeon_sleap_processing_spark.streaming import watch as W  # noqa: E402

DIM = 64
P = 16
N_TABLES = 6
PLANES_SEED = 7
STORE_SIZES = [50_000, 200_000, 800_000]
PROBE_ROWS = 2_000
THRESHOLD = 0.95


def _vec_df(spark, start_id: int, n: int, seed: int):
    """n random unit-ish vectors as (vec_id, embedding) — generated in
    Arrow batches executor-side, never via driver createDataFrame."""

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


def seed_store(spark, out, vecs, planes, bucketed: bool):
    reps0 = f"{out}/reps/batch=0"
    if not bucketed:
        vecs.write.mode("append").parquet(reps0)
        return
    bucket = sim._bucket_udf(sim._split_tables(planes, N_TABLES))
    (
        vecs.withColumn("vp", F.pmod(F.xxhash64("vec_id"), F.lit(P)))
        .repartition(F.col("vp"))
        .write.partitionBy("vp")
        .mode("append")
        .parquet(reps0)
    )
    (
        vecs.select(
            "vec_id", F.posexplode(bucket(F.col("embedding"))).alias("t", "h")
        )
        .withColumn("hp", F.pmod(F.col("h"), F.lit(P)))
        .repartition(F.col("t"), F.col("hp"))
        .write.partitionBy("t", "hp")
        .mode("append")
        .parquet(f"{out}/repkeys/batch=0")
    )


def main():
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    planes = (
        np.random.default_rng(PLANES_SEED)
        .standard_normal((N_TABLES * 16, DIM))
        .tolist()
    )
    results = []
    for n_store in STORE_SIZES:
        for layout, p in (("flat", 0), ("bucketed", P)):
            work = tempfile.mkdtemp(prefix=f"repstore_{layout}_{n_store}_")
            out, ckpt, src = f"{work}/out", f"{work}/ckpt", f"{work}/src"
            # warm-up file (batch 0: 100 rows) + probe file (batch 1)
            _vec_df(spark, 10_000_000, 100, 1).coalesce(1).write.parquet(
                f"{src}/f=0"
            )

            def run_once():
                stream = (
                    spark.readStream.schema("vec_id long, embedding array<double>")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                )
                q = W.stream_semantic_dedup(
                    stream, out, ckpt, planes, threshold=THRESHOLD,
                    n_tables=N_TABLES, store_partitions=p,
                )
                q.awaitTermination(1800)

            run_once()  # batch 0 (warm-up; reads nothing)
            # seed AFTER the warm-up: batch 0's own overwrite would
            # clobber a pre-seeded batch=0 dir
            seed = _vec_df(spark, 0, n_store, 2)
            seed_store(spark, out, seed, planes, bucketed=p > 0)
            _vec_df(spark, 20_000_000, PROBE_ROWS, 3).coalesce(1).write.parquet(
                f"{src}/f=1"
            )
            t0 = time.monotonic()
            run_once()  # batch 1: the probe against the seeded store
            sec = round(time.monotonic() - t0, 2)
            kept = W.read_semantic_reps(spark, out).count()
            assert kept >= n_store + PROBE_ROWS * 0.9, (layout, n_store, kept)
            results.append(
                {
                    "layout": layout,
                    "store_rows": n_store,
                    "probe_rows": PROBE_ROWS,
                    "probe_sec": sec,
                    "probe_vec_per_sec": round(PROBE_ROWS / sec),
                }
            )
            print(results[-1], flush=True)
            shutil.rmtree(work, ignore_errors=True)
    os.makedirs(f"{REPO}/bench_runs_r10", exist_ok=True)
    path = f"{REPO}/bench_runs_r10/repstore_layout.json"
    with open(path, "w") as f:
        json.dump(
            {
                "dim": DIM, "n_tables": N_TABLES, "planes": N_TABLES * 16,
                "store_partitions": P, "threshold": THRESHOLD,
                "results": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
