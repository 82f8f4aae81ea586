"""(T, b) amplification knob sweep for the near-dup candidate generator
(r9 VERDICT task 6): commit the table q_neardup_recall was built to
inform, so a deployment picks (n_tables, planes_per_table, threshold)
from data instead of re-deriving 1-(1-p^b)^T by hand.

Two regimes, matching how the engine is actually exercised:
- synthetic-threshold (0.2/0.25/0.3 on the sf0.1 embeddings corpus,
  24 planes total — the driver-gate setup, near-orthogonal vectors);
- realistic-threshold (0.85/0.9/0.95 on the planted 10-clique corpus of
  measure_neardup_threshold_100x, 96 planes total — the production
  semantic-dedup regime).

Per (corpus, threshold, n_tables): recall of the OR-amplified candidate
generator vs brute-force truth, and candidate_fraction = unique candidate
pairs / all pairs (the probe cost knob). Writes
bench_runs_r10/neardup_knob_sweep.json and prints the README table.

Usage: python tools/sweep_neardup_knobs.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def candidates(sim, F, df, planes, n_tables):
    bucket = sim._bucket_udf(sim._split_tables(planes, n_tables))
    keys = df.select(
        F.col("vec_id").alias("id"),
        F.posexplode(bucket(F.col("embedding"))).alias("t", "h"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators import similarity as sim
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_neardup_threshold_100x import corpus_df
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    regimes = [
        {
            "name": "synthetic_sf0.1",
            "df": load_table(
                spark, "embeddings", "/root/testdata/sf0.1"
            ).localCheckpoint(),
            "total_planes": 24,
            "thresholds": [0.2, 0.25, 0.3],
            "splits": [1, 2, 4, 6, 8],  # (T, 24/T-plane bands)
        },
        {
            "name": "planted_cliques_2k",
            "df": corpus_df(spark, 200).localCheckpoint(),
            "total_planes": 96,
            "thresholds": [0.85, 0.9, 0.95],
            "splits": [1, 2, 4, 6, 8],  # (T, 96/T-plane bands)
        },
    ]
    out = {"regimes": []}
    for reg in regimes:
        df, L = reg["df"], reg["total_planes"]
        dim = len(df.select("embedding").first()[0])
        planes = np.random.default_rng(7).standard_normal((L, dim)).tolist()
        n = df.count()
        all_pairs = n * (n - 1) // 2
        entry = {
            "name": reg["name"], "n_vectors": n,
            "total_planes": L, "rows": [],
        }
        cand_cache = {}
        for T in reg["splits"]:
            cand = candidates(sim, F, df, planes, T).localCheckpoint()
            cand_cache[T] = (cand, cand.count())
        for thr in reg["thresholds"]:
            truth = sim.neardup_pairs_bruteforce(
                df, threshold=thr
            ).localCheckpoint()
            n_truth = truth.count()
            for T in reg["splits"]:
                cand, n_cand = cand_cache[T]
                hits = truth.join(
                    cand, ["id_a", "id_b"], "left_semi"
                ).count()
                entry["rows"].append(
                    {
                        "threshold": thr,
                        "n_tables": T,
                        "planes_per_table": L // T,
                        "true_pairs": n_truth,
                        "recall": round(hits / n_truth, 4) if n_truth else None,
                        "candidate_fraction": round(n_cand / all_pairs, 5),
                    }
                )
                print(entry["rows"][-1], flush=True)
        out["regimes"].append(entry)
    os.makedirs(f"{REPO}/bench_runs_r10", exist_ok=True)
    path = f"{REPO}/bench_runs_r10/neardup_knob_sweep.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
