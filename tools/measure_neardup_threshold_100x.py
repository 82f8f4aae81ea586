"""Second decade for the realistic-threshold pair family (r9 VERDICT
task 4): embedding_near_dups AND semantic_dedup measured at 2k / 20k /
200k vectors — two decades — at threshold 0.9.

The r9 measurement (tools/measure_neardup_threshold.py) proved ONE
decade: 10x rows -> 2.28x wall at recall 0.997. The claim that
real-threshold semantic dedup stays near-linear needed the same
two-decade proof the clique-safe ramp already has. This tool builds
three corpora with IDENTICAL planted structure — n_orig in {200, 2000,
20000} seeded 64-dim originals, each with 9 noise copies at cosine
~0.9999 (clique = vec_id % 10_000_000, the make_scale_data encoding) —
so true pairs are EXACTLY linear in rows (45 per clique), and measures:

- embedding_near_dups (OR-amplified, 6 tables x 16 planes, verify-last):
  3-run median wall, found pairs, recall vs brute-force truth;
- semantic_dedup (pairs -> connected components -> representative):
  3-run median wall, cluster count vs planted cliques;
- at 200k ALSO the r10 sampled-truth estimator
  (neardup_pairs_bruteforce(sample_frac=0.1)): recall on the
  deterministic sample vs recall on the full truth — the estimator the
  any-scale audit (q_neardup_recall_sampled) relies on, validated
  against ground truth at the largest corpus.

Writes bench_runs_r10/neardup_threshold_100x.json.
Run ISOLATED (no concurrent Spark jobs) per the bench protocol.
Usage: python tools/measure_neardup_threshold_100x.py [runs]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DIM = 64
THRESHOLD = 0.9
N_TABLES = 6
PLANES_PER_TABLE = 16
CLIQUE = 10  # original + 9 copies
CLIQUE_MOD = 10_000_000
DECADES = [("2k", 200), ("20k", 2_000), ("200k", 20_000)]


def corpus_df(spark, n_orig: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                rng = np.random.default_rng(20251017 + lo)
                base = rng.standard_normal((hi - lo, DIM))
                ids, vecs = [], []
                for k in range(hi - lo):
                    orig = lo + k
                    nrng = np.random.default_rng(7 * orig + 3)
                    for copy in range(CLIQUE):
                        v = base[k] if copy == 0 else (
                            base[k] + 0.01 * nrng.standard_normal(DIM)
                        )
                        ids.append(orig + copy * CLIQUE_MOD)
                        vecs.append(v.astype(np.float64))
                yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    import numpy as np
    import pandas as pd

    n_slices = 32
    bounds = np.linspace(0, n_orig, n_slices + 1, dtype=np.int64)
    ranges = spark.createDataFrame(
        pd.DataFrame({"lo": bounds[:-1], "hi": bounds[1:]})
    ).repartition(n_slices)
    return ranges.mapInPandas(gen, "vec_id long, embedding array<double>")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import numpy as np
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators import similarity as sim
    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    planes = (
        np.random.default_rng(7)
        .standard_normal((N_TABLES * PLANES_PER_TABLE, DIM))
        .tolist()
    )
    out = {
        "threshold": THRESHOLD,
        "n_tables": N_TABLES,
        "planes_per_table": PLANES_PER_TABLE,
        "clique": CLIQUE,
    }
    rows = []
    for name, n_orig in DECADES:
        df = corpus_df(spark, n_orig).localCheckpoint()  # pin the corpus
        n_vecs = df.count()
        truth = sim.neardup_pairs_bruteforce(
            df, threshold=THRESHOLD, max_rows=200_000
        ).localCheckpoint()
        n_truth = truth.count()
        cross = truth.where(
            F.col("id_a") % CLIQUE_MOD != F.col("id_b") % CLIQUE_MOD
        ).count()

        walls_nd, n_found = [], 0
        for _ in range(runs):
            t0 = time.monotonic()
            found = sim.embedding_near_dups(
                df, planes, threshold=THRESHOLD, n_tables=N_TABLES
            )
            n_found = found.count()
            walls_nd.append(time.monotonic() - t0)
        hits = truth.join(
            found.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        ).count()
        recall = hits / n_truth if n_truth else 1.0

        walls_sd, n_clusters = [], 0
        for _ in range(runs):
            t0 = time.monotonic()
            sd = sim.semantic_dedup(
                df, planes, threshold=THRESHOLD, n_tables=N_TABLES
            )
            n_clusters = sd.where("is_representative").count()
            walls_sd.append(time.monotonic() - t0)

        entry = {
            "n_vectors": n_vecs,
            "truth_pairs": n_truth,
            "cross_clique_truth_pairs": cross,
            "near_dups": {
                "found_pairs": n_found,
                "recall": round(recall, 4),
                "walls_sec": [round(w, 2) for w in walls_nd],
                "median_sec": round(statistics.median(walls_nd), 2),
            },
            "semantic_dedup": {
                "representatives": n_clusters,
                "planted_cliques": n_orig,
                "walls_sec": [round(w, 2) for w in walls_sd],
                "median_sec": round(statistics.median(walls_sd), 2),
            },
        }
        if name == "200k":
            # THE second-decade finding: at fixed b=16 the random-collision
            # floor (6 tables x 2^-16 x n(n-1)/2 ~ 1.8M candidates at
            # n=200k) overtakes the 900k true pairs — candidates go
            # quadratic exactly as 1-(1-p^b)^T predicts. The production
            # rule is b ~ log2(n) + margin: re-measure with b=20
            # (6 x 20 planes; clique-pair collision p^20 = 0.9955^20 =
            # 0.914 per table, miss (1-0.914)^6 ~ 4e-7) and record the
            # wall coming back toward linear.
            planes20 = (
                np.random.default_rng(7)
                .standard_normal((N_TABLES * 20, DIM))
                .tolist()
            )
            walls20, n_found20 = [], 0
            for _ in range(runs):
                t0 = time.monotonic()
                found20 = sim.embedding_near_dups(
                    df, planes20, threshold=THRESHOLD, n_tables=N_TABLES
                )
                n_found20 = found20.count()
                walls20.append(time.monotonic() - t0)
            hits20 = truth.join(
                found20.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
            ).count()
            entry["near_dups_b20"] = {
                "planes_per_table": 20,
                "found_pairs": n_found20,
                "recall": round(hits20 / n_truth, 4) if n_truth else None,
                "walls_sec": [round(w, 2) for w in walls20],
                "median_sec": round(statistics.median(walls20), 2),
            }
            # r10 sampled-truth estimator vs the full truth it estimates
            t0 = time.monotonic()
            struth = sim.neardup_pairs_bruteforce(
                df, threshold=THRESHOLD, sample_frac=0.1, sample_salt="x100"
            ).localCheckpoint()
            s_n = struth.count()
            s_hits = struth.join(
                found.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
            ).count()
            entry["sampled_truth_estimator"] = {
                "sample_frac": 0.1,
                "sampled_truth_pairs": s_n,
                "recall_on_sample": round(s_hits / s_n, 4) if s_n else None,
                "recall_full": round(recall, 4),
                "sweep_sec": round(time.monotonic() - t0, 2),
            }
        out[name] = entry
        rows.append(entry)
        print(name, json.dumps(entry), flush=True)

    for op in ("near_dups", "semantic_dedup"):
        out[f"{op}_wall_ratio_per_decade"] = [
            round(rows[i + 1][op]["median_sec"] / rows[i][op]["median_sec"], 2)
            for i in range(len(rows) - 1)
        ]
    out["pair_ratio_per_decade"] = [
        round(rows[i + 1]["truth_pairs"] / max(rows[i]["truth_pairs"], 1), 2)
        for i in range(len(rows) - 1)
    ]
    os.makedirs(f"{REPO}/bench_runs_r10", exist_ok=True)
    path = f"{REPO}/bench_runs_r10/neardup_threshold_100x.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"near_dups wall/decade {out['near_dups_wall_ratio_per_decade']}, "
        f"semantic wall/decade {out['semantic_dedup_wall_ratio_per_decade']} "
        f"(wrote {path})"
    )


if __name__ == "__main__":
    main()
