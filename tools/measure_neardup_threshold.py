"""Measure embedding near-dup scaling at a REALISTIC threshold (0.9).

The r9 scale ramp flagged q_embedding_neardup at 44.7x wall for 10x rows
and explained it as candidate math, not plan defect: at the driver's
threshold 0.25 on near-orthogonal vectors, every table's collision rate is
~6% of ALL pairs, so unique candidates grow O(n^2 * p). The claim in the
README was that REAL semantic-dedup thresholds (>=0.9) use longer bands
where collisions are dominated by true matches and candidates stay
near-linear. This tool turns that claim into a measurement.

Setup: the ramp corpus (tools/make_scale_data.py) plants 10-cliques —
each sf0.1 vector plus 9 hash-noise copies at cosine ~0.9999, clique =
same ``vec_id % 10_000_000``. Two corpora with IDENTICAL planted
structure: small = the cliques of the first 200 originals (2k vectors),
full = all 2k originals (20k vectors) — 10x rows, true pairs exactly
linear in rows (45 per clique). Bands: 6 tables x 16 planes, sized so a
cos-0.9999 pair collides with prob ~1 while a random near-orthogonal
pair collides in any table with prob 6 * 0.5^16 ~= 9.2e-5.

Reports, per corpus: 3-run median wall of the amplified
``embedding_near_dups`` (threshold 0.9, verify-last), pairs found,
brute-force truth count (``neardup_pairs_bruteforce``, run once), recall,
and the count of truth pairs that are CROSS-clique (sanity: ~0, i.e. the
truth is the planted structure, not accidental collisions).

Writes bench_runs_r9/neardup_threshold.json and prints a table.
Run ISOLATED (no concurrent Spark jobs) per the bench protocol.

Usage: python tools/measure_neardup_threshold.py [runs]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "benchdata", "sf1")

THRESHOLD = 0.9
N_TABLES = 6
PLANES_PER_TABLE = 16
CLIQUE_MOD = 10_000_000  # make_scale_data.py: vec_id + copy * 10_000_000
SMALL_ORIGINALS = 200  # small corpus = cliques of the first 200 originals


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if not os.path.isdir(SF1):
        raise SystemExit(
            f"{SF1} missing — generate with: python tools/make_scale_data.py"
        )

    import numpy as np
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators import similarity as sim
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    spark = get_spark(shuffle_partitions=32)
    full = load_table(spark, "embeddings", SF1)
    small = full.where(F.col("vec_id") % CLIQUE_MOD < SMALL_ORIGINALS)
    dim = len(full.select("embedding").first()[0])
    planes = (
        np.random.default_rng(7)
        .standard_normal((N_TABLES * PLANES_PER_TABLE, dim))
        .tolist()
    )

    out: dict[str, dict] = {
        "threshold": THRESHOLD,
        "n_tables": N_TABLES,
        "planes_per_table": PLANES_PER_TABLE,
    }
    rows = []
    for name, df in (("small_2k", small), ("full_20k", full)):
        n_vecs = df.count()
        truth = sim.neardup_pairs_bruteforce(df, threshold=THRESHOLD)
        truth = truth.localCheckpoint()  # one sweep, reused 3x below
        n_truth = truth.count()
        cross = truth.where(
            F.col("id_a") % CLIQUE_MOD != F.col("id_b") % CLIQUE_MOD
        ).count()
        walls, n_found, recall = [], 0, 0.0
        for _ in range(runs):
            t0 = time.monotonic()
            found = sim.embedding_near_dups(
                df, planes, threshold=THRESHOLD, n_tables=N_TABLES
            )
            n_found = found.count()
            walls.append(time.monotonic() - t0)
        hits = truth.join(
            found.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        ).count()
        recall = hits / n_truth if n_truth else 1.0
        med = statistics.median(walls)
        rows.append((name, n_vecs, n_truth, cross, n_found, recall, med))
        out[name] = {
            "n_vectors": n_vecs,
            "truth_pairs": n_truth,
            "cross_clique_truth_pairs": cross,
            "found_pairs": n_found,
            "recall": round(recall, 4),
            "walls_sec": [round(w, 2) for w in walls],
            "median_sec": round(med, 2),
        }

    out["wall_ratio_10x_rows"] = round(rows[1][6] / rows[0][6], 2)
    out["pair_ratio_10x_rows"] = round(rows[1][2] / max(rows[0][2], 1), 2)
    path = os.path.join(REPO, "bench_runs_r9", "neardup_threshold.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)

    print(f"\nthreshold={THRESHOLD}, {N_TABLES} tables x {PLANES_PER_TABLE} planes")
    print("corpus      vecs   truth  cross  found  recall  median_s")
    for name, n, t, c, fd, r, m in rows:
        print(f"{name:<10} {n:>6} {t:>6} {c:>6} {fd:>6}  {r:>6.3f}  {m:>7.2f}")
    print(
        f"10x rows -> {out['wall_ratio_10x_rows']}x wall, "
        f"{out['pair_ratio_10x_rows']}x true pairs  (wrote {path})"
    )


if __name__ == "__main__":
    main()
