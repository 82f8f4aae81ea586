"""Pair-budget vs recall sweep (r13 VERDICT task 3's "Done" artifact):
max_pairs_per_bucket on a corpus with an ADVERSARIAL duplicate-density
spike — the scenario the knob exists for.

Corpus (deterministic, the measure_neardup_threshold_100x generator):
- 2,000 NORMAL planted cliques of 10 (original + 9 noise copies at
  cosine ~0.9999) → exactly 45 true pairs each, 90,000 total — the
  production workload;
- ONE MEGA-CLIQUE of ``mega`` near-identical copies (default 2,000) in a
  reserved id range → C(mega, 2) = 1,999,000 true pairs from 0.01% of
  the data mass — the adversarial spike (a boilerplate page, a scraped
  mirror) that made the sf1 ramp's verify stage 74x at 10x rows.

Per budget in {unbudgeted, 8192, 1024, 128}: embedding_near_dups wall
(2-rep median, fresh plan), pairs found, recall on the NORMAL cliques
(the pairs a deployment must keep) and on the mega-clique (the pairs the
budget exists to shed), plus pair_budget_stats' no-materialization
prediction of emitted/dropped bucket collisions. Truth = one brute-force
sweep at the threshold.

The claim under test: a budget bounds the adversarial term (mega pairs,
wall) while leaving normal-clique recall at the unbudgeted level —
because a 10-member clique fits under any budget >= 45, and members
dropped from one table's hot bucket still collide in the other tables.

Writes bench_runs_r14/pair_budget_sweep.json.
Run ISOLATED per the bench protocol.
Usage: python tools/sweep_pair_budget.py [n_orig=2000] [mega=2000] [reps=2]
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
CLIQUE = 10
CLIQUE_MOD = 10_000_000
MEGA_BASE = 500_000_000
BUDGETS = [None, 8192, 1024, 128]


def corpus_df(spark, n_orig: int, mega: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                ids, vecs = [], []
                if lo >= 0:
                    rng = np.random.default_rng(20251017 + lo)
                    base = rng.standard_normal((hi - lo, DIM))
                    for k in range(hi - lo):
                        orig = lo + k
                        nrng = np.random.default_rng(7 * orig + 3)
                        for copy in range(CLIQUE):
                            v = base[k] if copy == 0 else (
                                base[k] + 0.01 * nrng.standard_normal(DIM)
                            )
                            ids.append(orig + copy * CLIQUE_MOD)
                            vecs.append(v.astype(np.float64))
                else:
                    # mega-clique slice: lo/hi encode -(j+1) copy indices
                    mrng = np.random.default_rng(424242)
                    mbase = mrng.standard_normal(DIM)
                    for j in range(-hi, -lo):
                        jrng = np.random.default_rng(999_000 + j)
                        v = mbase + 0.01 * jrng.standard_normal(DIM)
                        ids.append(MEGA_BASE + j)
                        vecs.append(v.astype(np.float64))
                yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    import numpy as np
    import pandas as pd

    n_slices = 32
    bounds = np.linspace(0, n_orig, n_slices + 1, dtype=np.int64)
    rows = list(zip(bounds[:-1], bounds[1:]))
    mb = np.linspace(0, mega, 9, dtype=np.int64)
    rows += [(-int(hi), -int(lo)) for lo, hi in zip(mb[:-1], mb[1:])]
    ranges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["lo", "hi"])
    ).repartition(40)
    return ranges.mapInPandas(gen, "vec_id long, embedding array<double>")


def main() -> None:
    n_orig = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import numpy as np
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators import similarity as sim
    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="sweep-pair-budget", shuffle_partitions=32)
    corpus = corpus_df(spark, n_orig, mega).cache()
    n_rows = corpus.count()
    rng = np.random.default_rng(11)
    planes = rng.standard_normal((N_TABLES * PLANES_PER_TABLE, DIM)).tolist()

    truth = (
        sim.neardup_pairs_bruteforce(
            corpus, threshold=THRESHOLD, max_rows=n_rows
        )
        .select("id_a", "id_b")
        .withColumn(
            "is_mega",
            (F.col("id_a") >= MEGA_BASE) & (F.col("id_b") >= MEGA_BASE),
        )
        .cache()
    )
    t_all = truth.count()
    t_mega = truth.where("is_mega").count()
    t_norm = t_all - t_mega

    legs = []
    for budget in BUDGETS:
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n_found = sim.embedding_near_dups(
                corpus, planes, threshold=THRESHOLD, n_tables=N_TABLES,
                max_pairs_per_bucket=budget,
            ).count()
            walls.append(time.perf_counter() - t0)
        found = sim.embedding_near_dups(
            corpus, planes, threshold=THRESHOLD, n_tables=N_TABLES,
            max_pairs_per_bucket=budget,
        ).select("id_a", "id_b")
        hit = truth.join(
            found.withColumn("__h", F.lit(1)), ["id_a", "id_b"], "left"
        )
        row = hit.agg(
            F.count(F.when(~F.col("is_mega") & F.col("__h").isNotNull(),
                           1)).alias("norm_hit"),
            F.count(F.when(F.col("is_mega") & F.col("__h").isNotNull(),
                           1)).alias("mega_hit"),
        ).collect()[0]
        stats = sim.pair_budget_stats(
            corpus, planes, n_tables=N_TABLES, max_pairs_per_bucket=budget
        )
        legs.append({
            "budget": budget,
            "wall_s_median": round(statistics.median(walls), 2),
            "pairs_found": int(n_found),
            "recall_normal_cliques": round(row["norm_hit"] / t_norm, 4),
            "recall_mega_clique": round(row["mega_hit"] / t_mega, 4),
            "bucket_collisions_emitted": stats["pairs_emitted"],
            "bucket_collisions_dropped": stats["pairs_dropped"],
            "buckets_capped": stats["buckets_capped"],
            "max_bucket_members": stats["max_bucket_members"],
        })
        print(json.dumps(legs[-1]))

    out = {
        "corpus_rows": int(n_rows),
        "normal_cliques": n_orig,
        "mega_copies": mega,
        "threshold": THRESHOLD,
        "n_tables": N_TABLES,
        "planes_per_table": PLANES_PER_TABLE,
        "true_pairs_total": int(t_all),
        "true_pairs_normal": int(t_norm),
        "true_pairs_mega": int(t_mega),
        "legs": legs,
        "note": (
            "recall_normal_cliques is the production metric (pairs a "
            "deployment must keep); recall_mega_clique is the "
            "adversarial mass the budget sheds by design. Budgets are "
            "pairs per (table, bucket); member cap = "
            "floor((1+sqrt(1+8b))/2)."
        ),
    }
    os.makedirs(os.path.join(REPO, "bench_runs_r14"), exist_ok=True)
    with open(os.path.join(REPO, "bench_runs_r14",
                           "pair_budget_sweep.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "legs"}))
    spark.stop()


if __name__ == "__main__":
    main()
