"""Second scaling decade for the ramp: sf1 (10x) -> sf10 (100x of sf0.1).

One decade (tools/bench_scale.py) shows a ratio; two decades show the
EXPONENT — a plan that hides an O(n^2) term behind fixed overhead at 10x
cannot hide it at 100x. Generates benchdata/sf10 with
tools/make_scale_data.py at scale=100 (same deterministic derivation,
~1.5 GB) and measures the clique-safe subset of the heavy list at sf1 and
sf10, reporting the 10x->100x wall ratio per query.

WHY A SUBSET: make_scale_data derives near-dup copies of each document /
embedding, so at scale=100 every near-dup clique is 100 wide and the
PAIR-OUTPUT queries (minhash/jaccard/simhash pairs, dedup clusters,
cluster split, embedding near-dups) legitimately emit ~4,950 pairs per
clique — their OUTPUT grows quadratically with clique width, a synthetic
replication artifact, not a plan property (real corpora grow more docs,
not 100-wide dup cliques; the planted-clique threshold instrument for the
pair queries is tools/measure_neardup_threshold.py). The queries measured
here have output linear in rows at any scale, so their wall ratio IS the
plan's scaling behavior.

Writes bench_runs_r9/scale_ramp_100x.json and prints a table.
Run ISOLATED (no concurrent Spark jobs) per the bench protocol.

Usage: python tools/bench_scale100.py [runs]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # tools/ for bench_scale

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "benchdata", "sf1")
SF10 = os.path.join(REPO, "benchdata", "sf10")

# Output linear in rows at any scale — wall ratio = plan scaling.
CLIQUE_SAFE = [
    "q_exact_dedup",        # hash groupBy over 500k docs
    "q_doc_fingerprint",    # rolling-hash fingerprints, map-side
    "q_lsh_buckets",        # shingle explode + combinable agg
    "q_cdc_dedup",          # closed-form CDC chunk fold
    "q_pack_sequences",     # two-level prefix-sum packing
    "q_corpus_shards",      # full-corpus shuffle + per-shard window
    "q_sessionize_unkeyed", # 10M events, chunked time-axis sessionize
    "q_cumulative_share",   # 60M lineitem, joins + keyed windows
    "q_lineitem_dedup",     # 60M-row keyed window + rollup
    "q_skew_salted_agg",    # two-stage salted agg at 60M rows
    "q_hilbert_stats",      # vectorized Hilbert fold over 60M rows
    "q_knn_pq",             # ADC scan over 200k PQ codes
    "q_knn_ivf_clustered",  # store write + partition-pruned probe read
    "q_knn_ivf_pq_clustered",  # store write + pruned, column-pruned ADC
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if not os.path.isdir(SF1):
        raise SystemExit("benchdata/sf1 missing — python tools/make_scale_data.py")
    if not os.path.isdir(SF10):
        print("generating benchdata/sf10 (scale=100)…", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scale_data.py"),
             "100", SF10],
            check=True,
        )

    import __spark_entry__ as entry  # REPO is on sys.path (line 32)

    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-100x", shuffle_partitions=32)
    qs = entry.queries()

    from bench_scale import time_queries

    out = {"runs": runs, "sf1_dir": SF1, "sf10_dir": SF10, "queries": {}}
    out["queries"] = time_queries(
        spark, qs, CLIQUE_SAFE, (("sf1", SF1), ("sf10", SF10)), runs
    )

    os.makedirs(os.path.join(REPO, "bench_runs_r9"), exist_ok=True)
    path = os.path.join(REPO, "bench_runs_r9", "scale_ramp_100x.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
