"""Scale-ramp bench (r8 judge task #3): run the HEAVY driver queries at
sf0.1 and at the derived 10x sf1 (tools/make_scale_data.py), 3 runs each,
and report per-query medians + the sf0.1->sf1 scaling ratio. At sf0.1
every query is ~0.5 s of fixed overhead, so this ramp is what actually
discriminates plan quality: a healthy distributed plan lands well under
10x wall at 10x rows on local[32]; anything super-linear (ratio >> 10)
is flagged for fix-or-explain.

Writes bench_runs_r{N}/scale_ramp.json (BENCH_AB_OUTDIR) and prints a table.

Usage: python tools/bench_scale.py [runs]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "benchdata", "sf1")

# The sf-scalable heavy hitters: dedup/LSH/CC/packing/sessionize/windowed
# aggregation — the shapes whose plans could hide super-linear behavior.
HEAVY = [
    "q_exact_dedup",
    "q_doc_fingerprint",
    "q_lsh_buckets",
    "q_minhash_est_vs_exact",
    "q_jaccard_top_pairs",
    "q_simhash_pairs",
    "q_dedup_clusters",
    "q_cluster_split",
    "q_cdc_dedup",
    "q_pack_sequences",
    "q_fuzzy_pairs",
    "q_embedding_neardup",
    "q_semantic_dedup",
    "q_sessionize_unkeyed",
    "q_cumulative_share",
    "q_lineitem_dedup",
    "q_skew_salted_agg",
    # r9 ANN additions: PQ encode+ADC and the store-writing clustered
    # forms (the write is part of the measured work by design)
    "q_knn_pq",
    "q_knn_ivf_pq",
    "q_knn_ivf_clustered",
    "q_knn_ivf_pq_clustered",
    # r9 additions round 2: the vectorized Hilbert fold and the
    # shuffle+shard assignment (a full-corpus window per shard)
    "q_hilbert_stats",
    "q_corpus_shards",
    # late r9: ExactSubstr span removal (shingle join + covered-index
    # distinct + anti-join + per-doc reconstruction)
    "q_dup_span_cut",
]


def time_queries(spark, qs, names, legs, runs: int) -> dict:
    """Shared ramp loop (also used by bench_scale100.py): noop-write each
    query ``runs`` times per leg, report per-leg medians + the
    last-leg/first-leg ratio."""
    out = {}
    (lo_label, _), (hi_label, _) = legs[0], legs[-1]
    for name in names:
        fn = qs[name]
        rec = {}
        for label, sf_dir in legs:
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            # keep the unrounded median for the ratio: a sub-5ms leg rounds
            # to 0.00 and would ZeroDivisionError after the expensive legs
            # already ran
            rec[f"__{label}"] = statistics.median(times)
            rec[label] = round(rec[f"__{label}"], 2)
        rec["ratio"] = round(rec[f"__{hi_label}"] / rec[f"__{lo_label}"], 1)
        for label, _ in legs:
            del rec[f"__{label}"]
        out[name] = rec
        print(
            f"{name:28s} {lo_label}={rec[lo_label]:7.2f}s  "
            f"{hi_label}={rec[hi_label]:8.2f}s  ratio={rec['ratio']:5.1f}x",
            flush=True,
        )
    return out


def main() -> None:
    # usage: bench_scale.py [runs] [--only=q_a,q_b | --only q_a,q_b]
    # (--only merges the named queries into the existing scale_ramp.json
    # instead of re-running the whole list)
    argv = sys.argv[1:]
    args, only, i = [], None, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--only"):
            if "=" in a:
                only = a.split("=", 1)[1].split(",")
            else:
                i += 1
                if i >= len(argv):
                    raise SystemExit("--only needs a comma-separated list")
                only = argv[i].split(",")
        else:
            args.append(a)
        i += 1
    runs = int(args[0]) if args else 3

    import __spark_entry__ as entry  # REPO is on sys.path (line 20)

    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="bench-scale", shuffle_partitions=32)
    qs = entry.queries()

    outdir = os.path.join(
        REPO, os.environ.get("BENCH_AB_OUTDIR", "bench_runs_r13")
    )
    path = os.path.join(outdir, "scale_ramp.json")
    out = {"runs": runs, "sf01_dir": SF01, "sf1_dir": SF1, "queries": {}}
    if only and os.path.exists(path):
        with open(path) as f:
            out["queries"] = json.load(f)["queries"]
    out["queries"].update(
        time_queries(spark, qs, only or HEAVY, (("sf0.1", SF01), ("sf1", SF1)), runs)
    )

    os.makedirs(outdir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
