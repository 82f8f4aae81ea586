"""Paired A/B for the STREAMING surface (r10 VERDICT task #3) — the
batch bench earned tools/bench_ab.py in r10 precisely because committed
medians from different sessions drift with the machine; this extends the
same discipline to the streaming legs, whose r9→r10 committed artifacts
moved 74% on semantic_dedup_flat with no code explanation.

Checks out TWO git revs into worktrees (rev "HEAD" = the live repo) and
interleaves full leg-suite runs ABBA ABBA..., each run a fresh
subprocess/JVM via tools/_stream_leg_runner.py, both sides reading the
SAME pre-staged source files. Per-leg medians + ratios land in
bench_runs_r11/stream_ab_<tag>.json.

Usage:
  python tools/bench_ab_stream.py <revA> <revB|HEAD> <tag> [reps=5] \
      [legs=dedup,compacted_sink,semantic_flat,semantic_bucketed]
Run ISOLATED per the bench protocol (memory: bench-variance-protocol).

Variance gate (r11 VERDICT task 4): per-leg per-side rep spreads
(min/median/max) are computed and PRINTED, and every ratio carries a
verdict — "stable" only when the worst-case ratio interval
(min_b/max_a .. max_b/min_a) stays on one side of 1.0 or inside a ±10%%
parity band; otherwise "unstable: spread straddles 1.0" — so a 1.23x
that re-runs at 0.90x (the r11 bucketed-leg flip) reads as noise ON THE
ARTIFACT instead of needing a judge to notice.
"""

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "benchdata", "sf10")
N_FILES = 16
FILES_PER_TRIGGER = 2


def stage_sources(work: str) -> None:
    """Stage identical file-stream sources once, outside the measurement."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    spark = get_spark(app_name="stream-ab-stage", shuffle_partitions=32)
    ev = load_table(spark, "events", SF10).select(
        F.col("ts").alias("time"), "user_id", "event_id"
    )
    n_events = ev.count()
    ev.repartition(N_FILES).write.parquet(os.path.join(work, "events_src"))
    emb = load_table(spark, "embeddings", SF10).select("vec_id", "embedding")
    n_vecs = emb.count()
    dim = len(emb.select("embedding").first()[0])
    emb.repartition(N_FILES).write.parquet(os.path.join(work, "emb_src"))
    with open(os.path.join(work, "meta.json"), "w") as f:
        json.dump(
            {
                "n_events": n_events, "n_vecs": n_vecs, "dim": dim,
                "files_per_trigger": FILES_PER_TRIGGER,
            },
            f,
        )
    spark.stop()


def prime_page_cache(work: str) -> None:
    """Read every staged source byte once so measured reps start from a
    WARM page cache regardless of what ran on the machine before."""
    n = 0
    for root, _, files in os.walk(work):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while f.read(1 << 22):
                    n += 1
    print(f"page-cache prime: ~{n * 4} MiB staged source read", flush=True)


def run_side(tree: str, work: str, legs: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "_stream_leg_runner.py"),
            work, legs,
        ],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.strip().splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"runner produced no RESULT in {tree}:\n{out.stdout[-1500:]}"
        f"\n{out.stderr[-3000:]}"
    )


def main():
    if len(sys.argv) < 4:
        sys.exit("usage: bench_ab_stream.py <revA> <revB|HEAD> <tag> [reps] [legs]")
    rev_a, rev_b, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    legs = (
        sys.argv[5]
        if len(sys.argv) > 5
        else "dedup,compacted_sink,semantic_flat,semantic_bucketed"
    )
    import tempfile

    work = tempfile.mkdtemp(prefix="stream_ab_src_")
    trees, wts = {}, []
    try:
        stage_sources(work)
        for side, rev in (("A", rev_a), ("B", rev_b)):
            if rev == "HEAD":
                trees[side] = REPO
                continue
            wt = os.path.join(REPO, f".stream_ab_{side}")
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, rev],
                cwd=REPO, check=True,
            )
            trees[side], _ = wt, wts.append(wt)

        # PRE-WARM (r13 VERDICT task 7): the r13 cold-cache run was
        # contaminated by whatever evicted the page cache before it (the
        # sf1 ramp — 22% spreads, caught and superseded by hand). Make
        # artifact validity independent of what ran before: (a) prime
        # the staged source bytes into the page cache explicitly, (b)
        # run ONE discarded warmup rep per side (JIT/shuffle-dir/scratch
        # allocation paths warmed on both trees symmetrically).
        prime_page_cache(work)
        for side in ("A", "B"):
            run_side(trees[side], work, legs)
            print(f"{side}: warmup rep discarded", flush=True)

        runs = {"A": [], "B": []}
        order = []
        for i in range(reps):
            order += ["A", "B"] if i % 2 == 0 else ["B", "A"]
        for side in order:
            r = run_side(trees[side], work, legs)
            runs[side].append(r)
            line = "  ".join(
                f"{k}={v['sec']}s" for k, v in r["legs"].items()
            )
            print(f"{side} ({rev_a if side == 'A' else rev_b}): {line}",
                  flush=True)

        def med(side):
            legs_seen = runs[side][0]["legs"]
            return {
                leg: round(
                    statistics.median(
                        r["legs"][leg]["sec"]
                        for r in runs[side]
                        if leg in r["legs"]
                    ),
                    2,
                )
                for leg in legs_seen
            }

        a, b = med("A"), med("B")
        shared = sorted(set(a) & set(b))

        def spread(side, leg):
            vals = sorted(
                r["legs"][leg]["sec"] for r in runs[side]
                if leg in r["legs"]
            )
            n = len(vals)
            return {
                "min": vals[0], "median": vals[n // 2],
                "max": vals[-1],
                "q1": vals[n // 4], "q3": vals[(3 * n) // 4],
                "spread_pct_of_median": round(
                    100 * (vals[-1] - vals[0]) / vals[n // 2], 1
                ),
            }

        leg_spread = {
            leg: {"a": spread("A", leg), "b": spread("B", leg)}
            for leg in shared
        }

        def verdict(leg):
            # r13 (r12 VERDICT task 3): the min/max worst-case interval
            # only WIDENS with reps — outlier-dominated, so "add reps"
            # could never converge; and even a quartile CROSS-PRODUCT
            # (q1_b/q3_a .. q3_b/q1_a) compares runs from different
            # moments, so session drift inflates it. The ABBA interleave
            # exists precisely to enable PAIRING: at >=8 reps/side the
            # verdict uses per-pair ratios (B run i / A run i — adjacent
            # in time, drift cancels) and their IQR, the same paired
            # discipline as the batch bench_ab. Below 8 reps the old
            # worst-case cross-product applies unchanged.
            if reps >= 8:
                pr = sorted(
                    rb["legs"][leg]["sec"] / ra["legs"][leg]["sec"]
                    for ra, rb in zip(runs["A"], runs["B"])
                    if leg in ra["legs"] and leg in rb["legs"]
                )
                n = len(pr)
                lo, hi = pr[n // 4], pr[(3 * n) // 4]
                kind = "paired-iqr"
            else:
                sa = leg_spread[leg]["a"]
                sb = leg_spread[leg]["b"]
                if sa["max"] <= 0 or sa["min"] <= 0:
                    return "unmeasurable"
                lo = sb["min"] / sa["max"]
                hi = sb["max"] / sa["min"]
                kind = "minmax"
            # r14: the A/A null control (stream_ab_aa_flat.json) showed
            # the paired-IQR rule declaring "stable" non-parity on
            # IDENTICAL code when per-side spreads exceed ~15% — so any
            # within-±10% verdict on a high-spread leg carries an
            # explicit needs-A/A marker instead of silently reading as
            # a confirmed regression/improvement.
            spread_hi = max(
                leg_spread[leg]["a"]["spread_pct_of_median"],
                leg_spread[leg]["b"]["spread_pct_of_median"],
            )
            mid = (lo + hi) / 2
            caution = (
                " [needs A/A control: per-side spread "
                f"{spread_hi}% > 15% and ratio within ±10% — run this "
                "harness rev-vs-same-rev before believing it]"
                if spread_hi > 15 and 0.9 <= mid <= 1.1
                else ""
            )
            if lo >= 1.0 or hi <= 1.0:
                return (
                    f"stable [{kind}] ({round(lo,2)}..{round(hi,2)})"
                    f"{caution}"
                )
            if 0.9 <= lo and hi <= 1.1:
                return (
                    f"stable parity [{kind}] "
                    f"({round(lo,2)}..{round(hi,2)}){caution}"
                )
            return (
                f"unstable: {kind} ratio interval "
                f"{round(lo,2)}..{round(hi,2)} straddles 1.0 — add reps "
                f"before concluding"
            )

        verdicts = {leg: verdict(leg) for leg in shared}
        reps_pin = {
            leg: sorted(
                {
                    r["legs"][leg].get("reps")
                    for side in ("A", "B")
                    for r in runs[side]
                    if leg in r["legs"]
                }
            )
            for leg in shared
            if any("reps" in r["legs"].get(leg, {}) for r in runs["A"])
        }
        summary = {
            "rev_a": rev_a, "rev_b": rev_b, "reps_per_side": reps,
            "interleave": "".join(order),
            "legs_a_median_sec": a, "legs_b_median_sec": b,
            "ratio_b_over_a": {
                leg: round(b[leg] / a[leg], 3) for leg in shared if a[leg] > 0
            },
            "leg_spread": leg_spread,
            "ratio_verdicts": verdicts,
            "all_runs_a": [r["legs"] for r in runs["A"]],
            "all_runs_b": [r["legs"] for r in runs["B"]],
            "semantic_reps_outcome_pin": reps_pin,
        }
        outdir = os.path.join(
            REPO, os.environ.get("BENCH_AB_OUTDIR", "bench_runs_r13")
        )
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"stream_ab_{tag}.json")
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary["ratio_b_over_a"], indent=1))
        for leg in shared:
            print(f"  {leg}: {verdicts[leg]}  "
                  f"a={leg_spread[leg]['a']}  b={leg_spread[leg]['b']}")
        print(f"wrote {path}")
    finally:
        for wt in wts:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
