"""Environment-controlled round-over-round bench (r9 VERDICT task 5).

The r8->r9 comparison was salvageable only because the judge re-ran it:
committed medians from different wall-clock sessions drift 1.3x with the
machine, not the code. This harness makes the comparison self-evident:
it checks out a BASELINE git rev into a worktree and interleaves full
bench.py runs of both trees in ONE session (A B B A A B ... — balanced
order so slow machine phases hit both sides equally), each run a fresh
subprocess/JVM with identical config. Output: paired per-query medians
and ratios over the shared query set.

Usage:
  python tools/bench_ab.py <baseline-rev> [reps=3]
Writes bench_runs_r{N}/bench_ab.json (round dir via BENCH_AB_OUTDIR, default bench_runs_r13). Run ISOLATED per the bench protocol.
"""

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_once(tree: str, only: list[str] | None = None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    if only is not None:
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(only)
    else:
        env.pop("SPARK_GRAFT_BENCH_ONLY", None)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(
            f"bench.py in {tree} produced no JSON line:\n{out.stderr[-2000:]}"
        )
    return json.loads(last[-1])


def list_queries(tree: str) -> list[str]:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    out = subprocess.run(
        [sys.executable, "-c",
         "import __spark_entry__ as e; print(','.join(e.queries()))"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=300,
    )
    names = out.stdout.strip().splitlines()[-1].split(",") if out.stdout.strip() else []
    if not names:
        raise RuntimeError(f"could not list queries in {tree}: {out.stderr[-1000:]}")
    return names


def main():
    if len(sys.argv) < 2:
        sys.exit("usage: bench_ab.py <baseline-rev> [reps]")
    base_rev = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wt = os.path.join(REPO, ".bench_ab_worktree")
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt],
        cwd=REPO, capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, base_rev],
        cwd=REPO, check=True,
    )
    try:
        # SYMMETRIC pairing (r11 VERDICT task 2): both sides run exactly
        # the SHARED query set per rep, so per-rep JVM work is identical
        # — previously the head side carried its new queries (store
        # builds, GC pressure) inside the same session the shared
        # queries were timed in, and 0.5 s fixture queries showed
        # reproducible phantom ratios up to 1.7x. New-query timings are
        # taken separately (unpaired, after the paired phase).
        q_base, q_head = list_queries(wt), list_queries(REPO)
        shared_set = sorted(set(q_base) & set(q_head))
        new_only = sorted(set(q_head) - set(q_base))
        print(
            f"pairing on {len(shared_set)} shared queries; "
            f"{len(new_only)} head-only measured unpaired", flush=True,
        )
        # PRE-WARM (r13 VERDICT task 7): prime the fixture bytes into
        # the page cache and discard one warmup rep per side, so the
        # artifact's validity no longer depends on what ran on the
        # machine before (the r13 cold-cache contamination: the sf1
        # ramp had evicted the cache → 22% spreads, caught by hand).
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        n = 0
        for root_, _, files_ in os.walk(sf_dir):
            for fn_ in files_:
                with open(os.path.join(root_, fn_), "rb") as fh_:
                    while fh_.read(1 << 22):
                        n += 1
        print(f"page-cache prime: ~{n * 4} MiB fixture read", flush=True)
        for side in ("A", "B"):
            bench_once(wt if side == "A" else REPO, only=shared_set)
            print(f"{side}: warmup rep discarded", flush=True)

        runs = {"A": [], "B": []}
        # balanced interleave: ABBA ABBA ... cancels linear drift
        order = []
        for i in range(reps):
            order += ["A", "B"] if i % 2 == 0 else ["B", "A"]
        for side in order:
            tree = wt if side == "A" else REPO
            r = bench_once(tree, only=shared_set)
            runs[side].append(r)
            print(
                f"{side} ({'baseline' if side == 'A' else 'HEAD'}): "
                f"total {r['value']}s / {len(r['queries'])} queries",
                flush=True,
            )

        def med(side):
            qs = {}
            for name in runs[side][0]["queries"]:
                vals = [
                    r["queries"][name]
                    for r in runs[side]
                    if name in r["queries"]
                ]
                qs[name] = round(statistics.median(vals), 3)
            return qs

        a, b = med("A"), med("B")
        shared = sorted(set(a) & set(b))
        ratios = {q: round(b[q] / a[q], 3) if a[q] > 0 else None for q in shared}
        rvals = sorted(v for v in ratios.values() if v)
        n = len(rvals)

        # per-leg spread: is the per-rep total stable enough for the
        # ratios to mean anything? (r11 VERDICT task 4's gate, applied
        # to the batch harness too)
        def leg_spread(side):
            tot = sorted(sum(r["queries"].values()) for r in runs[side])
            return {
                "rep_totals_sec": [round(t, 1) for t in tot],
                "spread_sec": round(tot[-1] - tot[0], 1),
                "spread_pct_of_median": round(
                    100 * (tot[-1] - tot[0]) / tot[len(tot) // 2], 1
                ),
            }

        # head-only queries: timed AFTER the paired phase, own JVMs,
        # explicitly unpaired (no baseline to compare against)
        unpaired = {}
        if new_only:
            r = bench_once(REPO, only=new_only)
            unpaired = r["queries"]
        summary = {
            "baseline_rev": base_rev,
            "reps_per_side": reps,
            "interleave": "".join(order),
            "pairing": "symmetric: both sides pinned to the shared set "
                       "via SPARK_GRAFT_BENCH_ONLY; head-only queries "
                       "timed unpaired after",
            "shared_queries": len(shared),
            "new_queries": new_only,
            "new_query_unpaired_sec": unpaired,
            "removed_queries": sorted(set(a) - set(b)),
            "leg_spread": {"baseline": leg_spread("A"),
                           "head": leg_spread("B")},
            "total_baseline_sec": round(sum(a[q] for q in shared), 1),
            "total_head_sec": round(sum(b[q] for q in shared), 1),
            "total_ratio": round(
                sum(b[q] for q in shared) / sum(a[q] for q in shared), 3
            ),
            "ratio_median": rvals[n // 2],
            "ratio_p10": rvals[max(0, int(0.10 * n) - 1)],
            "ratio_p90": rvals[min(n - 1, int(0.90 * n))],
            "worst_regressions": sorted(
                ratios.items(), key=lambda kv: -(kv[1] or 0)
            )[:8],
            "per_query": {
                q: {"baseline": a[q], "head": b[q], "ratio": ratios[q]}
                for q in shared
            },
        }
        outdir = os.environ.get("BENCH_AB_OUTDIR", "bench_runs_r13")
        os.makedirs(os.path.join(REPO, outdir), exist_ok=True)
        path = os.path.join(REPO, outdir, "bench_ab.json")
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        print(
            f"\npaired ratio (HEAD/baseline) median {summary['ratio_median']} "
            f"p10 {summary['ratio_p10']} p90 {summary['ratio_p90']} "
            f"total {summary['total_ratio']}\nwrote {path}"
        )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    main()
