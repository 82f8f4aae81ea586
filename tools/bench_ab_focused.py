#!/usr/bin/env python
"""Focused paired A/B: interleaved bench.py runs (ABBA...) of HEAD vs a
baseline rev, restricted to a named query subset (plus controls), fresh
JVM per run, page-cache pre-warm and one discarded warmup rep per side —
the bench_ab.py protocol on a focused set.

Usage: bench_ab_focused.py <baseline-rev> <q1,q2,...> [reps=3] [out.json]
"""

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from bench_ab import bench_once  # noqa: E402


def main() -> int:
    base_rev, qlist = sys.argv[1], sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = (
        sys.argv[4]
        if len(sys.argv) > 4
        else "bench_runs_r16/bench_ab_focused.json"
    )
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
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        for root_, _, files_ in os.walk(sf_dir):
            for fn_ in files_:
                with open(os.path.join(root_, fn_), "rb") as fh_:
                    while fh_.read(1 << 22):
                        pass
        for side in ("A", "B"):
            bench_once(wt if side == "A" else REPO, only=qlist)
            print(f"{side}: warmup rep discarded", flush=True)
        runs = {"A": [], "B": []}
        order = []
        for i in range(reps):
            order += ["A", "B"] if i % 2 == 0 else ["B", "A"]
        for side in order:
            r = bench_once(wt if side == "A" else REPO, only=qlist)
            runs[side].append(r)
            print(
                f"{side} ({'baseline' if side == 'A' else 'HEAD'}): "
                f"total {r['value']}s", flush=True,
            )
        med = {
            s: {
                q: statistics.median(r["queries"][q] for r in runs[s])
                for q in qlist
            }
            for s in runs
        }
        result = {
            "baseline_rev": base_rev,
            "reps": reps,
            "queries": {
                q: {
                    "baseline_med": round(med["A"][q], 3),
                    "head_med": round(med["B"][q], 3),
                    "ratio_head_over_base": round(
                        med["B"][q] / med["A"][q], 3
                    ),
                }
                for q in qlist
            },
            "runs": {
                s: [
                    {q: r["queries"][q] for q in qlist} for r in runs[s]
                ]
                for s in runs
            },
        }
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        for q, v in result["queries"].items():
            print(
                f"{q:34s} base {v['baseline_med']:7.3f} -> head "
                f"{v['head_med']:7.3f}  ratio {v['ratio_head_over_base']}"
            )
        return 0
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
