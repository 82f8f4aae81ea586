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

r15 (r14 VERDICT task 4) — two automations replacing hand diagnosis:

- MACHINE-QUIET GUARD: every measured rep carries an external-CPU
  fraction ((/proc/stat busy − our reaped children's rusage) / elapsed
  per-cpu), self-calibrated against the discarded warmup reps so JVM
  rusage-accounting quirks cancel. A rep whose external fraction
  exceeds warmup + 10 points is marked CONTAMINATED; its ABBA pair is
  dropped from the paired-ratio verdict (annotated, never silently),
  and a session where >1/3 of pairs drop is stamped
  contaminated-session on every verdict.
- AUTO A/A: whenever a verdict fires the needs-A/A marker (r14's rule:
  within-±10%% ratio on a leg with >15%% per-side spread), the harness
  ITSELF runs the A/A null control (side A's tree on BOTH sides,
  ABBA, 4 pairs) for those legs and stamps each flagged verdict with
  whether the A/A interval reproduces the deviation (machine artifact)
  or not (possibly real). Disable with BENCH_AB_AUTO_AA=0.
"""

import json
import os
import statistics
import subprocess
import sys
import time

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


def _cpu_probe() -> tuple[float, float, float]:
    """(monotonic s, machine busy cpu-seconds, our reaped-children
    cpu-seconds) — the delta across a rep splits machine CPU into OURS
    (the runner subprocess tree, reaped ⇒ rusage-rolled-up) vs EXTERNAL
    (anything else running on the box)."""
    import resource

    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    busy = (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")
    ru = resource.getrusage(resource.RUSAGE_CHILDREN)
    return time.monotonic(), busy, ru.ru_utime + ru.ru_stime


def _external_frac(before, after) -> float:
    dt = after[0] - before[0]
    if dt <= 0:
        return 0.0
    ext = (after[1] - before[1]) - (after[2] - before[2])
    return max(0.0, ext) / (dt * (os.cpu_count() or 1))


def _load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def measured_run(tree: str, work: str, legs: str) -> dict:
    """One rep with the machine-quiet probe attached (guard keys are
    underscored so med()/spread() — which read r['legs'] — ignore them)."""
    p0 = _cpu_probe()
    load_before = _load1()
    r = run_side(tree, work, legs)
    r["_external_busy_frac"] = round(_external_frac(p0, _cpu_probe()), 3)
    r["_load1_before"] = load_before
    return r


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
        warm_fracs = []
        for side in ("A", "B"):
            w = measured_run(trees[side], work, legs)
            warm_fracs.append(w["_external_busy_frac"])
            print(f"{side}: warmup rep discarded "
                  f"(external_busy_frac={w['_external_busy_frac']})",
                  flush=True)
        # quiet-guard baseline: whatever CPU accounting attributes to
        # "external" on an IDLE box during our own warmups (JVM reaping
        # quirks, kernel threads) is the floor; a measured rep is
        # contaminated only when it exceeds the floor by >10 points
        base_frac = max(warm_fracs)
        quiet_margin = float(os.environ.get("BENCH_AB_QUIET_MARGIN", "0.10"))

        runs = {"A": [], "B": []}
        order = []
        for i in range(reps):
            order += ["A", "B"] if i % 2 == 0 else ["B", "A"]
        for side in order:
            r = measured_run(trees[side], work, legs)
            r["_contaminated"] = (
                r["_external_busy_frac"] > base_frac + quiet_margin
            )
            runs[side].append(r)
            line = "  ".join(
                f"{k}={v['sec']}s" for k, v in r["legs"].items()
            )
            mark = (
                f"  [CONTAMINATED: external_busy_frac="
                f"{r['_external_busy_frac']} > base {base_frac}+"
                f"{quiet_margin}]"
                if r["_contaminated"] else ""
            )
            print(f"{side} ({rev_a if side == 'A' else rev_b}): {line}"
                  f"{mark}", flush=True)

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
                # quiet-guard pair filter (r15): a pair with EITHER rep
                # contaminated is dropped — unless that would leave <4
                # pairs, in which case all pairs are kept and the
                # verdict carries the contaminated-session stamp instead
                all_pairs = [
                    (ra, rb)
                    for ra, rb in zip(runs["A"], runs["B"])
                    if leg in ra["legs"] and leg in rb["legs"]
                ]
                clean = [
                    (ra, rb) for ra, rb in all_pairs
                    if not (ra.get("_contaminated") or rb.get("_contaminated"))
                ]
                use, dropped = (
                    (clean, len(all_pairs) - len(clean))
                    if len(clean) >= 4 else (all_pairs, 0)
                )
                pr = sorted(
                    rb["legs"][leg]["sec"] / ra["legs"][leg]["sec"]
                    for ra, rb in use
                )
                n = len(pr)
                lo, hi = pr[n // 4], pr[(3 * n) // 4]
                kind = "paired-iqr"
                if dropped:
                    kind += f"; {dropped} contaminated pair(s) dropped"
                elif len(clean) < len(all_pairs):
                    kind += (
                        f"; CONTAMINATED SESSION: only {len(clean)}/"
                        f"{len(all_pairs)} clean pairs — all kept"
                    )
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

        # AUTO A/A (r15): the r14 rule left "needs A/A control" to hand
        # analysis; now the harness runs it itself — side A's tree on
        # BOTH sides, same staged sources, ABBA, 4 pairs — and stamps
        # each flagged verdict with whether identical code reproduces
        # the deviation (machine artifact) or stays at parity (the A/B
        # ratio may be real).
        needs_aa = [l for l, v in verdicts.items() if "needs A/A" in v]
        aa_control = None
        if needs_aa and os.environ.get("BENCH_AB_AUTO_AA", "1") != "0":
            aa_legs = ",".join(
                l for l in legs.split(",") if l in needs_aa
            )
            print(f"auto A/A control firing for: {aa_legs}", flush=True)
            aa_runs = {"A": [], "B": []}
            for side in ["A", "B", "B", "A", "A", "B", "B", "A"]:
                aa_runs[side].append(
                    measured_run(trees["A"], work, aa_legs)
                )
            aa_control = {"legs": {}, "tree": rev_a, "pairs": 4}
            for leg in needs_aa:
                pr = sorted(
                    rb["legs"][leg]["sec"] / ra["legs"][leg]["sec"]
                    for ra, rb in zip(aa_runs["A"], aa_runs["B"])
                    if leg in ra["legs"] and leg in rb["legs"]
                )
                if not pr:
                    continue
                aa_lo, aa_hi = pr[0], pr[-1]
                aa_med = pr[len(pr) // 2]
                ab_ratio = round(b[leg] / a[leg], 3) if a[leg] > 0 else None
                reproduced = (
                    ab_ratio is not None and aa_lo <= ab_ratio <= aa_hi
                )
                aa_control["legs"][leg] = {
                    "aa_ratio_range": [round(aa_lo, 3), round(aa_hi, 3)],
                    "aa_ratio_median": round(aa_med, 3),
                    "ab_ratio": ab_ratio,
                    "deviation_reproduced_on_identical_code": reproduced,
                }
                verdicts[leg] += (
                    " [auto-A/A: identical-code ratio range "
                    f"{round(aa_lo,3)}..{round(aa_hi,3)} "
                    + ("CONTAINS the A/B ratio — machine artifact, "
                       "not code" if reproduced else
                       "does NOT contain the A/B ratio — may be real")
                    + "]"
                )
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
            "quiet_guard": {
                "warmup_external_busy_frac": warm_fracs,
                "base_frac": base_frac,
                "margin": quiet_margin,
                "rep_fracs_a": [
                    {"frac": r["_external_busy_frac"],
                     "load1_before": r["_load1_before"],
                     "contaminated": r["_contaminated"]}
                    for r in runs["A"]
                ],
                "rep_fracs_b": [
                    {"frac": r["_external_busy_frac"],
                     "load1_before": r["_load1_before"],
                     "contaminated": r["_contaminated"]}
                    for r in runs["B"]
                ],
            },
            "aa_control": aa_control,
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
