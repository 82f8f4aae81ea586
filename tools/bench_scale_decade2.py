"""Second ramp decade for the >3x queries (r13 VERDICT task 4): the
sf0.1→sf1 ramp flagged q_asof_nearest 3.7x, q_minhash_est_vs_exact 9.9x,
q_pack_sequences 3.0x at 10x rows — ambiguous between near-linear-with-
constant (wall = a + b·n: the fixed a shrinks relative to b·n, so one
decade can read as 3-10x) and genuinely superlinear (wall ~ n^e, e > 1).
A third point at sf10 (benchdata/sf10, 100x sf0.1 — the
make_scale_data.py generator at scale=100) separates them: per query,
fit the decade-2 exponent e2 = log10(sf10/sf1). Near-linear ⇒ e2 → 1
as the constant washes out; superlinear ⇒ e2 holds above 1.

asof is the reference's most-used join (J2,
generate_composite_quadrant_videos.py:112-118), so its exponent is the
one that matters most at 100 TB.

Writes bench_runs_r14/scale_decade2.json.
Run ISOLATED per the bench protocol.
Usage: python tools/bench_scale_decade2.py [runs=3] [--only=a,b]
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = ["q_asof_nearest", "q_minhash_est_vs_exact", "q_pack_sequences"]
LEGS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, "benchdata", "sf1")),
    ("sf10", os.path.join(REPO, "benchdata", "sf10")),
]


def main() -> None:
    argv = sys.argv[1:]
    only, args = None, []
    for a in argv:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        else:
            args.append(a)
    runs = int(args[0]) if args else 3
    names = only or QUERIES

    import __spark_entry__ as entry
    from bench_scale import time_queries

    from aeon_sleap_processing_spark.session import get_spark

    for _, d in LEGS:
        if not os.path.isdir(d):
            raise SystemExit(
                f"missing ramp leg {d} — generate with "
                f"tools/make_scale_data.py [10|100] <out_dir>"
            )
    spark = get_spark(app_name="bench-scale-decade2", shuffle_partitions=32)
    out = time_queries(spark, entry.queries(), names, LEGS, runs)
    for name, rec in out.items():
        e1 = math.log10(max(rec["sf1"], 1e-3) / max(rec["sf0.1"], 1e-3))
        e2 = math.log10(max(rec["sf10"], 1e-3) / max(rec["sf1"], 1e-3))
        rec["exponent_decade1"] = round(e1, 2)
        rec["exponent_decade2"] = round(e2, 2)
        print(f"{name}: e1={rec['exponent_decade1']} "
              f"e2={rec['exponent_decade2']}")
    doc = {
        "runs": runs,
        "legs": {k: v for k, v in LEGS},
        "queries": out,
        "note": (
            "exponent_decadeN = log10(wall ratio) across that decade; "
            "1.0 = linear. Decade 1 exponents are inflated by the "
            "fixed-overhead constant at sf0.1; decade 2 is the "
            "scaling claim."
        ),
    }
    os.makedirs(os.path.join(REPO, "bench_runs_r14"), exist_ok=True)
    with open(os.path.join(REPO, "bench_runs_r14",
                           "scale_decade2.json"), "w") as f:
        json.dump(doc, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
