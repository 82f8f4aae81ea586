#!/usr/bin/env python
"""Physical-plan audit over the query surface.

For each query: join strategies, shuffle count, pushed filters, scan schema
width. Flags regressions a human would catch in `.explain("formatted")` —
run after plan-affecting changes.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# By-design exceptions (reported as ok*, not WARN), each justified where
# implemented:
# - q_minhash_est_vs_exact: sort-merge joins on doc_id attach the signature
#   table to candidate pairs; signatures are corpus-sized (one row per doc)
#   and NOT broadcastable at scale, so SMJ is the correct plan.
# - q_fight_sessions: the detection pipelines run frame-order windows
#   unkeyed by design — one chunk/period per run, fanned out by
#   plans/orchestration.py at fleet scale (the reference's SLURM-array
#   geometry); within a chunk the frame grid fits one executor.
EXPECTED_FLAGS = {"q_minhash_est_vs_exact", "q_fight_sessions"}


def main() -> int:
    import __spark_entry__ as em
    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    sf = "/root/testdata/sf0.01"
    qs = em.queries()
    names = sys.argv[1:] or list(qs)

    problems = 0
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        facts = {
            "bhj": plan.count("BroadcastHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shuffles": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
            "single_part": plan.count("Exchange SinglePartition"),
        }
        # stop at end-of-line: Spark truncates long plan strings, so a
        # greedy [^>]* can spill across scans and overcount columns
        schemas = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
        widths = [len(s.split(",")) for s in schemas if s]
        flags = []
        if facts["smj"] and facts["shuffles"] > 3:
            flags.append("many-shuffle SMJ")
        if facts["single_part"] > 1:
            flags.append("multiple single-partition exchanges")
        if any(w > 12 for w in widths):
            flags.append(f"wide scan ({max(widths)} cols) — check column pruning")
        status = "WARN" if flags else "ok"
        if flags and name in EXPECTED_FLAGS:
            status = "ok*"  # by-design, justified at the implementation site
        elif flags:
            problems += 1
        print(f"{status:4} {name}: {facts} scan_widths={widths} {';'.join(flags)}")
    print(f"\n{problems} queries flagged")
    return 0


if __name__ == "__main__":
    main()
