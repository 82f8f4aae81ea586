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


# By-design exceptions, keyed on (query, flag-kind) so only the justified
# flag TYPE is downgraded to ok* — an unrelated regression (e.g. a pruning
# break) on the same query still WARNs. Each justified where implemented:
# - q_fight_sessions: below the CHUNKED_SWITCH_FRAMES threshold the
#   detection pipelines adaptively pick the global single-window forms
#   (plans/tube_test.py; threshold MEASURED by bench_pipelines --crossover,
#   crossover between 1.1M and 2.2M frames) — the right plan for an
#   in-memory-sized period; the chunked twin q_fight_sessions_chunked runs
#   the scale path against the identical oracle. (q_tube_events takes the
#   same adaptive path but its current plan stays under the flag
#   thresholds, so it carries no exception — if it ever flags, that is a
#   real change to investigate, not an auto-waive.)
# - q_fight_sessions_chunked: the forced scale path joins the blob-speed
#   stream and the anti-join of phase-2 against phase-1 survivors — both
#   stream-sized equi-joins on the dense frame axis, NOT broadcastable at
#   scale, so SMJ is the intended plan; the shuffles are per-chunk bounded.
# - q_bloom_migration: the union of three POINT legs, each an ungrouped
#   one-row aggregate (count/sum over a bloom-bounded point read — the
#   query's entire purpose). An ungrouped agg is a single-partition
#   exchange by definition, and its payload is one partial-agg row per
#   input partition of a ≤-few-files scan; the same one-row-global-agg
#   shape q_neardup_recall documents, three times because three point
#   ids face the migrated index.
EXPECTED_FLAGS = {
    ("q_fight_sessions", "multiple single-partition exchanges"),
    ("q_fight_sessions_chunked", "many-shuffle SMJ"),
    ("q_bloom_migration", "multiple single-partition exchanges"),
}


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
        # Split whole-stream single-partition exchanges (a scale problem)
        # from chunk-summary ones: the chunked time-axis operators
        # (operators/temporal.py chunked_*) scan a one-row-per-chunk
        # boundary table with an ordered window, and that exchange's child
        # is structurally a __chunk-keyed aggregate — bounded by chunk
        # count, not data size.
        lines = plan.splitlines()
        sp_total = sp_chunk = 0
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            sp_total += 1
            child = lines[i + 1] if i + 1 < len(lines) else ""
            if "keys=[__chunk" in child:
                sp_chunk += 1
        facts = {
            "bhj": plan.count("BroadcastHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shuffles": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
            "single_part": sp_total - sp_chunk,
            "sp_chunk": sp_chunk,
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
        unexpected = [f for f in flags if (name, f) not in EXPECTED_FLAGS]
        status = "WARN" if flags else "ok"
        if flags and not unexpected:
            status = "ok*"  # by-design, justified at the implementation site
        elif unexpected:
            problems += 1
        print(f"{status:4} {name}: {facts} scan_widths={widths} {';'.join(flags)}")
    print(f"\n{problems} queries flagged")
    return 0


if __name__ == "__main__":
    main()
