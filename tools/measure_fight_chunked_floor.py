"""Py4j/analysis-vs-execution breakdown for q_fight_sessions_chunked
(the r7/r8 judge ask: hit <=2.0 s at sf-independent fixture scale or
commit the floor evidence).

Times, over 3 warm repetitions:
- total plan CONSTRUCTION (python-side pipeline build, including the
  pipeline's 4 deliberate eager localCheckpoints, each of which runs a
  lineage-truncation job at fixture scale), with per-checkpoint wall
  via a monkeypatched DataFrame.localCheckpoint;
- EXECUTION of the final plan (noop write).

The checkpoints exist because Spark does not dedupe common subplans:
without them the grid pivot / survivor stream / sessionize stages
re-evaluate once per downstream reference (fights.py:193,572,590,
pose_features.py:168) — the correct trade at cluster scale, a fixed
~0.3-0.5 s apiece at the 321-frame fixture. Removing them would win
the micro-bench and lose the 100 TB plan.

Writes bench_runs_r9/fight_chunked_floor.json.

Usage: python tools/measure_fight_chunked_floor.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entry  # REPO is on sys.path (line 29)

    from pyspark.sql.classic.dataframe import DataFrame

    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="fight-chunked-floor", shuffle_partitions=32)
    q = entry.queries()["q_fight_sessions_chunked"]
    sf = "/root/testdata/sf0.1"

    ckpt_times: list[float] = []
    orig = DataFrame.localCheckpoint

    def timed_ckpt(self, eager=True):
        t0 = time.monotonic()
        out = orig(self, eager=eager)
        ckpt_times.append(round(time.monotonic() - t0, 3))
        return out

    DataFrame.localCheckpoint = timed_ckpt
    try:
        q(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(3):
            ckpt_times.clear()
            t0 = time.monotonic()
            df = q(spark, sf)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            runs.append(
                {
                    "construct_s": round(t1 - t0, 2),
                    "execute_s": round(t2 - t1, 2),
                    "total_s": round(t2 - t0, 2),
                    "eager_checkpoints_s": list(ckpt_times),
                    "checkpoint_sum_s": round(sum(ckpt_times), 2),
                }
            )
    finally:
        DataFrame.localCheckpoint = orig

    out = {
        "query": "q_fight_sessions_chunked",
        "runs": runs,
        "note": (
            "construct includes the pipeline's eager lineage-truncation "
            "checkpoints (jobs); the non-checkpoint remainder is py4j/"
            "analyzer plan-build floor; execute is the final noop write"
        ),
    }
    os.makedirs(os.path.join(REPO, "bench_runs_r9"), exist_ok=True)
    path = os.path.join(REPO, "bench_runs_r9", "fight_chunked_floor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
