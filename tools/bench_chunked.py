#!/usr/bin/env python
"""Measure the chunked time-axis operators against their global forms on an
unkeyed stream big enough that the single-partition sort dominates.

The global unkeyed asof/sessionize plans sort EVERYTHING in one task (Spark
warns "No Partition Defined for Window operation"); the chunked forms turn
the time axis into the window partition key. This benchmark generates a
multi-million-row tick stream driver-free (spark.range arithmetic, no data
files) and reports wall seconds for each strategy plus a result checksum
proving equivalence.

Usage: python tools/bench_chunked.py [n_left_millions] (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_left = int(float(sys.argv[1]) * 1_000_000) if len(sys.argv) > 1 else 10_000_000
    n_right = n_left // 10

    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators.temporal import (
        asof_join,
        chunked_asof_join,
        chunked_sessionize,
        sessionize,
    )
    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="bench-chunked")

    # left: dense 100 ms ticks; right: sparse 1 s readings with phase offset.
    # Pure arithmetic on spark.range — generation is parallel and free.
    left = spark.range(n_left).select(
        F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id") * 100_000).alias("time"),
        F.col("id").alias("lv"),
    )
    right = spark.range(n_right).select(
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000 + 37_000
        ).alias("time"),
        (F.col("id") % 1000).cast("double").alias("rv"),
    )

    def run(df):
        t0 = time.perf_counter()
        row = df.select(
            F.count(F.lit(1)).alias("n"), F.sum("rv").cast("long").alias("chk")
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), (row["n"], row["chk"])

    results: dict[str, object] = {"n_left": n_left, "n_right": n_right}

    g_s, g_chk = run(asof_join(left, right, on="time", tolerance=0.5))
    c_s, c_chk = run(
        chunked_asof_join(left, right, on="time", tolerance=0.5, chunk=3600.0)
    )
    assert g_chk == c_chk, f"asof checksum mismatch: {g_chk} vs {c_chk}"
    results["asof_global_s"] = g_s
    results["asof_chunked_s"] = c_s
    results["asof_speedup"] = round(g_s / c_s, 2)

    # sessionization: bursty stream (drop 2 of every 60 ticks → gaps)
    ev = left.where((F.col("lv") % 60) < 58).select("time")

    def run_sess(df):
        t0 = time.perf_counter()
        row = (
            df.groupBy("session_id")
            .count()
            .select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("session_id") * F.col("count")).cast("long").alias("chk"),
            )
            .collect()[0]
        )
        return round(time.perf_counter() - t0, 2), (row["n"], row["chk"])

    gs_s, gs_chk = run_sess(sessionize(ev, "time", gap=0.15))
    cs_s, cs_chk = run_sess(chunked_sessionize(ev, "time", gap=0.15, chunk=3600.0))
    assert gs_chk == cs_chk, f"sessionize checksum mismatch: {gs_chk} vs {cs_chk}"
    results["sessionize_global_s"] = gs_s
    results["sessionize_chunked_s"] = cs_s
    results["sessionize_speedup"] = round(gs_s / cs_s, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
