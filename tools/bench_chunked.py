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

    results.update(bench_fight_prefix(spark, n_frames=int(os.environ.get(
        "BENCH_FIGHT_FRAMES", 2_000_000))))

    results.update(bench_pack(spark, n_docs=int(os.environ.get(
        "BENCH_PACK_DOCS", 5_000_000))))

    print(json.dumps(results))


def bench_pack(spark, n_docs: int) -> dict:
    """pack_sequences' two-level chunked prefix sum vs the naive unkeyed
    global window (one task sorts the whole corpus). Synthetic docs of
    1-13 tokens from spark.range arithmetic — generation is parallel."""
    import time as _t

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators.curation import pack_sequences
    from aeon_sleap_processing_spark.operators.text import tokenize

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.rtrim(F.repeat(F.lit("w "), (F.col("id") % 13 + 1).cast("int"))).alias("text"),
    )

    def checksum(df):
        t0 = _t.perf_counter()
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("seq_id") * F.col("n_tokens") + F.col("n_docs")).cast("long").alias("chk"),
        ).collect()[0]
        return round(_t.perf_counter() - t0, 2), (row["n"], row["chk"])

    def naive_global(cap: int):
        # identical math with the prefix sum as ONE unkeyed window
        n_tok = F.size(tokenize(F.col("text")))
        base = docs.select("doc_id", n_tok.alias("__n")).where(F.col("__n") > 0)
        wg = W.orderBy("doc_id")
        spans = (
            base.withColumn(
                "__start",
                F.coalesce(
                    F.sum("__n").over(wg.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
                ),
            )
            .withColumn("__end", F.col("__start") + F.col("__n"))
            .withColumn("__s0", F.floor(F.col("__start") / cap))
            .withColumn("__s1", F.floor((F.col("__end") - 1) / cap))
        )
        per_seq = spans.select(
            "__start", "__end", "__s0", "__s1",
            F.explode(F.sequence("__s0", "__s1")).alias("seq_id"),
        )
        lo = F.greatest(F.col("__start"), F.col("seq_id") * cap)
        hi = F.least(F.col("__end"), (F.col("seq_id") + 1) * cap)
        return per_seq.groupBy("seq_id").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(hi - lo).alias("n_tokens"),
        )

    cap = 2048
    g_s, g_chk = checksum(naive_global(cap))
    c_s, c_chk = checksum(
        pack_sequences(docs, capacity=cap, chunk=100_000).select(
            "seq_id", "n_docs", "n_tokens"
        )
    )
    assert g_chk == c_chk, f"pack checksum mismatch: {g_chk} vs {c_chk}"
    return {
        "pack_docs": n_docs,
        "pack_global_s": g_s,
        "pack_chunked_s": c_s,
        "pack_speedup": round(g_s / c_s, 2),
    }


def bench_fight_prefix(spark, n_frames: int) -> dict:
    """Fight-detection relational prefix (grid pivot → conditions → two-phase
    sessionization) at a multi-chunk period size, global vs chunked path.

    Synthetic pose/blob streams from pure spark.range arithmetic — no files,
    ~16 pose rows per frame (2 mice x 8 parts). Planted geometry: 300-frame
    contact-plus-fast-motion bursts every 10k frames (cdist < 20, implausible
    nose-head spread, blob speed > threshold) with a 20-frame all-null
    tail after each burst exercising the empty-frame regroup; elsewhere the
    mice are far apart and the blob is slow. Expected sessions: one merged
    burst+empty group per 10k frames."""
    import time as _t

    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.plans.fights import fight_candidate_sessions

    t0_us = 1_700_000_000_000_000
    frames = spark.range(n_frames).select(F.col("id").alias("f"))
    in_burst = (F.col("f") % 10_000) < 300
    in_hole = ((F.col("f") % 10_000) >= 300) & ((F.col("f") % 10_000) < 320)
    parts = ["nose", "head", "right_ear", "left_ear", "spine1", "spine2", "spine3", "spine4"]

    def mouse(m: int):
        # burst: mice 5 px apart with a 10 px nose-head spread (implausible
        # skeleton -> cond2). quiet: 500 px apart, compact skeleton.
        base_x = F.when(in_burst, 500.0 + m * 5.0).otherwise(200.0 + m * 500.0)
        cols = []
        for i, p in enumerate(parts):
            off = 10.0 if p == "nose" else float(i)
            cols.append(
                F.struct(
                    F.lit("AB"[m]).alias("identity"),
                    F.lit(p).alias("part"),
                    (base_x + off).alias("x"),
                    F.lit(540.0).alias("y"),
                )
            )
        return cols

    pose = (
        frames.where(~in_hole)
        .select(
            F.timestamp_micros(F.lit(t0_us) + F.col("f") * 20_000).alias("time"),
            F.explode(F.array(*mouse(0), *mouse(1))).alias("s"),
        )
        .select("time", "s.identity", "s.part", "s.x", "s.y")
    )
    # blob: one row per frame; moves 2 px/frame during bursts (~18.5 cm/s),
    # 0.1 px/frame otherwise (~0.9 cm/s < 3 threshold)
    blob = frames.select(
        F.timestamp_micros(F.lit(t0_us) + F.col("f") * 20_000).alias("time"),
        (
            F.when(in_burst, (F.col("f") % 10_000) * 2.0).otherwise(
                F.col("f") % 97 * 0.1
            )
        ).alias("x"),
        F.lit(300.0).alias("y"),
    )

    def run(frame_chunk):
        t0 = _t.perf_counter()
        row = (
            fight_candidate_sessions(pose, blob, 50.0, frame_chunk=frame_chunk)
            .select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("first_f") + F.col("last_f") + F.col("n_frames"))
                .cast("long")
                .alias("chk"),
            )
            .collect()[0]
        )
        return round(_t.perf_counter() - t0, 2), (row["n"], row["chk"])

    g_s, g_chk = run(0)  # force the global single-window path
    from aeon_sleap_processing_spark.plans.tube_test import FRAME_CHUNK

    c_s, c_chk = run(FRAME_CHUNK)
    assert g_chk == c_chk, f"fight prefix checksum mismatch: {g_chk} vs {c_chk}"
    return {
        "fight_frames": n_frames,
        "fight_sessions": g_chk[0],
        "fight_global_s": g_s,
        "fight_chunked_s": c_s,
        "fight_speedup": round(g_s / c_s, 2),
    }



if __name__ == "__main__":
    main()
