"""Streaming ingest throughput at scale — committed rows/sec for the
streaming wing (streaming/watch.py), which until now had correctness +
restart tests but no throughput evidence.

Drives the sf10 ramp tables (tools/make_scale_data.py at scale=100:
10M events, 500k documents) through real file-source streams split into
micro-batches (maxFilesPerTrigger), Trigger.AvailableNow, so state
genuinely crosses batch boundaries — not one giant batch in disguise:

- dedup:            stream_dedup (dropDuplicatesWithinWatermark) -> noop
- sessionize_sql:   stream_sessionize (JVM session_window agg)   -> noop
- sessionize_state: stream_sessionize_stateful
                    (applyInPandasWithState, Arrow)              -> noop
- pack:             stream_pack_sequences (stateful packing)     -> noop
- compacted_sink:   stream_append_compacted (parquet tier with
                    built-in small-file compaction)              -> disk
- semantic_dedup:   stream_semantic_dedup (disk-resident rep store,
                    OR-amplified LSH candidate joins) over 200k
                    vectors in 100-wide planted near-dup cliques -> disk

The sql-vs-state sessionize pair doubles as the committed JVM-vs-Python
stateful-operator throughput comparison. The semantic leg asserts the
planted structure back out: 200k vectors in 2,000 cliques (copies at
cosine ~0.9999) must dedup to exactly 2,000 representatives. Writes
bench_runs_r10/stream_throughput.json and prints a table.
Run ISOLATED (no concurrent Spark jobs) per the bench protocol.

Usage: python tools/measure_stream_throughput.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "benchdata", "sf10")

N_FILES = 16
FILES_PER_TRIGGER = 2  # -> 8 micro-batches per pipeline


def main() -> None:
    if not os.path.isdir(SF10):
        raise SystemExit(
            "benchdata/sf10 missing — python tools/make_scale_data.py 100 "
            "benchdata/sf10"
        )

    from aeon_sleap_processing_spark.session import get_spark

    spark = get_spark(app_name="stream-throughput", shuffle_partitions=32)
    # the staging dir holds full repartitioned copies of the sf10 tables
    # (GBs) — remove it on EVERY exit path, not just success
    work = tempfile.mkdtemp(prefix="stream_tput_")
    try:
        _measure(spark, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _measure(spark, work: str) -> None:
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.sources import load_table
    from aeon_sleap_processing_spark.streaming import watch as W

    # --- stage the file-stream sources (not part of the measurement) ---
    ev = load_table(spark, "events", SF10).select(
        F.col("ts").alias("time"), "user_id", "event_id"
    )
    n_events = ev.count()
    ev_src = os.path.join(work, "events_src")
    ev.repartition(N_FILES).write.parquet(ev_src)

    docs = load_table(spark, "documents", SF10).select(
        "doc_id",
        (F.col("doc_id") % 32).alias("shard"),
        (F.greatest(F.col("n_chars") / 4, F.lit(1))).cast("int").alias("n_tokens"),
    )
    n_docs = docs.count()
    doc_src = os.path.join(work, "docs_src")
    docs.repartition(N_FILES).write.parquet(doc_src)

    def file_stream(src: str, schema: str):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(src)
        )

    EV_SCHEMA = "time timestamp, user_id long, event_id long"
    DOC_SCHEMA = "doc_id long, shard long, n_tokens int"

    out = {
        "n_events": n_events,
        "n_docs": n_docs,
        "micro_batches": N_FILES // FILES_PER_TRIGGER,
        "pipelines": {},
    }

    def run(name: str, n_rows: int, start_query) -> None:
        ckpt = os.path.join(work, f"ckpt_{name}")
        t0 = time.monotonic()
        q = start_query(ckpt)
        q.awaitTermination()
        dt = time.monotonic() - t0
        out["pipelines"][name] = {
            "rows": n_rows,
            "sec": round(dt, 1),
            "rows_per_sec": int(n_rows / dt),
        }
        print(
            f"{name:18s} {n_rows:>9,} rows  {dt:7.1f} s  "
            f"{int(n_rows / dt):>9,} rows/s",
            flush=True,
        )

    def noop(df, ckpt, mode="append"):
        return (
            df.writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    run(
        "dedup", n_events,
        lambda ckpt: noop(
            W.stream_dedup(file_stream(ev_src, EV_SCHEMA), keys=["event_id"]),
            ckpt,
        ),
    )
    run(
        "sessionize_sql", n_events,
        lambda ckpt: noop(
            W.stream_sessionize(
                file_stream(ev_src, EV_SCHEMA),
                gap="30 minutes", partition_by="user_id", watermark="1 hour",
            ),
            ckpt,  # session_window aggs support append (with watermark) only
        ),
    )
    run(
        "sessionize_state", n_events,
        lambda ckpt: noop(
            W.stream_sessionize_stateful(
                file_stream(ev_src, EV_SCHEMA),
                gap=1800.0, partition_by="user_id", watermark="1 hour",
            ),
            ckpt,
        ),
    )
    run(
        "pack", n_docs,
        lambda ckpt: noop(
            W.stream_pack_sequences(
                file_stream(doc_src, DOC_SCHEMA), capacity=512
            ),
            ckpt,
        ),
    )
    sink_dir = os.path.join(work, "compacted_out")
    run(
        "compacted_sink", n_events,
        lambda ckpt: W.stream_append_compacted(
            file_stream(ev_src, EV_SCHEMA), sink_dir, ckpt, compact_every=4
        ),
    )
    # sanity: the compacted tier holds every ingested row exactly once
    got = W.read_compacted_store(spark, sink_dir).count()
    assert got == n_events, f"compacted sink row loss: {got} != {n_events}"

    import numpy as np

    emb = load_table(spark, "embeddings", SF10).select("vec_id", "embedding")
    n_vecs = emb.count()
    dim = len(emb.select("embedding").first()[0])
    emb_src = os.path.join(work, "emb_src")
    emb.repartition(N_FILES).write.parquet(emb_src)
    # 6 tables x 16 planes: a cos-0.9999 clique pair collides w.p. ~1
    # while random near-orthogonal pairs collide in any table w.p.
    # 6 * 2^-16 — candidates stay linear-ish per batch (the
    # measure_neardup_threshold.py regime, not the 4-plane driver bands)
    planes = np.random.default_rng(7).standard_normal((96, dim)).tolist()
    # r10: BOTH rep-store layouts — the flat r9 layout (full-store scan
    # per batch; wins below the ~300k crossover this 200k corpus sits
    # under) and the bucketed default (the unbounded-store scale path;
    # pays its fixed per-batch pruning/write tax here). The layout curve
    # itself is bench_runs_r10/repstore_layout.json.
    for leg, p in (("semantic_dedup_flat", 0), ("semantic_dedup_bucketed", 16)):
        sem_out = os.path.join(work, f"sem_out_{p}")
        run(
            leg, n_vecs,
            lambda ckpt, _o=sem_out, _p=p: W.stream_semantic_dedup(
                file_stream(emb_src, "vec_id long, embedding array<float>"),
                _o, ckpt, planes, threshold=0.95, n_tables=6,
                store_partitions=_p,
            ),
        )
        reps = W.read_semantic_reps(spark, sem_out).count()
        # 2,000 cliques of 100 (make_scale_data at scale=100): one rep
        # each. An LSH candidate MISS surfaces here as an extra rep —
        # inherent to any LSH generator. Assert no clique LOST
        # (reps >= cliques) and miss rate under 1%; report the recall.
        assert 2000 <= reps <= 2000 + (n_vecs - 2000) // 100, (
            f"{leg} kept {reps} reps, expected ~2000"
        )
        out[f"{leg}_reps"] = reps
        out[f"{leg}_recall"] = round((n_vecs - reps) / (n_vecs - 2000), 5)

    os.makedirs(os.path.join(REPO, "bench_runs_r10"), exist_ok=True)
    path = os.path.join(REPO, "bench_runs_r10", "stream_throughput.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
