"""Single-side runner for tools/bench_ab_stream.py: executes the streaming
legs ONCE against whichever tree's package is first on PYTHONPATH (the
orchestrator sets it), in one fresh JVM, and prints one JSON line.

Sources are pre-staged by the orchestrator (identical bytes for both
sides); checkpoints/sinks are per-invocation temp dirs. Legs degrade
gracefully across package generations: kwargs a tree's function does not
take (store_partitions before r10, commit before r11) are dropped via
signature introspection, so the same runner drives r9/r10/r11 trees —
each side runs ITS OWN default path, which is exactly the comparison.

Usage (orchestrator-only): _stream_leg_runner.py <work_dir> <legs_csv>
"""

import inspect
import json
import os
import shutil
import sys
import tempfile
import time


def _kw(fn, **kwargs):
    sig = inspect.signature(fn)
    return {k: v for k, v in kwargs.items() if k in sig.parameters}


def main() -> None:
    work, legs = sys.argv[1], sys.argv[2].split(",")

    import numpy as np

    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.streaming import watch as W

    spark = get_spark(app_name="stream-ab", shuffle_partitions=32)
    out: dict = {"legs": {}}
    scratch = tempfile.mkdtemp(prefix="stream_ab_")
    try:
        ev_src = os.path.join(work, "events_src")
        emb_src = os.path.join(work, "emb_src")
        meta = json.load(open(os.path.join(work, "meta.json")))
        EV_SCHEMA = "time timestamp, user_id long, event_id long"
        EMB_SCHEMA = "vec_id long, embedding array<float>"

        def file_stream(src, schema):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", meta["files_per_trigger"])
                .parquet(src)
            )

        def run(name, n_rows, start):
            ckpt = os.path.join(scratch, f"ckpt_{name}")
            t0 = time.monotonic()
            q = start(ckpt)
            q.awaitTermination()
            dt = time.monotonic() - t0
            out["legs"][name] = {"rows": n_rows, "sec": round(dt, 2)}

        def noop(df, ckpt):
            return (
                df.writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        if "dedup" in legs:  # untouched control leg
            run(
                "dedup", meta["n_events"],
                lambda ckpt: noop(
                    W.stream_dedup(
                        file_stream(ev_src, EV_SCHEMA), keys=["event_id"]
                    ),
                    ckpt,
                ),
            )
        if "compacted_sink" in legs:
            sink = os.path.join(scratch, "compacted_out")
            run(
                "compacted_sink", meta["n_events"],
                lambda ckpt: W.stream_append_compacted(
                    file_stream(ev_src, EV_SCHEMA), sink, ckpt,
                    compact_every=4,
                ),
            )
            got = W.read_compacted_store(spark, sink).count()
            assert got == meta["n_events"], f"sink row loss: {got}"
        if "compacted_sink_listing" in legs and (
            "commit" in inspect.signature(W.stream_append_compacted).parameters
        ):
            sink = os.path.join(scratch, "compacted_out_listing")
            run(
                "compacted_sink_listing", meta["n_events"],
                lambda ckpt: W.stream_append_compacted(
                    file_stream(ev_src, EV_SCHEMA), sink, ckpt,
                    compact_every=4, commit="listing",
                ),
            )
        dim = meta["dim"]
        planes = np.random.default_rng(7).standard_normal((96, dim)).tolist()
        for leg, p in (("semantic_flat", 0), ("semantic_bucketed", 16)):
            if leg not in legs:
                continue
            fn = W.stream_semantic_dedup
            if p and "store_partitions" not in inspect.signature(fn).parameters:
                continue  # pre-r10 tree has no bucketed layout
            sem_out = os.path.join(scratch, f"sem_out_{p}")
            run(
                leg, meta["n_vecs"],
                lambda ckpt, _o=sem_out: fn(
                    file_stream(emb_src, EMB_SCHEMA), _o, ckpt, planes,
                    threshold=0.95, n_tables=6,
                    **_kw(fn, store_partitions=p),
                ),
            )
            out["legs"][leg]["reps"] = W.read_semantic_reps(
                spark, sem_out
            ).count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
