#!/usr/bin/env python
"""Phase breakdown of q_cdc_stream_source (r16, guide §1): where do the
~4-7 s go — store writes, compaction, or the two Structured Streaming
drains? Run twice; report both passes (first pass carries JVM/stream
machinery warm-up)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as em
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import sinks as sk
    from aeon_sleap_processing_spark.sources.catalog import (
        TESTDATA_TABLES,
        load_table,
    )
    from aeon_sleap_processing_spark.streaming.cdc_source import (
        ManifestCDCDataSource,
    )

    spark = get_spark(app_name="cdc-phases")
    for t in TESTDATA_TABLES:
        load_table(spark, t, sf_dir).count()
    spark.dataSource.register(ManifestCDCDataSource)

    out: list[dict] = []
    for rep in range(2):
        base = em._manifest_docs_base(spark, sf_dir)
        path = em._scratch_store("cdc_stream", sf_dir)
        ph: dict[str, float] = {}
        t0 = time.perf_counter()

        def mark(name: str) -> None:
            nonlocal t0
            t1 = time.perf_counter()
            ph[name] = round(t1 - t0, 3)
            t0 = t1

        sk.write_manifested(
            spark, base.where("doc_id % 3 != 0"), path,
            partition_by=["lang"], replace="all",
        )
        mark("write_A")
        ckpt = tempfile.mkdtemp(prefix="aeon_cdc_phase_ckpt_")
        got: list = []

        def drain(leg: str, io: str) -> None:
            rows: list = []
            q = (
                spark.readStream.format("manifest_cdc")
                .option("io", io)
                .load(path)
                .writeStream.foreachBatch(
                    lambda d, b: rows.extend(
                        (r["doc_id"], r["lang"], r["n_chars"])
                        for r in d.collect()
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            got.extend((leg, *t) for t in rows)

        drain("snapshot", "auto")
        mark("drain_snapshot")
        sk.compact_manifested(spark, path, min_files_to_compact=2)
        mark("compact")
        sk.write_manifested(
            spark, base.where("doc_id % 3 = 0"), path, partition_by=["lang"]
        )
        mark("write_B")
        drain("delta", "pyarrow")
        mark("drain_delta")
        shutil.rmtree(ckpt, ignore_errors=True)
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            got, "leg string, doc_id long, lang string, n_chars long"
        )
        res = df.groupBy("lang", "leg").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("id_sum"),
        ).collect()
        mark("final_agg")
        ph["total"] = round(sum(ph.values()), 3)
        ph["n_rows"] = len(res)
        out.append(ph)
        print(json.dumps({"rep": rep, **ph}))

    with open("bench_runs_r16/cdc_phases.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
