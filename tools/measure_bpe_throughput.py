"""Measured BPE training throughput at tokenizer-ish merge counts:
sequential greedy (batch_size=1, k driver round-trips) vs batched greedy
(batch_size=m, k/m round-trips), 256 merges over documents at the given
scale factor. Prints one JSON line with wall seconds and merges/minute
for each schedule — the committed evidence behind the batch_size lever
(README "BPE at scale").

Usage: PYTHONPATH=/root/repo python tools/measure_bpe_throughput.py \
    [sf_dir] [num_merges] [batch_sizes_csv]

batch_sizes_csv defaults to "1,8,16" (the r8 256-merge comparison);
"32,64" at num_merges=2048 is the committed tokenizer-scale measurement
(README "BPE at scale"). batch_size=1 at 2048 merges would be ~2048
driver round-trips — only request it at small merge counts.

A 4th arg "stressK" (e.g. stress64) amplifies the corpus VOCABULARY by
suffixing every word with doc_id % K before training: the synthetic
documents hold only 31 distinct words and run dry at 113 merges, far
short of tokenizer merge counts, so measuring >=2048 real merges needs
a derived stress corpus (clearly a capacity measurement, not a
correctness input — the driver queries always run on the table as-is).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aeon_sleap_processing_spark.operators.text import bpe_train
from aeon_sleap_processing_spark.session import get_spark
from aeon_sleap_processing_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batches = [int(b) for b in (sys.argv[3] if len(sys.argv) > 3 else "1,8,16").split(",")]
    stress = 0
    if len(sys.argv) > 4 and sys.argv[4].startswith("stress"):
        stress = int(sys.argv[4][len("stress"):])
    spark = get_spark(shuffle_partitions=32)
    docs = load_table(spark, "documents", sf_dir)
    if stress:
        from pyspark.sql import functions as F

        docs = docs.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda w: F.concat(
                        w, F.lit("x"), (F.col("doc_id") % stress).cast("string")
                    ),
                ),
                " ",
            ),
        )
    docs.count()  # warm the scan/session out of the measurement

    out = {"sf_dir": sf_dir, "num_merges": k, "stress_vocab_x": stress or 1}
    for m in batches:
        label = f"batched_b{m}" if m > 1 else "sequential_b1"
        t0 = time.monotonic()
        merges = bpe_train(docs, num_merges=k, batch_size=m).collect()
        dt = time.monotonic() - t0
        out[label] = {
            "merges": len(merges),
            "sec": round(dt, 1),
            "merges_per_min": round(60.0 * len(merges) / dt, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
