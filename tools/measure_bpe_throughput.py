"""Measured BPE training throughput at tokenizer-ish merge counts:
sequential greedy (batch_size=1, k driver round-trips) vs batched greedy
(batch_size=m, k/m round-trips), 256 merges over documents at the given
scale factor. Prints one JSON line with wall seconds and merges/minute
for each schedule — the committed evidence behind the batch_size lever
(README "BPE at scale").

Usage: PYTHONPATH=/root/repo python tools/measure_bpe_throughput.py [sf_dir] [num_merges]
"""

import json
import sys
import time

from aeon_sleap_processing_spark.operators.text import bpe_train
from aeon_sleap_processing_spark.session import get_spark
from aeon_sleap_processing_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark(shuffle_partitions=32)
    docs = load_table(spark, "documents", sf_dir)
    docs.count()  # warm the scan/session out of the measurement

    out = {"sf_dir": sf_dir, "num_merges": k}
    for label, m in (("sequential_b1", 1), ("batched_b8", 8), ("batched_b16", 16)):
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
