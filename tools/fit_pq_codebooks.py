"""Fit PQ codebooks for the driver contract's PQ legs.

Runs ``pq_fit_codebooks`` (one pyspark.ml KMeans per subspace, fixed
seeds) on the sf0.01 embeddings and pins the fitted codebooks to
``tools/pq_codebooks_trained.json`` — a COMMITTED artifact, so the Spark
plans (q_knn_pq, q_knn_ivf_pq) and their DuckDB oracles embed
byte-identical codebook literals (the ivf_centroids_trained.json
technique), and the driver gate never depends on MLlib run-to-run
reproducibility.

Re-run only when the training corpus or (m, ksub) changes:

    python tools/fit_pq_codebooks.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# m=16 x ksub=16 (4-dim subspaces, 4-bit codes): measured recall@5 at
# sf0.01 vs exact top-5 is 0.52 ADC-only / 0.62 under knn_ivf_pq's
# refine — m=8 halves the literal budget but ADC-only drops to 0.24 on
# these near-orthogonal synthetic vectors
M = 16
KSUB = 16
SEED = 11
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pq_codebooks_trained.json")


def main() -> None:
    from aeon_sleap_processing_spark.operators.similarity import (
        pq_fit_codebooks,
    )
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    spark = get_spark(app_name="fit-pq-codebooks", shuffle_partitions=8)
    emb = load_table(spark, "embeddings", SF_DIR)
    books = pq_fit_codebooks(emb, m=M, ksub=KSUB, seed=SEED, max_iter=20)
    with open(OUT, "w") as f:
        json.dump(
            {"m": M, "ksub": KSUB, "seed": SEED, "sf_dir": SF_DIR,
             "codebooks": books},
            f,
        )
    print(f"wrote {M}x{KSUB} codebooks (sub {len(books[0][0])}) -> {OUT}")


if __name__ == "__main__":
    main()
