"""Fit the IVF coarse quantizer for the driver contract's trained-IVF leg.

Runs ``ivf_fit_centroids`` (pyspark.ml KMeans, fixed seed) on the sf0.01
embeddings and pins the fitted unit-norm centers to
``tools/ivf_centroids_trained.json`` — a COMMITTED artifact, so both the
Spark plan (q_knn_ivf_trained) and its DuckDB oracle embed byte-identical
centroid literals (the q_knn_lsh technique), and the driver gate never
depends on MLlib run-to-run reproducibility.

Re-run only when the training corpus or cell count changes:

    python tools/fit_ivf_centroids.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CELLS = 16
SEED = 7
SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ivf_centroids_trained.json")


def main() -> None:
    from aeon_sleap_processing_spark.operators.similarity import (
        ivf_fit_centroids,
    )
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    spark = get_spark(app_name="fit-ivf-centroids", shuffle_partitions=8)
    emb = load_table(spark, "embeddings", SF_DIR)
    cents = ivf_fit_centroids(emb, n_cells=N_CELLS, seed=SEED, max_iter=20)
    with open(OUT, "w") as f:
        json.dump(
            {"n_cells": N_CELLS, "seed": SEED, "sf_dir": SF_DIR,
             "centroids": cents},
            f,
        )
    print(f"wrote {len(cents)} centroids (dim {len(cents[0])}) -> {OUT}")


if __name__ == "__main__":
    main()
