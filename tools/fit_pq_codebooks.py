"""Fit PQ codebooks for the driver contract's PQ legs.

Runs ``pq_fit_codebooks`` (one pyspark.ml KMeans per subspace, fixed
seeds) and pins the fitted codebooks to committed JSONs, so the Spark
plans (q_knn_pq, q_knn_ivf_pq, q_knn_ivf_pq_clustered) and their DuckDB
oracles embed byte-identical codebook literals (the
ivf_centroids_trained.json technique), and the driver gate never depends
on MLlib run-to-run reproducibility.

PER-CORPUS training (r9): each testdata SF carries an INDEPENDENT random
draw of vectors (sf0.01 ids are not a prefix of sf0.1), and
fine-grained PQ codebooks do not transfer across draws of clusterless
data — sf0.01-trained books scored recall@5 0.26 on sf0.1. So the
quantizer is trained on the corpus it serves: one JSON per SF, resolved
by __spark_entry__._pq_books(sf_dir). The oracle gate runs at sf0.01
and embeds that SF's books.

Shape m=32 x ksub=16 (2-dim subspaces, 4-bit codes, 16x compression):
measured recall@5 vs exact top-5, trained-on-corpus — sf0.01: 0.60
ADC-only / 0.68 with IVF-PQ refine; sf0.1: 0.54 / 0.58. The m=16
(4-dim subspace) shape at the same 1024-double literal budget scored
0.52/0.62 at sf0.01 but only 0.32/0.42 at sf0.1 — finer subspaces are
what holds the floor as the corpus grows.

Re-run only when a training corpus or (m, ksub) changes:

    python tools/fit_pq_codebooks.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 32
KSUB = 16
SEED = 11
HERE = os.path.dirname(os.path.abspath(__file__))
CORPORA = {
    "/root/testdata/sf0.01": os.path.join(HERE, "pq_codebooks_trained.json"),
    "/root/testdata/sf0.1": os.path.join(
        HERE, "pq_codebooks_trained_sf0.1.json"
    ),
}


def main() -> None:
    from aeon_sleap_processing_spark.operators.similarity import (
        pq_fit_codebooks,
    )
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources import load_table

    spark = get_spark(app_name="fit-pq-codebooks", shuffle_partitions=8)
    for sf_dir, out in CORPORA.items():
        emb = load_table(spark, "embeddings", sf_dir)
        books = pq_fit_codebooks(emb, m=M, ksub=KSUB, seed=SEED, max_iter=20)
        with open(out, "w") as f:
            json.dump(
                {"m": M, "ksub": KSUB, "seed": SEED, "sf_dir": sf_dir,
                 "codebooks": books},
                f,
            )
        print(f"wrote {M}x{KSUB} codebooks for {sf_dir} -> {out}")


if __name__ == "__main__":
    main()
