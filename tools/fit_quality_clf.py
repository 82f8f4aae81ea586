#!/usr/bin/env python
"""Fit the pinned linear quality classifier (tools/quality_clf_trained.json).

The classifier-filter stage of a training-data pipeline (the CCNet/GPT-3
"quality classifier" shape): a LOGISTIC REGRESSION over per-document surface
features, trained offline with pyspark.ml, with the fitted coefficients
PINNED to a committed JSON that both the Spark operator
(operators/text.py:quality_classifier) and the DuckDB oracle embed as
literals — the ivf_centroids_trained.json technique, so the driver's
value-hash gate checks the full score arithmetic cross-engine.

Features (all from text_stats' ROUNDED columns, so the feature vector is
already cross-engine exact):
    x0 = stop_ratio (6dp)   x1 = avg_token_len (6dp)
    x2 = least(n_tokens, 200) / 200

Label: DISTILLATION — teacher = the composite text_stats quality_score
(the "expensive scorer" stand-in), label = quality_score >= 0.52 (54%%
positive at sf0.01). The student sees a DIFFERENT, cheaper feature set
(no punct term — identically zero on this corpus; a 200-token saturation
where the teacher saturates at 100), so it approximates the teacher
rather than replaying it — the fastText-distilled-from-LLM-judgments
shape real pipelines use. The lang column was measured to carry ZERO
text signal in this synthetic corpus (AUC 0.52), so a lang label would
have pinned noise. Train at sf0.01 (the oracle-gate corpus); weights
apply at any SF (surface features are scale-free, one generator).

Usage: python tools/fit_quality_clf.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from aeon_sleap_processing_spark.operators import text as tx
    from aeon_sleap_processing_spark.session import get_spark
    from aeon_sleap_processing_spark.sources.catalog import load_table

    spark = get_spark(app_name="fit-quality-clf", shuffle_partitions=8)
    docs = load_table(spark, "documents", args.sf_dir)
    feats = (
        tx.text_stats(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn(
            "tok_sat", F.least(F.col("n_tokens"), F.lit(200)).cast("double") / 200.0
        )
        .withColumn("label", (F.col("quality_score") >= 0.52).cast("double"))
    )
    cols = ["stop_ratio", "avg_token_len", "tok_sat"]
    train = VectorAssembler(inputCols=cols, outputCol="features").transform(feats)
    model = LogisticRegression(
        featuresCol="features", labelCol="label", regParam=0.01, maxIter=100
    ).fit(train)

    out = {
        "features": cols,
        "weights": [float(w) for w in model.coefficients],
        "bias": float(model.intercept),
        "sf_dir": args.sf_dir,
        "train_rows": train.count(),
        "train_auc": float(model.summary.areaUnderROC),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "quality_clf_trained.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
