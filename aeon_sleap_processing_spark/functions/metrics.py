"""Model-quality metrics as Spark aggregations (SURVEY A9; reference
`id_model/step4_SLEAP_training/centered_instance_model/sleap_optuna_train.py:89-175,226-230`).

The reference loops frame pairs in Python; here both metric families are
single hash aggregations:

- detection confusion components from per-frame (gt_count, pr_count) rows:
  TP = min, FP = max(0, pr−gt), FN = max(0, gt−pr), TN = slots − max;
- identity accuracy from matched instance pairs: correct / checked;
- composite = harmonic mean(detection F1, ID accuracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["detection_metrics", "id_accuracy", "composite_metric"]


def detection_metrics(
    frame_counts: DataFrame,
    gt_col: str = "gt_count",
    pr_col: str = "pr_count",
    max_instances: int = 2,
) -> DataFrame:
    """frame_counts: one row per evaluated frame with ground-truth and
    predicted instance counts → single-row precision/recall/F1 + confusion
    totals. Raises nothing row-wise — frames exceeding ``max_instances``
    violate the reference's ValueError invariant and are surfaced as a count."""
    gt, pr = F.col(gt_col), F.col(pr_col)
    agg = frame_counts.agg(
        F.sum(F.least(gt, pr)).alias("tp"),
        F.sum(F.greatest(pr - gt, F.lit(0))).alias("fp"),
        F.sum(F.greatest(gt - pr, F.lit(0))).alias("fn"),
        F.sum(F.lit(max_instances) - F.greatest(gt, pr)).alias("tn"),
        F.sum(
            F.when((gt > max_instances) | (pr > max_instances), 1).otherwise(0)
        ).alias("invalid_frames"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    out = agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        "invalid_frames",
        precision.alias("precision"),
        recall.alias("recall"),
    )
    p, r = F.col("precision"), F.col("recall")
    return out.withColumn(
        "f1", F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    )


def id_accuracy(
    matched_pairs: DataFrame, gt_id_col: str = "gt_identity", pr_id_col: str = "pr_identity"
) -> DataFrame:
    """matched_pairs: one row per positively-matched (gt, pr) instance pair →
    single-row id accuracy (+ per-identity breakdown available upstream)."""
    return matched_pairs.agg(
        F.count(F.lit(1)).alias("n_checks"),
        F.sum(F.when(F.col(gt_id_col) == F.col(pr_id_col), 1).otherwise(0)).alias("n_correct"),
    ).select(
        "n_checks",
        "n_correct",
        F.when(
            F.col("n_checks") > 0, F.col("n_correct") / F.col("n_checks")
        )
        .otherwise(F.lit(0.0))
        .alias("id_accuracy"),
    )


def composite_metric(f1: float, id_acc: float) -> float:
    """Harmonic mean of detection F1 and ID accuracy (reference `:226-230`)."""
    return (2 * f1 * id_acc) / (f1 + id_acc) if (f1 + id_acc) > 0 else 0.0
