"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input has
    fewer partitions.

    Compute-heavy narrow operators (per-row hashing, shingling, vector math)
    inherit the scan's partitioning; a table that arrives as a handful of files
    would otherwise run serially. At scale (input partitions >= cores) this is
    a no-op — it never repartitions *down*, so it adds no shuffle on big data.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
