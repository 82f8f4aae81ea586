"""SparkSession factory tuned for both local testing and large-cluster runs.

The reference fans work out as SLURM array jobs sized 4 GB/chunk and 12 CPU x 16 GB
per 24 h period (BASELINE.md). Here a single Spark app replaces that orchestration;
these configs are the knobs that matter at 100 TB:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting replaces
  hand-tuned SLURM task sizing.
- ``spark.sql.shuffle.partitions`` defaults to the local core count for tests; on a
  real cluster set it ~2-3x total executor cores (or rely on AQE coalescing from a
  high initial value).
- Arrow enabled: every pandas-UDF kernel (Hungarian assignment, identity cleanup)
  crosses the JVM<->Python boundary in columnar batches.
- ``maxPartitionBytes`` 128 MB keeps scan tasks sized so a 100 TB table yields
  ~800k well-sized tasks rather than a few huge ones.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "aeon-sleap-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-minded defaults.

    Local default: ``local[$SPARK_GRAFT_CPUS]`` (falls back to all cores).
    Every config here is safe on a 1000-executor cluster; nothing assumes
    single-node execution.
    """
    n = _default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]")
    shuffle = shuffle_partitions if shuffle_partitions is not None else n

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- shuffle & adaptivity ---------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true) — MEASURED, r15:
        # flipping it false (coalesce to advisoryPartitionSizeInBytes) was
        # a net 154 s → 172 s regression on the bench because the
        # Arrow-kernel verify stages (cosine/Hungarian) carry few BYTES but
        # heavy per-row compute — byte-based coalescing collapsed them to
        # one partition and single-threaded the Python kernels
        # (q_neardup_recall 4.7 → 8.9 s, q_semantic_dedup 4.6 → 7.1 s),
        # outweighing the ~0.1-0.6 s/query scheduling savings on the pure
        # relational/text surface. bench_runs_r15/README.md records both
        # sides.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- scans ------------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # --- python/arrow boundary --------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # --- determinism ------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # testdata's events.ts is parquet TIMESTAMP(NANOS): read as long,
        # catalog.load_table converts back to TimestampType (µs)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- writes: idempotent chunk overwrite (SURVEY §2.1 K4) --------
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # local-mode memory headroom (the single JVM is driver AND all 32
        # executor threads; an 8g cap measurably starved period-scale runs —
        # the 24h chunked fight pipeline thrashed 2.9x slower under 8g and
        # ran 1.75x FASTER than the global plan under 48g). A cap, not a
        # reservation; ignored under a real cluster manager.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
