"""Catalog over the driver-provided parquet tables (TESTDATA.md).

At 100 TB these would be Hive-partitioned tables; here one parquet file per table.
``load_table`` is the single choke point so partition-filter/column-prune behavior
can be changed in one place.
"""

from __future__ import annotations

import functools
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@functools.lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
    (``spark.sql.legacy.parquet.nanosAsLong``). Footer-only read — cheap."""
    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return load_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Path-based variant of ``load_table`` with the same timestamp
    normalization (nanos shim + NTZ → TIMESTAMP under the UTC session tz)."""
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        # The caller's session may not have this set (the external driver builds
        # a plain SparkSession); it is runtime-settable and required to read
        # parquet TIMESTAMP(NANOS) columns at all.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # integer ns → µs truncation. MUST be integer division: ns epochs exceed
        # 2^53, so a double divide would round the low microsecond digit.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # normalize TIMESTAMP_NTZ → TIMESTAMP (identity under UTC session tz) so all
    # tables share one timestamp type and casts/unions behave uniformly
    for c, dt in df.dtypes:
        if dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for spark.sql() use."""
    for name in TESTDATA_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
