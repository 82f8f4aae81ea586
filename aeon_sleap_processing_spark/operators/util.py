"""Shared operator utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["ensure_min_parallelism", "sample_n_per_bin", "salted_agg", "salted_join"]


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys.

    A hot key (one user with 90% of events) turns a plain groupBy into a
    single straggler task. Phase 1 aggregates on (keys, salt) — the hot key
    spreads over ``buckets`` tasks with map-side combine — phase 2 merges the
    partials per key. Only algebraic aggregates are supported:
    ``aggs`` maps column → 'sum' | 'count' | 'min' | 'max'.

    (AQE's skew handling covers joins; skewed *aggregations* still benefit
    from explicit salting when a key dominates a partition.)
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    # content-derived deterministic salt (safe under task retry — guide
    # §2.5). r16: xxhash64 hashes the columns' binary representations
    # directly; the previous crc32(concat_ws(cast-to-string ...)) paid a
    # per-row string render of EVERY column before hashing — measured
    # 2.8x slower end-to-end on the lineitem showcase (1.39 s vs 0.49 s
    # at sf0.1). Aggregates are algebraic, so the salt value never
    # affects the merged result.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1_aggs, phase2_aggs = [], []
    for col, how in aggs.items():
        partial = f"__p_{col}_{how}"
        if how == "count":
            phase1_aggs.append(F.count(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(f"{col}_{how}"))
        elif how == "sum":
            phase1_aggs.append(F.sum(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(f"{col}_{how}"))
        elif how == "min":
            phase1_aggs.append(F.min(col).alias(partial))
            phase2_aggs.append(F.min(partial).alias(f"{col}_{how}"))
        elif how == "max":
            phase1_aggs.append(F.max(col).alias(partial))
            phase2_aggs.append(F.max(partial).alias(f"{col}_{how}"))
        else:
            raise ValueError(f"unsupported aggregate {how!r}")
    partials = df.withColumn("__salt", salt).groupBy(*ks, "__salt").agg(*phase1_aggs)
    return partials.groupBy(*ks).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side.

    A hot join key concentrates one shuffle partition onto one task; AQE's
    skew-join splitting handles sort-merge plans at runtime, but an explicit
    salt is the deterministic fix when the skew is known (and works for any
    join strategy). The big side gets a content-hash salt in [0, buckets);
    the small side is replicated once per bucket (size × buckets — keep it
    the DIMENSION side); the join key becomes (keys…, salt), so the hot key
    spreads over ``buckets`` tasks.

    Semantics preserved for ``inner`` and ``left`` (each big row joins
    exactly one replica). Right/outer would duplicate unmatched small rows
    per bucket — rejected."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join preserves semantics only for inner/left, got {how!r}")
    ks = [on] if isinstance(on, str) else list(on)
    # same deterministic content salt as salted_agg (r16: xxhash64 over
    # binary values, not crc32 over a per-row string render); inner/left
    # join results are bucket-invariant
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets)
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, ks + ["__salt"], how).drop("__salt")


def sample_n_per_bin(
    df: DataFrame,
    bin_col: str | Sequence[str],
    n: int,
    salt: str = "0",
) -> DataFrame:
    """Deterministic stratified sampling: up to ``n`` rows per bin (SURVEY
    P11; the reference's ``groupby('bin').sample(n)``, step3 notebook).

    Rows are ranked by a salted hash of their content instead of an RNG so
    the sample is reproducible across runs/engines; one window shuffle on the
    bin key."""
    bins = [bin_col] if isinstance(bin_col, str) else list(bin_col)
    h = F.md5(F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in df.columns]))
    w = W.partitionBy(*bins).orderBy(h)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= n).drop("__rn")


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
