"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce`` — exact top-k cosine: broadcast the (small) query set
  against the full corpus; the corpus side never shuffles. This is the
  baseline/oracle path.
- ``knn_lsh`` — random-hyperplane LSH bucketing: corpus and queries hash to
  sign-pattern buckets; candidate generation is a bucket equi-join (shuffle on
  bucket id), then exact re-rank within candidates. The 100 TB scale path —
  cost ~ bucket collision count, not |corpus| x |queries|.
- ``embedding_stats`` — per-label norm/count rollup.

Dot products run JVM-side via zip_with + aggregate (no Python UDF). Elements
are cast to double BEFORE multiply so results are bit-comparable with the
DuckDB oracle's DOUBLE[] math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "cosine_sim",
    "knn_bruteforce",
    "knn_lsh",
    "embedding_near_dups",
    "embedding_stats",
]


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    a, b = _dvec(a), _dvec(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side); ranking uses the ROUNDED similarity
    plus id tie-break so results are deterministic across engines."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH.

    ``hyperplanes`` is a driver-side list of unit vectors (generate once,
    seeded). Each vector maps to an integer bucket = sign bits against the
    hyperplanes. Candidates = bucket equi-join; exact cosine re-rank inside.
    Recall < 1.0 by construction — tested against knn_bruteforce."""

    def bucket(vec: Column) -> Column:
        bits = None
        for i, hp in enumerate(hyperplanes):
            d = _dot(_dvec(vec), F.array(*[F.lit(float(v)) for v in hp]))
            bit = F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return bits.cast("int")

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    hyperplanes: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector analog of MinHash
    dedup): candidate pairs come from shared sign-LSH buckets (never an
    all-pairs product), then exact cosine filters at ``threshold``.

    Returns (id_a, id_b, cosine) with id_a < id_b — rounded cosine for
    deterministic cross-engine comparison."""

    def bucket(vec: Column) -> Column:
        bits = None
        for i, hp in enumerate(hyperplanes):
            d = _dot(_dvec(vec), F.array(*[F.lit(float(v)) for v in hp]))
            bit = F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return bits.cast("int")

    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bucket(F.col(vec_col)).alias("bucket")
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(cosine_sim(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)


def embedding_stats(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label count + mean L2 norm (rounded for oracle comparison)."""
    return (
        corpus.select(F.col("label"), _norm(_dvec(F.col(vec_col))).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
    )
