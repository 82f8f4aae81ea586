"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce`` — exact top-k cosine: broadcast the (small) query set
  against the full corpus; the corpus side never shuffles. This is the
  baseline/oracle path.
- ``knn_lsh`` — random-hyperplane LSH bucketing: corpus and queries hash to
  sign-pattern buckets; candidate generation is a bucket equi-join (shuffle on
  bucket id), then exact re-rank within candidates. The 100 TB scale path —
  cost ~ bucket collision count, not |corpus| x |queries|.
- ``embedding_stats`` — per-label norm/count rollup.

Dot products run JVM-side (no Python UDF); with a known dimension they are
unrolled into plain column arithmetic (whole-stage codegen — higher-order
array lambdas run interpreted). Elements are cast to double BEFORE multiply
so results are bit-comparable with the DuckDB oracle's DOUBLE[] math.
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


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """JVM-side dot product. With ``dim`` known, unrolled into plain column
    arithmetic — stays in whole-stage codegen. Without it, zip_with/aggregate
    higher-order lambdas, which run interpreted (~3x slower end-to-end on the
    near-dup query at sf0.1). Both sum left-to-right in element order, so the
    float results are bit-identical."""
    if dim is not None:
        out = None
        for i in range(dim):
            term = a[i].cast("double") * b[i].cast("double")
            out = term if out is None else out + term
        return out
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is None:
        a, b = _dvec(a), _dvec(b)
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def _sign_bucket(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign of <vec, hyperplane_i>. Hyperplanes
    are driver-side constants, so the dots are always unrolled literals."""
    bits = None
    for i, hp in enumerate(hyperplanes):
        d = None
        for j, v in enumerate(hp):
            term = vec[j].cast("double") * F.lit(float(v))
            d = term if d is None else d + term
        bit = F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
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
            F.round(cosine_sim(F.col("__qvec"), F.col("__cvec"), dim), 6).alias("cosine"),
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
    dim: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH with OR-amplification.

    ``hyperplanes`` is a driver-side list of unit vectors (generate once,
    seeded), split into ``n_tables`` contiguous groups: each group is one
    hash table (bucket = sign bits against its planes); a candidate pair is
    anything colliding in ANY table (1-(1-p^b)^L recall — more tables raise
    recall, more planes per table cut candidates). Candidates = (table,
    bucket) equi-join, dedup, exact cosine re-rank.
    Recall < 1.0 by construction — tested against knn_bruteforce."""
    if n_tables < 1 or n_tables > len(hyperplanes):
        raise ValueError(f"n_tables must be in [1, {len(hyperplanes)}]")
    per = (len(hyperplanes) + n_tables - 1) // n_tables
    groups = [hyperplanes[t * per : (t + 1) * per] for t in range(n_tables)]

    def memberships(vec: Column) -> Column:
        return F.array(
            *[
                F.struct(F.lit(t).alias("t"), _sign_bucket(vec, g).alias("h"))
                for t, g in enumerate(groups)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.explode(memberships(F.col(vec_col))).alias("tb"),
    ).select("neighbor_id", "__cvec", F.col("tb.t").alias("t"), F.col("tb.h").alias("h"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(memberships(F.col(vec_col))).alias("tb"),
    ).select("query_id", "__qvec", F.col("tb.t").alias("t"), F.col("tb.h").alias("h"))
    sims = (
        c.join(F.broadcast(q), ["t", "h"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("__qvec"), F.col("__cvec"), dim), 6).alias("cosine"),
        )
        # a pair colliding in several tables appears once per table: dedup on
        # the pair key (cheap scalar shuffle; cosines are identical)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector analog of MinHash
    dedup): candidate pairs come from shared sign-LSH buckets (never an
    all-pairs product), then exact cosine filters at ``threshold``.

    Returns (id_a, id_b, cosine) with id_a < id_b — rounded cosine for
    deterministic cross-engine comparison."""
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _sign_bucket(F.col(vec_col), hyperplanes).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(cosine_sim(F.col("a.v"), F.col("b.v"), dim), 6).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)


def embedding_stats(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Per-label count + mean L2 norm (rounded for oracle comparison)."""
    nrm = _norm(F.col(vec_col), dim) if dim is not None else _norm(_dvec(F.col(vec_col)))
    return (
        corpus.select(F.col("label"), nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
    )
