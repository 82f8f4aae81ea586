"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce`` — exact top-k cosine: broadcast the (small) query set
  against the full corpus; the corpus side never shuffles. This is the
  baseline/oracle path.
- ``knn_lsh`` — random-hyperplane LSH bucketing: corpus and queries hash to
  sign-pattern buckets; candidate generation is a bucket equi-join (shuffle on
  bucket id), then exact re-rank within candidates. The 100 TB scale path —
  cost ~ bucket collision count, not |corpus| x |queries|.
- ``embedding_stats`` — per-label norm/count rollup.

Vector math runs in Arrow-vectorized pandas UDF kernels (numpy), NOT column
expressions: a 64-dim dot product unrolled into column arithmetic exceeds
Janino's 64 KB method limit, so whole-stage codegen FAILS (slow retried
compile + interpreted fallback, measured seconds per query), and the
zip_with/aggregate lambda form is interpreted per element. The kernels
accumulate strictly left-to-right over dimensions in float64 — bit-identical
to both column forms and to the DuckDB oracle's DOUBLE[] math — while doing
~1e4 rows per vectorized numpy op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "cosine_sim",
    "cosine_kernel",
    "cosine_kernel_prenorm",
    "vector_norm",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "ivf_centroids",
    "ivf_fit_centroids",
    "embedding_near_dups",
    "semantic_dedup",
    "pair_budget_stats",
    "neardup_pairs_bruteforce",
    "neardup_sample_predicate",
    "ivf_write_clustered",
    "knn_ivf_clustered",
    "pq_codebooks",
    "pq_fit_codebooks",
    "pq_encode",
    "knn_pq",
    "knn_ivf_pq",
    "knn_ivf_pq_clustered",
    "embedding_stats",
    "kmeans_assign_stats",
    "quantize_embeddings_stats",
]


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim(a: Column, b: Column) -> Column:
    """Pure-column cosine (zip_with/aggregate). Interpreted per element —
    reference semantics / small inputs; hot paths use :func:`cosine_kernel`
    (bit-identical, tested)."""
    a, b = _dvec(a), _dvec(b)

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, t: acc + t)

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _kernel_parallelism(df: DataFrame) -> int:
    """Partition target for a CPU-bound Arrow-kernel stage: the larger of
    cluster parallelism and the session's shuffle-partition setting — the
    same parallelism any ordinary shuffle in this session gets. Scale-
    adaptive by construction (defaultParallelism tracks the cluster; the
    shuffle knob is the operator-tuned production value)."""
    spark = df.sparkSession
    try:
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_n = 0
    return max(spark.sparkContext.defaultParallelism, shuffle_n)


def _spread(df: DataFrame) -> DataFrame:
    """Spread a kernel input to cluster parallelism when its PLANNED
    partition count is lower (r15, guide §2.2/§4.4).

    The Python kernels cost far more CPU per row than the row's bytes
    suggest, and their inputs here are either small parquet scans (an
    audit corpus splits into fewer file partitions than cores) or
    byte-coalesced shuffle outputs — both serialize the kernel onto 1-4
    tasks (measured: q_neardup_recall's verify stage ran 8.1 s of
    executor time on 4 AQE-coalesced partitions; spread to 32 the query
    dropped 4.9 -> 3.7 s). At 100 TB the planned count already exceeds
    the target and this is a no-op — the guard is what keeps the extra
    round-robin shuffle off the scale path."""
    n = _kernel_parallelism(df)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def _stack(s: pd.Series) -> np.ndarray:
    """Series of float32 vectors → (n, dim) float64 matrix (exact widening).
    Null vectors (routine in a 100 TB corpus) become NaN rows — they flow
    through the math as NaN and surface as SQL NULL after the Arrow
    round-trip, matching what the pure-column forms produce."""
    vals = s.to_numpy()
    if any(v is None for v in vals):
        dim = next((len(v) for v in vals if v is not None), 1)
        fill = np.full(dim, np.nan, dtype=np.float64)
        vals = np.array([fill if v is None else v for v in vals], dtype=object)
    return np.stack(vals).astype(np.float64)


def _dot_ltr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot accumulated left-to-right over dimensions — the same
    float64 operation order as the column forms and DuckDB list_inner_product,
    so results are bit-identical (np.dot/einsum pairwise-sum and would not
    be)."""
    acc = a[:, 0] * b[:, 0]
    for j in range(1, a.shape[1]):
        acc = acc + a[:, j] * b[:, j]
    return acc


# pandas_udf needs an active SparkSession to resolve its DDL return type, so
# the kernels are built lazily (first use), not at import
_KERNELS: dict[str, object] = {}


def _cosine_kernel():
    if "cos" not in _KERNELS:

        @pandas_udf("double")
        def k(a: pd.Series, b: pd.Series) -> pd.Series:
            if len(a) == 0:
                return pd.Series([], dtype="float64")
            av, bv = _stack(a), _stack(b)
            if av.shape[1] != bv.shape[1]:
                # widen ONLY a side whose batch was ALL null (then _stack
                # had no row to take the width from — the cosine is NaN →
                # SQL NULL). Two genuinely different vector widths are a
                # caller bug (e.g. queries embedded with a different model
                # than the corpus): raise instead of silently NULLing the
                # whole batch.
                w = max(av.shape[1], bv.shape[1])
                if av.shape[1] != w and a.isna().all():
                    av = np.full((len(av), w), np.nan)
                elif bv.shape[1] != w and b.isna().all():
                    bv = np.full((len(bv), w), np.nan)
                else:
                    raise ValueError(
                        f"cosine_kernel: vector width mismatch "
                        f"{av.shape[1]} vs {bv.shape[1]} on non-null input"
                    )
            cos = _dot_ltr(av, bv) / (np.sqrt(_dot_ltr(av, av)) * np.sqrt(_dot_ltr(bv, bv)))
            return pd.Series(cos)

        _KERNELS["cos"] = k
    return _KERNELS["cos"]


def cosine_kernel(a: Column, b: Column) -> Column:
    """Arrow/numpy cosine — bit-identical to :func:`cosine_sim` (tested)."""
    return _cosine_kernel()(a, b)


def _cosine_prenorm_kernel():
    if "cosp" not in _KERNELS:

        @pandas_udf("double")
        def k(a: pd.Series, b: pd.Series, na: pd.Series, nb: pd.Series) -> pd.Series:
            if len(a) == 0:
                return pd.Series([], dtype="float64")
            av, bv = _stack(a), _stack(b)
            if av.shape[1] != bv.shape[1]:
                # same all-null-batch widening contract as cosine_kernel
                w = max(av.shape[1], bv.shape[1])
                if av.shape[1] != w and a.isna().all():
                    av = np.full((len(av), w), np.nan)
                elif bv.shape[1] != w and b.isna().all():
                    bv = np.full((len(bv), w), np.nan)
                else:
                    raise ValueError(
                        f"cosine_kernel_prenorm: vector width mismatch "
                        f"{av.shape[1]} vs {bv.shape[1]} on non-null input"
                    )
            nav = na.to_numpy(dtype=np.float64, na_value=np.nan)
            nbv = nb.to_numpy(dtype=np.float64, na_value=np.nan)
            return pd.Series(_dot_ltr(av, bv) / (nav * nbv))

        _KERNELS["cosp"] = k
    return _KERNELS["cosp"]


def cosine_kernel_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine_kernel` with the per-vector norms precomputed (one
    :func:`vector_norm` pass per SIDE instead of two fresh LTR
    self-dots per PAIR — a verify stage evaluates each vector in many
    pairs, so this cuts the kernel's dot products 3x). Bit-identical to
    ``cosine_kernel``: the numerator is the same LTR dot, and the
    denominator multiplies the same two ``sqrt(dot_ltr(v, v))`` float64
    values in the same order."""
    return _cosine_prenorm_kernel()(a, b, na, nb)


def vector_norm(a: Column) -> Column:
    """L2 norm, LTR-accumulated — the exact ``sqrt(dot_ltr(v, v))``
    factor :func:`cosine_kernel` uses (shared kernel)."""
    return _norm_kernel(a)


def _norm_kernel(a: Column) -> Column:
    if "norm" not in _KERNELS:

        @pandas_udf("double")
        def k(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="float64")
            vm = _stack(v)
            return pd.Series(np.sqrt(_dot_ltr(vm, vm)))

        _KERNELS["norm"] = k
    return _KERNELS["norm"](a)


def _bucket_udf(groups: list[list[list[float]]]):
    """array<float> vector → array<int> of sign-LSH bucket ids, one per hash
    table. Bit i of table t's bucket = sign of <vec, plane_{t,i}>; dots are
    accumulated left-to-right in float64 (bit-compatible with the SQL
    oracle's list_inner_product > 0)."""
    planes = np.array([p for g in groups for p in g], dtype=np.float64)  # (L, dim)
    sizes = [len(g) for g in groups]
    weights = np.concatenate([1 << np.arange(s, dtype=np.int64) for s in sizes])
    starts = np.cumsum([0] + sizes)

    @pandas_udf("array<int>")
    def k(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        vm = _stack(v)  # (n, dim)
        acc = vm[:, 0:1] * planes[None, :, 0].reshape(1, -1)
        for j in range(1, vm.shape[1]):
            acc = acc + vm[:, j : j + 1] * planes[None, :, j].reshape(1, -1)
        bits = (acc > 0.0).astype(np.int64) * weights[None, :]  # (n, L)
        out = np.stack(
            [bits[:, starts[t] : starts[t + 1]].sum(axis=1) for t in range(len(sizes))], axis=1
        ).astype(np.int32)
        return pd.Series(list(out))

    return k


def _topk(sims: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side); the corpus side never shuffles until
    the per-query top-k. Ranking uses the ROUNDED similarity plus id
    tie-break so results are deterministic across engines."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    sims = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_kernel(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine"),
    )
    return _topk(sims, k)


def _split_tables(
    hyperplanes: list[list[float]], n_tables: int
) -> list[list[list[float]]]:
    """Split the plane list into n_tables contiguous groups, refusing any
    (L, T) whose ceil split would leave a trailing EMPTY table: an empty
    group hashes every vector to bucket 0, so that table 'collides' ALL
    pairs and candidate generation silently degenerates to the full
    n(n-1)/2 cross product (e.g. L=24, T=7 → per=4 → group 6 empty)."""
    if n_tables < 1 or n_tables > len(hyperplanes):
        raise ValueError(f"n_tables must be in [1, {len(hyperplanes)}]")
    per = (len(hyperplanes) + n_tables - 1) // n_tables
    groups = [hyperplanes[t * per : (t + 1) * per] for t in range(n_tables)]
    if any(not g for g in groups):
        raise ValueError(
            f"{len(hyperplanes)} planes split into {n_tables} tables of "
            f"{per} leaves an empty table (an all-pairs collider); use a "
            f"divisor-friendly n_tables"
        )
    return groups


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH with OR-amplification.

    ``hyperplanes`` is a driver-side list of unit vectors (generate once,
    seeded), split into ``n_tables`` contiguous groups: each group is one
    hash table (bucket = sign bits against its planes); a candidate pair is
    anything colliding in ANY table (1-(1-p^b)^L recall — more tables raise
    recall, more planes per table cut candidates). Candidates = (table,
    bucket) equi-join, dedup, exact cosine re-rank.
    Recall < 1.0 by construction — tested against knn_bruteforce.

    CHANGED (r9): (len(hyperplanes), n_tables) combinations whose ceil
    split leaves an empty trailing group (e.g. 24 planes, 7 tables) now
    raise ValueError instead of silently degrading — an empty table
    hashed every vector to bucket 0, i.e. an all-pairs collider. Callers
    hitting the new error should pick a divisor-friendly ``n_tables``."""
    bucket = _bucket_udf(_split_tables(hyperplanes, n_tables))

    def membered(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(bucket(F.col(vec_col))).alias("t", "h"),
        )

    c = membered(corpus, "neighbor_id", "__cvec")
    q = membered(queries, "query_id", "__qvec")
    sims = (
        c.join(F.broadcast(q), ["t", "h"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_kernel(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine"),
        )
        # a pair colliding in several tables appears once per table: dedup on
        # the pair key (cheap scalar shuffle; cosines are identical)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    return _topk(sims, k)


def ivf_centroids(n_cells: int, dim: int, seed: int = 0) -> list[list[float]]:
    """Seeded unit-norm coarse-quantizer centroids (driver-side constants).

    Random centroids give IVF's cost structure without a training pass — and,
    being pure literals, let the DuckDB oracle embed the identical values. A
    real deployment would fit them with ``pyspark.ml.clustering.KMeans`` on a
    corpus sample and pass the fitted centers here; the search path is
    unchanged."""
    c = np.random.default_rng(seed).standard_normal((n_cells, dim))
    c /= np.sqrt((c**2).sum(axis=1, keepdims=True))
    return c.tolist()


def ivf_fit_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 0,
    max_iter: int = 20,
) -> list[list[float]]:
    """Train the IVF coarse quantizer with ``pyspark.ml`` KMeans and return
    unit-normalized centers for :func:`knn_ivf` (distributed training — the
    real-deployment path the seeded :func:`ivf_centroids` stands in for).
    Training cost is one MLlib job; the search path is unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    c = np.array([np.asarray(ctr, dtype=np.float64) for ctr in model.clusterCenters()])
    norms = np.sqrt((c**2).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return (c / norms).tolist()


def _probe_udf(centroids: np.ndarray, nprobe: int):
    """vector → the ``nprobe`` centroid ids with the highest inner product
    (unit centroids ⇒ cosine order). Scores accumulate left-to-right over
    dimensions in float64 — bit-identical to the oracle's
    ``list_inner_product``; ties break toward the smaller cid in both."""
    c = np.asarray(centroids, dtype=np.float64)  # (K, dim)

    @pandas_udf("array<int>")
    def k(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        vm = _stack(v)  # (n, dim)
        acc = vm[:, 0:1] * c[None, :, 0]
        for j in range(1, vm.shape[1]):
            acc = acc + vm[:, j : j + 1] * c[None, :, j]
        # stable argsort on -score: ties keep ascending-cid order
        order = np.argsort(-acc, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return k


def _cell_rerank(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Shared IVF re-rank tail: probed-cell equi-join (queries broadcast),
    exact cosine, per-query top-k. Used by BOTH :func:`knn_ivf` (logical
    corpus) and :func:`knn_ivf_clustered` (physical store) — each has its
    own DuckDB oracle, so a tie-rule change must land in both in lockstep;
    a single tail makes divergence impossible."""
    sims = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_kernel(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine"),
        )
    )
    return _topk(sims, k)


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Every corpus vector lives in exactly ONE cell (argmax inner product
    against unit-norm ``centroids``); each query probes its ``nprobe``
    closest cells and exact-re-ranks only those cells' members. Unlike LSH
    the partitioning is data-adaptive once centroids are trained, candidate
    count scales as nprobe/n_cells of the corpus, and the cell id doubles as
    the physical partition key at 100 TB (cluster-by-cell layout → a probe
    touches nprobe partitions). Pairs can't duplicate across probes (cells
    are disjoint), so there is no dedup shuffle before the re-rank."""
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(f"nprobe must be in [1, {len(centroids)}]")
    c_arr = np.asarray(centroids, dtype=np.float64)
    cell1 = _probe_udf(c_arr, 1)
    cellN = _probe_udf(c_arr, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.element_at(cell1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(cellN(F.col(vec_col))).alias("cell"),
    )
    return _cell_rerank(c, q, k)


def lsh_planes_for(
    n_rows: int,
    dim: int,
    threshold: float = 0.95,
    target_recall: float = 0.95,
    margin: int = 2,
    max_tables: int = 64,
    seed: int = 0,
) -> tuple[list[list[float]], int]:
    """Size a sign-LSH plan from the corpus — the r10 second-decade
    scaling law as CODE instead of a docstring rule
    (bench_runs_r10/neardup_threshold_100x.json):

    - ``planes_per_table b = ceil(log2(n_rows)) + margin``: random
      near-orthogonal pairs collide per table w.p. ~2^-b, so the
      random-candidate floor T·2^-b·n(n-1)/2 — QUADRATIC in n at fixed
      b — stays a bounded multiple (~T/2^(margin+1)) of n. The measured
      anchor this reproduces: n=200k at fixed b=16 went 18x/decade; b=20
      (= ceil(log2(200000)) + 2) restored 5.48 s at recall 1.0.
    - ``n_tables T`` from the amplification identity: a true pair at
      cosine ≥ ``threshold`` collides per table w.p. p^b for
      p = 1 - arccos(threshold)/pi, so T = ceil(ln(1-target_recall) /
      ln(1-p^b)) tables give OR-amplified recall ≥ ``target_recall``
      (capped at ``max_tables`` — if the cap binds, the achievable
      recall is 1-(1-p^b)^max_tables; tighten ``threshold`` or accept).

    Returns ``(hyperplanes, n_tables)`` ready for
    :func:`embedding_near_dups` / :func:`semantic_dedup` /
    ``stream_semantic_dedup`` — the planes list is ``T*b`` rows of
    ``dim`` (split back into tables by :func:`_split_tables`), generated
    from ``seed`` so plans are reproducible across runs and engines."""
    import math

    if n_rows < 1:
        raise ValueError(f"n_rows must be >= 1, got {n_rows}")
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be a cosine in [-1, 1], got {threshold}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    b = max(4, math.ceil(math.log2(max(n_rows, 2))) + margin)
    p = 1.0 - math.acos(threshold) / math.pi
    hit = p**b
    if hit >= 1.0:
        n_tables = 1
    else:
        n_tables = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - hit))
        n_tables = min(max(n_tables, 1), max_tables)
    planes = (
        np.random.default_rng(seed)
        .standard_normal((n_tables * b, dim))
        .tolist()
    )
    return planes, n_tables


def _bucket_member_cap(max_pairs_per_bucket: int) -> int:
    """Largest bucket MEMBER count whose all-pairs product stays within
    the pair budget: m(m-1)/2 <= budget. Capping members (linear) is the
    Spark-expressible form of capping pairs (quadratic) — a rank filter
    per bucket, evaluated before any pair exists."""
    if max_pairs_per_bucket < 1:
        raise ValueError("max_pairs_per_bucket must be >= 1")
    import math

    return int((1 + math.isqrt(1 + 8 * max_pairs_per_bucket)) // 2)


def _cap_bucket_members(keys: DataFrame, bucket_cols: list[str],
                        m_cap: int) -> DataFrame:
    """Keep the m_cap smallest ids per bucket (deterministic
    lexicographic tie-break — reruns and the DuckDB oracle agree).
    The rank is computed per bucket over MEMBERS, so a pathological
    mega-bucket costs one O(B log B) sort task, never its O(B²) pairs."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*bucket_cols).orderBy("id")
    return (
        keys.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= m_cap)
        .drop("__rn")
    )


def embedding_near_dups(
    corpus: DataFrame,
    hyperplanes: list[list[float]] | None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    auto_bands: bool = False,
    target_recall: float = 0.95,
    seed: int = 0,
    max_pairs_per_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector analog of MinHash
    dedup): candidate pairs come from shared sign-LSH buckets (never an
    all-pairs product), then exact cosine filters at ``threshold``.

    OR-AMPLIFIED like :func:`knn_lsh`: ``hyperplanes`` splits into
    ``n_tables`` contiguous groups, each one hash table; a candidate is any
    pair colliding in ANY table (recall 1-(1-p^b)^T for per-plane collision
    p = 1 - theta/pi). A single band is half-blind even at high cosine
    (p^6 ≈ 0.53 at cos 0.95) — measured on the synthetic corpus, one
    6-plane band recovers 3.8% of true pairs at threshold 0.25 while
    6 tables x 4 planes recover 55.6% probing ~32% of all pairs
    (q_neardup_recall pins the floor).

    SIZE BANDS WITH THE CORPUS (the r10 second-decade finding,
    tools/measure_neardup_threshold_100x.py): random near-orthogonal
    pairs collide per table w.p. ~2^-b, so the random-candidate floor is
    T·2^-b·n(n-1)/2 — QUADRATIC in n at fixed b. At n=200k, b=16 the
    floor (~1.8M) overtakes the true pairs (900k) and wall goes
    super-linear; the production rule is b ≈ log2(n) + margin so the
    floor stays a fixed fraction of n (at cosine ≥ 0.99 the true-pair
    per-table collision p^b degrades gently — p=0.9955 gives p^20=0.91,
    six tables miss 4e-7). Committed two-decade numbers:
    bench_runs_r10/neardup_threshold_100x.json. The law is CODE, not
    prose: :func:`lsh_planes_for` sizes (planes, tables) from
    (n_rows, threshold, target_recall), and ``auto_bands=True`` applies
    it here directly — the corpus is counted once, ``dim`` read from the
    first vector, and ``hyperplanes``/``n_tables`` arguments ignored in
    favor of the sized plan. Deployments with a pinned plan (the driver
    queries) keep passing explicit planes.

    VERIFY-LAST ORDER (the r9 scale-ramp finding): amplified candidates
    are deduped to UNIQUE (id_a, id_b) pairs BEFORE the exact-cosine
    verify, then the vectors are joined back by id. True near-dup
    cliques collide in EVERY table, so verifying per collision multiplies
    exactly the expensive kernel rows by up to n_tables — and the
    collision rows carry two vectors each, so AQE sizes the post-join
    stage by its scalar output footprint and under-partitions the
    kernel. Measured on the 10x ramp corpus (20k vectors with planted
    10-clique near-dups, tools/bench_scale.py): verify-per-collision ran
    502 s (87.7x the sf0.1 wall at 10x rows); dedup-first cuts the
    kernel rows n_tables-fold and re-spreads them across the id-join's
    partitioning. The dedup shuffle itself is scalar id pairs — cheap at
    any scale.

    NULL embeddings are filtered BEFORE bucketing: a null vector hashes
    to bucket 0 in every table (NaN sign-tests are all false), so on a
    corpus with many nulls — routine at 100 TB — the null population
    would collide with itself and with the genuine bucket-0 rows in ALL
    ``n_tables`` tables, reintroducing an O(n_nulls²) candidate product
    that the NULL cosine only filters after it has been generated,
    deduped, and vector-joined. A null vector can never pass the cosine
    threshold, so dropping it up front leaves the result unchanged (the
    DuckDB oracles produce no rows for NULL cosines either).

    PAIR BUDGET (the r13 VERDICT's adversarial-density backstop,
    measured on the sf1 ramp: verification is linear in emitted pairs —
    74x wall at 10x rows when the generator plants 10x near-dup density
    ≈ 100x true pairs). ``max_pairs_per_bucket`` caps the all-pairs
    product of any ONE (table, bucket) cell by keeping only the
    m = floor((1+sqrt(1+8*budget))/2) lexicographically-smallest member
    ids (deterministic — reruns agree), so a duplicate-dense corpus
    degrades to bounded work instead of unbounded verify cost. Recall
    backstop: a true near-dup pair dropped from one table's hot bucket
    can still collide in the other ``n_tables - 1`` tables, whose
    hashes are independent. That is the ONLY backstop — both join
    sides are aliases of the same capped key set, so a member dropped
    from a (table, bucket) cell appears on NEITHER side of that cell;
    with ``n_tables=1`` a binding budget can fully silence a hot
    bucket's dropped members. Budget with ``n_tables >= 2``. Default
    ``None`` = unbudgeted (exact r13 behavior; the driver oracles pin
    that path). Size it from :func:`pair_budget_stats` (pairs kept vs
    dropped per budget, no pair materialization) and the committed
    budget-vs-recall sweep (bench_runs_r14/pair_budget_sweep.json).

    Returns (id_a, id_b, cosine) with id_a < id_b — rounded cosine for
    deterministic cross-engine comparison."""
    # project to the two used columns (scan narrowing). NOT spread (r15,
    # measured): the per-row bucket/norm kernels are cheap — repartitioning
    # the corpus cost 0.5-0.9 s/query in paired A/B while the verify
    # kernel (the heavy stage) gets its parallelism from the explicit
    # candidate-dedup exchange below.
    corpus = corpus.where(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    if auto_bands:
        # one count + one first() — O(1) driver work against any corpus
        # size; both run on the null-filtered view the plan will hash
        n_rows = corpus.count()
        if n_rows == 0:
            raise ValueError(
                "auto_bands: corpus has no non-null embeddings to size a plan from"
            )
        dim = len(corpus.select(vec_col).first()[0])
        hyperplanes, n_tables = lsh_planes_for(
            n_rows, dim, threshold=threshold,
            target_recall=target_recall, seed=seed,
        )
    elif hyperplanes is None:
        raise ValueError("pass hyperplanes or set auto_bands=True")
    bucket = _bucket_udf(_split_tables(hyperplanes, n_tables))
    if n_tables == 1:
        # single table: a pair can collide at most once — verify inline.
        # Norms ride the rows (ONE norm pass per vector; the verify then
        # does 1 LTR dot per pair instead of 3 — bit-identical, see
        # cosine_kernel_prenorm).
        c = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _norm_kernel(F.col(vec_col)).alias("n"),
            F.element_at(bucket(F.col(vec_col)), 1).alias("h"),
        )
        if max_pairs_per_bucket is not None:
            c = _cap_bucket_members(
                c, ["h"], _bucket_member_cap(max_pairs_per_bucket)
            )
        a, b = c.alias("a"), c.alias("b")
        return (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(
                    cosine_kernel_prenorm(
                        F.col("a.v"), F.col("b.v"),
                        F.col("a.n"), F.col("b.n"),
                    ),
                    6,
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    keys = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucket(F.col(vec_col))).alias("t", "h"),
    )
    if max_pairs_per_bucket is not None:
        keys = _cap_bucket_members(
            keys, ["t", "h"], _bucket_member_cap(max_pairs_per_bucket)
        )
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # pair dedup with an EXPLICIT partition count (r15): the verify
        # kernel downstream runs on THIS exchange's partitioning (the
        # vector joins broadcast), and AQE's byte-based coalescing sees
        # only scalar id pairs — it packed the kernel onto 4 partitions
        # at bench scale (8.1 s executor time serialized onto 4 tasks).
        # repartition(n, keys) + dropDuplicates is the same dedup with
        # the explicit count AQE must respect; the pair shuffle stays
        # scalar-cheap at any scale.
        .repartition(_kernel_parallelism(corpus), "id_a", "id_b")
        .dropDuplicates()
    )
    # norms ride the vector joins (ONE norm pass per corpus side; the
    # verify kernel then does 1 LTR dot per pair instead of 3 —
    # bit-identical, see cosine_kernel_prenorm)
    va = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        _norm_kernel(F.col(vec_col)).alias("__na"),
    )
    vb = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        _norm_kernel(F.col(vec_col)).alias("__nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_kernel_prenorm(
                    F.col("__va"), F.col("__vb"),
                    F.col("__na"), F.col("__nb"),
                ),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def pair_budget_stats(
    corpus: DataFrame,
    hyperplanes: list[list[float]],
    n_tables: int = 1,
    max_pairs_per_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Observability for the pair budget WITHOUT materializing a single
    pair: bucket the corpus exactly as :func:`embedding_near_dups`
    would, aggregate member counts per (table, bucket), and return
    {"pairs_full", "pairs_emitted", "pairs_dropped", "buckets",
    "buckets_capped", "max_bucket_members"} — sums of m(m-1)/2 with m
    capped per the budget. One groupBy over member rows (linear), so
    sizing a budget against an adversarially dense 100 TB corpus costs
    a count-shaped job, not the quadratic candidate join it predicts."""
    bucket = _bucket_udf(_split_tables(hyperplanes, n_tables))
    keys = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(bucket(F.col(vec_col))).alias("t", "h"),
        )
    )
    m_cap = (
        None if max_pairs_per_bucket is None
        else _bucket_member_cap(max_pairs_per_bucket)
    )
    per = keys.groupBy("t", "h").agg(F.count("*").alias("m"))
    pairs = F.col("m") * (F.col("m") - 1) / 2
    capped_m = (
        F.col("m") if m_cap is None else F.least(F.col("m"), F.lit(m_cap))
    )
    capped_pairs = capped_m * (capped_m - 1) / 2
    row = per.agg(
        F.sum(pairs).alias("full"),
        F.sum(capped_pairs).alias("emitted"),
        F.count("*").alias("buckets"),
        F.sum(
            (F.col("m") > (m_cap if m_cap is not None else F.col("m")))
            .cast("long")
        ).alias("capped"),
        F.max("m").alias("max_m"),
    ).collect()[0]
    full = int(row["full"] or 0)
    emitted = int(row["emitted"] or 0)
    return {
        "pairs_full": full,
        "pairs_emitted": emitted,
        "pairs_dropped": full - emitted,
        "buckets": int(row["buckets"]),
        "buckets_capped": int(row["capped"] or 0),
        "max_bucket_members": int(row["max_m"] or 0),
        "member_cap": m_cap,
    }


def ivf_write_clustered(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    files_per_cell: int = 1,
    codebooks: list[list[list[float]]] | None = None,
    commit: str = "manifest",
) -> None:
    """Materialize the corpus in CLUSTER-BY-CELL layout: one Hive
    partition directory per IVF cell (argmax inner product against the
    unit-norm ``centroids``, ties to the smaller cid — identical
    assignment to :func:`knn_ivf`). This is the physical half of IVF at
    100 TB: the coarse quantizer doubles as the partition key, so a
    probe of ``nprobe`` cells becomes PARTITION PRUNING at the scan —
    the engine lists and reads only the probed cells' fraction of the
    store instead of filtering all of it. Measured
    (tools/measure_ivf_layout.py, sf0.1, 16 trained cells, nprobe=4):
    one query scans 4/16 files (exactly nprobe/n_cells); a DIVERSE
    10-query batch unions to 15/16 — pruning pays for point lookups and
    cell-correlated batches, and at sf0.1 the 16-way file split costs
    more in per-file overhead than it saves (1.11 s vs 0.76 s flat);
    the win is an I/O-bound large-store property, not a small-SF one.
    Pair with :func:`knn_ivf_clustered` for the read side.

    ``files_per_cell`` bounds write parallelism: hashing on ``cell``
    alone pins each cell to ONE task (a hot cell at 100 TB = one task
    writing its whole slice), so for large corpora set it to
    ceil(cell_bytes / target_file_bytes) — the shuffle then salts each
    cell across ~files_per_cell tasks and each task emits one file into
    its cell directory. The default 1 keeps small stores at one file
    per cell.

    Pass ``codebooks`` to ALSO store PQ codes next to each vector —
    the IVF-PQ deployment layout: codes are encoded once at write time
    (never per query), ADC scans read only (id, codes) via parquet
    column pruning, and the raw vector column is touched exclusively by
    the exact refine. See :func:`knn_ivf_pq_clustered`.

    ``commit="manifest"`` (the r11 default): the whole clustered layout
    lands as ONE atomic manifest commit (full-store replace), so a
    re-cluster composes with concurrent readers (snapshot isolation) and
    probe-time pruning becomes a MANIFEST-SIDE prefix filter on
    ``cell=<c>/`` — no directory listing at all; ``"listing"`` keeps the
    plain dynamic-overwrite layout. Readers auto-detect either."""
    cell1 = _probe_udf(np.asarray(centroids, dtype=np.float64), 1)
    cols = [
        F.col(id_col),
        F.col(vec_col),
        F.element_at(cell1(F.col(vec_col)), 1).alias("cell"),
    ]
    if codebooks is not None:
        cols.insert(2, _pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"))
    assigned = corpus.select(*cols)
    if files_per_cell <= 1:
        assigned = assigned.repartition("cell")
    else:
        # explicit count: REPARTITION_BY_NUM, which AQE will not
        # coalesce away (plain repartition(cols) would collapse small
        # shuffles back to one task per cell)
        assigned = assigned.repartition(
            len(centroids) * files_per_cell,
            F.col("cell"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_cell)),
        )
    if commit == "manifest":
        from ..sources.sinks import write_manifested

        write_manifested(
            corpus.sparkSession, assigned, path,
            partition_by=["cell"], replace="all",
        )
        return
    if commit != "listing":
        raise ValueError(f"unknown commit protocol {commit!r}")
    (
        assigned.write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_append_clustered(
    new_vecs: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    files_per_cell: int = 1,
    codebooks: list[list[list[float]]] | None = None,
) -> list[str]:
    """INCREMENTAL index maintenance for an :func:`ivf_write_clustered`
    store: assign ``new_vecs`` to the EXISTING trained ``centroids``
    (identical argmax rule — searchability is immediate and exact w.r.t.
    the coarse quantizer) and land them as ONE atomic manifest append
    into the ``cell=<c>/`` partitions. No rebuild, no rewrite of the
    existing corpus: the commit is O(new vectors), concurrent searches
    keep snapshot isolation through it, and concurrent appends compose
    via the CAS retry. This is the arrival path of a growing corpus —
    pair with :func:`~..streaming.watch.watch_manifested` over the
    upstream embedding store to keep the index continuously fresh (new
    vectors consumed by cursor, appended here, per-cell small files
    folded later by ``maintain()``'s compaction, which is invisible to
    both searchers and CDC consumers).

    ``codebooks`` must be passed iff the store was written with PQ codes
    (the appended rows must carry the same columns). Centroid DRIFT is
    deliberately out of scope: appends never re-train — when the
    distribution moves, re-cluster with :func:`ivf_write_clustered`
    (atomic full replace) using freshly fitted centroids; recall against
    stale centroids degrades gracefully (assignment stays exact, cell
    balance does not). Listing-layout stores are refused by name: a
    directory append has no atomicity and its searchers no snapshot —
    re-cluster to the manifest layout first. Returns the committed
    relative paths."""
    from ..sources.sinks import is_manifested, write_manifested

    spark = new_vecs.sparkSession
    if not is_manifested(spark, path):
        raise ValueError(
            f"ivf_append_clustered: {path} is a listing-layout store — "
            f"incremental appends need the manifest protocol; re-cluster "
            f"with ivf_write_clustered(commit='manifest') first"
        )
    cell1 = _probe_udf(np.asarray(centroids, dtype=np.float64), 1)
    cols = [
        F.col(id_col),
        F.col(vec_col),
        F.element_at(cell1(F.col(vec_col)), 1).alias("cell"),
    ]
    if codebooks is not None:
        cols.insert(2, _pq_encode_udf(codebooks)(F.col(vec_col)).alias("codes"))
    assigned = new_vecs.select(*cols)
    if files_per_cell <= 1:
        assigned = assigned.repartition("cell")
    else:
        assigned = assigned.repartition(
            len(centroids) * files_per_cell,
            F.col("cell"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_cell)),
        )
    return write_manifested(
        spark, assigned, path, partition_by=["cell"],
    )


def _read_clustered(spark, path: str, probed: list[int]) -> DataFrame:
    """Scan of an :func:`ivf_write_clustered` store restricted to the
    ``probed`` cells. Manifest-committed stores prune the file set
    DRIVER-SIDE from the manifest head (an O(head) prefix filter — no
    directory listing, and a concurrent re-cluster can't tear the read);
    listing stores rely on Catalyst partition pruning from the ``isin``
    filter the callers apply. Both return the same columns."""
    from ..sources.sinks import is_manifested, read_manifested

    if is_manifested(spark, path):
        return read_manifested(
            spark, path, prefixes=[f"cell={c}/" for c in probed]
        )
    return spark.read.parquet(path)


def knn_ivf_clustered(
    spark,
    path: str,
    centroids: list[list[float]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search over a :func:`ivf_write_clustered` store. The probed
    cell set (union over the query batch — queries are the SMALL side by
    ANN's contract) becomes an ``IN`` filter on the partition column, so
    Catalyst prunes unscanned cells at file-listing time; the re-rank is
    then the same broadcast equi-join as :func:`knn_ivf`. Results are
    identical to :func:`knn_ivf` with the same centroids/nprobe
    (tested)."""
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(f"nprobe must be in [1, {len(centroids)}]")
    cellN = _probe_udf(np.asarray(centroids, dtype=np.float64), nprobe)
    # eager checkpoint: q feeds TWO plan references (the probed-cell
    # collect below and the broadcast side of the join) — without it the
    # query scan + probe UDF run twice (Spark does not dedupe common
    # subplans); the batch is small by ANN's contract, so the
    # materialization is bounded
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(cellN(F.col(vec_col))).alias("cell"),
    ).localCheckpoint(eager=True)
    # bounded collect: one int per (query, probe); ANN queries are a batch
    probed = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    c = (
        _read_clustered(spark, path, probed)
        .where(F.col("cell").isin(probed))  # partition pruning (residual on manifest)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cvec"),
            F.col("cell").cast("int").alias("cell"),
        )
    )
    return _cell_rerank(c, q, k)


def pq_codebooks(
    m: int, ksub: int, dim: int, seed: int = 0
) -> list[list[list[float]]]:
    """Seeded product-quantization codebooks (driver-side constants):
    ``m`` subspaces of ``dim/m`` dims, ``ksub`` codes each. Like
    :func:`ivf_centroids`, random codebooks give PQ's cost structure
    without a training pass and, being pure literals, let the DuckDB
    oracle embed identical values; :func:`pq_fit_codebooks` is the
    real-deployment path."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    c = np.random.default_rng(seed).standard_normal((m, ksub, dim // m))
    return c.tolist()


def pq_fit_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    seed: int = 0,
    max_iter: int = 20,
) -> list[list[list[float]]]:
    """Train PQ codebooks: an independent ``pyspark.ml`` KMeans per
    subspace (m small MLlib jobs over column-sliced subvectors — each a
    distributed fit, like :func:`ivf_fit_centroids`)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = corpus.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:
        raise ValueError(
            f"pq_fit_codebooks: no non-NULL {vec_col!r} row to derive the "
            "vector dim from (empty corpus or all-NULL embeddings)"
        )
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for j in range(m):
        feats = corpus.select(
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + j, maxIter=max_iter).fit(feats)
        books.append(
            [[float(x) for x in ctr] for ctr in model.clusterCenters()]
        )
    return books


def _pq_cb_arr(codebooks: list[list[list[float]]]) -> np.ndarray:
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, sub)
    if cb.ndim != 3:
        raise ValueError("codebooks must be m x ksub x sub")
    return cb


def pq_half_norms(codebooks: list[list[list[float]]]) -> list[list[float]]:
    """0.5*||code||² per codebook entry — the shared literal both the
    encode kernel and the DuckDB oracle embed, so ``argmin ||v-c||²``
    can be evaluated as ``argmin (half - <v,c>)`` with bit-identical
    floats on both sides (<v,c> accumulates left-to-right in float64,
    the proven list_inner_product-parity pattern)."""
    cb = _pq_cb_arr(codebooks)
    return (0.5 * (cb * cb).sum(axis=2)).tolist()


def _pq_encode_udf(codebooks: list[list[list[float]]]):
    """vector → array<int> of m PQ codes: per subspace, the codebook
    entry minimizing ``half - <v_sub, c>`` (≡ nearest by L2 for fixed
    v_sub), ties to the smaller code — same tie rule as the oracle's
    ``ORDER BY s ASC, cid ASC``."""
    cb = _pq_cb_arr(codebooks)
    m, ksub, sub = cb.shape
    half = np.asarray(pq_half_norms(codebooks), dtype=np.float64)

    @pandas_udf("array<int>")
    def k(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        vm = _stack(v)
        if vm.shape[1] != m * sub:
            if v.isna().all():
                # every row in this batch is NULL: _stack had no non-null
                # row to take the width from — all codes are NULL
                return pd.Series([None] * len(v), dtype="object")
            # non-null vectors of the wrong width = wrong codebook set
            # for this corpus: raise instead of silently writing a fully
            # NULL codes column that every ADC scan would then "search"
            raise ValueError(
                f"pq_encode: vector width {vm.shape[1]} != codebooks' "
                f"m*sub = {m * sub} on non-null input"
            )
        codes = np.empty((len(vm), m), dtype=np.int32)
        for j in range(m):
            vj = vm[:, j * sub : (j + 1) * sub]
            acc = vj[:, 0:1] * cb[j][None, :, 0]
            for t in range(1, sub):
                acc = acc + vj[:, t : t + 1] * cb[j][None, :, t]
            score = half[j][None, :] - acc
            # argmin returns the FIRST minimum — the smaller-code tie
            # rule — at O(ksub), unlike a full stable argsort
            codes[:, j] = np.argmin(score, axis=1)
        # NULL vectors (NaN rows after _stack) must encode to NULL codes
        # — argmin over NaN scores would silently yield code 0, i.e. a
        # FAKE but finite reconstruction that could surface as a top-k
        # neighbor; null codes decode to null and the cosine's SQL NULL
        # sorts out of every top-k, matching the raw-vector paths
        null_rows = np.isnan(vm).any(axis=1)
        out = list(codes)
        for i in np.nonzero(null_rows)[0]:
            out[i] = None
        return pd.Series(out, dtype="object")

    return k


def _pq_recon_udf(codebooks: list[list[list[float]]]):
    """codes → the reconstructed (decoded) vector: concat of each
    subspace's codebook entry. ADC scoring runs through this because
    ``<q, recon>`` is mathematically Σ_j <q_j, cb_j[code_j]> (the ADC
    lookup-table sum) while giving both engines ONE left-to-right
    64-dim accumulation — the bit-stable evaluation order the cosine
    kernels already pin."""
    cb = _pq_cb_arr(codebooks)
    m = cb.shape[0]

    @pandas_udf("array<double>")
    def k(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="object")
        vals = codes.to_numpy()
        nulls = np.array([c is None for c in vals])
        if nulls.all():
            return pd.Series([None] * len(vals), dtype="object")
        fill = np.zeros(m, dtype=np.int64)
        cm = np.stack(
            [fill if c is None else np.asarray(c) for c in vals]
        ).astype(np.int64)  # (n, m)
        recon = np.concatenate([cb[j][cm[:, j]] for j in range(m)], axis=1)
        out = list(recon)
        for i in np.nonzero(nulls)[0]:
            out[i] = None
        return pd.Series(out, dtype="object")

    return k


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress the corpus to PQ codes: (id, array<int> of m codes).
    This is the 100 TB memory story — m small codes replace the full
    vector (64 float32 → 32 4-bit codes at the driver contract's shape:
    ~16× less to scan, shuffle, or cache), and every downstream ADC scan
    reads ONLY this table; the raw vectors are touched again only by an
    exact refine."""
    enc = _pq_encode_udf(codebooks)
    return corpus.select(
        F.col(id_col), enc(F.col(vec_col)).alias("codes")
    )


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the corpus is scanned as PQ
    codes only; each (query, code) pair scores cos(q, decode(codes)).
    No shuffle on the corpus side — queries broadcast, scoring is
    map-side, the per-query top-k window shuffles only the scored pairs.
    Approximate by construction (quantization error), so the returned
    ``cosine`` is the ADC estimate; chase with an exact refine
    (:func:`knn_ivf_pq`) when true distances matter."""
    enc = _pq_encode_udf(codebooks)
    rec = _pq_recon_udf(codebooks)
    # decode BEFORE the query join: once per corpus row, not once per
    # (query, neighbor) pair — same stage (queries broadcast, the corpus
    # side never shuffles), so the reconstruction never crosses the wire
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        rec(enc(F.col(vec_col))).alias("__recon"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_kernel(F.col("__qvec"), F.col("__recon")), 6
            ).alias("cosine"),
        )
    )
    return _topk(sims, k)


def _adc_refine(
    codes: DataFrame,
    q: DataFrame,
    truth: DataFrame,
    qv: DataFrame,
    k: int,
    refine_factor: int,
) -> DataFrame:
    """Shared IVF-PQ tail: ADC-score PQ reconstructions over the probed
    cells (queries broadcast), keep the top ``k*refine_factor`` ADC
    candidates per query (ties broken by neighbor_id asc), exact-cosine
    re-rank the candidates against raw vectors, per-query top-k. Used by
    BOTH :func:`knn_ivf_pq` (logical corpus) and
    :func:`knn_ivf_pq_clustered` (physical store) — each has its own
    DuckDB oracle, so the tie rules and refine cut must change in
    lockstep; a single tail makes divergence impossible.

    ``codes``: (neighbor_id, __recon, cell); ``q``: (query_id, __qvec,
    cell) probe-exploded; ``truth``: (neighbor_id, __cvec) raw vectors;
    ``qv``: (query_id, __qvec)."""
    adc = (
        codes.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_kernel(F.col("__qvec"), F.col("__recon")), 6
            ).alias("adc"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    sims = (
        truth.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_kernel(F.col("__qvec"), F.col("__cvec")), 6
            ).alias("cosine"),
        )
    )
    return _topk(sims, k)


def knn_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    refine_factor: int = 4,
) -> DataFrame:
    """IVF-PQ with exact refine — the standard billion-scale ANN
    architecture, composed from this module's pieces: the coarse
    quantizer prunes to ``nprobe`` cells (partition pruning when the
    store is laid out by :func:`ivf_write_clustered`), ADC scores the
    probed cells over PQ CODES (≈16× less data than raw vectors at the
    driver contract's m=32 codebooks), the
    top ``k*refine_factor`` ADC candidates per query are then re-ranked
    by exact cosine against the raw vectors (a broadcast join of the
    tiny candidate set back to the corpus). Only the refine ever reads
    full vectors, and only for candidates."""
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(f"nprobe must be in [1, {len(centroids)}]")
    c_arr = np.asarray(centroids, dtype=np.float64)
    cell1 = _probe_udf(c_arr, 1)
    cellN = _probe_udf(c_arr, nprobe)
    enc = _pq_encode_udf(codebooks)
    rec = _pq_recon_udf(codebooks)
    # decode pre-join: once per corpus row, not once per collision
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        rec(enc(F.col(vec_col))).alias("__recon"),
        F.element_at(cell1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(cellN(F.col(vec_col))).alias("cell"),
    )
    truth = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    return _adc_refine(c, q, truth, qv, k, refine_factor)


def knn_ivf_pq_clustered(
    spark,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    refine_factor: int = 4,
) -> DataFrame:
    """IVF-PQ over a :func:`ivf_write_clustered` store written with
    ``codebooks`` — the full physical deployment path, where EVERY
    pruning lever is real I/O saved:

    - the probed-cell ``IN`` filter prunes partitions at file-listing
      time (nprobe/n_cells of the store listed/read);
    - the ADC scan selects only (id, codes, cell), so parquet COLUMN
      pruning skips the raw-vector column entirely (~16x less data off
      disk than the vectors it ranks);
    - the refine re-reads the probed cells' (id, vector) columns only
      for the broadcast candidate-id set.

    Results are identical to :func:`knn_ivf_pq` with the same
    centroids/codebooks/params (tested — stored codes come from the
    same encode kernel the logical form applies on the fly)."""
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(f"nprobe must be in [1, {len(centroids)}]")
    cellN = _probe_udf(np.asarray(centroids, dtype=np.float64), nprobe)
    rec = _pq_recon_udf(codebooks)
    # eager checkpoint: q feeds TWO plan references (probed-cell collect +
    # broadcast join side) — see knn_ivf_clustered
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(cellN(F.col(vec_col))).alias("cell"),
    ).localCheckpoint(eager=True)
    # bounded collect: one int per (query, probe); ANN queries are a batch
    probed = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    store = _read_clustered(spark, path, probed)
    # decode right after the (column-pruned) scan: once per stored row,
    # not once per (query, neighbor) collision
    codes_scan = store.where(F.col("cell").isin(probed)).select(
        F.col(id_col).alias("neighbor_id"),
        rec(F.col("codes")).alias("__recon"),
        F.col("cell").cast("int").alias("cell"),
    )
    truth = store.where(F.col("cell").isin(probed)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    return _adc_refine(codes_scan, q, truth, qv, k, refine_factor)


def neardup_sample_predicate(
    id_col: str = "vec_id",
    sample_frac: float = 1.0,
    sample_salt: str = "0",
) -> Column:
    """Deterministic salted-hash sample predicate shared by
    :func:`neardup_pairs_bruteforce` and its DuckDB oracles: keep a row
    iff the first 8 hex digits of ``md5(salt|id)`` — a uniform 32-bit
    integer — fall below ``int(frac * 2^32)``. Cross-engine mirror
    (DuckDB; embed the PYTHON-truncated threshold integer — a SQL
    ``CAST(frac * 2^32 AS UBIGINT)`` rounds where ``int()`` truncates)::

        CAST('0x' || substring(md5('<salt>|' || id), 1, 8) AS UBIGINT)
            < <int(frac * 4294967296)>

    Hash-of-id (not RNG) so the SAME rows are sampled on every engine,
    run, and partitioning — recall-on-a-deterministic-sample stays an
    oracle-able quantity (the :func:`sample_n_per_bin` discipline)."""
    if not (0.0 < sample_frac <= 1.0):
        raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(sample_salt), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return h < int(sample_frac * 4294967296)


def neardup_pairs_bruteforce(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 200_000,
    sample_frac: float | None = None,
    sample_salt: str = "0",
) -> DataFrame:
    """EXACT all-pairs near-dup ground truth — the audit/oracle leg behind
    q_neardup_recall (run it on a sample at 100 TB; the LSH path is the
    production generator).

    One matrix SWEEP instead of 2 per-pair kernel rows per pair: the
    corpus (ids, matrix) is collected and broadcast, and each Arrow batch
    computes its (k x n) cosine block against the full matrix,
    accumulating LEFT-TO-RIGHT over dimensions (bit-identical to
    :func:`cosine_kernel` / the SQL oracle's list_inner_product; np.dot's
    pairwise summation would not be). Rounding to 6 digits uses
    floor(c*1e6+0.5)/1e6 — HALF_UP, matching Spark's F.round for the
    positive cosines a threshold filter sees. Measured 6.5x faster than
    the pairwise-kernel form on the 2k-vector sf0.1 corpus (the kernel
    materializes 2M x 2 vectors through Arrow; the sweep moves each
    vector once).

    BOUNDED BY CONSTRUCTION, not by prose: the collect is guarded by
    ``max_rows`` — a ``limit(max_rows+1)`` probe (the
    ``connected_components`` driver-threshold discipline, graph.py) that
    never counts more than max_rows+1 rows even on a 100 TB corpus, and
    raises with the fix spelled out instead of OOM-ing the driver. At
    corpus sizes above the guard, pass ``sample_frac``: a DETERMINISTIC
    salted-hash sample (:func:`neardup_sample_predicate`, md5-prefix —
    reproducible across engines/runs, DuckDB-mirrorable) taken BEFORE the
    guard, so the audit stays runnable at any corpus size and recall on
    the sample remains an oracle-able quantity. This mirrors the
    reference's eval-metric discipline (metrics computed on a held split,
    never the full stream — `sleap_optuna_train.py:126-156`).

    NULL embeddings are dropped on both sides before the sweep — a null
    vector has no cosine, so it can never be a near-dup (the LSH path
    reaches the same outcome via NaN >= threshold being false). Ids must
    be integral (the output schema is ``id_a long, id_b long``, matching
    every oracle); a non-integer ``id_col`` raises instead of silently
    casting.

    Returns (id_a, id_b) with id_a < id_b, cosine >= ``threshold``."""
    id_type = corpus.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{id_col} must be an integral column (got {id_type}); the "
            "sweep's output schema is id_a/id_b long"
        )
    corpus = corpus.where(F.col(vec_col).isNotNull())
    if sample_frac is not None:
        corpus = corpus.where(
            neardup_sample_predicate(id_col, sample_frac, sample_salt)
        )
    if max_rows is not None:
        # bounded probe: limit(max_rows+1) never scans past the guard
        # even on a huge corpus — the same shape as the CC driver probe
        n_probe = corpus.select(id_col).limit(max_rows + 1).count()
        if n_probe > max_rows:
            raise ValueError(
                f"neardup_pairs_bruteforce: corpus has > {max_rows} rows "
                "after filters — the brute-force audit collects its input "
                "to the driver and sweeps O(n²) cosines, which does not "
                "scale past a sample. Pass sample_frac=<f> for a "
                "deterministic salted-hash sample, or raise max_rows "
                "deliberately."
            )
    pdf = corpus.select(id_col, vec_col).toPandas()
    if len(pdf) == 0:
        # an empty (or all-NULL-embedding) corpus has zero pairs; np.stack
        # on an empty sequence would raise instead
        spark = corpus.sparkSession
        return spark.createDataFrame([], schema="id_a long, id_b long")
    ids_np = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
    spark = corpus.sparkSession
    # broadcast the TRANSPOSED matrix (dim, n) C-contiguous: the sweep
    # reads one dimension of all corpus vectors per accumulate step, and
    # m[:, j] on the (n, dim) layout is a strided gather
    bc = spark.sparkContext.broadcast((ids_np, np.ascontiguousarray(mat.T)))

    def sweep(batches):
        ids_all, mt = bc.value  # (dim, n)
        dim, n = mt.shape
        norms = np.sqrt(_dot_ltr(mt.T, mt.T)) if n else np.zeros(0)
        # TWO-LEVEL blocking, caught live by the 100x measurement: the
        # naive (arrow_batch x n) block is a multi-GB temporary PER
        # DIMENSION STEP (swap death at 32 tasks), and even a row-chunked
        # form streams rows x n x dim x ~24 B through memory (~60 TB at
        # 200k x 200k — bandwidth-bound for ~20 min). Chunking BOTH axes
        # keeps the accumulator (64 x 1024 = 0.5 MB, L2-resident — block
        # sizes measured: 0.5 MB beats 4 MB by 1.3x under 32 concurrent
        # workers sharing L3) across the dim loop, so the corpus matrix
        # is read once per row block instead of once per dimension.
        # Accumulation order per OUTPUT ELEMENT is unchanged
        # (j = 0..dim-1, left-to-right) — bit-identical to cosine_kernel
        # and the SQL oracles (test-pinned against the pairwise-kernel
        # join). Measured: 200k x 200k sweep ~103 s/task single-core,
        # 2-4 min wall on local[32].
        row_blk = 64
        col_blk = 1024
        for b in batches:
            if len(b) == 0:
                continue
            a_full = _stack(b[vec_col])
            ids_full = b[id_col].to_numpy()
            for lo in range(0, len(a_full), row_blk):
                a = a_full[lo : lo + row_blk]
                a_ids = ids_full[lo : lo + row_blk]
                a_norm = np.sqrt(_dot_ltr(a, a))
                out_r: list[np.ndarray] = []
                out_c: list[np.ndarray] = []
                for cl in range(0, n, col_blk):
                    ch = min(cl + col_blk, n)
                    acc = a[:, 0:1] * mt[0, cl:ch][None, :]
                    for j in range(1, dim):
                        acc += a[:, j : j + 1] * mt[j, cl:ch][None, :]
                    cos = acc / (a_norm[:, None] * norms[cl:ch][None, :])
                    cos = np.floor(cos * 1e6 + 0.5) / 1e6
                    hit = (cos >= threshold) & (
                        a_ids[:, None] < ids_all[cl:ch][None, :]
                    )
                    r, c = np.nonzero(hit)
                    out_r.append(a_ids[r])
                    out_c.append(ids_all[cl:ch][c])
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_r).astype(np.int64)
                        if out_r else np.zeros(0, np.int64),
                        "id_b": np.concatenate(out_c).astype(np.int64)
                        if out_c else np.zeros(0, np.int64),
                    }
                )

    # spread before the O(rows x n) sweep kernel ONLY when the n² work
    # amortizes the extra exchange (r15, measured): at n=2k (bench) the
    # whole sweep is ~0.3 s single-task and the spread's shuffle+schedule
    # costs more than it buys (paired A/B: +0.5-0.9 s); at n=200k a 1-2
    # file-split scan would single-thread a multi-minute kernel. n is
    # already on the driver (the collected matrix), so the rule is free.
    # Crossover from the measured sweep rate (~2e9 dim-mults/s/core):
    # n² x dim exceeds ~10 task-seconds of kernel work around n=10k.
    inp = corpus.select(id_col, vec_col)
    if len(pdf) >= 10_000:
        inp = _spread(inp)
    return inp.mapInPandas(sweep, schema="id_a long, id_b long")


def semantic_dedup(
    corpus: DataFrame,
    hyperplanes: list[list[float]] | None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    auto_bands: bool = False,
    target_recall: float = 0.95,
    seed: int = 0,
    max_pairs_per_bucket: int | None = None,
) -> DataFrame:
    """Embedding-space near-duplicate CLUSTERING — the semantic analog of
    MinHash ``dedup_clusters``: sign-LSH-bucketed cosine pairs at
    ``threshold`` (``embedding_near_dups``) become an undirected graph whose
    connected components are duplicate groups; the representative is the
    minimum id per component.

    Returns (vec_id, cluster, is_representative) for EVERY corpus row —
    rows with no near-dup are their own singleton clusters, so filtering
    ``is_representative`` yields the deduplicated corpus. Scale shape: the
    pair generation is bucketed (never all-pairs) and the component solve is
    the adaptive ``connected_components`` (driver union-find under the edge
    threshold, two-phase large/small-star above it). ``n_tables`` OR-amplifies
    the candidate generator exactly as in :func:`embedding_near_dups` —
    a missed pair here silently leaves a duplicate in the "deduplicated"
    corpus, so production passes should amplify and audit recall
    (q_neardup_recall's pattern) — or pass ``auto_bands=True`` to size
    (planes, tables) from the corpus via :func:`lsh_planes_for`."""
    from .graph import connected_components

    pairs = embedding_near_dups(
        corpus, hyperplanes, threshold, id_col, vec_col, n_tables,
        auto_bands=auto_bands, target_recall=target_recall, seed=seed,
        max_pairs_per_bucket=max_pairs_per_bucket,
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    ids = corpus.select(F.col(id_col))
    return (
        ids.join(comp, ids[id_col] == comp["node"], "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster"),
        )
        .withColumn("is_representative", F.col("cluster") == F.col(id_col))
    )


def embedding_stats(corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-label count + mean L2 norm (rounded for oracle comparison)."""
    return (
        corpus.select(F.col("label"), _norm_kernel(F.col(vec_col)).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
    )


def kmeans_assign_stats(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd assignment step against fixed centroids: every vector goes to
    its argmax-inner-product cell (ties to the smaller cid, matching
    :func:`knn_ivf`), summarized per cell as (count, mean cosine to centroid).

    This is the convergence-monitoring statistic of distributed k-means — and
    the cell histogram IS the IVF partition-size audit at 100 TB (a skewed
    cell means a skewed physical partition under cluster-by-cell layout).
    One Arrow-kernel projection + one map-side-combinable groupBy; the
    centroid table is a broadcast literal."""
    c_arr = np.asarray(centroids, dtype=np.float64)
    cell1 = _probe_udf(c_arr, 1)
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(cid, [float(x) for x in cv]) for cid, cv in enumerate(centroids)],
        "cid int, centroid array<double>",
    )
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.element_at(cell1(F.col(vec_col)), 1).alias("cid"),
    )
    return (
        assigned.join(F.broadcast(cent), "cid")
        .select("cid", F.round(cosine_kernel(F.col("__v"), F.col("centroid")), 6).alias("cos"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
        )
    )


def quantize_embeddings_stats(
    corpus: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Symmetric per-vector int8 quantization audit (the compression step an
    embedding store runs before serving ANN at scale): scale = max|v|/127,
    q_i = floor(v_i/scale + 0.5) (explicit half-up — np.round's banker's
    rounding and SQL round() disagree at exact halves, floor(x+0.5) is
    bit-identical everywhere), reporting per label the mean scale and the
    mean worst-element reconstruction error.

    Per-vector reductions are max-based (order-free), so results are
    bit-stable under any partitioning; only the final per-label means sum
    across rows. Array lambdas run interpreted, but the work is one pass
    over each vector — no join, one map-side-combinable groupBy."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # materialize the scale BEFORE the per-element error lambda: embedding a
    # scale expression containing array_max inside the transform body would
    # re-scan the whole vector per element (higher-order functions run
    # interpreted with no common-subexpression elimination — O(d^2)/vector)
    scaled = corpus.select(
        F.col(label_col),
        v.alias("__v"),
        (F.array_max(F.transform(v, F.abs)) / F.lit(127.0)).alias("__scale"),
    )
    sc = F.col("__scale")
    err = F.when(sc == 0.0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                F.col("__v"),
                lambda x: F.abs(x - F.floor(x / sc + F.lit(0.5)) * sc),
            )
        )
    )
    return (
        scaled.select(F.col(label_col), sc.alias("__scale"), err.alias("__err"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("__scale"), 6).alias("avg_scale"),
            F.round(F.avg("__err"), 6).alias("avg_max_err"),
        )
    )
