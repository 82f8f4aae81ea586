"""Connected components for near-duplicate clustering.

The last mile of large-scale dedup: LSH/Jaccard candidate PAIRS must become
CLUSTERS (one canonical document per group of transitively-linked near-dups).
That's connected components over the similarity graph.

Implemented with the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
the standard scalable formulation): each iteration is two self-contained
DataFrame rounds (groupBy min-neighbor + conditional edge rewrite) that
monotonically hang every node off its component's minimum id. Converges in
O(log n) rounds; each round is shuffle-on-node-id only — no driver-side
graph state, no assumption the graph fits anywhere.

``dedup_clusters`` composes the full pipeline: MinHash → LSH buckets →
candidate pairs → components → one representative per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "dedup_clusters",
    "cluster_aware_split",
    "curate_corpus",
]


def _cc_union_find(spark, edge_rows, id_type) -> DataFrame:
    """Driver-local union-find over collected (u, v) rows; output is
    bit-identical to the distributed path: one (node, component=min-id) row
    per node appearing in the edge set."""
    import pyspark.sql.types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in edge_rows:
        u, v = row["u"], row["v"]
        for n in (u, v):
            if n not in parent:
                parent[n] = n
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    out = [(n, comp_min[find(n)]) for n in parent]
    schema = T.StructType(
        [T.StructField("node", id_type), T.StructField("component", id_type)]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """edges (undirected, any orientation) → (node, component) with component
    = min node id in the component.

    Adaptive strategy (the AQE principle applied to an iterative algorithm):
    the deduped edge set is counted once, and when it fits comfortably on the
    driver (≤ ``driver_threshold`` edges, ~MBs) components are solved with a
    local union-find in one collect — candidate-pair graphs from banded LSH
    are usually tiny relative to the corpus, and a 5-iteration distributed
    loop on a few thousand edges is pure scheduling overhead. Above the
    threshold the scalable alternating large-star/small-star algorithm
    (Kiveris et al., SoCC'14) runs: O(log n) rounds of shuffle-on-node-id
    DataFrame ops, no driver-side graph state. Both paths produce identical
    (node, component=min-id) output; set ``driver_threshold=0`` to force the
    distributed path.

    Each star references the edge set four times, so WITHOUT lineage
    truncation the logical plan grows 16x per iteration and Catalyst analysis
    time explodes combinatorially — every iteration therefore ends in an
    eager localCheckpoint (constant-size plans, and the convergence-check
    count is free against the materialized result).
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    if driver_threshold:
        # limit(threshold+1) bounds the probe: never counts — or collects —
        # more than threshold+1 rows even on a huge graph
        probe = e.limit(driver_threshold + 1).collect()
        if len(probe) <= driver_threshold:
            return _cc_union_find(spark, probe, e.schema["u"].dataType)

    def large_star(e: DataFrame) -> DataFrame:
        # neighbors in both directions; connect every strictly-larger
        # neighbor to the minimum of N(u) ∪ {u}
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
        joined = sym.join(m, "u")
        return (
            joined.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient edges small←large, connect all smaller-or-equal neighbors
        # (and u itself) to the minimum
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = oriented.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
        joined = oriented.join(m, "u")
        out = joined.select(F.col("v").alias("u"), F.col("mn").alias("v")).unionByName(
            joined.select(F.col("u"), F.col("mn").alias("v"))
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    def fingerprint(df: DataFrame) -> tuple:
        # one shuffle-free job over the materialized checkpoint: count plus an
        # order-insensitive 64-bit checksum. Equal fingerprints ⇒ identical
        # edge sets (collision odds ~2^-64 per iteration); the previous
        # exceptAll check cost two extra shuffles per iteration.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: a long sum of 64-bit hashes overflows under ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("sig"),
        ).first()
        return (row["n"], row["sig"])

    # LAZY checkpoints (r16, guide §5.3): the fingerprint aggregate is the
    # first (and only) consumer of each iteration's edge set — it
    # materializes the checkpoint as a side effect, so every iteration is
    # ONE job instead of two (count + agg). Later consumers (the next
    # iteration's stars) read the persisted rows.
    e = e.localCheckpoint(eager=False)
    prev = fingerprint(e)
    for _ in range(max_iterations):
        e2 = small_star(large_star(e)).localCheckpoint(eager=False)
        # converged when every edge already points at the component minimum:
        # large_star+small_star is then a no-op (same edge set)
        cur = fingerprint(e2)
        e = e2
        if cur == prev:
            break
        prev = cur
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    # singletons of the original edge set resolve to themselves implicitly;
    # nodes that ended as component minima appear only on the v side
    minima = comp.select(F.col("component").alias("node")).distinct().join(
        comp.select("node"), "node", "left_anti"
    ).withColumn("component", F.col("node"))
    return comp.unionByName(minima)


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Full near-dup clustering: MinHash → banded LSH candidate pairs →
    connected components → (doc_id, cluster, is_representative).

    Representative = minimum doc id per cluster; docs sharing no bucket are
    their own singleton clusters."""
    from .text import lsh_buckets, minhash_signature

    sigs = minhash_signature(docs, text_col, id_col, num_perm, shingle_k)
    n_bands = num_perm // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[F.col(f"mh{b * band_size + i}").cast("string") for i in range(band_size)],
                    )
                ).alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    memb = sigs.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = memb.alias("a"), memb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst"))
        .distinct()
    )
    comp = connected_components(pairs)
    out = docs.select(id_col).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    out = out.withColumn("cluster", F.coalesce("component", F.col(id_col))).drop("component")
    return out.withColumn("is_representative", F.col(id_col) == F.col("cluster"))


def cluster_aware_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_buckets: int = 8,
    val_buckets: int = 1,
    n_buckets: int = 10,
    num_perm: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup-leakage-safe train/val/test split (r8): assign each doc to
    a split by hashing its near-duplicate CLUSTER id, not its own id — so
    transitively-linked near-duplicates always land on the SAME side, and
    a test document can never be a near-copy of a training document.

    This closes the gap ``corpus_split`` leaves open (a pure per-doc hash
    split puts ~(1 - 1/n_buckets) of every near-dup pair across the
    boundary — the classic eval-contamination bug; Lee et al. 2022's
    "Deduplicating Training Data Makes Language Models Better" measures
    exactly this leakage class). Composition: ``dedup_clusters`` (MinHash
    → banded LSH → connected components, all bucket/shuffle-parallel) →
    md5 bucket of the cluster id → split label. Membership is a pure
    function of corpus content, stable across runs, engines, and
    partitionings.

    Returns (doc_id, cluster, split) — one row per document."""
    from .text import md5_long

    cl = dedup_clusters(docs, text_col, id_col, num_perm, band_size, shingle_k)
    bucket = md5_long(F.col("cluster").cast("string")) % n_buckets
    split = (
        F.when(bucket < train_buckets, F.lit("train"))
        .when(bucket < train_buckets + val_buckets, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return cl.select(F.col(id_col), "cluster", split.alias("split"))


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.55,
    sample_keep_pct: int = 80,
    num_perm: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """The full training-data curation funnel as ONE composed plan:
    quality filter → near-dup clustering → representatives only →
    deterministic hash sample.

    Each stage is the already-verified operator (``text_stats`` quality,
    ``dedup_clusters``, md5 sampling), chained the way a corpus pipeline
    runs them: filter FIRST (cheapest, prunes the dedup input), cluster on
    survivors, keep one representative per near-dup cluster, then sample to
    the target budget. Deterministic end to end — no RNG, so reruns and the
    SQL oracle agree row-for-row.

    Returns (doc_id, quality_score, cluster).
    """
    from .text import md5_long, text_stats

    # quality scores feed both the entry filter and the final re-join —
    # materialize the tiny (id, score) table so the corpus is scanned for
    # stats exactly once. LAZY (r16, guide §5.3): the clustering probe's
    # broadcast build is the first consumer and materializes it as a side
    # effect (its in-job consumers are dependency-ordered), removing the
    # dedicated count() job from the serial driver chain.
    stats = (
        text_stats(docs, text_col, id_col)
        .select(id_col, "quality_score")
        .localCheckpoint(eager=False)
    )
    good = docs.join(
        stats.where(F.col("quality_score") >= min_quality), id_col
    )
    clusters = dedup_clusters(good, text_col, id_col, num_perm, band_size, shingle_k)
    reps = clusters.where(F.col("is_representative")).select(id_col, "cluster")
    sampled = reps.where(
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(100)) < sample_keep_pct
    )
    return sampled.join(stats, id_col).select(id_col, "quality_score", "cluster")
