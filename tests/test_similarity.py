"""Similarity-search operator tests (SURVEY: training-data-pipeline ops).

Covers what the DuckDB oracles can't: LSH recall against the exact
bruteforce baseline, bit-equality of the unrolled vs lambda dot paths, and
planted near-duplicate recovery.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators import similarity as S
from aeon_sleap_processing_spark.sources import load_table

DIM = 64


def _planes(n: int, rng) -> list[list[float]]:
    return rng.standard_normal((n, DIM)).tolist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).cache()


def test_numpy_kernel_matches_lambda(spark, emb):
    """The Arrow/numpy cosine kernel must be bit-identical to the pure-column
    zip_with/aggregate path (same float64 multiply/sum order)."""
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .select(
            S.cosine_sim(F.col("a.embedding"), F.col("b.embedding")).alias("lam"),
            S.cosine_kernel(F.col("a.embedding"), F.col("b.embedding")).alias("ker"),
        )
    )
    assert pairs.where(~F.col("lam").eqNullSafe(F.col("ker"))).count() == 0


def test_prenorm_kernel_bit_identical(spark, emb):
    """cosine_kernel_prenorm (r15: one LTR dot per pair, norms precomputed
    per side) must be BIT-identical to cosine_kernel — same numerator dot,
    same sqrt(self-dot) factors multiplied in the same order. Includes the
    null-vector row (NULL cosine both ways)."""
    withnull = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(10_000_000, None)], "vec_id long, embedding array<float>"
        )
    )
    a = withnull.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("va"),
        S.vector_norm("embedding").alias("na"),
    )
    b = withnull.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("vb"),
        S.vector_norm("embedding").alias("nb"),
    )
    pairs = a.join(b, F.col("ida") % 97 == F.col("idb") % 89).select(
        S.cosine_kernel(F.col("va"), F.col("vb")).alias("ker"),
        S.cosine_kernel_prenorm(
            F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
        ).alias("pre"),
    )
    assert pairs.count() > 0
    assert pairs.where(~F.col("ker").eqNullSafe(F.col("pre"))).count() == 0


def test_knn_lsh_recall_vs_bruteforce(spark, emb):
    """OR-amplified sign-LSH must recover most of the exact top-5 sets.

    Exact top-5 neighbors of random 64-dim vectors sit at ~65-70deg, so a
    single plane agrees with p ~ 0.6; 6 tables x 3 planes gives theoretical
    recall 1-(1-p^3)^6 ~ 0.75-0.8."""
    rng = np.random.default_rng(42)
    queries = emb.where(F.col("vec_id") < 20)
    exact = S.knn_bruteforce(emb, queries, k=5).toPandas()
    approx = S.knn_lsh(emb, queries, _planes(18, rng), k=5, n_tables=6).toPandas()
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"
    # every approx neighbor must carry the EXACT cosine (re-rank is exact)
    m = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (m.cosine_a == m.cosine_e).all()


def test_knn_lsh_amplification_knobs(spark, emb):
    """More planes per table -> fewer candidates; more tables -> recall can
    only grow (the two scale knobs the 100 TB path depends on)."""
    rng = np.random.default_rng(7)
    queries = emb.where(F.col("vec_id") < 20)
    few = S.knn_lsh(emb, queries, _planes(2, rng), k=5).count()
    many = S.knn_lsh(emb, queries, _planes(8, rng), k=5).count()
    assert many <= few
    planes = _planes(8, rng)
    one = S.knn_lsh(emb, queries, planes[:4], k=5).toPandas()
    two = S.knn_lsh(emb, queries, planes, k=5, n_tables=2).toPandas()
    # table 0 of `two` IS `one`'s table, so every 1-table candidate set is a
    # subset; top-5 can only improve or stay
    assert len(two) >= len(one)


def test_null_vectors_yield_null_cosine(spark):
    """Null embeddings (routine in a large corpus) must flow to SQL NULL in
    the numpy kernel, matching the pure-column form — not crash the batch."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [0.5, -1.0])],
        "vec_id long, embedding array<float>",
    )
    out = df.select(
        S.cosine_kernel(F.col("embedding"), F.col("embedding")).alias("k"),
        S.cosine_sim(F.col("embedding"), F.col("embedding")).alias("c"),
    ).collect()
    for r in out:
        assert (r.k is None) == (r.c is None)
        if r.k is not None:
            assert r.k == r.c


def test_knn_ivf_recall_and_disjoint_cells(spark, emb):
    """IVF candidates come from disjoint cells (no pair dedup needed), probing
    more cells must raise recall monotonically toward exact."""
    cents = S.ivf_centroids(16, DIM, seed=7)
    queries = emb.where(F.col("vec_id") < 20)
    exact = S.knn_bruteforce(emb, queries, k=5).toPandas()
    e = set(zip(exact.query_id, exact.neighbor_id))

    prev = -1.0
    recalls = []
    for nprobe in (1, 4, 16):
        approx = S.knn_ivf(emb, queries, cents, k=5, nprobe=nprobe).toPandas()
        # disjoint cells: a (query, neighbor) candidate can never duplicate
        assert not approx.duplicated(["query_id", "neighbor_id"]).any()
        a = set(zip(approx.query_id, approx.neighbor_id))
        recall = len(e & a) / len(e)
        assert recall >= prev
        prev = recall
        recalls.append(recall)
    # probing ALL cells is exhaustive search — must equal bruteforce
    assert recalls[-1] == 1.0


def test_knn_ivf_with_kmeans_trained_centroids(spark, emb):
    """The real-deployment path: pyspark.ml KMeans trains the coarse
    quantizer; search semantics (disjoint cells, exhaustive at
    nprobe=n_cells) hold for fitted centers exactly as for seeded ones."""
    cents = S.ivf_fit_centroids(emb, n_cells=8, seed=1, max_iter=5)
    assert len(cents) == 8 and len(cents[0]) == DIM
    queries = emb.where(F.col("vec_id") < 10)
    exact = S.knn_bruteforce(emb, queries, k=5).toPandas()
    full = S.knn_ivf(emb, queries, cents, k=5, nprobe=8).toPandas()
    assert not full.duplicated(["query_id", "neighbor_id"]).any()
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(full.query_id, full.neighbor_id))
    assert a == e  # probing every cell is exhaustive search


def test_embedding_near_dups_finds_planted_duplicate(spark, emb):
    """A vector plus a tiny perturbation of itself must surface as a
    near-dup pair regardless of bucket layout (identical signs)."""
    rng = np.random.default_rng(3)
    base = emb.limit(50).toPandas()
    v = np.array(base.embedding.iloc[0], dtype="float32")
    dup = (v + 1e-4 * rng.standard_normal(DIM).astype("float32")).tolist()
    pdf = pd.concat(
        [base[["vec_id", "embedding"]], pd.DataFrame({"vec_id": [99999], "embedding": [dup]})],
        ignore_index=True,
    )
    df = spark.createDataFrame(pdf)
    out = S.embedding_near_dups(df, _planes(6, rng), threshold=0.99).toPandas()
    planted = out[(out.id_a == int(base.vec_id.iloc[0])) & (out.id_b == 99999)]
    assert len(planted) == 1
    assert planted.cosine.iloc[0] > 0.999


class TestKmeansAssignStats:
    def test_partition_of_corpus_and_numpy_parity(self, spark, sf_dir):
        import numpy as np
        from aeon_sleap_processing_spark.operators.similarity import (
            ivf_centroids,
            kmeans_assign_stats,
        )
        from aeon_sleap_processing_spark.sources import load_table

        emb = load_table(spark, "embeddings", sf_dir)
        cents = ivf_centroids(8, 64, seed=7)
        got = kmeans_assign_stats(emb, cents).toPandas()
        pdf = emb.toPandas()
        v = np.stack(pdf.embedding.map(np.asarray).values).astype(np.float64)
        c = np.asarray(cents)
        cells = np.argmax(v @ c.T, axis=1)  # ties impossible w/ random floats
        counts = {int(k): int(n) for k, n in zip(*np.unique(cells, return_counts=True))}
        assert {int(r.cid): int(r.n_vectors) for r in got.itertuples()} == counts
        assert got.n_vectors.sum() == len(pdf)  # every vector in exactly one cell
        cos = (v * c[cells]).sum(1) / (
            np.linalg.norm(v, axis=1) * np.linalg.norm(c[cells], axis=1)
        )
        for cid in counts:
            expect = round(np.round(cos[cells == cid], 6).mean(), 6)
            gotv = float(got.set_index("cid").loc[cid, "avg_cos"])
            assert abs(gotv - expect) < 2e-6


class TestQuantizeEmbeddings:
    def test_roundtrip_error_bound(self, spark):
        """Symmetric int8: worst-element reconstruction error is <= scale/2
        by construction; zero vectors quantize with zero error."""
        import pandas as pd
        from aeon_sleap_processing_spark.operators.similarity import (
            quantize_embeddings_stats,
        )

        vecs = pd.DataFrame(
            {
                "label": [0, 0, 1],
                "embedding": [
                    [1.0, -0.5, 0.25, 127.0 / 127.0],
                    [0.0, 0.0, 0.0, 0.0],
                    [2.54, -1.27, 0.0, 0.01],
                ],
            }
        )
        got = (
            quantize_embeddings_stats(spark.createDataFrame(vecs))
            .toPandas()
            .set_index("label")
            .sort_index()
        )
        assert got.loc[0, "n_vectors"] == 2
        # scale of v1 = 1/127; zero vector contributes scale 0, err 0
        assert abs(got.loc[0, "avg_scale"] - round((1.0 / 127.0) / 2, 6)) < 1e-6
        # max err bounded by half a quantization step (scale/2)
        assert got.loc[1, "avg_max_err"] <= (2.54 / 127.0) / 2 + 1e-12


class TestSemanticDedup:
    def test_planted_duplicate_group_and_singletons(self, spark):
        """Three mutual near-identical vectors collapse to one cluster with
        the min id as representative; orthogonal vectors stay singletons."""
        rng = np.random.default_rng(3)
        base = rng.standard_normal(DIM)
        rows = []
        for vid, vec in [
            (10, base),
            (11, base + rng.standard_normal(DIM) * 1e-3),
            (12, base + rng.standard_normal(DIM) * 1e-3),
            (20, np.roll(base, DIM // 2) * -1.0),
        ]:
            rows.append({"vec_id": vid, "embedding": [float(x) for x in vec]})
        df = spark.createDataFrame(pd.DataFrame(rows))
        out = (
            S.semantic_dedup(df, _planes(6, rng), threshold=0.95)
            .orderBy("vec_id")
            .toPandas()
        )
        assert out.vec_id.tolist() == [10, 11, 12, 20]
        assert out.cluster.tolist() == [10, 10, 10, 20]
        assert out.is_representative.tolist() == [True, False, False, True]


class TestNearDupAmplification:
    def test_or_amplified_recall_dominates_single_band(self, spark, emb):
        """r8 judge finding: one sign-LSH band is half-blind. The
        OR-amplified generator (T tables over the same planes) must be a
        strict superset of any single band's verified pairs and a subset
        of the brute-force truth; on the near-random corpus its recall
        must beat the single band by a wide margin."""
        rng = np.random.default_rng(5)
        planes = _planes(24, rng)
        thr = 0.25
        # brute-force truth
        a = emb.selectExpr("vec_id AS id_a", "embedding AS va")
        b = emb.selectExpr("vec_id AS id_b", "embedding AS vb")
        true_pairs = (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(S.cosine_kernel(F.col("va"), F.col("vb")), 6).alias("c"))
            .where(F.col("c") >= thr)
            .toPandas()
        )
        t = set(zip(true_pairs.id_a, true_pairs.id_b))
        single = S.embedding_near_dups(emb, planes[:4], threshold=thr).toPandas()
        amp = S.embedding_near_dups(emb, planes, threshold=thr, n_tables=6).toPandas()
        s = set(zip(single.id_a, single.id_b))
        m = set(zip(amp.id_a, amp.id_b))
        assert not amp.duplicated(["id_a", "id_b"]).any()  # pair-deduped
        assert s <= t and m <= t  # exact verify: no false positives
        assert s <= m  # table 0 IS the first band: strict containment
        assert len(m) / len(t) >= 2 * max(len(s) / len(t), 0.05)

    def test_semantic_dedup_amplified_matches_singleton_contract(self, spark, emb):
        """n_tables passthrough: every corpus row still appears exactly
        once with a representative, under the amplified generator."""
        rng = np.random.default_rng(5)
        out = S.semantic_dedup(
            emb, _planes(24, rng), threshold=0.25, n_tables=6
        ).toPandas()
        assert len(out) == out.vec_id.nunique() == emb.count()
        reps = out[out.is_representative].set_index("cluster").vec_id.sort_index()
        mins = out.groupby("cluster").vec_id.min().sort_index()
        assert reps.index.tolist() == mins.index.tolist()
        assert (reps == mins).all()


def test_neardup_bruteforce_sweep_equals_pairwise_kernel(spark, emb):
    """The matrix-sweep brute force (audit/truth leg of q_neardup_recall)
    must produce EXACTLY the pairwise-kernel join's pair set — LTR
    accumulation + HALF_UP rounding make it bit-compatible."""
    thr = 0.25
    sweep = {
        (r.id_a, r.id_b)
        for r in S.neardup_pairs_bruteforce(emb, thr).collect()
    }
    a = emb.selectExpr("vec_id AS id_a", "embedding AS va")
    b = emb.selectExpr("vec_id AS id_b", "embedding AS vb")
    kern = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(S.cosine_kernel(F.col("va"), F.col("vb")), 6).alias("c"),
        )
        .where(F.col("c") >= thr)
        .collect()
    }
    assert sweep == kern and len(sweep) > 0


def test_neardup_bruteforce_empty_corpus_yields_zero_pairs(spark):
    """An empty corpus — or one whose embeddings are ALL NULL, which the
    sweep filters out first — must return an empty pair frame, not crash
    in np.stack (the audit leg runs on samples, and a sample can be
    empty)."""
    schema = "vec_id long, embedding array<double>"
    empty = spark.createDataFrame([], schema=schema)
    assert S.neardup_pairs_bruteforce(empty).count() == 0
    allnull = spark.createDataFrame([(1, None), (2, None)], schema=schema)
    assert S.neardup_pairs_bruteforce(allnull).count() == 0


class TestIvfClusteredLayout:
    def test_partition_pruning_and_result_parity(self, spark, emb, tmp_path):
        """Cluster-by-cell layout: (a) a cell filter on the store reads
        ONLY those cells' files (partition pruning — checked via
        input_file_name(), which reflects the post-pruning scan, unlike
        DataFrame.inputFiles()); (b) the clustered search plan carries
        the probed-cell PartitionFilters; (c) results equal knn_ivf for
        the same centroids/nprobe."""
        import contextlib
        import io
        import os

        import pandas as pd

        cents = S.ivf_centroids(8, DIM, seed=7)
        path = str(tmp_path / "store")
        S.ivf_write_clustered(emb, cents, path)
        dirs = [d for d in os.listdir(path) if d.startswith("cell=")]
        assert 1 < len(dirs) <= 8

        # (a) file-level pruning on the mechanism itself
        keep = sorted(int(d.split("=")[1]) for d in dirs)[:2]
        pruned = spark.read.parquet(path).where(F.col("cell").isin(keep))
        touched = {
            r["f"].split("cell=")[1].split("/")[0]
            for r in pruned.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        assert touched == {str(c) for c in keep}

        # (b) the search plan prunes on the probed cells
        queries = emb.where(F.col("vec_id") < 3)
        got = S.knn_ivf_clustered(spark, path, cents, queries, k=5, nprobe=1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got.explain("formatted")
        assert "PartitionFilters" in buf.getvalue()
        assert " IN (" in buf.getvalue()

        # (c) parity with the logical-only knn_ivf
        a = got.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = (
            S.knn_ivf(emb, queries, cents, k=5, nprobe=1)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_files_per_cell_salts_the_write(self, spark, emb, tmp_path):
        """files_per_cell > 1 splits a cell across tasks (the hot-cell
        write-parallelism path): some cell dir holds >1 file, no rows
        are lost, and cell assignment is unchanged."""
        import glob
        import os

        cents = S.ivf_centroids(4, DIM, seed=7)
        flat = str(tmp_path / "flat")
        salted = str(tmp_path / "salted")
        S.ivf_write_clustered(emb, cents, flat)
        S.ivf_write_clustered(emb, cents, salted, files_per_cell=3)

        per_cell = [
            len(glob.glob(os.path.join(salted, d, "*.parquet")))
            for d in os.listdir(salted)
            if d.startswith("cell=")
        ]
        assert max(per_cell) > 1

        a = {tuple(r) for r in spark.read.parquet(flat).select("vec_id", "cell").collect()}
        b = {tuple(r) for r in spark.read.parquet(salted).select("vec_id", "cell").collect()}
        assert a == b and len(a) == emb.count()


class TestProductQuantization:
    @pytest.fixture(scope="class")
    def books(self, spark, emb):
        return S.pq_fit_codebooks(emb, m=8, ksub=4, seed=5, max_iter=5)

    def test_fit_shape_and_encode_range(self, spark, emb, books):
        assert len(books) == 8 and len(books[0]) == 4 and len(books[0][0]) == DIM // 8
        codes = S.pq_encode(emb, books).collect()
        assert len(codes) == emb.count()
        for r in codes:
            assert len(r["codes"]) == 8
            assert all(0 <= c < 4 for c in r["codes"])

    def test_dim_not_divisible_raises(self, emb):
        with pytest.raises(ValueError):
            S.pq_codebooks(m=7, ksub=4, dim=DIM)
        with pytest.raises(ValueError):
            S.pq_fit_codebooks(emb, m=7, ksub=4)

    def test_adc_equals_bruteforce_over_reconstruction(self, spark, emb, books):
        """ADC is exactly brute-force cosine against the DECODED corpus —
        the quantization error is all in encode, none in scoring. Decode
        every corpus vector (recon UDF), brute-force it, compare to
        knn_pq end-to-end."""
        rec = S._pq_recon_udf(books)
        enc = S._pq_encode_udf(books)
        decoded = emb.select(
            "vec_id", rec(enc(F.col("embedding"))).alias("embedding")
        )
        queries = emb.where(F.col("vec_id") < 3)
        via_codes = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in S.knn_pq(emb, queries, books, k=5).collect()
        }
        # brute-force needs query vectors from the RAW side but corpus
        # from the decoded side; knn_bruteforce takes one corpus, so
        # emulate: cross-score decoded corpus vs raw queries
        q = queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qvec")
        )
        sims = (
            decoded.select(F.col("vec_id").alias("neighbor_id"), "embedding")
            .crossJoin(F.broadcast(q))
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    S.cosine_kernel(F.col("__qvec"), F.col("embedding")), 6
                ).alias("cosine"),
            )
        )
        via_recon = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in S._topk(sims, 5).collect()
        }
        assert via_codes == via_recon and len(via_codes) == 15

    def test_ivf_pq_refine_returns_exact_cosines(self, spark, emb, books):
        """The refine stage must output TRUE cosines (not ADC estimates):
        every returned pair's cosine equals the brute-force value."""
        cents = S.ivf_centroids(8, DIM, seed=7)
        queries = emb.where(F.col("vec_id") < 3)
        got = S.knn_ivf_pq(
            emb, queries, cents, books, k=5, nprobe=2, refine_factor=4
        ).collect()
        truth = {
            (r.query_id, r.neighbor_id): r.cosine
            for r in S.knn_bruteforce(emb, queries, k=emb.count()).collect()
        }
        assert len(got) == 15
        for r in got:
            assert truth[(r.query_id, r.neighbor_id)] == r.cosine

    def test_ivf_pq_clustered_store_parity_and_pruning(
        self, spark, emb, books, tmp_path
    ):
        """The code-carrying store: (a) knn_ivf_pq_clustered returns
        exactly knn_ivf_pq's results; (b) the ADC scan's ReadSchema
        excludes the raw-vector column (parquet column pruning) while
        carrying the probed-cell PartitionFilters."""
        import contextlib
        import io

        import pandas as pd

        cents = S.ivf_centroids(8, DIM, seed=7)
        path = str(tmp_path / "pqstore")
        S.ivf_write_clustered(emb, cents, path, codebooks=books)
        assert "codes" in spark.read.parquet(path).columns

        queries = emb.where(F.col("vec_id") < 3)
        got = S.knn_ivf_pq_clustered(
            spark, path, cents, books, queries, k=5, nprobe=2, refine_factor=4
        )
        a = got.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = (
            S.knn_ivf_pq(emb, queries, cents, books, k=5, nprobe=2, refine_factor=4)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan and " IN (" in plan
        # two scans of the store: the ADC scan (codes, no embedding) and
        # the refine scan (embedding); at least one ReadSchema must omit
        # the vector column entirely
        schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert any("codes" in s and "embedding" not in s for s in schemas)


def test_lsh_split_rejects_empty_tables(spark, emb):
    """A (planes, n_tables) combination whose ceil split leaves an empty
    trailing table must raise: an empty table buckets every vector to 0
    and silently degenerates candidate generation to all-pairs."""
    rng = np.random.default_rng(0)
    planes5 = _planes(5, rng)
    q = emb.where(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="empty table"):
        S.knn_lsh(emb, q, planes5, n_tables=4)
    with pytest.raises(ValueError, match="empty table"):
        S.embedding_near_dups(emb, planes5, n_tables=4)
    # divisor-friendly splits still work
    assert S._split_tables(planes5, 5) and S._split_tables(planes5, 1)


def test_width_mismatch_raises_instead_of_nulling(spark):
    """Vectors of the wrong width (queries embedded with a different model,
    or the wrong codebook set) must RAISE, not silently NULL the whole
    batch — the all-null widening paths are only for genuinely null
    batches."""
    import pandas as pd
    import pytest

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1],
            "a": [list(map(float, rng.standard_normal(8)))] * 2,
            "b": [list(map(float, rng.standard_normal(4)))] * 2,
        }
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="width mismatch"):
        df.select(S.cosine_kernel(F.col("a"), F.col("b")).alias("c")).collect()
    books = S.pq_codebooks(4, 4, 16, seed=1)  # expects dim 16, data is 8
    with pytest.raises(Exception, match="pq_encode"):
        S.pq_encode(df.select("vec_id", F.col("a").alias("embedding")), books).collect()


def test_pq_null_embedding_never_surfaces_as_neighbor(spark):
    """A NULL corpus vector must encode to NULL codes (not silently to
    code 0's fake reconstruction) and never appear in any PQ top-k."""
    import pandas as pd

    rng = np.random.default_rng(9)
    vecs = [list(map(float, rng.standard_normal(DIM))) for _ in range(20)]
    pdf = pd.DataFrame({"vec_id": list(range(20)), "embedding": vecs})
    df = spark.createDataFrame(pdf)
    nulled = df.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 7, F.lit(None)).otherwise(F.col("embedding")),
    )
    books = S.pq_codebooks(8, 4, DIM, seed=1)
    codes = {r.vec_id: r.codes for r in S.pq_encode(nulled, books).collect()}
    assert codes[7] is None and codes[0] is not None
    got = S.knn_pq(nulled, nulled.where(F.col("vec_id") < 3), books, k=10)
    assert got.where(F.col("neighbor_id") == 7).count() == 0


class TestNeardupBruteforceBounds:
    """r10: the audit leg is bounded by construction — max_rows raise-guard
    (the connected_components driver-threshold discipline) plus a
    deterministic salted-hash sample for any-scale corpora."""

    def test_max_rows_guard_raises_with_actionable_message(self, spark, emb):
        n = emb.count()
        with pytest.raises(ValueError, match="sample_frac"):
            S.neardup_pairs_bruteforce(emb, 0.25, max_rows=n - 1).count()
        # exactly at the bound: allowed
        assert (
            S.neardup_pairs_bruteforce(emb, 0.99, max_rows=n).count() >= 0
        )

    def test_sample_is_deterministic_and_subset(self, spark, emb):
        a = {
            (r.id_a, r.id_b)
            for r in S.neardup_pairs_bruteforce(
                emb, 0.2, sample_frac=0.5, sample_salt="s1"
            ).collect()
        }
        b = {
            (r.id_a, r.id_b)
            for r in S.neardup_pairs_bruteforce(
                emb, 0.2, sample_frac=0.5, sample_salt="s1"
            ).collect()
        }
        full = {
            (r.id_a, r.id_b)
            for r in S.neardup_pairs_bruteforce(emb, 0.2).collect()
        }
        assert a == b  # reproducible across runs (hash-of-id, not RNG)
        assert a <= full and 0 < len(a) < len(full)

    def test_sample_predicate_mirrors_duckdb(self, spark, emb, sf_dir):
        """The md5-prefix predicate must select the SAME ids in Spark and
        DuckDB — that is what keeps recall-on-a-sample oracle-able."""
        import duckdb

        frac, salt = 0.37, "7"
        got = sorted(
            r.vec_id
            for r in emb.where(
                S.neardup_sample_predicate("vec_id", frac, salt)
            ).collect()
        )
        # the threshold integer is computed ONCE in Python and embedded:
        # CAST(frac * 2^32 AS UBIGINT) in SQL would ROUND where Python
        # int() truncates — an off-by-one disagreement at a boundary hash
        want = [
            r[0]
            for r in duckdb.sql(
                f"""
                SELECT vec_id FROM '{sf_dir}/embeddings.parquet'
                WHERE CAST('0x' || substring(md5('{salt}|' || vec_id), 1, 8)
                           AS UBIGINT)
                      < {int(frac * 4294967296)}
                ORDER BY vec_id
                """
            ).fetchall()
        ]
        assert got == want and 0 < len(got) < emb.count()


def test_near_dups_null_vectors_filtered_before_bucketing(spark):
    """ADVICE r9: NULL embeddings hash to bucket 0 in EVERY table, so
    without the up-front filter an n_nulls-heavy corpus regenerates the
    all-pairs product before the NULL cosine filters it. The filter must
    not change results: null rows can never be near-dups, and
    semantic_dedup still returns them as their own singleton clusters."""
    rng = np.random.default_rng(11)
    planes = _planes(12, rng)
    v = rng.standard_normal(DIM)
    rows = [
        (1, (v / np.linalg.norm(v)).tolist()),
        (2, (1.01 * v / np.linalg.norm(v)).tolist()),  # planted dup of 1
        (3, None),
        (4, None),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = S.embedding_near_dups(df, planes, 0.95, n_tables=3).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    clusters = S.semantic_dedup(df, planes, 0.95, n_tables=3).collect()
    got = {r.vec_id: (r.cluster, r.is_representative) for r in clusters}
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (3, True),
        4: (4, True),
        5: (5, True),
    }
    # plan-shape: the scan side of candidate generation carries the
    # isnotnull(embedding) predicate (pushed, not post-bucket)
    plan = S.embedding_near_dups(df, planes, 0.95, n_tables=3)._jdf.queryExecution().toString()
    assert "isnotnull(embedding" in plan


def test_pq_fit_codebooks_rejects_empty_and_allnull(spark):
    schema = "vec_id long, embedding array<double>"
    with pytest.raises(ValueError, match="non-NULL"):
        S.pq_fit_codebooks(spark.createDataFrame([], schema=schema))
    with pytest.raises(ValueError, match="non-NULL"):
        S.pq_fit_codebooks(
            spark.createDataFrame([(1, None)], schema=schema)
        )


class TestLshPlanesFor:
    """r11: the b ≈ log2(n)+margin law as code, pinned to the committed
    r10 second-decade artifact (bench_runs_r10/neardup_threshold_100x.json)."""

    def test_reproduces_the_200k_artifact_point(self):
        """The artifact's cure for the 18x/decade blowup was b=20 at
        n=200k; the helper must reproduce exactly that sizing."""
        import json
        import math
        import os

        from aeon_sleap_processing_spark.operators.similarity import (
            lsh_planes_for,
        )

        art = json.load(
            open(
                os.path.join(
                    os.path.dirname(__file__), "..",
                    "bench_runs_r10", "neardup_threshold_100x.json",
                )
            )
        )
        n = art["200k"]["n_vectors"]
        b_fixed = art["planes_per_table"]          # 16: the blowup config
        b_cured = art["200k"]["near_dups_b20"]["planes_per_table"]  # 20
        planes, n_tables = lsh_planes_for(
            n, dim=64, threshold=art["threshold"], target_recall=0.95
        )
        b = len(planes) // n_tables
        assert b == b_cured == math.ceil(math.log2(n)) + 2
        assert b > b_fixed
        # the random-collision floor the sizing controls: expected random
        # candidates PER ROW (T*2^-b*n/2) is bounded by T/4 independent
        # of n — LINEAR total, the quadratic blowup is gone; at fixed
        # b=16 the same quantity is 2^4 = 16x worse
        floor_per_row = n_tables * 2.0 ** (-b) * n / 2
        assert floor_per_row <= n_tables / 4, floor_per_row
        planes10, T10 = lsh_planes_for(
            10 * n, dim=64, threshold=art["threshold"], target_recall=0.95
        )
        b10 = len(planes10) // T10
        assert T10 * 2.0 ** (-b10) * 10 * n / 2 <= T10 / 4  # still bounded at 10x

    def test_tables_sized_by_recall_identity(self):
        import math

        from aeon_sleap_processing_spark.operators.similarity import (
            lsh_planes_for,
        )

        for thr, rec in [(0.9, 0.95), (0.95, 0.9), (0.99, 0.99)]:
            planes, T = lsh_planes_for(50_000, dim=32, threshold=thr,
                                       target_recall=rec)
            b = len(planes) // T
            p = 1 - math.acos(thr) / math.pi
            achieved = 1 - (1 - p**b) ** T
            assert achieved >= rec, (thr, rec, b, T, achieved)
            # and not absurdly oversized: T-1 tables would miss the target
            if T > 1:
                assert 1 - (1 - p**b) ** (T - 1) < rec

    def test_monotone_in_corpus_size_and_validates(self):
        import pytest

        from aeon_sleap_processing_spark.operators.similarity import (
            lsh_planes_for,
        )

        bs = []
        for n in (1_000, 100_000, 10_000_000, 1_000_000_000):
            planes, T = lsh_planes_for(n, dim=16, threshold=0.95)
            bs.append(len(planes) // T)
        assert bs == sorted(bs) and bs[-1] - bs[0] >= 18  # ~log2 growth
        with pytest.raises(ValueError):
            lsh_planes_for(0, dim=8)
        with pytest.raises(ValueError):
            lsh_planes_for(10, dim=8, threshold=1.5)
        with pytest.raises(ValueError):
            lsh_planes_for(10, dim=8, target_recall=1.0)

    def test_auto_bands_end_to_end_matches_manual(self, spark):
        """auto_bands=True sizes the plan from the corpus and finds the
        same planted near-dup pairs as an explicit (planes, tables) call
        with the identical sized plan."""
        import numpy as np

        from aeon_sleap_processing_spark.operators.similarity import (
            embedding_near_dups, lsh_planes_for, semantic_dedup,
        )

        rng = np.random.default_rng(7)
        base = rng.standard_normal((40, 16))
        rows = []
        for i, v in enumerate(base):
            rows.append((i * 2, (v / np.linalg.norm(v)).tolist()))
            w = v + rng.standard_normal(16) * 0.01      # planted near-dup
            rows.append((i * 2 + 1, (w / np.linalg.norm(w)).tolist()))
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        got = embedding_near_dups(
            corpus, None, threshold=0.95, auto_bands=True, seed=3
        ).collect()
        planes, T = lsh_planes_for(80, 16, threshold=0.95, seed=3)
        manual = embedding_near_dups(
            corpus, planes, threshold=0.95, n_tables=T
        ).collect()
        key = lambda r: (r.id_a, r.id_b)
        assert sorted(map(key, got)) == sorted(map(key, manual))
        # every planted pair found (the sized plan's recall target)
        found = {key(r) for r in got}
        planted = {(2 * i, 2 * i + 1) for i in range(40)}
        assert len(planted & found) >= 38  # >= 95% target recall

        clusters = semantic_dedup(
            corpus, None, threshold=0.95, auto_bands=True, seed=3
        )
        n_reps = clusters.where("is_representative").count()
        assert n_reps <= 42  # ~40 clusters of 2


class TestPairBudget:
    """r13 VERDICT task 3: a per-bucket pair budget bounds verify cost
    under adversarial duplicate density; default None is byte-identical
    to the unbudgeted r13 path."""

    def _dense_corpus(self, spark, n_dupes=40, rng_seed=5):
        """One planted mega-clique (n_dupes near-identical vectors all
        hashing to the same bucket in every table) plus spread rows."""
        rng = np.random.default_rng(rng_seed)
        base = rng.standard_normal(DIM)
        rows = []
        for vid in range(n_dupes):
            rows.append({
                "vec_id": vid,
                "embedding": [
                    float(x) for x in base + rng.standard_normal(DIM) * 1e-4
                ],
            })
        for vid in range(1000, 1020):
            rows.append({
                "vec_id": vid,
                "embedding": [float(x) for x in rng.standard_normal(DIM)],
            })
        return spark.createDataFrame(pd.DataFrame(rows)), rng

    def test_budget_caps_hot_bucket_pairs(self, spark):
        df, rng = self._dense_corpus(spark)
        planes = _planes(12, rng)
        full = S.embedding_near_dups(
            df, planes, threshold=0.99, n_tables=3
        ).count()
        assert full == 40 * 39 // 2  # the clique collides everywhere
        # budget 36 → member cap m: m(m-1)/2 <= 36 → m = 9
        capped = S.embedding_near_dups(
            df, planes, threshold=0.99, n_tables=3, max_pairs_per_bucket=36
        )
        got = capped.toPandas()
        assert len(got) <= 36 * 3  # per (table, bucket) cap, 3 tables
        # deterministic tie-break: the 9 smallest ids survive per bucket
        assert set(got.id_a) | set(got.id_b) <= set(range(9))
        # rerun is identical (lexicographic rank, no nondeterminism)
        again = capped.toPandas()
        assert sorted(map(tuple, got[["id_a", "id_b"]].values.tolist())) == \
            sorted(map(tuple, again[["id_a", "id_b"]].values.tolist()))

    def test_none_budget_identical_to_unbudgeted(self, spark, emb):
        rng = np.random.default_rng(11)
        planes = _planes(12, rng)
        sub = emb.limit(300)
        a = S.embedding_near_dups(
            sub, planes, threshold=0.2, n_tables=3
        ).toPandas()
        b = S.embedding_near_dups(
            sub, planes, threshold=0.2, n_tables=3,
            max_pairs_per_bucket=10**9,
        ).toPandas()
        key = lambda d: sorted(
            map(tuple, d[["id_a", "id_b", "cosine"]].values.tolist())
        )
        assert key(a) == key(b)

    def test_semantic_dedup_threads_budget(self, spark):
        df, rng = self._dense_corpus(spark, n_dupes=12)
        planes = _planes(12, rng)
        out = S.semantic_dedup(
            df, planes, threshold=0.99, n_tables=3,
            max_pairs_per_bucket=500,
        ).toPandas()
        # budget 500 > clique's 66 pairs: clustering unchanged — one
        # 12-clique, representative = min id, singletons elsewhere
        clique = out[out.vec_id < 12]
        assert set(clique.cluster) == {0}
        assert clique[clique.is_representative].vec_id.tolist() == [0]

    def test_pair_budget_stats_counts(self, spark):
        df, rng = self._dense_corpus(spark)
        planes = _planes(12, rng)
        stats = S.pair_budget_stats(
            df, planes, n_tables=3, max_pairs_per_bucket=36
        )
        # the clique contributes 40*39/2 collisions per table
        assert stats["pairs_full"] >= 3 * (40 * 39 // 2)
        assert stats["member_cap"] == 9
        assert stats["buckets_capped"] >= 3
        assert stats["pairs_emitted"] + stats["pairs_dropped"] == \
            stats["pairs_full"]
        assert stats["max_bucket_members"] >= 40
        unbudgeted = S.pair_budget_stats(df, planes, n_tables=3)
        assert unbudgeted["pairs_dropped"] == 0
        assert unbudgeted["pairs_emitted"] == unbudgeted["pairs_full"]

    def test_member_cap_math(self):
        assert S._bucket_member_cap(1) == 2
        assert S._bucket_member_cap(3) == 3
        assert S._bucket_member_cap(36) == 9
        assert S._bucket_member_cap(4096) == 91  # 91*90/2 = 4095
        with pytest.raises(ValueError):
            S._bucket_member_cap(0)


class TestKernelSpread:
    """r15: the verify kernel must run at cluster parallelism, not at
    AQE's byte-coalesced partition count (scalar pair rows, heavy per-row
    kernel CPU — measured 8.1 s of executor time serialized onto 4 tasks
    at bench scale)."""

    def test_candidate_dedup_exchange_is_explicit(self, spark, emb):
        """The pair-dedup exchange carries an explicit REPARTITION_BY_NUM
        (AQE may not coalesce it), sized to _kernel_parallelism."""
        rng = np.random.default_rng(7)
        pairs = S.embedding_near_dups(
            emb, _planes(12, rng), threshold=0.8, n_tables=3
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan
        n = S._kernel_parallelism(emb)
        assert n >= spark.sparkContext.defaultParallelism

    def test_spread_noop_when_wide_enough(self, spark, emb):
        """_spread must not add a shuffle when the input already has at
        least cluster parallelism (the 100 TB no-op guard)."""
        n = S._kernel_parallelism(emb)
        wide = emb.select("vec_id", "embedding").repartition(n + 1)
        assert S._spread(wide) is wide
        narrow = emb.select("vec_id", "embedding").coalesce(1)
        assert S._spread(narrow).rdd.getNumPartitions() == n

    def test_spread_preserves_rows(self, spark, emb):
        base = emb.select("vec_id", "embedding").coalesce(1)
        a = {r["vec_id"] for r in base.collect()}
        b = {r["vec_id"] for r in S._spread(base).collect()}
        assert a == b
