"""Streaming semantic dedup: representative-store state, greedy keep/drop
contract, id-level redelivery idempotency, checkpoint restarts."""

import numpy as np
import pandas as pd

from aeon_sleap_processing_spark.streaming.watch import (
    read_semantic_reps,
    stream_semantic_dedup,
)

DIM = 8
PLANES = np.random.default_rng(3).standard_normal((12, DIM)).tolist()


def _vec(axis: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[axis] = scale
    return v  # one-hot: cosine 1.0 within an axis, 0.0 across axes


def _drop(spark, src, ids, vecs, part):
    pdf = pd.DataFrame({"vec_id": ids, "embedding": vecs})
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{src}/f={part}")


def _run(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_semantic_dedup(
        stream, out, ckpt, PLANES, threshold=0.95, n_tables=3
    )
    q.awaitTermination(180)


class TestStreamSemanticDedup:
    def test_greedy_keep_within_and_across_batches(self, spark, tmp_path):
        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        # batch 1: 1(e0) kept, 2(e1) kept, 3(e0 again) dropped intra-batch
        _drop(spark, src, [1, 2, 3], [_vec(0), _vec(1), _vec(0, 2.0)], 1)
        # batch 2: 4(e0) dropped vs rep 1, 5(e2) kept, 6(e1 scaled)
        # dropped vs rep 2
        _drop(spark, src, [4, 5, 6], [_vec(0, 3.0), _vec(2), _vec(1, 0.5)], 2)
        _run(spark, src, out, ckpt)
        reps = read_semantic_reps(spark, out)
        assert sorted(r.vec_id for r in reps.collect()) == [1, 2, 5]

    def test_restart_redelivery_and_new_batches(self, spark, tmp_path):
        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        _drop(spark, src, [1, 2], [_vec(0), _vec(1)], 1)
        _run(spark, src, out, ckpt)
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1, 2]

        # restart from the same checkpoint: a redelivered kept id (2) is a
        # no-op, a near-dup of a prior rep (8 ~ e0) drops, a new axis (7)
        # keeps — and each kept id appears EXACTLY once across the store
        _drop(
            spark, src, [2, 7, 8], [_vec(1), _vec(3), _vec(0, 5.0)], 2
        )
        _run(spark, src, out, ckpt)
        got = [r.vec_id for r in read_semantic_reps(spark, out).collect()]
        assert sorted(got) == [1, 2, 7]
        assert len(got) == len(set(got))

        # third cycle: everything redelivered plus one new near-dup chain
        # a(9,e4)-b(10,e4) arriving together -> greedy keeps 9 only
        _drop(
            spark,
            src,
            [1, 7, 9, 10],
            [_vec(0), _vec(3), _vec(4), _vec(4, 9.0)],
            3,
        )
        _run(spark, src, out, ckpt)
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1, 2, 7, 9]

    def test_fileless_rep_dirs_skipped(self, spark, tmp_path):
        """An all-dropped micro-batch writes a batch dir holding only
        _SUCCESS; later batches must skip it (a file-less dir set cannot
        infer a parquet schema) — both the helper's contract and the
        end-to-end stream survive it."""
        from aeon_sleap_processing_spark.streaming.watch import (
            _rep_dirs_with_data,
        )

        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        _drop(spark, src, [1], [_vec(0)], 1)
        _drop(spark, src, [11], [_vec(0, 4.0)], 2)  # all-dropped batch
        _drop(spark, src, [12], [_vec(1)], 3)
        _run(spark, src, out, ckpt)
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1, 12]
        # bucketed layout: an all-dropped batch's partitionBy write emits
        # NO part files (unlike the flat layout's schema-preserving 0-row
        # file), so exactly the two batches with kept rows qualify
        dirs = _rep_dirs_with_data(spark, f"{out}/reps", 99)
        assert len(dirs) == 2
        # a dir tree of ONLY file-less dirs yields [] (not a crash)
        import os

        empty_root = str(tmp_path / "empty_reps")
        os.makedirs(f"{empty_root}/batch=0")
        open(f"{empty_root}/batch=0/_SUCCESS", "w").close()
        assert _rep_dirs_with_data(spark, empty_root, 99) == []

    def test_threshold_boundary_rounds_like_batch(self, spark, tmp_path):
        """A pair at raw cosine just UNDER threshold that rounds to it at 6
        digits must be dropped, matching the batch authority's
        round-then-compare (embedding_near_dups)."""
        import math

        from aeon_sleap_processing_spark.operators.similarity import (
            embedding_near_dups,
        )

        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        c = 0.9499996  # rounds to 0.950000 at 6 digits
        b = [c, math.sqrt(1.0 - c * c)] + [0.0] * (DIM - 2)
        ids, vecs = [1, 2], [_vec(0), b]
        # precondition: the batch authority generates and drops the pair
        batch = spark.createDataFrame(
            pd.DataFrame({"vec_id": ids, "embedding": vecs})
        )
        pairs = embedding_near_dups(
            batch, PLANES, threshold=0.95, n_tables=3
        ).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
        _drop(spark, src, ids, vecs, 1)
        _run(spark, src, out, ckpt)
        assert sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        ) == [1]

    def test_batch_operator_is_the_corpus_authority(self, spark, tmp_path):
        """Same data, one batch: the streaming greedy result equals the
        batch semantic_dedup representative set when every chain fits in
        one micro-batch (min-id representative per cluster)."""
        from aeon_sleap_processing_spark.operators.similarity import (
            semantic_dedup,
        )

        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        ids = [1, 2, 3, 4, 5]
        vecs = [_vec(0), _vec(0, 2.0), _vec(1), _vec(1, 3.0), _vec(2)]
        _drop(spark, src, ids, vecs, 1)
        _run(spark, src, out, ckpt)
        stream_kept = sorted(
            r.vec_id for r in read_semantic_reps(spark, out).collect()
        )
        batch = spark.createDataFrame(
            pd.DataFrame({"vec_id": ids, "embedding": vecs})
        )
        batch_kept = sorted(
            r.vec_id
            for r in semantic_dedup(batch, PLANES, threshold=0.95, n_tables=3)
            .where("is_representative")
            .collect()
        )
        assert stream_kept == batch_kept == [1, 3, 5]


class TestBucketedStoreLayout:
    """r10: the rep store is two bucket-partitioned tiers so each
    micro-batch prunes to colliding cells instead of scanning the whole
    store; the flat pre-r10 layout (store_partitions=0) must stay
    byte-equivalent in kept-set semantics."""

    def _run_p(self, spark, src, out, ckpt, p):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_semantic_dedup(
            stream, out, ckpt, PLANES, threshold=0.95, n_tables=3,
            store_partitions=p,
        )
        q.awaitTermination(180)

    def test_flat_and_bucketed_layouts_agree(self, spark, tmp_path):
        src = str(tmp_path / "src")
        _drop(spark, src, [1, 2, 3], [_vec(0), _vec(1), _vec(0, 2.0)], 1)
        _drop(spark, src, [4, 5, 6], [_vec(0, 3.0), _vec(2), _vec(1, 0.5)], 2)
        _drop(spark, src, [7, 8], [_vec(2, 4.0), _vec(3)], 3)
        kept = {}
        for p in (0, 16):
            out, ckpt = str(tmp_path / f"out{p}"), str(tmp_path / f"ckpt{p}")
            self._run_p(spark, src, out, ckpt, p)
            kept[p] = sorted(
                r.vec_id for r in read_semantic_reps(spark, out).collect()
            )
        assert kept[0] == kept[16] == [1, 2, 5, 8]
        # bucketed store has both tiers, vp/t/hp partition dirs
        import os

        vec_parts = os.listdir(f"{tmp_path}/out16/reps/batch=1")
        assert any(d.startswith("vp=") for d in vec_parts)
        key_parts = os.listdir(f"{tmp_path}/out16/repkeys/batch=1")
        assert any(d.startswith("t=") for d in key_parts)

    def test_bucketed_restart_redelivery(self, spark, tmp_path):
        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        _drop(spark, src, [1, 2], [_vec(0), _vec(1)], 1)
        self._run_p(spark, src, out, ckpt, 8)
        _drop(spark, src, [2, 7, 8], [_vec(1), _vec(3), _vec(0, 5.0)], 2)
        self._run_p(spark, src, out, ckpt, 8)
        got = [r.vec_id for r in read_semantic_reps(spark, out).collect()]
        assert sorted(got) == [1, 2, 7] and len(got) == len(set(got))

    def test_null_vectors_kept_without_keys(self, spark, tmp_path):
        """NULL embeddings are kept (never anyone's near-dup) but write NO
        LSH keys — unfiltered they would bucket to 0 in every table and
        collide with the whole bucket-0 population (ADVICE r9)."""
        src, out, ckpt = (
            str(tmp_path / "src"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
        _drop(spark, src, [1, 2], [_vec(0), None], 1)
        _drop(spark, src, [3, 4], [_vec(0, 2.0), None], 2)  # 3 drops vs 1
        self._run_p(spark, src, out, ckpt, 8)
        reps = read_semantic_reps(spark, out)
        got = {r.vec_id: r.embedding for r in reps.collect()}
        assert sorted(got) == [1, 2, 4]
        assert got[2] is None and got[4] is None
        # the keys tier indexes ONLY the non-null rep
        keys = spark.read.option(
            "basePath", f"{out}/repkeys"
        ).parquet(f"{out}/repkeys")
        assert {r.vec_id for r in keys.select("vec_id").distinct().collect()} == {1}


def test_compact_rep_store_folds_batches_and_preserves_reps(spark, tmp_path):
    """Offline fold: N batch dirs -> one, kept set identical, stream
    resumes cleanly against the folded store (strictly-earlier reads are
    layout-independent), and a flat store comes out CONVERTED to the
    bucketed layout."""
    import os

    from aeon_sleap_processing_spark.streaming.watch import compact_rep_store

    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(spark, src, [1, 2], [_vec(0), _vec(1)], 1)
    _drop(spark, src, [3, 4], [_vec(2), _vec(0, 2.0)], 2)
    _drop(spark, src, [5], [_vec(3)], 3)
    _run(spark, src, out, ckpt)
    before = sorted(r.vec_id for r in read_semantic_reps(spark, out).collect())
    assert before == [1, 2, 3, 5]
    res = compact_rep_store(spark, out, PLANES, n_tables=3)
    assert res["batches_folded"] == 3 and res["reps"] == 4
    after = sorted(r.vec_id for r in read_semantic_reps(spark, out).collect())
    assert after == before
    assert os.listdir(f"{out}/reps") == ["batch=0"]
    # resumed stream still dedups against the folded history
    _drop(spark, src, [6, 7], [_vec(3, 5.0), _vec(4)], 4)  # 6 dups rep 5
    _run(spark, src, out, ckpt)
    assert sorted(
        r.vec_id for r in read_semantic_reps(spark, out).collect()
    ) == [1, 2, 3, 5, 7]
    # idempotent re-run (crash-repair path)
    res2 = compact_rep_store(spark, out, PLANES, n_tables=3)
    assert res2["reps"] == 5
    assert sorted(
        r.vec_id for r in read_semantic_reps(spark, out).collect()
    ) == [1, 2, 3, 5, 7]


def test_compact_rep_store_repairs_lost_keys_tier(spark, tmp_path):
    """Crash between the fold's two tier swaps leaves vectors folded but
    keys stale/missing; re-running the fold regenerates keys from the
    vector tier (the durable source of truth) and the stream dedups
    correctly afterwards."""
    import shutil

    from aeon_sleap_processing_spark.streaming.watch import compact_rep_store

    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _drop(spark, src, [1], [_vec(0)], 1)
    _drop(spark, src, [2], [_vec(1)], 2)
    _run(spark, src, out, ckpt)
    compact_rep_store(spark, out, PLANES, n_tables=3)
    shutil.rmtree(f"{out}/repkeys")  # simulated crash after the reps swap
    res = compact_rep_store(spark, out, PLANES, n_tables=3)
    assert res["reps"] == 2
    import os

    assert os.path.isdir(f"{out}/repkeys/batch=0")
    # stream resumes: near-dup of rep 1 must still drop (keys tier live)
    _drop(spark, src, [3, 4], [_vec(0, 3.0), _vec(2)], 3)
    _run(spark, src, out, ckpt)
    assert sorted(
        r.vec_id for r in read_semantic_reps(spark, out).collect()
    ) == [1, 2, 4]


def test_auto_sized_plan_from_expected_rows(spark, tmp_path):
    """hyperplanes=None + expected_rows/dim: the stream sizes its LSH plan
    from the measured law and still dedups planted near-dups."""
    import numpy as np
    import pandas as pd

    from aeon_sleap_processing_spark.streaming.watch import (
        read_semantic_reps, stream_semantic_dedup,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, (v / np.linalg.norm(v)).tolist()))
        w = v + rng.standard_normal(16) * 0.005
        rows.append((i * 2 + 1, (w / np.linalg.norm(w)).tolist()))
    src = str(tmp_path / "src")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_semantic_dedup(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        hyperplanes=None, threshold=0.95,
        expected_rows=60, dim=16, store_partitions=4,
    )
    q.awaitTermination(120)
    reps = read_semantic_reps(spark, str(tmp_path / "out")).count()
    assert 30 <= reps <= 33, reps  # ~one rep per planted pair

    import pytest

    with pytest.raises(ValueError):
        stream_semantic_dedup(
            stream, str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
            hyperplanes=None,
        )


class TestStreamPairBudget:
    """r14: the streaming twin of the batch pair budget — per-(table,
    bucket) member caps bound the per-batch candidate product under
    adversarial duplicate density; default None is the exact prior
    plan. Under-dropping (a duplicate slipping through when its only
    candidate edges were capped away) is the documented direction."""

    def _run(self, spark, src, out, ckpt, p, budget):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_semantic_dedup(
            stream, out, ckpt, PLANES, threshold=0.95, n_tables=3,
            store_partitions=p, max_pairs_per_bucket=budget,
        )
        q.awaitTermination(180)

    def test_huge_budget_identical_to_unbudgeted(self, spark, tmp_path):
        src = str(tmp_path / "src")
        _drop(spark, src, [1, 2, 3], [_vec(0), _vec(1), _vec(0, 2.0)], 1)
        _drop(spark, src, [4, 5, 6], [_vec(0, 3.0), _vec(2), _vec(1, 0.5)], 2)
        for p in (0, 16):
            kept = {}
            for tag, budget in (("none", None), ("huge", 10 ** 9)):
                out = str(tmp_path / f"out_{p}_{tag}")
                ckpt = str(tmp_path / f"ckpt_{p}_{tag}")
                self._run(spark, src, out, ckpt, p, budget)
                kept[tag] = sorted(
                    r.vec_id
                    for r in read_semantic_reps(spark, out).collect()
                )
            assert kept["none"] == kept["huge"] == [1, 2, 5], (p, kept)

    def test_mega_batch_capped_but_store_dedup_survives(
        self, spark, tmp_path
    ):
        """30 identical vectors in ONE trigger with budget=1 (member cap
        m=2 per side): only the (1,2) edge is generated, so 2 drops and
        3..30 under-drop into the kept set — bounded work, documented
        direction. The NEXT batch's duplicate still drops: the right
        side caps REPS FIRST, so store candidates survive the cap."""
        for p in (0, 16):
            src = str(tmp_path / f"src_{p}")
            out = str(tmp_path / f"out_{p}")
            ckpt = str(tmp_path / f"ckpt_{p}")
            ids = list(range(1, 31))
            _drop(spark, src, ids, [_vec(0) for _ in ids], 1)
            self._run(spark, src, out, ckpt, p, 1)
            kept = sorted(
                r.vec_id for r in read_semantic_reps(spark, out).collect()
            )
            assert kept == [1] + list(range(3, 31)), (p, kept)
            # batch 2: a duplicate of the clique must STILL drop against
            # the stored reps (rep-priority under the cap)
            _drop(spark, src, [100], [_vec(0, 0.5)], 2)
            self._run(spark, src, out, ckpt, p, 1)
            kept2 = sorted(
                r.vec_id for r in read_semantic_reps(spark, out).collect()
            )
            assert kept2 == kept, (p, kept2)


def test_fused_side_caps_match_two_window_reference(spark):
    """r16: _budget_cap_sides computes both pair-budget side caps from
    ONE ranking (rank minus per-cell rep count). Pin its row sets
    against the former shape — an independent window per side — on a
    pool with the adversarial cell mixes: more reps than the cap, reps
    exactly at the cap, rep-free cells, batch-free cells, and a cell
    where batch ids interleave below/above the rep ids."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from aeon_sleap_processing_spark.streaming.watch import (
        _budget_cap_sides,
    )

    rows = [
        # (id, rep, t, h) — cell (0,0): 4 reps, 3 batch rows
        (1, True, 0, 0), (2, True, 0, 0), (3, True, 0, 0), (4, True, 0, 0),
        (10, False, 0, 0), (11, False, 0, 0), (12, False, 0, 0),
        # cell (0,1): reps only
        (5, True, 0, 1), (6, True, 0, 1), (7, True, 0, 1),
        # cell (1,0): batch only
        (20, False, 1, 0), (21, False, 1, 0), (22, False, 1, 0),
        # cell (1,1): batch ids BELOW the rep ids (ordering must still
        # put reps first)
        (30, True, 1, 1), (31, True, 1, 1),
        (8, False, 1, 1), (9, False, 1, 1), (13, False, 1, 1),
    ]
    pool = spark.createDataFrame(
        rows, "id_b long, rep_b boolean, t int, h int"
    )
    for m_cap in (1, 2, 3, 5):
        a, b = _budget_cap_sides(pool, "id_b", "rep_b", m_cap)
        # reference: the pre-r16 per-side windows, verbatim
        wa = Window.partitionBy("t", "h").orderBy(F.col("id_a"))
        ref_a = (
            pool.where(~F.col("rep_b"))
            .select(F.col("id_b").alias("id_a"), "t", "h")
            .withColumn("__rn", F.row_number().over(wa))
            .where(F.col("__rn") <= m_cap)
            .drop("__rn")
        )
        wb = Window.partitionBy("t", "h").orderBy(
            F.col("rep_b").desc(), F.col("id_b")
        )
        ref_b = (
            pool.withColumn("__rn", F.row_number().over(wb))
            .where(F.col("__rn") <= m_cap)
            .drop("__rn")
            .select("id_b", "rep_b", "t", "h")
        )
        got_a = sorted(map(tuple, a.collect()))
        got_b = sorted(map(tuple, b.collect()))
        assert got_a == sorted(map(tuple, ref_a.collect())), m_cap
        assert got_b == sorted(map(tuple, ref_b.collect())), m_cap
