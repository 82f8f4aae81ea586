"""Incremental ANN index maintenance (r11): a growing embedding corpus
flows through the manifest CDC consumer into the clustered IVF store —
new vectors become searchable via one atomic per-batch append, no
rebuild, and the maintenance compaction that folds the resulting small
files is invisible to searchers and consumers alike. The end-to-end
pipeline the storage + ANN wings were built for."""

import pytest
from pyspark.sql import functions as F

from aeon_sleap_processing_spark.operators import similarity as S
from aeon_sleap_processing_spark.sources import load_table
from aeon_sleap_processing_spark.sources.sinks import (
    maintain,
    read_manifested,
    read_manifested_changes,
    write_manifested,
)
from aeon_sleap_processing_spark.streaming.watch import watch_manifested

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).cache()


class TestIvfAppend:
    def test_appended_vectors_searchable_exact_self_match(
        self, spark, emb, tmp_path
    ):
        cents = S.ivf_centroids(8, DIM, seed=7)
        store = str(tmp_path / "ann")
        S.ivf_write_clustered(emb.where("vec_id < 300"), cents, store)
        new = emb.where("vec_id >= 300 AND vec_id < 320")
        rels = S.ivf_append_clustered(new, cents, store)
        assert rels
        # query with vector 310's embedding under a FRESH id (the rerank
        # excludes self-id matches by design): its nearest neighbor is
        # the appended row at cosine 1.0 — the probe must land in the
        # new row's cell and the scan must include the appended file
        q = emb.where("vec_id = 310").select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        hits = S.knn_ivf_clustered(
            spark, store, cents, q, k=1, nprobe=1
        ).collect()
        assert hits[0]["neighbor_id"] == 310
        assert abs(hits[0]["cosine"] - 1.0) < 1e-9
        # old corpus still intact
        assert read_manifested(spark, store).count() == 320

    def test_listing_store_refused_by_name(self, spark, emb, tmp_path):
        store = str(tmp_path / "ann_listing")
        S.ivf_write_clustered(
            emb.where("vec_id < 50"),
            S.ivf_centroids(4, DIM, seed=7), store, commit="listing",
        )
        with pytest.raises(ValueError, match="listing-layout"):
            S.ivf_append_clustered(
                emb.where("vec_id >= 50 AND vec_id < 60"),
                S.ivf_centroids(4, DIM, seed=7), store,
            )

    def test_append_assignment_matches_full_rebuild(
        self, spark, emb, tmp_path
    ):
        """Cell assignment of appended vectors must equal what a full
        re-cluster would give (same argmax rule) — incremental and
        rebuilt stores are row-identical."""
        cents = S.ivf_centroids(8, DIM, seed=7)
        inc = str(tmp_path / "inc")
        full = str(tmp_path / "full")
        S.ivf_write_clustered(emb.where("vec_id < 200"), cents, inc)
        S.ivf_append_clustered(
            emb.where("vec_id >= 200 AND vec_id < 400"), cents, inc
        )
        S.ivf_write_clustered(emb.where("vec_id < 400"), cents, full)
        a = sorted(
            (r.vec_id, r.cell)
            for r in read_manifested(spark, inc).select("vec_id", "cell").collect()
        )
        b = sorted(
            (r.vec_id, r.cell)
            for r in read_manifested(spark, full).select("vec_id", "cell").collect()
        )
        assert a == b


class TestCdcDrivenIndexMaintenance:
    def test_watch_corpus_store_feeds_index(self, spark, emb, tmp_path):
        """The full pipeline: embedding store grows by appends; a cursor
        consumer assigns each delta into the ANN store; searches see new
        vectors; maintain()'s compaction folds the per-batch small files
        without re-delivering anything."""
        cents = S.ivf_centroids(8, DIM, seed=7)
        src = str(tmp_path / "corpus")
        ann = str(tmp_path / "ann")
        cursor = str(tmp_path / "cursor.json")

        # bootstrap: initial corpus lands, index built from the initial
        # snapshot, cursor pinned at the consumed version
        write_manifested(spark, emb.where("vec_id < 200"), src)
        df0, v0 = read_manifested_changes(spark, src)
        S.ivf_write_clustered(df0, cents, ann)
        from aeon_sleap_processing_spark.streaming.watch import (
            _write_manifest_cursor,
        )

        _write_manifest_cursor(spark, cursor, v0)

        def refresh(delta, version):
            S.ivf_append_clustered(delta, cents, ann)

        # two arrival waves, each drained by the consumer
        for lo, hi in ((200, 260), (260, 330)):
            write_manifested(
                spark, emb.where(f"vec_id >= {lo} AND vec_id < {hi}"), src
            )
            r = watch_manifested(spark, src, refresh, cursor)
            assert r["batches"] == 1
        assert read_manifested(spark, ann).count() == 330
        q = emb.where("vec_id = 300").select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        hits = S.knn_ivf_clustered(spark, ann, cents, q, k=1, nprobe=1).collect()
        assert hits[0]["neighbor_id"] == 300

        # maintenance: fold the per-batch small files; searches unchanged,
        # and the source consumer sees nothing new
        rep = maintain(spark, ann, min_files_to_compact=2,
                       orphan_grace_seconds=0.0)
        hits2 = S.knn_ivf_clustered(spark, ann, cents, q, k=1, nprobe=1).collect()
        assert hits2[0]["neighbor_id"] == 300
        r = watch_manifested(spark, src, refresh, cursor)
        assert r["batches"] == 0
        assert read_manifested(spark, ann).count() == 330
