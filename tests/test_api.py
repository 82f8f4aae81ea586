"""Reference-shaped API facade over the chunk store."""

import json

import pandas as pd
import pytest

from aeon_sleap_processing_spark import api
from aeon_sleap_processing_spark.sources.chunked import write_chunked
from tests.fixture_pose import FPS, IDS, METADATA, T0, tube_test_pose


@pytest.fixture(scope="module")
def store(tmp_path_factory, spark):
    root = str(tmp_path_factory.mktemp("aeon_root"))
    write_chunked(spark.createDataFrame(tube_test_pose()), root, "CameraTop", 222)
    env = pd.DataFrame(
        {
            "time": [T0, T0 + pd.Timedelta(minutes=4)],
            "state": ["Experiment", "Maintenance"],
        }
    )
    write_chunked(
        spark.createDataFrame(env), root, "Environment", api.ENV_STATE_REGISTER
    )
    meta = dict(METADATA)
    meta["Devices"] = {
        **METADATA["Devices"],
        "CameraTop": {"TriggerFrequency": "HighFrequency"},
        "VideoController": {"HighFrequency": "50"},
    }
    with open(f"{root}/metadata.json", "w") as f:
        json.dump(meta, f)
    return root


class TestReferenceApi:
    def test_detect_tube_tests_reference_signature(self, spark, store):
        events = api.detect_tube_tests(
            store,
            "2024-01-01 00:00:00",
            "2024-01-01 00:05:00",
            spark=spark,
        ).toPandas()
        assert len(events) == 2  # scenes A and D
        assert set(events.winner_identity) == {IDS[0]}

    def test_fps_resolved_from_metadata_chain(self, spark, store):
        from aeon_sleap_processing_spark.sources.sinks import load_metadata

        meta = load_metadata(spark, f"{store}/metadata.json")
        assert api._fps_from_metadata(meta) == 50.0
        assert api._fps_from_metadata({"fps": 25}) == 25.0
        assert api._fps_from_metadata({}) == 50.0

    def test_gen_vids_warns_and_continues(self, spark, store):
        with pytest.warns(UserWarning, match="gen_vids"):
            events = api.detect_tube_tests(
                store,
                "2024-01-01 00:00:00",
                "2024-01-01 00:05:00",
                video_config={"gen_vids": True},
                spark=spark,
            ).toPandas()
        assert len(events) == 2

    def test_bad_parameter_still_rejected(self, spark, store):
        with pytest.raises(ValueError, match="Invalid parameter key"):
            api.detect_tube_tests(
                store,
                "2024-01-01 00:00:00",
                "2024-01-01 00:05:00",
                parameters={"nope": 1},
                spark=spark,
            )


class TestDriverContract:
    """Pin the driver-contract invariants: the correctness gate checks the
    FIRST 50 registered queries, so registration order is load-bearing."""

    def test_window_composition(self):
        import __spark_entry__ as em

        names = list(em.queries())
        oracles = em.oracle_sql()
        window = names[:50]
        # round 6: every windowed query has a full oracle — including
        # q_tube_events, whose greedy kernel is oracled as a recursive CTE
        missing = [n for n in window if n not in oracles]
        assert missing == []
        # rotation invariant: every query whose plan the current round
        # touched must sit inside the driver's 50-query window (r9: the
        # new queries — neardup recall, trained + clustered IVF — plus
        # the OR-amplified near-dup generator's consumers, the
        # fixed-round BPE schedule's consumers, and the fight/sessionize
        # plans the r9 floor/broadcast work touched)
        for name in [
            "q_neardup_recall",
            "q_knn_ivf_trained",
            "q_knn_ivf_clustered",
            "q_knn_pq",
            "q_knn_ivf_pq",
            "q_knn_ivf_pq_clustered",
            "q_corpus_shards",
            "q_embedding_neardup",
            "q_semantic_dedup",
            "q_knn_recall",
            # r14: q_bpe_merges + q_length_percentiles rotated out
            # (driver-green r12+r13, untouched by r14's
            # storage/similarity work; siblings q_bpe_merges_batched,
            # q_bpe_encode, q_quality_buckets stay in)
            "q_bpe_merges_batched",
            "q_bpe_encode",
            "q_tube_events",
            "q_fight_sessions",
            "q_fight_sessions_chunked",
            # r11: the codec wing rotates (back) in — q_sessionize_unkeyed
            # rotated out (driver-green r9+r10, temporal plan untouched)
            "q_video_frame_stats",
            # r16: q_mjpeg_frame_stats rotated out (driver-green r11
            # through r15, codec chain untouched by r16; sibling
            # q_video_frame_stats stays in) for q_sample_per_bin's
            # return (r15 VERDICT task 9 — the rotation ledger's
            # union-of-green-windows argument stays live)
            "q_sample_per_bin",
            # r11 late: the manifest storage wing earns driver rows —
            # q_simhash/q_simhash_pairs/q_curate_corpus rotated out
            # (driver-green r6..r10, text plans untouched by r11)
            "q_manifest_dml",
            "q_manifest_time_travel",
            "q_manifest_changes",
            # r11 late: trained classifier-filter stage (pinned
            # coefficients) — q_dedup_clusters rotated out
            "q_quality_classifier",
            # r14: legacy-bloom migration + cross-commit compaction
            # under the oracle, and the pair-budgeted generator (the
            # round's touched plans — the whole manifest wing above
            # also stays in because sinks.py changed)
            "q_bloom_migration",
            "q_neardup_budgeted",
            "q_cdc_stream_source",
            "q_partition_typed_store",
            # r15: the streaming pair budget faces the oracle
            # (q_sample_per_bin rotated out — driver-green r13+r14,
            # util.py sampling plan untouched by r15)
            "q_semantic_dedup_budgeted",
        ]:
            assert name in window, name
        assert "q1_pricing_summary" not in window
        # no duplicates anywhere, every oracle key is a registered query
        assert len(names) == len(set(names))
        assert set(oracles) <= set(names)

    def test_pq_oracle_books_follow_checker_sf_dir(self, monkeypatch):
        """The PQ oracles embed codebook literals; the Spark legs resolve
        books per sf_dir. check_correctness exports
        SPARK_GRAFT_ORACLE_SF_DIR from --sf-dir so both engines quantize
        with the SAME books at any corpus — pin that the env var actually
        switches the embedded literals (and that the default is the
        sf0.01 gate books)."""
        import __spark_entry__ as em

        monkeypatch.delenv("SPARK_GRAFT_ORACLE_SF_DIR", raising=False)
        default_values, _ = em._pq_sql_fragments()
        monkeypatch.setenv(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
        )
        gate_values, _ = em._pq_sql_fragments()
        assert default_values == gate_values  # default IS the gate corpus
        monkeypatch.setenv(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.1"
        )
        sf01_values, _ = em._pq_sql_fragments()
        assert sf01_values != default_values  # per-corpus books differ
        # and they match what the Spark legs load for the same dir
        assert em._pq_books("/root/testdata/sf0.1") != em._pq_books(
            "/root/testdata/sf0.01"
        )
