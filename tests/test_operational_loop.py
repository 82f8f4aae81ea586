"""The reference's operational loop, re-expressed on the r11 machinery:
`detect_fights_all_epochs.py` polls for unprocessed epochs with directory
existence checks and SLURM retries — here the pose/blob chunk stores ARE
manifest-committed, the poller is a CDC cursor (each epoch's delta
consumed exactly once, maintenance compaction invisible), the detector is
the golden-tested fights plan, and results land exactly-once via the
version-prefix replace. End-to-end: ingest → incremental detect → result
store, across two epochs and a compaction."""

import pandas as pd

from aeon_sleap_processing_spark.plans.fights import detect_fights
from aeon_sleap_processing_spark.sources.chunked import write_chunked
from aeon_sleap_processing_spark.sources.sinks import (
    compact_manifested,
    read_manifested,
    read_manifested_changes,
    write_manifested,
)
from tests.fixture_pose import FPS, T0, fight_blob, fight_pose

POSE_COLS = ["time", "model", "identity", "part", "x", "y",
             "part_likelihood"]


class TestOperationalLoop:
    def test_epochs_flow_through_cdc_into_results(self, spark, tmp_path):
        pose_root = str(tmp_path / "pose")
        blob_root = str(tmp_path / "blob")
        results = str(tmp_path / "fights")
        cur = {"pose": -1, "blob": -1}

        def ingest(shift_days: int):
            shift = pd.Timedelta(days=shift_days)
            p = fight_pose()
            p["time"] = p["time"] + shift
            b = fight_blob()
            b["time"] = b["time"] + shift
            write_chunked(spark.createDataFrame(p), pose_root,
                          camera="Top", register=222)
            write_chunked(spark.createDataFrame(b), blob_root,
                          camera="Top", register=100)

        def poll() -> int:
            dp, vp = read_manifested_changes(spark, pose_root, cur["pose"])
            db, vb = read_manifested_changes(spark, blob_root, cur["blob"])
            n = 0
            if dp is not None:
                events = detect_fights(
                    dp.select(*POSE_COLS),
                    db.select("time", "x", "y"),
                    FPS,
                )
                write_manifested(
                    spark, events, results,
                    filename_prefix=f"v{vp}-",
                    remove_prefixes=[f"v{vp}-"],  # replay replaces itself
                )
                n = events.count()
            cur["pose"], cur["blob"] = vp, vb
            return n

        # epoch 1: one merged fight event detected and landed
        ingest(0)
        assert poll() == 1
        got = read_manifested(spark, results)
        assert got.count() == 1
        assert got.collect()[0]["start_timestamp"] == T0

        # maintenance between polls: the poller must see nothing new
        compact_manifested(spark, pose_root, min_files_to_compact=1)
        compact_manifested(spark, blob_root, min_files_to_compact=1)
        assert poll() == 0
        assert read_manifested(spark, results).count() == 1

        # epoch 2 (two days later): exactly one more event, correct epoch
        ingest(2)
        assert poll() == 1
        rows = sorted(
            r["start_timestamp"]
            for r in read_manifested(spark, results).collect()
        )
        assert rows == [T0, T0 + pd.Timedelta(days=2)]
