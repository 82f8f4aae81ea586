#!/usr/bin/env python
"""Materialize the scripted pose/blob fixtures (tests/fixture_pose.py) as
committed parquet files under tests/fixtures/, so the aeon detection
pipelines can be driven through the driver's DuckDB correctness gate
(queries q_tube_candidates / q_fight_sessions / q_tube_events read these;
the oracle SQL reads the same files via read_parquet).

Deterministic: the fixtures are fully scripted scenes, no RNG. Timestamps
are written as microsecond-precision (parquet TIMESTAMP(MICROS)) so both
Spark and DuckDB read them natively without the nanos shim.

Run from the repo root: python tools/make_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.fixture_pose import METADATA, fight_blob, fight_pose, tube_test_pose  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, df in (
        ("pose_tube", tube_test_pose()),
        ("pose_fight", fight_pose()),
        ("blob_fight", fight_blob()),
    ):
        df = df.copy()
        df["time"] = df["time"].astype("datetime64[us]")
        path = os.path.join(OUT, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"wrote {path}: {len(df)} rows")
    meta_path = os.path.join(OUT, "metadata.json")
    with open(meta_path, "w") as f:
        json.dump(METADATA, f, indent=2)
    print(f"wrote {meta_path}")


if __name__ == "__main__":
    main()
