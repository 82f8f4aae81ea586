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

# combine fixture geometry: single source of truth shared with the
# q_combine_ticks query and oracle
from aeon_sleap_processing_spark.fixtures_meta import (  # noqa: E402
    COMBINE_N_TICKS,
    COMBINE_PERIOD_US,
    COMBINE_T0_US,
)


def combine_streams():
    """Deterministic pose/top-ID/quad-ID streams on the tick grid with
    scripted jitter (0 / ±3 ms inside tolerance, 6 ms outside), dropped
    ticks, and partial ID coverage — the combine pipeline's alignment
    surface. One tall table tagged by ``stream``."""
    import pandas as pd

    rows = []

    def add(tick, jitter_ms, stream, identity, part, x, y):
        t = COMBINE_T0_US + tick * COMBINE_PERIOD_US + jitter_ms * 1000
        rows.append(
            {
                "time": pd.Timestamp(t, unit="us"),
                "stream": stream,
                "identity": identity,
                "part": part,
                "x": float(x),
                "y": float(y),
            }
        )

    pose_jit = [0, 3, -3, 6]  # 6 ms exceeds the 5 ms tolerance
    id_jit = [1, -1, 2]
    for k in range(COMBINE_N_TICKS):
        if k % 97 != 0:  # dropped pose ticks
            jm = pose_jit[k % 4]
            for ident, base in (("0", 100.0), ("1", 300.0)):
                x = base + (k % 613) * 0.5
                y = base + (k % 401) * 0.25
                add(k, jm, "pose", ident, "anchor", x, y)
                add(k, jm, "pose", ident, "nose", x + 4.0, y)
        if k % 5 != 0:  # partial top-ID coverage
            jm = id_jit[k % 3]
            add(k, jm, "topid", "A", "anchor", 101.0 + (k % 613) * 0.5, 100.5 + (k % 401) * 0.25)
            add(k, jm, "topid", "B", "anchor", 301.0 + (k % 613) * 0.5, 300.5 + (k % 401) * 0.25)
        if k % 7 != 0:  # quad coverage in quadrant-camera coordinates
            add(k, id_jit[(k + 1) % 3], "quad", "A", "anchor", 50.0 + (k % 211) * 0.75, 40.0 + (k % 149) * 0.5)
    return pd.DataFrame(rows)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, df in (
        ("pose_tube", tube_test_pose()),
        ("pose_fight", fight_pose()),
        ("blob_fight", fight_blob()),
        ("combine_streams", combine_streams()),
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
