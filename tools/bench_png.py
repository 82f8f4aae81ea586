#!/usr/bin/env python
"""Micro-bench of the pure-stdlib PNG codec's per-filter decode rate.

Filters 0/1/2 decode vectorized; 3 (Average) and 4 (Paeth) carry a
left-pixel dependency and fall back to a per-byte Python scan
(operators/multimodal.py:decode_png) — this pins that documented
constraint to a number. Usage: python tools/bench_png.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aeon_sleap_processing_spark.operators.multimodal import decode_png, encode_png


def main() -> None:
    h, w = 480, 640  # a realistic camera frame, grayscale
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (h, w), dtype=np.uint8)
    out: dict = {"height": h, "width": w}
    for ftype in range(5):
        png = encode_png(arr, filter_type=ftype)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            dec = decode_png(png)
        dt = (time.time() - t0) / reps
        assert (dec == arr).all()
        out[f"filter{ftype}_ms"] = round(dt * 1000, 1)
        out[f"filter{ftype}_mpx_s"] = round(h * w / dt / 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
