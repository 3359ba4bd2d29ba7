#!/usr/bin/env python
"""Single-core progressive-JPEG decode throughput (PERF.md
discipline), with successive-approximation REFINEMENT scans — the
round-12 target loop.  Payloads from the test suite's independent
G.1.2 encoder: noisy gray + 4:2:0 color (dense corrections) and a
near-flat image (EOB-run-heavy refinement tails).

Usage: python tools/bench_jpeg_progressive.py [reps]
"""
import importlib.util
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "t_ops", os.path.join(REPO, "tests", "test_operators.py"))
T = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(T)

from whisper_spark.operators.multimodal import decode_jpeg_pixels  # noqa: E402


def payloads():
    encode_prog, _ = T._jpeg_prog_encoder_env()
    rng = np.random.RandomState(42)
    out = []
    h, w = 120, 160
    gray = [rng.randint(0, 256, (h, w)).astype(float)]
    p, _ = encode_prog(gray, h, w, [(1, 1)], [T._JPEG_QL],
                       [(1, 5), (6, 63)], dc_al=1, ac_al=2, dri=0)
    out.append(("gray-noisy 160x120", p, h * w))
    color = [rng.randint(0, 256, (h, w)).astype(float) for _ in range(3)]
    p, _ = encode_prog(color, h, w, [(2, 2), (1, 1), (1, 1)],
                       [T._JPEG_QL, T._JPEG_QC, T._JPEG_QC],
                       [(1, 5), (6, 63)], dc_al=1, ac_al=1, dri=0)
    out.append(("color-420 160x160... 160x120", p, h * w))
    flat = np.full((h, w), 130.0) + rng.randint(-2, 3, (h, w))
    p, _ = encode_prog([flat], h, w, [(1, 1)], [T._JPEG_QL],
                       [(1, 2), (3, 63)], dc_al=1, ac_al=2, dri=0)
    out.append(("gray-flat 160x120 (EOB-heavy)", p, h * w))
    return out


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for name, p, px in payloads():
        r = decode_jpeg_pixels(p)
        assert r is not None and r["width"] == 160, r
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            n = 0
            while n < 5:
                decode_jpeg_pixels(p)
                n += 1
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        print(f"{name}: {1.0 / best:6.2f} imgs/s  "
              f"{px / best / 1e6:6.2f} Mpx/s  "
              f"(px_sum={r['px_sum']})")


if __name__ == "__main__":
    main()
