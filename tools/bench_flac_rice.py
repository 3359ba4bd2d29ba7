#!/usr/bin/env python
"""Single-core FLAC fixed+rice decode throughput (PERF.md
discipline).  Noisy 16-bit streams from the test suite's independent
encoder — rice params land around 5-9 for this content, the real-
audio range.

Usage: python tools/bench_flac_rice.py [reps]
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

from whisper_spark.operators.multimodal import decode_flac_samples  # noqa: E402


def build(n_frames=16, n=4096, porder=2, noise=900):
    rng = np.random.RandomState(3)
    frames = []
    for _ in range(n_frames):
        walk = np.cumsum(rng.randint(-noise, noise + 1, n))
        sam = np.clip(walk, -(1 << 15), (1 << 15) - 1).astype(int)
        frames.append([[int(v) for v in sam]])
    return T._flac(frames, 16, porder=porder), n_frames * n


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for label, kw in (("rice p2 noisy", dict(porder=2, noise=900)),
                      ("rice p0 quiet", dict(porder=0, noise=60))):
        data, total = build(**kw)
        r = decode_flac_samples(data)
        assert r is not None and r["n_samples"] == total, r
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            k = 0
            while k < 5:
                decode_flac_samples(data)
                k += 1
            dt = (time.perf_counter() - t0) / k
            best = dt if best is None else min(best, dt)
        print(f"{label}: {1.0 / best:6.2f} streams/s  "
              f"{total / best / 1000:8.1f} ksmp/s  (s_sum={r['s_sum']})")


if __name__ == "__main__":
    main()
