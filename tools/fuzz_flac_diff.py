#!/usr/bin/env python
"""Differential fuzz: old (HEAD) vs new FLAC decoder over mutated
independently-encoded streams (PERF.md round-12 discipline for the
rice-LUT change).

Usage: python tools/fuzz_flac_diff.py [n_mutants_per_seed]
"""
import importlib.util
import os
import random
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    n_mut = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    src = subprocess.check_output(
        ["git", "-C", REPO, "show",
         "HEAD:whisper_spark/operators/multimodal.py"])
    with open("/tmp/old_mm_flac.py", "wb") as f:
        f.write(src)
    old = load_module("/tmp/old_mm_flac.py", "old_mm_flac")
    new = load_module(
        os.path.join(REPO, "whisper_spark", "operators",
                     "multimodal.py"), "new_mm_flac")
    B = load_module(os.path.join(REPO, "tools", "bench_flac_rice.py"),
                    "bench_flac_rice")
    T = B.T

    rng_np = np.random.RandomState(17)
    seeds = [("rice-p2", B.build(4, 1024, porder=2, noise=900)[0]),
             ("rice-p0", B.build(4, 1024, porder=0, noise=60)[0])]
    # LPC + stereo-decorrelation frames (the other subframe shapes)
    sam = [int(v) for v in
           np.clip(np.cumsum(rng_np.randint(-80, 81, 256)),
                   -32768, 32767)]
    left = [int(v) for v in
            np.clip(np.cumsum(rng_np.randint(-60, 61, 256)),
                    -32768, 32767)]
    right = [int(v) for v in
             np.clip(np.cumsum(rng_np.randint(-60, 61, 256)),
                     -32768, 32767)]
    import struct as _st

    def stream(frame, bps, channels, total):
        si = T._FlacBitWriter()
        si.write(16, 16); si.write(65535, 16)
        si.write(0, 24); si.write(0, 24)
        si.write(8000, 20); si.write(channels - 1, 3)
        si.write(bps - 1, 5); si.write(total, 36)
        info = si.bytes() + b"\0" * 16
        return (b"fLaC" + bytes([0x80])
                + _st.pack(">I", len(info))[1:] + info + frame)

    for mode in range(8, 11):  # left/side, right/side, mid/side
        seeds.append((f"stereo-m{mode}", stream(
            T._flac_frame_stereo(left, right, 16, 0, mode), 16, 2, 256)))
    seeds.append(("lpc", stream(
        T._flac_frame_lpc([sam], 16, 0, [3, -2], 4, 1), 16, 1, 256)))

    rng = random.Random(0xF1AC)
    total = mism = rej = 0
    for name, seed in seeds:
        ro, rn = old.decode_flac_samples(seed), new.decode_flac_samples(seed)
        assert ro is not None and ro == rn, (name, ro, rn)
        for k in range(n_mut):
            m = bytearray(seed)
            op = rng.randrange(4)
            if op == 0:
                for _ in range(rng.randrange(1, 4)):
                    m[rng.randrange(len(m))] ^= rng.randrange(1, 256)
            elif op == 1:
                m = m[:rng.randrange(1, len(m))]
            elif op == 2:
                at = rng.randrange(len(m))
                m[at:at] = bytes(rng.randrange(256)
                                 for _ in range(rng.randrange(1, 9)))
            else:
                a = rng.randrange(len(m))
                b = rng.randrange(len(m))
                m = m[:a] + m[b:]
            p = bytes(m)
            ro, rn = old.decode_flac_samples(p), new.decode_flac_samples(p)
            total += 1
            if ro != rn:
                mism += 1
                print(f"MISMATCH {name} mutant {k}: {ro} vs {rn}")
                if mism > 5:
                    sys.exit(1)
            if ro is None:
                rej += 1
        print(f"{name}: ok ({n_mut} mutants)")
    print(f"total {total} mutants, {mism} mismatches, {rej} rejected by both")
    sys.exit(1 if mism else 0)


if __name__ == "__main__":
    main()
