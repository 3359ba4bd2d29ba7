#!/usr/bin/env python
"""Differential fuzz: old (HEAD) vs new Vorbis decoder over mutated
independently-encoded Ogg streams (PERF.md round-12 discipline).

Usage: python tools/fuzz_vorbis_diff.py [n_mutants_per_seed]
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


def same(a, b):
    if (a is None) != (b is None):
        return False
    if a is None:
        return True
    ca, ra, pa = a
    cb, rb, pb = b
    return ca == cb and ra == rb and pa.shape == pb.shape \
        and np.array_equal(pa, pb)


def main():
    n_mut = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    old_path = "/tmp/old_vorbis.py"
    src = subprocess.check_output(
        ["git", "-C", REPO, "show",
         "HEAD:whisper_spark/operators/vorbis.py"])
    with open(old_path, "wb") as f:
        f.write(src)
    old = load_module(old_path, "old_vorbis")
    new = load_module(
        os.path.join(REPO, "whisper_spark", "operators", "vorbis.py"),
        "new_vorbis")
    B = load_module(os.path.join(REPO, "tools",
                                 "bench_vorbis_residue.py"),
                    "bench_vorbis_residue")
    T = B.T

    seeds = [
        ("small/r1", B.build(12, 1)[0]),
        ("small/r0", B.build(12, 0)[0]),
        ("large/r1", B.build_large(4, 1)[0]),
        ("large/r0", B.build_large(4, 0)[0]),
        ("silence", T._silence_stream(6)[0]),
        ("mixed-bs", T._silence_stream(6, modes=[1, 0, 0, 1, 1, 0])[0]),
    ]
    rng = random.Random(0x5EED)
    total = mismatches = rejected = 0
    for name, seed in seeds:
        ro = old.decode_vorbis_stream(seed)
        rn = new.decode_vorbis_stream(seed)
        assert ro is not None and same(ro, rn), name
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
            ro = old.decode_vorbis_stream(p)
            rn = new.decode_vorbis_stream(p)
            total += 1
            if not same(ro, rn):
                mismatches += 1
                print(f"MISMATCH {name} mutant {k}")
                if mismatches > 5:
                    sys.exit(1)
            if ro is None:
                rejected += 1
        print(f"{name}: ok ({n_mut} mutants)")
    print(f"total {total} mutants, {mismatches} mismatches, "
          f"{rejected} rejected by both")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
