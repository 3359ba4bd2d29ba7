#!/usr/bin/env python
"""Differential fuzz: old (HEAD) vs new JPEG decoder over mutated
progressive (and baseline) payloads — PERF.md round-12 discipline for
the ac_first/ac_refine local-state rewrite.

Usage: python tools/fuzz_jpeg_prog_diff.py [n_mutants_per_seed]
"""
import importlib.util
import os
import random
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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
    if set(a) != set(b):
        return False
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
            if not (np.shape(va) == np.shape(vb)
                    and np.array_equal(va, vb)):
                return False
        elif va != vb:
            return False
    return True


def main():
    n_mut = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    src = subprocess.check_output(
        ["git", "-C", REPO, "show",
         "HEAD:whisper_spark/operators/multimodal.py"])
    with open("/tmp/old_mm.py", "wb") as f:
        f.write(src)
    old = load_module("/tmp/old_mm.py", "old_mm")
    new = load_module(
        os.path.join(REPO, "whisper_spark", "operators",
                     "multimodal.py"), "new_mm")
    T = load_module(os.path.join(REPO, "tests", "test_operators.py"),
                    "t_ops")

    enc_prog, _ = T._jpeg_prog_encoder_env()
    enc_base, _ = T._jpeg_encoder_env()
    rng_np = np.random.RandomState(5)
    seeds = []
    h, w = 40, 48
    gray = [rng_np.randint(0, 256, (h, w)).astype(float)]
    seeds.append(("prog-gray", enc_prog(
        gray, h, w, [(1, 1)], [T._JPEG_QL],
        [(1, 5), (6, 63)], dc_al=1, ac_al=2, dri=0)[0]))
    color = [rng_np.randint(0, 256, (h, w)).astype(float)
             for _ in range(3)]
    seeds.append(("prog-color-420", enc_prog(
        color, h, w, [(2, 2), (1, 1), (1, 1)],
        [T._JPEG_QL, T._JPEG_QC, T._JPEG_QC],
        [(1, 63)], dc_al=1, ac_al=1, dri=0)[0]))
    flat = np.full((h, w), 130.0) + rng_np.randint(-2, 3, (h, w))
    seeds.append(("prog-flat-eob", enc_prog(
        [flat], h, w, [(1, 1)], [T._JPEG_QL],
        [(1, 2), (3, 63)], dc_al=1, ac_al=2, dri=2)[0]))
    seeds.append(("baseline-gray", enc_base(
        gray, h, w, [(1, 1)], [T._JPEG_QL])[0]))

    rng = random.Random(0x1A6)
    total = mismatches = rejected = 0
    for name, seed in seeds:
        ro = old.decode_jpeg_pixels(seed)
        rn = new.decode_jpeg_pixels(seed)
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
            ro = old.decode_jpeg_pixels(p)
            rn = new.decode_jpeg_pixels(p)
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
