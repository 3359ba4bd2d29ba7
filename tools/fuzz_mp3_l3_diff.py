#!/usr/bin/env python
"""Differential fuzz: old (HEAD) vs new Layer III decoder over mutated
independently-encoded streams.  Round discipline: any entropy-loop
rewrite ships with an old-vs-new sweep at thousands of mutants, zero
mismatches (PERF.md rounds 11-12).

Usage: python tools/fuzz_mp3_l3_diff.py [n_mutants_per_seed] [old_path]
"""
import importlib.util
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    n_mut = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    old_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/old_mp3.py"
    if not os.path.exists(old_path):
        src = subprocess.check_output(
            ["git", "-C", REPO, "show",
             "HEAD:whisper_spark/operators/mp3.py"])
        with open(old_path, "wb") as f:
            f.write(src)
    old = load_module(old_path, "old_mp3")
    new = load_module(
        os.path.join(REPO, "whisper_spark", "operators", "mp3.py"),
        "new_mp3")
    B = load_module(os.path.join(REPO, "tools", "bench_mp3_l3.py"),
                    "bench_mp3_l3")
    T = B.T

    # seed corpus: dense long-block streams under both table shapes,
    # short/mixed blocks, stereo M/S, bit-reservoir spill
    seeds = []
    for tabs_name, tabs in (("flat8", T._l3_test_tables()),
                            ("mixed", B.mixed_tables())):
        T._l3_test_tables = lambda t=tabs: t
        seeds.append((tabs_name + "/dense", tabs, B.stream(tabs)))
        sp_s = [0] * 576
        for i in range(192):
            sp_s[i] = ((i * 5) % 13) - 6
        short = [[[T._g(spectrum=sp_s, big_values=96, wsf=1, bt=2,
                        table_select=(1, 1, 1),
                        scf_s=[[(i + w) % 3 for w in range(3)]
                               for i in range(13)],
                        scalefac_compress=10)],
                  [T._g(spectrum=sp_s, big_values=96, wsf=1, bt=2,
                        mixed=1, scf_l=[1] * 22,
                        table_select=(1, 1, 1),
                        scf_s=[[1] * 3 for _ in range(13)],
                        scalefac_compress=10)]] for _ in range(3)]
        seeds.append((tabs_name + "/short", tabs,
                      T._l3_encode_frames(short, mode=3, bidx=14)))
        sp_a = [0] * 576
        sp_b = [0] * 576
        for i in range(200):
            sp_a[i] = ((i * 3) % 9) - 4
            sp_b[i] = ((i * 7) % 5) - 2
        st = [[[T._g(spectrum=sp_a, big_values=100,
                     table_select=(1, 1, 1)),
                T._g(spectrum=sp_b, big_values=100,
                     table_select=(1, 1, 1))]] * 2 for _ in range(2)]
        seeds.append((tabs_name + "/ms", tabs,
                      T._l3_encode_frames(st, mode=1, mode_ext=2,
                                          bidx=14)))
        spill = [[[T._g(spectrum=sp_a, big_values=100,
                        table_select=(1, 1, 2))]] * 2
                 for _ in range(4)]
        seeds.append((tabs_name + "/spill", tabs,
                      T._l3_encode_frames(spill, mode=3, bidx=14,
                                          spill=40)))

    rng = random.Random(0xC0DEC)
    total = mismatches = none_both = 0
    for name, tabs, seed in seeds:
        old.set_l3_tables(**tabs)
        new.set_l3_tables(**tabs)
        dec_old = old._make_mp3_sample_decoder()
        dec_new = new._make_mp3_sample_decoder()
        r_old, r_new = dec_old(seed), dec_new(seed)
        assert r_old == r_new and r_old is not None, (name, r_old, r_new)
        for k in range(n_mut):
            m = bytearray(seed)
            op = rng.randrange(4)
            if op == 0:  # byte flip(s)
                for _ in range(rng.randrange(1, 4)):
                    m[rng.randrange(len(m))] ^= rng.randrange(1, 256)
            elif op == 1:  # truncate
                m = m[:rng.randrange(1, len(m))]
            elif op == 2:  # insert junk
                at = rng.randrange(len(m))
                m[at:at] = bytes(rng.randrange(256)
                                 for _ in range(rng.randrange(1, 9)))
            else:  # splice two windows
                a = rng.randrange(len(m))
                b = rng.randrange(len(m))
                m = m[:a] + m[b:]
            p = bytes(m)
            ro, rn = dec_old(p), dec_new(p)
            total += 1
            if ro != rn:
                mismatches += 1
                print(f"MISMATCH {name} mutant {k}: old={ro} new={rn}")
                if mismatches > 5:
                    sys.exit(1)
            if ro is None:
                none_both += 1
        print(f"{name}: ok ({n_mut} mutants)")
    print(f"total {total} mutants, {mismatches} mismatches, "
          f"{none_both} rejected by both")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
