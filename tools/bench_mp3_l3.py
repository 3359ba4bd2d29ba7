#!/usr/bin/env python
"""Single-core Layer III decode throughput (PERF.md discipline: same
payload before/after, idle host).  Uses the tests' independent L3
frame assembler with two self-consistent Huffman-table shapes:

* flat8  — every big-value code exactly 8 bits (the test tables);
  upper bound for any first-level-LUT scheme.
* mixed  — canonical code with lengths 4..13 over the 256 (x, y)
  pairs (frequent small pairs short, escapes long), the shape real
  Annex-B tables have; exercises the LUT fallback path.

Usage: python tools/bench_mp3_l3.py [reps]
"""
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "t_mp3", os.path.join(os.path.dirname(__file__), "..", "tests",
                          "test_mp3_decoder.py"))
T = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(T)

from whisper_spark.operators import mp3  # noqa: E402


def mixed_tables():
    """Canonical mixed-length big-value code: pairs ordered by
    max(x, y) then (x, y); lengths 4 (first 8), 8 (next 56),
    11 (next 128), 13 (rest).  Kraft sum < 1 (incomplete but
    prefix-free, fine for both encoder and decoder)."""
    pairs = sorted(((x, y) for x in range(16) for y in range(16)),
                   key=lambda p: (max(p), p))
    lens = [4] * 8 + [8] * 56 + [11] * 128 + [13] * 64
    code, prev = 0, lens[0]
    codes = {}
    for (x, y), ln in zip(pairs, lens):
        code <<= (ln - prev)
        prev = ln
        codes[(ln, code)] = (x, y)
        code += 1
    base = T._l3_test_tables()
    base["huffman"] = {1: (codes, 0), 2: (dict(codes), 3)}
    return base


def stream(tabs):
    """8 mono frames, dense spectra: 150 big-value pairs per granule
    (values up to the escape range when linbits present) + a count1
    tail to line 500."""
    inv_ok = tabs["huffman"][1][0]
    frames = []
    for fi in range(8):
        grs = []
        for gr in range(2):
            sp = [0] * 576
            for i in range(300):
                v = ((i * 7 + fi * 13 + gr * 3) % 29) - 14
                sp[i] = v if abs(v) <= 15 else 15
            for i in range(300, 500):
                sp[i] = ((i + fi) % 3) - 1
            grs.append([T._g(spectrum=sp, big_values=150,
                             table_select=(1, 1, 2),
                             scf_l=[(fi + s) % 4 for s in range(22)],
                             scalefac_compress=10)])
        frames.append(grs)
    return T._l3_encode_frames(frames, mode=3, bidx=14)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for name, tabs in (("flat8", T._l3_test_tables()),
                       ("mixed", mixed_tables())):
        # the test assembler encodes with whatever _l3_test_tables()
        # returns — point it at THIS leg's tables so encoder and
        # decoder agree
        T._l3_test_tables = lambda t=tabs: t
        mp3.set_l3_tables(**tabs)
        payload = stream(tabs)
        dec = mp3._make_mp3_sample_decoder()
        r = dec(payload)
        assert r is not None and r["n_samples"] == 8 * 1152, r
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            n = 0
            while n < 20:
                dec(payload)
                n += 1
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        sps = 8 * 1152 / best
        print(f"{name}: {1.0 / best:7.1f} streams/s  "
              f"{sps / 1000:8.1f} ksmp/s  (hash n={r['n_samples']} "
              f"sum={r['s_sum']})")
    mp3.clear_l3_tables()


if __name__ == "__main__":
    main()
