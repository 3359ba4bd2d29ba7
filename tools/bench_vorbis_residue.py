#!/usr/bin/env python
"""Single-core Vorbis nonzero-residue decode throughput (PERF.md
discipline).  Long-block stream from the test suite's design-A setup
(BS1=256, residue end 128, psize 16, 4-dim VQ), dense residues in
every partition.

Usage: python tools/bench_vorbis_residue.py [n_packets] [reps]
"""
import importlib.util
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "t_vorb", os.path.join(REPO, "tests", "test_vorbis_decoder.py"))
T = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(T)

from whisper_spark.operators.vorbis import decode_vorbis_stream  # noqa: E402


def build(n_blocks, rtype=1):
    ident = T.pack_ident(1, 8000, T.BS0, T.BS1)
    setup = T.design_a_setup(rtype=rtype)
    rng = np.random.default_rng(7)
    pkts = []
    for i in range(n_blocks):
        pl = 1 if i > 0 else 0
        nl = 1 if i + 1 < n_blocks else 0
        entries = [int(e) for e in rng.integers(0, T.VQ_ENTRIES, 32)]
        pkts.append(T.audio_packet_a(1, prevw=pl, nextw=nl,
                                     floor_y=(255, 255),
                                     entries=entries, rtype=rtype))
    sizes = [T.BS1] * n_blocks
    total = T.emitted_samples(sizes)
    granules = [0] * (n_blocks - 1) + [total]
    return T.ogg_wrap([ident, T.comment_pkt(), setup], pkts,
                      granules), total


def build_large(n_blocks, rtype=1):
    """Realistic-shape leg: 2048-sample long blocks, residue end 1024,
    psize 32, a 64-entry VQ with MIXED canonical code lengths
    (4/7/10 bits — exercises the second-level LUT), entries written
    with the decoder-independent buddy assignment."""
    from whisper_spark.operators.vorbis import _assign_codewords

    BS0L, BS1L = 256, 2048
    VQE = 64
    lens = [4] * 8 + [7] * 24 + [10] * 32
    codes = _assign_codewords(lens)
    by_entry = {e: (ln, c) for (ln, c), e in codes.items()}
    ident = T.pack_ident(1, 8000, BS0L, BS1L)
    classbook = lambda bw: T.pack_codebook(bw, dims=2, lengths=[1])  # noqa: E731
    mults = [(e * 7 + 3 * d) % 8 for e in range(VQE) for d in range(4)]
    vq = lambda bw: T.pack_codebook(  # noqa: E731
        bw, dims=4, lengths=lens, lookup=2, value_bits=3,
        vmin_packed=T.float32_pack(1, 790, sign=1),
        vdelta_packed=T.float32_pack(1, 788), mults=mults)
    floor = lambda bw: T.pack_floor1(  # noqa: E731
        bw, [], [], [], [], [], multiplier=1, rangebits=7, x_tail=[])
    residue = lambda bw: T.pack_residue(  # noqa: E731
        bw, rtype, 0, 1024, 32, 1, 0, [0b1], [[1] + [None] * 7])
    mapping = lambda bw: T.pack_mapping(bw, channels=1)  # noqa: E731
    setup = T.pack_setup([classbook, vq], [floor], [residue], [mapping],
                         [(0, 0), (1, 0)])
    rng = np.random.default_rng(13)
    n2 = BS1L // 2
    partitions = 1024 // 32
    pkts = []
    for i in range(n_blocks):
        bw = T.BitW()
        bw.w(0, 1)
        bw.w(1, 1)  # mode 1 = long
        bw.w(1 if i > 0 else 0, 1)
        bw.w(1 if i + 1 < n_blocks else 0, 1)
        bw.w(1, 1)          # floor nonzero
        bw.w(255, 8)
        bw.w(255, 8)
        entries = rng.integers(0, VQE, 1024 // 4)
        # classword (dims=2 -> one word per 2 partitions) interleaved
        # with its partitions' data, the spec walk
        gi = 0
        pi = 0
        while pi < partitions:
            bw.wbits_msb(0, 1)
            for _k in range(2):
                if pi >= partitions:
                    break
                for _g in range(32 // 4):
                    ln, c = by_entry[int(entries[gi])]
                    bw.wbits_msb(c, ln)
                    gi += 1
                pi += 1
        pkts.append(bw.bytes())
    sizes = [BS1L] * n_blocks
    total = T.emitted_samples(sizes)
    granules = [0] * (n_blocks - 1) + [total]
    return T.ogg_wrap([ident, T.comment_pkt(), setup], pkts,
                      granules), total


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    legs = [("small/rtype1", build(n_blocks, 1)),
            ("small/rtype0", build(n_blocks, 0)),
            ("large/rtype1", build_large(max(8, n_blocks // 4), 1)),
            ("large/rtype0", build_large(max(8, n_blocks // 4), 0))]
    for name, (data, total) in legs:
        r = decode_vorbis_stream(data)
        assert r is not None and r[2].shape[0] == total, (name, total)
        csum = float(np.abs(r[2]).sum())
        assert csum > 0, name
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            n = 0
            while n < 10:
                decode_vorbis_stream(data)
                n += 1
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        print(f"{name}: {1.0 / best:7.1f} streams/s  "
              f"{total / best / 1000:8.1f} ksmp/s  (abs-sum {csum:.6f})")


if __name__ == "__main__":
    main()
