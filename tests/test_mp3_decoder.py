"""MPEG-1 audio decoder verification (operators/mp3.py).

Verification direction mirrors the FLAC/JPEG suites: everything here
is written INDEPENDENTLY from the public ISO 11172-3 structure — a
separate bit-writer, separate frame encoders for Layers I and II, the
ISO ANALYSIS filterbank structure (mirroring, not calling, the
decoder's synthesis), and direct-form re-derivations of the
requantization formulas and of the polyphase synthesis — then checked
against the decoder:

* requantization spot values against hand-computed rationals;
* Layer I / II bitstream decode against independently-packed frames
  with expected subband values computed by the test's own formula
  (exact float equality — same IEEE ops);
* the decoder's fifo-based polyphase synthesis against the test's
  direct-form expansion (out[32t+j] as an explicit window-tap sum);
* full PCM round trips: test-side ISO-structure analysis + quantizer
  + frame packer -> decoder -> SNR bound (the windows are the
  designed near-PR pair, tools/gen_mp3_window.py);
* Layer III zero-spectrum streams (the oracle shape) and every
  documented gate/corruption path.
"""

from __future__ import annotations

import numpy as np
import pytest

from whisper_spark.operators.mp3 import (
    _default_windows,
    decode_mp3_samples,
)

SF = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))


# ------------------------------------------------------------------ #
# independent bit-writer + frame builders
# ------------------------------------------------------------------ #


class BitW:
    def __init__(self):
        self.bits = []

    def w(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def header(layer, bidx, ridx, mode, mode_ext=0, pad=0):
    b1 = 0xE0 | (3 << 3) | ({1: 3, 2: 2, 3: 1}[layer] << 1) | 1
    b2 = (bidx << 4) | (ridx << 2) | (pad << 1)
    b3 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b1, b2, b3])


L1_BITRATES = (None, 32, 64, 96, 128, 160, 192, 224,
               256, 288, 320, 352, 384, 416, 448)
L2_BITRATES = (None, 32, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320, 384)
RATES = (44100, 48000, 32000)


def l1_frame(alloc, scf, codes, bidx, ridx, mode=3, mode_ext=0):
    """Independent Layer I packer.  alloc/scf: [ch][sb]; codes:
    [group][ch][sb] (code ints, already MSB-flipped form as stored)."""
    nch = len(alloc)
    bound = (mode_ext + 1) * 4 if mode == 1 else 32
    w = BitW()
    for sb in range(bound):
        for ch in range(nch):
            w.w(alloc[ch][sb], 4)
    for sb in range(bound, 32):
        w.w(alloc[0][sb], 4)
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                w.w(scf[ch][sb], 6)
    for s in range(12):
        for sb in range(32):
            if sb < bound:
                for ch in range(nch):
                    if alloc[ch][sb]:
                        w.w(codes[s][ch][sb], alloc[ch][sb] + 1)
            else:
                if alloc[0][sb]:
                    w.w(codes[s][0][sb], alloc[0][sb] + 1)
    body = w.bytes()
    rate = RATES[ridx]
    flen = (12 * L1_BITRATES[bidx] * 1000 // rate) * 4
    frame = header(1, bidx, ridx, mode, mode_ext) + body
    assert len(frame) <= flen, "frame overflow"
    return frame + b"\x00" * (flen - len(frame))


ROW_A0 = (0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047,
          4095, 8191, 16383, 32767, 65535)
ROW_A1 = (0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023,
          2047, 4095, 8191, 65535)
ROW_A2 = (0, 3, 5, 7, 9, 15, 31, 65535)
ROW_A3 = (0, 3, 5, 65535)
TABLE_A = tuple(
    ROW_A0 if sb < 3 else ROW_A1 if sb < 11 else
    ROW_A2 if sb < 23 else ROW_A3
    for sb in range(27)
)
GROUP_BITS = {3: 5, 5: 7, 9: 10}


def l2_frame(alloc, scfsi, scf, codes, bidx, ridx, mode=3, table=TABLE_A):
    """Independent Layer II packer (single-channel modes only — joint
    stereo is covered on Layer I).  codes: [granule][ch][sb] -> either
    a grouped int or a 3-tuple of codes."""
    nch = len(alloc)
    sblimit = len(table)
    w = BitW()
    for sb in range(sblimit):
        nbal = (len(table[sb]) - 1).bit_length()
        for ch in range(nch):
            w.w(alloc[ch][sb], nbal)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                w.w(scfsi[ch][sb], 2)
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                si = scfsi[ch][sb]
                f = scf[ch][sb]
                if si == 0:
                    w.w(f[0], 6), w.w(f[1], 6), w.w(f[2], 6)
                elif si == 1:
                    w.w(f[0], 6), w.w(f[2], 6)
                elif si == 2:
                    w.w(f[0], 6)
                else:
                    w.w(f[0], 6), w.w(f[1], 6)
    for gr in range(12):
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch][sb]:
                    steps = table[sb][alloc[ch][sb]]
                    c = codes[gr][ch][sb]
                    if steps in GROUP_BITS:
                        w.w(c, GROUP_BITS[steps])
                    else:
                        nb = steps.bit_length()
                        for j in range(3):
                            w.w(c[j], nb)
    body = w.bytes()
    rate = RATES[ridx]
    flen = 144 * L2_BITRATES[bidx] * 1000 // rate
    frame = header(2, bidx, ridx, mode) + body
    assert len(frame) <= flen, "frame overflow"
    return frame + b"\x00" * (flen - len(frame))


def l3_silence_frame(ridx=2, bidx=3, mode=3):
    """Layer III all-zero frame: zeroed side info (every field 0 =
    long blocks, part2_3_length 0, main_data_begin 0)."""
    rate = RATES[ridx]
    from whisper_spark.operators.mp3 import _make_mp3_sample_decoder  # noqa
    flen = 144 * (None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  160, 192, 224, 256, 320)[bidx] * 1000 // rate
    side = 17 if mode == 3 else 32
    frame = header(3, bidx, ridx, mode) + b"\x00" * (flen - 4)
    assert len(frame) == flen and flen >= 4 + side
    return frame


# independent requant formulas (from the ISO definitions, re-derived)


def req1(code, nb):
    u = code ^ (1 << (nb - 1))
    if u >= 1 << (nb - 1):
        u -= 1 << nb
    return (2.0 ** nb / (2 ** nb - 1)) * (u / 2.0 ** (nb - 1) + 2.0 ** (1 - nb))


def req2(code, steps):
    nb = steps.bit_length()
    u = code ^ (1 << (nb - 1))
    if u >= 1 << (nb - 1):
        u -= 1 << nb
    c = 2.0 ** nb / steps
    d = (2.0 ** (nb - 1) - (steps - 1) // 2) / 2.0 ** (nb - 1)
    return c * (u / 2.0 ** (nb - 1) + d)


# ------------------------------------------------------------------ #
# unit: requantization rationals
# ------------------------------------------------------------------ #


def test_requant_spot_values():
    r = decode_mp3_samples._requant
    # nb=2: three levels -2/3, 0, +2/3 at codes 0, 1, 2
    assert r(0, 2) == pytest.approx(-2 / 3, abs=1e-15)
    assert r(1, 2) == 0.0
    assert r(2, 2) == pytest.approx(2 / 3, abs=1e-15)
    # nb=3: zero code is 3 ('011'), extremes -6/7..+6/7
    assert r(3, 3) == 0.0
    assert r(0, 3) == pytest.approx(-6 / 7, abs=1e-15)
    assert r(6, 3) == pytest.approx(6 / 7, abs=1e-15)
    l2 = decode_mp3_samples._l2_requant
    # 5 steps: levels -0.8 -0.4 0 0.4 0.8
    for code, want in enumerate((-0.8, -0.4, 0.0, 0.4, 0.8)):
        assert l2(code, 5) == pytest.approx(want, abs=1e-15)
    assert l2(1, 3) == 0.0 and l2(0, 3) == pytest.approx(-2 / 3, abs=1e-15)
    assert l2(4, 9) == 0.0
    assert l2(3, 7) == 0.0 and l2(6, 7) == pytest.approx(6 / 7, abs=1e-15)
    # middles of every power-of-two class are exact zero
    for steps in (7, 15, 31, 63, 127, 255, 511, 1023, 2047,
                  4095, 8191, 16383, 32767, 65535):
        assert l2((steps - 1) // 2, steps) == 0.0


# ------------------------------------------------------------------ #
# Layer I bitstream: independent packer -> exact subband equality
# ------------------------------------------------------------------ #


def test_layer1_bitstream_exact():
    rng = np.random.default_rng(101)
    for mode, nch, mode_ext in ((3, 1, 0), (0, 2, 0), (1, 2, 1)):
        bound = (mode_ext + 1) * 4 if mode == 1 else 32
        alloc = [[0] * 32 for _ in range(nch)]
        scf = [[0] * 32 for _ in range(nch)]
        for sb in range(32):
            a = int(rng.integers(0, 8))
            for ch in range(nch):
                alloc[ch][sb] = a if sb >= bound else int(rng.integers(0, 8))
                scf[ch][sb] = int(rng.integers(0, 63))
        codes = [[[0] * 32 for _ in range(nch)] for _ in range(12)]
        for s in range(12):
            for sb in range(32):
                for ch in range(nch):
                    a = alloc[ch][sb]
                    if a:
                        nb = a + 1
                        codes[s][ch][sb] = int(rng.integers(0, (1 << nb) - 1))
                if sb >= bound:
                    for ch in range(1, nch):
                        codes[s][ch][sb] = codes[s][0][sb]
        frame = l1_frame(alloc, scf, codes, bidx=14, ridx=2,
                         mode=mode, mode_ext=mode_ext)
        rate, got_nch, frames = decode_mp3_samples._decode_frames(frame)
        assert (rate, got_nch, len(frames)) == (32000, nch, 1)
        got = frames[0]
        assert got.shape == (12, nch, 32)
        for s in range(12):
            for ch in range(nch):
                for sb in range(32):
                    a = alloc[ch][sb]
                    want = (
                        req1(codes[s][ch][sb], a + 1) * SF[scf[ch][sb]]
                        if a else 0.0
                    )
                    assert got[s, ch, sb] == want, (s, ch, sb)


def test_layer2_bitstream_exact_and_scfsi():
    rng = np.random.default_rng(202)
    nch = 1
    # exercise every scfsi mode, grouped (3/5/9) and ungrouped classes
    alloc = [[0] * 27]
    scfsi = [[0] * 27]
    scf = [[(0, 0, 0)] * 27]
    for sb in range(27):
        hi = len(TABLE_A[sb])
        alloc[0][sb] = int(rng.integers(0, hi))
        scfsi[0][sb] = sb % 4
        scf[0][sb] = tuple(int(rng.integers(0, 63)) for _ in range(3))
    codes = [[[None] * 27] for _ in range(12)]
    for gr in range(12):
        for sb in range(27):
            a = alloc[0][sb]
            if not a:
                continue
            steps = TABLE_A[sb][a]
            if steps in GROUP_BITS:
                codes[gr][0][sb] = int(rng.integers(0, steps ** 3))
            else:
                nb = steps.bit_length()
                codes[gr][0][sb] = tuple(
                    int(rng.integers(0, steps)) for _ in range(3)
                )
    frame = l2_frame(alloc, scfsi, scf, codes, bidx=14, ridx=1)
    rate, got_nch, frames = decode_mp3_samples._decode_frames(frame)
    assert (rate, got_nch, len(frames)) == (48000, 1, 1)
    got = frames[0]
    assert got.shape == (36, 1, 32)
    for gr in range(12):
        part = gr >> 2
        for sb in range(32):
            a = alloc[0][sb] if sb < 27 else 0
            if not a:
                assert np.all(got[3 * gr:3 * gr + 3, 0, sb] == 0.0)
                continue
            si, f = scfsi[0][sb], scf[0][sb]
            eff = {
                0: f,
                1: (f[0], f[0], f[2]),
                2: (f[0], f[0], f[0]),
                3: (f[0], f[1], f[1]),
            }[si]
            steps = TABLE_A[sb][a]
            c = codes[gr][0][sb]
            if steps in GROUP_BITS:
                tri = (c % steps, (c // steps) % steps, c // steps // steps)
            else:
                tri = c
            for j in range(3):
                want = req2(tri[j], steps) * SF[eff[part]]
                assert got[3 * gr + j, 0, sb] == want, (gr, sb, j)


# ------------------------------------------------------------------ #
# polyphase synthesis: fifo implementation vs direct-form expansion
# ------------------------------------------------------------------ #


def test_synthesis_matches_direct_form():
    _, D = _default_windows()
    N = np.array(
        [[np.cos((16 + i) * (2 * k + 1) * np.pi / 64) for k in range(32)]
         for i in range(64)]
    )
    rng = np.random.default_rng(7)
    groups = rng.standard_normal((20, 32))
    syn = decode_mp3_samples._synth_class()
    got = syn.run(groups)
    # direct form: out[32t+j] = sum_q D[64q+j]   * (N@S_{t-2q})[j]
    #                         + D[64q+32+j] * (N@S_{t-2q-1})[j+32]
    mat = np.array([N @ g for g in groups])
    for t in range(20):
        for j in range(32):
            want = 0.0
            for q in range(8):
                if t - 2 * q >= 0:
                    want += D[64 * q + j] * mat[t - 2 * q][j]
                if t - 2 * q - 1 >= 0:
                    want += D[64 * q + 32 + j] * mat[t - 2 * q - 1][j + 32]
            assert got[32 * t + j] == pytest.approx(want, abs=1e-12)


# ------------------------------------------------------------------ #
# full round trips: ISO-structure analysis encoder -> decoder -> SNR
# ------------------------------------------------------------------ #


def _analyze(pcm, C):
    X = np.zeros(512)
    out = []
    for t in range(0, len(pcm) - 31, 32):
        X[32:] = X[:-32].copy()
        X[:32] = pcm[t:t + 32][::-1]
        Y = (X * C).reshape(8, 64).sum(0)
        out.append(np.array([
            sum(np.cos((2 * k + 1) * (i - 16) * np.pi / 64) * Y[i]
                for i in range(64))
            for k in range(32)
        ]))
    return np.array(out)


def _pick_sf(m):
    idx = 62
    while idx > 0 and SF[idx] < m:
        idx -= 1
    if SF[idx] < m:
        raise AssertionError("signal exceeds scalefactor range")
    return idx


def _quant_l1(s, nb):
    """Inverse of req1.  Levels are uniform: req1(c) = 2(c - mid) /
    (2^nb - 1) with mid = 2^(nb-1)-1 and the all-ones code forbidden,
    so quantization is a plain rounded affine map."""
    idx = _pick_sf(np.max(np.abs(s)))
    mid = (1 << (nb - 1)) - 1
    codes = [
        int(np.clip(round(v / SF[idx] * ((1 << nb) - 1) / 2 + mid),
                    0, (1 << nb) - 2))
        for v in s
    ]
    return idx, codes


def _snr(ref, got):
    e = got - ref
    return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(e ** 2), 1e-300))


def _direct_synth(groups, D):
    """Independent direct-form synthesis (the expansion verified in
    test_synthesis_matches_direct_form), for end-to-end expectations."""
    N = np.array(
        [[np.cos((16 + i) * (2 * k + 1) * np.pi / 64) for k in range(32)]
         for i in range(64)]
    )
    mat = [N @ g for g in groups]
    out = np.zeros(len(groups) * 32)
    for t in range(len(groups)):
        for j in range(32):
            v = 0.0
            for q in range(8):
                if t - 2 * q >= 0:
                    v += D[64 * q + j] * mat[t - 2 * q][j]
                if t - 2 * q - 1 >= 0:
                    v += D[64 * q + 32 + j] * mat[t - 2 * q - 1][j + 32]
            out[32 * t + j] = v
    return out


def test_layer1_pcm_round_trip():
    C, _ = _default_windows()
    rng = np.random.default_rng(11)
    n_frames = 8
    t = np.arange(32 * 12 * n_frames)
    pcm = (0.12 * np.sin(2 * np.pi * 1000 * t / 32000)
           + 0.08 * np.sin(2 * np.pi * 3100 * t / 32000 + 1.0)
           + 0.04 * np.sin(2 * np.pi * 5500 * t / 32000 + 2.0)
           + 0.005 * rng.standard_normal(t.size))
    sb = _analyze(pcm, C)
    assert sb.shape == (12 * n_frames, 32)
    nb = 11  # allocation code 10
    stream = b""
    for f in range(n_frames):
        chunk = sb[12 * f:12 * f + 12]
        alloc = [[nb - 1] * 32]
        scf = [[0] * 32]
        codes = [[[0] * 32] for _ in range(12)]
        for s_i in range(32):
            idx, cs = _quant_l1(chunk[:, s_i], nb)
            scf[0][s_i] = idx
            for g in range(12):
                codes[g][0][s_i] = cs[g]
        stream += l1_frame(alloc, scf, codes, bidx=14, ridx=2)
    got = decode_mp3_samples(stream)
    assert got is not None
    assert (got["sample_rate"], got["channels"], got["bits"]) == (32000, 1, 16)
    assert got["n_samples"] == 384 * n_frames
    # rebuild float PCM from the decoder internals for the SNR check
    rate, nch, frames = decode_mp3_samples._decode_frames(stream)
    syn = decode_mp3_samples._synth_class()
    out = np.concatenate([syn.run(fr[:, 0, :]) for fr in frames])
    delay = 481
    lo = delay + 512
    snr = _snr(pcm[lo - delay:len(out) - delay], out[lo:])
    assert snr > 55.0, snr


def test_layer2_pcm_round_trip_with_grouping():
    C, _ = _default_windows()
    rng = np.random.default_rng(13)
    n_frames = 4
    t = np.arange(32 * 36 * n_frames)
    pcm = (0.12 * np.sin(2 * np.pi * 1000 * t / 48000)
           + 0.08 * np.sin(2 * np.pi * 3100 * t / 48000 + 1.0)
           + 0.04 * np.sin(2 * np.pi * 5500 * t / 48000 + 2.0)
           + 0.004 * rng.standard_normal(t.size))
    sb = _analyze(pcm, C)
    # allocation plan: fine pow2 classes low, 31-step mid, grouped
    # 5-step top (exercises degrouping in the reconstruction path)
    plan = [14] * 3 + [13] * 8 + [6] * 12 + [2] * 4
    expected_sb = np.zeros((36 * n_frames, 32))
    stream = b""
    for f in range(n_frames):
        chunk = sb[36 * f:36 * f + 36]
        alloc = [list(plan)]
        scfsi = [[0] * 27]
        scf = [[(0, 0, 0)] * 27]
        codes = [[[None] * 27] for _ in range(12)]
        for s_i in range(27):
            steps = TABLE_A[s_i][plan[s_i]]
            idx = _pick_sf(np.max(np.abs(chunk[:, s_i])))
            scf[0][s_i] = (idx, idx, idx)
            # req2 levels are uniform with spacing 2/steps around the
            # middle code mid=(steps-1)/2, and the stored code IS the
            # level index (the MSB flip cancels: u = code - 2^(nb-1))
            mid = (steps - 1) // 2
            for gr in range(12):
                lv = [
                    int(np.clip(
                        round(chunk[3 * gr + j, s_i] / SF[idx]
                              * steps / 2 + mid),
                        0, steps - 1))
                    for j in range(3)
                ]
                if steps in GROUP_BITS:
                    codes[gr][0][s_i] = (
                        lv[0] + steps * lv[1] + steps * steps * lv[2]
                    )
                else:
                    codes[gr][0][s_i] = tuple(lv)
        stream += l2_frame(alloc, scfsi, scf, codes, bidx=14, ridx=1)
        for s_i in range(27):
            steps = TABLE_A[s_i][plan[s_i]]
            mid = (steps - 1) // 2
            idx = scf[0][s_i][0]
            for gr in range(12):
                c = codes[gr][0][s_i]
                if steps in GROUP_BITS:
                    tri = (c % steps, (c // steps) % steps,
                           c // steps // steps)
                else:
                    tri = c
                for j in range(3):
                    expected_sb[36 * f + 3 * gr + j, s_i] = \
                        req2(tri[j], steps) * SF[idx]
    got = decode_mp3_samples(stream)
    assert got is not None
    assert (got["sample_rate"], got["channels"]) == (48000, 1)
    assert got["n_samples"] == 1152 * n_frames
    rate, nch, frames = decode_mp3_samples._decode_frames(stream)
    syn = decode_mp3_samples._synth_class()
    out = np.concatenate([syn.run(fr[:, 0, :]) for fr in frames])
    # tight end-to-end: decoder PCM == independent direct-form synthesis
    # of the independently-requantized expected subbands
    _, D = _default_windows()
    want = _direct_synth(expected_sb, D)
    assert np.abs(out - want).max() < 1e-9
    # loose overall fidelity (the 31-step / 5-step classes are coarse
    # by design; the exact bitstream checks live above)
    delay = 481
    lo = delay + 512
    snr = _snr(pcm[lo - delay:len(out) - delay], out[lo:])
    assert snr > 30.0, snr


# ------------------------------------------------------------------ #
# Layer III silence + gates + stream-walk hygiene
# ------------------------------------------------------------------ #


def test_layer3_silence_exact_zero():
    stream = l3_silence_frame() * 3
    got = decode_mp3_samples(stream)
    assert got == {
        "sample_rate": 32000, "channels": 1, "bits": 16,
        "n_samples": 3456, "s_min": 0, "s_max": 0, "s_sum": 0,
        "s_sq_sum": 0, "s_mean": 0.0,
    }


def test_layer3_id3_wrapping():
    frame = l3_silence_frame()
    id3v2 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    id3v1 = b"TAG" + b"\x00" * 125
    got = decode_mp3_samples(id3v2 + frame * 2 + id3v1)
    assert got is not None and got["n_samples"] == 2304


def test_layer3_nonzero_spectrum_gated():
    frame = bytearray(l3_silence_frame())
    # big_values MSB is global side-info bit 30 -> byte 3, mask 0x02
    frame[4 + 3] |= 0x02
    assert decode_mp3_samples(bytes(frame)) is None
    # part2_3_length nonzero (bit 18 -> byte 2, mask 0x20) with zero
    # scalefactor bits implies Huffman data: gated
    frame2 = bytearray(l3_silence_frame())
    frame2[4 + 2] |= 0x20
    assert decode_mp3_samples(bytes(frame2)) is None


def test_rejects_and_gates():
    frame = l3_silence_frame()
    assert decode_mp3_samples(None) is None
    assert decode_mp3_samples(b"\x00\x01\x02\x03") is None
    assert decode_mp3_samples(frame[:-1]) is None          # truncated
    mpeg2 = bytearray(frame)
    mpeg2[1] &= ~0x08                                      # version bit
    assert decode_mp3_samples(bytes(mpeg2)) is None
    free = bytearray(frame)
    free[2] &= 0x0F                                        # bitrate idx 0
    assert decode_mp3_samples(bytes(free)) is None
    badfs = bytearray(frame)
    badfs[2] |= 0x0C                                       # fs idx 3
    assert decode_mp3_samples(bytes(badfs)) is None
    # mid-stream samplerate change
    other = l3_silence_frame(ridx=1, bidx=3)
    assert decode_mp3_samples(frame + other) is None
    # Layer I forbidden allocation 15
    bad_alloc = bytearray(
        l1_frame([[2] * 32], [[0] * 32],
                 [[[1] * 32] for _ in range(12)], bidx=14, ridx=2)
    )
    bad_alloc[4] = 0xFF  # allocation nibbles -> 15
    assert decode_mp3_samples(bytes(bad_alloc)) is None


def test_layer1_exact_zero_codes_any_alloc_scf():
    """The oracle construction: allocated subbands whose codes are the
    exact-zero level decode to 0.0 whatever the scalefactor — wrong
    allocation/scalefactor parsing would desync and fail."""
    for q in range(14):
        alloc = [[0] * 32]
        for sb in range(2 * q, 2 * q + 4):
            alloc[0][sb] = 2  # nb=3
        scf = [[(q * 7 + sb) % 63 if alloc[0][sb] else 0
                for sb in range(32)]]
        codes = [[[3 if alloc[0][sb] else 0 for sb in range(32)]]
                 for _ in range(12)]
        frame = l1_frame(alloc, scf, codes, bidx=1, ridx=2)
        assert len(frame) == 48
        got = decode_mp3_samples(frame * 2)
        assert got["n_samples"] == 768
        assert got["s_min"] == got["s_max"] == got["s_sum"] == 0


def test_decode_samples_dispatches_mp3(spark):
    from whisper_spark.operators.multimodal import decode_samples

    frame = l3_silence_frame()
    df = spark.createDataFrame(
        [(1, bytearray(frame * 2)), (2, bytearray(b"\xff\xe0junk"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_samples(df).collect()}
    assert rows[1]["n_samples"] == 2304 and rows[1]["s_sq_sum"] == 0
    assert rows[2]["n_samples"] is None


def l3_frame_sideinfo(gr_fields, ridx=2, bidx=3):
    """Layer III mono frame with explicit per-granule side-info fields
    (both granules identical): gr_fields = dict of block layout."""
    w = BitW()
    w.w(0, 9)   # main_data_begin
    w.w(0, 5)   # private
    w.w(0, 4)   # scfsi
    for _gr in range(2):
        w.w(0, 12)  # part2_3_length
        w.w(0, 9)   # big_values
        w.w(0, 8)   # global_gain
        w.w(0, 4)   # scalefac_compress
        wsf = gr_fields.get("wsf", 0)
        w.w(wsf, 1)
        if wsf:
            w.w(gr_fields["block_type"], 2)
            w.w(gr_fields.get("mixed", 0), 1)
            w.w(0, 10)  # table_select x2
            w.w(0, 9)   # subblock_gain x3
        else:
            w.w(0, 15)  # table_select x3
            w.w(0, 7)   # region counts
        w.w(0, 3)   # preflag, scalefac_scale, count1table_select
    side = w.bytes()
    assert len(side) == 17
    rate = RATES[ridx]
    flen = 144 * (None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  160, 192, 224, 256, 320)[bidx] * 1000 // rate
    frame = header(3, bidx, ridx, 3) + side + b"\x00" * (flen - 4 - 17)
    return frame


def test_layer3_short_and_mixed_blocks_silence():
    """Round-7 review regression: block_type-2 granules used a
    12-sample stride for the short-window overlap (out-of-range
    broadcast -> None).  Short and mixed silence frames must decode
    through the real 3x12 IMDCT path to exact zeros."""
    for fields in ({"wsf": 1, "block_type": 2},
                   {"wsf": 1, "block_type": 2, "mixed": 1},
                   {"wsf": 1, "block_type": 1},
                   {"wsf": 1, "block_type": 3}):
        got = decode_mp3_samples(l3_frame_sideinfo(fields) * 2)
        assert got is not None, fields
        assert got["n_samples"] == 2304 and got["s_sq_sum"] == 0, fields


def test_mixed_layer_stream_rejected():
    """Round-7 review regression: a stream switching layer mid-way
    (same rate/channels) is an illegal parameter change -> None."""
    l1 = l1_frame([[0] * 32], [[0] * 32],
                  [[[0] * 32] for _ in range(12)], bidx=1, ridx=2)
    l3 = l3_silence_frame()
    assert decode_mp3_samples(l1) is not None
    assert decode_mp3_samples(l3) is not None
    assert decode_mp3_samples(l1 + l3) is None
    assert decode_mp3_samples(l3 + l1) is None


def test_set_iso_windows_affects_module_decoder():
    """Round-7 review regression: the module-level decode_mp3_samples
    must pick up set_iso_windows() (the frozen closure used to ignore
    it).  An all-zero synthesis window forces silent PCM from frames
    whose codes are NOT at the zero level; clearing restores the
    designed window."""
    from whisper_spark.operators import mp3 as M

    alloc = [[2] * 32]
    scf = [[10] * 32]
    codes = [[[1] * 32] for _ in range(12)]  # nonzero requant level
    frame = l1_frame(alloc, scf, codes, bidx=14, ridx=2)
    loud = decode_mp3_samples(frame)
    assert loud is not None and loud["s_sq_sum"] > 0
    try:
        M.set_iso_windows(None, np.zeros(512))
        silent = decode_mp3_samples(frame)
        assert silent is not None and silent["s_sq_sum"] == 0
    finally:
        M.clear_iso_windows()
    again = decode_mp3_samples(frame)
    assert again == loud


# ------------------------------------------------------------------ #
# Layer III nonzero spectra: self-consistent tables + independent
# encoder + independent reference pipeline (the Annex-B table VALUES
# are injectable data; the MACHINERY under test is the decoder's)
# ------------------------------------------------------------------ #


def _l3_test_tables():
    # big-value tables: complete 8-bit code over all 256 (x, y) pairs;
    # table 2 adds 3 linbits (x/y == 15 escapes extend by 0..7)
    t1 = {(8, (x << 4) | y): (x, y) for x in range(16) for y in range(16)}
    huff = {1: (t1, 0), 2: (dict(t1), 3)}
    c1 = {(4, i): ((i >> 3) & 1, (i >> 2) & 1, (i >> 1) & 1, i & 1)
          for i in range(16)}
    bl = [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 80, 96, 114,
          136, 162, 194, 232, 278, 332, 394, 576]
    bs = [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 102, 128, 158, 192]
    pretab = [0] * 11 + [1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]
    return {
        "huffman": huff,
        "count1": {0: c1, 1: c1},
        "sfb_long": {32000: bl},
        "sfb_short": {32000: bs},
        "pretab": pretab,
    }


_BL = _l3_test_tables()["sfb_long"][32000]
_BS = _l3_test_tables()["sfb_short"][32000]
_PRETAB = _l3_test_tables()["pretab"]


def _g(**kw):
    g = {
        "bt": 0, "mixed": 0, "wsf": 0, "global_gain": 210,
        "scalefac_compress": 13, "scalefac_scale": 0, "preflag": 0,
        "subblock_gain": (0, 0, 0), "table_select": (1, 1, 1),
        "region0_count": 7, "region1_count": 7,
        "count1table_select": 0,
        "spectrum": [0] * 576, "big_values": 0,
        "scf_l": [0] * 22, "scf_s": [[0] * 3 for _ in range(13)],
        "cut_bits": 0,  # shrink part2_3_length (overshoot tests)
    }
    g.update(kw)
    return g


def _l3_granule_bits(g, gr, scfsi_ch, gr0_scf):
    """Independent main-data bit writer for one granule: stored
    scalefactors + region-selected Huffman pairs + count1 quads."""
    w = BitW()
    from whisper_spark.operators.mp3 import _make_mp3_sample_decoder  # noqa
    SLEN = ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
            (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
            (4, 2), (4, 3))
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    if g["wsf"] and g["bt"] == 2:
        if g["mixed"]:
            for sfb in range(8):
                w.w(g["scf_l"][sfb], slen1)
            for sfb in range(3, 6):
                for win in range(3):
                    w.w(g["scf_s"][sfb][win], slen1)
            for sfb in range(6, 12):
                for win in range(3):
                    w.w(g["scf_s"][sfb][win], slen2)
        else:
            for sfb in range(6):
                for win in range(3):
                    w.w(g["scf_s"][sfb][win], slen1)
            for sfb in range(6, 12):
                for win in range(3):
                    w.w(g["scf_s"][sfb][win], slen2)
    else:
        groups = [(range(0, 6), slen1), (range(6, 11), slen1),
                  (range(11, 16), slen2), (range(16, 21), slen2)]
        for gi, (band_range, slen) in enumerate(groups):
            if gr == 1 and scfsi_ch[gi]:
                continue
            for sfb in band_range:
                w.w(g["scf_l"][sfb], slen)
    # huffman pairs
    tabs = _l3_test_tables()
    sp = g["spectrum"]
    if g["wsf"]:
        r0_end, r1_end = 36, 576
    else:
        r0 = min(g["region0_count"] + 1, 22)
        r1 = min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)
        r0_end, r1_end = _BL[r0], _BL[r1]
    for pos in range(0, g["big_values"] * 2, 2):
        region = 0 if pos < r0_end else (1 if pos < r1_end else 2)
        tid = g["table_select"][region]
        if tid == 0:
            assert sp[pos] == 0 and sp[pos + 1] == 0
            continue
        codes, linbits = tabs["huffman"][tid]
        inv = {v: k for k, v in codes.items()}
        a, b = sp[pos], sp[pos + 1]
        ca = min(abs(a), 15)
        cb = min(abs(b), 15)
        ln, code = inv[(ca, cb)]
        w.w(code, ln)
        for v, c in ((a, ca), (b, cb)):
            if c == 15 and linbits:
                assert 0 <= abs(v) - 15 < (1 << linbits)
                w.w(abs(v) - 15, linbits)
            if v:
                w.w(1 if v < 0 else 0, 1)
    # count1 quads: cover every remaining nonzero (|v| == 1)
    idx = g["big_values"] * 2
    last_nz = max((i for i in range(idx, 576) if sp[i]), default=idx - 1)
    c1 = tabs["count1"][g["count1table_select"]]
    inv1 = {v: k for k, v in c1.items()}
    while idx <= last_nz:
        quad = tuple(abs(sp[idx + j]) for j in range(4))
        assert all(q <= 1 for q in quad)
        ln, code = inv1[quad]
        w.w(code, ln)
        for j in range(4):
            if sp[idx + j]:
                w.w(1 if sp[idx + j] < 0 else 0, 1)
        idx += 4
    return w.bits


def _l3_encode_frames(frame_specs, mode=3, mode_ext=0, bidx=14,
                      spill=0, scfsi=None):
    """Independent Layer III frame assembler.  frame_specs: list of
    [granule0_chs, granule1_chs] (each a list of _g dicts per channel).
    ``spill`` > 0 exercises the bit reservoir: the first ``spill``
    bytes of every non-first frame's main data ride in the previous
    frame's tail, addressed via main_data_begin."""
    nch = 1 if mode == 3 else 2
    scfsi = scfsi or [[0] * 4 for _ in range(nch)]
    n = len(frame_specs)
    raw = []
    lens = []
    for spec in frame_specs:
        w = BitW()
        ln = []
        for gr in range(2):
            for ch in range(nch):
                g = spec[gr][ch]
                sc = scfsi[ch] if gr == 1 else [0] * 4
                bits = _l3_granule_bits(g, gr, sc, spec[0][ch]["scf_l"])
                if g["cut_bits"]:
                    bits = bits[:len(bits) - g["cut_bits"]]
                ln.append(len(bits))
                w.bits.extend(bits)
        raw.append(w.bytes())
        lens.append(ln)
    rate = RATES[2]
    flen = 144 * (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                  192, 224, 256, 320)[bidx] * 1000 // rate
    side_len = 17 if nch == 1 else 32
    cap = flen - 4 - side_len
    # the reservoir is the unused TAIL of a frame's main region: pad
    # between a frame's own data and the next frame's spilled bytes so
    # reservoir[-main_data_begin:] addresses them
    regions = []
    for i in range(n):
        own = raw[i][spill if i > 0 else 0:]
        nxt = raw[i + 1][:spill] if spill and i + 1 < n else b""
        pad = cap - len(own) - len(nxt)
        assert pad >= 0, "frame overflow"
        regions.append(own + b"\x00" * pad + nxt)
    out = b""
    for i, spec in enumerate(frame_specs):
        w = BitW()
        w.w(spill if i > 0 else 0, 9)  # main_data_begin
        w.w(0, 5 if nch == 1 else 3)
        for ch in range(nch):
            for b in scfsi[ch]:
                w.w(b, 1)
        for gr in range(2):
            for ch in range(nch):
                g = spec[gr][ch]
                w.w(lens[i][gr * nch + ch], 12)
                w.w(g["big_values"], 9)
                w.w(g["global_gain"], 8)
                w.w(g["scalefac_compress"], 4)
                w.w(g["wsf"], 1)
                if g["wsf"]:
                    w.w(g["bt"], 2)
                    w.w(g["mixed"], 1)
                    w.w(g["table_select"][0], 5)
                    w.w(g["table_select"][1], 5)
                    for sb in g["subblock_gain"]:
                        w.w(sb, 3)
                else:
                    for t in g["table_select"]:
                        w.w(t, 5)
                    w.w(g["region0_count"], 4)
                    w.w(g["region1_count"], 3)
                w.w(g["preflag"], 1)
                w.w(g["scalefac_scale"], 1)
                w.w(g["count1table_select"], 1)
        side = w.bytes()
        assert len(side) == side_len
        body = regions[i]
        assert len(body) <= cap, "frame overflow"
        out += header(3, bidx, 2, mode, mode_ext) + side + body \
            + b"\x00" * (cap - len(body))
    return out


def _ref_xr(g):
    """Independent requantization (gain ladder + preflag + short-block
    reorder from huffman order to line-interleaved order)."""
    sp = g["spectrum"]
    xr = np.zeros(576)
    gg = g["global_gain"]
    mult = 0.5 * (g["scalefac_scale"] + 1)
    short = g["wsf"] and g["bt"] == 2
    nlong = 576 if not short else (36 if g["mixed"] else 0)
    sfb = 0
    for i in range(nlong):
        while sfb < 22 and i >= _BL[sfb + 1]:
            sfb += 1
        v = sp[i]
        if v:
            sc = g["scf_l"][sfb] + (_PRETAB[sfb] if g["preflag"] else 0)
            xr[i] = ((1 if v > 0 else -1) * abs(v) ** (4.0 / 3.0)
                     * 2.0 ** (0.25 * (gg - 210) - mult * sc))
    if short:
        s0 = next(s for s in range(13) if _BS[s] * 3 == nlong)
        src = nlong
        for s in range(s0, 13):
            width = _BS[s + 1] - _BS[s]
            for win in range(3):
                gain = 2.0 ** (
                    0.25 * (gg - 210 - 8 * g["subblock_gain"][win])
                    - mult * g["scf_s"][min(s, 12)][win])
                for i in range(width):
                    v = sp[src]
                    src += 1
                    if v:
                        xr[3 * (_BS[s] + i) + win] = (
                            (1 if v > 0 else -1)
                            * abs(v) ** (4.0 / 3.0) * gain)
    return xr


_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)


def _ref_granule_groups(g, xr, prev):
    """Independent alias butterflies, direct-form IMDCT (36 and 3x12),
    block windows, overlap-add, frequency inversion."""
    bt = g["bt"] if g["wsf"] else 0
    bands = xr.reshape(32, 18).copy()
    cs = [1 / np.sqrt(1 + c * c) for c in _CI]
    ca = [c / np.sqrt(1 + c * c) for c in _CI]
    if bt != 2 or g["mixed"]:
        limit = 1 if (bt == 2 and g["mixed"]) else 31
        for sb in range(limit):
            for i in range(8):
                a = bands[sb, 17 - i]
                b = bands[sb + 1, i]
                bands[sb, 17 - i] = a * cs[i] - b * ca[i]
                bands[sb + 1, i] = b * cs[i] + a * ca[i]
    out = np.zeros((18, 32))
    i36 = np.arange(36)
    for sb in range(32):
        sbt = 0 if (g["mixed"] and sb < 2) else bt
        X = bands[sb]
        if sbt == 2:
            z = np.zeros(36)
            for w in range(3):
                xw = np.array([
                    sum(X[3 * k + w]
                        * np.cos(np.pi / 24 * (2 * i + 1 + 6) * (2 * k + 1))
                        for k in range(6))
                    for i in range(12)
                ])
                z[6 + 6 * w:18 + 6 * w] += (
                    xw * np.sin(np.pi / 12 * (np.arange(12) + 0.5)))
            y = z
        else:
            y = np.array([
                sum(X[k]
                    * np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
                    for k in range(18))
                for i in range(36)
            ])
            if sbt == 0:
                y = y * np.sin(np.pi / 36 * (i36 + 0.5))
            elif sbt == 1:
                w_ = np.concatenate([
                    np.sin(np.pi / 36 * (np.arange(18) + 0.5)),
                    np.ones(6),
                    np.sin(np.pi / 12 * (np.arange(6) + 6.5)),
                    np.zeros(6)])
                y = y * w_
            else:
                w_ = np.concatenate([
                    np.zeros(6),
                    np.sin(np.pi / 12 * (np.arange(6) + 0.5)),
                    np.ones(6),
                    np.sin(np.pi / 36 * (np.arange(18, 36) + 0.5))])
                y = y * w_
        out[:, sb] = y[:18] + prev[sb]
        prev[sb] = y[18:]
        if sb & 1:
            out[1::2, sb] = -out[1::2, sb]
    return out


def _ref_frames(frame_specs, nch=1, ms=False):
    prev = np.zeros((nch, 32, 18))
    outs = []
    for spec in frame_specs:
        groups = np.zeros((36, nch, 32))
        for gr in range(2):
            xrs = [_ref_xr(spec[gr][ch]) for ch in range(nch)]
            if ms and any(x.any() for x in xrs):
                m, s_ = xrs
                xrs = [(m + s_) / np.sqrt(2.0), (m - s_) / np.sqrt(2.0)]
            for ch in range(nch):
                groups[18 * gr:18 * gr + 18, ch, :] = _ref_granule_groups(
                    spec[gr][ch], xrs[ch], prev[ch])
        outs.append(groups)
    return outs


def _with_l3_tables(fn):
    from whisper_spark.operators import mp3 as M

    def run():
        M.set_l3_tables(**_l3_test_tables())
        try:
            fn()
        finally:
            M.clear_l3_tables()
    return run


def _rand_long_granule(rng, with_linbits=True, count1_quads=6,
                       preflag=0, scale=0, gg=210, scf_hi=4):
    g = _g(global_gain=gg, scalefac_scale=scale, preflag=preflag,
           table_select=(1, 2 if with_linbits else 1, 1),
           region0_count=7, region1_count=7)
    sp = g["spectrum"]
    bv = 40  # 80 big-value lines: region0 (<36, t1) + region1 (t2)
    for i in range(36):
        sp[i] = int(rng.integers(-15, 16))
    for i in range(36, 80):
        sp[i] = int(rng.integers(-22, 23)) if with_linbits \
            else int(rng.integers(-15, 16))
    for q in range(count1_quads):
        for j in range(4):
            sp[80 + 4 * q + j] = int(rng.integers(-1, 2))
    g["big_values"] = bv
    g["scf_l"] = [int(rng.integers(0, scf_hi)) for _ in range(22)]
    return g


def test_l3_nonzero_long_blocks_round_trip():
    @_with_l3_tables
    def run():
        rng = np.random.default_rng(31)
        specs = [
            [[_rand_long_granule(rng)], [_rand_long_granule(
                rng, preflag=1, scale=1, gg=214)]],
            [[_rand_long_granule(rng, with_linbits=False)],
             [_rand_long_granule(rng, count1_quads=0)]],
        ]
        stream = _l3_encode_frames(specs)
        rate, nch, frames = decode_mp3_samples._decode_frames(stream)
        assert (rate, nch, len(frames)) == (32000, 1, 2)
        want = _ref_frames(specs)
        for got, ref in zip(frames, want):
            assert np.allclose(got, ref, rtol=1e-9, atol=1e-9)
        assert any(f.any() for f in frames)  # genuinely nonzero audio
    run()


def test_l3_short_mixed_blocks_round_trip():
    @_with_l3_tables
    def run():
        rng = np.random.default_rng(33)
        short = _g(wsf=1, bt=2, mixed=0, table_select=(1, 1),
                   subblock_gain=(0, 1, 2), global_gain=212)
        for i in range(60):
            short["spectrum"][i] = int(rng.integers(-15, 16))
        short["big_values"] = 30
        short["scf_s"] = [[int(rng.integers(0, 4)) for _ in range(3)]
                          for _ in range(13)]
        mixed = _g(wsf=1, bt=2, mixed=1, table_select=(1, 1),
                   subblock_gain=(1, 0, 0))
        for i in range(70):
            mixed["spectrum"][i] = int(rng.integers(-15, 16))
        mixed["big_values"] = 35
        mixed["scf_l"] = [int(rng.integers(0, 4))] * 8 + [0] * 14
        mixed["scf_s"] = [[int(rng.integers(0, 4)) for _ in range(3)]
                          for _ in range(13)]
        start = _g(wsf=1, bt=1, table_select=(1, 1))
        for i in range(40):
            start["spectrum"][i] = int(rng.integers(-15, 16))
        start["big_values"] = 20
        stop = _g(wsf=1, bt=3, table_select=(1, 1))
        for i in range(40):
            stop["spectrum"][i] = int(rng.integers(-15, 16))
        stop["big_values"] = 20
        specs = [[[start], [short]], [[mixed], [stop]]]
        stream = _l3_encode_frames(specs)
        rate, nch, frames = decode_mp3_samples._decode_frames(stream)
        want = _ref_frames(specs)
        for got, ref in zip(frames, want):
            assert np.allclose(got, ref, rtol=1e-9, atol=1e-9)
    run()


def test_l3_ms_stereo_round_trip():
    @_with_l3_tables
    def run():
        rng = np.random.default_rng(35)
        specs = [[
            [_rand_long_granule(rng), _rand_long_granule(rng)],
            [_rand_long_granule(rng), _rand_long_granule(rng)],
        ]]
        stream = _l3_encode_frames(specs, mode=1, mode_ext=2)
        rate, nch, frames = decode_mp3_samples._decode_frames(stream)
        assert nch == 2
        want = _ref_frames(specs, nch=2, ms=True)
        assert np.allclose(frames[0], want[0], rtol=1e-9, atol=1e-9)
        # plain stereo (mode 0): no matrix
        stream2 = _l3_encode_frames(specs, mode=0)
        _r, _n, frames2 = decode_mp3_samples._decode_frames(stream2)
        want2 = _ref_frames(specs, nch=2, ms=False)
        assert np.allclose(frames2[0], want2[0], rtol=1e-9, atol=1e-9)
    run()


def test_l3_scfsi_reuse():
    @_with_l3_tables
    def run():
        rng = np.random.default_rng(37)
        g0 = _rand_long_granule(rng)
        g1 = _rand_long_granule(rng)
        scfsi = [[1, 0, 1, 0]]
        # reused groups (bands 0-5, 11-15) must carry granule 0's
        # values; the encoder does not transmit them
        for sfb in list(range(0, 6)) + list(range(11, 16)):
            g1["scf_l"][sfb] = g0["scf_l"][sfb]
        specs = [[[g0], [g1]]]
        stream = _l3_encode_frames(specs, scfsi=scfsi)
        _r, _n, frames = decode_mp3_samples._decode_frames(stream)
        want = _ref_frames(specs)
        assert np.allclose(frames[0], want[0], rtol=1e-9, atol=1e-9)
    run()


def test_l3_bit_reservoir_spill():
    @_with_l3_tables
    def run():
        rng = np.random.default_rng(39)
        specs = [
            [[_rand_long_granule(rng)], [_rand_long_granule(rng)]],
            [[_rand_long_granule(rng)], [_rand_long_granule(rng)]],
            [[_rand_long_granule(rng)], [_rand_long_granule(rng)]],
        ]
        plain = _l3_encode_frames([list(map(list, f)) for f in specs])
        spilled = _l3_encode_frames(
            [list(map(list, f)) for f in specs], spill=40)
        _r, _n, f_plain = decode_mp3_samples._decode_frames(plain)
        _r, _n, f_spill = decode_mp3_samples._decode_frames(spilled)
        for a, b in zip(f_plain, f_spill):
            assert np.array_equal(a, b)  # reservoir is bit-transparent
        want = _ref_frames(specs)
        for got, ref in zip(f_spill, want):
            assert np.allclose(got, ref, rtol=1e-9, atol=1e-9)
    run()


def test_l3_count1_overshoot_discarded():
    @_with_l3_tables
    def run():
        rng = np.random.default_rng(41)
        g = _rand_long_granule(rng, count1_quads=5)
        g["cut_bits"] = 3  # slices into the last quad's code/signs
        expect = _g(**{**g, "spectrum": list(g["spectrum"])})
        # the overrun quad is discarded: its 4 lines decode to zero
        last_q = 80 + 4 * 4
        for j in range(4):
            expect["spectrum"][last_q + j] = 0
        specs = [[[g], [_g()]]]
        stream = _l3_encode_frames(specs)
        _r, _n, frames = decode_mp3_samples._decode_frames(stream)
        want = _ref_frames([[[expect], [_g()]]])
        assert np.allclose(frames[0], want[0], rtol=1e-9, atol=1e-9)
    run()


def test_l3_nonzero_gates():
    from whisper_spark.operators import mp3 as M

    rng = np.random.default_rng(43)
    specs = [[[_rand_long_granule(rng)], [_g()]]]
    stream = _l3_encode_frames([list(map(list, f)) for f in specs])
    # without tables: nonzero spectra stay gated (silence still works)
    assert decode_mp3_samples(stream) is None
    M.set_l3_tables(**_l3_test_tables())
    try:
        got = decode_mp3_samples(stream)
        assert got is not None and got["s_sq_sum"] > 0
        # short-block intensity decodes too (round-10: per-window
        # zero parts are real; value checks in the round-trip suites)
        sh = _g(wsf=1, bt=2, table_select=(1, 1))
        for i in range(12):
            sh["spectrum"][i] = 3
        sh["big_values"] = 6
        st = [[
            [sh, {**sh, "spectrum": list(sh["spectrum"])}],
            [_g(), _g()],
        ]]
        iis = _l3_encode_frames(
            [list(map(list, f)) for f in st], mode=1, mode_ext=1)
        assert decode_mp3_samples(iis) is not None
        ok = _l3_encode_frames(
            [list(map(list, f)) for f in st], mode=1, mode_ext=2)
        assert decode_mp3_samples(ok) is not None
    finally:
        M.clear_l3_tables()


def test_l3_intensity_stereo_round_trip():
    """Long-block intensity stereo: bands at/above the right channel's
    coded region are positioned by is_pos = right-granule scalefactor
    (ratio tan(pos*pi/12)); is_pos 7 falls back to m/s when enabled;
    bands below the bound stay plain or m/s per mode_ext."""
    from whisper_spark.operators import mp3 as M

    M.set_l3_tables(**_l3_test_tables())
    try:
        rng = np.random.default_rng(47)
        for mode_ext in (1, 3):
            left = _rand_long_granule(rng, count1_quads=0)
            # put energy into sfb21 (lines >= 394) so the band-21
            # is_pos convention is actually observable: extend the
            # big-value region with zero pairs up to line 400
            left["big_values"] = 201
            left["spectrum"][399] = 6
            left["spectrum"][401] = -4
            left["scf_l"][21] = 0  # band 21 has no transmitted scf
            right = _g(table_select=(1, 1, 1), region0_count=7,
                       region1_count=7)
            # right channel codes only the first 24 lines (bound = 24,
            # a long-band boundary in the test tables)
            for i in range(24):
                right["spectrum"][i] = int(rng.integers(-15, 16))
            right["big_values"] = 12
            right["scf_l"] = [int(rng.integers(0, 7)) for _ in range(22)]
            right["scf_l"][8] = 7   # is_pos 7: m/s-or-pass band
            specs = [[[left, right], [_g(), _g()]]]
            stream = _l3_encode_frames(
                [list(map(list, f)) for f in specs],
                mode=1, mode_ext=mode_ext)
            _r, nch, frames = decode_mp3_samples._decode_frames(stream)
            assert nch == 2
            # independent model
            xl, xr_ = _ref_xr(left), _ref_xr(right)
            bound = 24
            ms_on = bool(mode_ext & 2)
            ol, orr = xl.copy(), xr_.copy()
            for sfb in range(22):
                lo, hi = _BL[sfb], _BL[sfb + 1]
                sl = slice(lo, hi)
                if lo >= bound:
                    # band 21 reuses band 20's is_pos (no transmitted
                    # scalefactor) — the reference-decoder convention
                    pos = right["scf_l"][min(sfb, 20)]
                    if pos == 7:
                        if ms_on:
                            m, s_ = xl[sl].copy(), xr_[sl].copy()
                            ol[sl] = (m + s_) / np.sqrt(2.0)
                            orr[sl] = (m - s_) / np.sqrt(2.0)
                        continue
                    ratio = np.tan(pos * np.pi / 12.0)
                    ol[sl] = xl[sl] * (ratio / (1.0 + ratio))
                    orr[sl] = xl[sl] * (1.0 / (1.0 + ratio))
                elif ms_on:
                    m, s_ = xl[sl].copy(), xr_[sl].copy()
                    ol[sl] = (m + s_) / np.sqrt(2.0)
                    orr[sl] = (m - s_) / np.sqrt(2.0)
            prev = np.zeros((2, 32, 18))
            want = np.zeros((36, 2, 32))
            want[0:18, 0, :] = _ref_granule_groups(left, ol, prev[0])
            want[0:18, 1, :] = _ref_granule_groups(right, orr, prev[1])
            want[18:36, 0, :] = _ref_granule_groups(_g(), np.zeros(576),
                                                    prev[0])
            want[18:36, 1, :] = _ref_granule_groups(_g(), np.zeros(576),
                                                    prev[1])
            assert np.allclose(frames[0], want, rtol=1e-9, atol=1e-9), \
                mode_ext
    finally:
        M.clear_l3_tables()


def _short_src(s, win, i, mixed):
    """Huffman-order index of short-band line (sfb s, window win,
    line i): sfb-major, window-major within the sfb, after any mixed
    long region."""
    nlong = 36 if mixed else 0
    s0 = 3 if mixed else 0
    off = nlong + sum(3 * (_BS[t + 1] - _BS[t]) for t in range(s0, s))
    return off + win * (_BS[s + 1] - _BS[s]) + i


def _ref_is_short(left_g, right_g, mode_ext):
    """Independent intensity model for SHORT/mixed blocks: per-window
    zero-part bounds by top-down value scan of the reordered right
    channel, is_pos from the right granule's short scalefactors (band
    12 reuses band 11's), is_pos-7 m/s fallback, mixed blocks
    extending into the long bands only when every short window of the
    right channel is silent."""
    xl, xr_ = _ref_xr(left_g), _ref_xr(right_g)
    ms_on = bool(mode_ext & 2)
    ol, orr = xl.copy(), xr_.copy()
    mixed = bool(left_g["mixed"])
    s_min = 3 if mixed else 0
    r2 = np.sqrt(2.0)

    def ms(sl):
        if ms_on:
            m, s_ = xl[sl].copy(), xr_[sl].copy()
            ol[sl] = (m + s_) / r2
            orr[sl] = (m - s_) / r2

    def couple(sl, pos):
        if pos == 7:
            ms(sl)
            return
        ratio = np.tan(pos * np.pi / 12.0)
        ol[sl] = xl[sl] * (ratio / (1.0 + ratio))
        orr[sl] = xl[sl] * (1.0 / (1.0 + ratio))

    bounds = []
    for w in range(3):
        b = s_min
        for s in range(12, s_min - 1, -1):
            sl = slice(3 * _BS[s] + w, 3 * _BS[s + 1] + w, 3)
            if np.any(xr_[sl]):
                b = s + 1
                break
        bounds.append(b)
    for w in range(3):
        for s in range(s_min, 13):
            sl = slice(3 * _BS[s] + w, 3 * _BS[s + 1] + w, 3)
            if s >= bounds[w]:
                couple(sl, right_g["scf_s"][min(s, 11)][w])
            else:
                ms(sl)
    if mixed:
        if all(b == s_min for b in bounds):
            bound_l = 0
            for sfb in range(7, -1, -1):
                if np.any(xr_[_BL[sfb]:_BL[sfb + 1]]):
                    bound_l = sfb + 1
                    break
            for sfb in range(8):
                sl = slice(_BL[sfb], _BL[sfb + 1])
                if sfb >= bound_l:
                    couple(sl, right_g["scf_l"][sfb])
                else:
                    ms(sl)
        else:
            ms(slice(0, 36))
    return ol, orr


def _decode_one_stereo_frame(specs, mode_ext):
    stream = _l3_encode_frames(
        [list(map(list, f)) for f in specs], mode=1, mode_ext=mode_ext)
    _r, nch, frames = decode_mp3_samples._decode_frames(stream)
    assert nch == 2
    return frames


def _expect_frame(g0_chs, ol, orr):
    prev = np.zeros((2, 32, 18))
    want = np.zeros((36, 2, 32))
    want[0:18, 0, :] = _ref_granule_groups(g0_chs[0], ol, prev[0])
    want[0:18, 1, :] = _ref_granule_groups(g0_chs[1], orr, prev[1])
    want[18:36, 0, :] = _ref_granule_groups(_g(), np.zeros(576), prev[0])
    want[18:36, 1, :] = _ref_granule_groups(_g(), np.zeros(576), prev[1])
    return want


@_with_l3_tables
def test_l3_short_block_intensity_round_trip():
    """SHORT-block intensity stereo (round-10, closing mp3.py's former
    short-block gate): window-DEPENDENT zero parts — the right channel
    codes sfbs 0-3 in every window but sfb 4 only in window 1, so the
    per-window bounds differ (4, 5, 4) — per-window is_pos from the
    right granule's short scalefactors incl. an is_pos-7 m/s band and
    the band-12-reuses-band-11 convention, with subblock gains in
    play on both channels."""
    rng = np.random.default_rng(53)
    for mode_ext in (1, 3):
        left = _g(wsf=1, bt=2, table_select=(1, 1),
                  subblock_gain=(0, 1, 0), global_gain=214)
        # energy everywhere, incl. sfb 12 (pins the band-12 is_pos)
        left["spectrum"] = [int(v) if v else 1 for v in
                            rng.integers(-9, 10, 576)]
        left["big_values"] = 288
        left["scf_s"] = [[int(rng.integers(0, 4)) for _ in range(3)]
                         for _ in range(13)]
        left["scf_s"][12] = [0, 0, 0]  # untransmitted
        right = _g(wsf=1, bt=2, table_select=(1, 1),
                   subblock_gain=(1, 0, 0))
        for s in range(4):
            for w in range(3):
                for i in range(_BS[s + 1] - _BS[s]):
                    right["spectrum"][_short_src(s, w, i, 0)] = int(
                        rng.integers(1, 9)) * (-1 if (s + w + i) % 2
                                               else 1)
        right["spectrum"][_short_src(4, 1, 2, 0)] = 5
        last = _short_src(4, 1, _BS[5] - _BS[4] - 1, 0)
        right["big_values"] = (last + 2) // 2
        right["scf_s"] = [[int(rng.integers(0, 7)) for _ in range(3)]
                          for _ in range(13)]
        right["scf_s"][6][0] = 7   # m/s-fallback band, window 0
        right["scf_s"][12] = [0, 0, 0]
        specs = [[[left, right], [_g(), _g()]]]
        frames = _decode_one_stereo_frame(specs, mode_ext)
        ol, orr = _ref_is_short(left, right, mode_ext)
        want = _expect_frame([left, right], ol, orr)
        assert np.allclose(frames[0], want, rtol=1e-9, atol=1e-9), \
            mode_ext


@_with_l3_tables
def test_l3_mixed_block_intensity_round_trip():
    """MIXED-block intensity: (a) the right channel silent in the
    whole short region -> the zero part extends into the long bands
    (long-band is_pos from the right scf_l, bands below the long
    bound m/s); (b) one nonzero short sample -> the long region stays
    plain/m-s and only the short windows couple."""
    rng = np.random.default_rng(59)
    for mode_ext in (1, 3):
        for short_leak in (False, True):
            left = _g(wsf=1, bt=2, mixed=1, table_select=(1, 1),
                      global_gain=212)
            left["spectrum"] = [int(v) if v else -1 for v in
                                rng.integers(-9, 10, 576)]
            left["big_values"] = 288
            left["scf_l"] = [int(rng.integers(0, 5))
                             for _ in range(22)]
            left["scf_s"] = [[int(rng.integers(0, 4))
                              for _ in range(3)] for _ in range(13)]
            left["scf_s"][12] = [0, 0, 0]
            right = _g(wsf=1, bt=2, mixed=1, table_select=(1, 1))
            # long region: sfbs 0..2 coded (lines 0..11)
            for i in range(12):
                right["spectrum"][i] = int(rng.integers(1, 9)) * (
                    -1 if i % 3 else 1)
            right["big_values"] = 6
            if short_leak:
                # one |v|==1 line in short sfb 5, window 2, via a
                # count1 quad (positions after big_values stay quads)
                pos = _short_src(5, 2, 1, 1)
                pos -= pos % 4 - 1  # keep inside one aligned quad
                right["spectrum"][pos] = 1
            right["scf_l"] = [int(rng.integers(0, 7))
                              for _ in range(22)]
            right["scf_l"][5] = 7  # long-band m/s fallback
            right["scf_s"] = [[int(rng.integers(0, 7))
                               for _ in range(3)] for _ in range(13)]
            right["scf_s"][12] = [0, 0, 0]
            specs = [[[left, right], [_g(), _g()]]]
            frames = _decode_one_stereo_frame(specs, mode_ext)
            ol, orr = _ref_is_short(left, right, mode_ext)
            want = _expect_frame([left, right], ol, orr)
            assert np.allclose(frames[0], want, rtol=1e-9,
                               atol=1e-9), (mode_ext, short_leak)


@_with_l3_tables
def test_l3_start_stop_window_intensity_round_trip():
    """block_type 1/3 (start/stop windows) are LONG layouts: intensity
    uses the long-band rule with the bound at the right channel's
    huffman end (these were swept into the short-block gate before
    round 10)."""
    rng = np.random.default_rng(61)
    for bt in (1, 3):
        left = _g(wsf=1, bt=bt, table_select=(1, 1))
        left["spectrum"] = [int(v) if v else 2 for v in
                            rng.integers(-9, 10, 576)]
        left["big_values"] = 288
        left["scf_l"] = [int(rng.integers(0, 5)) for _ in range(22)]
        left["scf_l"][21] = 0   # band 21 has no transmitted scf
        right = _g(wsf=1, bt=bt, table_select=(1, 1))
        for i in range(24):
            right["spectrum"][i] = int(rng.integers(1, 9))
        right["big_values"] = 12
        right["scf_l"] = [int(rng.integers(0, 7)) for _ in range(22)]
        right["scf_l"][21] = 0  # band 21 has no transmitted scf
        specs = [[[left, right], [_g(), _g()]]]
        frames = _decode_one_stereo_frame(specs, mode_ext=3)
        # long model, bound = 24 (the right channel's huffman end)
        xl, xr_ = _ref_xr(left), _ref_xr(right)
        ol, orr = xl.copy(), xr_.copy()
        for sfb in range(22):
            lo, hi = _BL[sfb], _BL[sfb + 1]
            sl = slice(lo, hi)
            pos = right["scf_l"][min(sfb, 20)]
            if lo >= 24 and pos != 7:
                ratio = np.tan(pos * np.pi / 12.0)
                ol[sl] = xl[sl] * (ratio / (1.0 + ratio))
                orr[sl] = xl[sl] * (1.0 / (1.0 + ratio))
            else:
                m, s_ = xl[sl].copy(), xr_[sl].copy()
                ol[sl] = (m + s_) / np.sqrt(2.0)
                orr[sl] = (m - s_) / np.sqrt(2.0)
        want = _expect_frame([left, right], ol, orr)
        assert np.allclose(frames[0], want, rtol=1e-9, atol=1e-9), bt


def _mpeg_crc16(hdr_tail, body, nbits):
    """Independent mirror of the ISO CRC-16 (poly 0x8005, init 0xFFFF,
    MSB-first over header tail + protected bits)."""
    c = 0xFFFF
    bits = []
    for byte in hdr_tail:
        bits.extend((byte >> k) & 1 for k in range(7, -1, -1))
    for i in range(nbits):
        bits.append((body[i >> 3] >> (7 - (i & 7))) & 1)
    for bit in bits:
        hi = (c >> 15) & 1
        c = (c << 1) & 0xFFFF
        if hi ^ bit:
            c ^= 0x8005
    return c


def test_crc_protected_frames():
    """protection_bit 0: the decoder must VERIFY the CRC over the
    layer's protected region (Layer I: allocations; Layer III: side
    info) — a valid CRC decodes identically to the unprotected frame,
    a corrupted CRC or a corrupted protected bit rejects."""
    # Layer I, mono: protected region = 32 x 4 allocation bits
    alloc = [[2] * 32]
    scf = [[5] * 32]
    codes = [[[3] * 32] for _ in range(12)]
    plain = l1_frame(alloc, scf, codes, bidx=14, ridx=2)
    body = plain[4:]
    want = decode_mp3_samples(plain)
    crc = _mpeg_crc16(plain[2:4], body, 32 * 4)
    hdr_prot = bytes([plain[0], plain[1] & ~0x01])  # protection on
    protected = hdr_prot + plain[2:4] + crc.to_bytes(2, "big") + body
    # pad to the protected frame length contract: same frame size
    protected = protected[:len(plain)]
    got = decode_mp3_samples(protected)
    assert got is not None and got["n_samples"] == want["n_samples"]
    assert got["s_sum"] == want["s_sum"]
    bad = bytearray(protected)
    bad[4] ^= 0xFF  # CRC bytes wrong
    assert decode_mp3_samples(bytes(bad)) is None
    bad2 = bytearray(protected)
    bad2[6] ^= 0x10  # a protected allocation bit flips
    assert decode_mp3_samples(bytes(bad2)) is None

    # Layer III silence: protected region = 17 side-info bytes
    l3 = l3_silence_frame()
    crc3 = _mpeg_crc16(l3[2:4], l3[4:], 17 * 8)
    prot3 = (bytes([l3[0], l3[1] & ~0x01]) + l3[2:4]
             + crc3.to_bytes(2, "big") + l3[4:])[:len(l3)]
    got3 = decode_mp3_samples(prot3)
    assert got3 is not None and got3["n_samples"] == 1152
    bad3 = bytearray(prot3)
    bad3[5] ^= 0x01
    assert decode_mp3_samples(bytes(bad3)) is None


def test_l3_intensity_illegal_is_pos_rejected():
    """is_pos is 0..7 by spec; a slen1=4 scalefactor of 9 inside the
    intensity region must reject the stream (round-7 review: pos=9
    makes 1+tan(pos*pi/12) ~ -2e-16 and amplifies by ~1e15)."""
    from whisper_spark.operators import mp3 as M

    M.set_l3_tables(**_l3_test_tables())
    try:
        rng = np.random.default_rng(53)
        left = _rand_long_granule(rng, count1_quads=0)
        right = _g(scalefac_compress=14,  # slen (4, 2): 4-bit low bands
                   table_select=(1, 1, 1))
        right["spectrum"][0] = 3
        right["spectrum"][1] = -2
        right["big_values"] = 2  # coded region ends at line 4
        right["scf_l"] = [0] * 22
        right["scf_l"][5] = 9    # intensity band, illegal position
        specs = [[[left, right], [_g(), _g()]]]
        stream = _l3_encode_frames(
            [list(map(list, f)) for f in specs], mode=1, mode_ext=1)
        assert decode_mp3_samples(stream) is None
        right["scf_l"][5] = 6    # legal position: decodes
        specs = [[[left, right], [_g(), _g()]]]
        stream = _l3_encode_frames(
            [list(map(list, f)) for f in specs], mode=1, mode_ext=1)
        assert decode_mp3_samples(stream) is not None
    finally:
        M.clear_l3_tables()


def test_l3_oversized_injected_table_falls_back():
    """Injected Huffman tables with codewords past the 56-bit LUT
    window must route through the original per-bit walk and still
    decode exactly — the LUT build marks them None, not an error."""
    from whisper_spark.operators.mp3 import (
        _make_mp3_sample_decoder, clear_l3_tables, set_l3_tables)

    tabs = _l3_test_tables()
    # sparse giant-codeword table: pair (1, 0) at 60 bits (forces the
    # per-bit fallback for the whole table), everything else 9 bits so
    # no entry lands in the first-level window either
    big = {(60, 1): (1, 0)}
    code = 2
    for x in range(16):
        for y in range(16):
            if (x, y) == (1, 0):
                continue
            big[(9, code)] = (x, y)
            code += 1
    tabs["huffman"] = {1: (big, 0), 2: (dict(big), 3)}
    set_l3_tables(**tabs)
    try:
        dec = _make_mp3_sample_decoder()
        sp = [0] * 576
        sp[0], sp[1] = 1, 0     # encodes as the 60-bit codeword
        sp[2], sp[3] = -2, 3
        g = _g(spectrum=sp, big_values=2, table_select=(1, 1, 1),
               scalefac_compress=0)
        # the frame assembler encodes with whatever _l3_test_tables()
        # returns — point it at the injected tables
        frames = [[[g], [_g()]]]
        orig = _l3_test_tables
        try:
            globals()["_l3_test_tables"] = lambda: tabs
            payload = _l3_encode_frames(frames, mode=3, bidx=14)
        finally:
            globals()["_l3_test_tables"] = orig
        got = dec(payload * 2)
        assert got is not None and got["n_samples"] == 2 * 1152
        assert got["s_sq_sum"] > 0  # the spectrum actually decoded
    finally:
        clear_l3_tables()
