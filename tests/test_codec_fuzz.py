"""Robustness fuzzing for the stdlib codec decoders: random byte
mutations, truncations, and splices of VALID payloads must NEVER
escape a decoder — every input returns a stats dict or None (the
NULL-stats contract the Spark decode stages rely on: a poisoned
payload in a 100 TB corpus must not kill an executor task).

This is the crash-path complement to the exactness suites
(test_operators.py / test_mp3_decoder.py verify correct payloads
decode to exactly the right stats; this file verifies arbitrary
corruption cannot raise).  ``derandomize=True`` everywhere, matching
the repo's fuzzing discipline: the verdict must not depend on the
draw.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from whisper_spark.operators.multimodal import (
    decode_flac_samples,
    decode_jpeg_pixels,
    decode_mjpeg_frames,
    decode_wav_samples,
    parse_media_header,
)
from whisper_spark.operators.mp3 import decode_mp3_samples

# ------------------------------------------------------------------ #
# seed payloads: one small VALID instance per codec (built with the
# same independent constructions the exactness suites verify)
# ------------------------------------------------------------------ #


def _seed_jpeg() -> bytes:
    def seg(m, payload):
        return b"\xff" + bytes([m]) + struct.pack(">H", len(payload) + 2) \
            + payload

    prefix = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12)
              + bytes(range(12)))
        + seg(0xC4, bytes([0x10]) + bytes([0, 0, 0, 1] + [0] * 12)
              + bytes([0x00]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    dc = 184
    return prefix + bytes([0x80 | dc >> 4, (dc & 15) << 4,
                           0x80 | 152 >> 4, (152 & 15) << 4]) + b"\xff\xd9"


def _seed_jpeg_progressive() -> bytes:
    def seg(m, payload):
        return b"\xff" + bytes([m]) + struct.pack(">H", len(payload) + 2) \
            + payload

    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12)
              + bytes(range(12)))
        + seg(0xC4, bytes([0x10]) + bytes([0, 0, 0, 2] + [0] * 12)
              + bytes([0x00, 0x10]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        + bytes([0x80 | 184 >> 4, ((184 & 15) << 4) | 8, 152])
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + b"\xff\x00"
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + b"\x00"
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + b"\x17"
        + b"\xff\xd9"
    )


def _seed_wav() -> bytes:
    data = b"".join(struct.pack("<h", (37 * k) % 2000 - 1000)
                    for k in range(200))
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                    16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def _seed_flac() -> bytes:
    def crc8(d):
        c = 0
        for b in d:
            c ^= b
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        return c

    def crc16(d):
        c = 0
        for b in d:
            c ^= b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                    else (c << 1) & 0xFFFF
        return c

    n = 60
    h7 = bytes([255, 248, 112, 8, 0, (n - 1) // 256, (n - 1) % 256])
    samples = [((11 * 7 + k * 3) % 4096 - 2048) & 0xFFFF for k in range(n)]
    fb = h7 + bytes([crc8(h7), 2]) \
        + b"".join(struct.pack(">H", x) for x in samples)
    si = (8000 << 44) | (15 << 36) | n
    return (b"fLaC" + bytes.fromhex("80000022")
            + bytes.fromhex("0010ffff000000000000")
            + struct.pack(">Q", si) + b"\x00" * 16
            + fb + struct.pack(">H", crc16(fb)))


def _seed_mp3() -> bytes:
    # Layer I frame with exact-zero codes + a Layer III silence frame
    # stream (two separate seeds)
    alloc = bytearray(16)
    alloc[2] = 0x22
    alloc[3] = 0x22
    l1 = (bytes([0xFF, 0xFF, 0x18, 0xC0]) + bytes(alloc)
          + bytes([0x04, 0x10, 0x41]) + bytes.fromhex("6db6db" * 6)
          + b"\x00" * 7)
    return l1 * 2


def _seed_mp3_l3() -> bytes:
    return (b"\xff\xfb\x38\xc0" + b"\x00" * 212) * 2


def _seed_avi() -> bytes:
    jp = _seed_jpeg()

    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<10I", 40000, 0, 0, 0, 2, 0, 1, 0, 16, 8) \
        + b"\x00" * 16
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, 2, 0, 0, 0)
            + struct.pack("<4H", 0, 0, 16, 8))
    strf = struct.pack("<IiiHH4sIiiII", 40, 16, 8, 1, 24, b"MJPG",
                       0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", chunk(b"00dc", jp) + chunk(b"00dc", jp))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


SEEDS = {
    "jpeg": _seed_jpeg(),
    "jpeg_prog": _seed_jpeg_progressive(),
    "wav": _seed_wav(),
    "flac": _seed_flac(),
    "mp3_l1": _seed_mp3(),
    "mp3_l3": _seed_mp3_l3(),
    "avi": _seed_avi(),
}
DECODERS = {
    "jpeg": decode_jpeg_pixels,
    "jpeg_prog": decode_jpeg_pixels,
    "wav": decode_wav_samples,
    "flac": decode_flac_samples,
    "mp3_l1": decode_mp3_samples,
    "mp3_l3": decode_mp3_samples,
    "avi": decode_mjpeg_frames,
}


def test_seeds_are_valid():
    """The fuzz baselines decode successfully BEFORE mutation — the
    suite mutates live payloads, not already-rejected ones."""
    for name, payload in SEEDS.items():
        assert DECODERS[name](payload) is not None, name


def _check(name, payload):
    out = DECODERS[name](payload)
    assert out is None or isinstance(out, dict)
    # the header parser must be equally unkillable
    hp = parse_media_header(payload)
    assert hp is None or isinstance(hp, dict)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    name=st.sampled_from(sorted(SEEDS)),
    data=st.data(),
)
def test_byte_mutations_never_raise(name, data):
    p = bytearray(SEEDS[name])
    n_mut = data.draw(st.integers(1, 8))
    for _ in range(n_mut):
        i = data.draw(st.integers(0, len(p) - 1))
        p[i] = data.draw(st.integers(0, 255))
    _check(name, bytes(p))


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    name=st.sampled_from(sorted(SEEDS)),
    cut=st.integers(0, 400),
)
def test_truncations_never_raise(name, cut):
    p = SEEDS[name]
    _check(name, p[:max(0, len(p) - cut)])


@settings(max_examples=80, deadline=None, derandomize=True)
@given(
    a=st.sampled_from(sorted(SEEDS)),
    b=st.sampled_from(sorted(SEEDS)),
    split=st.integers(1, 200),
)
def test_splices_never_raise(a, b, split):
    pa, pb = SEEDS[a], SEEDS[b]
    sa = min(split, len(pa) - 1)
    frank = pa[:sa] + pb[min(split, len(pb) - 1):]
    _check(a, frank)
    _check(b, frank)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(data=st.data())
def test_random_garbage_never_raises(data):
    length = data.draw(st.integers(0, 300))
    blob = bytes(data.draw(st.integers(0, 255)) for _ in range(length))
    for name in DECODERS:
        _check(name, blob)


def test_adversarial_structures_never_raise():
    """Hand-picked nasties: pathological declared sizes, recursion
    bombs, and giant-allocation headers must all reject cheaply."""
    # AVI LIST that declares itself as its own parent size (recursion
    # depth is bounded by the byte ranges shrinking)
    evil = b"RIFF" + struct.pack("<I", 0xFFFFFFF0) + b"AVI " \
        + b"LIST" + struct.pack("<I", 0xFFFFFFF0) + b"hdrl"
    assert decode_mjpeg_frames(evil) is None
    # WAV declaring a data chunk far beyond the payload
    wav = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"data" + struct.pack("<I", 0x7FFFFFFF))
    assert decode_wav_samples(wav) is None
    # JPEG SOF declaring a 65535x65535 frame with no data: the
    # entropy decode must fail before materializing the image
    def seg(m, payload):
        return b"\xff" + bytes([m]) + struct.pack(">H", len(payload) + 2) \
            + payload
    # (the decoder rejects on the declared 64M-pixel cap, BEFORE any
    # coefficient-array allocation)
    huge = (b"\xff\xd8"
            + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
            + seg(0xC0, struct.pack(">BHHB", 8, 65535, 65535, 1)
                  + bytes([1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12)
                  + bytes(range(12)))
            + seg(0xC4, bytes([0x10]) + bytes([0, 0, 0, 1] + [0] * 12)
                  + bytes([0x00]))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + b"\x00\x00" + b"\xff\xd9")
    assert decode_jpeg_pixels(huge) is None
    # MP3 frame claiming a bitrate/size combination that overruns
    assert decode_mp3_samples(b"\xff\xff\xe0\xc0" + b"\x00" * 10) is None
    # FLAC with a poisoned STREAMINFO length
    assert decode_flac_samples(b"fLaC" + b"\x80\xff\xff\xff") is None


# ------------------------------------------------------------------ #
# round-10 coverage: the image decoders (PNG/GIF/BMP/TIFF/PNM) and the
# new audio containers (AIFF/au, plus WAV's G.711 leg) enter the same
# mutation/truncation/splice harness, seeded by the independent
# builders the exactness suites already verify
# ------------------------------------------------------------------ #

import random as _random

from tests.test_operators import (  # noqa: E402
    _aiff,
    _bmp,
    _gif,
    _png,
    _tiff,
)
from whisper_spark.operators.multimodal import (  # noqa: E402
    decode_aiff_samples,
    decode_au_samples,
    decode_bmp_pixels,
    decode_gif_pixels,
    decode_png_pixels,
    decode_pnm_pixels,
    decode_tiff_pixels,
)


def _mk_seeds2():
    rng = _random.Random(7)
    png = _png(5, 4, [[rng.randrange(256) for _ in range(15)]
                      for _ in range(4)], channels=3,
               filters=[0, 1, 2, 4])
    gif = _gif(6, 5, [rng.randrange(4) for _ in range(30)], 2, 4)
    bmp = _bmp(5, 3, [[rng.randrange(256) for _ in range(15)]
                      for _ in range(3)])
    data = bytes(rng.randrange(256) for _ in range(5 * 4 * 3))
    tiff_lzw = _tiff(5, 4, data, 3, 5, rng)
    tiff_pb = _tiff(5, 4, data, 3, 32773, rng, endian=">",
                    rows_per_strip=2)
    pnm = b"P6\n5 4\n255\n" + data
    aiff = _aiff(2, 44100, 16, [rng.randint(-1000, 1000)
                                for _ in range(24)])
    au = (b".snd" + struct.pack(">IIIII", 24, 32, 1, 8000, 1)
          + bytes(range(32)))
    wav_ulaw = None
    from tests.test_operators import _wav_raw
    wav_ulaw = _wav_raw(7, 1, 8000, 8, bytes(range(64)))
    return {
        "png": png, "gif": gif, "bmp": bmp, "tiff_lzw": tiff_lzw,
        "tiff_pb": tiff_pb, "pnm": pnm, "aiff": aiff, "au": au,
        "wav_ulaw": wav_ulaw,
    }


SEEDS2 = _mk_seeds2()
DECODERS2 = {
    "png": decode_png_pixels, "gif": decode_gif_pixels,
    "bmp": decode_bmp_pixels, "tiff_lzw": decode_tiff_pixels,
    "tiff_pb": decode_tiff_pixels, "pnm": decode_pnm_pixels,
    "aiff": decode_aiff_samples, "au": decode_au_samples,
    "wav_ulaw": decode_wav_samples,
}


def test_seeds2_are_valid():
    for name, payload in SEEDS2.items():
        assert DECODERS2[name](payload) is not None, name


def _check2(name, payload):
    out = DECODERS2[name](payload)
    assert out is None or isinstance(out, dict)
    hp = parse_media_header(payload)
    assert hp is None or isinstance(hp, dict)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(name=st.sampled_from(sorted(SEEDS2)), data=st.data())
def test_byte_mutations_never_raise_2(name, data):
    p = bytearray(SEEDS2[name])
    n_mut = data.draw(st.integers(1, 8))
    for _ in range(n_mut):
        i = data.draw(st.integers(0, len(p) - 1))
        p[i] = data.draw(st.integers(0, 255))
    _check2(name, bytes(p))


@settings(max_examples=90, deadline=None, derandomize=True)
@given(name=st.sampled_from(sorted(SEEDS2)), cut=st.integers(0, 300))
def test_truncations_never_raise_2(name, cut):
    p = SEEDS2[name]
    _check2(name, p[:max(0, len(p) - cut)])


@settings(max_examples=90, deadline=None, derandomize=True)
@given(
    a=st.sampled_from(sorted(SEEDS2)),
    b=st.sampled_from(sorted(SEEDS2)),
    split=st.integers(1, 150),
)
def test_splices_never_raise_2(a, b, split):
    pa, pb = SEEDS2[a], SEEDS2[b]
    sa = min(split, len(pa) - 1)
    frank = pa[:sa] + pb[min(split, len(pb) - 1):]
    _check2(a, frank)
    _check2(b, frank)
