"""Ogg Vorbis audio sample decode — stdlib + numpy only.

Closes the Ogg-payload leg of the sample-decode integration point
(``multimodal.decode_media``'s historical ``decoder='raise'`` marker;
the reference engine — graphite-project/whisper — has no media surface
at all, this belongs to the beyond-reference training-data-pipeline
scope).  Vorbis is the one mainstream perceptual codec a
no-memory-transcription policy can decode COMPLETELY: every Huffman
codebook, VQ lattice, floor configuration and residue partitioning
ships *inside the stream's setup header* (Vorbis I specification,
Xiph.Org, public), so — unlike MP3's ISO Annex-B tables — there is
nothing to transcribe.  What is implemented, end to end:

* **Ogg layer**: page walk with CRC-32 verification (0x04C11DB7,
  table generated from the polynomial at import), serial-number
  filtering (multiplexed/chained streams), continued-packet assembly
  from lacing values, end-trim from the final page's granule position;
* **setup header**: codebooks (ordered/unordered/sparse codeword
  lengths, canonical Huffman assignment via an explicit binary buddy
  allocator — each entry takes the lowest free leaf of its length —
  VQ lookup types 1 and 2 with ``float32_unpack`` min/delta and
  sequence flag), floor type 1 configurations (partition classes,
  subclass books, X lists), residue types 0/1/2 (cascade bitmaps,
  per-stage books), channel mappings (coupling steps, mux, submaps)
  and modes;
* **audio packets**: mode/window flag parse, floor1 curve decode
  (neighbor prediction, ``render_point``, the integer ``render_line``
  Bresenham walk, step2 flags), residue decode in all three formats
  (8-pass cascade, classword groups), square-polar inverse coupling,
  floor x residue dot product, IMDCT via an 8M-point real-FFT
  embedding of DCT-IV (verified against the direct cosine matrix in
  tests/test_vorbis_decoder.py), per-blocksize Vorbis windows with
  long/short transition slopes, center overlap-add and the
  first-frame discard rule.

One DESIGNED substitute, policy-documented (same class as mp3.py's
windows): the 256-entry floor1 inverse-dB amplitude table.  The spec
prints it as literal float32 data; this repo refuses to transcribe
printed numeric tables from memory, but the table follows the closed
form ``table[i] = 10 ** (-(255 - i) * 7 / 256)`` (a 139.45 dB ramp,
``table[255] == 1.0`` exactly) — verified against the two printed
endpoint values and the published step constant.  The shipped default
is that closed form evaluated in float32; a bit-conformance deployment
can inject the printed table via :func:`set_vorbis_tables`.  Every
oracle stream is synthesized so the table cancels (zero floors ->
digital silence through the full window/overlap path); the round-trip
suite additionally pins the nonzero-floor path both at the table's
exact fixed point (floor value 255 -> amplitude 1.0, identical in the
closed form and the printed table, so those round trips are
table-independent) and at a non-fixed-point floor value whose
expected amplitude the test recomputes from the same closed form
(machinery-exact; the value itself is injectable).

Gates (returning ``None`` -> NULL stats, never crashes): floor type 0
(the obsolete LSP floor no mainstream encoder emits) and non-audio /
corrupt / truncated streams.

Reference parity note: graphite-project/whisper has no codec surface;
the SAMPLES_SCHEMA contract and int16 presentation convention follow
operators/multimodal.py (whisper_spark-internal).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

# --------------------------------------------------------------------- #
# injectable numeric table (policy: designed substitute by default)
# --------------------------------------------------------------------- #

def _default_inverse_db() -> "np.ndarray":
    """Closed form of the floor1 amplitude ramp (module docstring)."""
    i = np.arange(256, dtype=np.float64)
    return (10.0 ** (-(255.0 - i) * 7.0 / 256.0)).astype(np.float32)


_TABLES = {"inverse_db": _default_inverse_db()}


def set_vorbis_tables(inverse_db=None) -> None:
    """Inject the spec's printed floor1_inverse_dB_table (256 floats)
    for bit-conformance with reference encoders; ``None`` keeps the
    closed-form default.  Affects decoders built afterwards."""
    if inverse_db is not None:
        arr = np.asarray(inverse_db, dtype=np.float32)
        if arr.shape != (256,):
            raise ValueError("inverse_db must hold exactly 256 values")
        _TABLES["inverse_db"] = arr
    else:
        _TABLES["inverse_db"] = _default_inverse_db()


# --------------------------------------------------------------------- #
# Ogg layer
# --------------------------------------------------------------------- #

def _ogg_crc_table() -> list[int]:
    """CRC-32 / 0x04C11DB7, MSB-first, no reflection (Ogg framing)."""
    tab = []
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        tab.append(r)
    return tab


_CRC_TAB = _ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    tab = _CRC_TAB
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tab[((crc >> 24) & 0xFF) ^ byte]
    return crc


def _select_vorbis_serial(data: bytes) -> bytes | None:
    """Stream mapping for grouped (multiplexed) Ogg: all logical
    streams open with consecutive BOS pages before any data page, so
    scan the initial BOS run and return the serial of the first one
    whose body starts with a Vorbis ident packet (``\\x01vorbis``).
    None = no Vorbis BOS found (pure Opus/Theora/Skeleton groups, or
    garbage) — the caller falls back to first-page-serial behavior.

    Each BOS page is CRC-verified BEFORE its body is trusted, exactly
    like the main page walk below: a corrupted BOS body byte could
    otherwise flip which serial is selected (misreading the ident
    magic) before any CRC check runs (round-11 advisor, low).  A CRC
    mismatch ends the scan with None — the main walk would reject the
    same page anyway."""
    import struct

    n = len(data)
    i = 0
    while i + 27 <= n:
        if data[i:i + 4] != b"OggS" or data[i + 4] != 0:
            return None
        if not (data[i + 5] & 0x02):
            return None  # BOS run over: no Vorbis stream opened
        nseg = data[i + 26]
        lace_end = i + 27 + nseg
        if lace_end > n:
            return None
        body = sum(data[i + 27:lace_end])
        if lace_end + body > n:
            return None
        (crc_stored,) = struct.unpack("<I", data[i + 22:i + 26])
        page = bytearray(data[i:lace_end + body])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            return None
        if data[lace_end:lace_end + 7] == b"\x01vorbis":
            return data[i + 14:i + 18]
        i = lace_end + body
    return None


def ogg_packets(data: bytes):
    """Yield ``(packet_bytes, granulepos_of_closing_page)`` for the
    Vorbis logical stream in ``data``: in a grouped (multiplexed)
    file the BOS run is scanned for the Vorbis ident's serial
    (:func:`_select_vorbis_serial`, the spec's stream-mapping step);
    otherwise the first page's serial is used, so a chained file
    decodes its FIRST logical stream and a foreign-first group falls
    back to the old behavior (NULL stats downstream).  Pages are
    CRC-verified and serial-filtered; the walk stops at the first
    structural error (truncated page, CRC mismatch, sequence
    regression) so trailing garbage cannot fabricate packets."""
    import struct

    n = len(data)
    i = 0
    serial = _select_vorbis_serial(data)
    partial = b""
    while i + 27 <= n:
        if data[i:i + 4] != b"OggS" or data[i + 4] != 0:
            break
        nseg = data[i + 26]
        lace_end = i + 27 + nseg
        if lace_end > n:
            break
        lacing = data[i + 27:lace_end]
        body = sum(lacing)
        page_end = lace_end + body
        if page_end > n:
            break
        (gp,) = struct.unpack("<q", data[i + 6:i + 14])
        page_serial = data[i + 14:i + 18]
        (crc_stored,) = struct.unpack("<I", data[i + 22:i + 26])
        page = bytearray(data[i:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            break
        header_type = data[i + 5]
        if serial is None:
            serial = page_serial
        if page_serial != serial:
            i = page_end
            continue
        if not (header_type & 0x01):
            # not a continuation: any dangling partial packet is lost
            partial = b""
        off = lace_end
        for k, lace in enumerate(lacing):
            partial += data[off:off + lace]
            off += lace
            if lace < 255:
                # the page's granulepos belongs to the page that ENDS
                # the packet; only the last completed packet on the
                # page carries it meaningfully, but passing it for all
                # completed packets is harmless (callers track the max)
                yield bytes(partial), gp
                partial = b""
        i = page_end


# --------------------------------------------------------------------- #
# bit reader (Vorbis packs LSB-first within bytes)
# --------------------------------------------------------------------- #

class _EndOfPacket(Exception):
    pass


class BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise _EndOfPacket
        v = 0
        got = 0
        while got < n:
            byte = self.data[(p + got) >> 3]
            bit_off = (p + got) & 7
            take = min(8 - bit_off, n - got)
            v |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = p + n
        return v

    def read1(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise _EndOfPacket
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


def ilog(x: int) -> int:
    """Vorbis ilog: bits needed for x (ilog(0)=0, ilog(7)=3)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    """Vorbis' packed float: 21-bit mantissa, 10-bit exponent
    (bias 788), sign bit."""
    mant = x & 0x1FFFFF
    if x & 0x80000000:
        mant = -mant
    exp = (x & 0x7FE00000) >> 21
    return float(mant) * (2.0 ** (exp - 788))


# --------------------------------------------------------------------- #
# codebooks
# --------------------------------------------------------------------- #

class _BadStream(Exception):
    pass


def _assign_codewords(lengths: list[int | None]) -> dict[tuple[int, int], int]:
    """Canonical Vorbis codeword assignment: entries in order, each
    takes the LOWEST free leaf of its length.  Implemented as an
    explicit binary buddy allocator over the 32-bit code space — free
    aligned blocks sorted by address; allocating length ``l`` takes the
    lowest-address block of depth <= l and splits the remainder back
    into buddies.  Returns {(length, codeword): entry} with codewords
    in root-first (MSB-first) bit order, the order the packet walk
    reads them."""
    free: list[tuple[int, int]] = [(0, 0)]  # (address>>... as (code, len))
    out: dict[tuple[int, int], int] = {}
    for entry, ln in enumerate(lengths):
        if ln is None:
            continue
        if not 1 <= ln <= 32:
            raise _BadStream("codeword length out of range")
        # find the lowest-address free block big enough (depth <= ln)
        pick = None
        for idx, (code, depth) in enumerate(free):
            if depth <= ln:
                pick = idx
                break
        if pick is None:
            raise _BadStream("overpopulated codebook")
        code, depth = free.pop(pick)
        # descend to depth ln, freeing the right buddy at each level
        buddies = []
        while depth < ln:
            depth += 1
            code <<= 1
            buddies.append((code | 1, depth))
        out[(ln, code)] = entry
        # keep the free list address-sorted (buddy addresses ascend
        # with depth but interleave with existing blocks)
        for b in buddies:
            free.append(b)
        free.sort(key=lambda cd: (cd[0] << (32 - cd[1])))
    return out


class Codebook:
    __slots__ = ("dims", "entries", "codes", "vectors", "maxlen", "lut",
                 "lut2")

    def __init__(self, dims, entries, codes, vectors):
        self.dims = dims
        self.entries = entries
        self.codes = codes
        self.vectors = vectors
        self.maxlen = max((ln for ln, _c in codes), default=0)
        # first-level lookup over the next 8 STREAM bits (same shape
        # as the JPEG decoder's DHT LUT): Vorbis reads codewords
        # root-first but packs the stream LSB-first, so a codeword of
        # length ln <= 8 occupies the low ln stream bits BIT-REVERSED;
        # lut[v] packs (entry << 6 | ln), -1 = no short code matches.
        # A SECOND level covers lengths 9..16 (round-11 verdict task
        # 6): lut2[first 8 stream bits] -> 256-list over the NEXT 8
        # stream bits, same packing.  Codes > 16 bits (and reads near
        # end-of-packet) fall back to the per-bit tree walk, which
        # stays the source of truth.
        lut = [-1] * 256
        lut2: dict = {}
        for (ln, code), entry in codes.items():
            if ln > 16:
                continue
            rev = 0
            for i in range(ln):
                rev |= ((code >> i) & 1) << (ln - 1 - i)
            if ln <= 8:
                step = 1 << ln
                for v in range(rev, 256, step):
                    lut[v] = (entry << 6) | ln
            else:
                lo = rev & 0xFF
                sub = lut2.get(lo)
                if sub is None:
                    sub = lut2[lo] = [-1] * 256
                step = 1 << (ln - 8)
                for v in range(rev >> 8, 256, step):
                    sub[v] = (entry << 6) | ln
        self.lut = lut
        self.lut2 = lut2

    def decode_scalar(self, br: BitReader) -> int:
        p = br.pos
        nbits = br.nbits
        if p + 8 <= nbits:
            b = p >> 3
            v16 = (int.from_bytes(br.data[b:b + 3], "little")
                   >> (p & 7)) & 0xFFFF
            e = self.lut[v16 & 0xFF]
            if e >= 0:
                br.pos = p + (e & 63)
                return e >> 6
            if p + 16 <= nbits:
                sub = self.lut2.get(v16 & 0xFF)
                if sub is not None:
                    e = sub[v16 >> 8]
                    if e >= 0:
                        br.pos = p + (e & 63)
                        return e >> 6
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.read1()
            hit = self.codes.get((ln, code))
            if hit is not None:
                return hit
        raise _BadStream("invalid codeword")

    def decode_vector(self, br: BitReader) -> "np.ndarray":
        if self.vectors is None:
            raise _BadStream("scalar codebook used in VQ context")
        return self.vectors[self.decode_scalar(br)]


def parse_codebook(br: BitReader) -> Codebook:
    if br.read(24) != 0x564342:
        raise _BadStream("codebook sync lost")
    dims = br.read(16)
    entries = br.read(24)
    ordered = br.read1()
    lengths: list[int | None] = []
    if not ordered:
        sparse = br.read1()
        for _ in range(entries):
            if sparse:
                lengths.append(br.read(5) + 1 if br.read1() else None)
            else:
                lengths.append(br.read(5) + 1)
    else:
        cur_len = br.read(5) + 1
        cur = 0
        while cur < entries:
            num = br.read(ilog(entries - cur))
            if cur + num > entries:
                raise _BadStream("ordered codebook overrun")
            lengths.extend([cur_len] * num)
            cur += num
            cur_len += 1
    codes = _assign_codewords(lengths)
    lookup = br.read(4)
    vectors = None
    if lookup in (1, 2):
        vmin = float32_unpack(br.read(32))
        vdelta = float32_unpack(br.read(32))
        value_bits = br.read(4) + 1
        sequence_p = br.read1()
        if lookup == 1:
            lv = 0
            if entries > 0 and dims > 0:
                lv = int(entries ** (1.0 / dims))
                # float root can land one off either way
                while (lv + 1) ** dims <= entries:
                    lv += 1
                while lv > 0 and lv ** dims > entries:
                    lv -= 1
            n_mult = lv
        else:
            n_mult = entries * dims
            lv = None
        mult = [br.read(value_bits) for _ in range(n_mult)]
        vectors = np.zeros((entries, dims), dtype=np.float64)
        for e in range(entries):
            last = 0.0
            if lookup == 1:
                idx_div = 1
                for d in range(dims):
                    off = (e // idx_div) % lv if lv else 0
                    v = mult[off] * vdelta + vmin + last
                    if sequence_p:
                        last = v
                    vectors[e, d] = v
                    idx_div *= lv if lv else 1
            else:
                for d in range(dims):
                    v = mult[e * dims + d] * vdelta + vmin + last
                    if sequence_p:
                        last = v
                    vectors[e, d] = v
    elif lookup != 0:
        raise _BadStream("reserved codebook lookup type")
    return Codebook(dims, entries, codes, vectors)


# --------------------------------------------------------------------- #
# floor type 1
# --------------------------------------------------------------------- #

class Floor1:
    __slots__ = ("partition_classes", "class_dims", "class_subclasses",
                 "class_masterbooks", "subclass_books", "multiplier",
                 "x_list")

    def __init__(self, br: BitReader, n_books: int):
        partitions = br.read(5)
        self.partition_classes = [br.read(4) for _ in range(partitions)]
        max_class = max(self.partition_classes, default=-1)
        self.class_dims = []
        self.class_subclasses = []
        self.class_masterbooks = []
        self.subclass_books = []
        for _ in range(max_class + 1):
            dims = br.read(3) + 1
            sub = br.read(2)
            master = None
            if sub:
                master = br.read(8)
                if master >= n_books:
                    raise _BadStream("floor1 masterbook out of range")
            books = []
            for _ in range(1 << sub):
                b = br.read(8) - 1
                if b >= n_books:
                    raise _BadStream("floor1 subclass book out of range")
                books.append(b)
            self.class_dims.append(dims)
            self.class_subclasses.append(sub)
            self.class_masterbooks.append(master)
            self.subclass_books.append(books)
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for cls in self.partition_classes:
            for _ in range(self.class_dims[cls]):
                xs.append(br.read(rangebits))
        if len(set(xs)) != len(xs):
            raise _BadStream("floor1 X list not unique")
        self.x_list = xs

    # ---- packet-time decode -------------------------------------- #

    def decode(self, br: BitReader, books: list[Codebook]):
        """Read one channel's floor data; returns the final_Y list of
        step2-flagged points or None (unused channel)."""
        if not br.read1():
            return None
        rng = (256, 128, 86, 64)[self.multiplier - 1]
        ybits = ilog(rng - 1)
        y = [br.read(ybits), br.read(ybits)]
        for cls in self.partition_classes:
            cdim = self.class_dims[cls]
            cbits = self.class_subclasses[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_masterbooks[cls]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                y.append(books[book].decode_scalar(br) if book >= 0 else 0)
        return self._amplitudes(y, rng)

    def _amplitudes(self, y, rng):
        xs = self.x_list
        count = len(xs)
        final = [0] * count
        flag = [False] * count
        final[0], final[1] = y[0], y[1]
        flag[0] = flag[1] = True
        for i in range(2, count):
            lo = _low_neighbor(xs, i)
            hi = _high_neighbor(xs, i)
            pred = _render_point(xs[lo], final[lo], xs[hi], final[hi], xs[i])
            val = y[i]
            if val:
                highroom = rng - pred
                lowroom = pred
                room = 2 * (highroom if highroom < lowroom else lowroom)
                if val >= room:
                    if highroom > lowroom:
                        final[i] = val - lowroom + pred
                    else:
                        final[i] = pred - val + highroom - 1
                else:
                    if val & 1:
                        final[i] = pred - ((val + 1) >> 1)
                    else:
                        final[i] = pred + (val >> 1)
                flag[i] = True
                flag[lo] = True
                flag[hi] = True
            else:
                final[i] = pred
            final[i] = max(0, min(rng - 1, final[i]))
        return [(xs[i], final[i]) for i in range(count) if flag[i]]

    def curve(self, points, n2: int) -> "np.ndarray":
        """Render the flagged (x, y) points to an amplitude curve of
        length n2 through the inverse-dB table."""
        pts = sorted(points)
        ybuf = np.zeros(n2, dtype=np.int64)
        x0, y0 = pts[0]
        if x0 > 0:
            ybuf[: min(x0, n2)] = y0
        for x1, y1 in pts[1:]:
            _render_line(x0, y0, x1, y1, ybuf, n2)
            x0, y0 = x1, y1
            if x0 >= n2:
                break
        if x0 < n2:
            ybuf[x0:] = y0
        idx = np.minimum(ybuf * self.multiplier, 255)
        return _TABLES["inverse_db"][idx].astype(np.float64)


def _low_neighbor(v, i):
    best = None
    for j in range(i):
        if v[j] < v[i] and (best is None or v[j] > v[best]):
            best = j
    if best is None:
        raise _BadStream("floor1 has no low neighbor")
    return best


def _high_neighbor(v, i):
    best = None
    for j in range(i):
        if v[j] > v[i] and (best is None or v[j] < v[best]):
            best = j
    if best is None:
        raise _BadStream("floor1 has no high neighbor")
    return best


def _render_point(x0, y0, x1, y1, x):
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0, y0, x1, y1, v, n2):
    """Spec render_line (integer Bresenham walk) in closed form: after
    k steps the walk has added ``base*k`` plus one extra ``±1`` for
    each err overflow, and the overflow count at step k is exactly
    ``(k*ady) // adx`` (0 <= ady < adx, err starts at 0) — so the
    vectorized integer evaluation is value-identical to the loop."""
    dy = y1 - y0
    adx = x1 - x0
    base = dy // adx if dy >= 0 else -((-dy) // adx)  # truncate toward 0
    ady = abs(dy) - abs(base) * adx
    if 0 <= x0 < n2:
        v[x0] = y0
    lo = x0 + 1
    hi = min(x1, n2)
    if lo >= hi or lo < 0:
        return
    k = np.arange(1, hi - x0, dtype=np.int64)
    ys = y0 + base * k + (1 if dy >= 0 else -1) * ((k * ady) // adx)
    v[lo:hi] = ys


# --------------------------------------------------------------------- #
# residues
# --------------------------------------------------------------------- #

class Residue:
    __slots__ = ("rtype", "begin", "end", "partition_size",
                 "classifications", "classbook", "books", "pass_active",
                 "_single_ok")

    def __init__(self, rtype: int, br: BitReader, n_books: int):
        self.rtype = rtype
        self.begin = br.read(24)
        self.end = br.read(24)
        self.partition_size = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        if self.classbook >= n_books:
            raise _BadStream("residue classbook out of range")
        cascades = []
        for _ in range(self.classifications):
            low = br.read(3)
            high = br.read(5) if br.read1() else 0
            cascades.append((high << 3) | low)
        self.books = []
        for c in cascades:
            row = []
            for stage in range(8):
                if c & (1 << stage):
                    b = br.read(8)
                    if b >= n_books:
                        raise _BadStream("residue book out of range")
                    row.append(b)
                else:
                    row.append(None)
            self.books.append(row)
        # a pass where EVERY class has no book reads nothing and adds
        # nothing — the walk can skip it outright (real setups rarely
        # cascade past the first couple of passes)
        self.pass_active = [
            any(row[stage] is not None for row in self.books)
            for stage in range(8)
        ]
        self._single_ok = None  # lazily: batched path usable?

    def decode(self, br: BitReader, books: list[Codebook],
               do_decode: list[bool], n2: int) -> "np.ndarray":
        """Decode the residue vectors for ``len(do_decode)`` channels of
        spectrum length ``n2``; returns (channels, n2) float array."""
        ch = len(do_decode)
        out = np.zeros((ch, n2), dtype=np.float64)
        if self.rtype == 2:
            if not any(do_decode):
                return out
            flat = np.zeros(ch * n2, dtype=np.float64)
            self._decode_vectors(br, books, [flat], [True],
                                 ch * n2, fmt=1)
            for c in range(ch):
                out[c] = flat[c::ch]
            return out
        vecs = [out[c] for c in range(ch)]
        self._decode_vectors(br, books, vecs, do_decode, n2,
                             fmt=self.rtype)
        return out

    def _decode_vectors(self, br, books, vecs, do_decode, vec_size, fmt):
        begin = min(self.begin, vec_size)
        end = min(self.end, vec_size)
        n_to_read = end - begin
        if n_to_read <= 0:
            return
        psize = self.partition_size
        partitions = n_to_read // psize
        classbook = books[self.classbook]
        classwords = classbook.dims
        if classwords <= 0:
            raise _BadStream("residue classbook with zero dimensions")
        ch = len(vecs)
        if self._single_ok is None:
            self._single_ok = all(
                books[b].dims > 0 and books[b].vectors is not None
                and psize % books[b].dims == 0
                for row in self.books for b in row if b is not None
            )
        if self._single_ok and sum(1 for d in do_decode if d) == 1:
            # single active vector (mono, one-channel submaps, and ALL
            # type-2 coupled streams route here): the batched walk that
            # defers the numpy adds to one fancy-indexed add per
            # (pass, book).  Falls back to the general walk when any
            # cascade book could not take the batched partition path —
            # the general walk then reproduces the spill/error
            # semantics for the partitions that actually use it.
            j = do_decode.index(True)
            self._decode_vectors_single(
                br, books, vecs[j], partitions, begin, psize, fmt,
                classbook, classwords)
            return
        cls = [[0] * (partitions + classwords) for _ in range(ch)]
        pass_active = self.pass_active
        for pas in range(8):
            if pas and not pass_active[pas]:
                # no class has a book in this pass: the whole walk
                # would read and add nothing (pass 0 always runs — it
                # consumes the classification words)
                continue
            pi = 0
            while pi < partitions:
                if pas == 0:
                    for j in range(ch):
                        if not do_decode[j]:
                            continue
                        try:
                            temp = classbook.decode_scalar(br)
                        except _EndOfPacket:
                            return  # spec: end-of-packet ends residue
                        for k in range(classwords - 1, -1, -1):
                            cls[j][pi + k] = temp % self.classifications
                            temp //= self.classifications
                for _k in range(classwords):
                    if pi >= partitions:
                        break
                    for j in range(ch):
                        if not do_decode[j]:
                            continue
                        book_i = self.books[cls[j][pi]][pas]
                        if book_i is None:
                            continue
                        book = books[book_i]
                        offset = begin + pi * psize
                        try:
                            self._partition(br, book, vecs[j], offset,
                                            psize, fmt)
                        except _EndOfPacket:
                            return
                    pi += 1

    def _decode_vectors_single(self, br, books, vec, partitions, begin,
                               psize, fmt, classbook, classwords):
        """Single-active-channel residue walk with per-(pass, book)
        batched adds.  Bit-exactness: the READ order is the spec walk
        (ids are decoded inline, partition by partition); only the
        float adds are deferred, and within one pass every partition's
        target range is disjoint, so applying them in one vectorized
        add per book is value-identical to the per-partition adds.
        Flushing happens at every pass boundary — the same coefficient
        CAN repeat across passes, and a single fancy-indexed add would
        collapse those duplicates."""
        ncls = self.classifications
        books_tab = self.books
        cls = [0] * (partitions + classwords)
        pass_active = self.pass_active
        from_bytes = int.from_bytes

        def flush(pending):
            for book_i, (offs, idl) in pending.items():
                book = books[book_i]
                dims = book.dims
                ng = psize // dims
                arr = book.vectors[idl]
                off_a = np.asarray(offs, dtype=np.int64)
                if fmt == 0:
                    idx = (off_a[:, None, None]
                           + np.arange(dims)[None, :, None] * ng
                           + np.arange(ng)[None, None, :])
                    vec[idx] += arr.reshape(len(offs), ng,
                                            dims).transpose(0, 2, 1)
                else:
                    idx = off_a[:, None] + np.arange(psize)[None, :]
                    vec[idx] += arr.reshape(len(offs), psize)

        for pas in range(8):
            if pas and not pass_active[pas]:
                continue
            pending: dict = {}
            pi = 0
            while pi < partitions:
                if pas == 0:
                    try:
                        temp = classbook.decode_scalar(br)
                    except _EndOfPacket:
                        flush(pending)
                        return  # spec: end-of-packet ends residue
                    for k in range(classwords - 1, -1, -1):
                        cls[pi + k] = temp % ncls
                        temp //= ncls
                for _k in range(classwords):
                    if pi >= partitions:
                        break
                    book_i = books_tab[cls[pi]][pas]
                    if book_i is None:
                        pi += 1
                        continue
                    book = books[book_i]
                    n_groups = psize // book.dims
                    ids = []
                    eof = None
                    lut = book.lut
                    lut2 = book.lut2
                    data = br.data
                    nbits = br.nbits
                    p = br.pos
                    append = ids.append
                    for _ in range(n_groups):
                        if p + 8 <= nbits:
                            b = p >> 3
                            v16 = (from_bytes(data[b:b + 3], "little")
                                   >> (p & 7)) & 0xFFFF
                            e = lut[v16 & 0xFF]
                            if e >= 0:
                                p += e & 63
                                append(e >> 6)
                                continue
                            if p + 16 <= nbits:
                                sub = lut2.get(v16 & 0xFF)
                                if sub is not None:
                                    e = sub[v16 >> 8]
                                    if e >= 0:
                                        p += e & 63
                                        append(e >> 6)
                                        continue
                        br.pos = p
                        try:
                            append(book.decode_scalar(br))
                        except _EndOfPacket as ex:
                            eof = ex
                            break
                        p = br.pos
                    if eof is None:
                        br.pos = p
                        ent = pending.get(book_i)
                        if ent is None:
                            ent = pending[book_i] = ([], [])
                        ent[0].append(begin + pi * psize)
                        ent[1].extend(ids)
                        pi += 1
                        continue
                    # end-of-packet mid-partition: the spec keeps the
                    # groups decoded so far — apply the batched full
                    # partitions, then the partial one, and stop
                    flush(pending)
                    if ids:
                        arr = books[book_i].vectors[ids]
                        offset = begin + pi * psize
                        if fmt == 0:
                            view = vec[offset:offset + psize].reshape(
                                book.dims, n_groups)
                            view[:, :len(ids)] += arr.T
                        else:
                            vec[offset:offset + len(ids) * book.dims] \
                                += arr.ravel()
                    return
            flush(pending)

    @staticmethod
    def _partition(br, book, vec, offset, psize, fmt):
        dims = book.dims
        if dims <= 0:
            raise _BadStream("residue VQ book with zero dimensions")
        vectors = book.vectors
        if vectors is None:
            raise _BadStream("scalar codebook used in VQ context")
        if psize % dims == 0:
            # batched hot path: decode the partition's entry ids first,
            # then apply ONE fancy-indexed add — each coefficient still
            # receives exactly one add per (partition, pass), in the
            # same order, so the float results are bit-identical to the
            # per-group loop.  End-of-packet mid-partition keeps the
            # groups decoded so far (the old loop had already applied
            # them) and re-raises.
            n_groups = psize // dims
            ids = []
            eof = None
            # inlined scalar decode (locals over method dispatch —
            # the Layer-II/III reader discipline); the method call
            # remains the fallback for LUT misses and end-of-data
            lut = book.lut
            lut2 = book.lut2
            data = br.data
            nbits = br.nbits
            p = br.pos
            from_bytes = int.from_bytes
            append = ids.append
            for _ in range(n_groups):
                if p + 8 <= nbits:
                    b = p >> 3
                    v16 = (from_bytes(data[b:b + 3], "little")
                           >> (p & 7)) & 0xFFFF
                    e = lut[v16 & 0xFF]
                    if e >= 0:
                        p += e & 63
                        append(e >> 6)
                        continue
                    if p + 16 <= nbits:
                        sub = lut2.get(v16 & 0xFF)
                        if sub is not None:
                            e = sub[v16 >> 8]
                            if e >= 0:
                                p += e & 63
                                append(e >> 6)
                                continue
                br.pos = p
                try:
                    append(book.decode_scalar(br))
                except _EndOfPacket as ex:
                    eof = ex
                    break
                p = br.pos
            if eof is None:
                br.pos = p
            if ids:
                arr = vectors[ids]
                if fmt == 0:
                    view = vec[offset:offset + psize].reshape(
                        dims, n_groups)
                    view[:, :len(ids)] += arr.T
                else:
                    vec[offset:offset + len(ids) * dims] += arr.ravel()
            if eof is not None:
                raise eof
        elif fmt == 0:
            step = psize // dims
            for s in range(step):
                e = book.decode_vector(br)
                vec[offset + s: offset + s + dims * step: step] += e
        else:
            k = 0
            while k < psize:
                e = book.decode_vector(br)
                vec[offset + k: offset + k + dims] += e
                k += dims


# --------------------------------------------------------------------- #
# mappings / modes / headers
# --------------------------------------------------------------------- #

class Mapping:
    __slots__ = ("submaps", "coupling", "mux", "submap_floor",
                 "submap_residue")


class Mode:
    __slots__ = ("blockflag", "mapping")


class VorbisInfo:
    __slots__ = ("channels", "rate", "blocksizes", "codebooks", "floors",
                 "residues", "mappings", "modes")


def parse_ident(packet: bytes) -> tuple[int, int, int, int]:
    br = BitReader(packet)
    if br.read(8) != 1 or bytes(br.read(8) for _ in range(6)) != b"vorbis":
        raise _BadStream("not an identification header")
    if br.read(32) != 0:
        raise _BadStream("unsupported vorbis version")
    channels = br.read(8)
    rate = br.read(32)
    br.read(32), br.read(32), br.read(32)  # bitrate bounds
    bs = br.read(8)
    bs0, bs1 = 1 << (bs & 0x0F), 1 << (bs >> 4)
    if channels == 0 or rate == 0 or not (64 <= bs0 <= bs1 <= 8192):
        raise _BadStream("invalid identification header")
    if not br.read1():
        raise _BadStream("ident framing bit unset")
    return channels, rate, bs0, bs1


def parse_setup(packet: bytes, channels: int) -> tuple[
        list, list, list, list, list]:
    br = BitReader(packet)
    if br.read(8) != 5 or bytes(br.read(8) for _ in range(6)) != b"vorbis":
        raise _BadStream("not a setup header")
    books = [parse_codebook(br) for _ in range(br.read(8) + 1)]
    for _ in range(br.read(6) + 1):  # time transforms (placeholders)
        if br.read(16) != 0:
            raise _BadStream("nonzero time transform")
    floors = []
    for _ in range(br.read(6) + 1):
        ftype = br.read(16)
        if ftype == 1:
            floors.append(Floor1(br, len(books)))
        elif ftype == 0:
            # obsolete LSP floor: parse past its config, mark gated
            br.read(8), br.read(16), br.read(16)
            br.read(6), br.read(8)
            nb = br.read(4) + 1
            for _ in range(nb):
                if br.read(8) >= len(books):
                    raise _BadStream("floor0 book out of range")
            floors.append(None)  # gated
        else:
            raise _BadStream("reserved floor type")
    residues = []
    for _ in range(br.read(6) + 1):
        rtype = br.read(16)
        if rtype > 2:
            raise _BadStream("reserved residue type")
        residues.append(Residue(rtype, br, len(books)))
    mappings = []
    for _ in range(br.read(6) + 1):
        if br.read(16) != 0:
            raise _BadStream("reserved mapping type")
        m = Mapping()
        m.submaps = br.read(4) + 1 if br.read1() else 1
        m.coupling = []
        if br.read1():
            for _ in range(br.read(8) + 1):
                mag = br.read(ilog(channels - 1))
                ang = br.read(ilog(channels - 1))
                if mag == ang or mag >= channels or ang >= channels:
                    raise _BadStream("invalid coupling pair")
                m.coupling.append((mag, ang))
        if br.read(2) != 0:
            raise _BadStream("mapping reserved bits set")
        if m.submaps > 1:
            m.mux = [br.read(4) for _ in range(channels)]
            if any(x >= m.submaps for x in m.mux):
                raise _BadStream("mux out of range")
        else:
            m.mux = [0] * channels
        m.submap_floor, m.submap_residue = [], []
        for _ in range(m.submaps):
            br.read(8)  # unused time config
            fl = br.read(8)
            rs = br.read(8)
            if fl >= len(floors) or rs >= len(residues):
                raise _BadStream("submap index out of range")
            m.submap_floor.append(fl)
            m.submap_residue.append(rs)
        mappings.append(m)
    modes = []
    for _ in range(br.read(6) + 1):
        md = Mode()
        md.blockflag = br.read1()
        if br.read(16) != 0 or br.read(16) != 0:
            raise _BadStream("reserved mode window/transform")
        md.mapping = br.read(8)
        if md.mapping >= len(mappings):
            raise _BadStream("mode mapping out of range")
        modes.append(md)
    if not br.read1():
        raise _BadStream("setup framing bit unset")
    return books, floors, residues, mappings, modes


# --------------------------------------------------------------------- #
# transform + window
# --------------------------------------------------------------------- #

def imdct(X: "np.ndarray") -> "np.ndarray":
    """IMDCT: M spectral coefficients -> 2M time samples, computed as a
    DCT-IV through an 8M-point real-FFT embedding (O(M log M); verified
    against the direct cosine matrix in the test suite).

    y[n] = sum_k X[k] cos(pi/M (n + 0.5 + M/2)(k + 0.5))
    """
    X = np.asarray(X, dtype=np.float64)
    M = len(X)
    y = np.zeros(8 * M)
    y[1:2 * M:2] = X
    z = np.fft.rfft(y)[1:2 * M:2].real
    out = np.empty(2 * M)
    h = M // 2
    out[:h] = z[h:]
    out[h:h + M] = -z[::-1]
    out[h + M:] = -z[:h]
    return out


_SLOPE_CACHE: dict = {}
_WINDOW_CACHE: dict = {}


def _slope(k: int) -> "np.ndarray":
    """Vorbis window rise over k samples:
    sin(pi/2 * sin^2(pi/2 * (i + 0.5)/k)).  Memoized — a stream uses
    at most a handful of distinct slope lengths, and the old per-packet
    recompute was ~7% of a nonzero decode (PERF.md round-12).  Callers
    treat the array as read-only."""
    w = _SLOPE_CACHE.get(k)
    if w is None:
        i = np.arange(k, dtype=np.float64)
        s = np.sin(0.5 * np.pi * (i + 0.5) / k)
        w = _SLOPE_CACHE[k] = np.sin(0.5 * np.pi * s * s)
    return w


def _window(n: int, n0: int, prev_long: bool, next_long: bool,
            long_block: bool) -> tuple["np.ndarray", int, int]:
    """Assembled window for one block; returns (window, left_start,
    right_start) — left_start is where the rise begins, right_start
    where the fall begins (= the emit boundary).  Memoized on the full
    parameter tuple (four shapes per stream at most); the window is
    only ever multiplied, never mutated."""
    key = (n, n0, prev_long, next_long, long_block)
    hit = _WINDOW_CACHE.get(key)
    if hit is not None:
        return hit
    w = np.zeros(n, dtype=np.float64)
    if long_block and not prev_long:
        left_start, left_n = n // 4 - n0 // 4, n0 // 2
    else:
        left_start, left_n = 0, n // 2
    if long_block and not next_long:
        right_start, right_n = n // 2 + n // 4 - n0 // 4, n0 // 2
    else:
        right_start, right_n = n // 2, n // 2
    w[left_start:left_start + left_n] = _slope(left_n)
    w[left_start + left_n:right_start] = 1.0
    w[right_start:right_start + right_n] = _slope(right_n)[::-1]
    _WINDOW_CACHE[key] = (w, left_start, right_start)
    return w, left_start, right_start


# --------------------------------------------------------------------- #
# stream decode
# --------------------------------------------------------------------- #

def decode_vorbis_stream(data: bytes):
    """Full decode of the first logical Vorbis stream in an Ogg
    container.  Returns ``(channels, rate, pcm)`` with ``pcm`` a float64
    array of shape (samples, channels) in [-1, 1], or ``None`` for
    non-Vorbis / gated / corrupt input."""
    try:
        return _decode(data)
    except (_BadStream, _EndOfPacket, IndexError, ZeroDivisionError,
            ValueError, OverflowError):
        return None


def _decode(data: bytes):
    packets = []
    last_gp = None
    for pkt, gp in ogg_packets(data):
        packets.append(pkt)
        if gp >= 0:
            last_gp = gp
    if len(packets) < 3:
        return None
    channels, rate, bs0, bs1 = parse_ident(packets[0])
    # packets[1] is the comment header; only its type marker matters
    if len(packets[1]) < 7 or packets[1][0] != 3:
        return None
    books, floors, residues, mappings, modes = parse_setup(
        packets[2], channels)
    mode_bits = ilog(len(modes) - 1)

    out_chunks = []
    prev_right = None  # previous block's data from its emit boundary on
    for pkt in packets[3:]:
        br = BitReader(pkt)
        try:
            if br.read1() != 0:
                continue  # non-audio packet mid-stream: skip
            mode = modes[br.read(mode_bits)] if mode_bits else modes[0]
        except _EndOfPacket:
            continue
        mapping = mappings[mode.mapping]
        long_block = bool(mode.blockflag)
        n = bs1 if long_block else bs0
        n2 = n // 2
        if long_block:
            prev_flag = bool(br.read1())
            next_flag = bool(br.read1())
        else:
            prev_flag = next_flag = False
        # ---- floors ----
        floor_pts = []
        nonzero = []
        for ch in range(channels):
            fl = floors[mapping.submap_floor[mapping.mux[ch]]]
            if fl is None:
                return None  # floor0-gated stream
            try:
                pts = fl.decode(br, books)
            except _EndOfPacket:
                pts = None
            floor_pts.append(pts)
            nonzero.append(pts is not None)
        # ---- coupling forces both halves of a pair to decode ----
        eff = list(nonzero)
        for mag, ang in mapping.coupling:
            if eff[mag] or eff[ang]:
                eff[mag] = eff[ang] = True
        # ---- residues per submap ----
        residue_vec = np.zeros((channels, n2), dtype=np.float64)
        for sm in range(mapping.submaps):
            idxs = [c for c in range(channels) if mapping.mux[c] == sm]
            if not idxs:
                continue
            res = residues[mapping.submap_residue[sm]]
            dd = [eff[c] for c in idxs]
            dec = res.decode(br, books, dd, n2)
            for pos, c in enumerate(idxs):
                residue_vec[c] = dec[pos]
        # ---- inverse coupling (square polar), reverse order ----
        for mag, ang in reversed(mapping.coupling):
            M = residue_vec[mag]
            A = residue_vec[ang]
            newM = M.copy()
            newA = A.copy()
            pos_m = M > 0
            pos_a = A > 0
            newA[pos_m & pos_a] = (M - A)[pos_m & pos_a]
            sel = pos_m & ~pos_a
            newA[sel] = M[sel]
            newM[sel] = (M + A)[sel]
            sel = ~pos_m & pos_a
            newA[sel] = (M + A)[sel]
            sel = ~pos_m & ~pos_a
            newA[sel] = M[sel]
            newM[sel] = (M - A)[sel]
            residue_vec[mag] = newM
            residue_vec[ang] = newA
        # ---- dot product + IMDCT + window ----
        # for a LONG block the packet's prev/next flags say whether the
        # NEIGHBOR is long; a short block is short-against-short on
        # both sides by construction
        w, left_start, right_start = _window(
            n, bs0, prev_flag, next_flag, long_block)
        block = np.zeros((n, channels), dtype=np.float64)
        for ch in range(channels):
            if nonzero[ch]:
                fl = floors[mapping.submap_floor[mapping.mux[ch]]]
                curve = fl.curve(floor_pts[ch], n2)
                spectrum = residue_vec[ch] * curve
            else:
                spectrum = None
            if spectrum is not None and np.any(spectrum):
                block[:, ch] = imdct(spectrum) * w
            # silent channels stay zero without paying the transform
        # ---- overlap-add / emit (center-to-center lapping) ----
        # Vorbis returns (n_prev + n_cur)/4 samples per block
        # boundary, spanning the previous block's CENTER to the
        # current block's center; tails therefore run from each
        # block's center (a long block flagged next-short carries
        # (n - n0)/4 fully-windowed samples AFTER right_start's
        # fall region begins relative accounting — starting tails at
        # right_start would drop them at the first boundary).
        center = n // 2
        if prev_right is None:
            prev_right = (block[center:], n)
            continue
        tail, prev_n = prev_right
        emit = (prev_n + n) // 4
        seg = np.zeros((emit, channels), dtype=np.float64)
        m = min(emit, len(tail))
        seg[:m] = tail[:m]
        # current block spans [off, off + n) relative to the previous
        # center; with consistent window flags its rise overlaps the
        # tail's fall exactly and everything before it is window-zero
        off = emit - center
        seg[max(off, 0):emit] += block[max(-off, 0):center]
        out_chunks.append(seg)
        prev_right = (block[center:], n)
    if not out_chunks:
        return None
    pcm = np.concatenate(out_chunks, axis=0)
    if last_gp is not None and 0 <= last_gp < len(pcm):
        pcm = pcm[:last_gp]
    return channels, rate, pcm


def _make_vorbis_sample_decoder() -> Callable[[bytes], "dict | None"]:
    """Stats decoder in multimodal.SAMPLES_SCHEMA shape (int16
    presentation, the float-output codec convention — see mp3.py)."""

    def decode(p: bytes):
        if p is None or len(p) < 4 or p[:4] != b"OggS":
            return None
        got = decode_vorbis_stream(p)
        if got is None:
            return None
        channels, rate, pcm = got
        if pcm.size == 0:
            return None
        flat = pcm.reshape(-1)  # interleaved, same as WAV convention
        s16 = np.clip(np.rint(flat * 32767.0), -32768, 32767).astype(
            np.int64)
        total = int(s16.sum())
        return {
            "sample_rate": int(rate), "channels": int(channels),
            "bits": 16, "n_samples": int(s16.size),
            "s_min": int(s16.min()), "s_max": int(s16.max()),
            "s_sum": total, "s_sq_sum": int((s16 * s16).sum()),
            "s_mean": total / s16.size,
        }

    return decode


#: stdlib Ogg Vorbis sample decoder; for unit tests
decode_vorbis_samples = _make_vorbis_sample_decoder()
