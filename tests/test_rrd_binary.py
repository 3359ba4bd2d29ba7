"""Binary .rrd reader: round trips against an INDEPENDENTLY coded
file writer (explicit offset bookkeeping per rrdtool's public
rrd_format.h layout), cross-path equality with the `rrdtool dump` XML
parser, distributed multi-file reads, and ABI/corruption rejection.
"""

import math
import struct

import pytest

from whisper_spark.sources.points import (
    parse_rrd_dump,
    read_rrd,
    read_rrd_xml,
    rrd2store,
    rrd_dump_to_archive_rows,
)
from whisper_spark.sources.rrd_binary import FLOAT_COOKIE, parse_rrd_binary

LAST_UP = 1700000000


def build_rrd(ds, rras, step=300, last_up=LAST_UP, endian="<",
              version=b"0003", cur_rows=None):
    """Independent .rrd writer: packs the LP64 on-disk structs field by
    field (rrd_format.h).  ``rras[i]["rows"]`` is the LOGICAL
    oldest-first view; the ring is laid out so the newest row sits at
    index ``cur_rows[i]`` (most-recently-written, per the format)."""
    E = endian
    out = bytearray()
    out += b"RRD\0" + version + b"\0"            # cookie[4] version[5]
    out += b"\0" * 7                              # pad double to 8-align
    out += struct.pack(E + "d", 8.642135e130)     # float cookie @16
    out += struct.pack(E + "QQQ", len(ds), len(rras), step)
    out += b"\0" * 80                             # stat par[10]
    for name in ds:                               # ds_def_t
        out += name.encode().ljust(20, b"\0")
        out += b"GAUGE".ljust(20, b"\0")
        par = bytearray(80)
        struct.pack_into(E + "d", par, 0, 600.0)  # minimal heartbeat
        out += par
    for r in rras:                                # rra_def_t
        out += r["cf"].encode().ljust(20, b"\0")
        out += b"\0" * 4                          # pad row_cnt to 8
        out += struct.pack(E + "QQ", len(r["rows"]), r["pdp_per_row"])
        par = bytearray(80)
        struct.pack_into(E + "d", par, 0, r.get("xff", 0.5))
        out += par
    if int(version) >= 3:                         # live_head_t
        out += struct.pack(E + "qq", last_up, 0)
    else:
        out += struct.pack(E + "q", last_up)
    for _ in ds:                                  # pdp_prep_t
        out += b"U".ljust(30, b"\0") + b"\0\0" + b"\0" * 80
    out += b"\0" * (80 * len(rras) * len(ds))     # cdp_prep_t
    curs = (cur_rows if cur_rows is not None
            else [len(r["rows"]) - 1 for r in rras])
    for c in curs:                                # rra_ptr_t
        out += struct.pack(E + "Q", c)
    for r, c in zip(rras, curs):                  # ring data
        n, w = len(r["rows"]), len(ds)
        ring = [[float("nan")] * w for _ in range(n)]
        for age, row in enumerate(reversed(r["rows"])):
            # newest (age 0) at cur_row, older rows behind it
            ring[(c - age) % n] = [
                float("nan") if v is None else float(v) for v in row
            ]
        for row in ring:
            out += struct.pack(E + f"{w}d", *row)
    return bytes(out)


ROWS_FINE = [[10.0 + i, 900.0 + i] for i in range(12)]
ROWS_FINE[9][0] = None   # unknown speed two fine slots before the end
ROWS_FINE[3][1] = None   # unknown rpm mid-history
ROWS_COARSE = [[899.5, 1.0], [900.5, 2.0], [None, 3.0]]


def _db(endian="<", version=b"0003", cur_rows=None):
    return build_rrd(
        ["speed", "rpm"],
        [
            {"cf": "AVERAGE", "pdp_per_row": 1, "xff": 0.5,
             "rows": ROWS_FINE},
            {"cf": "AVERAGE", "pdp_per_row": 6, "xff": 0.25,
             "rows": ROWS_COARSE},
            {"cf": "MAX", "pdp_per_row": 1, "xff": 0.5,
             "rows": [[31.0, 950.0]] * 2},
        ],
        endian=endian, version=version, cur_rows=cur_rows,
    )


def test_parse_round_trip_le():
    info = parse_rrd_binary(_db())
    assert info["step"] == 300
    assert info["lastupdate"] == LAST_UP
    assert info["ds"] == ["speed", "rpm"]
    assert [r["cf"] for r in info["rras"]] == ["AVERAGE", "AVERAGE", "MAX"]
    assert [r["pdp_per_row"] for r in info["rras"]] == [1, 6, 1]
    assert info["rras"][0]["xff"] == 0.5
    assert info["rras"][1]["xff"] == 0.25
    assert info["rras"][0]["rows"] == ROWS_FINE
    assert info["rras"][1]["rows"] == ROWS_COARSE


def test_parse_big_endian_and_old_version():
    assert parse_rrd_binary(_db(endian=">"))["rras"][0]["rows"] == ROWS_FINE
    # version 0001: live_head is last_up only (no usec field)
    old = build_rrd(["a"], [{"cf": "LAST", "pdp_per_row": 1,
                             "rows": [[5.0], [6.0]]}], version=b"0001")
    info = parse_rrd_binary(old)
    assert info["lastupdate"] == LAST_UP
    assert info["rras"][0]["rows"] == [[5.0], [6.0]]


def test_ring_rotation_and_raw_offsets():
    """A mid-ring cur_row unrotates to the same logical rows, and the
    newest row's doubles really live at ring index cur_row — pinned at
    the raw byte offset so writer and parser can't share a wrong
    formula."""
    blob = _db(cur_rows=[1, 0, 1])
    info = parse_rrd_binary(blob)
    assert info["rras"][0]["rows"] == ROWS_FINE
    assert info["rras"][1]["rows"] == ROWS_COARSE
    # stat(128) + 2*ds_def(120) + 3*rra_def(120) + live(16)
    # + 2*pdp_prep(112) + 3*2*cdp_prep(80) + 3*rra_ptr(8)
    data0 = 128 + 240 + 360 + 16 + 224 + 480 + 24
    # rra0 ring index 1 (= cur_row) must hold the NEWEST row [21, 911]
    got = struct.unpack_from("<2d", blob, data0 + 1 * 2 * 8)
    assert got == (21.0, 911.0)
    # ...and index 2 (cur_row+1, the oldest) holds [10, 900]
    assert struct.unpack_from("<2d", blob, data0 + 2 * 2 * 8) == (10.0, 900.0)


def test_binary_matches_xml_parse_and_read(spark, tmp_path):
    """The binary parser and the `rrdtool dump` XML parser agree on the
    same logical database, so read_rrd == read_rrd_xml row-for-row."""
    def xml_rows(rows):
        out = []
        for r in rows:
            cells = "".join(
                f"<v>{'NaN' if v is None else ('%.10e' % v)}</v>" for v in r)
            out.append(f"<row>{cells}</row>")
        return "\n".join(out)

    xml = f"""<rrd><version>0003</version><step>300</step>
      <lastupdate>{LAST_UP}</lastupdate>
      <ds><name>speed</name></ds><ds><name>rpm</name></ds>
      <rra><cf>AVERAGE</cf><pdp_per_row>1</pdp_per_row>
        <params><xff>0.5</xff></params>
        <database>{xml_rows(ROWS_FINE)}</database></rra>
      <rra><cf>AVERAGE</cf><pdp_per_row>6</pdp_per_row>
        <params><xff>0.25</xff></params>
        <database>{xml_rows(ROWS_COARSE)}</database></rra>
      <rra><cf>MAX</cf><pdp_per_row>1</pdp_per_row>
        <params><xff>0.5</xff></params>
        <database>{xml_rows([[31.0, 950.0]] * 2)}</database></rra>
    </rrd>"""
    assert parse_rrd_dump(xml) == parse_rrd_binary(_db())

    bp, xp = tmp_path / "engine.rrd", tmp_path / "engine.xml"
    bp.write_bytes(_db())
    xp.write_text(xml)
    got_b = sorted(map(tuple, read_rrd(spark, str(bp)).collect()))
    got_x = sorted(map(tuple, read_rrd_xml(spark, str(xp)).collect()))
    assert got_b == got_x and len(got_b) > 0
    end300 = LAST_UP - LAST_UP % 300
    end1800 = LAST_UP - LAST_UP % 1800
    as_map = {(m, res, ts): v for (m, res, ts, v) in got_b}
    assert as_map[("engine.speed", 300, end300)] == 21.0
    assert ("engine.speed", 300, end300 - 600) not in as_map   # NaN slot
    assert as_map[("engine.rpm", 300, end300 - 600)] == 909.0
    # coarse rra: oldest of 3 rows, speed column
    assert as_map[("engine.speed", 1800, end1800 - 3600)] == 899.5


def test_read_rrd_glob_distributed_and_cf(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"host{i}.rrd").write_bytes(_db())
    df = read_rrd(spark, str(tmp_path / "*.rrd"))
    metrics = {r["metric"] for r in df.collect()}
    assert metrics == {f"host{i}.{d}" for i in range(4)
                       for d in ("speed", "rpm")}
    mx = read_rrd(spark, str(tmp_path / "host0.rrd"), cf="MAX")
    assert {r["value"] for r in mx.collect()} == {31.0, 950.0}


def test_rrd2store_from_binary(spark, tmp_path):
    bp = tmp_path / "engine.rrd"
    bp.write_bytes(_db())
    store = rrd2store(spark, str(bp), str(tmp_path / "migrated"))
    assert [(a.seconds_per_point, a.points) for a in store.archives] == \
        [(300, 12), (1800, 3)]
    assert store.x_files_factor == 0.5
    end = LAST_UP - LAST_UP % 300
    (_ti, tl) = store.fetch("engine.speed", from_time=LAST_UP - 1500,
                            until_time=LAST_UP, now=LAST_UP)
    vals = {r["ts"]: r["value"] for r in tl.collect()}
    assert vals[end] == 21.0 and vals[end - 600] is None


def test_rejections():
    with pytest.raises(ValueError, match="magic"):
        parse_rrd_binary(b"XXXX" + b"\0" * 200)
    with pytest.raises(ValueError, match="version"):
        parse_rrd_binary(b"RRD\0" + b"9999\0" + b"\0" * 200)
    # i386 layout: float cookie at offset 12
    i386 = bytearray(b"RRD\0" + b"0003\0" + b"\0" * 3)
    i386 += struct.pack("<d", FLOAT_COOKIE) + b"\0" * 100
    with pytest.raises(NotImplementedError, match="32-bit"):
        parse_rrd_binary(bytes(i386))
    # truncated mid-data and trailing garbage — ONE exception type
    # (ValueError) so fleet reads can catch bad files uniformly
    good = _db()
    with pytest.raises(ValueError, match="truncated RRD data"):
        parse_rrd_binary(good[:-8])
    with pytest.raises(ValueError, match="size mismatch"):
        parse_rrd_binary(good + b"\0" * 8)
    # rra_ptr out of range
    bad = bytearray(_db())
    ptr_off = 128 + 240 + 360 + 16 + 224 + 480
    struct.pack_into("<Q", bad, ptr_off, 99)
    with pytest.raises(ValueError, match="rra_ptr"):
        parse_rrd_binary(bytes(bad))


def test_archive_mapping_shared_with_xml_path():
    """rrd_dump_to_archive_rows consumes the binary parse directly
    (same dict contract as the XML parser)."""
    archives, rows = rrd_dump_to_archive_rows(
        "eng", parse_rrd_binary(_db()), "AVERAGE")
    assert archives == [(300, 12), (1800, 3)]
    assert all(not math.isnan(v) for (_m, _r, _t, v) in rows)
