"""Streaming ingest (file source -> foreachBatch -> WhisperStore) and
batch point-source connectors."""

import time

import pytest

from whisper_spark.sources import read_points_csv, read_points_lines, read_rrd
from whisper_spark.store import WhisperStore
from whisper_spark.streaming import parse_line_protocol, start_ingest

NOW = 1700000000


def test_parse_line_protocol(spark):
    lines = spark.createDataFrame(
        [
            ("servers.a.cpu 0.5 1699999990",),
            ("servers.b.cpu 1.5 1699999991",),
            ("garbage",),
            ("servers.c.cpu notanumber 1699999992",),
        ],
        "value string",
    )
    out = parse_line_protocol(lines).collect()
    got = {(r["metric"], r["ts"], r["value"]) for r in out}
    assert ("servers.a.cpu", 1699999990, 0.5) in got
    assert ("servers.b.cpu", 1699999991, 1.5) in got
    assert len(got) == 2  # malformed lines dropped


def test_streaming_ingest_file_source(spark, tmp_path):
    """End-to-end: line-protocol files stream into a store with rollups."""
    indir = tmp_path / "in"
    indir.mkdir()
    store = WhisperStore.create(
        spark, str(tmp_path / "sdb"), [(1, 120), (60, 60)], x_files_factor=0.0
    )
    with open(indir / "batch1.txt", "w") as f:
        for i in range(30):
            f.write(f"stream.m1 {float(i)} {NOW - 60 + i}\n")

    stream = spark.readStream.text(str(indir))
    q = start_ingest(
        parse_line_protocol(stream),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        now_fn=lambda: NOW,
    )
    q.awaitTermination(120)

    res = store.fetch_series("stream.m1", from_time=NOW - 119, now=NOW)
    vals = [v for v in res[1] if v is not None]
    assert len(vals) == 30
    # rollup cascade ran inside foreachBatch
    res_m = store.fetch_series("stream.m1", from_time=NOW - 3000, now=NOW)
    assert any(v is not None for v in res_m[1])

    # second file -> incremental batch updates existing slots (LWW)
    with open(indir / "batch2.txt", "w") as f:
        f.write(f"stream.m1 999.0 {NOW - 50}\n")
    q2 = start_ingest(
        parse_line_protocol(spark.readStream.text(str(indir))),
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        now_fn=lambda: NOW,
    )
    q2.awaitTermination(120)
    res2 = store.fetch_series("stream.m1", from_time=NOW - 119, now=NOW)
    m = dict(zip(range(res2[0][0], res2[0][1]), res2[1]))
    assert m[NOW - 50] == 999.0


def test_read_points_csv_and_lines(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("metric,ts,value,seq\nm1,100,1.5,0\nm2,200,2.5,1\n,300,3.5,2\n")
    out = read_points_csv(spark, str(p)).collect()
    assert {(r["metric"], r["ts"], r["value"]) for r in out} == {
        ("m1", 100, 1.5), ("m2", 200, 2.5)
    }
    lp = tmp_path / "pts.txt"
    lp.write_text("m3 7.5 400\nm4 8.5 500\n")
    out2 = read_points_lines(spark, str(lp)).collect()
    assert {(r["metric"], r["ts"], r["value"]) for r in out2} == {
        ("m3", 400, 7.5), ("m4", 500, 8.5)
    }


def test_read_rrd_gated(spark):
    with pytest.raises(NotImplementedError):
        read_rrd(spark, "/nonexistent.rrd")
