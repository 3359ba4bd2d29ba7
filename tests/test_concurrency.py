"""Concurrent-writer safety: the policy batch counter is the LWW
tiebreaker, so two simultaneous writers must never mint the same wseq
(the reference's LOCK analog, whisper.py:98-104,683-684)."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from whisper_spark.store import WhisperStore

NOW = 1700000000


def test_concurrent_batch_counter_distinct(spark, tmp_path):
    store = WhisperStore.create(spark, str(tmp_path / "db"), [(60, 100)])
    # separate handles, like separate writer processes sharing the path
    stores = [WhisperStore.open(spark, str(tmp_path / "db")) for _ in range(8)]
    with ThreadPoolExecutor(max_workers=8) as ex:
        seqs = list(ex.map(lambda s: [s._next_batch() for _ in range(5)], stores))
    flat = [x for xs in seqs for x in xs]
    assert len(set(flat)) == len(flat) == 40
    assert store._next_batch() == 41


def test_concurrent_update_many_distinct_wseq(spark, tmp_path):
    """Two concurrent update_many calls to the SAME slot: distinct wseq
    in storage, and the fetched value is the one with the higher wseq
    (deterministic LWW, no ambiguous tie)."""
    path = str(tmp_path / "db2")
    WhisperStore.create(spark, path, [(60, 100)], x_files_factor=0.0)
    s1, s2 = WhisperStore.open(spark, path), WhisperStore.open(spark, path)
    ts = NOW - NOW % 60

    def write(args):
        s, v = args
        s.update_many([(ts, v)], now=NOW, metric="m")

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(write, [(s1, 1.0), (s2, 2.0)]))

    pts = (
        spark.read.parquet(f"{path}/points")
        .filter((F.col("metric") == "m") & (F.col("ts") == ts))
        .select("wseq", "value")
        .collect()
    )
    assert len({r["wseq"] for r in pts}) == len(pts) == 2
    winner = max(pts, key=lambda r: r["wseq"])["value"]
    ((_f, _u, _s), tl) = s1.fetch("m", ts - 60, until_time=ts + 60, now=NOW)
    got = {r["ts"]: r["value"] for r in tl.collect()}
    assert got[ts] == winner
