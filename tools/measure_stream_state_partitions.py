#!/usr/bin/env python
"""Measure the stream_render_composed availableNow replay at sf0.1 under
different state-store partition counts (VERDICT r13 "Next round" #5).

The bench session runs 16 shuffle partitions; at sf0.1 the composed
replay has ~5 metrics x ~15 in-watermark windows of live state, so most
state partitions are empty yet still pay a per-batch commit (x2 stateful
operators).  This tool quantifies that overhead so the production sizing
guidance in render_stream_once(state_partitions=) is measured, not
asserted.  It changes nothing about the bench: the query keeps the
session default unless a caller passes the knob.

Usage: python tools/measure_stream_state_partitions.py [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from whisper_spark import queries as Q  # noqa: E402
from whisper_spark.session import get_spark  # noqa: E402
from whisper_spark.streaming.render import render_stream_once  # noqa: E402


def replay(spark, sf_dir, state_partitions):
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    pts = src.select(
        F.col("event_type").alias("metric"),
        Q.stream_sec(schema, "ts").alias("ts"),
        F.col("value"),
        F.col("event_id").alias("seq"),
    )
    out = render_stream_once(
        spark,
        pts,
        "scale(sumSeries(movingAverage(*, 5)), 2)",
        tempfile.mkdtemp(prefix="state_ab_"),
        state_partitions=state_partitions,
        step_seconds=60,
        method="max",
        watermark_seconds=600,
    )
    return sorted(tuple(r) for r in out.select("ts", "value").collect())


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="measure_stream_state",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "16",
        },
    )
    variants = [None, 4, 2]  # None = session default (16)
    # warmup: one replay per variant (state-store/offset-log init)
    base = {v: replay(spark, sf_dir, v) for v in variants}
    for v in variants[1:]:
        assert base[v] == base[variants[0]], f"results differ at {v}"
    times: dict = {v: [] for v in variants}
    for _ in range(reps):  # interleaved
        for v in variants:
            t0 = time.time()
            got = replay(spark, sf_dir, v)
            times[v].append(time.time() - t0)
            assert got == base[variants[0]]
    for v, ts in times.items():
        ts = sorted(ts)
        label = "default(16)" if v is None else str(v)
        print(
            f"state_partitions={label}: median {ts[len(ts) // 2]:.3f}s  "
            f"all {[round(t, 3) for t in ts]}"
        )
    print("results identical across all variants")


if __name__ == "__main__":
    main()
