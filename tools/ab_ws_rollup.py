#!/usr/bin/env python
"""A/B: ws_rollup single-exchange fused variant vs the two-level cascade
(VERDICT r13 "Next round" #6).

The declared ws_rollup_1m_avg plan is a two-level cascade:

    events -> Exchange(metric, ts)      -> LWW max_by per second
           -> Exchange(metric, minute)  -> decimal-avg per minute

The fused variant groups ONCE by (metric, minute) — a single exchange —
and performs the per-second LWW inside the group with an array fold:
collect_list(struct(s, q, v)), sort by (s asc, q desc), then one
aggregate() pass that takes the first row per second (the max-seq write)
into an exact decimal(35,6) accumulator.  Decimal addition is exact and
order-independent, and SUM(decimal(25,6)) promotes to decimal(35,6), so
the fold reproduces dsum() bit-for-bit.

Trade being measured (guide section 2.3/2.4): one exchange fewer, but the
map side ships EVERY raw (s, q, v) row — collect_list has no reducing
partial aggregation, while the cascade's first exchange ships rows
already combined by max_by within each map partition.

Usage:
    python tools/ab_ws_rollup.py check   # bit-exact equivalence, sf0.01 + sf0.001
    python tools/ab_ws_rollup.py time    # interleaved noop-sink A/B at sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from whisper_spark import queries as Q  # noqa: E402
from whisper_spark.session import get_spark  # noqa: E402


def min1_fused(spark, sf_dir):
    """min1 with ONE exchange: groupBy(metric, minute) + in-group LWW fold."""
    pts = Q.events_points(spark, sf_dir)
    grouped = pts.groupBy(
        "metric", (F.col("ts") - F.col("ts") % 60).alias("ts")
    ).agg(
        F.collect_list(
            F.struct(
                F.col("ts").alias("s"),
                F.col("seq").alias("q"),
                F.col("value").alias("v"),
            )
        ).alias("rows")
    )
    # sort (s asc, q desc): the first row of each second is its LWW write
    sorted_rows = F.array_sort(
        "rows",
        lambda a, b: F.when(a["s"] < b["s"], F.lit(-1))
        .when(a["s"] > b["s"], F.lit(1))
        .when(a["q"] > b["q"], F.lit(-1))
        .when(a["q"] < b["q"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    zero = F.struct(
        F.lit(0).cast("decimal(35,6)").alias("acc"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(None).cast("long").alias("last_s"),
    )
    folded = F.aggregate(
        sorted_rows,
        zero,
        lambda acc, x: F.when(
            acc["last_s"].isNull() | (x["s"] != acc["last_s"]),
            F.struct(
                (acc["acc"] + x["v"].cast("decimal(25,6)"))
                .cast("decimal(35,6)")
                .alias("acc"),
                (acc["cnt"] + 1).alias("cnt"),
                x["s"].alias("last_s"),
            ),
        ).otherwise(acc),
    )
    return grouped.select(
        "metric",
        "ts",
        (folded["acc"].cast("string").cast("double") / folded["cnt"]).alias(
            "avg_v"
        ),
        folded["cnt"].alias("known"),
    )


def rollup_1h_xff_fused(spark, sf_dir):
    """ws_rollup_1h_xff on the fused min1: 3 exchanges -> 2."""
    from whisper_spark.functions import folds

    m = min1_fused(spark, sf_dir)
    return (
        m.groupBy("metric", (F.col("ts") - F.col("ts") % 3600).alias("ts"))
        .agg(
            (folds.fsum("avg_v") / F.count("avg_v")).alias("avg_v"),
            F.count("avg_v").alias("known"),
        )
        .filter(F.col("known") / F.lit(60.0) >= 0.05)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def check():
    spark = get_spark(app_name="ab_ws_rollup_check")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        a = _rows(Q.QUERIES["ws_rollup_1m_avg"].fn(spark, sf))
        b = _rows(min1_fused(spark, sf))
        assert a == b, f"min1 fused mismatch at {sf}: {len(a)} vs {len(b)}"
        c = _rows(Q.QUERIES["ws_rollup_1h_xff"].fn(spark, sf))
        d = _rows(rollup_1h_xff_fused(spark, sf))
        assert c == d, f"1h_xff fused mismatch at {sf}"
        print(f"{sf}: min1 {len(a)} rows identical; 1h_xff {len(c)} rows identical")
    print("CHECK OK — fused variants bit-exact")


def time_ab():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab_ws_rollup_time",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "16",
        },
    )
    variants = {
        "1m_cascade": lambda: Q.QUERIES["ws_rollup_1m_avg"].fn(spark, sf),
        "1m_fused": lambda: min1_fused(spark, sf),
        "1h_cascade": lambda: Q.QUERIES["ws_rollup_1h_xff"].fn(spark, sf),
        "1h_fused": lambda: rollup_1h_xff_fused(spark, sf),
    }
    # warmup every variant once
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()
    times = {k: [] for k in variants}
    for _ in range(5):  # interleaved so host drift hits all variants alike
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab_ws_rollup {k}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"{k}: median {ts[len(ts)//2]:.3f}s  all {[round(t,3) for t in ts]}")


if __name__ == "__main__":
    {"check": check, "time": time_ab}[sys.argv[1]]()
