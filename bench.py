#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged queries from
whisper_spark.queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect).  A small
untimed warmup runs first so JVM/codegen startup is not attributed to the
first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisper_spark import queries as Q  # noqa: E402
from whisper_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="whisper_spark_bench")

    # warmup: touch every input table once (JVM + codegen + file listing)
    for t in ["events", "lineitem", "orders", "customer", "documents", "embeddings"]:
        try:
            Q.load(spark, sf_dir, t).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, q in Q.QUERIES.items():
        if not q.bench:
            continue
        t0 = time.time()
        rows = q.fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
        _ = len(rows)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
