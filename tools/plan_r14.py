#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/r14/<q>_<tag>.txt.

Round-13 optimization evidence: `python tools/plan_r14.py before q1 q2 ...`
(or `all-bench`) writes one file per query so before/after plan diffs are
committable.  Plans render at sf0.001 — plan shape is scale-independent.
Streaming queries (stream_*) execute a replay before a batch frame
exists, so for those the dump is the replayed batch read plan plus a
header note; their plan-shape evidence lives in the streaming module
docs and tests instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_spark import queries as Q  # noqa: E402
from whisper_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["all-bench"]:
        names = [n for n, q in Q.QUERIES.items() if q.bench]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_r14")
    for name in names:
        df = Q.QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        hdr = f"== {name} ({tag}) at {sf_dir} ==\n"
        if name.startswith("stream_"):
            hdr += (
                "NOTE: streaming query — the replay executed during plan "
                "construction; the plan below is the accumulated-output "
                "batch read.\n"
            )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(hdr + plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
