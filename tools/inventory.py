#!/usr/bin/env python
"""Generate INVENTORY.md: every declared oracle pair with its one-line
doc, grouped by family — the line-by-line index for SURVEY.md §2
coverage checks.  Run after adding queries and commit the output."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_spark import queries as Q  # noqa: E402

# ----------------------------------------------------------------- #
# The PUBLIC graphite-web 1.1 render-function index (the functions
# documented in graphite-web 1.1's docs/functions.rst, including the
# pie-mode reducers).  The audit table below marks each as dispatched
# by whisper_spark.render (enforced per-name by
# tests/test_plan_properties.py and tests/test_render_functions.py)
# or documented-out with the reason.
# ----------------------------------------------------------------- #
GRAPHITE_11_INDEX = [
    "absolute", "add", "aggregate", "aggregateLine",
    "aggregateSeriesLists",
    "aggregateWithWildcards", "alias", "aliasByMetric", "aliasByNode",
    "aliasByTags", "aliasQuery", "aliasSub", "alpha", "applyByNode",
    "areaBetween", "asPercent", "averageAbove", "averageBelow",
    "averageOutsidePercentile", "averageSeries",
    "averageSeriesWithWildcards", "cactiStyle", "changed", "color",
    "compressPeriodicGaps", "consolidateBy", "constantLine",
    "countSeries", "cumulative", "currentAbove", "currentBelow",
    "dashed", "delay", "derivative", "diffSeries", "diffSeriesLists",
    "divideSeries", "divideSeriesLists", "drawAsInfinite", "events",
    "exclude", "exp", "exponentialMovingAverage", "fallbackSeries",
    "filterSeries", "grep", "group", "groupByNode", "groupByNodes",
    "groupByTags", "highest", "highestAverage", "highestCurrent",
    "highestMax", "hitcount", "holtWintersAberration",
    "holtWintersConfidenceArea", "holtWintersConfidenceBands",
    "holtWintersForecast", "identity", "integral", "integralByInterval",
    "interpolate", "invert", "isNonNull", "keepLastValue",
    "legendValue", "limit", "linearRegression", "lineWidth",
    "logarithm", "logit", "lowest", "lowestAverage", "lowestCurrent",
    "mapSeries", "maxSeries", "maximumAbove", "maximumBelow", "minMax",
    "minSeries", "minimumAbove", "minimumBelow", "mostDeviant",
    "movingAverage", "movingMax", "movingMedian", "movingMin",
    "movingSum", "movingWindow", "multiplySeries",
    "multiplySeriesLists", "multiplySeriesWithWildcards", "nPercentile",
    "nonNegativeDerivative", "offset", "offsetToZero", "perSecond",
    "percentileOfSeries", "pow", "powSeries", "randomWalkFunction",
    "rangeOfSeries", "reduceSeries", "removeAbovePercentile",
    "removeAboveValue", "removeBelowPercentile", "removeBelowValue",
    "removeBetweenPercentile", "removeEmptySeries", "round", "scale",
    "scaleToSeconds", "secondYAxis", "seriesByTag", "setXFilesFactor",
    "sigmoid", "sinFunction", "smartSummarize", "sortBy",
    "sortByMaxima", "sortByMinima", "sortByName", "sortByTotal",
    "squareRoot", "stacked", "stddevSeries", "stdev", "substr",
    "sumSeries", "sumSeriesLists", "sumSeriesWithWildcards",
    "summarize", "threshold", "timeFunction", "timeShift", "timeSlice",
    "timeStack", "transformNull", "unique", "useSeriesAbove",
    "verticalLine", "weightedAverage", "xFilesFactor",
    "pieAverage", "pieMaximum", "pieMinimum",
]

#: index entries deliberately not implemented, with the reason
GRAPHITE_DOCUMENTED_OUT = {
    "events": "reads the graphite-web Django app's Events database "
    "table, not series data — a web-app feature with no "
    "storage/compute-engine equivalent",
}

#: documented short aliases the repo also dispatches (docs list them
#: under their long names)
GRAPHITE_ALIASES = {
    "sum": "sumSeries", "avg": "averageSeries", "log": "logarithm",
    "time": "timeFunction", "sin": "sinFunction",
    "randomWalk": "randomWalkFunction", "map": "mapSeries",
    "reduce": "reduceSeries", "roundFunction": "round",
}

FAMILIES = [
    ("ws_", "Whisper store surface (create/update/rollup/fetch/merge/"
     "diff/fill/resize/render/sharding)"),
    ("q", "TPC-H relational shapes (adapted to the testdata schema)"),
    ("ev_", "Events analytics (sessionization, as-of, funnels, top-k)"),
    ("doc_", "Document pipeline (dedup families, text analysis, "
     "chunking, splits, curation capstones)"),
    ("emb_", "Embedding pipeline (ANN, quantization, recall gates, "
     "covariance/PCA, semantic dedup)"),
    ("mm_", "Multimodal (header decode, frame sampling, sharding, "
     "feature ANN)"),
    ("stream_", "Structured Streaming (rollup, sessions, dedup, state, "
     "render, heavy hitters)"),
]


def family_of(name: str) -> int:
    for i, (prefix, _d) in enumerate(FAMILIES):
        if prefix == "q":
            if name[0] == "q" and name[1].isdigit():
                return i
        elif name.startswith(prefix):
            return i
    return len(FAMILIES)


def main() -> None:
    rows: dict[int, list] = {}
    for name, q in Q.QUERIES.items():
        doc = " ".join((q.fn.__doc__ or q.doc or "").split())
        if not doc:
            doc = " ".join((q.doc or "").split())
        rows.setdefault(family_of(name), []).append((name, q, doc))
    out = [
        "# INVENTORY — declared oracle pairs",
        "",
        f"Generated by `tools/inventory.py`: {len(Q.QUERIES)} queries, "
        f"{sum(1 for q in Q.QUERIES.values() if q.sql is not None)} with "
        "DuckDB oracle SQL.  The driver checks the first 50 registered; "
        "`tools/check_correctness.py` sweeps them all.",
        "",
    ]
    for i, (_prefix, desc) in enumerate(FAMILIES):
        group = rows.get(i, [])
        if not group:
            continue
        out.append(f"## {desc} ({len(group)})")
        out.append("")
        for name, q, doc in sorted(group):
            oracle = "oracle" if q.sql is not None else "rows-only"
            short = (q.doc or doc).split(".")[0].strip()
            short = " ".join(short.split())
            if len(short) > 180:
                short = short[:177] + "..."
            out.append(f"- `{name}` ({oracle}) — {short}")
        out.append("")
    leftover = rows.get(len(FAMILIES), [])
    if leftover:
        out.append(f"## Other ({len(leftover)})")
        out.append("")
        for name, q, doc in sorted(leftover):
            short = " ".join((q.doc or doc).split(".")[0].split())[:180]
            out.append(f"- `{name}` — {short}")
        out.append("")

    # render-function coverage vs the public graphite-web 1.1 index
    from whisper_spark.render import FUNCTIONS  # noqa: E402

    dispatched = set(FUNCTIONS)
    n_disp = sum(
        1 for f in GRAPHITE_11_INDEX
        if f in dispatched and f not in GRAPHITE_DOCUMENTED_OUT
    )
    out.append(
        f"## Render-function coverage vs graphite-web 1.1 "
        f"({n_disp}/{len(GRAPHITE_11_INDEX)} dispatched, "
        f"{len(GRAPHITE_DOCUMENTED_OUT)} documented-out)"
    )
    out.append("")
    out.append(
        "Audit of `whisper_spark.render.FUNCTIONS` against the public "
        "graphite-web 1.1 function index (docs/functions.rst incl. "
        "pie-mode reducers).  Every dispatched name is enforced to "
        "reach a real evaluation branch by "
        "`tests/test_plan_properties.py`; the index-coverage split "
        "itself is enforced by `tests/test_render_functions.py`."
    )
    out.append("")
    out.append("| graphite-web 1.1 function | status |")
    out.append("|---|---|")
    missing = []
    for f in GRAPHITE_11_INDEX:
        if f in GRAPHITE_DOCUMENTED_OUT:
            out.append(f"| `{f}` | documented-out — "
                       f"{GRAPHITE_DOCUMENTED_OUT[f]} |")
        elif f in dispatched:
            out.append(f"| `{f}` | dispatched |")
        else:
            missing.append(f)
            out.append(f"| `{f}` | **MISSING** |")
    alias_rows = sorted(
        (a, t) for a, t in GRAPHITE_ALIASES.items() if a in dispatched
    )
    if alias_rows:
        out.append("")
        out.append(
            "Documented short aliases also dispatched: "
            + ", ".join(f"`{a}` (= `{t}`)" for a, t in alias_rows)
            + "."
        )
    extras = sorted(
        dispatched - set(GRAPHITE_11_INDEX) - set(GRAPHITE_ALIASES)
    )
    if extras:
        out.append("")
        out.append(
            "Dispatched beyond the index (repo conveniences): "
            + ", ".join(f"`{e}`" for e in extras) + "."
        )
    out.append("")
    if missing:
        print(f"WARNING: index functions not dispatched: {missing}")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INVENTORY.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(Q.QUERIES)} queries)")


if __name__ == "__main__":
    main()
