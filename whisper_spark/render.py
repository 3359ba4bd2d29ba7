"""Graphite target-expression language: parser + evaluator.

The reference repo is storage-only (whisper.py has no query language),
but every graphite user queries it through graphite-web's render API
target strings — ``summarize(sumSeries(servers.*.cpu), "15min", "sum")``.
This module implements that public target syntax over the engine's
series frames, so a reference-stack user can run the queries they run
today directly against the Spark store.

Grammar (graphite-web render API, public docs):

    target := call | path
    call   := NAME '(' arg (',' arg)* ')'
    arg    := target | 'string' | "string" | number
    path   := dotted metric glob  (servers.*.cpu, a.{b,c}.d, x?y[0-9])

Evaluation contract: every node evaluates to a **series frame** — a
DataFrame with columns ``(metric STRING, ts LONG, value DOUBLE)`` — and
every function is a pure DataFrame transformation (window / groupBy /
projection; ``exponentialMovingAverage`` routes to the applyInPandas
recurrence).  Aggregating functions accumulate in DECIMAL and round-trip
through string like the rest of the engine (see queries.py determinism
rules), so parsed pipelines stay bit-reproducible and oracle-checkable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions import timeseries as TS

_DEC = "decimal(25,6)"


# --------------------------------------------------------------------- #
# parsing
# --------------------------------------------------------------------- #


@dataclass
class Call:
    name: str
    args: list

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.name}({', '.join(map(repr, self.args))})"


@dataclass
class Path:
    glob: str

    def __repr__(self):  # pragma: no cover - debug aid
        return self.glob


# a word is a function name or metric glob: dotted segments of
# name/glob chars, where a brace alternation {a,b} is one unit (commas
# are argument separators everywhere else)
_TOKEN = re.compile(
    r"""
    \s*(?:
      (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,)
    | (?P<string>'[^']*'|"[^"]*")
    | (?P<number>-?\d+\.\d+|-?\d+)(?![\w.])
    | (?P<word>(?:[\w*?\[\]\-]|\{[^}]*\}|\.)+)
    )""",
    re.X,
)


class TargetSyntaxError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m or m.end() == i:
            raise TargetSyntaxError(f"bad token at {s[i:i+20]!r}")
        kind = m.lastgroup
        text = m.group(kind)
        # a word followed by '(' is a function name; the word regex is
        # greedy over commas inside {a,b} braces, so split a trailing
        # bare comma back out
        out.append((kind, text))
        i = m.end()
    return out


def parse_target(s: str) -> Call | Path:
    """Parse one render target string into an AST."""
    toks = _tokenize(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take(kind=None):
        nonlocal pos
        if pos >= len(toks):
            raise TargetSyntaxError("unexpected end of target")
        k, t = toks[pos]
        if kind and k != kind:
            raise TargetSyntaxError(f"expected {kind}, got {t!r}")
        pos += 1
        return k, t

    def expr():
        k, t = take()
        if k == "word":
            if peek()[0] == "lparen":
                take("lparen")
                args = []
                if peek()[0] != "rparen":
                    args.append(arg())
                    while peek()[0] == "comma":
                        take("comma")
                        args.append(arg())
                take("rparen")
                return Call(t, args)
            return Path(t)
        if k == "string":
            return t[1:-1]
        if k == "number":
            return float(t) if "." in t else int(t)
        raise TargetSyntaxError(f"unexpected {t!r}")

    def arg():
        return expr()

    node = expr()
    if pos != len(toks):
        raise TargetSyntaxError(f"trailing input: {toks[pos:]}")
    if isinstance(node, (str, int, float)):
        raise TargetSyntaxError("target must be a path or function call")
    return node


_DURATION = re.compile(r"^(\d+)(s|min|h|d|w|mon|y)$")
_DUR_SECONDS = {
    "s": 1, "min": 60, "h": 3600, "d": 86400, "w": 604800,
    "mon": 2592000, "y": 31536000,
}


def parse_duration(s: str | int) -> int:
    """'15min' -> 900 (graphite render-API interval syntax)."""
    if isinstance(s, int):
        return s
    m = _DURATION.match(s.strip())
    if not m:
        raise TargetSyntaxError(f"bad duration {s!r}")
    return int(m.group(1)) * _DUR_SECONDS[m.group(2)]


# --------------------------------------------------------------------- #
# evaluation
# --------------------------------------------------------------------- #


def _dsum(col):
    return F.sum(F.col(col).cast(_DEC)).cast("string").cast("double")


def _series_label(df: DataFrame, label: str) -> DataFrame:
    return df.withColumn("metric", F.lit(label))


def _combine(df: DataFrame, label: str, how: str) -> DataFrame:
    """Cross-series combine per timestamp (sumSeries & friends)."""
    g = df.groupBy("ts")
    if how == "sum":
        agg = _dsum("value")
    elif how == "avg":
        agg = _dsum("value") / F.count("value")
    elif how == "max":
        agg = F.max("value")
    elif how == "min":
        agg = F.min("value")
    else:  # pragma: no cover - registry controls `how`
        raise TargetSyntaxError(f"bad combine {how!r}")
    return g.agg(agg.alias("value")).select(
        F.lit(label).alias("metric"), "ts", "value"
    )


def _summarize(df: DataFrame, step: int, how: str) -> DataFrame:
    b = (F.col("ts") - F.col("ts") % step).alias("ts")
    g = df.groupBy("metric", b)
    if how == "sum":
        agg = _dsum("value")
    elif how in ("avg", "average"):
        agg = _dsum("value") / F.count("value")
    elif how == "max":
        agg = F.max("value")
    elif how == "min":
        agg = F.min("value")
    elif how == "last":
        agg = F.max_by("value", "ts")
    else:
        raise TargetSyntaxError(f"bad summarize function {how!r}")
    return g.agg(agg.alias("value")).select("metric", "ts", "value")


def _sw(n: int | None = None):
    w = Window.partitionBy("metric").orderBy("ts")
    return w.rowsBetween(-(n - 1), 0) if n else w


def _moving_avg(df: DataFrame, n: int) -> DataFrame:
    w = _sw(int(n))
    return df.select(
        "metric", "ts",
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("string").cast("double")
            / F.count("value").over(w)
        ).alias("value"),
    )


def _top_by_avg(df: DataFrame, n: int) -> DataFrame:
    ser = df.groupBy("metric").agg(
        (_dsum("value") / F.count("value")).alias("_avg")
    )
    rk = ser.withColumn(
        "_rk", F.row_number().over(Window.orderBy(F.desc("_avg"), F.asc("metric")))
    ).filter(F.col("_rk") <= int(n))
    return df.join(F.broadcast(rk.select("metric")), "metric").select(
        "metric", "ts", "value"
    )


def _sort_by_total(df: DataFrame, n: int | None) -> DataFrame:
    tot = df.groupBy("metric").agg(_dsum("value").alias("_tot"))
    rk = tot.withColumn(
        "_rk", F.row_number().over(Window.orderBy(F.desc("_tot"), F.asc("metric")))
    )
    if n is not None:
        rk = rk.filter(F.col("_rk") <= int(n))
    return df.join(F.broadcast(rk.select("metric")), "metric").select(
        "metric", "ts", "value"
    )


def _alias_by_node(df: DataFrame, *nodes: int) -> DataFrame:
    parts = F.split(F.col("metric"), r"\.")
    label = F.concat_ws(
        ".", *[F.element_at(parts, int(n) + 1) for n in nodes]
    )
    return df.withColumn("metric", label)


def _percentile_of_series(df: DataFrame, p: float, label: str) -> DataFrame:
    """Nearest-rank percentile across series per timestamp.

    NULL slots (gap-filled frames) are excluded before ranking —
    graphite's percentileOfSeries ignores None values, and counting
    them would both shift the nearest-rank index and risk selecting a
    NULL value."""
    w = Window.partitionBy("ts")
    rk = df.filter(F.col("value").isNotNull()).select(
        "ts", "value",
        F.row_number().over(w.orderBy("value", "metric")).alias("_rn"),
        F.count("*").over(w).alias("_n"),
    )
    target = F.ceil(F.col("_n") * float(p) / 100.0).cast("long")
    return rk.filter(F.col("_rn") == F.greatest(target, F.lit(1))).select(
        F.lit(label).alias("metric"), "ts", F.col("value")
    )


def _series_step_col(df: DataFrame) -> DataFrame:
    """Annotate each row with its series' native step (seconds between
    consecutive points), derived from the data itself: the minimum
    positive ts delta per metric.  Two windows on the same partition key
    → one shuffle.  Single-point series (no delta) fall back to 60s —
    graphite's conventional finest step."""
    w_ord = Window.partitionBy("metric").orderBy("ts")
    with_delta = df.withColumn(
        "_delta", F.col("ts") - F.lag("ts").over(w_ord)
    )
    w_all = Window.partitionBy("metric")
    return with_delta.withColumn(
        "_step", F.coalesce(F.min("_delta").over(w_all), F.lit(60))
    ).drop("_delta")


def _evaluate(node, source: DataFrame, text: str, step: int | None = None) -> DataFrame:
    if isinstance(node, Path):
        return TS.filter_metrics(source, node.glob).select("metric", "ts", "value")
    if not isinstance(node, Call):
        raise TargetSyntaxError(f"cannot evaluate literal {node!r}")

    name, args = node.name, node.args

    def series(i=0) -> DataFrame:
        if i >= len(args):
            raise TargetSyntaxError(f"{name}: missing series argument")
        return _evaluate(args[i], source, text, step)

    def need(i: int, what: str):
        if i >= len(args):
            raise TargetSyntaxError(f"{name}: missing argument {i} ({what})")
        return args[i]

    label = f"{name}({', '.join(map(repr, args))})"

    def all_series(start=0) -> DataFrame:
        """Union every series argument from ``start`` on — graphite's
        combine functions accept N seriesLists, not just one."""
        dfs = [
            _evaluate(a, source, text, step)
            for a in args[start:]
            if isinstance(a, (Path, Call))
        ]
        if not dfs:
            raise TargetSyntaxError(f"{name}: needs at least one series")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    if name in ("sumSeries", "sum"):
        return _combine(all_series(), label, "sum")
    if name in ("averageSeries", "avg"):
        return _combine(all_series(), label, "avg")
    if name == "maxSeries":
        return _combine(all_series(), label, "max")
    if name == "minSeries":
        return _combine(all_series(), label, "min")
    if name == "rangeOfSeries":
        return (
            all_series()
            .groupBy("ts")
            .agg((F.max("value") - F.min("value")).alias("value"))
            .select(F.lit(label).alias("metric"), "ts", "value")
        )
    if name == "countSeries":
        return (
            all_series()
            .groupBy("ts")
            .agg(F.count("value").cast("double").alias("value"))
            .select(F.lit(label).alias("metric"), "ts", "value")
        )
    if name == "stddevSeries":
        # population stddev across series per timestamp (graphite uses
        # the population form)
        return (
            all_series()
            .groupBy("ts")
            .agg(F.stddev_pop("value").alias("value"))
            .select(F.lit(label).alias("metric"), "ts", "value")
        )
    if name == "diffSeries":
        # first seriesList minus the sum of the rest; None others count
        # as 0, a None minuend stays None (graphite safeDiff)
        first = (
            series()
            .groupBy("ts")
            .agg(_dsum("value").alias("_a"))
        )
        rest = (
            all_series(1)
            .groupBy("ts")
            .agg(_dsum("value").alias("_b"))
        )
        return (
            first.join(rest, "ts", "left")
            .select(
                F.lit(label).alias("metric"), "ts",
                (F.col("_a") - F.coalesce(F.col("_b"), F.lit(0.0))).alias("value"),
            )
        )
    if name == "divideSeries":
        dividend = series().groupBy("ts").agg(_dsum("value").alias("_a"))
        divisor = series(1).groupBy("ts").agg(_dsum("value").alias("_b"))
        return (
            dividend.join(divisor, "ts", "left")
            .select(
                F.lit(label).alias("metric"), "ts",
                F.when(
                    F.col("_b").isNotNull() & (F.col("_b") != 0.0),
                    F.col("_a") / F.col("_b"),
                ).alias("value"),
            )
        )
    if name == "multiplySeries":
        prod = all_series().groupBy("ts").agg(
            F.product("value").alias("value"), F.count("*").alias("_n")
        )
        n_series = len(args)
        # a ts missing from any input series yields None (graphite
        # safeMul over aligned slots)
        return prod.select(
            F.lit(label).alias("metric"), "ts",
            F.when(F.col("_n") == n_series, F.col("value")).alias("value"),
        )
    if name == "summarize":
        bucket = parse_duration(need(1, "interval"))
        how = args[2] if len(args) > 2 else "sum"
        return _summarize(series(), bucket, how)
    if name == "hitcount":
        bucket = parse_duration(need(1, "interval"))
        base = series()
        if step is not None:
            # caller threaded the fetch step through (CLI render path) —
            # multiply by it directly, no extra window needed
            base = base.withColumn("_step", F.lit(step))
        else:
            base = _series_step_col(base)
        scaled = base.withColumn(
            "value",
            (F.col("value").cast(_DEC) * F.col("_step"))
            .cast("string")
            .cast("double"),
        ).select("metric", "ts", "value")
        return _summarize(scaled, bucket, "sum")
    if name == "movingAverage":
        return _moving_avg(series(), int(need(1, "windowSize")))
    if name in ("movingSum", "movingMax", "movingMin", "movingMedian"):
        n = int(need(1, "windowSize"))
        w = _sw(n)
        if name == "movingSum":
            val = (
                F.sum(F.col("value").cast(_DEC)).over(w)
                .cast("string").cast("double")
            )
        elif name == "movingMax":
            val = F.max("value").over(w)
        elif name == "movingMin":
            val = F.min("value").over(w)
        else:
            # nearest-rank median of the trailing frame: a stored value,
            # no interpolation (engine-exact like percentileOfSeries)
            val = F.expr(
                "element_at(array_sort(collect_list(value) "
                f"OVER (PARTITION BY metric ORDER BY ts "
                f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)), "
                "greatest(cast(ceil(size(collect_list(value) "
                f"OVER (PARTITION BY metric ORDER BY ts "
                f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)) * 0.5) "
                "as int), 1))"
            )
        return series().select("metric", "ts", val.alias("value"))
    if name == "asPercent":
        # each series as a percentage of the per-ts total (the one-arg
        # graphite form)
        df = series()
        w = Window.partitionBy("ts")
        tot = (
            F.sum(F.col("value").cast(_DEC)).over(w)
            .cast("string").cast("double")
        )
        return df.select(
            "metric", "ts",
            F.when(tot != 0.0, F.col("value") / tot * 100.0).alias("value"),
        )
    if name == "offsetToZero":
        w = Window.partitionBy("metric")
        return series().select(
            "metric", "ts",
            (F.col("value") - F.min("value").over(w)).alias("value"),
        )
    if name == "derivative":
        return (
            TS.derivative(series(), ["metric"], out_col="_d")
            .select("metric", "ts", F.col("_d").alias("value"))
        )
    if name == "nonNegativeDerivative":
        return (
            TS.derivative(series(), ["metric"], out_col="_d", non_negative=True)
            .select("metric", "ts", F.col("_d").alias("value"))
        )
    if name == "keepLastValue":
        return TS.keep_last_value(series(), ["metric"])
    if name == "integral":
        dec = series().withColumn("value", F.col("value").cast(_DEC))
        out = TS.integral(dec, ["metric"], out_col="_r")
        return out.select(
            "metric", "ts",
            F.col("_r").cast("string").cast("double").alias("value"),
        )
    if name == "timeShift":
        return TS.time_shift(series(), parse_duration(need(1, "timeShift")))
    if name == "scale":
        return series().withColumn("value", F.col("value") * float(need(1, "factor")))
    if name == "offset":
        return series().withColumn("value", F.col("value") + float(need(1, "factor")))
    if name == "absolute":
        return series().withColumn("value", F.abs(F.col("value")))
    if name == "removeAboveValue":
        return series().withColumn(
            "value", F.when(F.col("value") <= float(need(1, "n")), F.col("value"))
        )
    if name == "removeBelowValue":
        return series().withColumn(
            "value", F.when(F.col("value") >= float(need(1, "n")), F.col("value"))
        )
    if name == "highestAverage":
        return _top_by_avg(series(), int(need(1, "n")))
    if name == "sortByTotal":
        return _sort_by_total(series(), None)
    if name == "limit":
        # graphite's limit keeps the FIRST n series of the list — list
        # order for a glob fetch is metric-name order, not total-ranked
        n = int(need(1, "n"))
        w = Window.orderBy("metric")
        keep = (
            series()
            .select("metric")
            .distinct()
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .select("metric")
        )
        return series().join(F.broadcast(keep), "metric").select(
            "metric", "ts", "value"
        )
    if name == "exponentialMovingAverage":
        # graphite-web semantics: the 2nd arg is a WINDOW SIZE (number of
        # points, or a duration string), and alpha = 2/(windowSize+1) —
        # NOT a raw alpha.  Duration windows need the series step to
        # convert to points: use the threaded fetch step when available,
        # else 60s (graphite's conventional finest step).
        ws = need(1, "windowSize")
        if isinstance(ws, str):
            n = max(1, parse_duration(ws) // (step or 60))
        else:
            n = int(ws)
            if n < 1:
                raise TargetSyntaxError(
                    f"exponentialMovingAverage: windowSize must be >= 1, got {ws!r}"
                )
        alpha = 2.0 / (n + 1.0)
        out = TS.ewma(series(), ["metric"], alpha=alpha)
        return out.select("metric", "ts", F.col("ewma").alias("value"))
    if name == "groupByNode":
        node_idx = int(need(1, "node"))
        method = args[2] if len(args) > 2 else "average"
        out = TS.group_by_node(series(), node_idx, method=method)
        return out.select("metric", "ts", "value")
    if name == "alias":
        return _series_label(series(), need(1, "newName"))
    if name == "aliasByNode":
        return _alias_by_node(series(), *args[1:])
    if name == "percentileOfSeries":
        return _percentile_of_series(series(), float(need(1, "n")), label)
    if name == "transformNull":
        default = float(args[1]) if len(args) > 1 else 0.0
        return series().withColumn(
            "value", F.coalesce(F.col("value"), F.lit(default))
        )
    if name == "isNonNull":
        return series().withColumn(
            "value", F.col("value").isNotNull().cast("double")
        )
    if name == "invert":
        return series().withColumn(
            "value",
            F.when(F.col("value") != 0.0, F.lit(1.0) / F.col("value")),
        )
    if name == "logarithm":
        base = float(args[1]) if len(args) > 1 else 10.0
        return series().withColumn(
            "value",
            F.when(F.col("value") > 0.0, F.log(base, F.col("value"))),
        )
    if name == "squareRoot":
        return series().withColumn(
            "value", F.when(F.col("value") >= 0.0, F.sqrt(F.col("value")))
        )
    if name in ("pow", "powSeries"):
        return series().withColumn(
            "value", F.pow(F.col("value"), F.lit(float(need(1, "factor"))))
        )
    if name == "perSecond":
        # nonNegativeDerivative divided by the per-slot time delta
        d = TS.derivative(series(), ["metric"], out_col="_d", non_negative=True)
        w = Window.partitionBy("metric").orderBy("ts")
        return d.select(
            "metric", "ts",
            (F.col("_d") / (F.col("ts") - F.lag("ts").over(w))).alias("value"),
        )
    if name == "delay":
        steps = int(need(1, "steps"))
        w = Window.partitionBy("metric").orderBy("ts")
        return series().select(
            "metric", "ts", F.lag("value", steps).over(w).alias("value")
        )
    if name in (
        "averageAbove", "averageBelow", "currentAbove", "currentBelow",
        "maximumAbove", "maximumBelow", "minimumAbove", "minimumBelow",
    ):
        n = float(need(1, "n"))
        df = series()
        if name.startswith("average"):
            stat = (_dsum("value") / F.count("value")).alias("_s")
        elif name.startswith("current"):
            stat = F.max_by("value", F.when(F.col("value").isNotNull(), F.col("ts"))).alias("_s")
        elif name.startswith("maximum"):
            stat = F.max("value").alias("_s")
        else:
            stat = F.min("value").alias("_s")
        keep = df.groupBy("metric").agg(stat)
        cond = F.col("_s") >= n if name.endswith("Above") else F.col("_s") <= n
        return df.join(
            F.broadcast(keep.filter(cond).select("metric")), "metric"
        ).select("metric", "ts", "value")
    if name in ("highestCurrent", "lowestCurrent", "highestMax", "lowestAverage"):
        n = int(need(1, "n"))
        df = series()
        if name == "highestMax":
            stat = F.max("value").alias("_s")
        elif name == "lowestAverage":
            stat = (_dsum("value") / F.count("value")).alias("_s")
        else:
            stat = F.max_by(
                "value", F.when(F.col("value").isNotNull(), F.col("ts"))
            ).alias("_s")
        ranked = df.groupBy("metric").agg(stat)
        order = (
            [F.asc("_s"), F.asc("metric")]
            if name.startswith("lowest")
            else [F.desc("_s"), F.asc("metric")]
        )
        keep = (
            ranked.withColumn("_rk", F.row_number().over(Window.orderBy(*order)))
            .filter(F.col("_rk") <= n)
            .select("metric")
        )
        return df.join(F.broadcast(keep), "metric").select("metric", "ts", "value")
    if name == "nPercentile":
        # per-series constant line at the nearest-rank percentile
        p = float(need(1, "n"))
        w = Window.partitionBy("metric")
        rk = series().filter(F.col("value").isNotNull()).select(
            "metric", "ts", "value",
            F.row_number().over(w.orderBy("value", "ts")).alias("_rn"),
            F.count("*").over(w).alias("_n"),
        )
        target = F.greatest(
            F.ceil(F.col("_n") * p / 100.0).cast("long"), F.lit(1)
        )
        thr = rk.filter(F.col("_rn") == target).select(
            "metric", F.col("value").alias("_p")
        )
        return (
            series()
            .join(F.broadcast(thr), "metric")
            .select("metric", "ts", F.col("_p").alias("value"))
        )
    if name == "aliasSub":
        pat, repl = str(need(1, "search")), str(need(2, "replace"))
        return series().withColumn(
            "metric", F.regexp_replace("metric", pat, repl)
        )
    if name in (
        "holtWintersForecast",
        "holtWintersConfidenceBands",
        "holtWintersAberration",
    ):
        # graphite-web holtwinters.py public defaults: alpha=0.1,
        # beta=0.0035, gamma=0.1, one-day season at the series step
        season = max(1, 86400 // (step or 60))
        hw = TS.holt_winters(
            series(), ["metric"], alpha=0.1, beta=0.0035, gamma=0.1,
            season_length=season, band_k=3.0,
        )
        if name == "holtWintersForecast":
            return hw.select("metric", "ts", F.col("forecast").alias("value"))
        if name == "holtWintersConfidenceBands":
            up = hw.select(
                F.concat(F.lit("upper("), "metric", F.lit(")")).alias("metric"),
                "ts", F.col("upper").alias("value"),
            )
            lo = hw.select(
                F.concat(F.lit("lower("), "metric", F.lit(")")).alias("metric"),
                "ts", F.col("lower").alias("value"),
            )
            return up.unionByName(lo)
        # aberration: how far the value strays OUTSIDE the bands
        return hw.select(
            "metric", "ts",
            F.when(F.col("value") > F.col("upper"),
                   F.col("value") - F.col("upper"))
            .when(F.col("value") < F.col("lower"),
                  F.col("value") - F.col("lower"))
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    raise TargetSyntaxError(f"unknown function {name!r}")


def evaluate_target(
    source: DataFrame, target: str, step: int | None = None
) -> DataFrame:
    """Evaluate a graphite render target over a series frame.

    ``source`` must carry ``(metric STRING, ts LONG, value DOUBLE)`` —
    e.g. a store fetch timeline or any rollup view.  Returns the same
    shape.  ``step``: the fetch step in seconds, when known (the CLI
    render path passes the step ``store.fetch`` returns) — used by
    step-dependent functions (``hitcount``'s rate→count multiply,
    ``exponentialMovingAverage``'s duration-window→points conversion).
    When omitted, those functions derive a per-series step from the
    data's ts deltas (hitcount) or assume 60s (EMA duration windows)."""
    return _evaluate(parse_target(target), source, target, step)


FUNCTIONS = [
    "sumSeries", "sum", "averageSeries", "avg", "maxSeries", "minSeries",
    "summarize", "hitcount", "movingAverage", "derivative",
    "nonNegativeDerivative", "keepLastValue", "integral", "timeShift",
    "scale", "offset", "absolute", "removeAboveValue", "removeBelowValue",
    "highestAverage", "sortByTotal", "limit", "exponentialMovingAverage",
    "groupByNode", "alias", "aliasByNode", "percentileOfSeries",
    "holtWintersForecast", "holtWintersConfidenceBands",
    "holtWintersAberration",
    "rangeOfSeries", "countSeries", "stddevSeries", "diffSeries",
    "divideSeries", "multiplySeries",
    "transformNull", "isNonNull", "invert", "logarithm", "squareRoot",
    "pow", "perSecond", "delay",
    "averageAbove", "averageBelow", "currentAbove", "currentBelow",
    "maximumAbove", "maximumBelow", "minimumAbove", "minimumBelow",
    "highestCurrent", "lowestCurrent", "highestMax", "lowestAverage",
    "nPercentile", "aliasSub",
    "movingSum", "movingMax", "movingMin", "movingMedian",
    "asPercent", "offsetToZero",
]
