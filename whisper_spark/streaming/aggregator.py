"""carbon-aggregator: conf-driven CROSS-METRIC aggregation.

The reference ecosystem's carbon-aggregator daemon rewrites and combines
metrics before they reach whisper files, driven by the public
``aggregation-rules.conf`` format::

    <env>.applications.<app>.all.requests (60) = sum <env>.applications.<app>.*.requests

meaning: every metric matching the input pattern (``<name>`` captures a
dot-segment, ``*`` matches one segment) aggregates into the rewritten
output metric on a ``frequency``-second cadence with ``method``
(reference: whisper is carbon's storage layer, README.md:10-18; the
rule grammar is carbon's public conf format).

Spark-first shape: a rule is a *projection* (regex match + capture
substitution — pure column expressions) followed by the standard
watermarked tumbling rollup keyed by the OUTPUT metric.  N rules =
N filtered projections unioned before one windowed aggregation — the
shuffle is on (output metric, window), proportional to matched traffic,
and the same plan works batch (oracle-checked) and streaming.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import folds

_RULE_RE = re.compile(
    r"^\s*(?P<out>\S+)\s*\((?P<freq>\d+)\)\s*=\s*(?P<method>\w+)\s+(?P<inp>\S+)\s*$"
)

#: carbon aggregation methods -> engine aggregates (order-independent /
#: decimal-routed so batch and streaming replays are deterministic)
_METHODS = ("sum", "avg", "max", "min", "count")


@dataclass
class AggregationRule:
    output_template: str
    frequency: int
    method: str
    input_pattern: str

    @property
    def regex(self) -> str:
        """The input pattern as an anchored regex — carbon RuleManager's
        FULL translation (carbon/aggregator/rules.py, public conf
        grammar), with PLAIN numbered groups (Java regex rejects
        Python's ``(?P<...>)`` and the same string must run in Spark AND
        any SQL oracle engine):

        * ``<<name>>`` -> ``(.+)``  — a multi-SEGMENT capture (crosses
          dots), with any literal text before/after it in the segment;
        * ``<name>``   -> ``([^.]+)`` — one dot-segment, again honoring
          pre/post text inside the segment (``cpu<n>.total``);
        * a bare ``*`` segment -> ``[^.]+`` (one non-empty segment);
        * ``*`` embedded in a segment -> ``[^.]*`` (carbon's glob);
        * other segment text passes through verbatim, exactly like
          RuleManager (it does NOT escape literals — conf authors may
          use raw regex fragments inside a segment).

        Round-5 advisor finding: the old translation treated ``<<f>>``
        as single-segment, silently literalized partial-segment captures
        (a rule that matched nothing), and mapped embedded ``*`` to
        ``[^.]+``."""
        parts = []
        for seg in self.input_pattern.split("."):
            if "<<" in seg and ">>" in seg:
                i, j = seg.find("<<"), seg.find(">>")
                parts.append(f"{seg[:i]}(.+){seg[j + 2:]}")
                continue
            i, j = seg.find("<"), seg.find(">")
            if -1 < i < j:
                parts.append(f"{seg[:i]}([^.]+){seg[j + 1:]}")
            elif seg == "*":
                parts.append("[^.]+")
            else:
                parts.append(seg.replace("*", "[^.]*"))
        return "^" + r"\.".join(parts) + "$"

    def _field_names(self) -> list[str]:
        """Capture field names in order of appearance, both forms."""
        return [
            a or b
            for a, b in re.findall(
                r"<<([^<>]+)>>|<([^<>]+)>", self.input_pattern
            )
        ]

    def group_index(self, name: str) -> int:
        """1-based capture index of ``<name>``/``<<name>>`` — order of
        appearance in the input pattern."""
        return self._field_names().index(name) + 1

    def output_metric_expr(self, metric_col: str = "metric"):
        """Column producing the rewritten output metric: template
        literals concatenated with the captured ``<field>`` segments."""
        rx = self.regex
        pieces = []
        for tok in re.split(r"(<<[^<>]+>>|<[^<>]+>)", self.output_template):
            if not tok:
                continue
            if tok.startswith("<") and tok.endswith(">"):
                name = tok.strip("<>")
                pieces.append(
                    F.regexp_extract(
                        F.col(metric_col), rx, self.group_index(name)
                    )
                )
            else:
                pieces.append(F.lit(tok))
        return F.concat(*pieces) if len(pieces) > 1 else pieces[0]


def parse_aggregation_rules(text: str) -> list[AggregationRule]:
    """Parse ``aggregation-rules.conf`` content (public carbon format);
    ``#`` comments and blank lines skipped, file order preserved."""
    rules = []
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        m = _RULE_RE.match(line)
        if not m:
            raise ValueError(f"bad aggregation rule: {line!r}")
        method = m.group("method")
        if method not in _METHODS:
            raise ValueError(
                f"unknown aggregation method {method!r} (want {_METHODS})"
            )
        rules.append(
            AggregationRule(
                output_template=m.group("out"),
                frequency=int(m.group("freq")),
                method=method,
                input_pattern=m.group("inp"),
            )
        )
    return rules


def _method_agg(method: str):
    # sums/averages: sorted float64 fold (functions/folds.py) — full
    # precision AND replay/merge-order deterministic; the state holds the
    # window's value list (bounded by points-per-bucket), the fold is a
    # scalar post-projection over the finalized list
    if method == "sum":
        return folds.fsum("value")
    if method == "avg":
        return folds.fsum("value") / F.count("value")
    if method == "max":
        return F.max("value")
    if method == "min":
        return F.min("value")
    return F.count("value").cast("double")  # count


def _rule_projection(points: DataFrame, rule: AggregationRule) -> DataFrame:
    """Filter + rewrite for one rule: (out_metric, ts, value, freq,
    method) rows for every matching input point — a narrow projection,
    no shuffle."""
    return (
        points.filter(F.col("metric").rlike(rule.regex))
        .select(
            rule.output_metric_expr().alias("metric"),
            "ts",
            "value",
        )
    )


def aggregate_batch(
    points: DataFrame, rules: list[AggregationRule]
) -> DataFrame:
    """Batch twin of :func:`aggregate_stream` (same projections, plain
    groupBy): (metric, ts, value, n_points) — one row per (output
    metric, frequency bucket) per rule.  Buckets are floor-aligned to
    each rule's frequency."""
    outs = []
    for rule in rules:
        proj = _rule_projection(points, rule)
        outs.append(
            proj.groupBy(
                "metric",
                (F.col("ts") - F.col("ts") % rule.frequency).alias("ts"),
            )
            .agg(
                _method_agg(rule.method).alias("value"),
                F.count("value").alias("n_points"),
            )
        )
    df = outs[0]
    for d in outs[1:]:
        df = df.unionByName(d)
    return df


def aggregate_stream(
    points: DataFrame,
    rules: list[AggregationRule],
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming carbon-aggregator: watermarked tumbling windows per
    rule over the rewritten output metrics, append-mode finalized —
    one row per (output metric, bucket) once the watermark passes it.

    Rules with distinct frequencies union AFTER aggregation (windows
    differ); all aggregates are order-independent/decimal-routed, so
    availableNow replays are bit-deterministic.  Output: (metric, ts,
    value, n_points)."""
    outs = []
    for rule in rules:
        proj = _rule_projection(
            points.select(
                "metric", F.col(ts_col).alias("ts"), "value"
            ),
            rule,
        ).withColumn("_evt", F.timestamp_seconds(F.col("ts")))
        outs.append(
            proj.withWatermark("_evt", f"{watermark_seconds} seconds")
            .groupBy(
                "metric",
                F.window("_evt", f"{rule.frequency} seconds").alias("_w"),
            )
            .agg(
                _method_agg(rule.method).alias("value"),
                F.count("value").alias("n_points"),
            )
            .select(
                "metric",
                F.unix_timestamp(F.col("_w.start")).alias("ts"),
                "value",
                "n_points",
            )
        )
    df = outs[0]
    for d in outs[1:]:
        df = df.unionByName(d)
    return df
