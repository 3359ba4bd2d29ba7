"""Streaming pre-aggregation and custom stateful slot state.

Two streaming operators beyond plain ingest (streaming/ingest.py):

* :func:`windowed_rollup` — the carbon-aggregator analog (the reference
  ecosystem pre-aggregates points before they reach whisper files;
  reference README.md:13 describes carbon as the ingest daemon).  A pure
  Structured Streaming plan: event-time watermark + tumbling window +
  the same consolidation functions and xFilesFactor gate as the batch
  rollup (whisper.py:578-664).  Append mode — a window is emitted once,
  when the watermark passes it, so downstream sinks receive finalized
  rollups only.

* :func:`stateful_slot_lww` — whisper's in-place slot overwrite
  (whisper.py:806-808: duplicate intervals resolve to the last write) as
  an ``applyInPandasWithState`` operator: per-metric state holds the
  current (slot -> value, seq) map bounded by retention, and every
  micro-batch emits only the slots whose value CHANGED — the streaming
  changelog of the store.  Built-in windowed aggs can't express
  "re-emit on late overwrite, bounded by retention, dedup by arrival
  order", which is exactly the GroupState fit.

State at scale: both operators shard by metric — state size is
``metrics × slots-in-retention``, independent of stream length, the same
bound as whisper's fixed file size.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..aggregation import aggregate_column
from ..functions import folds


def windowed_rollup(
    points: DataFrame,
    step_seconds: int,
    method: str = "average",
    xff: float = 0.5,
    watermark_seconds: int = 3600,
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window consolidation of a streaming point
    DataFrame (metric, ts[long seconds], value, seq).

    Late points inside the watermark update their window before it is
    finalized; points later than ``watermark_seconds`` are dropped —
    the streaming analog of retention-bounded late acceptance
    (whisper.py:693-696, where a point older than maxRetention is
    rejected).  The xff gate counts received slots against the full
    ``step/1s`` slot budget only when a slot grain is known; here it
    gates on distinct contributing seconds, matching one propagation
    step from 1s resolution (whisper.py:639-640).
    """
    evt = F.timestamp_seconds(F.col(ts_col)).alias("_evt")
    pts = points.select("metric", evt, F.col(ts_col).alias("_sec"), "value", "seq")
    slots = int(step_seconds)  # slot budget at 1s input grain
    # consolidates RAW points per window (carbon-aggregator semantics);
    # the xff fraction counts distinct known seconds against the budget
    out = (
        pts.withWatermark("_evt", f"{watermark_seconds} seconds")
        .groupBy("metric", F.window("_evt", f"{step_seconds} seconds").alias("_w"))
        .agg(
            aggregate_column(
                method, "value", order=F.col("_sec"), expected_slots=slots
            ).alias("value"),
            # count_distinct is unsupported on streaming DFs; the slot
            # cardinality is small (<= step_seconds) so a set is fine
            F.size(F.collect_set(F.col("_sec"))).alias("_known"),
        )
        .filter((F.col("_known") / F.lit(float(slots))) >= F.lit(xff))
        .select(
            "metric",
            F.unix_timestamp(F.col("_w.start")).alias("ts"),
            "value",
            F.col("_known").alias("known"),
        )
    )
    return out


def sliding_rollup(
    points: DataFrame,
    window_seconds: int,
    slide_seconds: int,
    watermark_seconds: int = 600,
    ts_col: str = "sec",
) -> DataFrame:
    """Watermarked SLIDING-window consolidation: each point lands in
    ``window/slide`` overlapping windows (e.g. 5m windows advancing every
    1m — the smoothed-rate view graphite users build with
    movingAverage-over-summarize).  Aggregates are limited to the
    order-independent set (max + count) so an availableNow replay is
    bit-deterministic; append mode emits a window once the watermark
    passes its end.

    Output: (metric, w_start, w_end, max_value, n_events) with epoch-
    second window bounds."""
    pts = points.withColumn("_evt", F.col(ts_col).cast("timestamp"))
    return (
        pts.withWatermark("_evt", f"{watermark_seconds} seconds")
        .groupBy(
            "metric",
            F.window(
                "_evt", f"{window_seconds} seconds", f"{slide_seconds} seconds"
            ).alias("_w"),
        )
        .agg(F.max("value").alias("max_value"), F.count("*").alias("n_events"))
        .select(
            "metric",
            F.col("_w.start").cast("long").alias("w_start"),
            F.col("_w.end").cast("long").alias("w_end"),
            "max_value",
            "n_events",
        )
    )


def _slot_windows(
    points: DataFrame,
    step_seconds: int,
    method: str,
    watermark_seconds: int,
    ts_col: str,
) -> DataFrame:
    """Level-1 of a CHAINED streaming aggregation: watermarked tumbling
    per-slot consolidation that KEEPS the window struct (so level 2 can
    group on ``window_time``).  Restricted to order-independent methods
    — chained append-mode emission must be replay-deterministic."""
    if method not in ("max", "min", "sum", "average"):
        raise ValueError(
            f"chained streaming rollup needs an order-independent "
            f"method, got {method!r}"
        )
    agg = {
        "max": F.max("value"),
        "min": F.min("value"),
        # sorted float64 folds (functions/folds.py): full precision AND
        # bit-identical under any state-merge/arrival order — the old
        # decimal(25,6) route quantized full-precision doubles to 1e-6
        "sum": folds.fsum("value"),
        "average": folds.fsum("value") / F.count("value"),
    }[method]
    evt = F.timestamp_seconds(F.col(ts_col)).alias("_evt")
    return (
        points.select("metric", evt, "value")
        .withWatermark("_evt", f"{watermark_seconds} seconds")
        .groupBy(
            "metric", F.window("_evt", f"{step_seconds} seconds").alias("_w")
        )
        .agg(agg.alias("value"))
    )


def chained_moving_average(
    points: DataFrame,
    n_points: int = 5,
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ``movingAverage``: graphite's cross-slot render
    function, previously rejected by validate_stream_target, expressed
    as CHAINED watermarked aggregations (two stateful operators —
    Spark's multi-stateful-operator append mode).

    Level 1 consolidates raw points into ``step_seconds`` slots
    (keeping the window struct); level 2 groups the finalized slots'
    ``window_time`` into sliding ``n_points * step`` windows advancing
    by one step.  A sliding window ending at T contains exactly the
    ``n_points`` slots [T - n*step, T) — so each output row is
    graphite's movingAverage value FOR slot T (the mean of the
    preceding ``n_points`` consolidated slots), labeled ``ts = T``.

    Emission: a row finalizes when the watermark passes its window end
    (by then every member slot has finalized — member slot ends <=
    window end), so an availableNow replay is bit-deterministic: the
    mean goes through the sorted float64 fold (functions/folds.py).

    Output: (metric, ts, moving_avg, n_slots).  State is bounded by
    ``metrics x windows-inside-watermark`` at each level.
    """
    return chained_moving_window(
        points, n_points, "avg", step_seconds, method,
        watermark_seconds, ts_col,
    ).select(
        "metric", "ts", F.col("value").alias("moving_avg"), "n_slots"
    )


def chained_moving_window(
    points: DataFrame,
    n_points: int = 5,
    func: str = "avg",
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """The full streaming moving-window family — ``movingSum`` /
    ``movingMin`` / ``movingMax`` / ``movingMedian`` (and the ``avg``
    core :func:`chained_moving_average` delegates to): the same chained
    two-stateful-operator shape, one reducer swapped.

    ``func``: 'avg' | 'sum' | 'min' | 'max' | 'median'.  sum/avg run
    through the sorted float64 fold; median is the NEAREST-RANK stored
    value at ``ceil(n * 0.5)`` of the sorted window — exactly the batch
    render language's movingMedian (render.py _moving_median_expr), so
    stream and batch answers agree slot for slot.  Median state keeps
    the window's value list — bounded by ``n_points`` values per
    (metric, window), the same envelope as the fold state.

    Output: (metric, ts, value, n_slots) with ts = window END, the
    movingX label convention.
    """
    aggs = {
        "avg": folds.fsum("value") / F.count("value"),
        "sum": folds.fsum("value"),
        "max": F.max("value"),
        "min": F.min("value"),
        "median": F.expr(
            "element_at(array_sort(collect_list(value)), "
            "greatest(cast(ceil(count(value) * 0.5) as int), 1))"
        ),
    }
    if func not in aggs:
        raise ValueError(
            f"chained_moving_window: func must be one of {sorted(aggs)}, "
            f"got {func!r}"
        )
    slots = _slot_windows(points, step_seconds, method, watermark_seconds, ts_col)
    span = n_points * step_seconds
    return (
        slots.groupBy(
            "metric",
            F.window(
                F.window_time("_w"), f"{span} seconds", f"{step_seconds} seconds"
            ).alias("_w2"),
        )
        .agg(
            aggs[func].alias("value"),
            F.count("value").alias("n_slots"),
        )
        .select(
            "metric",
            F.col("_w2.end").cast("long").alias("ts"),
            "value",
            "n_slots",
        )
    )


def chained_summarize(
    points: DataFrame,
    interval_seconds: int,
    func: str = "sum",
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ``summarize`` with intervals LARGER than the rollup
    step — the second previously-rejected cross-slot render function,
    as chained watermarked aggregations: level 1 consolidates raw
    points into ``step_seconds`` slots with ``method``; level 2
    re-aggregates the finalized slots into tumbling
    ``interval_seconds`` buckets with ``func`` (graphite's
    summarize(series, interval, func) over consolidated data).

    ``func``: 'sum' | 'avg' | 'max' | 'min' — order-independent set
    (sums/averages through the sorted float64 fold), so the
    availableNow replay is bit-deterministic.  Buckets are labeled by
    their START (the graphite summarize convention).

    Output: (metric, ts, value, n_slots).
    """
    aggs = {
        "sum": folds.fsum("value"),
        "avg": folds.fsum("value") / F.count("value"),
        "max": F.max("value"),
        "min": F.min("value"),
    }
    if func not in aggs:
        raise ValueError(f"summarize func must be one of {sorted(aggs)}")
    slots = _slot_windows(points, step_seconds, method, watermark_seconds, ts_col)
    return (
        slots.groupBy(
            "metric",
            F.window(F.window_time("_w"), f"{interval_seconds} seconds").alias(
                "_w2"
            ),
        )
        .agg(aggs[func].alias("value"), F.count("value").alias("n_slots"))
        .select(
            "metric",
            F.col("_w2.start").cast("long").alias("ts"),
            "value",
            "n_slots",
        )
    )


def chained_derivative(
    points: DataFrame,
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    per_second: bool = False,
    ts_col: str = "ts",
    non_negative: bool = False,
    max_value: float | None = None,
) -> DataFrame:
    """Streaming ``derivative`` / ``nonNegativeDerivative`` /
    ``perSecond``: the adjacent-slot difference — the canonical "needs
    ordering across slots" render function — as chained watermarked
    aggregations: level 1 consolidates ``step_seconds`` slots, level 2
    groups their ``window_time`` into 2-slot sliding windows (length
    ``2*step``, slide ``step``).  A window holding BOTH member slots
    emits ``v(t) - v(t-step)`` labeled at the LATER slot ``t``
    (graphite's derivative convention: the first point of a series has
    no value — here a window with one member is simply dropped, same
    effect).

    ``non_negative`` applies graphite's counter-reset rule (negative
    delta -> NULL); ``max_value`` instead reads a negative delta as a
    counter WRAP recovered as ``max_value - prev + cur + 1`` when the
    ceiling is plausible (``max_value >= cur``) — exactly the batch
    language's ``TS.derivative`` (functions/timeseries.py:224).
    ``per_second=True`` is graphite ``perSecond``: the NON-NEGATIVE
    delta divided by the step (batch parity: render.py routes
    perSecond through nonNegativeDerivative, so a counter reset is
    NULL rate, not a negative one).

    max_by/min_by on the slot start are deterministic (slot starts are
    distinct within a window), so the availableNow replay is
    bit-deterministic.  Output: (metric, ts, delta).
    """
    slots = _slot_windows(points, step_seconds, method, watermark_seconds, ts_col)
    span = 2 * step_seconds
    out = (
        slots.groupBy(
            "metric",
            F.window(
                F.window_time("_w"), f"{span} seconds", f"{step_seconds} seconds"
            ).alias("_w2"),
        )
        .agg(
            F.max_by("value", F.col("_w.start")).alias("_later"),
            F.min_by("value", F.col("_w.start")).alias("_earlier"),
            F.count("value").alias("_n"),
        )
        .filter(F.col("_n") == 2)
        .select(
            "metric",
            # later slot start = window end - step
            (F.col("_w2.end").cast("long") - step_seconds).alias("ts"),
            (F.col("_later") - F.col("_earlier")).alias("delta"),
            F.col("_later").alias("_later"),
            F.col("_earlier").alias("_earlier"),
        )
    )
    if max_value is not None:
        out = out.withColumn(
            "delta",
            F.when(F.col("delta") >= 0, F.col("delta")).when(
                F.lit(float(max_value)) >= F.col("_later"),
                F.lit(float(max_value)) - F.col("_earlier")
                + F.col("_later") + 1.0,
            ),
        )
    elif non_negative or per_second:
        out = out.withColumn(
            "delta", F.when(F.col("delta") >= 0, F.col("delta"))
        )
    if per_second:
        out = out.withColumn("delta", F.col("delta") / float(step_seconds))
    return out.drop("_later", "_earlier")


_RECURRENCE_STATE = T.StructType(
    [
        T.StructField("slots", T.ArrayType(T.LongType()), True),
        T.StructField(
            "vals", T.ArrayType(T.ArrayType(T.DoubleType())), True
        ),
        # the recurrence's carry VECTOR: one float for integral/EMA,
        # (level, trend) for Holt, (running, bucket) for per-interval
        T.StructField("carry", T.ArrayType(T.DoubleType()), True),
    ]
)


def _chained_slot_recurrence(
    points: DataFrame,
    step_seconds: int,
    method: str,
    watermark_seconds: int,
    ts_col: str,
    combine,
    out_field: str,
) -> DataFrame:
    """Shared engine for streaming SEQUENTIAL recurrences over finalized
    slots (``integral``, ``exponentialMovingAverage``) — the cross-slot
    render functions a sliding window cannot express (their state spans
    the whole history), run as ``applyInPandasWithState`` with
    event-time timeouts.

    Per-metric state is (pending slot -> value list, carry): incoming
    points accumulate into their ``step_seconds`` slot; a slot FINALIZES
    when the watermark passes its end — finalization applies ``method``
    (max / min / sum / average; sums fold the slot's values SORTED, the
    folds.py convention), then advances the recurrence
    ``carry = combine(carry, slot_value)`` in ascending-slot order and
    emits ``(metric, ts=slot_start, <out_field>=carry)``.  Because the
    watermark is monotone, live finalization order IS slot order, and
    an availableNow replay finalizes everything in one pass in the same
    ascending order — bit-identical carries either way.  Event-time
    timeouts (armed at the earliest pending slot's end) flush slots
    whose metric goes quiet, including the no-data batch that ends an
    availableNow replay.

    State per metric is the bounded pending map — ONE running float per
    pending slot for the scalar methods (max/min fold on ingest), the
    slot's value list for sum/average (points per slot, the envelope
    the chained window ports already carry) — plus ONE carry float,
    which survives indefinitely as the unbounded-series semantics
    require.  Null/NaN points are treated as ABSENT (the F.max
    null-skipping convention of the window ports — also what keeps the
    scalar folds arrival-order-deterministic).  Points later than an
    already-finalized slot are dropped (watermark contract).
    ``combine(carry: list[float] | None, v: float, s: int) ->
    (list[float], float)`` sees ``carry=None`` on the series' first
    slot and returns (the new carry vector, the value to emit); ``s``
    is the slot start, for recurrences keyed on time (per-interval
    resets).
    """
    if method not in ("max", "min", "sum", "average"):
        raise ValueError(
            f"chained streaming rollup needs an order-independent "
            f"method, got {method!r}"
        )
    step = int(step_seconds)
    out_schema = T.StructType(
        [
            T.StructField("metric", T.StringType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField(out_field, T.DoubleType(), True),
        ]
    )

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            slots0, vals0, carry = state.get
            pending = {int(s): list(v) for s, v in zip(slots0, vals0)}
            carry = None if carry is None else [float(c) for c in carry]
        else:
            pending, carry = {}, None
        wm = state.getCurrentWatermarkMs() // 1000
        for pdf in pdfs:  # empty iterator on a timeout invocation
            if not len(pdf):
                continue
            ts = pdf["ts"].to_numpy(dtype="int64")
            vv = pdf["value"].to_numpy(dtype="float64")
            ok = vv == vv  # null/NaN points are absent, like F.max's
            ts, vv = ts[ok], vv[ok]  # null-skipping in the window ports
            sl = ts - ts % step
            for s, lst in pd.Series(vv).groupby(sl).agg(list).items():
                if s + step <= wm:
                    continue  # slot already finalized: late drop
                cur = pending.setdefault(int(s), [])
                if method == "max":
                    # fold scalar methods on ingest: state stays one
                    # float per pending slot, not one per point
                    cur[:] = [max(lst) if not cur else max(cur[0], *lst)]
                elif method == "min":
                    cur[:] = [min(lst) if not cur else min(cur[0], *lst)]
                else:
                    cur.extend(lst)  # sum/average sort-fold at finalize
        out = None
        due = sorted(s for s in pending if s + step <= wm)
        if due:
            rows_ts, rows_v = [], []
            for s in due:
                vs = pending.pop(s)
                if method in ("max", "min"):
                    v = vs[0]
                else:
                    v = 0.0
                    for x in sorted(vs):  # sorted float fold (folds.py)
                        v += x
                    if method == "average":
                        v = v / len(vs)
                carry, emit = combine(carry, v, s)
                rows_ts.append(s)
                rows_v.append(emit)
            out = pd.DataFrame(
                {"metric": key[0], "ts": rows_ts, out_field: rows_v}
            )
        if pending:
            # fire when the watermark REACHES the earliest pending end
            # (Spark fires a timeout when watermark > timestamp, and
            # watermarks here are whole seconds, so end*1000 - 1 ms
            # triggers at exactly wm >= end).  min(pending) survived the
            # finalize pass, so its end is > wm and the timestamp is
            # strictly above the current watermark (the API contract).
            state.setTimeoutTimestamp((min(pending) + step) * 1000 - 1)
        ordered = sorted(pending)
        state.update(
            (
                ordered,
                [pending[s] for s in ordered],
                None if carry is None else [float(c) for c in carry],
            )
        )
        if out is not None:
            yield out

    evt = F.timestamp_seconds(F.col(ts_col)).alias("_evt")
    return (
        points.select("metric", F.col(ts_col).alias("ts"), "value", evt)
        .withWatermark("_evt", f"{watermark_seconds} seconds")
        .groupBy("metric")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_RECURRENCE_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def chained_integral(
    points: DataFrame,
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ``integral``: graphite's UNBOUNDED running sum from the
    start of the series, on the :func:`_chained_slot_recurrence` engine
    (its docstring states the finalization-order and determinism
    contract).  The carry is the running float64 total, advanced
    ``total + v`` in ascending-slot order — the same naive time-order
    fold as the batch language (render.py integral) and the oracle's
    explicit frame-order list fold.

    Output: (metric, ts, integral), ts = the slot's own start label
    (graphite integral keeps each point's timestamp).
    """
    def comb(c, v, s):
        t = (0.0 if c is None else c[0]) + v
        return [t], t

    return _chained_slot_recurrence(
        points, step_seconds, method, watermark_seconds, ts_col,
        comb, "integral",
    )


def chained_ewma(
    points: DataFrame,
    alpha: float = 0.25,
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ``exponentialMovingAverage``: the genuinely SEQUENTIAL
    recurrence ``e_1 = x_1; e_t = alpha*x_t + (1-alpha)*e_{t-1}`` —
    previously rejected outright by validate_stream_target — on the
    :func:`_chained_slot_recurrence` engine: slot finalization order is
    ascending (monotone watermark), which is exactly the order the
    recurrence needs, so the live stream, the availableNow replay, the
    batch language (functions/timeseries.py ewma), and the DuckDB
    recursive-CTE oracle all run the identical float sequence
    ``alpha*x + beta*prev`` (two products, one add, left-to-right) —
    bit-exact across all four.

    Output: (metric, ts, ewma), ts = the slot's start label.
    """
    a = float(alpha)
    b = 1.0 - a

    def comb(c, v, s):
        e = v if c is None else a * v + b * c[0]
        return [e], e

    return _chained_slot_recurrence(
        points, step_seconds, method, watermark_seconds, ts_col,
        comb, "ewma",
    )


def chained_integral_by_interval(
    points: DataFrame,
    interval_seconds: int,
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ``integralByInterval``: the running sum that RESETS at
    each ``interval_seconds`` boundary (graphite's per-day/hour
    accumulator), on the :func:`_chained_slot_recurrence` engine.  The
    carry is (running total, current bucket): a finalized slot whose
    bucket ``s - s % interval`` differs from the carried one restarts
    the sum — same arithmetic as the batch route (render.py
    integralByInterval: bucket-partitioned running window sum).

    Output: (metric, ts, integral), ts = the slot's start label.
    """
    iv = int(interval_seconds)
    if iv <= 0:
        raise ValueError("integralByInterval needs a positive interval")

    def comb(c, v, s):
        bucket = float(s - s % iv)
        t = v if c is None or c[1] != bucket else c[0] + v
        return [t, bucket], t

    return _chained_slot_recurrence(
        points, step_seconds, method, watermark_seconds, ts_col,
        comb, "integral",
    )


def chained_holt_linear(
    points: DataFrame,
    alpha: float = 0.5,
    gamma: float = 0.5,
    step_seconds: int = 60,
    method: str = "max",
    watermark_seconds: int = 600,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming Holt double exponential smoothing — the TWO-variable
    sequential recurrence (functions/timeseries.py holt_linear:
    ``l_1 = x_1, b_1 = 0; l_t = a*x_t + (1-a)*(l+b);
    b_t = g*(l_t - l_prev) + (1-g)*b_t-1``) on the
    :func:`_chained_slot_recurrence` engine with a (level, trend)
    carry vector.  Emits the one-step-ahead ``forecast = level +
    trend`` per finalized slot; every float op is written in the exact
    order the batch recurrence and the recursive-CTE oracle use, so
    all three are bit-identical.

    Output: (metric, ts, forecast), ts = the slot's start label.
    """
    a, na = float(alpha), 1.0 - float(alpha)
    g, ng = float(gamma), 1.0 - float(gamma)

    def comb(c, v, s):
        if c is None:
            lv, bv = v, 0.0
        else:
            prev = c[0]
            lv = a * v + na * (c[0] + c[1])
            bv = g * (lv - prev) + ng * c[1]
        return [lv, bv], lv + bv

    return _chained_slot_recurrence(
        points, step_seconds, method, watermark_seconds, ts_col,
        comb, "forecast",
    )


def sessionize_stream(
    points: DataFrame,
    gap_seconds: int = 1800,
    watermark_seconds: int = 600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization: Spark ``session_window`` (dynamic-gap
    merging windows) per key, watermarked so append mode emits only
    FINALIZED sessions — a session closes when the watermark passes its
    end (= last event + gap).

    Output: (key, t_start, t_end, n_events, max_value) with
    ``t_end = last_event_ts + gap`` (the session_window convention).
    All aggregates are order-independent, so results are deterministic.
    State scales by keys x open-sessions, bounded by the watermark."""
    evt = F.timestamp_seconds(F.col(ts_col)).alias("_evt")
    pts = points.select(F.col(key_col), evt, F.col(value_col))
    return (
        pts.withWatermark("_evt", f"{watermark_seconds} seconds")
        .groupBy(
            key_col, F.session_window("_evt", f"{gap_seconds} seconds").alias("_w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            key_col,
            F.unix_timestamp(F.col("_w.start")).alias("t_start"),
            F.unix_timestamp(F.col("_w.end")).alias("t_end"),
            "n_events",
            "max_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_seconds: int = 600,
) -> DataFrame:
    """Streaming exact deduplication — the ingest-pipeline analog of
    batch ``dropDuplicates``: keeps the first arrival per key and expires
    per-key state once the watermark passes the key's event time.

    The event-time column is part of the dedup key (Spark's requirement
    for watermark-based state cleanup with ``dropDuplicates``), so two
    records count as duplicates when key AND timestamp match — the
    at-least-once-delivery case (same record replayed), not LWW conflict
    resolution (that's :func:`stateful_slot_lww`).

    State is one entry per in-watermark key: bounded by arrival rate x
    watermark, independent of stream length — the property that keeps
    this viable on an unbounded 100 TB/day feed.  Emitted rows pass
    through unchanged (no aggregate), so any downstream sink sees
    each logical record exactly once per watermark window.
    """
    evt = F.timestamp_seconds(F.col(ts_col)).alias("_evt")
    out = (
        events.select(evt, "*")
        .withWatermark("_evt", f"{watermark_seconds} seconds")
        .dropDuplicates(keys + ["_evt"])
    )
    return out.drop("_evt")


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark_seconds: int = 3600,
) -> DataFrame:
    """Stream-stream INNER join on ``key`` where the right event lands in
    ``[left_ts, left_ts + window_seconds]`` — the attribution shape
    (view -> purchase within N hours).

    Both sides get event-time watermarks; the range condition lets Spark
    bound the join state to the window + watermark instead of buffering
    either stream forever — the property that keeps a stream-stream join
    viable on unbounded feeds.  Inner joins emit exactly the matched
    pairs, so with ``availableNow`` replay the result is deterministic.

    Column names must not collide across sides (prefix them first);
    output carries ``_lts``/``_rts`` event-time columns as epoch seconds.
    """
    levt = F.timestamp_seconds(F.col(left_ts)).alias("_levt")
    revt = F.timestamp_seconds(F.col(right_ts)).alias("_revt")
    lt = left.select(levt, "*").withWatermark("_levt", f"{watermark_seconds} seconds")
    rt = (
        right.withColumnRenamed(key, "_rkey")
        .select(revt, "*")
        .withWatermark("_revt", f"{watermark_seconds} seconds")
    )
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col("_revt") >= F.col("_levt"))
        & (F.col("_revt") <= F.col("_levt") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    out = lt.join(rt, cond, "inner")
    return (
        out.withColumn("_lts", F.unix_timestamp("_levt"))
        .withColumn("_rts", F.unix_timestamp("_revt"))
        .drop("_levt", "_revt", "_rkey")
    )


_LWW_OUTPUT = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_LWW_STATE = T.StructType(
    [
        T.StructField("slots", T.ArrayType(T.LongType())),
        T.StructField("values", T.ArrayType(T.DoubleType())),
        T.StructField("seqs", T.ArrayType(T.LongType())),
        T.StructField("max_ts", T.LongType()),
    ]
)


def stateful_slot_lww(
    points: DataFrame,
    step_seconds: int = 1,
    retention_seconds: int = 86400,
) -> DataFrame:
    """Streaming changelog of whisper slot state via
    ``applyInPandasWithState``.

    Input: streaming (metric, ts, value, seq).  Output rows: (metric,
    ts, value) for every step-aligned slot whose value changed in the
    micro-batch — late writes re-emit their slot (whisper's in-place
    overwrite, whisper.py:806-808: ties on a slot resolve to the higher
    seq, i.e. last write wins).  Per-metric state is the (slot -> value,
    seq) map pruned to ``retention_seconds`` behind the newest point —
    the ring buffer's bounded size, kept bounded here the same way.

    Note: an emitted NaN value crosses the pandas->Arrow output boundary
    as NULL (pandas' float64 null sentinel); state keeps the true NaN, so
    change detection is NaN-exact — a slot rewritten with NaN does not
    re-emit.
    """
    step = int(step_seconds)
    ret = int(retention_seconds)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        # fully vectorized (numpy/pandas) — no per-point Python loop; at
        # streaming rates the state function IS the operator's throughput
        # ceiling, so the hot path is: one stable sort by seq, one merge
        # against the state map, one (slot, seq) sort for transition
        # chains, one groupby tail.
        import numpy as np

        if state.exists:
            (slots0, values0, seqs0, max_ts) = state.get
            st = pd.DataFrame(
                {
                    "slot": np.asarray(slots0, dtype="int64"),
                    "_sval": np.asarray(values0, dtype="float64"),
                    "_sseq": np.asarray(seqs0, dtype="int64"),
                }
            )
            max_ts = int(max_ts)
        else:
            st = pd.DataFrame(
                {
                    "slot": np.array([], dtype="int64"),
                    "_sval": np.array([], dtype="float64"),
                    "_sseq": np.array([], dtype="int64"),
                }
            )
            max_ts = 0

        chunks = [p for p in pdfs if len(p)]
        out = None
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            # arrival order = seq order (stable, like the in-place
            # overwrite replay whisper.py:806-808 models)
            pdf = pdf.sort_values("seq", kind="mergesort")
            ts = pdf["ts"].to_numpy(dtype="int64")
            df = pd.DataFrame(
                {
                    "slot": ts - ts % step,
                    "v": pdf["value"].to_numpy(dtype="float64"),
                    "seq": pdf["seq"].to_numpy(dtype="int64"),
                }
            )
            # reject writes older than the slot's stored seq (within the
            # batch, seq-sorted order makes later writes always eligible)
            df = df.merge(st, on="slot", how="left")
            has_state = df["_sseq"].notna().to_numpy()
            df = df[~has_state | (df["seq"] >= df["_sseq"])]
            if len(df):
                max_ts = max(max_ts, int(df["slot"].max()))
                # transition chains: per slot in seq order, a slot emits
                # iff ANY applied write differed from its predecessor
                # (state value seeds the chain); NaN==NaN counts as same
                # so a slot rewritten with NaN does not re-emit
                df = df.sort_values(["slot", "seq"], kind="mergesort")
                sl = df["slot"].to_numpy()
                vv = df["v"].to_numpy()
                sval = df["_sval"].to_numpy()
                has_state = df["_sseq"].notna().to_numpy()
                chain = np.empty(len(df), dtype=bool)
                chain[0] = False
                chain[1:] = sl[1:] == sl[:-1]
                prev = np.where(chain, np.roll(vv, 1), sval)
                had_prev = chain | has_state
                same = had_prev & (
                    (vv == prev) | (np.isnan(vv) & np.isnan(prev))
                )
                grp = df.groupby("slot", sort=False).agg(
                    v=("v", "last"), seq=("seq", "last")
                )
                any_changed = (
                    pd.Series(~same, index=df.index)
                    .groupby(sl, sort=False)
                    .any()
                )
                emit = grp[any_changed.to_numpy()]
                if len(emit):
                    out = pd.DataFrame(
                        {
                            "metric": key[0],
                            "ts": emit.index.to_numpy(dtype="int64"),
                            "value": emit["v"].to_numpy(),
                        }
                    )
                # fold the batch's final (value, seq) per slot into state
                st = (
                    pd.concat(
                        [
                            st[~st["slot"].isin(grp.index)],
                            grp.reset_index().rename(
                                columns={"v": "_sval", "seq": "_sseq"}
                            ),
                        ],
                        ignore_index=True,
                    )
                )
        horizon = max_ts - ret
        st = st[st["slot"] >= horizon]
        state.update(
            (
                [int(s) for s in st["slot"]],
                [float(v) for v in st["_sval"]],
                [int(q) for q in st["_sseq"]],
                int(max_ts),
            )
        )
        if out is not None:
            yield out

    return points.groupBy("metric").applyInPandasWithState(
        fn,
        outputStructType=_LWW_OUTPUT,
        stateStructType=_LWW_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def near_dedup_stream(
    docs: DataFrame,
    window_seconds: int = 3600,
    watermark_seconds: int = 600,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 5,
    id_col: str = "doc_id",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """STREAMING near-duplicate flags: (w_start, doc_id, n_bands) — a doc
    is flagged iff some MinHash-LSH band bucket inside its tumbling
    window contains a SMALLER doc id (the batch families' min-id keep
    rule, so the survivor set is deterministic regardless of arrival
    order — a first-arrival dropDuplicates would not be).

    Shape: the banding is a per-row projection
    (:func:`~whisper_spark.operators.dedup.minhash_bands_expr` — no
    shuffle), then TWO chained watermarked aggregations in append mode
    (Spark >= 3.5 multiple-stateful-operator support): per-(window, band,
    sig) bucket min/members, then per-(window, doc) band count.  State is
    bounded by the watermark on both; bucket membership lists are
    near-dup-proportional, the same reason batch LSH never goes
    all-pairs."""
    from ..operators.dedup import minhash_bands_expr

    b = minhash_bands_expr(text_col, num_hashes, bands, shingle_n)
    exploded = docs.select(
        F.col(id_col),
        F.timestamp_seconds(F.col(ts_col)).alias("_evt"),
        F.explode(b).alias("_b"),
    ).withWatermark("_evt", f"{watermark_seconds} seconds")
    buckets = (
        exploded.groupBy(
            F.window("_evt", f"{window_seconds} seconds").alias("_w"),
            F.col("_b.band_id").alias("_band"),
            F.col("_b.band_sig").alias("_sig"),
        )
        .agg(
            F.min(id_col).alias("_canon"),
            F.collect_set(F.col(id_col)).alias("_members"),
        )
    )
    dups = buckets.select(
        "_w", "_band", F.explode("_members").alias(id_col), "_canon"
    ).filter(F.col(id_col) != F.col("_canon"))
    return (
        dups.groupBy("_w", id_col)
        .agg(F.count("*").alias("n_bands"))
        .select(
            F.unix_timestamp(F.col("_w.start")).alias("w_start"),
            F.col(id_col),
            "n_bands",
        )
    )


def top_metrics_stream(
    points: DataFrame,
    out_path: str,
    step_seconds: int = 60,
    k: int = 5,
    watermark_seconds: int = 600,
    ts_col: str = "ts",
):
    """Per-window top-k metrics by point count — the ops 'top talkers'
    view over the carbon stream.

    One watermarked tumbling count per (metric, window) in APPEND mode,
    then the rank runs per micro-batch: append-mode finalization is
    watermark-atomic, so every metric's count for a window lands in the
    same batch and the batch-local rank equals the batch rank (the same
    argument as streaming/render.py).  Returns the DataStreamWriter;
    output rows (w_start, metric, n_points, rank) append to
    ``out_path`` as parquet."""
    from pyspark.sql import Window

    evt = F.timestamp_seconds(F.col(ts_col)).alias("_evt")
    pts = points.select("metric", evt)
    counts = (
        pts.withWatermark("_evt", f"{watermark_seconds} seconds")
        .groupBy(
            "metric", F.window("_evt", f"{step_seconds} seconds").alias("_w")
        )
        .agg(F.count("*").alias("n_points"))
        .select(
            F.col("_w.start").cast("long").alias("w_start"),
            "metric",
            "n_points",
        )
    )

    def _batch(batch_df: DataFrame, _epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("w_start").orderBy(
            F.desc("n_points"), F.asc("metric")
        )
        top = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        top.write.mode("append").parquet(out_path)

    return counts.writeStream.foreachBatch(_batch).outputMode("append")
