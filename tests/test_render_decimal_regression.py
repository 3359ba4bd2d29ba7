"""Pinned regression for the round-5 decimal(25,6) quantization defect.

The render evaluator's old "order-independent sum" route cast every
addend to decimal(25,6), silently ROUNDING full-precision doubles to
1e-6 — invisible on 6-decimal testdata, wrong for any composed target
producing irrational values (round-5 verdict, confirmed reproduction:
``movingAverage(squareRoot(m), 1)`` on value 0.5 returned 0.707107
where graphite float semantics give 0.7071067811865476).

These are plain deterministic tests (no hypothesis) so the falsifying
examples stay pinned forever.
"""

from __future__ import annotations

import math

import pytest

from whisper_spark.render import evaluate_target


def _frame(spark, values, metric="m", step=60):
    rows = [(metric, i * step, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def _vals(df):
    return {r.ts: r.value for r in df.collect()}


def test_moving_average_of_sqrt_full_precision(spark):
    # the exact falsifying example from the round-5 verdict
    out = _vals(evaluate_target(
        _frame(spark, [0.5]), "movingAverage(squareRoot(m), 1)"
    ))
    assert out[0] == 0.7071067811865476  # == math.sqrt(0.5), bit-exact


def test_moving_sum_time_order_full_precision(spark):
    # invert() produces non-representable thirds; the window sum must be
    # the naive time-order float64 fold of the full-precision values
    vals = [0.75, 1.5, 3.0, 0.375]
    out = _vals(evaluate_target(
        _frame(spark, vals), "movingSum(invert(m), 3)"
    ))
    inv = [1.0 / v for v in vals]
    for i in range(len(vals)):
        acc = 0.0
        for v in inv[max(0, i - 2): i + 1]:
            acc += v
        assert out[i * 60] == acc, (i, out[i * 60], acc)


def test_integral_running_full_precision(spark):
    vals = [2.0, 3.0, 5.0, 7.0]
    out = _vals(evaluate_target(
        _frame(spark, vals), "integral(squareRoot(m))"
    ))
    acc = 0.0
    for i, v in enumerate(vals):
        acc += math.sqrt(v)
        assert out[i * 60] == acc, (i, out[i * 60], acc)


def test_sum_series_of_divide_full_precision(spark):
    # cross-series combine over full-precision ratios: sorted float fold,
    # no 1e-6 quantization.  Two addends -> order-independent bit-exact.
    rows = [("a.x", 0, 1.0), ("a.y", 0, 2.0)]
    frame = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = _vals(evaluate_target(frame, "sumSeries(invert(a.*))"))
    assert out[0] == (1.0 / 1.0) + (1.0 / 2.0)
    out = _vals(evaluate_target(frame, "sumSeries(scale(invert(a.*), 0.1))"))
    expect = sorted([1.0 * 0.1, 0.5 * 0.1])
    assert out[0] == (0.0 + expect[0]) + expect[1]


def test_summarize_sum_full_precision(spark):
    vals = [0.7, 0.3, 1.1, 2.9]  # not exactly representable
    out = _vals(evaluate_target(
        _frame(spark, vals), "summarize(squareRoot(m), '2min', 'sum')"
    ))
    b0 = sorted(math.sqrt(v) for v in vals[:2])
    b1 = sorted(math.sqrt(v) for v in vals[2:])
    assert out[0] == (0.0 + b0[0]) + b0[1]
    assert out[120] == (0.0 + b1[0]) + b1[1]


def test_hitcount_no_quantization(spark):
    out = _vals(evaluate_target(
        _frame(spark, [0.5, 0.5]), "hitcount(squareRoot(m), '2min')",
    ))
    s = math.sqrt(0.5)
    v0, v1 = sorted([s * 60, s * 60])
    assert out[0] == pytest.approx((0.0 + v0) + v1, abs=0, rel=0)


def test_as_percent_total_full_precision(spark):
    rows = [("a.x", 0, 0.5), ("a.y", 0, 0.5)]
    frame = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = evaluate_target(frame, "asPercent(squareRoot(a.*))").collect()
    s = math.sqrt(0.5)
    tot = (0.0 + s) + s
    for r in out:
        assert r.value == s / tot * 100.0
