"""Differential fuzzing for the render evaluator: random pipelines of
unary render functions over random gappy series, checked against an
independent pandas reference implementation per function.

Exactness strategy: the comparisons are BIT-exact (atol=0).  The
engine's sums are naive time-order float64 folds over ordered window
frames and sorted folds over unordered groups (render.py round-6
determinism rules), so the references here are explicit Python loops in
the same order — full precision end to end, including composed targets
whose intermediates are irrational (sqrt/invert of quarter-multiples;
the round-5 decimal route quantized those, caught by this suite).
Engine nulls correspond to pandas NaN (inputs contain no literal NaN,
and the function pool creates none).  ``derandomize=True`` everywhere:
the suite's verdict must not depend on the draw.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whisper_spark.render import evaluate_target

TS_GRID = [60 * i for i in range(8)]


# --------------------------------------------------------------------- #
# pandas reference semantics, one entry per fuzzed function
# --------------------------------------------------------------------- #


def _ref_scale(s, k):
    return s * k


def _ref_offset(s, k):
    return s + k


def _ref_absolute(s):
    return s.abs()


def _ref_remove_above(s, k):
    return s.where(s <= k)


def _ref_remove_below(s, k):
    return s.where(s >= k)


def _ref_keep_last(s):
    return s.ffill()


def _ref_delay(s, n):
    return s.shift(n)


def _ref_derivative(s):
    return s - s.shift(1)


def _ref_nn_derivative(s):
    d = s - s.shift(1)
    return d.where(d >= 0)


def _naive_window_sum(s, n):
    # explicit time-order fold: the engine's window SUM adds frame rows
    # in order (plain float64), and pandas' rolling().sum() uses a
    # compensated add/evict algorithm that is NOT guaranteed
    # bit-identical on full-precision values
    vals = list(s)
    out = []
    for i in range(len(vals)):
        acc, seen = 0.0, False
        for v in vals[max(0, i - n + 1): i + 1]:
            if not pd.isna(v):
                acc += v
                seen = True
        out.append(acc if seen else math.nan)
    return pd.Series(out, index=s.index, dtype="float64")


def _naive_window_count(s, n):
    vals = list(s)
    return pd.Series(
        [sum(1 for v in vals[max(0, i - n + 1): i + 1] if not pd.isna(v))
         for i in range(len(vals))],
        index=s.index, dtype="float64",
    )


def _ref_moving_sum(s, n):
    return _naive_window_sum(s, n)


def _ref_moving_max(s, n):
    return s.rolling(n, min_periods=1).max()


def _ref_moving_min(s, n):
    return s.rolling(n, min_periods=1).min()


def _ref_is_non_null(s):
    return s.notna().astype("float64")


def _ref_offset_to_zero(s):
    return s - s.min()


def _ref_changed(s):
    prev = s.shift(1)
    out = []
    for p, v in zip(prev, s):
        if pd.isna(p):
            out.append(0.0)
        elif not pd.isna(v) and v != p:
            out.append(1.0)
        else:
            out.append(0.0)
    return pd.Series(out, index=s.index)


def _ref_integral(s):
    # engine: time-order float64 running sum over known values; slots
    # before the first known value stay null
    out, acc, seen = [], 0.0, False
    for v in s:
        if not pd.isna(v):
            acc += v
            seen = True
        out.append(acc if seen else math.nan)
    return pd.Series(out, index=s.index)


#: (target template, pandas reference, arg strategy)
FUNCS = [
    ("scale({series}, {a})", _ref_scale, st.integers(-8, 8).map(lambda i: i / 4)),
    ("offset({series}, {a})", _ref_offset, st.integers(-8, 8).map(lambda i: i / 4)),
    ("absolute({series})", _ref_absolute, None),
    ("removeAboveValue({series}, {a})", _ref_remove_above, st.integers(-4, 12)),
    ("removeBelowValue({series}, {a})", _ref_remove_below, st.integers(-4, 12)),
    ("keepLastValue({series})", _ref_keep_last, None),
    ("delay({series}, {a})", _ref_delay, st.integers(1, 3)),
    ("derivative({series})", _ref_derivative, None),
    ("nonNegativeDerivative({series})", _ref_nn_derivative, None),
    ("movingSum({series}, {a})", _ref_moving_sum, st.integers(1, 4)),
    ("movingMax({series}, {a})", _ref_moving_max, st.integers(1, 4)),
    ("movingMin({series}, {a})", _ref_moving_min, st.integers(1, 4)),
    ("isNonNull({series})", _ref_is_non_null, None),
    ("offsetToZero({series})", _ref_offset_to_zero, None),
    ("changed({series})", _ref_changed, None),
    ("integral({series})", _ref_integral, None),
]


def _apply(ref, s, a):
    return ref(s) if a is None else ref(s, a)


values = st.one_of(st.none(), st.integers(-20, 40).map(lambda i: i / 4))
series_strat = st.lists(values, min_size=len(TS_GRID), max_size=len(TS_GRID))
step_strat = st.tuples(
    st.sampled_from(range(len(FUNCS))),
    st.integers(0, 10 ** 6),  # seed for the arg, drawn via the strategy
)


@st.composite
def pipelines(draw):
    steps = []
    for _ in range(draw(st.integers(1, 3))):
        idx = draw(st.sampled_from(range(len(FUNCS))))
        tmpl, ref, arg_strat = FUNCS[idx]
        arg = draw(arg_strat) if arg_strat is not None else None
        steps.append((tmpl, ref, arg))
    return steps


@pytest.mark.usefixtures("spark")
def test_render_pipeline_matches_pandas_reference(spark):
    @settings(derandomize=True, max_examples=30, deadline=None)
    @given(data=series_strat, steps=pipelines())
    def check(data, steps):
        rows = [("m", t, v) for t, v in zip(TS_GRID, data)]
        frame = spark.createDataFrame(
            rows, "metric string, ts long, value double"
        )
        target = "m"
        ref = pd.Series(
            [math.nan if v is None else v for v in data],
            index=TS_GRID, dtype="float64",
        )
        for tmpl, fn, arg in steps:
            target = tmpl.format(series=target, a=arg)
            ref = _apply(fn, ref, arg)
        got_rows = evaluate_target(frame, target).collect()
        got = {r.ts: r.value for r in got_rows}
        for t in TS_GRID:
            g = got.get(t)
            e = ref.loc[t]
            if pd.isna(e):
                assert g is None or (isinstance(g, float) and math.isnan(g)), (
                    target, t, g)
            else:
                assert g is not None and np.isclose(g, e, rtol=0, atol=0), (
                    target, t, g, e)

    check()


# --------------------------------------------------------------------- #
# round-4 continuation pool: the harder null/gap semantics — limited
# fills, interpolation, row-dropping compress, normalization — against
# op-order-exact references (same quarter-multiple exactness rules)
# --------------------------------------------------------------------- #


def _ref_add(s, k):
    return s + k


def _ref_transform_null(s, k):
    return s.fillna(float(k))


def _ref_invert(s):
    return 1.0 / s.where(s != 0)


def _ref_square_root(s):
    return np.sqrt(s.where(s >= 0))


def _ref_min_max(s):
    mn, mx = s.min(), s.max()
    if pd.isna(mn) or mx == mn:
        return pd.Series(math.nan, index=s.index)
    return (s - mn) / (mx - mn)


def _ref_round(s, p):
    return s.round(p)


def _ref_moving_average(s, n):
    cnt = _naive_window_count(s, n)
    return _naive_window_sum(s, n) / cnt.where(cnt > 0)


def _ref_moving_range(s, n):
    r = s.rolling(n, min_periods=1)
    return r.max() - r.min()


def _ref_compress(s):
    # engine drops the gap ROWS: later row-based steps (delay, moving
    # windows) must see the compacted series, exactly like the frame
    return s.dropna()


def _ref_keep_last_limited(s, limit):
    # fill a run of nulls ONLY when the whole run is <= limit slots
    vals = list(s)
    out = list(vals)
    i = 0
    while i < len(vals):
        if pd.isna(vals[i]):
            j = i
            while j < len(vals) and pd.isna(vals[j]):
                j += 1
            run = j - i
            prev = out[i - 1] if i > 0 else math.nan
            if run <= limit and i > 0 and not pd.isna(prev):
                for k in range(i, j):
                    out[k] = prev
            i = j
        else:
            i += 1
    return pd.Series(out, index=s.index, dtype="float64")


def _ref_interpolate(s):
    # mirror the engine's exact op order:
    # pv + ((nv - pv) * (ts - pts)) / (nts - pts); edges stay null
    idx = list(s.index)
    vals = list(s)
    out = list(vals)
    known = [k for k, v in enumerate(vals) if not pd.isna(v)]
    for a, b in zip(known, known[1:]):
        for k in range(a + 1, b):
            out[k] = vals[a] + (
                (vals[b] - vals[a]) * (idx[k] - idx[a])
            ) / (idx[b] - idx[a])
    return pd.Series(out, index=s.index, dtype="float64")


FUNCS_R4 = FUNCS + [
    ("add({series}, {a})", _ref_add, st.integers(-8, 8).map(lambda i: i / 4)),
    ("transformNull({series}, {a})", _ref_transform_null, st.integers(-4, 4)),
    ("invert({series})", _ref_invert, None),
    ("squareRoot({series})", _ref_square_root, None),
    ("minMax({series})", _ref_min_max, None),
    ("round({series}, {a})", _ref_round, st.integers(0, 1)),
    ("movingAverage({series}, {a})", _ref_moving_average, st.integers(1, 4)),
    ("movingWindow({series}, {a}, 'range')", _ref_moving_range, st.integers(1, 4)),
    ("compressPeriodicGaps({series})", _ref_compress, None),
    ("keepLastValue({series}, {a})", _ref_keep_last_limited, st.integers(1, 3)),
    ("interpolate({series})", _ref_interpolate, None),
]


@st.composite
def pipelines_r4(draw):
    steps = []
    for _ in range(draw(st.integers(1, 3))):
        idx = draw(st.sampled_from(range(len(FUNCS_R4))))
        tmpl, ref, arg_strat = FUNCS_R4[idx]
        arg = draw(arg_strat) if arg_strat is not None else None
        steps.append((tmpl, ref, arg))
    return steps


@pytest.mark.usefixtures("spark")
def test_render_pipeline_matches_pandas_reference_r4(spark):
    @settings(derandomize=True, max_examples=30, deadline=None)
    @given(data=series_strat, steps=pipelines_r4())
    def check(data, steps):
        rows = [("m", t, v) for t, v in zip(TS_GRID, data)]
        frame = spark.createDataFrame(
            rows, "metric string, ts long, value double"
        )
        target = "m"
        ref = pd.Series(
            [math.nan if v is None else v for v in data],
            index=TS_GRID, dtype="float64",
        )
        for tmpl, fn, arg in steps:
            target = tmpl.format(series=target, a=arg)
            ref = _apply(fn, ref, arg)
        got_rows = evaluate_target(frame, target).collect()
        got = {r.ts: r.value for r in got_rows}
        for t in TS_GRID:
            g = got.get(t)
            e = ref.get(t, math.nan)  # compress may DROP the slot
            if pd.isna(e):
                assert g is None or (isinstance(g, float) and math.isnan(g)), (
                    target, t, g)
            else:
                assert g is not None and np.isclose(g, e, rtol=0, atol=0), (
                    target, t, g, e)

    check()


# --------------------------------------------------------------------- #
# two-series combine pool: the cross-series null semantics (safeSum /
# safeDiff / safeMul / safeDiv / asPercent) against pandas references
# --------------------------------------------------------------------- #


def _c_sum(a, b):
    out = a.add(b, fill_value=0.0)
    both_nan = a.isna() & b.isna()
    return out.where(~both_nan)


def _c_avg(a, b):
    s = _c_sum(a, b)
    n = a.notna().astype("float64") + b.notna().astype("float64")
    return s / n.where(n > 0)


def _c_max(a, b):
    import pandas as pd

    return pd.concat([a, b], axis=1).max(axis=1)


def _c_min(a, b):
    import pandas as pd

    return pd.concat([a, b], axis=1).min(axis=1)


def _c_diff(a, b):
    # engine: per-ts dsum(a) - coalesce(dsum(b), 0); a-NaN poisons
    return a - b.fillna(0.0)


def _c_div(a, b):
    return (a / b.where(b != 0)).where(b.notna() & (b != 0))


def _c_mul(a, b):
    # safeMul: any unknown slot -> None
    return (a * b).where(a.notna() & b.notna())


COMBINES = [
    ("sumSeries({a}, {b})", _c_sum),
    ("averageSeries({a}, {b})", _c_avg),
    ("maxSeries({a}, {b})", _c_max),
    ("minSeries({a}, {b})", _c_min),
    ("diffSeries({a}, {b})", _c_diff),
    ("divideSeries({a}, {b})", _c_div),
    ("multiplySeries({a}, {b})", _c_mul),
]


@pytest.mark.usefixtures("spark")
def test_render_combines_match_pandas_reference(spark):
    @settings(derandomize=True, max_examples=25, deadline=None)
    @given(
        da=series_strat,
        db=series_strat,
        which=st.sampled_from(range(len(COMBINES))),
    )
    def check(da, db, which):
        rows = [("s.a", t, v) for t, v in zip(TS_GRID, da)]
        rows += [("s.b", t, v) for t, v in zip(TS_GRID, db)]
        frame = spark.createDataFrame(
            rows, "metric string, ts long, value double"
        )
        tmpl, ref_fn = COMBINES[which]
        target = tmpl.format(a="s.a", b="s.b")
        a = pd.Series([math.nan if v is None else v for v in da],
                      index=TS_GRID, dtype="float64")
        b = pd.Series([math.nan if v is None else v for v in db],
                      index=TS_GRID, dtype="float64")
        ref = ref_fn(a, b)
        got = {r.ts: r.value for r in evaluate_target(frame, target).collect()}
        for t in TS_GRID:
            g, e = got.get(t), ref.get(t, math.nan)
            if pd.isna(e):
                assert g is None or (isinstance(g, float) and math.isnan(g)), (
                    target, t, g)
            else:
                assert g is not None and np.isclose(g, e, rtol=0, atol=0), (
                    target, t, g, e)

    check()
