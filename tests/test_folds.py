"""Cross-engine differential fuzzing for the round-6 float-fold
determinism convention (whisper_spark/functions/folds.py).

Random FULL-PRECISION doubles (no quarter-multiple crutch) are pushed
through the three fold shapes on Spark, DuckDB, and a naive Python
model; every comparison is bit-exact (repr equality).  This is the
standing evidence that the decimal(25,6) replacement holds for
arbitrary inputs, not just the sf testdata.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from whisper_spark.functions import folds

# full-precision doubles spanning many magnitudes; finite only (the
# engine represents unknown as NULL, never NaN/inf, at the fold sites)
vals = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
).map(lambda v: v * math.pi / 3)
rows_strat = st.lists(
    st.tuples(st.integers(0, 3), st.one_of(st.none(), vals)),
    min_size=1, max_size=40,
)


def _py_sorted_fold(xs):
    known = sorted(x for x in xs if x is not None)
    if not known:
        return None
    acc = 0.0
    for x in known:
        acc += x
    return acc


def _canon(v):
    return "NULL" if v is None else repr(float(v))


@pytest.mark.usefixtures("spark")
def test_fsum_group_matches_duckdb_and_python_bitexact(spark):
    @settings(derandomize=True, max_examples=25, deadline=None)
    @given(rows=rows_strat)
    def check(rows):
        df = spark.createDataFrame(
            [(g, v) for g, v in rows], "g int, v double"
        )
        got = {
            r.g: r.s
            for r in df.groupBy("g").agg(folds.fsum("v").alias("s")).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g INT, v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        duck = dict(con.execute(
            "SELECT g, " + folds.FSUM("v") + " FROM t GROUP BY g"
        ).fetchall())
        model = {}
        for g, v in rows:
            model.setdefault(g, []).append(v)
        for g, xs in model.items():
            e = _py_sorted_fold(xs)
            assert _canon(got[g]) == _canon(e), (g, got[g], e)
            assert _canon(duck[g]) == _canon(e), (g, duck[g], e)

    check()


@pytest.mark.usefixtures("spark")
def test_window_sum_matches_frame_order_fold_bitexact(spark):
    """Spark's plain float64 window SUM over an ordered frame must be
    the naive time-order fold, and the FSUM_WIN oracle mirror must
    reproduce it — on full-precision values DuckDB's own windowed SUM
    does NOT (pairwise combination), which is why the mirror exists."""

    @settings(derandomize=True, max_examples=25, deadline=None)
    @given(
        series=st.lists(st.one_of(st.none(), vals), min_size=1, max_size=30),
        n=st.integers(1, 6),
    )
    def check(series, n):
        rows = [(i, v) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "ts int, v double")
        w = Window.orderBy("ts").rowsBetween(-(n - 1), 0)
        got = {
            r.ts: r.s
            for r in df.select("ts", F.sum("v").over(w).alias("s")).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (ts INT, v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        win = (f"(ORDER BY ts ROWS BETWEEN {n - 1} PRECEDING "
               "AND CURRENT ROW)")
        duck = dict(con.execute(
            "SELECT ts, " + folds.FSUM_WIN("v", win) + " FROM t ORDER BY ts"
        ).fetchall())
        for i in range(len(series)):
            frame = [v for v in series[max(0, i - n + 1): i + 1]
                     if v is not None]
            e = None
            if frame:
                e = 0.0
                for v in frame:  # naive time-order fold
                    e += v
            assert _canon(got[i]) == _canon(e), ("spark", i, got[i], e)
            assert _canon(duck[i]) == _canon(e), ("duck", i, duck[i], e)

    check()


@pytest.mark.usefixtures("spark")
def test_fsum_win_sorted_matches_duckdb_bitexact(spark):
    @settings(derandomize=True, max_examples=20, deadline=None)
    @given(rows=rows_strat)
    def check(rows):
        df = spark.createDataFrame(
            [(g, i, v) for i, (g, v) in enumerate(rows)],
            "g int, i int, v double",
        )
        w = Window.partitionBy("g")
        got = {
            r.i: r.s
            for r in df.select(
                "i", folds.fsum_win_sorted(w, "v").alias("s")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g INT, i INT, v DOUBLE)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)",
            [(g, i, v) for i, (g, v) in enumerate(rows)],
        )
        duck = dict(con.execute(
            "SELECT i, " + folds.FSUM_WIN_SORTED("v", "(PARTITION BY g)")
            + " FROM t"
        ).fetchall())
        groups = {}
        for g, v in rows:
            groups.setdefault(g, []).append(v)
        for i, (g, _v) in enumerate(rows):
            e = _py_sorted_fold(groups[g])
            assert _canon(got[i]) == _canon(e), ("spark", i)
            assert _canon(duck[i]) == _canon(e), ("duck", i)

    check()
