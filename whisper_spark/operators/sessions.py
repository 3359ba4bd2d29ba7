"""Batch sessionization — the training-pipeline twin of
``streaming.rollup.sessionize_stream``.

A session is a maximal run of one key's events where consecutive gaps
stay UNDER ``gap_seconds`` (a gap >= gap_seconds starts a new session —
the half-open convention of Spark's ``session_window``).  Everything is
window functions partitioned by the key, so the work distributes by key
with no global sort; skewed keys are bounded by that key's own event
count (the same bound any per-entity pass has).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "sec",
    order_col: str | None = None,
    value_col: str | None = "value",
    sum_expr: Column | None = None,
    gap_exclusive: bool = False,
) -> DataFrame:
    """(key, session_id, n_events, t_start, t_end[, sum_value]).

    ``order_col`` breaks timestamp ties deterministically (it never
    changes session membership — equal timestamps always share a
    session — only the stability of the running numbering).
    ``sum_expr`` overrides the per-session value aggregate (pass a
    decimal-exact sum for oracle-matched use, see queries.dsum).
    ``gap_exclusive=True`` breaks only when the gap EXCEEDS
    ``gap_seconds`` (a gap of exactly ``gap_seconds`` stays in-session);
    the default matches ``session_window``'s half-open convention."""
    order = [ts_col] + ([order_col] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    broke = (gap > gap_seconds) if gap_exclusive else (gap >= gap_seconds)
    brk = events.withColumn(
        "_is_new",
        F.when(F.lag(ts_col).over(w).isNull() | broke, 1).otherwise(0),
    )
    sess = brk.withColumn(
        "session_id",
        F.sum("_is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
    ]
    if sum_expr is not None:
        aggs.append(sum_expr.alias("sum_value"))
    elif value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return sess.groupBy(key_col, "session_id").agg(*aggs)
