"""Composable DataFrame transforms: the engine's operator vocabulary."""

from .timeseries import (  # noqa: F401
    align_ts,
    dense_timeline,
    derivative,
    filter_metrics,
    glob_to_regex,
    group_by_node,
    integral,
    keep_last_value,
    last_write_wins,
    moving_window,
    select_archive,
    summarize,
    time_shift,
    xff_rollup,
)
