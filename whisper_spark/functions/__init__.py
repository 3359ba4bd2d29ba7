"""Composable DataFrame transforms: the engine's operator vocabulary."""

from .timeseries import (  # noqa: F401
    align_ts,
    dense_timeline,
    last_write_wins,
    select_archive,
    xff_rollup,
)
