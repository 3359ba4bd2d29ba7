"""whisper_spark — a PySpark-native time-series analytics engine with the
query and data-processing capabilities of graphite-project/whisper.

Not a port: whisper's per-metric ring-buffer files become ONE long-format
``points(metric, resolution, ts, value)`` table partitioned by resolution
and time bucket, with a broadcast ``policies`` dimension replacing file
headers.  All operators are declarative DataFrame transformations so
Catalyst provides pushdown, pruning, partial aggregation and AQE — the
properties that let the same code run on a laptop and on a 1000-executor
cluster over 100 TB (SURVEY.md §1.4, §7).
"""

from .aggregation import AGGREGATION_METHODS, aggregate_column
from .errors import (
    CorruptWhisperFile,
    InvalidAggregationMethod,
    InvalidConfiguration,
    InvalidTimeInterval,
    InvalidXFilesFactor,
    TimestampNotCovered,
    WhisperException,
)
from .retention import (
    ArchiveSpec,
    estimate_size_bytes,
    parse_retention_def,
    parse_retention_defs,
    validate_archive_list,
)
from .render import evaluate_target, parse_at_time, parse_target
from .session import get_spark
from .sources.wsp import export_wsp, import_wsp, read_wsp
from .store import WhisperStore, fetch_federated, render_federated

__version__ = "0.1.0"

__all__ = [
    "AGGREGATION_METHODS",
    "ArchiveSpec",
    "CorruptWhisperFile",
    "InvalidAggregationMethod",
    "InvalidConfiguration",
    "InvalidTimeInterval",
    "InvalidXFilesFactor",
    "TimestampNotCovered",
    "WhisperException",
    "WhisperStore",
    "aggregate_column",
    "estimate_size_bytes",
    "evaluate_target",
    "export_wsp",
    "fetch_federated",
    "get_spark",
    "import_wsp",
    "parse_at_time",
    "parse_retention_def",
    "parse_retention_defs",
    "parse_target",
    "read_wsp",
    "render_federated",
    "validate_archive_list",
]
