from .ingest import start_ingest, parse_line_protocol  # noqa: F401
from .rollup import (  # noqa: F401
    dedup_stream,
    sessionize_stream,
    stateful_slot_lww,
    windowed_rollup,
)
