from .ingest import start_ingest, parse_line_protocol  # noqa: F401
from .rollup import windowed_rollup, stateful_slot_lww  # noqa: F401
