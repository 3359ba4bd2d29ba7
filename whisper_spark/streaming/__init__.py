from .ingest import start_ingest, parse_line_protocol  # noqa: F401
