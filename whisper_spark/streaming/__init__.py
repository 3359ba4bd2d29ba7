from .aggregator import (  # noqa: F401
    AggregationRule,
    aggregate_batch,
    aggregate_stream,
    parse_aggregation_rules,
)
from .ingest import parse_line_protocol, start_ingest  # noqa: F401
from .rollup import (  # noqa: F401
    chained_derivative,
    chained_moving_average,
    chained_summarize,
    dedup_stream,
    sessionize_stream,
    stateful_slot_lww,
    windowed_rollup,
)
