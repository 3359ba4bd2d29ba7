from .points import (  # noqa: F401
    parse_rrd_dump,
    rrd_fetch_to_rows,
    read_points_csv,
    read_points_json,
    read_points_lines,
    read_points_pickle,
    read_rrd,
    read_rrd_xml,
    rrd2store,
)
from .rrd_binary import parse_rrd_binary  # noqa: F401
