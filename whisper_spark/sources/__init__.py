from .points import read_points_csv, read_points_json, read_points_lines, read_rrd  # noqa: F401
