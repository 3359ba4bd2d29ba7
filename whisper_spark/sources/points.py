"""Batch point sources — the connector surface.

The reference ingests points from argv/stdin text
(bin/whisper-update.py:29-46) and from RRD files (bin/rrd2whisper.py).
Here any ``spark.read`` source maps to the same (metric, ts, value, seq)
ingest shape; these helpers cover the common ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POINTS_READ_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("seq", T.LongType()),
    ]
)


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header metric,ts,value[,seq]."""
    df = spark.read.option("header", "true").csv(path)
    return _normalize(df)


def read_points_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines with fields metric, ts, value[, seq]."""
    return _normalize(spark.read.json(path))


def read_points_lines(spark: SparkSession, path: str) -> DataFrame:
    """Graphite line protocol ``<metric> <value> <ts>`` text files — the
    batch twin of streaming.parse_line_protocol (reference:
    bin/whisper-update.py:32-34 reads the same shape)."""
    from ..streaming.ingest import parse_line_protocol

    return parse_line_protocol(spark.read.text(path))


def _normalize(df: DataFrame) -> DataFrame:
    cols = {c.lower(): c for c in df.columns}
    out = df.select(
        F.col(cols["metric"]).cast("string").alias("metric"),
        F.col(cols["ts"]).try_cast("long").alias("ts"),
        F.col(cols["value"]).try_cast("double").alias("value"),
        (
            F.col(cols["seq"]).try_cast("long")
            if "seq" in cols
            else F.lit(0).cast("long")
        ).alias("seq"),
    )
    return out.filter(
        F.col("metric").isNotNull() & F.col("ts").isNotNull()
    )


def rrd_fetch_to_rows(base: str, datasources, t_info, names, values):
    """Pure mapping of an ``rrdtool.fetch()`` result to (metric, ts,
    value, seq) rows — one metric per datasource, wallclock stepped from
    the fetch start (reference: bin/rrd2whisper.py:109-163).  Split out
    from :func:`read_rrd` so the mapping is testable without rrdtool."""
    (start, _end, step) = t_info
    rows = []
    t = start
    for row in values:
        for name, v in zip(names, row):
            if v is not None and name in datasources:
                rows.append((f"{base}.{name}", int(t), float(v), 0))
        t += step
    return rows


def read_rrd(spark: SparkSession, path: str) -> DataFrame:
    """RRD import connector (reference: bin/rrd2whisper.py:59-163).

    rrdtool's Python bindings are not available in this container, so the
    connector is gated: with ``rrdtool`` importable it maps each RRA to
    (metric=<basename>.<datasource>, ts, value) rows; otherwise it raises
    with the integration instructions.  The surface (signature + output
    schema) is the stable contract.
    """
    try:
        import rrdtool  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "RRD import requires the 'rrdtool' python bindings, which are "
            "not installed in this environment. The connector contract: "
            "read_rrd(spark, path) -> DataFrame(metric, ts, value, seq) "
            "with one metric per RRD datasource (reference: "
            "bin/rrd2whisper.py:109-163)."
        ) from e

    import os

    info = rrdtool.info(path)
    datasources = sorted(
        {k.split("[")[1].split("]")[0] for k in info if k.startswith("ds[")}
    )
    base = os.path.basename(path).rsplit(".", 1)[0]
    (t_info, names, values) = rrdtool.fetch(path, "AVERAGE")
    rows = rrd_fetch_to_rows(base, set(datasources), t_info, names, values)
    return spark.createDataFrame(rows, POINTS_READ_SCHEMA)
