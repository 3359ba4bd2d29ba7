"""The 8 consolidation methods — value cases from reference
test_whisper.py:203-235."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whisper_spark.aggregation import aggregate_column
from whisper_spark.errors import InvalidAggregationMethod

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def run_agg(spark, method, values, expected_slots=None):
    rows = [(i, float(v) if v is not None else None) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, SCHEMA)
    col = aggregate_column(
        method, "value", order=F.col("ts"), expected_slots=expected_slots
    )
    return df.agg(col.alias("v")).collect()[0]["v"]


def test_average(spark):
    assert run_agg(spark, "average", [1, 2, 3]) == 2.0


def test_sum(spark):
    assert run_agg(spark, "sum", [1, 2, 3]) == 6.0


def test_last(spark):
    # 'last' = latest slot's value (reference: whisper.py:560-563)
    assert run_agg(spark, "last", [1, 2, 3]) == 3.0


def test_max_min(spark):
    assert run_agg(spark, "max", [5, 2, 3]) == 5.0
    assert run_agg(spark, "min", [5, 2, 3]) == 2.0


def test_avg_zero(spark):
    # nulls count as zeros against the FULL slot count
    # (reference: whisper.py:564-568, test_whisper.py:213-216)
    assert run_agg(spark, "avg_zero", [1, 2, 3, None], expected_slots=4) == 1.5


def test_absmax(spark):
    # reference test_whisper.py:218-222
    assert run_agg(spark, "absmax", [-3, -2, 1, 2]) == -3.0
    assert run_agg(spark, "absmax", [-2, 1, 2, 3]) == 3.0


def test_absmin(spark):
    # reference test_whisper.py:224-228
    assert run_agg(spark, "absmin", [-3, -2, 1, 2]) == 1.0
    assert run_agg(spark, "absmin", [-2, 1, 2, 3]) == 1.0


def test_nan_is_a_value(spark):
    # NaN is storable and aggregatable (reference test_whisper.py:454)
    out = run_agg(spark, "last", [1.0, float("nan")])
    assert math.isnan(out)


def test_unknown_method():
    with pytest.raises(InvalidAggregationMethod):
        aggregate_column("nope", "value")
