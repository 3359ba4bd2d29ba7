"""Retention DSL + archive validation — mirrors reference
test_whisper.py:144-201 (validation) and :869-929 (DSL)."""

import pytest

from whisper_spark.errors import InvalidConfiguration
from whisper_spark.retention import (
    estimate_size_bytes,
    parse_retention_def,
    validate_archive_list,
)


def test_parse_retention_def_valid():
    assert parse_retention_def("60:10") == (60, 10)
    assert parse_retention_def("10:2y") == (10, 6307200)
    assert parse_retention_def("10s:14d") == (10, 120960)
    assert parse_retention_def("1m:30d") == (60, 43200)
    assert parse_retention_def("1h:1y") == (3600, 8760)
    # unit prefixes: 'sec', 'min', 'hour' all resolve
    assert parse_retention_def("1sec:1min") == (1, 60)
    assert parse_retention_def("1hours:1w") == (3600, 168)


@pytest.mark.parametrize("bad", ["10", "10:", ":10", "x:10", "10:y", "10q:2d"])
def test_parse_retention_def_invalid(bad):
    with pytest.raises(InvalidConfiguration):
        parse_retention_def(bad)


def test_validate_empty():
    with pytest.raises(InvalidConfiguration):
        validate_archive_list([])


def test_validate_duplicate_precision():
    with pytest.raises(InvalidConfiguration):
        validate_archive_list([(1, 60), (1, 120)])


def test_validate_indivisible():
    with pytest.raises(InvalidConfiguration):
        validate_archive_list([(7, 60), (10, 120)])


def test_validate_coverage():
    # lower precision must cover a longer interval
    with pytest.raises(InvalidConfiguration):
        validate_archive_list([(1, 60), (60, 1)])


def test_validate_consolidation_points():
    # archive0 must hold >= 60 points to consolidate one point of archive1
    with pytest.raises(InvalidConfiguration):
        validate_archive_list([(1, 30), (60, 120)])


def test_validate_ok():
    validate_archive_list([(1, 60), (60, 60)])
    validate_archive_list([(1, 60), (60, 60), (3600, 24), (86400, 365)])


def test_estimate_size_matches_reference_model():
    # reference: bin/whisper-create.py:71-72 — 60s:1d => 17308B -> 20480 on disk
    assert estimate_size_bytes([(60, 1440)]) == 20480
