"""Typed error hierarchy for whisper_spark.

Mirrors the reference's exception surface (reference: whisper.py:181-222)
so that user code written against the reference's failure modes ports over.
"""

from __future__ import annotations


class WhisperException(Exception):
    """Base class for whisper_spark errors (reference: whisper.py:181-183)."""


class InvalidConfiguration(WhisperException):
    """Invalid archive/policy configuration (reference: whisper.py:186-187)."""


class InvalidAggregationMethod(WhisperException):
    """Unknown aggregation method (reference: whisper.py:190-191)."""


class InvalidTimeInterval(WhisperException):
    """fromTime > untilTime in a fetch (reference: whisper.py:194-195)."""


class InvalidXFilesFactor(WhisperException):
    """xFilesFactor outside [0, 1] (reference: whisper.py:198-199)."""


class TimestampNotCovered(WhisperException):
    """Update timestamp outside any archive's retention
    (reference: whisper.py:202-203)."""


class CorruptWhisperFile(WhisperException):
    """Store metadata unreadable/inconsistent (reference: whisper.py:206-214).

    Carries the offending path for fleet-integrity scans
    (reference: bin/find-corrupt-whisper-files.py:31-43).
    """

    def __init__(self, error: str, path: str | None = None):
        Exception.__init__(self, error)
        self.error = error
        self.path = path

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"<CorruptWhisperFile[{self.path}] {self.error}>"

    __str__ = __repr__
