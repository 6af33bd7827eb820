"""Scalar function library (SURVEY.md §2.8)."""

from bicis_spark.functions.timekeys import iso_weekday, period_start, time_key
from bicis_spark.functions.parsing import (
    parse_duration_seconds,
    parse_timestamp_multi,
)

__all__ = [
    "iso_weekday",
    "period_start",
    "time_key",
    "parse_duration_seconds",
    "parse_timestamp_multi",
]
