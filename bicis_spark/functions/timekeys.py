"""Time-bucketing expressions (SURVEY.md §2.5 W2).

The reference derives these row-at-a-time in Python inside an ``.rdd.map``
(``bicis/etl/feature_extraction/basic_features.py:71-88``): ISO weekday via
``datetime.isoweekday()``, the (iso_year, iso_week) group key via
``isocalendar()[:2]``, month/hour truncation via ``datetime.replace``.

Here each is a pure column expression — stays inside whole-stage codegen,
no Python worker, no serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VALID_KEYS = ("hour", "weekday", "month")


def iso_weekday(ts: Column) -> Column:
    """ISO weekday 1=Monday..7=Sunday (= ``datetime.isoweekday()``).

    Spark's ``dayofweek`` is 1=Sunday..7=Saturday; shift to ISO.
    """
    return ((F.dayofweek(ts) + F.lit(5)) % F.lit(7)) + F.lit(1)


def time_key(ts: Column, key: str) -> Column:
    """The x-axis value for a station profile series: hour-of-day, ISO
    weekday, or month-of-year (``basic_features.py:78-86``)."""
    if key == "hour":
        return F.hour(ts)
    if key == "weekday":
        return iso_weekday(ts)
    if key == "month":
        return F.month(ts)
    raise ValueError(f"key must be one of {VALID_KEYS}, got {key!r}")


def period_start(ts: Column, key: str) -> Column:
    """The concrete-period group key: which observed period an event falls
    in, so profile means average over *observed* periods only
    (``basic_features.py:79-85``; SURVEY.md §2.4 A2 semantics note).

    hour → hour-truncated ts; weekday → ISO week (Monday-start
    ``date_trunc('week')`` ≡ the reference's (iso_year, iso_week) tuple);
    month → month-truncated ts.
    """
    if key == "hour":
        return F.date_trunc("hour", ts)
    if key == "weekday":
        return F.date_trunc("week", ts)
    if key == "month":
        return F.date_trunc("month", ts)
    raise ValueError(f"key must be one of {VALID_KEYS}, got {key!r}")
