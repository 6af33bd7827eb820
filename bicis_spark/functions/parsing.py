"""Timestamp / duration parsing expressions (SURVEY.md §2.8 X1, X2, X6).

The reference parses row-at-a-time in Python: multi-format timestamp
try-chain (``bicis/lib/parse_raw_data.py:67-76``), duration as int-minutes or
a ``"0H 32MIN 15SEG"`` string via ``\\d+`` regex (``parse_raw_data.py:55-64``,
regex at ``:10``), numeric coercion via ``isdigit()`` (``:90``).

Here each is a null-on-failure column expression (``try_*`` under ANSI mode)
that runs JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime patterns equivalent to the reference's
# ['%d/%m/%Y %H:%M', '%d/%m/%Y %H:%M:%S', '%Y-%m-%d %H:%M:%S.%f']
# (parse_raw_data.py:69-72), tried in order.
TIMESTAMP_FORMATS = (
    "d/M/yyyy H:mm",
    "d/M/yyyy H:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
)


def parse_timestamp_multi(col: Column, formats: tuple[str, ...] = TIMESTAMP_FORMATS) -> Column:
    """First format that parses wins; null if none do (the reference raises,
    then skips the row — F6 validity filtering happens downstream)."""
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(fmt)) for fmt in formats])


def parse_duration_seconds(col: Column) -> Column:
    """Duration → seconds.

    Integer string ⇒ minutes (``parse_raw_data.py:56-57``); otherwise extract
    all integer tokens from e.g. ``"0H 32MIN 15SEG"``, require ≥3, take the
    first 3 as H/M/S (``parse_raw_data.py:58-64``); null on failure.

    The minutes branch is gated on an anchored digit-only regex, matching
    the reference's ``isdigit()``: a bare try_cast would accept signed or
    whitespace-padded strings ('-15' → −900 s) the reference rejects. All
    casts and arithmetic are try_* so an oversized token yields NULL per
    the null-on-failure contract instead of an ANSI overflow error.
    """
    as_int = F.when(col.rlike("^[0-9]+$"), col.try_cast("long"))
    tokens = F.regexp_extract_all(col, F.lit(r"(\d+)"), 1)
    hms = F.try_add(
        F.try_add(
            F.try_multiply(F.element_at(tokens, 1).try_cast("long"), F.lit(3600)),
            F.try_multiply(F.element_at(tokens, 2).try_cast("long"), F.lit(60)),
        ),
        F.element_at(tokens, 3).try_cast("long"),
    )
    return F.when(as_int.isNotNull(), F.try_multiply(as_int, F.lit(60))).otherwise(
        F.when(F.size(tokens) >= 3, hms)
    )


def normalize_station(col: Column) -> Column:
    """String normalization X5 (``parse_raw_data.py:84,89``)."""
    return F.upper(F.trim(col))
