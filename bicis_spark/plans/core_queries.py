"""Core declared queries: scans, filters, aggregations, joins, profiles.

Maps the reference's bicis-domain operators onto the driver tables per
FIXTURES.md §4: ``events.user_id`` plays station, ``events.ts`` plays
rent_date, ``event_type='click'`` plays rents / ``'view'`` plays returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bicis_spark.operators.profiles import rents_returns_profile, station_profile
from bicis_spark.plans.queries import register
from bicis_spark.sources.io import read_table

RENT_TYPE = "click"
RETURN_TYPE = "view"


def events_as_trips(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(rents, returns) event streams standing in for the trips table."""
    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE)
    returns = events.where(F.col("event_type") == RETURN_TYPE)
    return rents, returns


# ---------------------------------------------------------------------------
# Flagship (entry): per-station per-hour-of-day average event counts
# = A2 two-level agg + W2 bucketing + J1 multi-key inner join
# (basic_features.py:30-68 semantics on driver data).
# ---------------------------------------------------------------------------

_HOUR_PROFILE_ORACLE = f"""
WITH rent_l1 AS (
    SELECT user_id AS station,
           date_trunc('hour', ts) AS period,
           hour(ts) AS hour,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RENT_TYPE}'
    GROUP BY 1, 2, 3
),
rent_prof AS (
    SELECT station, hour, avg(cnt) AS n_rents FROM rent_l1 GROUP BY 1, 2
),
ret_l1 AS (
    SELECT user_id AS station,
           date_trunc('hour', ts) AS period,
           hour(ts) AS hour,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RETURN_TYPE}'
    GROUP BY 1, 2, 3
),
ret_prof AS (
    SELECT station, hour, avg(cnt) AS n_returns FROM ret_l1 GROUP BY 1, 2
)
SELECT rent_prof.station, rent_prof.hour, n_rents, n_returns
FROM rent_prof
JOIN ret_prof ON rent_prof.station = ret_prof.station
            AND rent_prof.hour = ret_prof.hour
"""


@register("hour_profile", _HOUR_PROFILE_ORACLE)
def hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    rents, returns = events_as_trips(spark, sf_dir)
    n_rents = station_profile(rents, "user_id", "ts", "hour", "n_rents")
    n_returns = station_profile(returns, "user_id", "ts", "hour", "n_returns")
    joined = n_rents.join(n_returns, on=["station", "hour"], how="inner")
    return joined.select(
        F.col("station").cast("long").alias("station"),
        F.col("hour").cast("long").alias("hour"),
        "n_rents",
        "n_returns",
    )


_WEEKDAY_PROFILE_ORACLE = f"""
WITH rent_l1 AS (
    SELECT user_id AS station,
           date_trunc('week', ts) AS period,
           isodow(ts) AS weekday,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RENT_TYPE}'
    GROUP BY 1, 2, 3
),
rent_prof AS (
    SELECT station, weekday, avg(cnt) AS n_rents FROM rent_l1 GROUP BY 1, 2
),
ret_l1 AS (
    SELECT user_id AS station,
           date_trunc('week', ts) AS period,
           isodow(ts) AS weekday,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RETURN_TYPE}'
    GROUP BY 1, 2, 3
),
ret_prof AS (
    SELECT station, weekday, avg(cnt) AS n_returns FROM ret_l1 GROUP BY 1, 2
)
SELECT rent_prof.station, rent_prof.weekday, n_rents, n_returns
FROM rent_prof
JOIN ret_prof ON rent_prof.station = ret_prof.station
            AND rent_prof.weekday = ret_prof.weekday
"""


@register("weekday_profile", _WEEKDAY_PROFILE_ORACLE)
def weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday profile: exercises the ISO weekday shift formula and the
    (iso_year, iso_week) period grouping (W2, basic_features.py:78-80)."""
    rents, returns = events_as_trips(spark, sf_dir)
    n_rents = station_profile(rents, "user_id", "ts", "weekday", "n_rents")
    n_returns = station_profile(returns, "user_id", "ts", "weekday", "n_returns")
    joined = n_rents.join(n_returns, on=["station", "weekday"], how="inner")
    return joined.select(
        F.col("station").cast("long").alias("station"),
        F.col("weekday").cast("long").alias("weekday"),
        "n_rents",
        "n_returns",
    )


# ---------------------------------------------------------------------------
# A4: plain counts
# ---------------------------------------------------------------------------


@register("count_rows", "SELECT count(*) AS n FROM lineitem")
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# F1/F5: filters
# ---------------------------------------------------------------------------


@register(
    "boolean_or_filter",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id = 3 OR event_type = '{RENT_TYPE}'
    """,
)
def boolean_or_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (notebooks/Untitled.ipynb cell 9): boolean OR of two predicates."""
    events = read_table(spark, sf_dir, "events")
    return events.where(
        (F.col("user_id") == 3) | (F.col("event_type") == RENT_TYPE)
    ).select("event_id", "user_id", "event_type")
