"""Per-station profile series (SURVEY.md §2.4 A2, §2.5 W2, §2.3 J1).

Reference semantics (``bicis/etl/feature_extraction/basic_features.py:30-68``):
for key ∈ {hour, weekday, month}, count events per (station, concrete period,
key value), then average those counts per (station, key value) — the mean is
over *observed* periods only (zero-count periods are absent by construction).
Rents and returns profiles are inner-joined on (station, key).

Spark-first design notes:
- The reference drops to ``.rdd.map`` to derive time keys (defeating
  Catalyst); here the keys are column expressions (functions.timekeys), so
  the whole two-level aggregate runs in whole-stage codegen.
- The two-level groupBy shuffles on (station, period, key) then
  (station, key) — Catalyst executes each as partial+final HashAggregate,
  so the map-side combine bounds shuffle volume by the number of distinct
  groups, not rows. At 100 TB this is the aggregate-pushdown shape the
  reference hand-coded (SURVEY.md §4).
- The first-level output already hash-partitions by a superset of the
  second-level key; AQE coalesces the small second shuffle.
- The rents⋈returns join keys on low-cardinality (station, key); both sides
  are post-aggregation (tiny), so AQE picks a broadcast join at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bicis_spark.functions.timekeys import VALID_KEYS, period_start, time_key


def event_counts_per_period(
    df: DataFrame,
    station_col: str,
    ts_col: str,
    key: str,
    out_station: str = "station",
) -> DataFrame:
    """Level 1: events per (station, concrete period, key value).

    Mirrors ``basic_features.py:41-44`` (groupBy station/group_by/key +
    count) with the key derivation as column expressions.
    """
    if key not in VALID_KEYS:
        raise ValueError(f"key must be one of {VALID_KEYS}")
    ts = F.col(ts_col)
    return (
        df.where(F.col(station_col).isNotNull() & ts.isNotNull())
        .groupBy(
            F.col(station_col).alias(out_station),
            period_start(ts, key).alias("period"),
            time_key(ts, key).alias(key),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def station_profile(
    df: DataFrame,
    station_col: str,
    ts_col: str,
    key: str,
    value_name: str,
) -> DataFrame:
    """Two-level aggregate: average per-period count per (station, key).

    ``basic_features.py:41-50`` — the mean is over observed periods only.
    Output columns: station, <key>, <value_name>.
    """
    level1 = event_counts_per_period(df, station_col, ts_col, key)
    return level1.groupBy("station", key).agg(F.avg("cnt").alias(value_name))


def rents_returns_profile(
    df: DataFrame,
    key: str,
    rent_station: str = "rent_station",
    rent_ts: str = "rent_date",
    return_station: str = "return_station",
    return_ts: str = "return_date",
) -> DataFrame:
    """The full profile builder: rents profile ⋈ returns profile on
    (station, key), inner (``basic_features.py:63-68``).

    Output: [station, <key>, n_rents, n_returns].
    """
    n_rents = station_profile(df, rent_station, rent_ts, key, "n_rents")
    n_returns = station_profile(df, return_station, return_ts, key, "n_returns")
    return n_rents.join(n_returns, on=["station", key], how="inner")


def event_profile_single_scan(
    events: DataFrame,
    station_col: str,
    ts_col: str,
    key: str,
    is_rent: Column,
    is_return: Column,
) -> DataFrame:
    """rents_returns_profile for a single event stream where rent/return is
    a per-row predicate — ONE scan and one shuffle chain instead of two.

    Identical semantics to joining the two separately-built profiles:
    level 1 counts both kinds per (station, period, key); level 2 averages
    each kind over the periods where that kind was observed (``avg`` skips
    the nulls injected for unobserved periods); the final both-non-null
    filter is the inner-join condition. Exact integer counts ⇒ identical
    averages. At 100 TB this halves the fact-table scan and removes a join.
    """
    if key not in VALID_KEYS:
        raise ValueError(f"key must be one of {VALID_KEYS}")
    ts = F.col(ts_col)
    level1 = (
        events.where(F.col(station_col).isNotNull() & ts.isNotNull())
        .where(is_rent | is_return)
        .groupBy(
            F.col(station_col).alias("station"),
            period_start(ts, key).alias("period"),
            time_key(ts, key).alias(key),
        )
        .agg(
            F.count(F.when(is_rent, F.lit(1))).alias("cr"),
            F.count(F.when(is_return, F.lit(1))).alias("cv"),
        )
    )
    profile = level1.groupBy("station", key).agg(
        F.avg(F.when(F.col("cr") > 0, F.col("cr"))).alias("n_rents"),
        F.avg(F.when(F.col("cv") > 0, F.col("cv"))).alias("n_returns"),
    )
    return profile.where(
        F.col("n_rents").isNotNull() & F.col("n_returns").isNotNull()
    )
