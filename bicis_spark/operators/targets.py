"""Forward rolling event-time window count — the regression target
(SURVEY.md §2.5 W1, the centerpiece operator).

Reference semantics (``bicis/etl/feature_extraction/next_window_target.py:
41-111``): per station, for each event at time t, count events of the same
station in ``[t, t + W)`` (pandas offset-rolling over a reversed monotonic
index is closed-right ⇒ the forward window includes t and excludes t+W);
keep only "full windows" — events with ``t <= max(station ts) - W``
(``:86-96``); emit (id, count as int).

Spark-first: the reference materializes each station's entire history in
one worker's memory via ``groupByKey`` + per-group pandas (OOM on hot
stations, ``:52-64``). Here it is a single window function over a range
frame on epoch microseconds — Spark's window exchange hash-partitions by
station and sorts within partitions (spillable UnsafeExternalSorter), AQE
splits skewed partitions; no per-group materialization, no Python worker.

Boundary precision: frames are ``[0, W)`` in *microseconds*
(``rangeBetween(0, W_us - 1)`` on ``unix_micros``), exactly the pandas
closed-right semantics at full timestamp resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_window_count(
    df: DataFrame,
    station_col: str,
    ts_col: str,
    id_col: str = "id",
    window_seconds: int = 3600,
    out_name: str = "n_rents",
) -> DataFrame:
    """(id, <out_name>) — events in [t, t+W) per station, full windows only."""
    w_us = window_seconds * 1_000_000

    frame = (
        Window.partitionBy(station_col).orderBy("_sec").rangeBetween(0, w_us - 1)
    )
    per_station = Window.partitionBy(station_col)

    return (
        df.where(F.col(station_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_sec", F.unix_micros(F.col(ts_col)))
        .withColumn("_cnt", F.count(F.lit(1)).over(frame))
        .withColumn("_max_sec", F.max("_sec").over(per_station))
        # full-window mask: t <= max - W (inclusive, next_window_target.py:86-89)
        .where(F.col("_sec") <= F.col("_max_sec") - F.lit(w_us))
        .select(F.col(id_col), F.col("_cnt").cast("long").alias(out_name))
    )
