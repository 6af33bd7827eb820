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


def next_window_count_bucketed(
    df: DataFrame,
    station_col: str,
    ts_col: str,
    id_col: str = "id",
    window_seconds: int = 3600,
    out_name: str = "n_rents",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Skew-bounded variant of ``next_window_count`` for hot stations.

    A range-frame window partitions by station alone, so one hot station's
    entire history lands in a single task — and AQE's skew splitting does
    NOT apply to window exchanges (only joins). This variant re-keys the
    window to (station, time bucket), bounding every task by a bucket of
    events: each event goes to its home bucket, and events in the first W
    of a bucket are *replicated* into the previous bucket so forward
    windows that cross the boundary still see them; only home-bucket rows
    emit results. The per-station max (for the full-window mask) is a
    separate tiny aggregate joined back by station.

    Equivalent output to ``next_window_count`` whenever
    ``bucket_seconds >= window_seconds``; cost: duplicating the W-sized
    bucket prefix (W/bucket fraction of rows) + one extra small join.
    """
    if bucket_seconds < window_seconds:
        raise ValueError("bucket must be at least the window length")
    w_us = window_seconds * 1_000_000
    b_us = bucket_seconds * 1_000_000

    base = (
        df.where(F.col(station_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_sec", F.unix_micros(F.col(ts_col)))
        .withColumn("_bucket", F.floor(F.col("_sec") / F.lit(b_us)).cast("long"))
    )
    home = base.withColumn("_home", F.lit(True))
    # replicate the first W of each bucket into the previous bucket
    spill = (
        base.where(F.pmod(F.col("_sec"), F.lit(b_us)) < F.lit(w_us))
        .withColumn("_bucket", F.col("_bucket") - F.lit(1))
        .withColumn("_home", F.lit(False))
    )
    union = home.unionByName(spill)

    frame = (
        Window.partitionBy(station_col, "_bucket")
        .orderBy("_sec")
        .rangeBetween(0, w_us - 1)
    )
    counted = union.withColumn("_cnt", F.count(F.lit(1)).over(frame)).where(
        F.col("_home")
    )

    maxes = (
        base.groupBy(station_col)
        .agg(F.max("_sec").alias("_max_sec"))
    )
    return (
        counted.join(F.broadcast(maxes), station_col)
        .where(F.col("_sec") <= F.col("_max_sec") - F.lit(w_us))
        .select(F.col(id_col), F.col("_cnt").cast("long").alias(out_name))
    )
