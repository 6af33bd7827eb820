"""Streaming window aggregations (SURVEY.md §2.9).

The reference is entirely batch, but its two time-series semantics are
exactly Structured Streaming's windowed aggregations:

- A6 hourly resample → tumbling-window count;
- W1 per-station sliding event-time count → sliding-window count with a
  watermark replacing the batch "full-window mask" (late events beyond the
  watermark are dropped instead of masked out after the fact —
  ``next_window_target.py:86-89``'s closed-world assumption made explicit).

All queries here are incremental: state is bounded by (watermark horizon ×
keys); at scale the state store shards with the shuffle partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_events_stream(spark, source_dir: str, schema: StructType) -> DataFrame:
    """File-source stream over the events table layout. In production this
    is Kafka/Kinesis; the file source has identical semantics for testing
    (pyspark_guide: memory-sink + processAllAvailable drives it to
    completion synchronously)."""
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )


def hourly_counts_stream(
    events: DataFrame, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """A6 streaming: tumbling 1-hour counts with late-data handling."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("hour_start"), "n")
    )


def station_sliding_counts_stream(
    events: DataFrame,
    station_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """W1 streaming analog: per-station sliding event-time counts. Each
    event contributes to window/slide overlapping windows; the watermark
    bounds state exactly where the batch operator's full-window mask
    bounded output."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(station_col).alias("station"), F.window(ts_col, window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("station", F.col("win.start").alias("win_start"), "n")
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive a (finite file-source) streaming query to completion through
    the memory sink and return the result as a batch DataFrame. Complete
    output mode: every window is emitted regardless of watermark progress,
    which makes the finite-source result equal to the batch aggregation."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def session_counts_stream(
    events: DataFrame,
    station_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: per-station activity sessions closed after ``gap``
    of silence — the streaming-native form of the batch lag+cumsum
    sessionization (core_queries.sessionization). State per open session,
    closed and emitted once the watermark passes session end + gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(station_col).alias("station"),
            F.session_window(ts_col, gap).alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "station",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n",
        )
    )
