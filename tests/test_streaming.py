"""Streaming variants equal their batch counterparts on a finite source
(SURVEY.md §2.9): tumbling hourly counts and per-station sliding counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from bicis_spark.schemas import EVENTS
from bicis_spark.sources.io import read_table
from bicis_spark.streaming.windows import (
    hourly_counts_stream,
    read_events_stream,
    run_to_completion,
    station_sliding_counts_stream,
)


def _events_stream_dir(spark, sf_dir, tmp_path):
    """The raw events parquet has ns timestamps Spark can't stream-read;
    re-materialize through the engine reader as a streamable copy."""
    out = str(tmp_path / "events_stream")
    read_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_hourly_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    src = _events_stream_dir(spark, sf_dir, tmp_path)
    stream_src = read_events_stream(spark, src, EVENTS)
    result = run_to_completion(
        hourly_counts_stream(stream_src), "hourly_counts_t"
    )

    batch = (
        spark.read.schema(EVENTS)
        .parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["hour_start"], r["n"]) for r in result.collect()}
    want = {(r["hour_start"], r["n"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_sliding_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    src = _events_stream_dir(spark, sf_dir, tmp_path)
    stream_src = read_events_stream(spark, src, EVENTS)
    result = run_to_completion(
        station_sliding_counts_stream(stream_src, slide="30 minutes"),
        "sliding_counts_t",
    )
    # batch equivalent: explode each event into its overlapping windows
    batch = (
        spark.read.schema(EVENTS)
        .parquet(src)
        .groupBy("user_id", F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("user_id").alias("station"),
            F.col("win.start").alias("win_start"),
            "n",
        )
    )
    got = {(r["station"], r["win_start"], r["n"]) for r in result.collect()}
    want = {(r["station"], r["win_start"], r["n"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_session_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    from bicis_spark.streaming.windows import session_counts_stream

    src = _events_stream_dir(spark, sf_dir, tmp_path)
    stream_src = read_events_stream(spark, src, EVENTS)
    result = run_to_completion(
        session_counts_stream(stream_src), "session_counts_t"
    )
    batch = (
        spark.read.schema(EVENTS)
        .parquet(src)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("user_id").alias("station"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n",
        )
    )
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0
