"""Stateful streaming: running per-station totals accumulate across
micro-batches and the final totals equal the batch groupBy count."""

from __future__ import annotations

from pyspark.sql import functions as F

from bicis_spark.schemas import EVENTS
from bicis_spark.sources.io import read_table
from bicis_spark.streaming.stateful import running_station_counts
from bicis_spark.streaming.windows import read_events_stream


def test_running_counts_accumulate(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_stream")
    # two files -> (with maxFilesPerTrigger=1) two micro-batches, forcing
    # state to carry across batches
    read_table(spark, sf_dir, "events").repartition(2).write.mode(
        "overwrite"
    ).parquet(src)

    stream = read_events_stream(spark, src, EVENTS)
    out = running_station_counts(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts_t")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink in update mode appends each emission; the max per station
    # is the final running total
    emitted = spark.sql(
        "SELECT station, max(total_events) AS total FROM running_counts_t GROUP BY station"
    )
    got = {r["station"]: r["total"] for r in emitted.collect()}

    want = {
        r["user_id"]: r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

    n_batches = spark.sql(
        "SELECT count(*) AS c FROM running_counts_t"
    ).first()["c"]
    assert n_batches > len(want)  # more emissions than keys ⇒ multiple batches


def test_running_counts_null_ts_emits_null_last_ts(spark, tmp_path):
    """A key whose events all carry ts=NULL must emit last_ts=NULL, never
    the 1970 epoch (an integer-0 state initializer would fabricate an
    event time); a key with a mix reports the max non-null ts."""
    import datetime as dt

    from bicis_spark.schemas import EVENTS

    src = str(tmp_path / "null_ts_stream")
    t1 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, None, 10, "view", 1.0, None),
        (2, None, 10, "click", 1.0, None),
        (3, t1, 20, "view", 1.0, None),
        (4, None, 20, "click", 1.0, None),
    ]
    spark.createDataFrame(rows, EVENTS).write.mode("overwrite").parquet(src)

    from bicis_spark.streaming.stateful import running_station_counts
    from bicis_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, src, EVENTS)
    q = (
        running_station_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts_nullts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["station"]: (r["total_events"], r["last_ts"])
        for r in spark.table("running_counts_nullts").collect()
    }
    assert got[10] == (2, None)
    assert got[20] == (2, t1)
