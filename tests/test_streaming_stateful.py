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
