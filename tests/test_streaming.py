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


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode semantics under late data: an event older than the
    late-record filter watermark is dropped and its window never appears;
    only windows fully below the final watermark are emitted.

    Note the documented one-batch lag: the filter watermark trails the
    eviction watermark by one microbatch (Spark computes the watermark
    from the PREVIOUS batch's max event time), so the late event arrives
    in batch 3, two batches after the event that advanced the watermark
    past it."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)

    def write_batch(rows):
        spark.createDataFrame(rows, "ts string, k string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes => deterministic file order

    # batch 1: 00:00 and 05:00 -> eviction watermark becomes 04:00
    write_batch([("2024-01-01 00:00:30", "a"), ("2024-01-01 05:00:00", "a")])
    # batch 2: 06:00 -> filter watermark catches up to 04:00
    write_batch([("2024-01-01 06:00:00", "a")])
    # batch 3: 01:30 -- 2.5h behind the filter watermark: must be dropped
    write_batch([("2024-01-01 01:30:00", "a")])

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_t")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
        )
    finally:
        q.stop()
    got = {
        str(r["start"]): r["n"]
        for r in spark.sql("SELECT * FROM late_drop_t").collect()
    }
    assert dropped == 1
    # only the 00:00 window closed under the final watermark (05:00); the
    # late event's 01:00 window must not exist; 05:00/06:00 stay open
    assert got == {"2024-01-01 00:00:00": 1}, got


def test_foreachbatch_merge_sink_is_replay_idempotent(spark, tmp_path):
    """Exactly-once sink recipe: foreachBatch + key-merge into a parquet
    state table. Structured Streaming guarantees at-least-once foreachBatch
    delivery; end-to-end exactly-once therefore requires the sink merge to
    be idempotent under batch REPLAY. merge_into on the event key
    (insert-new, update-is-identity for replayed rows) provides that: the
    final state equals the batch DISTINCT, and re-applying the last batch
    changes nothing."""
    import glob

    from pyspark.sql import functions as F

    from bicis_spark.operators.merge import merge_into

    src_dir = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    rows = [(i, f"u{i % 3}", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, user string, v double")
    # several files => several microbatches with maxFilesPerTrigger=1
    df.repartition(4).write.parquet(src_dir)

    seen_batches = []

    def upsert(batch_df, batch_id):
        batch = batch_df.dropDuplicates(["event_id"])
        if glob.glob(state_dir + "/*.parquet"):
            state = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_into(
                state,
                batch,
                key_cols=["event_id"],
                update_set={},  # replayed rows: identity update
                insert_values={
                    "event_id": F.col("s.event_id"),
                    "user": F.col("s.user"),
                    "v": F.col("s.v"),
                },
            )
        else:
            merged = batch
        pdf = merged.toPandas()  # tiny state; avoids read/overwrite races
        batch_df.sparkSession.createDataFrame(pdf, merged.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(state_dir)
        seen_batches.append(batch.count())

    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    q = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
    q.awaitTermination(120)

    state = spark.read.parquet(state_dir)
    assert len(seen_batches) > 1  # genuinely incremental
    assert state.count() == 30
    assert sorted(map(tuple, state.collect())) == sorted(rows)

    # simulate the failure mode: the LAST batch is delivered again
    replay = spark.read.parquet(src_dir).limit(10)
    upsert(replay, batch_id=999)
    state2 = spark.read.parquet(state_dir)
    assert sorted(map(tuple, state2.collect())) == sorted(rows)


def test_rocksdb_state_store_parity_and_engagement(spark, sf_dir, tmp_path):
    """The 100 TB state-store path: the same stateful aggregation drained
    under the RocksDB provider must (a) actually run its state operator on
    RocksDB (custom metrics in the query progress prove engagement — a
    silently ignored conf would pass a results-only test), (b) produce
    exactly the batch answer, and (c) leave the shared session's confs
    untouched afterwards."""
    import json

    from bicis_spark.streaming.statestore import (
        _CHANGELOG_CONF,
        _PROVIDER_CONF,
        rocksdb_state,
    )
    from bicis_spark.streaming.windows import hourly_counts_stream

    src = _events_stream_dir(spark, sf_dir, tmp_path)
    prior_provider = spark.conf.get(_PROVIDER_CONF, None)

    with rocksdb_state(spark):
        stream_src = read_events_stream(spark, src, EVENTS)
        q = (
            hourly_counts_stream(stream_src)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_hourly_t")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
            progress = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()

    state_ops = [op for p in progress for op in p.get("stateOperators", [])]
    assert state_ops, "stateful query reported no state operators"
    assert any(
        "rocksdb" in k.lower()
        for op in state_ops
        for k in op.get("customMetrics", {})
    ), "state operator shows no RocksDB metrics - provider conf ignored"

    got = {
        (r["hour_start"], r["n"])
        for r in spark.table("rocksdb_hourly_t").collect()
    }
    want = {
        (r["hour_start"], r["n"])
        for r in spark.read.schema(EVENTS)
        .parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0
    assert spark.conf.get(_PROVIDER_CONF, None) == prior_provider
    assert spark.conf.get(_CHANGELOG_CONF, None) is None


def test_upsert_sink_multibatch_latest_wins(spark, tmp_path):
    """run_upsert_stream (streaming/sinks.py): 4 source files => 4
    microbatches; final committed state equals the batch argmax per key,
    old table versions are vacuumed down to keep_versions."""
    from pyspark.sql import functions as F

    from bicis_spark.streaming.sinks import (
        _committed_versions,
        latest_per_key,
        run_upsert_stream,
    )

    src_dir = str(tmp_path / "upsert_src")
    target = str(tmp_path / "upsert_target")
    rows = [(i, i % 7, (i * 3) % 11, float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, k long, ts long, v double")
    df.repartition(4, F.col("event_id")).write.parquet(src_dir)

    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    state = run_upsert_stream(
        stream, target, key_cols=["k"], order_cols=["ts", "event_id"]
    )

    batch = spark.read.schema(df.schema).parquet(src_dir)
    want = sorted(
        map(tuple, latest_per_key(batch, ["k"], ["ts", "event_id"]).collect())
    )
    got = sorted(map(tuple, state.select("k", "event_id", "ts", "v").collect()))
    # align column orders: latest_per_key returns k first then remaining
    assert got == want and len(got) == 7
    versions = _committed_versions(target)
    assert len(versions) <= 2  # vacuumed
    assert versions[-1] >= 3  # one commit per microbatch actually happened


def test_upsert_sink_stale_replay_is_noop(spark, tmp_path):
    """Re-processing an OLDER slice of the stream against existing state
    (redelivery / out-of-order replay) must not regress any key: the
    latest-wins total order makes the merge idempotent for stale rows."""
    from bicis_spark.streaming.sinks import run_upsert_stream

    schema = "event_id long, k long, ts long, v double"
    new_dir = str(tmp_path / "src_new")
    old_dir = str(tmp_path / "src_old")
    target = str(tmp_path / "target")
    newer = [(100 + i, i % 3, 50 + i, float(i)) for i in range(9)]
    older = [(i, i % 3, i, -1.0) for i in range(9)]
    spark.createDataFrame(newer, schema).coalesce(1).write.parquet(new_dir)
    spark.createDataFrame(older, schema).coalesce(1).write.parquet(old_dir)

    def _run(src, ckpt):
        stream = (
            spark.readStream.format("parquet")
            .schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        return run_upsert_stream(
            stream,
            target,
            key_cols=["k"],
            order_cols=["ts", "event_id"],
            checkpoint_dir=str(tmp_path / ckpt),
        )

    first = sorted(map(tuple, _run(new_dir, "ck1").collect()))
    second = sorted(map(tuple, _run(old_dir, "ck2").collect()))
    assert second == first  # every replayed row was stale: state unchanged
    assert all(r[3] != -1.0 for r in second)


def test_upsert_sink_version_history_obeys_cdc_laws(spark, tmp_path):
    """Cross-operator integration: snapshot_diff over the sink's committed
    version history is a change-data-feed, and an upsert-only sink's feed
    obeys three laws — (1) no key is ever removed, (2) every final key is
    'added' in exactly one version step, (3) a 'changed' key's (ts,
    event_id) strictly increases (latest-wins can only move state
    forward)."""
    from pyspark.sql import functions as F

    from bicis_spark.operators.snapshot import snapshot_diff
    from bicis_spark.streaming.sinks import (
        _committed_versions,
        read_table_version,
        run_upsert_stream,
    )

    src_dir = str(tmp_path / "cdc_src")
    target = str(tmp_path / "cdc_target")
    schema = "event_id long, k long, ts long, v double"
    rows = [(i, i % 5, (7 * i) % 23, float(i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, schema)
    df.repartition(4, F.col("event_id")).write.parquet(src_dir)

    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    final = run_upsert_stream(
        stream,
        target,
        key_cols=["k"],
        order_cols=["ts", "event_id"],
        keep_versions=100,  # retain the full history for the diff walk
    )

    versions = _committed_versions(target)
    assert len(versions) == 4  # one commit per microbatch
    import os

    def _read(v):
        return spark.read.schema(final.schema).parquet(
            os.path.join(target, f"v{v}")
        )

    added_keys: list[int] = []
    for before_v, after_v in zip(versions, versions[1:]):
        before, after = _read(before_v), _read(after_v)
        feed = snapshot_diff(before, after, ["k"]).collect()
        assert all(r["status"] != "removed" for r in feed)
        added_keys += [r["k"] for r in feed if r["status"] == "added"]
        changed = [r["k"] for r in feed if r["status"] == "changed"]
        if changed:
            b = {r["k"]: (r["ts"], r["event_id"]) for r in before.collect()}
            a = {r["k"]: (r["ts"], r["event_id"]) for r in after.collect()}
            assert all(a[k] > b[k] for k in changed)

    first_keys = {r["k"] for r in _read(versions[0]).collect()}
    final_keys = {r["k"] for r in final.collect()}
    # law 2: first version's keys + one 'added' per later-arriving key
    assert first_keys | set(added_keys) == final_keys
    assert len(added_keys) == len(set(added_keys))


def test_upsert_sink_resumes_from_checkpoint_incrementally(spark, tmp_path):
    """Stop/restart semantics: a second run with the SAME checkpoint over
    a source that gained files processes ONLY the new files (the file
    source's checkpointed offset log), advances the version counter by
    exactly the new batches, and lands on the same final state as one
    uninterrupted run."""
    import shutil as sh

    from pyspark.sql import functions as F

    from bicis_spark.streaming.sinks import (
        _committed_versions,
        latest_per_key,
        run_upsert_stream,
    )

    schema = "event_id long, k long, ts long, v double"
    rows = [(i, i % 6, (11 * i) % 17, float(i)) for i in range(40)]
    all_dir = str(tmp_path / "all")
    spark.createDataFrame(rows, schema).repartition(
        4, F.col("event_id")
    ).write.parquet(all_dir)
    import os

    files = sorted(
        f for f in os.listdir(all_dir) if f.endswith(".parquet")
    )
    assert len(files) == 4

    src = str(tmp_path / "src")
    os.makedirs(src)
    for f in files[:2]:
        sh.copy(os.path.join(all_dir, f), os.path.join(src, f))

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        return run_upsert_stream(
            stream,
            target,
            key_cols=["k"],
            order_cols=["ts", "event_id"],
            keep_versions=100,
            checkpoint_dir=ckpt,
        )

    _run()
    v_after_first = _committed_versions(target)[-1]
    assert v_after_first == 1  # two files => commits v0, v1

    for f in files[2:]:
        sh.copy(os.path.join(all_dir, f), os.path.join(src, f))
    final = _run()
    v_after_second = _committed_versions(target)[-1]
    # only the two NEW files were processed: exactly two more commits
    assert v_after_second == 3

    batch = spark.read.schema(schema).parquet(all_dir)
    want = sorted(
        map(tuple, latest_per_key(batch, ["k"], ["ts", "event_id"]).collect())
    )
    got = sorted(map(tuple, final.select("k", "event_id", "ts", "v").collect()))
    assert got == want
