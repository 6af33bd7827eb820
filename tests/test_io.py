"""IO parity: CSV sink/scan round-trip (S3/S7), parquet partition pruning
layout, nanos-timestamp handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from bicis_spark.schemas import EVENTS, TABLES
from bicis_spark.sources.io import read_csv, read_table, write_csv, write_parquet


def test_csv_round_trip(spark, sf_dir, tmp_path):
    """S7 headered CSV sink → S3 schema-explicit scan preserves values
    (timestamps via ISO strings — the reference's unify.py:43-45 format)."""
    events = read_table(spark, sf_dir, "events").limit(100)
    out = str(tmp_path / "events_csv")
    formatted = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    write_csv(formatted, out)
    back = read_csv(
        spark,
        out,
        schema="event_id long, ts string, user_id long, event_type string, value double",
        sep=",",
    ).withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    orig = {r["event_id"]: r for r in events.collect()}
    rt = {r["event_id"]: r for r in back.collect()}
    assert set(orig) == set(rt)
    for k in orig:
        assert rt[k]["ts"] == orig[k]["ts"]
        assert rt[k]["value"] == orig[k]["value"]
        assert rt[k]["event_type"] == orig[k]["event_type"]


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    """partition_by layout enables partition pruning: filtering on the
    partition column scans only matching directories."""
    events = read_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(events, out, partition_by=["event_type"])
    clicks = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert clicks.count() == events.where(F.col("event_type") == "click").count()
    # pruned scan reads one partition directory
    assert "PartitionFilters: [isnotnull(event_type" in plan or "event_type=click" in plan


def test_all_tables_readable_with_declared_schema(spark, sf_dir):
    for name, schema in TABLES.items():
        df = read_table(spark, sf_dir, name)
        assert df.schema == schema or [f.name for f in df.schema.fields] == [
            f.name for f in schema.fields
        ]
        assert df.count() > 0


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with zero Exchange operators — the write-time shuffle
    is the only one ever paid."""
    from bicis_spark.sources.io import write_bucketed_table

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed_table(left, "bkt_left", ["k"], 4, sort_cols=["k"],
                         path=str(tmp_path / "l"))
    write_bucketed_table(right, "bkt_right", ["k"], 4, sort_cols=["k"],
                         path=str(tmp_path / "r"))
    try:
        with_bc_off = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        old = {k: spark.conf.get(k) for k in with_bc_off}
        for k, v in with_bc_off.items():
            spark.conf.set(k, v)
        try:
            joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Reading one partition of a partitionBy-written table must show a
    PartitionFilter and scan only that partition's files."""
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    path = str(tmp_path / "parts")
    write_parquet(df, path, partition_by=["bucket"])
    got = spark.read.parquet(path).where(F.col("bucket") == 2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must land in PartitionFilters (directory-level
    # pruning), NOT as a post-scan Filter over the data
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "= 2" in m.group(1), plan
    assert got.count() == 25


def test_jsonl_round_trip(spark, tmp_path):
    """JSON-lines sink -> schema-explicit JSONL scan round-trips values
    (timestamps included) without inference."""
    from bicis_spark.sources.io import read_jsonl, write_json

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", -1.0)], "id long, s string, v double"
    )
    path = str(tmp_path / "jl")
    write_json(df, path)
    back = read_jsonl(spark, path, df.schema)
    assert sorted((r["id"], r["s"], r["v"]) for r in back.collect()) == [
        (1, "a", 2.5),
        (2, "b", -1.0),
    ]
    assert back.schema == df.schema


def test_sorted_parquet_layout_disjoint_file_ranges(spark, sf_dir, tmp_path):
    import glob

    from bicis_spark.sources.io import read_table, write_sorted_parquet

    path = str(tmp_path / "orders_sorted")
    orders = read_table(spark, sf_dir, "orders")
    write_sorted_parquet(orders, path, ["o_orderdate"], n_partitions=4)

    files = sorted(glob.glob(path + "/*.parquet"))
    assert len(files) > 1
    # per-file min/max ranges must be pairwise disjoint (the pruning
    # property), and each file internally sorted
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["o_orderdate"])
        vals = t.column("o_orderdate").to_pylist()
        assert vals == sorted(vals)
        ranges.append((min(vals), max(vals)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    # nothing lost
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == orders.count()


def test_zorder_parquet_layout_prunes_both_dims(spark, sf_dir, tmp_path):
    """Z-order layout: per-file bounding boxes must be tight on BOTH
    clustering columns — each file covers a small fraction of each
    column's domain, so footer stats prune on either predicate (the
    property 1-D range clustering cannot give the second column)."""
    import glob

    import pyarrow.parquet as pq

    from bicis_spark.sources.io import read_table, write_zorder_parquet

    path = str(tmp_path / "li_zorder")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    write_zorder_parquet(
        li, path, ["l_partkey", "l_extendedprice"], n_partitions=16, bits=8
    )

    files = sorted(glob.glob(path + "/*.parquet"))
    assert len(files) > 4
    n_rows = li.count()
    lo_pk, hi_pk, lo_px, hi_px = li.select(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_extendedprice"), F.max("l_extendedprice"),
    ).first()
    span_pk = hi_pk - lo_pk
    span_px = hi_px - lo_px
    covered_pk = covered_px = 0.0
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["l_partkey", "l_extendedprice"])
        pk = t.column("l_partkey").to_pylist()
        px = t.column("l_extendedprice").to_pylist()
        covered_pk += (max(pk) - min(pk)) / span_pk
        covered_px += (max(px) - min(px)) / span_px
        total += len(pk)
    assert total == n_rows
    n = len(files)
    # random placement would make every file span ~the full domain on both
    # columns (mean fraction ~= 1.0), and 1-D range clustering gives ~1.0 on
    # its SECOND dim. The ideal Morton bound for 16 files is ~1/sqrt(16) =
    # 0.25 per dim; files straddling curve cuts widen that, so gate at 0.6 —
    # still >1.6x pruning on both dims simultaneously.
    assert covered_pk / n < 0.6, f"partkey coverage {covered_pk / n:.2f}"
    assert covered_px / n < 0.6, f"extendedprice coverage {covered_px / n:.2f}"


def test_read_evolving_parquet_aligns_generations(spark, tmp_path):
    """Schema evolution: generation 1 lacks a column added in generation 2;
    the unified read aligns by name with typed nulls, preserving per-scan
    pushdown (no mergeSchema footer sweep)."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from bicis_spark.sources.io import read_evolving_parquet

    g1_schema = StructType(
        [StructField("id", LongType()), StructField("v", DoubleType())]
    )
    g2_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", DoubleType()),
            StructField("tag", StringType()),
        ]
    )
    p1, p2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    spark.createDataFrame([(1, 1.0), (2, 2.0)], g1_schema).write.parquet(p1)
    spark.createDataFrame([(3, 3.0, "x")], g2_schema).write.parquet(p2)

    out = read_evolving_parquet(spark, [p1, p2], [g1_schema, g2_schema], g2_schema)
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 1.0, None), (2, 2.0, None), (3, 3.0, "x")]
    assert out.schema == g2_schema


def test_orc_round_trip(spark, sf_dir, tmp_path):
    """ORC sink -> schema-explicit ORC scan round-trips values including
    timestamps (same S4 discipline as parquet)."""
    from bicis_spark.sources.io import read_orc, read_table, write_orc

    events = read_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "events_orc")
    write_orc(events, path)
    back = read_orc(spark, path, events.schema)
    assert back.schema == events.schema
    a = sorted(map(tuple, events.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from bicis_spark.sources.io import compact_parquet

    src = str(tmp_path / "many")
    out = str(tmp_path / "few")
    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(40).write.parquet(src)  # 40 tiny files
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 40
    n = compact_parquet(spark, src, out, target_file_bytes=1 << 30)
    assert n == 1
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20_000))

    # re-clustered compaction restores the range-pruning layout
    out2 = str(tmp_path / "few_sorted")
    import pyarrow.parquet as pq

    compact_parquet(
        spark, src, out2, target_file_bytes=120_000, sort_cols=["id"]
    )
    files = sorted(glob.glob(out2 + "/*.parquet"))
    assert len(files) > 1
    ranges = sorted(
        (
            min(t := pq.read_table(f, columns=["id"]).column("id").to_pylist()),
            max(t),
        )
        for f in files
    )
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_zorder_supports_date_and_decimal_columns(spark, tmp_path):
    """Boundary literals must be engine-parsable for every supported
    type: date/timestamp/decimal z-columns previously spliced Python
    repr() (datetime.date(...), Decimal('...')) into SQL and crashed."""
    import datetime as dt
    import glob
    from decimal import Decimal

    from bicis_spark.sources.io import write_zorder_parquet

    rows = [
        (i, dt.date(2024, 1, 1) + dt.timedelta(days=i % 200),
         Decimal(i % 97) + Decimal("0.25"))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, d date, amt decimal(10,2)")
    path = str(tmp_path / "z_dates")
    write_zorder_parquet(df, path, ["d", "amt"], n_partitions=4, bits=4)
    assert len(glob.glob(path + "/*.parquet")) >= 2
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert set(back.columns) == {"id", "d", "amt"}


def test_evolving_read_widens_narrow_generations(spark, tmp_path):
    """A generation that stored a NARROWER type than the target (int32 vs
    int64) must come back widened — integer widths are load-bearing for
    the deterministic oracle hashes."""
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    from bicis_spark.sources.io import read_evolving_parquet

    g1 = StructType([StructField("id", IntegerType())])
    target = StructType([StructField("id", LongType())])
    p1 = str(tmp_path / "narrow")
    spark.createDataFrame([(7,)], g1).write.parquet(p1)
    out = read_evolving_parquet(spark, [p1], [g1], target)
    assert out.schema == target
    assert [r["id"] for r in out.collect()] == [7]


def test_compact_parquet_sees_partitioned_layouts(spark, tmp_path):
    """Hive-partitioned inputs keep files in subdirectories; the size
    estimate and final count must walk recursively or the whole dataset
    collapses through coalesce(1) on a zero-byte estimate."""
    from bicis_spark.sources.io import compact_parquet

    src = str(tmp_path / "parted")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 3).alias("day")
    )
    df.repartition(10).write.partitionBy("day").parquet(src)
    import glob

    assert not glob.glob(src + "/*.parquet")  # nothing at top level
    files_in = glob.glob(src + "/**/*.parquet", recursive=True)
    assert len(files_in) > 3
    total_bytes = sum(__import__("os").path.getsize(f) for f in files_in)
    # target slightly under the input size => n_files >= 2 proves the
    # size estimate saw the partition subdirectories
    n = compact_parquet(spark, src, out, target_file_bytes=total_bytes // 2)
    assert n >= 2
    assert spark.read.parquet(out).count() == 10_000


def test_partitioned_sink_read_prunes_partitions(spark, tmp_path):
    """The day-partitioned sink layout must let a day filter resolve via
    PARTITION pruning (directory-level skip), not a per-row data filter:
    the physical scan's PartitionFilters carry the event_date predicate."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bicis_spark.sources.io import overwrite_partitions_dynamic

    rows = [
        (i, dt.date(2024, 3, 1 + i % 10), float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, event_date date, v double")
    path = str(tmp_path / "part_sink")
    overwrite_partitions_dynamic(df, path, ["event_date"])

    back = spark.read.parquet(path).where(
        F.col("event_date") < dt.date(2024, 3, 4)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "day filter did not reach PartitionFilters"
    assert back.count() == sum(1 for _, d, _ in rows if d < dt.date(2024, 3, 4))
