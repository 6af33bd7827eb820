"""Skew operators: salted aggregation / salted join must be output-
identical to their unsalted forms (salting is a physical rewrite only),
and bucketed tables must join without an exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bicis_spark.operators.skew import salt_col, salted_broadcast_join, salted_count


@pytest.fixture(scope="module")
def skewed(spark):
    # one pathological key (0) holding ~90% of rows + a long tail
    rows = [(i, i % 10 if i % 10 < 2 else 0) for i in range(5000)]
    return spark.createDataFrame(rows, "row_id long, key long")


def test_salted_count_equals_plain(spark, skewed):
    plain = {r["key"]: r["n"] for r in
             skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["key"]: r["n"] for r in
              salted_count(skewed, ["key"], "row_id", n_salts=8).collect()}
    assert salted == plain


def test_salt_spreads_hot_key(spark, skewed):
    # the hot key's rows must actually land in >1 salt bucket
    n = (
        skewed.where(F.col("key") == 0)
        .select(salt_col("row_id", 8).alias("s"))
        .distinct()
        .count()
    )
    assert n == 8


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(10)], "key long, name string"
    )
    plain = sorted(
        (r["row_id"], r["name"])
        for r in skewed.join(dim, "key").select("row_id", "name").collect()
    )
    salted = sorted(
        (r["row_id"], r["name"])
        for r in salted_broadcast_join(skewed, dim, "key", n_salts=8,
                                       unique_col="row_id")
        .select("row_id", "name")
        .collect()
    )
    assert salted == plain


def test_salted_join_default_salt_spreads_and_matches(spark, skewed):
    """With no unique_col, the salt must derive from the whole row (hashing
    the join key would give every hot-key row the same salt — the silent
    no-op ADVICE flagged in r2), and output must still equal the plain join."""
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(10)], "key long, name string"
    )
    out = salted_broadcast_join(skewed, dim, "key", n_salts=8)
    plain = sorted(
        (r["row_id"], r["name"])
        for r in skewed.join(dim, "key").select("row_id", "name").collect()
    )
    salted = sorted((r["row_id"], r["name"]) for r in out.select("row_id", "name").collect())
    assert salted == plain
    # hot key 0 spreads: per-row hash over distinct row_ids hits many salts
    n_salts_hit = (
        skewed.where(F.col("key") == 0)
        .select(
            F.pmod(F.xxhash64("row_id", "key"), F.lit(8)).cast("int").alias("s")
        )
        .distinct()
        .count()
    )
    assert n_salts_hit > 1


def test_salted_join_rejects_expanding_how(spark, skewed):
    dim = spark.createDataFrame([(0, "x")], "key long, name string")
    with pytest.raises(ValueError, match="unsupported"):
        salted_broadcast_join(skewed, dim, "key", how="full")
    with pytest.raises(ValueError, match="unsupported"):
        salted_broadcast_join(skewed, dim, "key", how="right")


def test_profile_table_hostile_column_names(spark):
    """stack() SQL must survive quotes/spaces/hyphens in column names
    (positional aliases + escaped literals)."""
    from bicis_spark.operators.stats import profile_table

    df = spark.createDataFrame([(1, "a"), (2, None)], ["weird-col", "it's got space"])
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert rows["weird-col"]["n_distinct"] == 2
    assert rows["it's got space"]["n_nulls"] == 1


def test_profile_table_exact(spark):
    from bicis_spark.operators.stats import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")],
        "k long, s string",
    )
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    k, s = rows["k"], rows["s"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"], k["min_num"], k["max_num"]) == (4, 1, 3, 1, 3)
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"], s["min_num"], s["max_num"]) == (4, 1, 2, None, None)


def test_incremental_merge_equals_full_recompute(spark):
    """merge(state(history), state(delta)) == state(history ∪ delta) —
    the delta-folding contract, including keys only in one side."""
    from bicis_spark.operators.incremental import count_sum_state, merge_count_sum

    # NULL keys on both sides: groupBy keeps a NULL-key group, so the
    # merge join must match it null-safely into ONE row, not emit two.
    # Key 4 carries only NULL values in BOTH states: SUM over the union
    # is NULL, so the merged sum must stay NULL too (coalesce-to-0 would
    # fabricate a 0). Key 5 mixes a NULL-sum state with a real one.
    hist = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (None, 2.0), (4, None), (5, None)],
        "k long, v double",
    )
    delta = spark.createDataFrame(
        [(2, 7.5), (3, 1.25), (None, 3.0), (4, None), (5, 6.0)],
        "k long, v double",
    )
    merged = merge_count_sum(
        count_sum_state(hist, ["k"], "v"),
        count_sum_state(delta, ["k"], "v"),
        ["k"],
    )
    full = count_sum_state(hist.union(delta), ["k"], "v")
    as_map = lambda df: {
        r["k"]: (r["n"], None if r["s"] is None else float(r["s"]))
        for r in df.collect()
    }
    assert as_map(merged) == as_map(full)
    assert as_map(merged)[4] == (2, None)
    assert as_map(merged)[5] == (2, 6.0)
