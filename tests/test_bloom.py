"""Bloom-filter join pruning: membership completeness (no false negatives
— the correctness property) and measured pruning power (the scale
property: most non-matching rows never reach the join exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bicis_spark.operators.bloom import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_semi_join,
)


def test_bloom_no_false_negatives_and_prunes(spark):
    keys = spark.range(0, 50).select((F.col("id") * 7919).alias("k"))
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    bmp = bloom_bitmap(keys, "k")
    flagged = (
        big.crossJoin(F.broadcast(bmp))
        .where(bloom_might_contain(F.col("k"), "_bloom"))
        .drop("_bloom")
    )
    flagged_keys = {r.k for r in flagged.collect()}
    member_keys = {r.k for r in keys.collect()}
    # every true member whose value is in big's range must be flagged
    assert (member_keys & set(range(5000))) <= flagged_keys
    # pruning power: with m=65536, k=2, n=50 the FP rate is ~2e-6, so the
    # candidate set should be essentially just the true members (allow a
    # generous margin for hash collisions)
    assert len(flagged_keys) <= len(member_keys & set(range(5000))) + 5


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big = spark.range(0, 2000).select((F.col("id") % 37).alias("k"), "id")
    small = spark.range(0, 8).select((F.col("id") * 5).alias("sk"))
    got = bloom_semi_join(big, small, "k", "sk").orderBy("id").collect()
    want = (
        big.join(small, big["k"] == small["sk"], "left_semi")
        .orderBy("id")
        .collect()
    )
    assert got == want
