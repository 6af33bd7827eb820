"""Time-range join — bucketized equi-join form (pyspark_guide 'As-of /
range join': bucketize the range key + equi-join on bucket + filter).

Semantics: left ⋈ right on key equality AND ``right_ts ∈ [left_ts - lookback,
left_ts]`` — "everything that happened for this key in the window before
the event". A naive inequality join compiles to BroadcastNestedLoopJoin
(O(|L|·|R|) comparisons); re-keying both sides to coarse time buckets turns
it into a hash-partitioned equi-join on (key, bucket) where each left row
probes only ⌈lookback/bucket⌉+1 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_lookback(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    lookback_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with matching key and
    ``left_ts - lookback <= right_ts <= left_ts``.

    Output: all left columns + all right columns (inner join). The left side
    explodes to one row per probed bucket (bounded by lookback/bucket + 1 ≈
    2 with the default bucket = lookback); the join itself is a plain
    equi-join Catalyst can hash/sort-merge and AQE can skew-split.
    """
    bucket_seconds = bucket_seconds or lookback_seconds
    lb_us = lookback_seconds * 1_000_000
    b_us = bucket_seconds * 1_000_000
    n_buckets = lb_us // b_us + 1

    l_sec = F.unix_micros(F.col(left_ts))
    r_sec = F.unix_micros(F.col(right_ts))

    probes = F.sequence(
        F.floor((l_sec - F.lit(lb_us)) / F.lit(b_us)).cast("long"),
        F.floor(l_sec / F.lit(b_us)).cast("long"),
    )
    lhs = left.withColumn("_bucket", F.explode(probes))
    rhs = right.withColumn("_bucket", F.floor(r_sec / F.lit(b_us)).cast("long"))

    joined = lhs.join(
        rhs,
        (F.col(f"{by_left}") == F.col(f"{by_right}"))
        & (lhs["_bucket"] == rhs["_bucket"]),
    )
    in_range = (F.unix_micros(F.col(right_ts)) <= F.unix_micros(F.col(left_ts))) & (
        F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) - F.lit(lb_us)
    )
    out_cols = [left[c] for c in left.columns] + [right[c] for c in right.columns]
    assert n_buckets >= 1
    return joined.where(in_range).select(*out_cols)
