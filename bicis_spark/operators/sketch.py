"""Count-min sketch: fixed-size frequency counters with a one-sided error
guarantee (estimate >= true count, always; overestimate bounded by the
collision mass N/width per row, taken min across depth independent rows).

The reference counts frequencies by full groupBys (pandas value_counts in
bicis/etl/basic_features.py); at 100 TB a full groupBy on a high-cardinality
key is a giant shuffle whose result may not fit anywhere. The CMS costs a
CONSTANT depth × width counter grid regardless of key cardinality:

- build: each input row contributes ``depth`` (row, col) increments via
  seeded xxhash64; the groupBy that follows has at most depth × width
  groups, so map-side partial aggregation collapses each task's contribution
  to <= depth × width rows before the (tiny) shuffle. The 100 TB input is
  scanned once and never shuffled.
- estimate: the counter grid is broadcast (depth × width rows, e.g. 4 × 1024
  = 4096) and candidate keys probe it with a broadcast-hash join + min()
  hash agg — no shuffle of the candidate side beyond its own key agg.

The one-sided guarantee (est >= exact) is deterministic — not probabilistic
— so it is hash-gated in the declared contract query; only the SIZE of the
overestimate is probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probe_positions(key_col: str, depth: int, width: int):
    """array<int> of the key's counter column per sketch row, via seeded
    xxhash64 (seed = row index)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).cast(
                "int"
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Counter grid as (row_i, col_i, cnt) — at most depth × width rows."""
    rows = df.select(
        F.posexplode(_probe_positions(key_col, depth, width)).alias(
            "row_i", "col_i"
        )
    )
    return rows.groupBy("row_i", "col_i").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, cms_est): min over the key's depth counters. Keys absent from
    the input estimate as the pure collision mass (>= 0), never null —
    unless a counter cell was never touched at all, in which case the
    inner join drops that probe and min() runs over the touched cells
    (still an upper bound, since the untouched cell would estimate 0 for
    a key that, being absent, has true count 0)."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(_probe_positions(key_col, depth, width)).alias(
            "row_i", "col_i"
        ),
    )
    return (
        probes.join(F.broadcast(counters), on=["row_i", "col_i"], how="inner")
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


def heavy_hitters_with_contract(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-k exact heavy hitters with the CMS one-sided guarantee checked
    per key: (key, exact_n, est_ge_exact). est_ge_exact is TRUE for every
    key by CMS construction — the declared oracle replays that invariant,
    so a sketch bug (an underestimate) hash-fails the contract.

    Ties at the rank-k boundary break on the key value, giving both
    engines the same total order.
    """
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc(key_col)).limit(k)
    counters = cms_build(df, key_col, depth, width)
    est = cms_estimate(counters, top.select(key_col), key_col, depth, width)
    return top.join(est, on=key_col).select(
        key_col,
        F.col("exact_n").cast("long").alias("exact_n"),
        (F.col("cms_est") >= F.col("exact_n")).alias("est_ge_exact"),
    )
