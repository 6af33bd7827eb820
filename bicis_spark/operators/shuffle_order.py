"""Deterministic training-data shuffling: epoch-seeded pseudo-random shard
assignment and within-shard order, with zero RNG state.

A 100 TB training run needs the corpus in a different-but-reproducible
random order every epoch, sharded so each data-loader rank reads one
slice. Engines that sort by rand() lose reproducibility under retries and
need a full global sort besides. This operator derives everything from a
cryptographic hash of (epoch, id):

- ``shuffle_key = md5(epoch || ':' || id)`` — avalanche mixing gives
  uniform pseudo-random order; same (epoch, id) always lands identically,
  so speculative re-execution, partial restarts, and re-runs agree;
- ``shard = first 8 hex digits mod n_shards`` — uniform shard sizes,
  no skew by construction;
- position = row_number within the shard ordered by (key, id) — the ONLY
  shuffle is the per-shard window exchange; there is no global sort, and
  shards order independently exactly like per-rank loader files.

md5 (not xxhash64) is deliberate: both engines implement RFC 1321, so the
whole shuffle — key, shard, and position — replays bit-for-bit in the
DuckDB oracle. Changing ``epoch`` reshuffles everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int, n_shards: int = 8
) -> DataFrame:
    """Adds (shard, position) giving the epoch's training order: shard
    round-robins the data-loader ranks, position orders within a shard."""
    key = F.md5(F.concat_ws(":", F.lit(epoch), F.col(id_col).cast("string")))
    out = df.withColumn("_key", key).withColumn(
        "shard",
        F.pmod(F.conv(F.substring("_key", 1, 8), 16, 10).cast("long"),
               F.lit(n_shards)).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return out.withColumn(
        "position", F.row_number().over(w).cast("long")
    ).drop("_key")
