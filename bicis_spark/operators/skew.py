"""Skew mitigation operators: salted aggregation and salted broadcast-side
replication join — the manual tools for hot keys where AQE's skew-join
splitting doesn't reach (AQE splits skewed SortMergeJoin partitions, but
not window exchanges or aggregations over a pathological key).

Salting semantics (reference: standard Spark skew patterns,
pyspark_guide 'Skew: salting'):

- **Salted aggregation**: deterministic per-row salt spreads one hot key
  over ``n_salts`` reducers; a second, tiny aggregation over (key) merges
  the partial results. Works for any algebraic aggregate (sum/count/min/
  max and anything with a merge function).
- **Salted join**: the skewed (large) side gets a deterministic salt in
  [0, n_salts); the small side is replicated n_salts times with an
  exploded salt column, and the join key becomes (key, salt). Every
  reducer sees 1/n_salts of the hot key's rows. The small side must be
  broadcast-sized × n_salts.

Determinism: the salt is a hash of a UNIQUE row column (never rand()), so
replays, retries, and repartitions produce identical partial groups —
required for the exactly-once semantics of speculative execution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salt_col(unique_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of a unique column.
    xxhash64 is uniform, so a hot key splits ~evenly across salts."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_count(
    df: DataFrame,
    key_cols: Sequence[str],
    unique_col: str,
    n_salts: int = 16,
    out_name: str = "n",
) -> DataFrame:
    """Two-phase count per key: partial counts on (key, salt) — the wide
    shuffle, skew bounded at rows/n_salts per reducer — then a merge over
    the (key)-level partials, whose input is at most n_salts rows per key
    regardless of how hot the key is."""
    partial = (
        df.withColumn("_salt", salt_col(unique_col, n_salts))
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_pn").cast("long").alias(out_name))
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side on ``on``, spreading each hot
    key across ``n_salts`` tasks: big rows get a deterministic salt — from
    ``unique_col`` when given, else from a hash of the WHOLE row (hashing
    the join key itself would give every row of a hot key the same salt,
    silently disabling the mitigation) — the small side is exploded once
    per salt value, and the equi-join runs on (key, salt).

    Only ``inner``/``left``/``left_semi`` are accepted: the small side is
    replicated n_salts times, so right/full outer joins would emit each
    unmatched small-side row n_salts times (wrong multiplicity).

    With the small side broadcast, this is a map-side join — the salt then
    only matters if a later stage reuses the exchange; with a shuffle
    join, it is what prevents the single-straggler hot-key task.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_broadcast_join: how={how!r} unsupported — the exploded "
            f"small side duplicates unmatched rows; use one of {sorted(allowed)}"
        )
    if unique_col is not None:
        salt = salt_col(unique_col, n_salts)
    else:
        # per-row salt: xxhash64 over every big-side column. Deterministic
        # under retries/replays (pure function of row content); duplicate
        # full rows share a salt, which only weakens spreading if one exact
        # row dominates the key — pass unique_col for that case.
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
        ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = big_s.join(F.broadcast(small_s), [on, "_salt"], how)
    return out.drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Skew diagnosis: the ``top_n`` heaviest keys with their absolute
    count, share of all rows, and ratio to the mean per-key load — the
    numbers that decide whether a join/agg on this key needs salting, AQE
    skew handling, or nothing.

    Output [*key_cols, n, share, skew_ratio, rk]:
    - share      = n / total_rows
    - skew_ratio = n * n_keys / total_rows  (1.0 = perfectly uniform)

    Plan: one map-combined count per key, a 1-row global rollup of
    (total, n_keys) derived from the SAME aggregate subtree (exchange
    reused, the fact table is scanned once), broadcast back, then a
    top-n over the per-key counts. The top-n is orderBy().limit() —
    TakeOrderedAndProject, a per-partition heap merge — NOT a global
    row_number window, which would funnel every distinct key through a
    single task's sort (the exact bottleneck this operator exists to
    diagnose on high-cardinality keys). Ranks are then assigned by a
    window over only the ``top_n`` surviving rows. All ratios are
    exact-int/exact-int double divisions.
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    totals = per_key.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    order = [F.desc("n"), *[F.asc(k) for k in key_cols]]
    top = per_key.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .select(
            *key_cols,
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
            (
                (F.col("n") * F.col("_n_keys")).cast("double")
                / F.col("_total").cast("double")
            ).alias("skew_ratio"),
            "rk",
        )
    )
