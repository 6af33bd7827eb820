"""Grouped top-k via two-phase hash aggregation — the window-free plan.

The standard top-k-per-group plan (``row_number() OVER (PARTITION BY g
ORDER BY v DESC) <= k``, see ``plans/core_queries.py:topk_orders_per_
customer``) shuffles EVERY row of a group to one task and sorts it.
That is exact but skew-fragile: a hot group at 100 TB puts its entire
row set through a single task's sort buffer.

This module implements the same logical operator as a two-phase hash
aggregation, the shape Spark gives map-side partial combine:

1. salt each row by a hash of its tie-break column (bounded fan-out S);
2. ``groupBy(g, salt)`` → ``slice(array_sort(collect_list(struct)), 1, k)``
   — each salted group holds ≤ |group|/S rows, and the aggregate output
   is capped at k structs per salted group;
3. explode the per-salt winners (≤ S·k rows per group — tiny), then a
   second ``groupBy(g)`` + sort + slice picks the global top k.

Both shuffles move at most S·k structs per group regardless of group
size, so the plan is skew-bounded by construction. Ordering is made
deterministic by embedding the full (order, tie-break) key inside the
sorted struct — ``array_sort`` orders structs field-by-field, so ties
resolve identically everywhere.

Reference parity: the reference's per-station "latest N" pandas slices
(bicis/etl/basic_features.py sort_values().head()) are the k=N case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Salt fan-out. 32 matches the test parallelism; at cluster scale set to
#: ~2× executor-core count so a hot group spreads over the whole stage.
DEFAULT_SALTS = 32


def _sort_key(order_col: str, descending: bool) -> tuple[Column, Column]:
    """(null_flag, order) pair for the sort struct. array_sort puts a
    NULL struct field FIRST (measured), but window parity demands ASC →
    NULLS FIRST, DESC → NULLS LAST — without the explicit flag a single
    NULL order value would take rank 1 under descending and silently
    displace a real top-k row (row_number ... DESC ranks it last)."""
    c = F.col(order_col)
    if not descending:
        flag = F.when(c.isNull(), F.lit(0)).otherwise(F.lit(1))
        return flag, c
    # array_sort only sorts ascending; negate numerics to flip. Works for
    # integral/floating order columns (the operator's contract).
    flag = F.when(c.isNull(), F.lit(1)).otherwise(F.lit(0))
    return flag, -c


def topk_by_group_agg(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
    payload_cols: list[str],
    descending: bool = True,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Exact top-``k`` rows per group, hash-aggregation plan.

    Returns one row per kept input row with ``group_cols``, ``rank_in_group``
    (1-based, dense by (order, tiebreak)), ``order_col`` and
    ``payload_cols``. Requires a numeric ``order_col`` and a unique
    ``tiebreak_col`` within each group (rank ties broken ascending on it).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if descending:
        # Descending is implemented as unary negation; a non-numeric order
        # column would be implicitly cast to double (NULL sort keys →
        # silently arbitrary top-k) with ANSI off, so enforce the numeric
        # contract up front.
        from pyspark.sql.types import NumericType

        dt = df.schema[order_col].dataType
        if not isinstance(dt, NumericType):
            raise TypeError(
                f"topk_by_group_agg(descending=True) requires a numeric "
                f"order column; {order_col!r} is {dt.simpleString()}"
            )
    null_flag, order_key = _sort_key(order_col, descending)
    key = F.struct(
        null_flag.alias("_nf"),
        order_key.alias("_o"),
        F.col(tiebreak_col).alias("_t"),
    )
    packed = F.struct(
        key.alias("_k"),
        F.struct(
            F.col(order_col).alias(order_col),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_p"),
    )
    salted = df.select(
        *group_cols,
        packed.alias("_row"),
        F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(n_salts)).alias("_salt"),
    )
    # Phase 1: per-(group, salt) top-k. collect_list's partial aggregation
    # is bounded by the salted-group size; slice caps the merged output.
    per_salt = salted.groupBy(*group_cols, "_salt").agg(
        F.slice(F.array_sort(F.collect_list("_row")), 1, k).alias("_top")
    )
    # Phase 2: ≤ n_salts·k candidate structs per group.
    winners = (
        per_salt.select(*group_cols, F.explode("_top").alias("_row"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("_row")), 1, k).alias("_top"))
        .select(*group_cols, F.posexplode("_top").alias("_pos", "_row"))
    )
    return winners.select(
        *group_cols,
        (F.col("_pos") + 1).cast("long").alias("rank_in_group"),
        F.col(f"_row._p.{order_col}").alias(order_col),
        *[F.col(f"_row._p.{c}").alias(c) for c in payload_cols],
    )
