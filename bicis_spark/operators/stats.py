"""Table profiling: per-column statistics in ONE aggregation pass — the
engine's ANALYZE/data-quality surface (null rates, cardinalities, ranges).

Plan shape: a single grand aggregate computes every column's stats
simultaneously (one scan, one 1-row result), then a ``stack`` pivots the
wide row to one output row per column — no per-column scans, no joins.

Scale note: exact ``countDistinct`` over k columns plans as an Expand
(k× the scan's rows into the partial aggregate). That is the right
trade at oracle scales and for narrow tables; for 100 TB profiling runs
pass ``exact_distinct=False`` to use ``approx_count_distinct`` (HLL,
no Expand, one pass, ±2.3% default error) — the standard engine split
between ANALYZE (approx) and audit (exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INTEGRAL = {"bigint", "int", "smallint", "tinyint", "long", "integer"}


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """[col_name, n_rows, n_nulls, n_distinct, min_num, max_num]: one row
    per profiled column. ``min_num``/``max_num`` are populated for
    integral columns only (cross-type min/max would need lossy string
    casts whose formatting is engine-specific)."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nn_{c}")
        )
        nd = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs.append(nd.cast("long").alias(f"_nd_{c}"))
        if dtypes.get(c) in _INTEGRAL:
            aggs.append(F.min(F.col(c)).cast("long").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("long").alias(f"_mx_{c}"))
    wide = df.agg(*aggs)
    parts = []
    for c in cols:
        mn = f"_mn_{c}" if dtypes.get(c) in _INTEGRAL else "CAST(NULL AS BIGINT)"
        mx = f"_mx_{c}" if dtypes.get(c) in _INTEGRAL else "CAST(NULL AS BIGINT)"
        parts.append(f"'{c}', _n, _nn_{c}, _nd_{c}, {mn}, {mx}")
    stack = (
        f"stack({len(cols)}, " + ", ".join(parts)
        + ") AS (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
    )
    return wide.selectExpr(stack)
