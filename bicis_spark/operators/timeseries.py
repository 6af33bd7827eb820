"""Time-series regularization: dense-grid gap filling and forward fill.

The reference's feature frames are dense per-(station, hour) pandas
matrices — missing hours appear as NaN rows that downstream code fillna(0)s
(bicis/etl/basic_features.py builds the profile matrix then reindexes).
This operator produces the same dense grid distributively.

Plan shape (scales to 100 TB):
- the observed series aggregates to one row per (key, bucket) FIRST
  (map-side combine), so the expensive input never carries through;
- the dense grid comes from per-key ``sequence()`` + ``explode`` — grid
  size is (span / step) rows per key, generated executor-side, never on
  the driver;
- forward fill is one window per key ordered by bucket:
  ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING —
  Spark's native ignore-nulls frame scan, no UDF, no self-join. Window
  state per key is bounded by the grid span, and keys partition the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_grid(
    observed: DataFrame,
    key_col: str,
    hour_col: str,
) -> DataFrame:
    """Dense (key, hour) grid spanning each key's [min, max] observed hour.

    ``observed`` must already be one row per (key, hour).
    """
    spans = observed.groupBy(key_col).agg(
        F.min(hour_col).alias("_h_min"), F.max(hour_col).alias("_h_max")
    )
    return spans.select(
        key_col,
        F.explode(
            F.sequence("_h_min", "_h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias(hour_col),
    )


def gap_fill_forward(
    observed: DataFrame,
    key_col: str,
    hour_col: str,
    zero_fill_cols: list[str],
    ffill_cols: list[str],
) -> DataFrame:
    """Left-join ``observed`` onto its dense hourly grid; zero-fill count
    columns, forward-fill the rest from the last observed hour per key."""
    grid = hourly_grid(observed, key_col, hour_col)
    joined = grid.join(observed, on=[key_col, hour_col], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(hour_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c in zero_fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    for c in ffill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
