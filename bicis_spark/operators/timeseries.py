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


def cusum_flags(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    threshold_per_point: int = 20,
    slack_per_point: int = 0,
) -> DataFrame:
    """One-sided CUSUM change-point monitor per group, in EXACT integer
    arithmetic: with per-group n points and integer total S = Σx, the
    classic recursion s_t = max(0, s_{t-1} + (x_t − mean − slack)) is run
    scaled by n —

        s'_t = max(0, s'_{t-1} + n·x_t − S − n·slack)

    so the group mean never becomes a float. A point is flagged when the
    accumulated drift exceeds ``threshold_per_point`` units of the
    measured value, i.e. s'_t > n·threshold. Deterministic under any
    partitioning: every quantity is a BIGINT.

    Output: [group, ts, value, cusum_scaled, n_points, flag]. The
    sequential fold runs per group over the collected ordered series —
    bounded model state (one row per group × points-per-group, the same
    envelope as the Holt/Holt-Winters folds); upstream aggregation to
    the (group, ts) grain is the caller's normal map-side-combined
    groupBy, so the corpus never funnels through a single task."""
    g = df.select(
        F.col(group_col).alias("_g"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("long").alias("_x"),
    )
    series = g.groupBy("_g").agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_x"))).alias("_a"),
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_x").cast("long").alias("_s"),
    )
    drift = lambda s: s["_x"] * F.col("_n") - F.col("_s") - F.col("_n") * F.lit(slack_per_point)  # noqa: E731
    stepped = series.select(
        "_g",
        "_n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_a")),
                lambda j: F.struct(
                    F.element_at(F.col("_a"), j)["_ts"].alias("ts"),
                    F.element_at(F.col("_a"), j)["_x"].alias("value"),
                    F.aggregate(
                        F.slice(F.col("_a"), F.lit(1), j),
                        F.lit(0).cast("long"),
                        lambda acc, s: F.greatest(
                            F.lit(0).cast("long"), acc + drift(s)
                        ),
                    ).alias("cusum_scaled"),
                ),
            )
        ).alias("_e"),
    )
    return stepped.select(
        F.col("_g").alias(group_col),
        F.col("_e.ts").alias(ts_col),
        F.col("_e.value").alias(value_col),
        F.col("_e.cusum_scaled").alias("cusum_scaled"),
        F.col("_n").alias("n_points"),
        (F.col("_e.cusum_scaled") > F.col("_n") * F.lit(threshold_per_point)).alias(
            "flag"
        ),
    )


def seasonal_decompose_additive(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    period_extract: str = "hour",
    ma_radius: int = 12,
) -> DataFrame:
    """Additive seasonal-means decomposition of a per-group series:

        trend_t    = mean(x) over the centered ±``ma_radius`` ROWS window
        seasonal_t = mean(x | same period slot) − grand mean
        residual_t = (x − trend) − seasonal

    Every mean is an exact-integer ratio (window/slot/grand sums and
    counts are BIGINT) turned into ONE IEEE division, and the residual's
    operation tree is fixed left-associative — the oracle replays the
    identical expressions, so all three doubles hash bitwise. The ROWS
    window (not RANGE) makes gap handling explicit: missing slots simply
    don't widen the trend window (run ``hourly_grid`` + gap fill first
    for a calendar-dense trend).

    Shuffles: one per-group window + two small aggregates joined back
    broadcast — the slot and grand tables are |groups|×|slots| rows."""
    g = df.select(
        F.col(group_col).alias("_g"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("long").alias("_x"),
    )
    wtr = (
        Window.partitionBy("_g")
        .orderBy("_ts")
        .rowsBetween(-ma_radius, ma_radius)
    )
    slot = F.date_part(F.lit(period_extract), F.col("_ts")).cast("long")
    base = g.withColumn("_slot", slot).withColumn(
        "_trend",
        F.sum("_x").over(wtr).cast("double") / F.count("_x").over(wtr).cast("double"),
    )
    slots = base.groupBy("_g", "_slot").agg(
        F.sum("_x").cast("long").alias("_sn"),
        F.count(F.lit(1)).cast("long").alias("_sd"),
    )
    grand = base.groupBy("_g").agg(
        F.sum("_x").cast("long").alias("_gn"),
        F.count(F.lit(1)).cast("long").alias("_gd"),
    )
    out = (
        base.join(F.broadcast(slots), ["_g", "_slot"])
        .join(F.broadcast(grand), "_g")
        .withColumn(
            "_seasonal",
            F.col("_sn").cast("double") / F.col("_sd").cast("double")
            - F.col("_gn").cast("double") / F.col("_gd").cast("double"),
        )
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_ts").alias(ts_col),
        F.col("_x").alias(value_col),
        F.col("_trend").alias("trend"),
        F.col("_seasonal").alias("seasonal"),
        ((F.col("_x").cast("double") - F.col("_trend")) - F.col("_seasonal")).alias(
            "residual"
        ),
    )
