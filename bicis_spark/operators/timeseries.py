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


def activity_streaks(
    df: DataFrame,
    group_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-group longest consecutive-calendar-day activity streak — the
    classical gaps-and-islands analysis (engagement streaks, sensor
    uptime runs). Reference analog: the notebook-side per-station daily
    activity inspection (bicis/etl/basic_features.py groups by day);
    this is the distributed generalization.

    Island construction is the standard rank trick: over each group's
    DISTINCT active days ordered ascending, ``day − row_number()`` is
    constant exactly within a run of consecutive days, so grouping by
    that anchor date yields one row per streak. All arithmetic is
    date/int exact; tie-breaks are total (longest streak, then earliest
    start), so the result is deterministic and hash-replayable.

    Scale: the distinct collapses (group, day) map-side before any
    shuffle; the window partitions by group over AT MOST one row per
    calendar day per group — bounded by the time range (a 10-year
    feed is ≤3.7k rows per group regardless of event volume), so no
    hot-key problem survives the distinct. Two hash aggregates after
    that, both on streak-sized frames."""
    days = (
        df.select(
            F.col(group_col).alias("_g"),
            F.to_date(F.col(ts_col)).alias("_d"),
        )
        .where(F.col("_d").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("_g").orderBy("_d")
    anchored = days.withColumn(
        "_anchor", F.date_sub(F.col("_d"), F.row_number().over(w))
    )
    streaks = anchored.groupBy("_g", "_anchor").agg(
        F.count(F.lit(1)).cast("long").alias("_len"),
        F.min("_d").alias("_start"),
        F.max("_d").alias("_end"),
    )
    pick = Window.partitionBy("_g").orderBy(
        F.col("_len").desc(), F.col("_start").asc()
    )
    ranked = streaks.select(
        "_g",
        "_len",
        "_start",
        "_end",
        F.row_number().over(pick).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy("_g")).alias("_n_streaks"),
        F.sum("_len").over(Window.partitionBy("_g")).alias("_active"),
    )
    return ranked.where(F.col("_rk") == 1).select(
        F.col("_g").alias(group_col),
        F.col("_active").cast("long").alias("active_days"),
        F.col("_n_streaks").cast("long").alias("n_streaks"),
        F.col("_len").alias("longest_streak"),
        F.col("_start").alias("longest_start"),
        F.col("_end").alias("longest_end"),
    )


def autocorrelation(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_lag: int = 24,
) -> DataFrame:
    """Sample autocorrelation of an integer-valued series at lags
    1..``max_lag`` — the Box-Jenkins identification diagnostic that
    decides AR/MA orders before a forecast fit (the model-selection
    step ahead of the Holt/Holt-Winters operators in this module).

    ``series`` must be one row per integer time key ``time_col`` (e.g.
    epoch-hours) with an integer ``value_col`` (e.g. event counts).
    Pairing is a self-equi-join on ``t = t' + lag`` after an
    explode(sequence(1, max_lag)) fan-out — NOT a single-partition
    global window, so the plan distributes even though the series is
    dimension-sized, and NOT a cross join, so no nested-loop appears.
    Per lag the operator emits exact BIGINT sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy² over the paired rows) and the Pearson r
    computed as one fixed float tree over int64→double casts — every
    operand correctly rounded, so the double hashes bitwise. Gaps in the
    series simply drop pairs (both engines agree by construction).

    Scale: the series is a pre-aggregated dimension (hours of history —
    ~88k rows for a decade), so the lag cross is max_lag×|series| and
    the join is hash-partitioned on the shifted key; the fact table was
    already collapsed by the caller's aggregate. Nothing here scales
    with raw event volume."""
    x = series.select(
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
    )
    # lag fan-out as a GENERATOR, not a cross join — explode(sequence)
    # keeps the plan join-free until the single hash join on the shifted
    # key (a crossJoin with a 24-row dimension would plan as a BNLJ)
    y = x.select(
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.lit(max_lag).cast("long"))
        ).alias("lag"),
        F.col("_t").alias("_ty"),
        F.col("_x").alias("_y"),
    ).select("lag", (F.col("_ty") + F.col("lag")).alias("_t"), "_y")
    pairs = x.join(y, "_t")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_x").cast("long").alias("sx"),
        F.sum("_y").cast("long").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("sx2"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("sy2"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2, sy2 = F.col("sx2").cast("double"), F.col("sy2").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    return s.select(
        "lag",
        "n_pairs",
        "sx",
        "sy",
        "sxy",
        "sx2",
        "sy2",
        # NULL where either side has no variance (ANSI mode: 0/0 throws)
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)).alias("acf"),
    )


def interpolate_series_at(
    targets: DataFrame,
    series: DataFrame,
    target_ts: str,
    target_id: str,
    series_ts: str,
    series_val: str,
    step: str = "hour",
) -> DataFrame:
    """Linear-interpolation join: for each target timestamp, the series
    value linearly interpolated between the surrounding series points —
    the sensor-fusion / curve-lookup primitive (mark a trade against an
    interpolated reference curve; score an incident against the ambient
    traffic rate). ``series`` must be keyed on ``step``-truncated
    timestamps (one row per populated step), as produced by a
    group-by-date_trunc aggregate.

    Exact-hit semantics: a target sitting exactly on a populated series
    point takes that point's value (t0 = t1); otherwise
    ``x0 + (x1 − x0)·(t − t0)/(t1 − t0)`` over microsecond deltas, NULL
    when either neighbor is missing. Neighbors are INDEPENDENT
    two-direction lookups (t0 = latest point ≤ t, t1 = earliest point
    ≥ t): an out-of-span target still reports its one-sided neighbor
    (a before-span target gets t1 = the first series point; an
    after-span target gets t0 = the last point) with interp_value NULL. Every operand is exact
    (BIGINT micros, BIGINT values); the one float tree is fixed and
    mirrored by the oracle, which replays the semantics through DuckDB's
    native ASOF JOIN in both directions — an independent implementation
    of the same definition.

    Scale: the series is dimension-bounded (populated steps), so the
    dense step GRID built over its span (sequence + explode) is too;
    ffill/bfill ride one global window over that bounded grid — never
    over targets — and the fact-sized target table joins the grid on
    step-truncated equality: one broadcast-able hash join, no range
    join, no per-target search."""
    s = series.select(
        F.col(series_ts).alias("_h"), F.col(series_val).cast("long").alias("_x")
    )
    bounds = s.agg(
        F.min("_h").alias("lo"),
        F.max("_h").alias("hi"),
        F.min_by("_x", "_h").alias("lo_x"),
        F.max_by("_x", "_h").alias("hi_x"),
    ).first()
    if bounds["lo"] is None:
        return targets.select(
            F.col(target_id),
            F.col(target_ts).alias("t"),
            F.lit(None).cast("timestamp").alias("t0"),
            F.lit(None).cast("long").alias("x0"),
            F.lit(None).cast("timestamp").alias("t1"),
            F.lit(None).cast("long").alias("x1"),
            F.lit(None).cast("double").alias("interp_value"),
        )
    spark = targets.sparkSession
    grid = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(bounds["lo"]).cast("timestamp"),
                F.lit(bounds["hi"]).cast("timestamp"),
                F.expr(f"INTERVAL 1 {step}"),
            )
        ).alias("_h")
    )
    w_ff = Window.orderBy("_h").rowsBetween(Window.unboundedPreceding, 0)
    w_bf = Window.orderBy("_h").rowsBetween(1, Window.unboundedFollowing)
    g = (
        grid.join(s, "_h", "left")
        .select(
            "_h",
            F.when(F.col("_x").isNotNull(), F.col("_h")).alias("_pt_raw"),
            "_x",
        )
        .select(
            "_h",
            F.last("_pt_raw", ignorenulls=True).over(w_ff).alias("_pt"),
            F.last("_x", ignorenulls=True).over(w_ff).alias("_px"),
            F.first("_pt_raw", ignorenulls=True).over(w_bf).alias("_nt"),
            F.first("_x", ignorenulls=True).over(w_bf).alias("_nx"),
        )
    )
    t = F.col(target_ts)
    tgt = targets.select(
        F.col(target_id), t.alias("t"), F.date_trunc(step, t).alias("_h")
    )
    j = tgt.join(F.broadcast(g), "_h", "left")
    exact = F.col("_pt") == F.col("t")
    # Out-of-span targets miss the grid left-join; emit the ONE-SIDED
    # neighbor there (first series point for a before-span target, last
    # point for after-span) so t0/t1 are the independent
    # latest-point-<=-t / earliest-point->=-t of the oracle's
    # two-direction ASOF — not NULL-both-sides (ADVICE r6: the gated
    # query's hash was data-dependent on targets staying in-span).
    # interp_value stays NULL for them: one neighbor is still missing.
    lo_ts = F.lit(bounds["lo"]).cast("timestamp")
    hi_ts = F.lit(bounds["hi"]).cast("timestamp")
    before = F.col("_h") < lo_ts
    after = F.col("_h") > hi_ts
    t0 = F.when(after, hi_ts).otherwise(F.col("_pt"))
    x0 = F.when(after, F.lit(bounds["hi_x"]).cast("long")).otherwise(
        F.col("_px")
    )
    t1 = F.when(before, lo_ts).otherwise(
        F.when(exact, F.col("_pt")).otherwise(F.col("_nt"))
    )
    x1 = F.when(before, F.lit(bounds["lo_x"]).cast("long")).otherwise(
        F.when(exact, F.col("_px")).otherwise(F.col("_nx"))
    )
    num = (F.unix_micros(F.col("t")) - F.unix_micros(t0)).cast("double")
    den = (F.unix_micros(t1) - F.unix_micros(t0)).cast("double")
    interp = F.when(
        t0.isNotNull() & t1.isNotNull(),
        F.when(t1 == t0, x0.cast("double")).otherwise(
            x0.cast("double")
            + (x1.cast("double") - x0.cast("double")) * (num / den)
        ),
    )
    return j.select(
        target_id,
        "t",
        t0.alias("t0"),
        x0.cast("long").alias("x0"),
        t1.alias("t1"),
        x1.cast("long").alias("x1"),
        interp.alias("interp_value"),
    )


def cross_correlation(
    series_x: DataFrame,
    series_y: DataFrame,
    time_col: str,
    value_col: str,
    max_lag: int = 12,
) -> DataFrame:
    """Sample cross-correlation between two integer-valued series at lags
    −``max_lag``..+``max_lag``: pairs x_t with y_{t−lag}, so POSITIVE
    lags measure "y leads x by lag steps" — the lead-lag screen behind
    causal-direction hypotheses (do views lead purchases?). Lag 0 is the
    instantaneous correlation.

    Same contract and plan shape as ``autocorrelation``: both inputs are
    pre-aggregated dimension-sized series keyed on an integer time
    column; the lag fan-out is explode(sequence) on the y side (a
    generator, no cross join) and pairing is ONE hash join on the
    shifted key. Exact BIGINT sufficient statistics per lag; Pearson r
    is one fixed float tree, NULL where either side lacks variance."""
    x = series_x.select(
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
    )
    y = series_y.select(
        F.explode(
            F.sequence(
                F.lit(-max_lag).cast("long"), F.lit(max_lag).cast("long")
            )
        ).alias("lag"),
        F.col(time_col).cast("long").alias("_ty"),
        F.col(value_col).cast("long").alias("_y"),
    ).select("lag", (F.col("_ty") + F.col("lag")).alias("_t"), "_y")
    pairs = x.join(y, "_t")
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_x").cast("long").alias("sx"),
        F.sum("_y").cast("long").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("sx2"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("sy2"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2, sy2 = F.col("sx2").cast("double"), F.col("sy2").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sx2 - sx * sx
    vy = n * sy2 - sy * sy
    return s.select(
        "lag",
        "n_pairs",
        "sx",
        "sy",
        "sxy",
        "sx2",
        "sy2",
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)).alias("ccf"),
    )


def haar_energy(
    series: DataFrame,
    time_col: str,
    value_col: str,
    levels: int = 3,
) -> DataFrame:
    """Multi-resolution Haar wavelet energy decomposition of an
    integer-valued series: at each level, adjacent pairs collapse to an
    (unnormalized) approximation a = x₀+x₁ and detail d = x₀−x₁; the
    per-level detail energy Σd² localizes WHERE the series' variance
    lives on the time axis (level 1 ≈ hour-to-hour jitter, level 3 ≈
     8-step regimes) — the classical signal-processing complement to the
    frequency-blind moment stats. Incomplete tail pairs are dropped at
    each level (standard dyadic truncation, deterministic).

    All quantities are exact BIGINTs (unnormalized Haar keeps integers
    closed under the transform; the usual 1/√2 factor would leave the
    ring and is irrelevant for energy RATIOS between levels). Each
    level is ONE hash aggregate keyed on pair index; positions come
    from a row_number over the series order — a global window, but over
    the dimension-bounded series (hours of history), never the fact
    table, the same envelope as the ACF/changepoint screens."""
    w = Window.orderBy(time_col)
    cur = series.select(
        (F.row_number().over(w) - 1).cast("long").alias("i"),
        F.col(value_col).cast("long").alias("v"),
    )
    outs = []
    for lvl in range(1, levels + 1):
        pairs = cur.groupBy(F.expr("i div 2").alias("j")).agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("v").cast("long").alias("a"),
            F.sum(
                F.when(F.col("i") % 2 == 0, F.col("v")).otherwise(-F.col("v"))
            )
            .cast("long")
            .alias("d"),
        )
        full = pairs.where(F.col("c") == 2)
        outs.append(
            full.agg(
                F.lit(lvl).cast("long").alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(F.col("d") * F.col("d")).cast("long").alias(
                    "energy_detail"
                ),
                F.sum(F.col("a") * F.col("a")).cast("long").alias(
                    "energy_approx"
                ),
            )
        )
        cur = full.select(F.col("j").alias("i"), F.col("a").alias("v"))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
