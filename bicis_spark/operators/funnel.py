"""Ordered-funnel analysis: how many users complete step 1 → 2 → … → k in
timestamp order.

The reference computes per-station conversion-style aggregates by chained
pandas filters (bicis/etl/basic_features.py operates one step at a time on
the trips frame); this operator generalizes that to an arbitrary ordered
event funnel, Spark-first.

Plan shape (scales to 100 TB):
- one filtered scan per step, aggregated to (user, first_ts) — each scan is
  predicate-pushed to parquet and reduces to at most one row per user
  before anything shuffles;
- steps chain by an equi-join on the user key (same key every time, so a
  single shuffle partitioning is reused across stages under AQE) with a
  strictly-after timestamp filter applied post-join;
- output is one row per step (k rows) — a full-table funnel costs k
  column-pruned scans + k user-keyed shuffles, never a collect.

The strictly-increasing-timestamp semantics ("the click must happen after
the user's first view, the purchase after that click") matches the classic
ordered-funnel definition; ties on the boundary are excluded on both
engines identically because the comparison is on exact microsecond values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_step_times(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, Column]],
) -> DataFrame:
    """One row per user who completed at least step 1, with columns
    ``t_<name>`` = timestamp of the user's first qualifying event for each
    step (NULL once the funnel is abandoned).

    Step i+1 counts only events strictly after the user's step-i time.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")

    name0, pred0 = steps[0]
    cur = (
        events.where(pred0)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{name0}"))
    )
    prev_t = f"t_{name0}"
    for name, pred in steps[1:]:
        nxt = (
            events.where(pred)
            .select(user_col, F.col(ts_col).alias("_step_ts"))
            .join(cur, on=user_col, how="inner")
            .where(F.col("_step_ts") > F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min("_step_ts").alias(f"t_{name}"))
        )
        # users who stopped at the previous step keep their partial row
        cur = cur.join(nxt, on=user_col, how="left")
        prev_t = f"t_{name}"
    return cur


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    cohort_pred: Column,
    bucket: str = "week",
) -> DataFrame:
    """Classic cohort-retention matrix: users bucketed by the period of
    their first qualifying event, then counted as retained in each later
    period they were active (any event).

    Plan shape (scales to 100 TB):
    - the cohort table reduces to one row per user (min-ts hash agg,
      map-side combined) before any join;
    - activity reduces to DISTINCT (user, period) FIRST — the 100 TB event
      stream shrinks to |users| × |periods| rows before the cohort join,
      and both that distinct and the join shuffle on the same user key;
    - the output is |cohorts| × |offsets| rows — tiny.

    ``period_offset`` counts whole buckets between the two ``date_trunc``
    starts, derived FROM the bucket: day/week offsets are exact datediff
    divisions, month/quarter/year use months_between (integral for
    truncated inputs) — a fixed 7-day divisor would produce irregular,
    gapping offsets for calendar buckets of varying length.
    """
    day_divisors = {"day": 1, "week": 7}
    month_divisors = {"month": 1, "quarter": 3, "year": 12}
    if bucket not in day_divisors and bucket not in month_divisors:
        raise ValueError(
            f"unsupported cohort bucket {bucket!r}; expected one of "
            f"{sorted(day_divisors | month_divisors)}"
        )
    first = (
        events.where(cohort_pred)
        .groupBy(user_col)
        .agg(F.date_trunc(bucket, F.min(ts_col)).alias("cohort_bucket"))
    )
    activity = events.select(
        user_col, F.date_trunc(bucket, F.col(ts_col)).alias("act_bucket")
    ).distinct()
    joined = activity.join(first, on=user_col, how="inner").where(
        F.col("act_bucket") >= F.col("cohort_bucket")
    )
    if bucket in day_divisors:
        offset = (
            F.datediff("act_bucket", "cohort_bucket") / day_divisors[bucket]
        ).cast("long")
    else:
        offset = (
            F.months_between("act_bucket", "cohort_bucket")
            / month_divisors[bucket]
        ).cast("long")
    per_cell = (
        joined.select("cohort_bucket", offset.alias("period_offset"), user_col)
        .groupBy("cohort_bucket", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first.groupBy("cohort_bucket").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return per_cell.join(sizes, on="cohort_bucket").select(
        "cohort_bucket",
        "period_offset",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_cohort").cast("long").alias("n_cohort"),
        (F.col("n_active").cast("double") / F.col("n_cohort"))
        .alias("retention"),
    )


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, Column]],
) -> DataFrame:
    """(step, step_name, n_users, conv_from_first) — k rows, counts
    monotonically non-increasing down the funnel."""
    times = funnel_step_times(events, user_col, ts_col, steps)
    counts = times.agg(
        *[
            F.count(f"t_{name}").cast("long").alias(f"n_{name}")
            for name, _ in steps
        ]
    )
    # unpivot the single counts row into (step, step_name, n_users)
    pairs = []
    for i, (name, _) in enumerate(steps, start=1):
        pairs.append(
            F.struct(
                F.lit(i).cast("long").alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"n_{name}").alias("n_users"),
            )
        )
    exploded = counts.select(
        F.explode(F.array(*pairs)).alias("s")
    ).select("s.step", "s.step_name", "s.n_users")
    first_name = steps[0][0]
    base = counts.select(F.col(f"n_{first_name}").alias("_base"))
    return (
        exploded.crossJoin(F.broadcast(base))
        .select(
            "step",
            "step_name",
            "n_users",
            # nullif guards the empty funnel: with zero step-1 completions
            # a bare division is an ANSI divide-by-zero JOB ABORT, not a
            # bad value — conversion off an empty base is NULL (undefined)
            (
                F.col("n_users").cast("double")
                / F.nullif(F.col("_base"), F.lit(0))
            ).alias("conv_from_first"),
        )
    )
