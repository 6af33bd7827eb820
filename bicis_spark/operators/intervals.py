"""Interval-overlap join: all (left, right) pairs whose [start, end]
intervals intersect — the generalization of the reference's point-in-range
checks (bicis/etl/unify_data.py duration-window filters) to two interval
sets.

Spark has no native interval join; a naive theta-join (l.start <= r.end AND
r.start <= l.end) plans as BroadcastNestedLoopJoin — O(|L|·|R|) and a
scale killer. This operator uses the standard bucketed decomposition:

- each interval explodes to the epoch-time buckets it spans (``sequence``
  over bucket ids, executor-side);
- candidates come from an EQUI-join on bucket id — shuffle keyed by
  bucket, so work distributes by time range and AQE can split hot buckets;
- the true-overlap predicate filters candidates post-join;
- duplicate pairs (intervals sharing several buckets) are eliminated
  WITHOUT a distinct: a pair is emitted only by the single bucket that
  owns ``max(l.start, r.start)`` — every overlapping pair has exactly one
  owning bucket, so no second shuffle is needed.

Bucket width tunes the fan-out/selectivity trade: width ~ median interval
length keeps replication O(1) per row while buckets stay selective.

Long intervals replicate to many buckets; for heavy-tailed lengths the
production split is a two-pass plan (short intervals bucketed, the few
long ones broadcast) — same candidate semantics, documented here because
the test data's bounded intervals don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, start: str, end: str, width_s: int) -> DataFrame:
    b0 = F.floor(F.unix_timestamp(F.col(start)) / width_s).cast("long")
    b1 = F.floor(F.unix_timestamp(F.col(end)) / width_s).cast("long")
    return df.withColumn(
        "_bucket", F.explode(F.sequence(b0, b1))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    width_s: int = 3600,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """All pairs with l.start <= r.end AND r.start <= l.end (closed
    intervals), joined via bucket equi-join + ownership dedup. Column
    names must be disjoint between the two sides (alias beforehand);
    ``extra_on`` adds equality keys (e.g. a shared user id) to the
    bucket join."""
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols - set(extra_on or []):
        raise ValueError(
            f"ambiguous columns {sorted(overlap_cols)}: alias the sides first"
        )
    lb = _bucketed(left, l_start, l_end, width_s)
    rb = _bucketed(right, r_start, r_end, width_s)
    on = ["_bucket"] + list(extra_on or [])
    joined = lb.join(rb, on=on, how="inner")
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    owner = F.floor(
        F.unix_timestamp(F.greatest(F.col(l_start), F.col(r_start))) / width_s
    ).cast("long")
    return joined.where(overlap & (F.col("_bucket") == owner)).drop("_bucket")


def interval_union_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping [start, end) intervals per key and report
    [key, n_intervals, coverage_us] — union length in microseconds. The
    uptime / session-coverage / time-range-dedup operator.

    The classic sweep, expressed relationally: within each key order by
    (start, end); an interval OPENS a new merged group iff its start
    exceeds the running max of every earlier end (a 1-PRECEDING window
    max); group ids are the running sum of those open flags; each merged
    group then reduces to (min start, max end). Touching intervals
    (start == previous max end) merge, per half-open semantics.

    Everything is integer microseconds (unix_micros), so results are
    bitwise deterministic; tied (start, end) duplicates are symmetric
    under any tie order. Scale: all three windows and the final
    aggregate share ONE hash partitioning on the key — a single
    exchange, then per-key sorts bounded by that key's interval count.
    """
    iv = df.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(start_col)).alias("s"),
        F.unix_micros(F.col(end_col)).alias("e"),
    ).where(F.col("k").isNotNull() & F.col("s").isNotNull() & F.col("e").isNotNull())
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    opens = iv.withColumn("_pm", F.max("e").over(w_prev)).withColumn(
        "_open",
        F.when(F.col("_pm").isNull() | (F.col("s") > F.col("_pm")), 1).otherwise(0),
    )
    grouped = opens.withColumn("_grp", F.sum("_open").over(w_run))
    merged = grouped.groupBy("k", "_grp").agg(
        F.min("s").alias("_ms"), F.max("e").alias("_me")
    )
    return merged.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("_me") - F.col("_ms")).cast("long").alias("coverage_us"),
    )
