"""Declarative data-quality expectations (Deequ-style constraint checks).

The reference validates rows ad hoc while unifying source files (row-length
and parse guards in bicis/etl/unify_data.py) and counts failures into a
fails report; this operator turns that idea into a declared constraint
suite: each check yields (check, n_rows, n_violations, passed).

Plan shape (scales to 100 TB):
- all row-predicate checks over one table fold into a SINGLE conditional
  aggregation pass (count + sum(CASE) per check) — one column-pruned scan,
  map-side combined to one row, no matter how many checks;
- uniqueness rides the same pass as count(*) - count(DISTINCT key) (the
  distinct runs as a partial hash agg on the key column only);
- referential integrity is a LEFT ANTI join child-keys → parent-keys; the
  parent side reduces to distinct keys first and broadcasts when small;
- the result is one tiny row per check, unioned driver-side (plan union,
  not data movement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from bicis_spark.sources.io import local_frame
from pyspark.sql import functions as F


def _result_row(
    src: DataFrame, check: str, n_rows: Column, n_violations: Column
) -> DataFrame:
    return src.select(
        F.lit(check).alias("check"),
        n_rows.cast("long").alias("n_rows"),
        n_violations.cast("long").alias("n_violations"),
        (n_violations == 0).alias("passed"),
    )


def check_predicates(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """One row per named check; each value is a VIOLATION predicate
    (true ⇒ the row breaks the expectation). Single scan for all checks."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"_v_{i}")
            for i, pred in enumerate(checks.values())
        ],
    )
    rows = [
        _result_row(agg, name, F.col("_n"), F.coalesce(F.col(f"_v_{i}"), F.lit(0)))
        for i, name in enumerate(checks)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def check_unique(df: DataFrame, check: str, *key_cols: str) -> DataFrame:
    """n_violations = n_rows - n_distinct(key) (0 ⇔ key is unique)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("_d"),
    )
    return _result_row(agg, check, F.col("_n"), F.col("_n") - F.col("_d"))


def check_foreign_key(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    check: str,
) -> DataFrame:
    """Orphaned child rows: child keys with no matching parent key."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = child.select(child_key).join(
        parents, on=child_key, how="left_anti"
    )
    n_rows = child.agg(F.count(F.lit(1)).alias("_n"))
    n_bad = orphans.agg(F.count(F.lit(1)).alias("_v"))
    both = n_rows.crossJoin(F.broadcast(n_bad))  # two 1-row sides
    return _result_row(both, check, F.col("_n"), F.col("_v"))


def benford_digit_audit(
    df: DataFrame, value_col: str
) -> DataFrame:
    """Benford's-law first-digit audit — the classic fraud / synthetic-
    data screen (Nigrini 2012): naturally-occurring multiplicative
    quantities put digit d first with probability log10(1 + 1/d), and a
    fabricated or truncated column shows up as a deviating digit profile.

    First digit via ``floor`` + string head: floor(x) is EXACT on
    doubles and identical across engines, whereas CAST(DOUBLE AS BIGINT)
    rounds on some engines and truncates on others — the kind of
    off-by-one that corrupts digit counts silently. Audit domain is
    [1, 2^63) — enforced by filter, NULLs dropped: past int64 the cast
    would wrap (non-ANSI) or raise (ANSI), and a mantissa-based digit
    would need cross-libm pow(), which is not correctly-rounded and so
    not replayable. Money-scale columns sit comfortably inside.

    Output: 9 rows [digit, n_rows, obs_share, benford_share, abs_dev] —
    per-digit rows on purpose: no cross-digit float summation, so every
    double is a single division or subtraction and the oracle replay is
    bitwise. One column-pruned scan, map-side combined to ≤9 groups.
    """
    import math

    spark = df.sparkSession
    expected = [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]
    bt = local_frame(spark, expected, "digit long, benford_share double")
    digit = F.expr(
        f"CAST(substr(CAST(CAST(floor({value_col}) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
    )
    base = df.where(
        F.col(value_col).isNotNull()
        & (F.col(value_col) >= 1)
        & (F.col(value_col) < F.lit(float(2**63)))
    )
    counts = base.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    obs = F.col("n_rows").cast("double") / F.col("_tot").cast("double")
    return (
        bt.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.col("n_rows"), F.lit(0))
            .cast("double")
            .alias("_n"),
            "benford_share",
            "_tot",
        )
        .select(
            "digit",
            "n_rows",
            (F.col("_n") / F.col("_tot").cast("double")).alias("obs_share"),
            "benford_share",
            F.abs(
                F.col("_n") / F.col("_tot").cast("double")
                - F.col("benford_share")
            ).alias("abs_dev"),
        )
    )
