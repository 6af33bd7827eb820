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
