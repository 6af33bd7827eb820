"""Slowly-changing-dimension (Type 2) build: collapse a keyed change
stream into versioned dimension rows [key, attr, valid_from, valid_to,
version, is_current].

The reference keeps only current-state feature frames (pandas overwrite
per run); SCD2 is the warehouse-standard way to keep the full history
queryable with an as-of join (see operators/asof.py for the lookup side).

Plan shape (scales to 100 TB): two windows over the SAME (key) partition
ordering — change detection via lag(), interval close via lead() — so the
fact stream shuffles ONCE on the dimension key and both windows run in
that single exchange. Determinism: the window order includes a unique
tiebreaker column, so equal-timestamp updates resolve identically
everywhere (the repo's ntile/row_number total-order rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build the Type-2 history of ``attr_col`` per ``key_col``.

    A new version opens at the first row whose attribute differs from the
    previous row's (per key, ordered by (ts, tiebreak)); it closes at the
    next version's valid_from (NULL valid_to = still current).

    Change detection is NULL-safe: the comparison is eqNullSafe, and the
    first row is detected by row_number rather than ``lag IS NULL`` — a
    plain ``attr != prev`` evaluates to NULL (not TRUE) on a transition
    TO a NULL attribute, silently dropping the NULL-valued version and
    then opening a spurious duplicate at the next non-null row.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .where(
            (F.col("_rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key_col,
            attr_col,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            "version",
            "is_current",
        )
    )
