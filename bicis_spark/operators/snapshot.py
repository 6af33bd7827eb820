"""Snapshot diff: reconcile two versions of a keyed table into
added / removed / changed rows — the validation primitive behind CDC
audits, backfill verification, and migration sign-off (the reference
re-runs its pipeline and eyeballs pandas frames; at 100 TB the diff has
to BE a query).

Plan shape:
- both snapshots project to key + compared columns (column-pruned scans);
- one full-outer join on the key — the only shuffle, and it moves only
  the compared columns;
- status derives from null-sides and null-safe (<=>) column comparison;
  unchanged rows (the overwhelming majority of a real diff) are filtered
  out BEFORE anything downstream sees them.

For very wide payloads, pre-hash the compared columns to a 128-bit
fingerprint (two seeded xxhash64s, exactly as extensions/dedup.py
exact_dedup keys do) so the full-outer shuffle carries 16 bytes per row
instead of the payload; the declared query compares columns directly
because its payload is already narrow.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., status) for every key whose row was added (only in
    ``new``), removed (only in ``old``), or changed (present in both,
    any compared column differing under null-safe equality). Unchanged
    keys are dropped."""
    compare = compare_cols or [
        c for c in new.columns if c not in key_cols
    ]
    o = old.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare],
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"_n_{c}") for c in compare]
    ).withColumn("_in_new", F.lit(True))
    # all column names are disjoint after the renames, so name-based
    # references stay unambiguous even when old/new share lineage
    # (diffing a table against a derived version of itself)
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_k_{c}").eqNullSafe(F.col(c)) for c in key_cols],
    )
    j = o.join(n, cond, "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in compare],
    )
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(differs, "changed")
    )
    keys = [
        F.coalesce(F.col(c), F.col(f"_k_{c}")).alias(c) for c in key_cols
    ]
    return (
        j.select(*keys, status.alias("status"))
        .where(F.col("status").isNotNull())
    )
