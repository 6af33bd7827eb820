"""MERGE INTO semantics as a batch operator (upsert + delete in one pass).

Spark's DataFrame API has no MERGE (it belongs to table formats — Delta/
Iceberg implement it over their transaction logs). The relational core is
engine-expressible though, and that is what this operator provides:

    MERGE INTO target t USING source s ON <key>
      WHEN MATCHED AND <delete_cond> THEN DELETE
      WHEN MATCHED [AND <update_cond>] THEN UPDATE SET ...
      WHEN NOT MATCHED THEN INSERT ...

as ONE full-outer join + row-wise CASE routing — a single shuffle on the
merge key, no per-branch scans. At 100 TB this is the rewrite-side of a
copy-on-write merge: the output frame is the new table version (pair it
with ``write_sorted_parquet``/partition overwrite for the commit).

Contract: ``source`` must be unique on the key (the standard MERGE
precondition — duplicate source matches are rejected by MERGE engines);
enforce upstream with a latest-wins window (see upsert_latest_events)
when the source is a CDC stream.

Branch order follows SQL MERGE: delete wins over update for matched rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_set: dict[str, Column],
    delete_cond: Column | None = None,
    insert_values: dict[str, Column] | None = None,
    update_cond: Column | None = None,
) -> DataFrame:
    """Return the post-merge state of ``target``.

    ``update_set``/``insert_values`` map target column name → expression
    over the joined row (reference source columns as ``F.col("s.<name>")``
    and target columns as ``F.col("t.<name>")``). Omitting
    ``insert_values`` drops unmatched source rows (no INSERT branch);
    omitting ``delete_cond`` keeps all matched rows.
    """
    # Explicit presence markers, not key-null inference: a NULL in the first
    # key column must not make a real row vanish from both sides.
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in key_cols:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    t_present = F.coalesce(F.col("t._t_present"), F.lit(False))
    s_present = F.coalesce(F.col("s._s_present"), F.lit(False))
    matched = t_present & s_present

    # SQL MERGE fires a WHEN clause only when its condition is TRUE: a
    # NULL-valued condition must not fire the branch (coalesce, else
    # ``where(~NULL)`` silently drops the row).
    drop_row = (
        matched & F.coalesce(delete_cond, F.lit(False))
        if delete_cond is not None
        else F.lit(False)
    )
    do_update = matched & (
        F.coalesce(update_cond, F.lit(False)) if update_cond is not None else F.lit(True)
    )

    out_cols = []
    for f in target.schema.fields:
        name = f.name
        key_side = (
            F.coalesce(F.col(f"t.{name}"), F.col(f"s.{name}"))
            if name in key_cols and (insert_values is None or name not in insert_values)
            else None
        )
        updated = update_set.get(name, F.col(f"t.{name}"))
        inserted = (
            insert_values.get(name, F.lit(None).cast(f.dataType))
            if insert_values is not None
            else F.lit(None).cast(f.dataType)
        )
        expr = (
            F.when(do_update, updated)
            .when(t_present, F.col(f"t.{name}"))
            .otherwise(key_side if key_side is not None else inserted)
        )
        out_cols.append(expr.cast(f.dataType).alias(name))

    keep = ~drop_row & (t_present | (s_present & F.lit(insert_values is not None)))
    return joined.where(keep).select(*out_cols)


def incremental_agg_merge(base_agg, delta, key_cols, count_col="n", sum_col=None, sum_src=None):
    """Incremental materialized-aggregate maintenance: fold a DELTA batch
    into an existing keyed aggregate WITHOUT touching base rows outside
    the delta's keys.

    ``base_agg``: the maintained aggregate [key..., n(, sum)]; ``delta``:
    raw new rows. The delta is aggregated first (map-side combine — the
    only thing that scales: the base is |keys|-sized, the delta batch is
    small, the full fact history is never rescanned) and then outer-
    merged: n = n_base + n_delta, sum likewise. The maintenance LAW —
    merge(agg(base), delta) == agg(base ∪ delta) — is what the declared
    query's oracle checks (it recomputes the full aggregate).

    At 100 TB: this is the nightly-ingest shape. Keep the maintained
    aggregate bucketed on the keys so the merge join is co-located and
    exchange-free on the big side (sources/io.write_bucketed_table)."""
    aggs = [F.count(F.lit(1)).cast("long").alias(count_col)]
    if sum_col is not None:
        aggs.append(
            F.sum(F.col(sum_src or sum_col).cast("decimal(18,2)")).alias(sum_col)
        )
    d = delta.groupBy(*key_cols).agg(*aggs)
    cols = [count_col] + ([sum_col] if sum_col else [])
    b = base_agg.select(
        *key_cols, *[F.col(c).alias(f"_b_{c}") for c in cols]
    )
    dd = d.select(*key_cols, *[F.col(c).alias(f"_d_{c}") for c in cols])
    merged = b.join(dd, on=list(key_cols), how="full_outer")
    out_cols = [
        (
            F.coalesce(F.col(f"_b_{count_col}"), F.lit(0))
            + F.coalesce(F.col(f"_d_{count_col}"), F.lit(0))
        )
        .cast("long")
        .alias(count_col)
    ]
    if sum_col:
        zero = F.lit(0).cast("decimal(18,2)")
        out_cols.append(
            (
                F.coalesce(F.col(f"_b_{sum_col}"), zero)
                + F.coalesce(F.col(f"_d_{sum_col}"), zero)
            ).alias(sum_col)
        )
    return merged.select(*key_cols, *out_cols)
