"""foreachBatch upsert sink: stream → keyed parquet table (latest-wins).

The production pattern this models: a CDC/event stream maintaining a
keyed state table via per-microbatch MERGE — on Delta/Iceberg the sink
body is ``MERGE INTO target USING batch``; without a table format the
relational core is the engine's own ``merge_into`` (one full-outer join
per microbatch) plus a versioned-directory commit protocol standing in
for the transaction log:

- each microbatch writes a complete new table version ``v{n+1}/`` and
  only then moves the version pointer (the highest ``v*/_SUCCESS`` dir
  is the table; a crash mid-write leaves a version without _SUCCESS that
  readers skip) — copy-on-write, same shape as a Delta commit;
- the merge collapses the batch to its latest row per key FIRST (one
  hash agg), so the join input is |keys-in-batch|, not |batch|, and the
  MERGE precondition (source unique on key) holds by construction;
- latest-wins is decided by a TOTAL order (ts, then a unique tie-break
  id), which makes the final state independent of microbatch boundaries
  AND of replays: re-processing any prefix of the stream is a no-op
  merge — the idempotence that gives foreachBatch its effective
  exactly-once story (the batch_id-based dedup ledger real deployments
  add is not needed when the merge itself is idempotent).

State size: the target holds one row per key ever seen; each microbatch
costs one shuffle keyed by the merge key over |target| + |batch-keys|
rows. At 100 TB the target is partitioned/bucketed on the key and the
merge prunes to touched partitions — the versioned-dir commit swaps only
rewritten partitions (partition-level copy-on-write).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bicis_spark.operators.merge import merge_into


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Collapse to the max-(order_cols) row per key — one hash agg with
    map-side combine (max_by over a struct), no window/sort."""
    others = [c for c in df.columns if c not in key_cols]
    return df.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in others]),
            F.struct(*[F.col(c) for c in order_cols]),
        ).alias("_r")
    ).select(*key_cols, *[F.col(f"_r.{c}").alias(c) for c in others])


def upsert_step(
    target: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """One merge step of the latest-wins fold: the post-merge state after
    applying ``batch`` to ``target`` (None = empty initial state).

    Pure relational function of its inputs — property-tested directly
    (tests/test_properties.py): folding ANY partition of a dataset in ANY
    batch order yields the global argmax per key, because max over the
    (order_cols) total order is commutative and associative and the
    update condition fires exactly when the source row is strictly
    greater."""
    src = latest_per_key(batch, key_cols, order_cols)
    if target is None:
        return src
    newer = None
    # lexicographic (order_cols) comparison: s wins on the first
    # strictly-greater column with all earlier columns equal
    for i, oc in enumerate(order_cols):
        eq_prefix = F.lit(True)
        for prev in order_cols[:i]:
            eq_prefix = eq_prefix & (F.col(f"s.{prev}") == F.col(f"t.{prev}"))
        term = eq_prefix & (F.col(f"s.{oc}") > F.col(f"t.{oc}"))
        newer = term if newer is None else (newer | term)
    payload = [c for c in batch.columns if c not in key_cols]
    return merge_into(
        target,
        src,
        key_cols=key_cols,
        update_set={c: F.col(f"s.{c}") for c in payload},
        update_cond=newer,
        insert_values={c: F.col(f"s.{c}") for c in batch.columns},
    )


_VERSION_RE = re.compile(r"^v(\d+)$")


def _committed_versions(target_dir: str) -> list[int]:
    if not os.path.isdir(target_dir):
        return []
    out = []
    for name in os.listdir(target_dir):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(target_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_table_version(
    spark: SparkSession, target_dir: str, schema
) -> DataFrame | None:
    """Latest committed version of the sink table, or None before the
    first commit. Schema-explicit (S4 discipline) — the sink wrote it."""
    versions = _committed_versions(target_dir)
    if not versions:
        return None
    path = os.path.join(target_dir, f"v{versions[-1]}")
    return spark.read.schema(schema).parquet(path)


def run_upsert_stream(
    stream_df: DataFrame,
    target_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    query_name: str = "upsert_sink",
    keep_versions: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drive a finite stream to completion through a foreachBatch MERGE
    into a versioned parquet table; return the final committed state.

    ``order_cols`` must totally order rows within a key (e.g. a
    timestamp plus a unique id) — that is what makes the result
    batch-boundary- and replay-invariant. Old versions beyond
    ``keep_versions`` are vacuumed after each commit. ``checkpoint_dir``
    defaults to ``<target_dir>/_checkpoint``; pass a fresh one to
    re-process a source against existing state (a replay — a no-op merge
    when the data is stale, by the latest-wins total order).

    Single-writer protocol: one query owns a target_dir at a time (the
    version counter is read-modify-write). Rows whose order_cols hold
    NULLs never compare greater, so they can seed state for a new key but
    never overwrite existing state — give every row a real event time.
    """
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1 (the current table)")
    spark = stream_df.sparkSession
    schema = stream_df.schema

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        target = read_table_version(spark, target_dir, schema)
        merged = upsert_step(target, batch_df, key_cols, order_cols)
        versions = _committed_versions(target_dir)
        next_v = (versions[-1] + 1) if versions else 0
        # write the full new version, then rely on _SUCCESS as the commit
        # marker — readers only ever see fully-written versions
        merged.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"v{next_v}")
        )
        for old in _committed_versions(target_dir)[:-keep_versions]:
            shutil.rmtree(
                os.path.join(target_dir, f"v{old}"), ignore_errors=True
            )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(target_dir, "_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = read_table_version(spark, target_dir, schema)
    if out is None:
        # not an assert: stripped under `python -O`, and an empty stream
        # returning None would surface as a confusing downstream AttributeError
        raise RuntimeError(
            "upsert stream produced no batches (no table version written "
            f"under {target_dir!r})"
        )
    return out
