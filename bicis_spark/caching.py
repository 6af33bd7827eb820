"""Cache-lifetime discipline for builders that persist loop-invariant or
multi-consumer intermediates.

The idiom: persist the intermediates, build the (small, output-sized)
result plan, then ``materialize_and_release`` — eagerly localCheckpoint
the result so it no longer references the caches, and unpersist every
cache in a ``finally`` so a failed materialization job cannot leak
|E|-sized frames into the block manager for the rest of the session.

Trade-offs callers accept (document at the call site):

- The builder becomes EAGER: the job runs at call time, so plan-only
  tooling (``scripts/explain_audit.py``) sees a Scan-ExistingRDD stub
  instead of the real plan for these queries.
- ``localCheckpoint`` blocks are non-reliable executor storage with
  truncated lineage: on a real cluster, swap for a reliable checkpoint
  dir (``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``) —
  the same caveat extensions/dedup.py documents for its CC loop.
- Blocks are reclaimed by the ContextCleaner when the returned frame is
  garbage-collected, not by ``unpersist()``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def materialize_and_release(
    result: DataFrame, caches: Iterable[DataFrame]
) -> DataFrame:
    """Eagerly materialize ``result`` via localCheckpoint, then unpersist
    every frame in ``caches`` — released in a ``finally`` so the caches
    are freed even when the materialization job fails. ``unpersist`` is
    idempotent, so callers may also release the same caches in their own
    exception paths."""
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for c in caches:
            c.unpersist()
