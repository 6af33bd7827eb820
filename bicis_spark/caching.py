"""Cache-lifetime discipline for builders that persist loop-invariant or
multi-consumer intermediates.

The idiom: enter ``persisted(...)`` around the WHOLE risk window — from
the persist through every job that runs while the caches are marked
(driver-side collects, loop iterations, the final eager materialization)
— and return an eagerly ``localCheckpoint``-ed result from inside the
block. The context manager unpersists on every exit path, so a failed
collect or mid-loop job can never leak an |E|-sized cache into the block
manager for the rest of the session.

Trade-offs callers accept (document at the call site):

- The builder becomes EAGER: the job runs at call time, so plan-only
  tooling (``scripts/explain_audit.py``) sees a Scan-ExistingRDD stub
  instead of the real plan for these queries.
- ``localCheckpoint`` blocks are non-reliable executor storage with
  truncated lineage: on a real cluster, swap for a reliable checkpoint
  dir (``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``) —
  the same caveat extensions/dedup.py documents for its CC loop.
- Checkpoint blocks are reclaimed by the ContextCleaner when the
  returned frame is garbage-collected, not by ``unpersist()``.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def persisted(*frames: DataFrame) -> Iterator[tuple[DataFrame, ...]]:
    """Persist every frame for the duration of the block and unpersist
    them all on exit — success, return, or exception alike. The result a
    caller returns from inside the block must not reference the caches
    lazily (localCheckpoint it eagerly first), or it would recompute from
    scratch after release. ``unpersist`` is idempotent, so nesting and
    early manual release are safe."""
    cached = tuple(f.persist() for f in frames)
    try:
        yield cached
    finally:
        for c in cached:
            c.unpersist()


# ---------------------------------------------------------------------------
# Tracked session caches (round-5, ADVICE item on IVF/PQ persist leaks).
#
# Some builders persist multi-consumer subtrees (IVF centroids, PQ
# codebooks, dedup shingle blocks) that MUST outlive the builder call:
# the returned plan is lazy, and the bench contract measures run 2 of a
# query re-using run 1's trained structures (the long-lived-cluster
# steady state), so an in-builder unpersist would defeat both. The
# discipline instead is ownership transfer: builders register such
# persists here, and every harness boundary (bench between queries,
# driver emulation between queries, test teardown) calls
# ``release_tracked()`` — an explicit, inspectable release path, so
# nothing accumulates for the rest of the session.
# ---------------------------------------------------------------------------

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist a builder intermediate whose cache deliberately outlives
    the builder call (lazy result plans reference it). The frame is
    recorded so ``release_tracked()`` at the next harness boundary frees
    it; use plain ``persisted(...)`` for caches that can die with the
    builder."""
    _TRACKED.append(df.persist())
    return df


def release_tracked() -> int:
    """Unpersist every tracked builder cache; returns how many were
    released. Idempotent; safe to call between queries or in teardown."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist()
        n += 1
    return n


def tracked_count() -> int:
    """How many builder caches are currently tracked (leak probe for
    tests)."""
    return len(_TRACKED)
