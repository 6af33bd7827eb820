"""Cache-lifetime discipline (bicis_spark/caching.py).

The iterative operators (pagerank, connected components, ANN training)
persist loop-invariant frames for the duration of their loop via
``persisted(...)``. These tests pin the contract the operators rely on:
frames are actually marked cached inside the block, and released on
every exit path — normal return AND exception — so a failed mid-loop
job can never leak an |E|-sized cache into the block manager for the
rest of the session.
"""

from __future__ import annotations

import pytest

from bicis_spark.caching import persisted


def _make_df(spark):
    return spark.range(100).withColumnRenamed("id", "v")


def test_persisted_marks_and_releases(spark):
    df = _make_df(spark)
    assert not df.is_cached
    with persisted(df) as (c,):
        assert c.is_cached
        # materialize so the cache actually holds blocks, not just a mark
        assert c.count() == 100
    assert not c.is_cached


def test_persisted_releases_on_exception(spark):
    df = _make_df(spark)
    with pytest.raises(RuntimeError, match="boom"):
        with persisted(df) as (c,):
            assert c.is_cached
            raise RuntimeError("boom")
    assert not c.is_cached


def test_persisted_multiple_frames_all_released(spark):
    a, b = _make_df(spark), _make_df(spark).selectExpr("v * 2 AS v")
    with persisted(a, b) as (ca, cb):
        assert ca.is_cached and cb.is_cached
    assert not ca.is_cached and not cb.is_cached


def test_checkpointed_result_survives_release(spark):
    """The documented idiom: a localCheckpoint-ed result returned from
    inside the block stays correct (and does not recompute from a cold
    source) after the caches are gone."""
    df = _make_df(spark)
    with persisted(df) as (c,):
        out = c.groupBy().sum("v").localCheckpoint(eager=True)
    assert not c.is_cached
    assert out.collect()[0][0] == sum(range(100))
