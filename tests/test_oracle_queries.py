"""The t2 gate, locally: every declared query with an oracle must match
DuckDB exactly at the test scale factor. Queries without oracle SQL get a
rows-runnable smoke check (the driver's weaker rows-only path)."""

from __future__ import annotations

import pytest

from bicis_spark.plans import queries as registry
from tests.oracle_utils import assert_oracle_match

ALL = registry.queries()
ORACLES = registry.oracle_sql()


def test_driver_window_manifest_pinned():
    """The driver hash-verifies only the FIRST 50 registered queries, in
    insertion order (verified against CORRECTNESS_r01/r02 key lists). Pin
    the round-3 window so a future registration can't silently evict a
    query from driver verification (the r2 failure mode: 12 new core
    queries pushed all 40 extension queries out of the window)."""
    first50 = list(ALL)[:50]
    assert len(registry.DRIVER_WINDOW) == 50
    assert first50 == list(registry.DRIVER_WINDOW), (
        "first-50 registration order drifted from plans/queries.py DRIVER_WINDOW"
    )
    # every windowed name except the documented rows-only set carries an oracle
    rows_only = {
        "glm_poisson_predictions",  # IRLS float iteration: no DuckDB twin
        "glm_poisson_mse",
        "dedup_minhash_lsh_fast",  # xxhash64 signatures: no DuckDB twin
        "table_profile_orders_approx",  # HLL approx counts: no exact twin
    }
    missing = [n for n in first50 if n not in ORACLES and n not in rows_only]
    assert not missing, f"driver-window queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = ALL[name](spark, sf_dir)
    if name in ORACLES:
        assert_oracle_match(df, duck, ORACLES[name], name)
    else:
        # rows-only: runs and returns a stable schema
        assert df.columns
        assert df.count() >= 0
