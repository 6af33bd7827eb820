"""The t2 gate, locally: every declared query with an oracle must match
DuckDB exactly at the test scale factor. Queries without oracle SQL get a
rows-runnable smoke check (the driver's weaker rows-only path)."""

from __future__ import annotations

import pytest

from bicis_spark.plans import queries as registry
from tests.oracle_utils import assert_oracle_match

ALL = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = ALL[name](spark, sf_dir)
    if name in ORACLES:
        assert_oracle_match(df, duck, ORACLES[name], name)
    else:
        # rows-only: runs and returns a stable schema
        assert df.columns
        assert df.count() >= 0
