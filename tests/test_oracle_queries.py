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
    insertion order (verified against CORRECTNESS_r01/r02/r03 key lists).
    Pin the round-4 window so a future registration can't silently evict a
    query from driver verification (the r2 failure mode: 12 new core
    queries pushed all 40 extension queries out of the window)."""
    first50 = list(ALL)[:50]
    assert len(registry.DRIVER_WINDOW) == 50
    assert first50 == list(registry.DRIVER_WINDOW), (
        "first-50 registration order drifted from plans/queries.py DRIVER_WINDOW"
    )
    # every windowed name must carry an oracle: the round-4 window holds
    # only SQL-expressible analytics queries (rows-only names can never go
    # green, so they don't get a slot)
    missing = [n for n in first50 if n not in ORACLES]
    assert not missing, f"driver-window queries without oracle SQL: {missing}"


def test_driver_window_spends_slots_on_unverified_queries():
    """Rotation honesty (r3 verdict item #8): while any registered query has
    never had a driver CORRECTNESS row, every window slot must go to one of
    them — re-verifying an already-green query wastes the round's only hard
    check. Reads the committed CORRECTNESS_r*.json round records."""
    import glob
    import json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    records = sorted(glob.glob(str(repo / "CORRECTNESS_r*.json")))
    if not records:
        pytest.skip("no CORRECTNESS_r*.json round records present")
    # The newest record is the driver's check OF the current window — it
    # always contains the window names, so it only counts as "already
    # verified" once the window has ROTATED AWAY from it (i.e. its key
    # set no longer matches DRIVER_WINDOW): before rotation it would
    # trivially flag every slot, after rotation excluding it would let a
    # new window silently re-verify last round's names.
    newest_keys = set(json.load(open(records[-1])))
    ever_checked: set[str] = set()
    for path in records[:-1]:
        ever_checked |= set(json.load(open(path)))
    if newest_keys != set(registry.DRIVER_WINDOW):
        ever_checked |= newest_keys
    if not ever_checked:  # fresh clone without round records: nothing to assert
        pytest.skip("no CORRECTNESS_r*.json round records present")
    unverified = set(ALL) - ever_checked
    if not unverified:
        pytest.skip("every registered query already has a driver row")
    if len(unverified) >= len(registry.DRIVER_WINDOW):
        # more unverified names than slots: every slot must go to one
        wasted = [n for n in registry.DRIVER_WINDOW if n in ever_checked]
        assert not wasted, (
            f"{len(unverified)} queries have never had a driver row, but "
            f"the window re-verifies already-checked names: {wasted}"
        )
    else:
        # endgame (r7+): fewer unverified names than slots — all of them
        # must hold a slot; the remaining slots legitimately re-verify
        # (oldest-first by convention, not asserted)
        missing = sorted(n for n in unverified
                         if n not in registry.DRIVER_WINDOW)
        assert not missing, (
            f"unverified queries left out of the window: {missing}"
        )


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = ALL[name](spark, sf_dir)
    if name in ORACLES:
        assert_oracle_match(df, duck, ORACLES[name], name)
    else:
        # rows-only: runs and returns a stable schema
        assert df.columns
        assert df.count() >= 0
