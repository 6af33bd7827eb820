"""Golden tests: split boundary edges (split.py:48-72 semantics) and W3
circular-lag indexing at hour 0 and 23 (hour_feature_builder.py:32-39)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bicis_spark.operators.features import circular_lag_features
from bicis_spark.operators.split import SplitPeriods, split_bounds, time_split

BASE = dt.datetime(2024, 1, 1)


def _trips(spark, rows):
    return spark.createDataFrame(
        rows, "id long, rent_date timestamp, return_date timestamp"
    )


def test_split_edges(spark):
    # max_date = min(max(rent), max(return)) = 2024-04-10 (return max lower)
    # max_date = 2024-04-11; testing_start = -90d = 2024-01-12;
    # validation_start/training_end = -180d = 2023-10-14
    rows = [
        (0, dt.datetime(2023, 1, 1), BASE),  # training (< 2023-10-14)
        # one microsecond before the boundary → training (strict <)
        (1, dt.datetime(2023, 10, 14) - dt.timedelta(microseconds=1), BASE),
        # exactly at training_end/validation_start boundary → validation (>=)
        (2, dt.datetime(2023, 10, 14), BASE),
        (3, dt.datetime(2024, 1, 10, 12), BASE),  # validation interior
        # exactly at validation_end/testing_start → testing (>=)
        (4, dt.datetime(2024, 1, 12), BASE),
        # exactly max_date → testing (<=)
        (5, dt.datetime(2024, 4, 11), dt.datetime(2024, 4, 10)),
        (6, BASE, dt.datetime(2024, 4, 11)),  # validation; sets return max
    ]
    # rent max = 2024-04-11, return max = 2024-04-11 → max_date = 2024-04-11
    splits = time_split(_trips(spark, rows), periods=SplitPeriods(90, 90))
    got = {
        name: sorted(r["id"] for r in splits[name].collect())
        for name in ("training", "validation", "testing")
    }
    bounds = splits["metadata"].first()
    assert bounds["max_date"] == dt.datetime(2024, 4, 11)
    assert bounds["testing_start_date"] == dt.datetime(2024, 4, 11) - dt.timedelta(days=90)
    assert got["training"] == [0, 1]
    assert got["validation"] == [2, 3, 6]
    assert got["testing"] == [4, 5]


def test_split_bounds_least_of_maxes(spark):
    rows = [(0, dt.datetime(2024, 6, 1), dt.datetime(2024, 5, 1))]
    b = split_bounds(_trips(spark, rows)).first()
    assert b["max_date"] == dt.datetime(2024, 5, 1)


def test_circular_lag_hours_0_and_23(spark):
    """For an event at hour 0: lag i ⇒ profile hour (0-1-i) mod 24 = 23-i.
    For hour 23: lag i ⇒ 22-i."""
    profile = spark.createDataFrame(
        [("A", h, float(h), float(100 + h)) for h in range(24)],
        "station string, hour int, n_rents double, n_returns double",
    )
    events = spark.createDataFrame(
        [
            (0, "A", dt.datetime(2024, 1, 1, 0, 15)),
            (1, "A", dt.datetime(2024, 1, 1, 23, 45)),
            (2, "UNKNOWN", dt.datetime(2024, 1, 1, 5, 0)),
        ],
        "id long, station string, ts timestamp",
    )
    out = circular_lag_features(events, profile, "station", "ts", "id").collect()
    rows = {r["id"]: r for r in out}
    # hour 0: indices 23, 22, ..., 0 (wrap immediately)
    assert [rows[0][f"n_rents_{i}_hb"] for i in range(24)] == [
        float((0 - 1 - i) % 24) for i in range(24)
    ]
    # hour 23: indices 22, 21, ..., then wraps to 23 at i=23
    assert [rows[1][f"n_rents_{i}_hb"] for i in range(24)] == [
        float((23 - 1 - i) % 24) for i in range(24)
    ]
    assert rows[1]["n_returns_0_hb"] == 122.0
    # unknown station: all-zero features (left join + coalesce 0)
    assert all(rows[2][f"n_rents_{i}_hb"] == 0.0 for i in range(24))


def test_lag_features_observed_period_profile(spark):
    """Missing hours in the profile yield 0.0 (fillna semantics)."""
    profile = spark.createDataFrame(
        [("A", 10, 5.0, 7.0)],
        "station string, hour int, n_rents double, n_returns double",
    )
    events = spark.createDataFrame(
        [(0, "A", dt.datetime(2024, 1, 1, 11, 0))],
        "id long, station string, ts timestamp",
    )
    r = circular_lag_features(events, profile, "station", "ts", "id").first()
    # hour 11: lag 0 → hour 10 (present), lag 1 → hour 9 (absent)
    assert r["n_rents_0_hb"] == 5.0
    assert r["n_returns_0_hb"] == 7.0
    assert r["n_rents_1_hb"] == 0.0


def test_range_join_matches_bruteforce(spark):
    """Bucketized range join == naive inequality join, including exact
    boundary rows (right_ts == left_ts and right_ts == left_ts - lookback)."""
    import datetime as dt

    from bicis_spark.operators.rangejoin import range_join_lookback

    B = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (1, 10, B + dt.timedelta(days=10)),
            (2, 10, B + dt.timedelta(days=20)),
            (3, 20, B + dt.timedelta(days=10)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, B + dt.timedelta(days=10)),            # == left ts (in)
            (101, 10, B + dt.timedelta(days=3)),              # == ts - 7d (in)
            (102, 10, B + dt.timedelta(days=2, hours=23)),    # just outside
            (103, 10, B + dt.timedelta(days=10, seconds=1)),  # future (out)
            (104, 20, B + dt.timedelta(days=9)),              # other key (in)
            (105, 30, B + dt.timedelta(days=10)),             # unmatched key
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    out = range_join_lookback(
        left, right, "ts", "o_orderdate", "user_id", "o_custkey", 7 * 86_400
    )
    got = {(r["event_id"], r["o_orderkey"]) for r in out.collect()}

    naive = left.join(
        right,
        (left["user_id"] == right["o_custkey"])
        & (right["o_orderdate"] <= left["ts"])
        & (right["o_orderdate"] >= left["ts"] - F.expr("INTERVAL 7 DAYS")),
    )
    want = {(r["event_id"], r["o_orderkey"]) for r in naive.collect()}
    assert got == want
    assert (1, 100) in got and (1, 101) in got and (1, 102) not in got
    assert (3, 104) in got
