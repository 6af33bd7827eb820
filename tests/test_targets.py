"""W1 forward rolling-window count: property test vs brute force + golden
edges (SURVEY.md §5.3). The brute force mirrors the reference's pandas
semantics (next_window_target.py:61-111): count events with
t_j - t_i ∈ [0, W), keep events with t_i <= max(t) - W."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

from bicis_spark.operators.targets import next_window_count

BASE = dt.datetime(2024, 1, 1)


def brute_force(events: list[tuple[int, str, dt.datetime]], window_s: int):
    """O(n²) reference implementation of [0, W) + full-window mask."""
    out = {}
    by_station: dict[str, list[tuple[int, dt.datetime]]] = {}
    for eid, st, ts in events:
        by_station.setdefault(st, []).append((eid, ts))
    w = dt.timedelta(seconds=window_s)
    for st, evs in by_station.items():
        mx = max(ts for _, ts in evs)
        for eid, ts in evs:
            if ts > mx - w:
                continue  # not a full window
            out[eid] = sum(1 for _, t2 in evs if ts <= t2 < ts + w)
    return out


def run_spark(spark, events, window_s):
    df = spark.createDataFrame(
        [(e, s, t) for e, s, t in events], "id long, station string, ts timestamp"
    )
    res = next_window_count(df, "station", "ts", "id", window_s, "cnt")
    return {r["id"]: r["cnt"] for r in res.collect()}


def test_brute_force_random(spark):
    rng = random.Random(42)
    events = []
    eid = 0
    for st in ["A", "B", "HOT"]:
        n = 200 if st == "HOT" else 40
        for _ in range(n):
            ts = BASE + dt.timedelta(
                seconds=rng.randint(0, 72_000), microseconds=rng.randint(0, 999_999)
            )
            events.append((eid, st, ts))
            eid += 1
    expected = brute_force(events, 3600)
    actual = run_spark(spark, events, 3600)
    assert actual == expected


def test_boundary_exact_window_edge(spark):
    """An event exactly W after another is OUTSIDE the window ([0, W))."""
    events = [
        (0, "A", BASE),
        (1, "A", BASE + dt.timedelta(seconds=3600)),  # exactly +W: excluded
        (2, "A", BASE + dt.timedelta(seconds=3599, microseconds=999_999)),  # in
        (3, "A", BASE + dt.timedelta(seconds=7200)),  # sets max
    ]
    actual = run_spark(spark, events, 3600)
    # full-window mask: max=7200 ⇒ keep ts <= 3600: events 0, 1, 2
    assert set(actual) == {0, 1, 2}
    assert actual[0] == 2  # itself + event 2; event 1 at exactly +W excluded
    assert actual[1] == 1  # itself only (7200 is exactly +W away)
    assert actual[2] == 2  # itself + event 1 (0.000001s later)
    # cross-check the whole case against brute force
    assert actual == brute_force(events, 3600)


def test_same_second_ties(spark):
    """Events at identical timestamps all count each other (FIXTURES.md §2)."""
    events = [
        (0, "A", BASE),
        (1, "A", BASE),
        (2, "A", BASE),
        (3, "A", BASE + dt.timedelta(seconds=7200)),
    ]
    actual = run_spark(spark, events, 3600)
    assert actual == {0: 3, 1: 3, 2: 3}


def test_full_window_mask_inclusive(spark):
    """t == max - W is KEPT (<=, next_window_target.py:86-89)."""
    events = [(0, "A", BASE), (1, "A", BASE + dt.timedelta(seconds=3600))]
    actual = run_spark(spark, events, 3600)
    assert set(actual) == {0}


def test_null_station_dropped(spark):
    df = spark.createDataFrame(
        [(0, None, BASE), (1, "A", BASE), (2, "A", BASE + dt.timedelta(seconds=7200))],
        "id long, station string, ts timestamp",
    )
    res = next_window_count(df, "station", "ts", "id", 3600, "cnt")
    assert {r["id"] for r in res.collect()} == {1}


def test_bucketed_variant_equals_plain(spark):
    """Skew-bounded bucketed window == plain window on random data,
    including events straddling bucket boundaries."""
    from bicis_spark.operators.targets import next_window_count_bucketed

    rng = random.Random(7)
    events = []
    eid = 0
    for st in ["A", "HOT"]:
        n = 300 if st == "HOT" else 60
        for _ in range(n):
            # span ~3 days so day buckets actually split; cluster some
            # events right at day boundaries
            base_s = rng.choice(
                [rng.randint(0, 260_000), 86_400 - rng.randint(0, 3600), 86_400]
            )
            ts = BASE + dt.timedelta(
                seconds=base_s, microseconds=rng.randint(0, 999_999)
            )
            events.append((eid, st, ts))
            eid += 1
    df = spark.createDataFrame(
        events, "id long, station string, ts timestamp"
    )
    plain = {
        r["id"]: r["cnt"]
        for r in next_window_count(df, "station", "ts", "id", 3600, "cnt").collect()
    }
    bucketed = {
        r["id"]: r["cnt"]
        for r in next_window_count_bucketed(
            df, "station", "ts", "id", 3600, "cnt", bucket_seconds=86_400
        ).collect()
    }
    assert bucketed == plain
    assert plain == brute_force(events, 3600)


def test_bucketed_rejects_small_bucket(spark):
    from bicis_spark.operators.targets import next_window_count_bucketed
    import pytest

    df = spark.createDataFrame([(0, "A", BASE)], "id long, station string, ts timestamp")
    with pytest.raises(ValueError, match="bucket"):
        next_window_count_bucketed(df, "station", "ts", "id", 3600, "c", 1800)
