"""As-of join: the JVM-native join+max_by plan must be output-equivalent to
the cogrouped merge_asof fallback, including null-timestamp edges, and must
contain no Python stage in its physical plan."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from bicis_spark.operators.asof import asof_join

TS = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731

LEFT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("key", LongType()),
        StructField("ts", TimestampType()),
    ]
)
RIGHT_SCHEMA = StructType(
    [
        StructField("rkey", LongType()),
        StructField("rts", TimestampType()),
        StructField("val", DoubleType()),
        StructField("tb", LongType()),
    ]
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, TS("2024-01-01 12:00:00")),
            (2, 10, TS("2024-01-02 12:00:00")),
            (3, 10, TS("2023-12-31 00:00:00")),  # before any right row
            (4, 20, TS("2024-01-05 00:00:00")),  # key with no right rows
            (5, 30, None),  # null left ts
            (6, 40, TS("2024-01-03 00:00:00")),  # exact-tie timestamps on right
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (10, TS("2024-01-01 00:00:00"), 1.0, 100),
            (10, TS("2024-01-02 00:00:00"), 2.0, 101),
            (10, TS("2024-01-03 00:00:00"), 3.0, 102),
            (30, TS("2024-01-01 00:00:00"), 9.0, 103),
            (40, TS("2024-01-01 00:00:00"), 5.0, 201),
            (40, TS("2024-01-01 00:00:00"), 6.0, 202),  # tie -> max tb wins
            (99, TS("2024-01-01 00:00:00"), 7.0, 300),  # right-only key
            (40, None, 8.0, 999),  # null right ts never matches
        ],
        RIGHT_SCHEMA,
    )
    return left, right


def _run(left, right, **kw):
    out = asof_join(
        left,
        right,
        left_ts="ts",
        right_ts="rts",
        by_left="key",
        by_right="rkey",
        right_cols=["rts", "val", "tb"],
        tiebreak="tb",
        **kw,
    )
    return {tuple(r) for r in out.collect()}


def test_native_equals_cogrouped(frames):
    left, right = frames
    assert _run(left, right, left_id="id") == _run(left, right)


def test_native_semantics(frames):
    left, right = frames
    rows = {r["id"]: r for r in asof_join(
        left, right, "ts", "rts", "key", "rkey",
        ["rts", "val", "tb"], tiebreak="tb", left_id="id",
    ).collect()}
    assert len(rows) == 6
    assert rows[1]["val"] == 1.0
    assert rows[2]["val"] == 2.0
    assert rows[3]["val"] is None  # no right row at-or-before
    assert rows[4]["val"] is None  # key absent on right
    assert rows[5]["val"] is None  # null left ts -> left-join null
    assert rows[6]["tb"] == 202  # equal rts -> max tiebreak


def test_native_plan_has_no_python_stage(frames):
    left, right = frames
    out = asof_join(
        left, right, "ts", "rts", "key", "rkey",
        ["rts", "val", "tb"], tiebreak="tb", left_id="id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_cogrouped_handles_all_null_left_ts(spark):
    left = spark.createDataFrame([(1, 10, None), (2, 10, None)], LEFT_SCHEMA)
    right = spark.createDataFrame(
        [(10, TS("2024-01-01 00:00:00"), 1.0, 1)], RIGHT_SCHEMA
    )
    got = _run(left, right)
    assert {r[0] for r in got} == {1, 2}
    assert all(r[3] is None for r in got)


def test_forward_direction(frames):
    left, right = frames
    rows = {r["id"]: r for r in asof_join(
        left, right, "ts", "rts", "key", "rkey",
        ["rts", "val", "tb"], tiebreak="tb", left_id="id",
        direction="forward",
    ).collect()}
    assert rows[1]["val"] == 2.0  # earliest right at-or-after 01-01 12:00
    assert rows[2]["val"] == 3.0
    assert rows[3]["val"] == 1.0  # 2023-12-31 -> first 2024 row
    assert rows[4]["val"] is None
    assert rows[5]["val"] is None
    assert rows[6]["val"] is None  # key-40 rows are all BEFORE this ts


def test_forward_tolerance(frames):
    left, right = frames
    rows = {r["id"]: r for r in asof_join(
        left, right, "ts", "rts", "key", "rkey",
        ["rts", "val", "tb"], tiebreak="tb", left_id="id",
        direction="forward", tolerance_s=12 * 3600,
    ).collect()}
    assert rows[1]["val"] == 2.0  # exactly 12h ahead: inside the bound
    assert rows[3]["val"] is None  # nearest forward row is 24h ahead


def test_nearest_direction_and_ties(frames):
    left, right = frames
    rows = {r["id"]: r for r in asof_join(
        left, right, "ts", "rts", "key", "rkey",
        ["rts", "val", "tb"], tiebreak="tb", left_id="id",
        direction="nearest",
    ).collect()}
    # id=1 at 01-01 12:00: backward 01-01 00:00 and forward 01-02 00:00 are
    # both 12h away -> backward preferred
    assert rows[1]["val"] == 1.0
    assert rows[2]["val"] == 2.0  # same equidistant tie, backward wins
    assert rows[3]["val"] == 1.0  # only forward rows exist
    assert rows[6]["tb"] == 202


def test_nearest_tolerance(frames):
    left, right = frames
    rows = {r["id"]: r for r in asof_join(
        left, right, "ts", "rts", "key", "rkey",
        ["rts", "val", "tb"], tiebreak="tb", left_id="id",
        direction="nearest", tolerance_s=6 * 3600,
    ).collect()}
    assert rows[1]["val"] is None  # nearest is 12h away, band is 6h
    assert rows[3]["val"] is None


def test_matches_pandas_merge_asof_directions(spark):
    """Property parity vs pandas merge_asof on a randomized-but-fixed grid
    (unique right timestamps per key, so tiebreak rules don't diverge)."""
    import pandas as pd

    lrows = [
        (i, k, TS("2024-01-01 00:00:00") + dt.timedelta(hours=7 * i + k))
        for i in range(20) for k in (10, 20)
    ]
    rrows = [
        (k, TS("2024-01-01 00:00:00") + dt.timedelta(hours=11 * j + 2 * k), float(j), j)
        for j in range(15) for k in (10, 20)
    ]
    left = spark.createDataFrame(
        [(i * 2 + (k == 20), k, t) for (i, k, t) in lrows], LEFT_SCHEMA
    )
    right = spark.createDataFrame(rrows, RIGHT_SCHEMA)
    lpd = pd.DataFrame(lrows, columns=["i", "key", "ts"])
    rpd = pd.DataFrame(rrows, columns=["rkey", "rts", "val", "tb"])
    for direction, tol in [
        ("backward", None), ("forward", None), ("nearest", None),
        ("backward", 24 * 3600), ("forward", 24 * 3600), ("nearest", 24 * 3600),
    ]:
        got = asof_join(
            left, right, "ts", "rts", "key", "rkey", ["val"],
            tiebreak="tb", left_id="id", direction=direction, tolerance_s=tol,
        ).collect()
        want = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("rts"),
            left_on="ts", right_on="rts", left_by="key", right_by="rkey",
            direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol else None,
        )
        want_by_key = {
            (r.key, r.ts.to_pydatetime()): (None if pd.isna(r.val) else r.val)
            for r in want.itertuples()
        }
        for r in got:
            assert want_by_key[(r["key"], r["ts"])] == r["val"], (
                direction, tol, r)
