"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.3 "not present"; pyspark_guide 'As-of / range join').

For each left row, attach the latest right row of the same key with
``right_ts <= left_ts`` (backward direction). This is the canonical
time-series enrichment (trades⋈quotes, events⋈latest-order).

Two plans:

1. **JVM-native (default when the left side has a unique id column)** —
   equi-join on the key with the time bound as a join predicate, then a
   hash aggregate ``max_by(struct(right_cols), struct(right_ts, tiebreak))``
   per left id, then a left join back onto the left side. Every stage is
   whole-stage-codegen'd JVM work: the equi-join gets AQE skew-splitting
   (unavailable inside cogroup), the aggregate gets map-side partial
   combine, and no Python worker ever starts. This is the 100 TB plan.

2. **Cogrouped ``applyInPandas`` + ``pd.merge_asof`` fallback** — used when
   no unique left id exists (merge_asof needs no id). O(n log n) per key,
   Arrow-batched, but a Python boundary and no skew mitigation: keep out
   of hot paths.

Determinism: ties at equal ``right_ts`` resolve to the max ``tiebreak``
column in both plans (merge_asof takes the last row of the
(ts, tiebreak)-sorted right side; max_by orders the struct
lexicographically).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    left_id: str | None = None,
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: left columns + ``right_cols`` (null when no right row
    matches the search for the key). Full pandas ``merge_asof`` surface:

    - ``direction='backward'``: latest right row with right_ts <= left_ts.
    - ``direction='forward'``: earliest right row with right_ts >= left_ts.
    - ``direction='nearest'``: right row minimizing |right_ts - left_ts|
      (exact-distance ties prefer the backward row, then max tiebreak —
      fixed so both engines agree).
    - ``tolerance_s``: maximum allowed |right_ts - left_ts| in seconds.
      At 100 TB a tolerance matters beyond semantics: it turns the time
      predicate into a band, so the pre-aggregate join only materializes
      pairs inside the band instead of a key's full history (and 'nearest'
      WITHOUT a tolerance degenerates to the full per-key cross section —
      pass one).

    Pass ``left_id`` (a unique left column) to get the pure-JVM
    join+aggregate plan; otherwise the cogrouped-pandas fallback runs
    (backward only — the fallback predates the direction surface).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if left_id is not None:
        return _asof_join_native(
            left, right, left_ts, right_ts, by_left, by_right,
            right_cols, tiebreak, left_id, direction, tolerance_s,
        )
    if direction != "backward" or tolerance_s is not None:
        raise ValueError(
            "direction/tolerance need the JVM plan — pass left_id"
        )
    return _asof_join_cogrouped(
        left, right, left_ts, right_ts, by_left, by_right, right_cols, tiebreak
    )


def _asof_join_native(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    right_cols: Sequence[str],
    tiebreak: str | None,
    left_id: str,
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Join + max_by plan (the shape this operator's own oracle SQL uses:
    plans/core_queries.py asof_latest_order)."""
    lts = F.col(f"_l.{left_ts}")
    rts = F.col(f"_r.{right_ts}")
    tie = (
        [F.col(f"_r.{tiebreak}")] if tiebreak and tiebreak != right_ts else []
    )
    if direction == "backward":
        cond = rts <= lts
        order_key = F.struct(rts, *tie)  # maximize ts then tiebreak
    elif direction == "forward":
        # minimize ts: maximize its negation (epoch µs — exact long math)
        cond = rts >= lts
        order_key = F.struct(-F.unix_micros(rts), *tie)
    else:  # nearest
        cond = F.lit(True)
        dist = F.abs(F.unix_micros(rts) - F.unix_micros(lts))
        order_key = F.struct(
            -dist,  # maximize -distance == minimize distance
            (rts <= lts).cast("int"),  # distance tie: prefer backward
            *tie,
        )
    if tolerance_s is not None:
        bound = F.lit(int(tolerance_s) * 1_000_000)
        diff = F.unix_micros(rts) - F.unix_micros(lts)
        if direction == "backward":
            cond = cond & (-diff <= bound)
        elif direction == "forward":
            cond = cond & (diff <= bound)
        else:
            cond = (diff <= bound) & (-diff <= bound)
    probe = left.select(left_id, by_left, left_ts).alias("_l")
    build = right.alias("_r")
    best = (
        probe.join(
            build,
            (F.col(f"_l.{by_left}") == F.col(f"_r.{by_right}")) & cond,
            "inner",
        )
        .groupBy(F.col(f"_l.{left_id}").alias(left_id))
        .agg(
            F.max_by(
                F.struct(*[F.col(f"_r.{c}").alias(c) for c in right_cols]),
                order_key,
            ).alias("_best")
        )
    )
    return left.join(best, on=left_id, how="left").select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_best.{c}").alias(c) for c in right_cols],
    )


def _asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    right_cols: Sequence[str],
    tiebreak: str | None,
) -> DataFrame:
    out_fields = list(left.schema.fields) + [
        right.schema[c] for c in right_cols
    ]
    out_schema = StructType(out_fields)
    left_cols = list(left.columns)
    sort_right = [right_ts] + ([tiebreak] if tiebreak else [])

    # prune right keys with no left rows BEFORE the cogroup shuffle: keys
    # only on the right produce empty merges but still cost a full Python
    # round-trip each (and shuffle their rows). Broadcast left-semi join —
    # at scale this also stops shuffling right rows nobody asks for.
    right = right.join(
        F.broadcast(left.select(F.col(by_left).alias(by_right)).distinct()),
        on=by_right,
        how="leftsemi",
    )
    # rows with a null right timestamp can never match; drop pre-shuffle
    right = right.where(F.col(right_ts).isNotNull())

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        # null left timestamps break merge_asof's monotonicity requirement
        # (NaT sorts last) — split them out and emit with null right cols,
        # preserving left-join semantics.
        null_mask = lpdf[left_ts].isna()
        null_part = lpdf[null_mask]
        lpdf = lpdf[~null_mask].sort_values(left_ts, kind="mergesort")

        def with_null_right(part: pd.DataFrame) -> pd.DataFrame:
            out = part.copy()
            for c in right_cols:
                out[c] = None
            return out[[f.name for f in out_fields]]

        if lpdf.empty:
            return with_null_right(null_part)
        if rpdf.empty:
            return with_null_right(pd.concat([lpdf, null_part]))
        rpdf = rpdf.sort_values(sort_right, kind="mergesort")[
            [right_ts, *[c for c in right_cols if c != right_ts]]
        ]
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "_r"),
        )
        if right_ts in left_cols:
            merged = merged.rename(columns={f"{right_ts}_r": right_ts})
        merged = merged[[f.name for f in out_fields]]
        if not null_part.empty:
            merged = pd.concat([merged, with_null_right(null_part)])
        return merged

    return (
        left.groupBy(by_left)
        .cogroup(right.groupBy(by_right))
        .applyInPandas(lambda _key, l, r: merge(l, r), out_schema)
    )
