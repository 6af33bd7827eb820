"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.3 "not present"; pyspark_guide 'As-of / range join').

For each left row, attach the latest right row of the same key with
``right_ts <= left_ts`` (backward direction). This is the canonical
time-series enrichment (trades⋈quotes, events⋈latest-order).

Implementation: cogrouped ``applyInPandas`` + ``pd.merge_asof`` per key —
the documented pattern when built-in operators can't express the semantics.
Both sides hash-partition by key (one shuffle each); within a group,
merge_asof is O(n log n) sort + linear merge, Arrow-batched. Skewed keys
are the scale risk — AQE skew handling doesn't apply inside cogroup, so
extremely hot keys would need a secondary time-bucket split (bucketize the
range key + equi-join, same guide); not needed at driver scales.

Determinism: right rows are sorted by (ts, *tiebreak) and merge_asof takes
the last match, so ties resolve to the max tiebreak column.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Backward as-of join: left columns + ``right_cols`` (null when no
    right row at-or-before the left timestamp exists for the key)."""
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
    from pyspark.sql import functions as F

    right = right.join(
        F.broadcast(left.select(F.col(by_left).alias(by_right)).distinct()),
        on=by_right,
        how="leftsemi",
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_cols:
                out[c] = None
            return out[[f.name for f in out_fields]]
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
        return merged[[f.name for f in out_fields]]

    return (
        left.groupBy(by_left)
        .cogroup(right.groupBy(by_right))
        .applyInPandas(lambda _key, l, r: merge(l, r), out_schema)
    )
