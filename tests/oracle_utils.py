"""Local replica of the driver's oracle comparison (BASELINE.md t2 gate).

Runs a declared Spark query and its DuckDB oracle SQL on the same parquet
tables and compares row count + column names + order-insensitive values.
Exact equality (no float tolerance): the engine's determinism rules
(plans/queries.py docstring) are designed so both sides are bit-identical —
if this passes locally, the driver's value hash matches.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def _cell_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        # exact: determinism rules forbid order-dependent float accumulation
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def assert_oracle_match(spark_df, duck_con, sql: str, name: str = "query") -> None:
    actual = _normalize(spark_df.toPandas())
    expected = _normalize(duck_con.execute(sql).fetchdf())

    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch: spark={list(actual.columns)} "
        f"oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    for col in actual.columns:
        av, ev = actual[col].tolist(), expected[col].tolist()
        bad = [
            (i, a, e) for i, (a, e) in enumerate(zip(av, ev)) if not _cell_equal(a, e)
        ]
        assert not bad, f"{name}.{col}: {len(bad)} mismatched values, first: {bad[:5]}"
