"""Declared correctness queries — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as
(name → Spark callable, name → DuckDB oracle SQL). The driver runs both at
sf=0.01 and hash-compares row count + schema + order-insensitive values.

Determinism rules (SURVEY.md §7 "Nondeterminism bans"):
- session timezone pinned UTC (session.py) so timestamps match DuckDB.
- every computed column aliased identically on both sides.
- integer outputs cast to BIGINT, floats to DOUBLE, to match DuckDB's
  natural result types.
- float aggregates either derive from exact integer arithmetic (counts,
  quantized dot products) or go through exact DECIMAL sums cast back to
  DOUBLE — never order-dependent double accumulation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, with its
    DuckDB oracle SQL (None ⇒ rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec[0] for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: s[1] for n, s in _REGISTRY.items() if s[1] is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import-for-effect)."""
    global _LOADED
    if _LOADED:
        return
    import bicis_spark.plans.core_queries  # noqa: F401
    import bicis_spark.plans.pipeline_queries  # noqa: F401
    import bicis_spark.plans.extension_queries  # noqa: F401

    _LOADED = True
