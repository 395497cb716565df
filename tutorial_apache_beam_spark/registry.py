"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (and the LLM-extension scope) gets:
- a `queries()` entry: (spark, sf_dir) -> DataFrame, and
- an `oracle_sql()` entry: equivalent ANSI SQL for DuckDB on the same
  parquet fixtures (omitted only for genuinely non-SQL-expressible ops,
  which the driver then checks rows-only).

Column-name and value parity rules used throughout:
- every computed column is aliased identically on both sides;
- double-typed aggregates are rounded (ROUND(x, 2)) on both sides so
  floating-point summation order can't flip the value hash;
- timestamps compare as UTC-naive (session TZ pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their registration side effects. ORDER IS LOAD-BEARING:
    # the driver's correctness harness checks queries in registration order
    # up to a bounded count (50), so the reference-core families (demo,
    # streaming) register first. Since round 3 the registry holds exactly
    # 50 gates, ALL oracle-backed and all inside the checked window —
    # round 1 declared 71 and the driver checked only the first 50,
    # leaving the whole streaming family unchecked; same-row gates were
    # merged in round 2 and the last rows-only gate (ann_topk_variants)
    # was replaced by the fully oracle-backed ann_topk_methods in round 3
    # (mapping in SURVEY.md §9). Adding a 51st gate would push it outside
    # the window — merge into an existing same-row gate instead.
    from tutorial_apache_beam_spark.queries import (  # noqa: F401
        demo,
        streaming,
        relational,
        analytic,
        scalar,
        pandas_udfs,
        llm,
        sinks,
        similarity,
    )

    _LOADED = True
