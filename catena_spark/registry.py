"""Query registry backing the driver contract in __spark_entry__.py.

Each operator family registers its driver-checked queries here with a
``@query(...)`` decorator; __spark_entry__.py just re-exports the two
dicts. A spec without ``oracle`` SQL is a rows-only check (the driver's
weaker gate for non-SQL-expressible ops, __spark_entry__.py:35-36).

SURVEY.md §2's *key* column is the registry key namespace.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    section: str  # SURVEY.md §2 row id, e.g. "D7"


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, section: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable as a driver query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, section)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import llm, multimodal, relational, timeseries  # noqa: F401
    from .streaming import ops  # noqa: F401


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {k: s.fn for k, s in specs().items()}


def oracles() -> dict[str, str]:
    return {k: s.oracle for k, s in specs().items() if s.oracle is not None}
