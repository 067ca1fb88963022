"""Query registry — the engine's acceptance surface.

Each entry pairs a DataFrame-API implementation with an equivalent
ANSI-SQL oracle that DuckDB executes on the same parquet tables. The
driver hash-compares them at sf0.01 (CORRECTNESS_r{N}.json); bench
runs a subset at sf0.1. Names here map 1:1 to SURVEY.md §2 operator
ids (noted per query).

Implementations pull tables through :class:`~simple_etl_spark.engine.
Catalog` and compose functions from ``operators/`` / ``functions/`` /
``llm/`` — queries stay thin; the library does the work.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from simple_etl_spark.engine import Catalog


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs rows-only check
    survey: str = ""  # SURVEY.md §2 operator ids covered
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey: str = "", bench: bool = False):
    def deco(fn: Callable[[Catalog], DataFrame]):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(Catalog(spark, sf_dir))

        runner.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name, runner, oracle, survey, bench)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {n: s for n, s in REGISTRY.items() if s.bench}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import simple_etl_spark.operators.relational  # noqa: F401
    import simple_etl_spark.operators.medallion_queries  # noqa: F401
    import simple_etl_spark.llm.llm_queries  # noqa: F401
    import simple_etl_spark.streaming.stream_queries  # noqa: F401

    _LOADED = True
