"""Registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2 inventory + the
LLM-pipeline extension set) registers here; the driver runs the Spark
side and the oracle side-by-side at sf0.01 and hash-compares.

Contract details that matter:
* Column names must match between Spark result and oracle SQL — alias
  every computed column on BOTH sides.
* Oracle may be None for genuinely non-SQL-expressible ops (streaming,
  iterative); the driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from mapreduce_implementation_spark.caching import release_caches

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False  # include in bench.py
    doc: str = ""
    tables: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tables: tuple[str, ...] = (),
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release the PREVIOUS query's tracked caches — by the time
            # the next query starts, the prior consumer has collected,
            # so a 50-query driver sweep holds at most one query's
            # cached blocks at a time.
            release_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(
            name=name,
            fn=wrapped,
            oracle=oracle,
            headline=headline,
            doc=(fn.__doc__ or "").strip(),
            tables=tables,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}


def headline_queries() -> dict[str, Query]:
    return {n: q for n, q in _REGISTRY.items() if q.headline}
