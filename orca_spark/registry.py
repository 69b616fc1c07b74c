"""Query registry: the single source of truth for the engine's surface.

Every operator the engine claims (SURVEY.md §2 + the LLM-pipeline
extensions) registers here with:

* ``fn(spark, sf_dir) → DataFrame`` — the Spark implementation, and
* ``oracle`` — an equivalent ANSI-SQL string DuckDB can execute on the
  same parquet tables (``None`` for genuinely non-SQL-expressible ops,
  which get a weaker rows-only check).

Column names/aliases MUST match between fn and oracle — the correctness
harness hash-compares values after sorting columns by name. Floating
aggregates are rounded on BOTH sides so the engines' different
summation orders can't flip the last ulp.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator: add a query/operator to the engine surface."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, description=description)
        return fn

    return deco
