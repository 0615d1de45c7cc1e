"""Query catalog machinery.

A ``QuerySpec`` pairs a Spark DataFrame builder with an equivalent ANSI
SQL string a DuckDB oracle can run on the same parquet tables (the
driver's correctness gate, __spark_entry__ contract). Column names must
match between both sides — the harness sorts columns by name before
hashing values — so every computed column is aliased identically.

``oracle`` is None for operators whose semantics are not expressible in
portable SQL (approximate LSH bucketing, stateful streaming); the driver
then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: add a builder (with optional DuckDB oracle SQL) to the catalog."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


def spark_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
