"""Executed-plan introspection (SURVEY.md §4 — "iterate until it's the
plan you'd want").

Thin, dependency-free helpers over the plan string so tests and tooling
can gate on plan PROPERTIES (pushdown reached the scan, dims broadcast,
top-k avoided a global sort, shuffle count) instead of eyeballing
``explain()`` output. Used by tests/test_plans.py; also handy
interactively:

    >>> from ai_duckdb_spark.plans import plan_counts
    >>> plan_counts(df)["Exchange hashpartitioning"]
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: node markers worth counting when judging a plan
_DEFAULT_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "HashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "Window",
    "FileScan parquet",
)


def executed_plan(df: DataFrame, execute: bool = True) -> str:
    """Final physical plan string (post-AQE when ``execute``).

    Adaptive plans append an "== Initial Plan ==" section after
    execution; only the final section is returned so node counts are not
    doubled.
    """
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return plan.split("== Initial Plan ==")[0]


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (optimizedPlan stats), in bytes.

    Costs NO Spark job — the estimate comes from file footers with
    column pruning applied. Without CBO, filters do NOT shrink it, so a
    broadcast decision gated on this number is conservative in the safe
    direction: it refuses to broadcast a relation whose unfiltered scan
    is already too big, which is exactly the degradation wanted at
    100× data (q8's order-slice gate; cf. the cosine auto-strategy's
    rows×dim measure in operators/dedup.py).
    """
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # noqa: SLF001


def plan_counts(df: DataFrame, markers=_DEFAULT_MARKERS, execute: bool = True) -> dict[str, int]:
    plan = executed_plan(df, execute=execute)
    return {marker: plan.count(marker) for marker in markers}


def read_schema_columns(plan: str) -> list[str]:
    """Column names the parquet scan actually reads (pruning check).

    Parses every ReadSchema struct in the plan; note toString truncates
    very long schemas — absent columns are reliable evidence of pruning,
    the full list may not be complete.
    """
    cols: list[str] = []
    for match in re.finditer(r"ReadSchema: struct<([^>]*)", plan):
        cols.extend(part.split(":")[0].strip() for part in match.group(1).split(",") if part)
    return cols
