"""Distributed as-of join (SURVEY.md §2.4 J5 — absent from the reference;
a standard time-series operator the promised query surface lacks).

Spark has no native ASOF JOIN. The union+window formulation below is the
shuffle-minimal distributed strategy:

    1. tag both inputs and align their schemas,
    2. union (no shuffle),
    3. one window over (keys..., ts, side-tag) carrying the right side's
       payload forward with last(..., ignoreNulls=True),
    4. keep only left rows.

One shuffle total (the window partitioning) vs. two for the
join-to-aggregated-subquery alternative; skew follows the key
distribution, which AQE handles. Equal timestamps match inclusively
(right row sorts before the left row at the same ts), the same semantics
as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` used as the oracle.

An ``applyInPandas``+``pd.merge_asof`` per-key variant would be simpler
but moves every row through Python; this stays entirely JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before it.

    Args:
        on: equi-join key columns (same names both sides).
        left_ts / right_ts: event-time columns.
        payload: {output_name: right_column} columns carried from the
            matched right row (NULL when no right row precedes).

    Returns all left columns plus the payload columns.
    """
    on = list(on)
    left_cols = left.columns

    tagged_left = left.select(
        *left_cols,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(out) for out, src in payload.items()],
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left_cols],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(src).alias(out) for out, src in payload.items()],
    )

    unioned = tagged_left.unionByName(tagged_right)
    # Right rows sort before left rows at equal ts → inclusive (ts >=) match.
    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__is_left",
        *[F.last(out, ignorenulls=True).over(w).alias(out) for out in payload],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
