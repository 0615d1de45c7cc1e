"""Cross-engine exact aggregation of fixed-point measures.

Why this exists: the driver's correctness gate hash-compares our results
against a DuckDB oracle. Double-precision SUM/AVG are order-dependent, and
engines also disagree on how to round doubles (JVM shortest-repr
BigDecimal HALF_UP vs C multiply-and-round), so ``round(sum(x), 2)`` can
legitimately differ in the last digit between two correct engines.

The fix is the one real engines use for money: aggregate in an EXACT
domain. Fixture measures are fixed-point decimals (2-decimal money,
2-decimal rates — verified against the parquet data), so:

    per-row:  round(expr, s)        -- exact: expr's true value has <= s
                                       decimals, both engines land on the
                                       identical nearest double
    cast:     DECIMAL(28, s)        -- exact fixed-point
    sum:      DECIMAL arithmetic    -- exact, order-free, no overflow at
                                       any realistic scale (28 digits)
    output:   CAST(... AS DOUBLE)   -- same decimal -> same double bits

AVG is the exact decimal sum divided by the exact count — one IEEE
division of identical operands, hence identical bits on both sides.

Corollary used throughout the query catalog: never re-round a value that
is already bit-identical across engines (integer ratios, exact-decimal
division results, min/max passthroughs) — final rounding is what CREATES
divergence, not what prevents it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2) -> Column:
    """Exact fixed-point view of a measure with <= ``scale`` true decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale).cast(f"decimal(28,{scale})")


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-free exact SUM, returned as double (bit-identical cross-engine).

    DuckDB oracle mirror::

        CAST(sum(CAST(round(expr, s) AS DECIMAL(28, s))) AS DOUBLE)
    """
    return F.sum(dec(col, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Exact AVG: decimal sum / non-null count, one IEEE division.

    DuckDB oracle mirror::

        CAST(sum(CAST(round(expr, s) AS DECIMAL(28, s))) AS DOUBLE) / count(expr)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def sum_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-side mirror of :func:`exact_sum` (for oracle strings)."""
    return f"CAST(sum(CAST(round({expr}, {scale}) AS DECIMAL(28,{scale}))) AS DOUBLE)"


def avg_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-side mirror of :func:`exact_avg` (for oracle strings)."""
    return f"{sum_sql(expr, scale)} / count({expr})"
