"""User-defined SQL functions (SURVEY.md §2.9 X2 — reference roadmap-only,
README.md:112 "自定义函数" unchecked; built here for real).

Registered as session SQL functions so NL→SQL output and ``spark.sql``
strings can call them. Two tiers, deliberately contrasted:

  * ``pandas_udf`` (Arrow-vectorized) — the only acceptable Python UDF
    shape in a hot path: columnar batches across the JVM↔Python
    boundary, ~10-100x faster than row-at-a-time;
  * plain JVM-side column expressions registered through the same SQL
    names are still preferred — a UDF is for logic Spark functions can't
    express. ``tok_count`` exists in both forms precisely so the bench
    and tests can show the equivalence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.LongType())
def tok_count_udf(text: pd.Series) -> pd.Series:
    """Whitespace token count, Arrow-vectorized."""
    return text.str.split(" ").str.len().astype("int64")


@F.pandas_udf(T.DoubleType())
def digit_ratio_udf(text: pd.Series) -> pd.Series:
    """Share of characters that are digits (a quality-score feature)."""
    total = text.str.len().clip(lower=1)
    return (text.str.count(r"[0-9]") / total).astype("float64")


def register_engine_udfs(spark: SparkSession) -> None:
    """Register the engine's SQL-callable functions on a session."""
    spark.udf.register("tok_count", tok_count_udf)
    spark.udf.register("digit_ratio", digit_ratio_udf)
