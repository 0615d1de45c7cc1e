"""Skew-handling primitives (SURVEY.md §4 partitioning/shuffle row).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the cases AQE can't:

  * ``salted_group_count`` — two-phase aggregation for a pathologically
    hot grouping key: spread each key over N salts, partially aggregate,
    then collapse. Exact for associative aggregates.
  * ``salted_broadcast_left_join`` — replicate the (small) right side N
    times so a hot left key's rows fan out over N tasks instead of one.

Salting trades one extra narrow stage for removing the single-task
straggler — at 1000 executors a key holding 10% of a 100 TB table is
the difference between minutes and hours.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform pseudo-random salt derived from a stable row hash (no rand():
    deterministic across retries, which matters for exactly-once sinks)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(num_salts)).cast("int")
    )


def salted_group_count(
    df: DataFrame, key: Column | str, num_salts: int = 16
) -> DataFrame:
    """COUNT per key with two-phase salted aggregation.

    Phase 1 shuffles on (key, salt) — hot keys split across num_salts
    reducers; phase 2 shuffles the tiny partial results on key alone.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df, num_salts)
    partial = salted.groupBy(key_col.alias("key"), F.col("__salt")).agg(
        F.count("*").alias("__partial")
    )
    return partial.groupBy("key").agg(F.sum("__partial").alias("n"))


def salted_broadcast_left_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
) -> DataFrame:
    """Left join where the left side has hot keys and right is broadcastable.

    The right side is exploded num_salts times with a salt column; the
    left side gets a matching deterministic salt, so the join key
    (on, salt) spreads hot keys across tasks. Results are identical to
    a plain left join.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    right_rep = right.select("*", salts)
    left_salted = with_salt(left, num_salts)
    joined = left_salted.join(
        F.broadcast(right_rep),
        on=[left_salted[on] == right_rep[on], left_salted["__salt"] == right_rep["__salt"]],
        how="left",
    )
    return joined.drop(right_rep[on]).drop(left_salted["__salt"]).drop(right_rep["__salt"])
