"""Gap-based sessionization (SURVEY.md §2.9 X1 batch form).

Classic lag + cumulative-sum formulation: a session break is a gap above
the threshold; the running count of breaks numbers the sessions. One
window shuffle on the entity key, fully JVM-side, identical semantics to
the SQL oracle (and to Structured Streaming's ``session_window`` for
batch-complete data — the streaming variant lives in
ai_duckdb_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add a ``session_seq`` column (1-based per key) using a max-gap rule.

    A new session starts when the time since the previous event of the
    same key exceeds ``gap_seconds`` (or at the first event).
    ``tiebreak`` makes ordering total when timestamps can collide.
    """
    order_cols = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w_order = Window.partitionBy(key).orderBy(*order_cols)
    w_running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_ts = F.lag(ts).over(w_order)
    gap_ms = F.unix_millis(F.col(ts)) - F.unix_millis(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_ms > gap_seconds * 1000), 1).otherwise(0)

    return df.withColumn("__new_session", is_new).withColumn(
        "session_seq", F.sum("__new_session").over(w_running).cast("long")
    ).drop("__new_session")


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key session statistics: session count and mean session size."""
    sessions = assign_sessions(df, key, ts, gap_seconds, tiebreak)
    per_session = sessions.groupBy(key, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )
    return per_session.groupBy(key).agg(
        F.max("session_seq").alias("n_sessions"),
        F.avg("n_events").alias("avg_session_events"),
        F.sum("n_events").alias("n_total_events"),
    )
