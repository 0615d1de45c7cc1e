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


def capped_session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    cap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Session stats under a maximum-DURATION cap on top of the max-gap
    rule: each gap session is sliced into fixed ``cap_seconds``-wide
    sub-sessions measured from the gap session's first event
    (``floor(elapsed / cap)``). Cap-width slicing — NOT "restart the
    clock at the first event past the cap", which is inherently
    sequential — keeps the operator one window pass, deterministic, and
    bit-identical to the SQL formulation (all integer millisecond math).
    Sessions that bound state are what keep streaming/session analytics
    tractable: an unbounded-duration session is unbounded state.

    Scale shape: the same single window shuffle on the entity key as
    gap sessionization (the sub-session index is derived from a min
    OVER the same partition spec, so Catalyst reuses the sort), then
    two tiny aggregates over (key, session, sub) groups."""
    sessions = assign_sessions(df, key, ts, gap_seconds, tiebreak)
    w_sess = Window.partitionBy(key, "session_seq")
    start_ms = F.min(F.unix_millis(F.col(ts))).over(w_sess)
    sliced = sessions.withColumn(
        "sub_seq",
        ((F.unix_millis(F.col(ts)) - start_ms) / F.lit(cap_seconds * 1000))
        .cast("long"),
    )
    per_sub = sliced.groupBy(key, "session_seq", "sub_seq").agg(
        F.count("*").alias("n_events"),
        (
            (F.max(F.unix_millis(F.col(ts))) - F.min(F.unix_millis(F.col(ts)))) / 1000.0
        ).alias("duration_s"),
    )
    return per_sub.groupBy(key).agg(
        F.count("*").cast("long").alias("n_capped_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.max("duration_s").alias("max_session_duration_s"),
        F.sum("n_events").cast("long").alias("n_total_events"),
    )
