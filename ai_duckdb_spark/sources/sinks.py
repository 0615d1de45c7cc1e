"""Durable sinks (SURVEY.md §2.2 K1 durable variant) — partitioned and
bucketed writes, and the co-located join they buy.

The reference's only sink is a per-file DuckDB CTAS (doc.py:117-119).
At cluster scale the equivalents are:

  * ``write_partitioned`` — parquet partitioned by a column: partition
    PRUNING at read time (a date filter skips whole directories);
  * ``write_bucketed`` — ``bucketBy`` managed tables: two tables
    bucketed on the same key join WITHOUT a shuffle on either side —
    the 100 TB answer to "this join shuffles both facts every night".

Bucketed tables need a metastore-backed ``saveAsTable``; callers own
warehouse configuration (tests use a temp warehouse dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    """Parquet partitioned by a (low-cardinality) column for pruning."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the second columnar format Spark ships natively.

    Same pushdown/pruning machinery as parquet (ORC predicate pushdown +
    column pruning are on by default); useful when the downstream
    consumer is Hive/Trino-side ORC tooling rather than parquet."""
    df.write.mode(mode).orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally sorted) managed table.

    Joins/aggregations on ``bucket_col`` between tables bucketed the
    same way are planned WITHOUT an Exchange on the bucketed sides.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(spark, src: str, dst: str, target_files: int) -> None:
    """Small-file compaction — the maintenance pass every long-lived
    100 TB table needs (streaming ingest and fine partitioning strand
    thousands of KB-scale files; each costs a task + an open/footer
    read, so scan latency degrades linearly in file COUNT, not bytes).

    ``coalesce`` not ``repartition``: target_files output splits are
    glued from existing ones map-side — zero shuffle, the rewrite is
    pure sequential IO. At scale, derive ``target_files`` from directory
    bytes / desired file size (128-512 MB); compaction never changes a
    row, which is exactly what the oracle-checked round trip proves."""
    spark.read.parquet(src).coalesce(target_files).write.mode("overwrite").parquet(dst)
