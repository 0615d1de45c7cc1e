"""Count-Min sketch (Cormode & Muthukrishnan 2005, "An Improved Data
Stream Summary: The Count-Min Sketch and its Applications") — the
frequency-estimation companion to the HLL distinct sketch
(hll_sketch_users): a depth×width integer table whose per-row-hash
minimum upper-bounds any item's true count.

Why it matters at 100 TB: the sketch is MERGEABLE (cell-wise sum), so
per-partition / per-day sketches aggregate without re-scanning raw
data, and the table is O(depth·width) however many distinct tokens the
corpus holds — the state story exact counting cannot offer. The
classic guarantee: with width w and depth d, the estimate exceeds the
true count by more than 2N/w with probability at most (1/2)^d
(N = total stream length).

Everything is deterministic (xxhash64 with fixed per-row seeds), so
sketch contents are reproducible across runs and executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch table (d, bucket, cnt) from an item stream.

    One transform fans each item to its ``depth`` (row, bucket) cells
    map-side; the only shuffle is the (d, bucket)-keyed count — at most
    depth × width groups regardless of corpus size. Bucket row d uses
    xxhash64(item, d) so the d hash functions are independent draws of
    the same family.
    """
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda d: F.struct(
            d.cast("int").alias("d"),
            F.pmod(F.xxhash64(F.col(item_col), d), F.lit(width))
            .cast("int")
            .alias("bucket"),
        ),
    )
    return (
        items.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each candidate item: the estimate is
    the MINIMUM of the item's ``depth`` cell counts.

    The sketch (depth×width rows) broadcasts; the candidate side fans
    to its cells map-side and a candidate-keyed min closes the query.
    Output: candidates + ``cms_estimate`` (BIGINT, >= true count).
    """
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda d: F.struct(
            d.cast("int").alias("d"),
            F.pmod(F.xxhash64(F.col(item_col), d), F.lit(width))
            .cast("int")
            .alias("bucket"),
        ),
    )
    fanned = candidates.select(
        F.col(item_col), F.explode(cells).alias("c")
    ).select(item_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        fanned.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
