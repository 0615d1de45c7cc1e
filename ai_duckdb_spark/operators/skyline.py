"""Skyline (Pareto-dominance) operator.

Motivated by "Integration of Skyline Queries into Spark SQL" (EDBT 2023,
PAPERS.md): the skyline of a relation under (minimize x, maximize y) is
the set of rows not dominated by any other row — dominance meaning
no-worse in both dimensions and strictly better in at least one.

Distributed 2-D algorithm (shuffle-light, no O(n²) pair join):

  1. collapse to one candidate per x value (max y per x) — the skyline
     can only contain per-x maxima, and this groupBy is the only
     data-sized shuffle;
  2. over the (small) distinct-x set ordered by x ascending, compute the
     running max of y over STRICTLY cheaper x: a candidate survives iff
     its y strictly exceeds it (ties with equal x share survival);
  3. join survivors back to recover all tied originals.

The step-2 global window runs on distinct x values only — after the
step-1 reduction that is typically orders of magnitude smaller than the
input; for >2 dimensions swap step 2 for a local-skyline + merge pass.

The oracle/ground-truth formulation is the direct NOT EXISTS dominance
predicate (see queries/analytics_q.py) — quadratic but obviously
correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
) -> DataFrame:
    """Rows on the Pareto front of (minimize ``minimize``, maximize ``maximize``)."""
    per_x = df.groupBy(F.col(minimize).alias("__x")).agg(
        F.max(F.col(maximize)).alias("__grp_max")
    )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    candidates = per_x.withColumn("__cheaper_max", F.max("__grp_max").over(w)).filter(
        F.col("__cheaper_max").isNull() | (F.col("__grp_max") > F.col("__cheaper_max"))
    )
    return (
        df.join(
            candidates,
            (F.col(minimize) == F.col("__x")) & (F.col(maximize) == F.col("__grp_max")),
        )
        .drop("__x", "__grp_max", "__cheaper_max")
    )
