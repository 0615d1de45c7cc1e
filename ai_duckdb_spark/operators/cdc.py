"""SCD2 / CDC merge emulation (pyspark guide "CDC / SCD2" row: MERGE INTO
needs Delta; in plain Spark emulate with anti-join + union + window).

``apply_scd2_changes`` folds a change batch into a slowly-changing-
dimension snapshot:

  * every change row opens a new CURRENT version (valid_from = change ts,
    valid_to = NULL, is_current = true);
  * the previously-current version of a changed key is closed
    (valid_to = change ts, is_current = false);
  * unchanged keys pass through untouched.

Pure DataFrame composition: one join of the snapshot against the (small,
broadcastable) change batch plus a union — no driver loops, no Delta
dependency. With Delta/Iceberg on the classpath the same contract maps
to a single MERGE INTO; this operator is the portable fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_scd2_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Return the new SCD2 snapshot after applying one change batch.

    ``snapshot`` columns: key, attributes..., valid_from, valid_to,
    is_current. ``changes`` columns: key, attributes..., ts_col.
    One change row per key per batch (dedupe upstream with
    latest-per-group if needed).

    ``broadcast_changes`` fits the normal CDC regime (a small tick
    against a big dimension). Pass False for bulk backfills where the
    batch rivals the snapshot — the joins then shuffle on the key, which
    is the plan that survives at scale.
    """
    attr_cols = [c for c in changes.columns if c not in (key, ts_col)]

    changed_keys = changes.select(key, F.col(ts_col).alias("__close_ts"))
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)

    # ONE pass over the snapshot: a left join marks changed keys, and a
    # conditional update closes their currently-open version in place.
    # (The equivalent inner+anti+semi composition reads the snapshot
    # three times — each DataFrame reference re-runs its lineage, which
    # at scale means three scans of the big side instead of one.)
    close_ts = F.col("__close_ts")
    updated = (
        snapshot.join(changed_keys, key, "left")
        .withColumn(
            valid_to,
            F.when(F.col(current_flag) & close_ts.isNotNull(), close_ts).otherwise(
                F.col(valid_to)
            ),
        )
        .withColumn(
            current_flag,
            F.when(close_ts.isNotNull(), F.lit(False)).otherwise(F.col(current_flag)),
        )
        .drop("__close_ts")
    )
    # open new current versions from the change rows
    opened = changes.select(
        key,
        *attr_cols,
        F.col(ts_col).alias(valid_from),
        F.lit(None).cast(snapshot.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return updated.unionByName(opened)
