"""Embedding quantization (int8 symmetric, per-vector scale).

Training-data pipelines quantize float32 embeddings to int8 before
building ANN indexes or shipping corpora — 4x smaller shuffle/storage
and most similarity search tolerates the precision loss. The reference
engine's vector surface (SURVEY.md §2.9) stops at exact float math;
this is the beyond-exact scale path.

Exactness contract (driver oracle): every step is deterministic double
arithmetic mirrored verbatim by the DuckDB oracle SQL —
``floor(x/scale + 0.5)`` round-half-up (identical operand bits on both
engines → identical results), per-vector max via order-free
``array_max``, never an order-dependent float SUM. See
functions/exact.py for the doctrine.

Scale shape: pure per-row higher-order column expressions — no shuffle,
no UDF, whole-stage codegen end to end; at 100 TB this is a map-only
pass bounded by scan+write bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: Column) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def int8_scale(vec_col: Column) -> Column:
    """Per-vector symmetric scale: max(|x|)/127 (0.0 for a zero vector)."""
    return F.array_max(F.transform(_as_double(vec_col), F.abs)) / F.lit(127.0)


def quantize_int8(vec_col: Column, scale_col: Column) -> Column:
    """Round-half-up int8 codes; a zero scale (zero vector) maps to zeros.

    |x| <= max|x| = 127*scale guarantees the codes land in [-127, 127],
    so no clipping branch is needed (and the oracle needs none either).
    """
    return F.when(scale_col == 0.0, F.transform(vec_col, lambda x: F.lit(0))).otherwise(
        F.transform(
            _as_double(vec_col),
            lambda x: F.floor(x / scale_col + F.lit(0.5)).cast("int"),
        )
    )


def max_reconstruction_error(vec_col: Column, scale_col: Column) -> Column:
    """Order-free max over |dequant(quant(x)) - x| (0.0 for zero vectors).

    The bound is scale/2 (half a quantization step); surfacing the max
    rather than a float mean keeps the metric exactly reproducible on
    any engine and any row order.
    """
    return F.when(scale_col == 0.0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                _as_double(vec_col),
                lambda x: F.abs(F.floor(x / scale_col + F.lit(0.5)) * scale_col - x),
            )
        )
    )


def quantization_report(
    df: DataFrame, vec_col: str = "embedding", id_cols: tuple[str, ...] = ("vec_id",)
) -> DataFrame:
    """Per-vector quantization metrics: scale + worst reconstruction error."""
    scale = int8_scale(F.col(vec_col)).alias("scale")
    out = df.select(*id_cols, F.col(vec_col), scale)
    return out.select(
        *id_cols,
        "scale",
        max_reconstruction_error(F.col(vec_col), F.col("scale")).alias("max_err"),
    )
