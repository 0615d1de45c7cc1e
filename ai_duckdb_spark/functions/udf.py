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


# Chunking geometry shared by the UDTF and its oracle/tests: fixed-size
# token windows with overlap (stride < size), the context-window prep
# step for training/RAG ingestion. Emit a chunk at `start`, stop once it
# reaches the end of the doc (start + SIZE >= len) — never a trailing
# chunk wholly contained in the previous one.
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


class ChunkDocumentUDTF:
    """Python UDTF (X2, the table-function tier beyond scalar/grouped
    UDFs): one input row fans out to N chunk rows inside the Python
    worker — the shape for row-expanding logic built-ins can't express.
    Registered for SQL so it runs as a LATERAL correlated table function;
    executes per-partition with no shuffle (the fan-out is map-side,
    exactly like explode)."""

    def eval(self, doc_id, text: str):  # noqa: ANN001 - UDTF signature
        toks = text.split(" ")
        n = len(toks)
        start = idx = 0
        while True:
            yield doc_id, idx, min(CHUNK_SIZE, n - start)
            if start + CHUNK_SIZE >= n:
                break
            start += CHUNK_STRIDE
            idx += 1


def register_chunk_udtf(spark: SparkSession) -> None:
    """Register the chunking UDTF as SQL table function ``chunk_doc``."""
    chunk_udtf = F.udtf(
        ChunkDocumentUDTF,
        returnType="doc_id bigint, chunk_idx int, n_chunk_tokens int",
    )
    spark.udtf.register("chunk_doc", chunk_udtf)
