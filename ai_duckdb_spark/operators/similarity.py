"""Vector similarity search (SURVEY.md §2.9 X7 [D] — north-star scope).

Two tiers over an ``array<float>`` embedding column:

  * brute-force cosine top-k — exact baseline. Queries are broadcast
    (k queries × full scan of the corpus); per-pair math is a JVM-side
    ``zip_with`` + ``aggregate`` fold in double precision (no Python, no
    UDF). Top-k per query is a ranking window over (query, similarity).
  * random-hyperplane LSH — the scale path: hash every vector to a
    bit-bucket with J fixed hyperplanes; only same-bucket candidates get
    exact scoring. Corpus bucketing is one narrow projection; the
    candidate join is an equi-join on the bucket id instead of a cross
    join, turning O(N×Q) into O(N×Q/2^J) expected comparisons.

Hyperplanes are deterministic (seeded by plane/dim index via math.sin) so
results are stable across runs and executors without shipping state.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Double-precision dot product of two array columns (JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, similarity). Self-matches are
    excluded. Ties break on neighbor id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cvec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qvec"))

    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "similarity",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (l2_norm(F.col("__qvec")) * l2_norm(F.col("__cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("similarity", 4).alias("similarity"))
    )


def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (unit-free; only sign matters)."""
    return [math.sin((plane + 1) * 1000003 + i * 7919) for i in range(dim)]


def lsh_bucket(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Bit-bucket id: bit j = sign(vec · plane_j)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_planes: int = 4,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    with multi-probe expansion (also probe buckets within hamming
    ``probe_radius`` of the query's — boundary-crossing neighbors are the
    dominant recall loss for hyperplane LSH on high-angle corpora).

    Recall < 1 by construction (that is the point: at 100 TB the bucket
    equi-join replaces the corpus-wide scan per query). Same output shape
    as the brute-force tier so both are drop-in comparable. Expected
    candidate fraction ≈ (1 + planes·radius) / 2^planes of the corpus.
    """
    planes = [hyperplane(j, dim) for j in range(num_planes)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cvec")
    ).withColumn("__bucket", lsh_bucket(F.col("__cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qvec")
    ).withColumn("__bucket", lsh_bucket(F.col("__qvec"), planes))
    if probe_radius >= 1:
        probes = F.array(
            F.col("__bucket"),
            *[F.col("__bucket").bitwiseXOR(F.lit(1 << j)) for j in range(num_planes)],
        )
        q = q.withColumn("__bucket", F.explode(probes))

    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # multi-probe can surface the same candidate from several buckets
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "similarity",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (l2_norm(F.col("__qvec")) * l2_norm(F.col("__cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("similarity", 4).alias("similarity"))
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid, one row per (label, dimension).

    posexplode + groupBy(label, pos) — a single shuffle keyed on
    (label, dim), which scales linearly in corpus size.
    """
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(_as_double(vec_col)).alias("pos", "val"),
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid_val"))
        .withColumn("pos", (F.col("pos") + 1).cast("long"))
    )
