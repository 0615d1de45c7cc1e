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


def _centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    """The IVF model as a k-row relation — joined with a broadcast hint,
    it ships to executors like any dimension table. (Baking k×dim floats
    into literal expressions instead costs seconds of Catalyst
    analysis/codegen per plan and grows with k — measured 3-4× slower.)"""
    return spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cid int, cvec array<double>",
    )


def _nearest(
    df: DataFrame, id_col: str, vec_col: str, centroids_df: DataFrame, nprobe: int
) -> DataFrame:
    """Attach ``cid``/``crank`` (1 = nearest) for the ``nprobe`` nearest
    centroids of each row. Centroids are unit-normalized, so ranking by
    raw dot product is ranking by cosine (the row's own norm is constant
    across centroids). Broadcast cross join of k centroids per row, then
    a ranking window — ties break toward higher cid, deterministically.
    """
    scored = df.crossJoin(F.broadcast(centroids_df)).withColumn(
        "__csim", dot(F.col(vec_col), F.col("cvec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.desc("cid"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .drop("cvec", "__csim")
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iters: int = 5,
) -> list[list[float]]:
    """Deterministic spherical k-means coarse quantizer (IVF training).

    Lloyd's iterations as DataFrame jobs: assignment is a JVM fold
    against centroid literals, the update a posexplode + groupBy
    (cluster, dim) average — one narrow shuffle per iteration, linear in
    corpus size. Init = the ``n_clusters`` lowest-id vectors, so the
    model is reproducible across runs/engines with no RNG. Only k×dim
    centroid floats ever reach the driver; empty clusters keep their
    previous centroid.
    """
    vecs = (
        corpus.select(F.col(id_col).alias("__id"), _as_double(vec_col).alias("__raw"))
        .withColumn("__n", l2_norm(F.col("__raw")))
        .select("__id", F.transform("__raw", lambda x: x / F.col("__n")).alias("__v"))
    )
    init = vecs.orderBy("__id").limit(n_clusters).collect()
    centroids = [list(r["__v"]) for r in init]

    vecs = vecs.localCheckpoint()  # loop-invariant: scan once, not per iteration
    spark = corpus.sparkSession
    for _ in range(iters):
        assigned = _nearest(vecs, "__id", "__v", _centroids_df(spark, centroids), 1)
        rows = (
            assigned.select("cid", F.posexplode("__v").alias("__pos", "__val"))
            .groupBy("cid", "__pos")
            .agg(F.avg("__val").alias("__m"))
            .collect()
        )
        sums: dict[int, list[float]] = {}
        for r in rows:
            sums.setdefault(r["cid"], [0.0] * len(centroids[0]))[r["__pos"]] = r["__m"]
        for cid, mean in sums.items():
            norm = math.sqrt(sum(v * v for v in mean)) or 1.0
            centroids[cid] = [v / norm for v in mean]
    return centroids


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF index: spherical-k-means coarse
    quantizer, then exact cosine only against the ``nprobe`` nearest
    inverted lists per query.

    The candidate join is an equi-join on the cluster id — expected
    nprobe/n_clusters of the corpus per query instead of a full scan. At
    cluster scale the assigned corpus would be written partitioned by
    cluster id so a probe prunes to nprobe partitions at the parquet
    scan. Data-adaptive counterpart of the (data-oblivious) LSH tier:
    same output shape as both other tiers, recall pytest-checked against
    brute force.
    """
    spark = corpus.sparkSession
    if centroids is None:
        # index construction — in a deployed pipeline this runs once
        # offline (pass the persisted model via ``centroids`` to search)
        centroids = kmeans_centroids(corpus, id_col, vec_col, n_clusters, iters)
    centroids_df = _centroids_df(spark, centroids)
    c = _nearest(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cvec")
        ),
        "neighbor_id",
        "__cvec",
        centroids_df,
        1,
    ).withColumnRenamed("cid", "__cluster").drop("crank")
    q = _nearest(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qvec")
        ),
        "query_id",
        "__qvec",
        centroids_df,
        nprobe,
    ).withColumnRenamed("cid", "__cluster").drop("crank")
    scored = (
        c.join(F.broadcast(q), "__cluster")
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


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iters: int = 5,
) -> list[list[float]]:
    """Train and PERSIST an IVF index: centroids parquet + the assigned
    corpus partitioned by cluster id (sinks.write_partitioned layout).

    This is the offline half of IVF at scale — the corpus is laid out so
    a probe reads only its nprobe cluster directories (partition pruning
    at the parquet scan), instead of re-assigning the corpus per search
    call. Returns the trained centroids.
    """
    from ..sources.sinks import write_partitioned

    centroids = kmeans_centroids(corpus, id_col, vec_col, n_clusters, iters)
    spark = corpus.sparkSession
    assigned = _nearest(
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vec")),
        "neighbor_id",
        "vec",
        _centroids_df(spark, centroids),
        1,
    ).select("neighbor_id", "vec", "cid")
    write_partitioned(assigned, f"{path}/corpus", "cid")
    _centroids_df(spark, centroids).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def cosine_topk_ivf_persisted(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Search a persisted IVF index (build_ivf_index layout).

    The queries' nprobe cluster ids are resolved against the k×dim
    centroid relation (driver-side — a search request's query set is
    small by nature), then pushed as a STATIC ``cid IN (...)`` predicate
    so the parquet scan reads only those partition directories
    (PartitionFilters — plan-gated in tests/test_plans.py). Everything
    after the pruned scan is the usual bucket equi-join + exact rerank.
    """
    centroid_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = [list(r["cvec"]) for r in sorted(centroid_rows, key=lambda r: r["cid"])]
    centroids_df = _centroids_df(spark, centroids)

    q = _nearest(
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("__qvec")),
        "query_id",
        "__qvec",
        centroids_df,
        nprobe,
    ).withColumnRenamed("cid", "__cluster").drop("crank")
    probe_cids = sorted({r["__cluster"] for r in q.select("__cluster").distinct().collect()})

    corpus = (
        spark.read.parquet(f"{path}/corpus")
        .filter(F.col("cid").isin(probe_cids))  # static partition pruning
        .select("neighbor_id", F.col("vec").alias("__cvec"), F.col("cid").alias("__cluster"))
    )
    scored = (
        corpus.join(F.broadcast(q), "__cluster")
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


def nndescent_knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iters: int = 2,
    init_planes: int = 4,
) -> DataFrame:
    """Approximate k-NN GRAPH via distributed NN-Descent (Dong et al.,
    WWW'11 "Efficient K-Nearest Neighbor Graph Construction") — the
    graph-based ANN family (HNSW-class) next to the bucketing families
    (LSH = data-oblivious, IVF = data-adaptive): no bucket boundary
    exists, so recall does not degrade for vectors near partition edges.

    Construction, all DataFrame ops:
      1. init — random-hyperplane LSH buckets (the deterministic planes
         shared with the LSH tier) give first candidates; a hashed-ring
         edge per node guarantees no isolated nodes in sparse buckets;
      2. iterate — NN-Descent's local-join: each node proposes its
         neighbors to its neighbors (candidates = neighbor-of-neighbor
         over the UNDIRECTED current graph), candidates are scored
         exactly and the per-node top-k kept. Each sweep is one
         self-join shuffled by node id + one ranking window — O(n·k²)
         candidate pairs per sweep, never O(n²).

    Scale: the graph is n×k edges; every stage shuffles by node id, so
    the build is linear in corpus size for fixed k. The per-iteration
    result is localCheckpoint'ed — each sweep is one materialized step,
    not a growing lineage. Vectors are unit-normalized once, so scoring
    is a plain dot fold. Deterministic end-to-end (hyperplanes, xxhash64
    ring, id tie-breaks): stable across runs and engines.
    """
    vecs = (
        corpus.select(F.col(id_col).alias("__id"), _as_double(vec_col).alias("__raw"))
        .withColumn("__n", l2_norm(F.col("__raw")))
        .select("__id", F.transform("__raw", lambda x: x / F.col("__n")).alias("__v"))
        .localCheckpoint()  # loop-invariant: every sweep joins against it
    )
    dim = len(vecs.select("__v").first()["__v"])  # bounded driver read (1 row)
    planes = [hyperplane(j, dim) for j in range(init_planes)]

    bucketed = vecs.withColumn("__b", lsh_bucket(F.col("__v"), planes))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    init_pairs = a.join(
        b, (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__id") != F.col("b.__id"))
    ).select(F.col("a.__id").alias("u"), F.col("b.__id").alias("v"))
    # hashed ring: rank nodes by xxhash64(id) and link each to its
    # successor — a deterministic Hamiltonian cycle that keeps the graph
    # connected when an LSH bucket holds a single node. (Global window:
    # one pass over n (id, hash) PAIRS only, never vectors — fine at any
    # n that fits a sort.)
    ring_w = Window.orderBy(F.xxhash64(F.col("__id")), F.col("__id"))
    ringed = vecs.select("__id", F.lead("__id", 1).over(ring_w).alias("__next"))
    first_id = ringed.select(F.min_by("__id", F.xxhash64(F.col("__id"))).alias("f"))
    ring_pairs = (
        ringed.withColumn(
            "__next", F.coalesce(F.col("__next"), F.lit(first_id.first()["f"]))
        )
        .filter(F.col("__id") != F.col("__next"))
        .select(F.col("__id").alias("u"), F.col("__next").alias("v"))
    )
    edges = _rescore_topk(init_pairs.union(ring_pairs), vecs, k).localCheckpoint()

    for _ in range(iters):
        und = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        na, nb = und.alias("na"), und.alias("nb")
        non = (
            na.join(nb, F.col("na.v") == F.col("nb.u"))
            .select(F.col("na.u").alias("u"), F.col("nb.v").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        candidates = non.union(edges.select("u", "v"))
        edges = _rescore_topk(candidates, vecs, k).localCheckpoint()
    return edges.select(
        F.col("u").alias("node_id"),
        F.col("v").alias("neighbor_id"),
        "rank",
        F.round("similarity", 4).alias("similarity"),
    )


def _rescore_topk(pairs: DataFrame, vecs: DataFrame, k: int) -> DataFrame:
    """Exact-score deduped (u, v) pairs against unit vectors; keep each
    u's top-k by similarity (id tie-break). One shuffle per side join +
    one ranking window, all keyed by node id."""
    vu = vecs.select(F.col("__id").alias("u"), F.col("__v").alias("__vu"))
    vv = vecs.select(F.col("__id").alias("v"), F.col("__v").alias("__vv"))
    scored = (
        pairs.distinct()
        .join(vu, "u")
        .join(vv, "v")
        .withColumn("similarity", dot(F.col("__vu"), F.col("__vv")))
    )
    w = Window.partitionBy("u").orderBy(F.desc("similarity"), F.asc("v"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("u", "v", "rank", "similarity")
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
