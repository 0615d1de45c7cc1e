#!/usr/bin/env python
"""Correlate in-session slowdown of the heaviest shuffle entry with
storage-pool occupancy from un-cleaned localCheckpoint blocks.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_duckdb_spark.queries import catalog  # noqa: E402
from ai_duckdb_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="diag_storage")
sc = spark.sparkContext


def storage_mb() -> float:
    env = sc._jvm.org.apache.spark.SparkEnv.get()
    return env.memoryManager().storageMemoryUsed() / (1 << 20)


def pinned() -> int:
    return sc._jsc.getPersistentRDDs().size()


def probe(tag: str, reps: int = 2) -> None:
    spec = catalog.REGISTRY["dedup_prefix_jaccard_pairs"]
    for r in range(reps):
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        print(
            f"{tag}[{r}]: prefix={time.perf_counter()-t0:.2f}s "
            f"storage={storage_mb():.0f}MB pinned={pinned()}",
            flush=True,
        )


probe("fresh")

specs = [
    s
    for s in catalog.REGISTRY.values()
    if s.oracle is not None and not s.name.startswith("streaming_")
][:30]
t0 = time.perf_counter()
for spec in specs:
    spec.builder(spark, sf_dir).toPandas()
print(
    f"warmed 30 entries in {time.perf_counter()-t0:.1f}s "
    f"storage={storage_mb():.0f}MB pinned={pinned()}",
    flush=True,
)

probe("after-warmup", reps=3)

sc._jvm.java.lang.System.gc()
time.sleep(3)
print(f"after System.gc: storage={storage_mb():.0f}MB pinned={pinned()}", flush=True)
probe("after-gc", reps=2)
