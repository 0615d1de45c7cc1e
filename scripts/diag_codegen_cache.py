#!/usr/bin/env python
"""Prove/refute codegen-cache thrash as the in-bench heavy-entry
slowdown: count janino compilations during a warm re-run of the
heaviest HOF entry after N other entries evicted the 100-entry cache.

Usage: CODEGEN_CACHE=2000 python scripts/diag_codegen_cache.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_duckdb_spark.queries import catalog  # noqa: E402
from ai_duckdb_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cache = os.environ.get("CODEGEN_CACHE")
extra = {"spark.sql.codegen.cache.maxEntries": cache} if cache else {}
spark = get_spark(app_name=f"diag_codegen_{cache or 'default'}", extra_conf=extra)
sc = spark.sparkContext
print("codegen cache:", spark.conf.get("spark.sql.codegen.cache.maxEntries"), flush=True)

cm = sc._jvm.org.apache.spark.metrics.source.CodegenMetrics


def compilations() -> int:
    return cm.METRIC_COMPILATION_TIME().getCount()


def probe(tag: str, reps: int = 3) -> None:
    spec = catalog.REGISTRY["dedup_prefix_jaccard_pairs"]
    for r in range(reps):
        c0 = compilations()
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        print(
            f"{tag}[{r}]: prefix={time.perf_counter()-t0:.2f}s "
            f"compilations={compilations()-c0}",
            flush=True,
        )


probe("fresh", reps=2)

specs = [
    s
    for s in catalog.REGISTRY.values()
    if s.oracle is not None and not s.name.startswith("streaming_")
]
specs = [s for s in specs if s.name != "dedup_prefix_jaccard_pairs"][:60]
t0 = time.perf_counter()
c0 = compilations()
for spec in specs:
    spec.builder(spark, sf_dir).toPandas()
print(
    f"warmed 60 entries in {time.perf_counter()-t0:.1f}s "
    f"(+{compilations()-c0} compilations)",
    flush=True,
)

probe("after-60-entries", reps=3)
