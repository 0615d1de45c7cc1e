#!/usr/bin/env python
"""Quantify session-state bloat (r7 judge items 2-3): pinned RDD blocks
from un-unpersisted localCheckpoints + GC time growth across a
bench-shaped session, and the effect of clearing them.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_duckdb_spark.queries import catalog  # noqa: E402
from ai_duckdb_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
n_warm = int(os.environ.get("DIAG_WARMUP", "60"))

spark = get_spark(app_name="diag_bloat")
sc = spark.sparkContext


def gc_ms() -> float:
    beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def persistent_rdds():
    m = sc._jsc.getPersistentRDDs()
    return m


def storage_stats():
    m = persistent_rdds()
    return m.size()


def probe(tag: str) -> None:
    spec = catalog.REGISTRY["mad_outlier_quantity"]
    g0, t0 = gc_ms(), time.perf_counter()
    spec.builder(spark, sf_dir).toPandas()
    dt, dg = time.perf_counter() - t0, gc_ms() - g0
    print(
        f"{tag}: mad_outlier={dt:.3f}s gc_delta={dg:.0f}ms "
        f"pinned_rdds={storage_stats()} total_gc={gc_ms():.0f}ms",
        flush=True,
    )


probe("fresh-1")
probe("fresh-2")

specs = [
    s
    for s in catalog.REGISTRY.values()
    if s.oracle is not None and not s.name.startswith("streaming_")
][:n_warm]
t0 = time.perf_counter()
for spec in specs:
    spec.builder(spark, sf_dir).toPandas()
print(f"warmed {len(specs)} entries in {time.perf_counter()-t0:.1f}s", flush=True)

probe("after-warmup-1")
probe("after-warmup-2")

# now clear all pinned RDDs and re-probe
m = persistent_rdds()
it = m.values().iterator()
n = 0
while it.hasNext():
    it.next().unpersist()
    n += 1
print(f"unpersisted {n} pinned RDDs", flush=True)
time.sleep(2)

probe("after-clear-1")
probe("after-clear-2")
probe("after-clear-3")
