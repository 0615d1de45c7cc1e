#!/usr/bin/env python
"""Diagnose the mad_outlier_quantity in-session slowdown (r7 judge
items 2-3): run a bench-shaped cold pass, then phase-time the entry.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ai_duckdb_spark.queries import catalog  # noqa: E402
from ai_duckdb_spark.session import get_spark  # noqa: E402
from ai_duckdb_spark.tables import load  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
n_warm = int(os.environ.get("DIAG_WARMUP", "60"))

spark = get_spark(app_name="diag_mad")


def phases(tag):
    t0 = time.perf_counter()
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("q")
    )
    counts = li.groupBy("flag", "q").agg(F.count("*").alias("c"))
    t1 = time.perf_counter()
    rows = counts.collect()
    t2 = time.perf_counter()
    out = [(r["flag"], 1.0, 1.0, 1, 2) for r in rows[:3]]
    df = spark.createDataFrame(
        out,
        schema="l_returnflag string, median_qty double, mad_qty double, "
        "n_outliers long, n_rows long",
    )
    t3 = time.perf_counter()
    df.toPandas()
    t4 = time.perf_counter()
    print(
        f"{tag}: plan={t1-t0:.3f} collect={t2-t1:.3f} "
        f"createDF={t3-t2:.3f} toPandas={t4-t3:.3f} total={t4-t0:.3f}",
        flush=True,
    )


phases("fresh-session-1")
phases("fresh-session-2")

specs = [
    s
    for s in catalog.REGISTRY.values()
    if s.oracle is not None and not s.name.startswith("streaming_")
][:n_warm]
t0 = time.perf_counter()
for spec in specs:
    spec.builder(spark, sf_dir).toPandas()
print(f"warmed {len(specs)} entries in {time.perf_counter()-t0:.1f}s", flush=True)

phases("after-warmup-1")
phases("after-warmup-2")
phases("after-warmup-3")
