#!/usr/bin/env python
"""Sample JVM thread stacks during the in-session mad_outlier slowdown
to name the framework cause (r7 judge items 2-3).
"""
from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_duckdb_spark.queries import catalog  # noqa: E402
from ai_duckdb_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
n_warm = int(os.environ.get("DIAG_WARMUP", "60"))

spark = get_spark(app_name="diag_stack")
sc = spark.sparkContext

jvm_pid = None
rt = sc._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean().getName()
jvm_pid = int(rt.split("@")[0])
print(f"jvm pid = {jvm_pid}", flush=True)

specs = [
    s
    for s in catalog.REGISTRY.values()
    if s.oracle is not None and not s.name.startswith("streaming_")
][:n_warm]
t0 = time.perf_counter()
for spec in specs:
    spec.builder(spark, sf_dir).toPandas()
print(f"warmed {len(specs)} entries in {time.perf_counter()-t0:.1f}s", flush=True)

samples: list[str] = []
stop = threading.Event()


def sampler() -> None:
    while not stop.is_set():
        try:
            out = subprocess.run(
                ["jstack", str(jvm_pid)], capture_output=True, text=True, timeout=10
            ).stdout
            samples.append(out)
        except Exception as e:  # noqa: BLE001
            samples.append(f"ERR {e}")
        time.sleep(0.25)


th = threading.Thread(target=sampler, daemon=True)
th.start()
spec = catalog.REGISTRY["mad_outlier_quantity"]
t0 = time.perf_counter()
spec.builder(spark, sf_dir).toPandas()
dt = time.perf_counter() - t0
stop.set()
th.join(timeout=5)
print(f"mad_outlier after warmup: {dt:.3f}s, {len(samples)} stack samples", flush=True)

# condense: for each sample, the top frames of RUNNABLE non-idle threads
hot: Counter[str] = Counter()
for s in samples:
    if s.startswith("ERR"):
        print(s)
        continue
    blocks = s.split("\n\n")
    for b in blocks:
        if "RUNNABLE" not in b:
            continue
        lines = [ln.strip() for ln in b.splitlines() if ln.strip().startswith("at ")]
        if not lines:
            continue
        head = b.splitlines()[0][:60]
        if any(
            idle in b
            for idle in (
                "epollWait",
                "SocketDispatcher.read",
                "park(",
                "accept0",
                "poll0",
            )
        ) and len(lines) < 4:
            continue
        hot[f"{head} :: {lines[0]}"] += 1
print("---- hot RUNNABLE (thread :: top frame) ----")
for k, v in hot.most_common(25):
    print(f"{v:3d}  {k}")

# also dump the full stack of the py4j execution thread from the middle sample
mid = samples[len(samples) // 2] if samples else ""
for b in mid.split("\n\n"):
    if "Execution" in b.splitlines()[0] if b.splitlines() else False:
        pass
print("---- full middle-sample threads mentioning spark/sql (top 12 frames) ----")
if mid and not mid.startswith("ERR"):
    for b in mid.split("\n\n"):
        lines = b.splitlines()
        if not lines:
            continue
        frames = [ln.strip() for ln in lines if ln.strip().startswith("at ")]
        if any("org.apache.spark.sql" in f for f in frames[:6]) and "RUNNABLE" in b:
            print(lines[0][:100])
            for f in frames[:12]:
                print("   ", f)
