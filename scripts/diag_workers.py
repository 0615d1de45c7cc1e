#!/usr/bin/env python
"""Track Python daemon/worker processes across a bench-shaped session to
pin down whether the in-session slowdown is worker churn (respawn) or
busy/stuck reused workers (r7 judge items 2-3).
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


def py_procs() -> dict[int, str]:
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\x00", b" ").decode(errors="replace").strip()
        except OSError:
            continue
        if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            out[int(pid)] = cmd[:60]
    return out


def diff(tag: str, before: dict[int, str], after: dict[int, str]) -> None:
    born = {p: c for p, c in after.items() if p not in before}
    died = {p: c for p, c in before.items() if p not in after}
    print(
        f"{tag}: n={len(after)} born={len(born)} died={len(died)}"
        + (f" born_pids={sorted(born)[:6]}" if born else "")
        + (f" died_pids={sorted(died)[:6]}" if died else ""),
        flush=True,
    )


spark = get_spark(app_name="diag_workers")


def probe(tag: str) -> None:
    spec = catalog.REGISTRY["mad_outlier_quantity"]
    b = py_procs()
    t0 = time.perf_counter()
    spec.builder(spark, sf_dir).toPandas()
    dt = time.perf_counter() - t0
    a = py_procs()
    print(f"{tag}: mad_outlier={dt:.3f}s", flush=True)
    diff(f"{tag} procs", b, a)


probe("fresh-1")
probe("fresh-2")

specs = [
    s
    for s in catalog.REGISTRY.values()
    if s.oracle is not None and not s.name.startswith("streaming_")
][:n_warm]
snap = py_procs()
t0 = time.perf_counter()
born_total = died_total = 0
for i, spec in enumerate(specs):
    spec.builder(spark, sf_dir).toPandas()
    cur = py_procs()
    born = [p for p in cur if p not in snap]
    died = [p for p in snap if p not in cur]
    born_total += len(born)
    died_total += len(died)
    if born or died:
        print(
            f"  warm[{i}] {spec.name}: born={len(born)} died={len(died)} n={len(cur)}",
            flush=True,
        )
    snap = cur
print(
    f"warmed {len(specs)} entries in {time.perf_counter()-t0:.1f}s; "
    f"total born={born_total} died={died_total}",
    flush=True,
)

probe("after-warmup-1")
probe("after-warmup-2")
probe("after-warmup-3")
