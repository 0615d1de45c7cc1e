#!/usr/bin/env python
"""Positively confirm (or refute) the r8 "in-rotation re-warm" hypothesis
for dedup_prefix_jaccard_pairs (r8 judge "What's wrong" item 1).

Background: the entry reads ~5.6 s standalone but 24.6 s when timed after
~180 other catalog entries in the same session, with IDENTICAL job
counts. r8's A/B scripts excluded janino recompilation, storage-pool
pressure, and JVM code-cache flushing; the surviving hypothesis —
HotSpot deoptimizing / re-profiling generated-code call sites once
hundreds of generated classes have cycled through the same framework
paths — was argued only by elimination. This script demonstrates it (or
not) directly from the JIT's own event log.

Method: run the SAME session twice in separate processes with
``-XX:+UnlockDiagnosticVMOptions -XX:+LogCompilation -XX:LogFile=...``:

    standalone:  warm-up probe, then the entry x3
    rotation:    run the first ROTATION_N oracle catalog entries once
                 (bench.py's pass shape), then the entry x3

For each timed entry run we record the JVM uptime window
(RuntimeMXBean.getUptime) and afterwards bucket the hotspot log's
<task ...> compilations and <uncommon_trap>/<deoptimized> events whose
``stamp`` falls inside each window. If the hypothesis is right, the
rotation run's FIRST entry window shows a burst of C2 recompilations /
deopts of GeneratedClass$GeneratedIterator methods that the standalone
run's windows do not have.

Usage:  python scripts/diag_jit_rewarm.py standalone | rotation
        python scripts/diag_jit_rewarm.py analyze /tmp/jit_standalone.log /tmp/jit_rotation.log
Writes /tmp/jit_<mode>.log (hotspot XML) and /tmp/jit_<mode>.json
(entry timings + uptime windows).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

ENTRY = "dedup_prefix_jaccard_pairs"
ROTATION_N = 120  # enough generated-class churn to reproduce; < full 180 for runtime


def run_mode(mode: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ai_duckdb_spark.queries import catalog
    from ai_duckdb_spark.session import get_spark

    log = f"/tmp/jit_{mode}.log"
    # JIT_EXTRA_FLAGS lets the mitigation experiment run the same
    # harness under candidate flags (e.g. -XX:TypeProfileWidth=8)
    extra_flags = os.environ.get("JIT_EXTRA_FLAGS", "")
    spark = get_spark(
        app_name=f"jit_{mode}",
        extra_conf={
            "spark.driver.extraJavaOptions": (
                "-XX:+UnlockDiagnosticVMOptions -XX:+LogCompilation "
                f"-XX:LogFile={log} {extra_flags}"
            ).strip()
        },
    )
    rt = spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def uptime() -> float:
        return rt.getUptime() / 1000.0

    out: dict = {"mode": mode, "rotation": [], "entry_runs": []}
    specs = [s for s in catalog.REGISTRY.values() if s.oracle is not None]
    if mode == "rotation":
        t0 = time.perf_counter()
        for spec in specs[:ROTATION_N]:
            if spec.name == ENTRY:
                continue
            spec.builder(spark, sf_dir).toPandas()
        out["rotation"] = [ROTATION_N, round(time.perf_counter() - t0, 1)]
    else:
        # match bench.py's session warm-up floor without the rotation
        catalog.REGISTRY["string_funcs_part"].builder(spark, sf_dir).toPandas()

    spec = catalog.REGISTRY[ENTRY]
    for i in range(3):
        u0, t0 = uptime(), time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        el, u1 = time.perf_counter() - t0, uptime()
        out["entry_runs"].append({"run": i, "sec": round(el, 2), "u0": u0, "u1": u1})
        print(f"{mode} run {i}: {el:.2f}s (uptime {u0:.1f}-{u1:.1f})", flush=True)
    with open(f"/tmp/jit_{mode}.json", "w") as fh:
        json.dump(out, fh)
    spark.stop()


_TASK = re.compile(r"<task compile_id='(\d+)'[^>]*method='([^']*)'[^>]*stamp='([0-9.]+)'")
_NOT_ENTRANT = re.compile(r"<make_not_entrant[^>]*compile_id='(\d+)'[^>]*stamp='([0-9.]+)'")
_TRAP = re.compile(r"<uncommon_trap thread[^>]*reason='([^']*)'[^>]*stamp='([0-9.]+)'")


def analyze(paths: list[str]) -> None:
    for path in paths:
        mode = "rotation" if "rotation" in path else "standalone"
        with open(f"/tmp/jit_{mode}.json") as fh:
            meta = json.load(fh)
        with open(path, errors="replace") as fh:
            text = fh.read()
        tasks = [(float(m[3]), m[2]) for m in _TASK.finditer(text)]
        nents = [(float(m[2]),) for m in _NOT_ENTRANT.finditer(text)]
        id_to_method = {m[1]: m[2] for m in _TASK.finditer(text)}
        print(f"\n== {mode}: {len(tasks)} compile tasks, {len(nents)} made-not-entrant total")
        for run in meta["entry_runs"]:
            u0, u1 = run["u0"], run["u1"]
            in_win = [t for t in tasks if u0 <= t[0] <= u1]
            gen = [t for t in in_win if "GeneratedClass" in t[1] or "generated" in t[1]]
            ne_win = [m for m in _NOT_ENTRANT.finditer(text) if u0 <= float(m[2]) <= u1]
            ne_gen = [
                m for m in ne_win
                if "GeneratedClass" in id_to_method.get(m[1], "")
                or "generated" in id_to_method.get(m[1], "")
            ]
            traps = [m for m in _TRAP.finditer(text) if u0 <= float(m[2]) <= u1]
            print(
                f"  run {run['run']}: {run['sec']}s | compiles in-window: "
                f"{len(in_win)} (generated-code: {len(gen)}) | "
                f"made-not-entrant: {len(ne_win)} (generated: {len(ne_gen)}) | "
                f"uncommon traps: {len(traps)}"
            )
            top = {}
            for _, meth in gen:
                top[meth] = top.get(meth, 0) + 1
            for meth, n in sorted(top.items(), key=lambda kv: -kv[1])[:5]:
                print(f"      {n}x {meth}")


if __name__ == "__main__":
    if sys.argv[1] == "analyze":
        analyze(sys.argv[2:])
    else:
        run_mode(sys.argv[1])
