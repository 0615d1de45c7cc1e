#!/usr/bin/env python
"""Benchmark the query catalog at $SPARK_GRAFT_SF_DIR (default sf0.1).

Protocol (BASELINE.md): warm measurement — one JIT warm-up action first,
then each headline query timed build→collect. Prints ONE JSON line:

    {"metric": "...", "value": <total warm sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Headline set = every oracle-checked BATCH catalog query. The
Structured-Streaming entries measure micro-batch framework overhead
(trigger scheduling, state-store checkpoints), not engine throughput —
each has a batch twin in the headline — so they are timed separately
and reported as ``streaming_overhead_total`` instead of being buried
in the headline ratio.

Output: TWO JSON lines (the round-1 driver truncated one giant line, so
the first line is a compact self-contained summary — warm/duck totals,
ratio, worst-5 — and the full per-query map follows on line 2).

Env:
    SPARK_GRAFT_SF_DIR   fixture dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[] parallelism (default: all cores)
    BENCH_DUCKDB=0       skip timing the DuckDB oracle side (on by default)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_duckdb_spark.queries import catalog  # noqa: E402
from ai_duckdb_spark.session import get_spark  # noqa: E402
from ai_duckdb_spark.tables import TABLE_NAMES, table_path  # noqa: E402

def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _headline_specs():
    return [
        s
        for s in catalog.REGISTRY.values()
        if s.oracle is not None and not s.name.startswith("streaming_")
    ]


def _streaming_specs():
    return [s for s in catalog.REGISTRY.values() if s.name.startswith("streaming_")]


def bench_spark(sf_dir: str) -> tuple[dict[str, float], float, float]:
    """Cold+warm per query (BASELINE.md protocol: gate on warm).

    Materialization is Arrow ``toPandas`` — symmetric with the DuckDB
    side's ``fetchdf`` so both engines pay a pandas result, and the
    JVM→Python edge uses columnar batches instead of per-Row pickling.
    """
    spark = get_spark(app_name="ai_duckdb_spark_bench")
    specs = _headline_specs()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        cold[spec.name] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        warm[spec.name] = round(time.perf_counter() - t0, 4)
    return warm, round(sum(warm.values()), 4), round(sum(cold.values()), 4)


def bench_streaming(sf_dir: str) -> tuple[dict[str, float], float]:
    """Time the Structured-Streaming entries once each (framework
    overhead line — not part of the headline engine-throughput ratio)."""
    spark = get_spark(app_name="ai_duckdb_spark_bench")
    timings: dict[str, float] = {}
    for spec in _streaming_specs():
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        timings[spec.name] = round(time.perf_counter() - t0, 4)
    return timings, round(sum(timings.values()), 4)


def bench_duckdb(sf_dir: str) -> tuple[dict[str, float], float]:
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    for name in TABLE_NAMES:  # one warm pass over the files, not per query
        con.execute(f"SELECT count(*) FROM {name}").fetchall()
    specs = _headline_specs()
    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        con.sql(spec.oracle).fetchdf()
        timings[spec.name] = round(time.perf_counter() - t0, 4)
    return timings, round(sum(timings.values()), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)
    timings, total, cold_total = bench_spark(sf_dir)
    s_timings, s_total = bench_streaming(sf_dir)

    summary = {
        "metric": "catalog_warm_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "warm_total": total,
        "cold_total": cold_total,
        "streaming_overhead_total": s_total,
        "n_streaming": len(s_timings),
        "queries": dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5]),
    }
    if os.environ.get("BENCH_DUCKDB", "1") != "0":
        d_timings, d_total = bench_duckdb(sf_dir)
        summary["duck_total"] = d_total
        summary["ratio_vs_duckdb"] = round(total / max(d_total, 1e-9), 4)
        worst = sorted(
            ((timings[k] / max(d_timings[k], 1e-4), k) for k in timings), reverse=True
        )[:5]
        summary["worst_ratio_queries"] = {k: round(r, 2) for r, k in worst}

    # line 1: compact summary (driver-parseable); line 2: full per-query map
    print(json.dumps(summary))
    print(
        json.dumps(
            {
                "metric": "catalog_warm_per_query",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "queries": {**timings, **s_timings},
            }
        )
    )


if __name__ == "__main__":
    main()
