#!/usr/bin/env python
"""Tabulate sf0.1 → sf1.0 Spark/DuckDB ratio movers (r9 judge item 2).

Joins BENCH_SF1.json (per-entry sf1.0 spark_s/duck_s) against the sf0.1
per-query maps in a BENCH_LOCAL artifact and prints the entries whose
ratio moved most in each direction — the evidence for SCALE.md's
"job-floor ratios invert at scale" prediction, plus any entry whose
ratio EXPLODED (a genuine scale problem, not floor arithmetic).

Usage: python scripts/sf1_movers.py [BENCH_LOCAL_rN.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    local_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_LOCAL_r9.json")
    lines = [json.loads(ln) for ln in open(os.path.join(REPO, "BENCH_SF1.json"))]
    sf1 = lines[1]["entries"]
    llines = [json.loads(ln) for ln in open(local_path)]
    per_q = next(l for l in llines if l["metric"].endswith("per_query"))
    s01, d01 = per_q["queries"], per_q.get("duckdb_queries", {})

    rows = []
    for name, e in sf1.items():
        if e.get("status") != "pass" or name not in d01:
            continue
        r1 = e["spark_s"] / max(e["duck_s"], 1e-4)
        r01 = s01[name] / max(d01[name], 1e-4)
        rows.append((r1 / max(r01, 1e-6), r01, r1, name, e["spark_s"], e["duck_s"]))

    rows.sort()
    print(f"{len(rows)} comparable entries; ratio = spark_s / duck_s\n")
    print("== biggest movers TOWARD Spark (ratio shrank most, sf0.1 -> sf1.0)")
    print(f"{'entry':42s} {'r@0.1':>7s} {'r@1.0':>7s} {'spark_s':>8s} {'duck_s':>8s}")
    for mult, r01, r1, name, s, d in rows[:12]:
        print(f"{name:42s} {r01:7.2f} {r1:7.2f} {s:8.2f} {d:8.2f}")
    print("\n== biggest movers AGAINST Spark (ratio grew most)")
    for mult, r01, r1, name, s, d in rows[-12:][::-1]:
        print(f"{name:42s} {r01:7.2f} {r1:7.2f} {s:8.2f} {d:8.2f}")

    slow = sorted(
        ((e["spark_s"], n) for n, e in sf1.items() if "spark_s" in e), reverse=True
    )[:12]
    print("\n== slowest Spark entries at sf1.0 (absolute)")
    for s, n in slow:
        print(f"{n:42s} {s:8.2f}s  status={sf1[n]['status']}")
    bad = {n: e for n, e in sf1.items() if e.get("status") not in ("pass", "rows_only")}
    print(f"\n== non-green entries: {len(bad)}")
    for n, e in bad.items():
        print(f"{n}: {e.get('status')} {e.get('detail', '')[:120]}")


if __name__ == "__main__":
    main()
