#!/usr/bin/env python
"""One-shot sf1.0 scale rehearsal (r9 judge item 2).

Runs EVERY catalog entry at a 10x-sf0.1 fixture tier (scripts/gen_sf1.py
output) with the driver's own correctness semantics — oracle-paired
entries compare sorted column names, row count, and an order-insensitive
value hash against DuckDB on the SAME parquet files; rows-only entries
record row counts — and times both engines (one untimed warm pass, one
timed pass each, matching the BENCH protocol's warm semantics closely
enough for ratio comparison without the 3-pass interleave, which at sf1
would triple an already-long run).

Purpose: flush fixture-size-dependent assumptions the sf0.01/sf0.1
regime hides (broadcast sizes, memory-sink result sizes, sentinel
replay dirs, the semantic-dedup numpy size gate) and record which
entries' Spark/DuckDB ratio moved most vs the sf0.1 artifact — SCALE.md
predicts the job-floor-dominated entries' ratios collapse toward
compute as data grows.

Output: BENCH_SF1.json at the repo root — line 1 a compact summary,
line 2 per-entry {status, spark_s, duck_s, ratio}, line 3 the summary
again (driver tail-capture convention).

Usage: python scripts/scale_rehearsal.py [name ...]
(must run from a non-repo cwd for the executor sys.path property, like
verify_driver_sim.py; the script re-execs itself from /tmp if started
inside the repo).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".testdata/sf1.0"))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    import decimal

    if isinstance(v, (int, decimal.Decimal)):
        v = float(v)
    if isinstance(v, float):
        return f"{round(v, 9) + 0.0:.9f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    if os.path.commonpath([os.getcwd(), REPO]) == REPO:
        # non-repo cwd requirement (verify SKILL.md gotcha: executor
        # workers must get the package from the shipped zip, not cwd)
        os.chdir("/tmp")

    import duckdb

    sys.path.insert(0, REPO)
    # the repo session factory, not a vanilla builder: driver memory is
    # NOT runtime-settable, and at sf1.0 the vanilla 1g heap dies in the
    # first wide shuffle (the smoke run proved it) — the driver harness
    # sizes its own session; get_spark sizes from the cgroup limit the
    # same way
    from ai_duckdb_spark.session import get_spark

    spark = get_spark(app_name="scale_rehearsal_sf1")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for t in TABLES:  # warm the page cache symmetrically
        con.execute(f"SELECT count(*) FROM {t}").fetchall()

    qs, oracles = E.queries(), E.oracle_sql()
    names = [n for n in qs if n in sys.argv[1:]] if sys.argv[1:] else list(qs)

    # Per-side wall-clock budget: the quadratic-OUTPUT entries (exact
    # all-pairs Jaccard at the fixture's ~8% near-dup pair density)
    # produce ~100M qualifying pairs at sf1.0 — hours on the DuckDB
    # postings join. A side that exceeds the budget is interrupted
    # (sc.cancelAllJobs / duckdb con.interrupt) and recorded as
    # spark_timeout / oracle_timeout with the elapsed time, which is
    # itself the rehearsal finding (the ratio inverted or exploded).
    budget_s = float(os.environ.get("BENCH_SF1_TIMEOUT", "600"))
    import threading

    def with_timeout(fn, cancel):
        done = threading.Event()

        def watchdog():
            if not done.wait(budget_s):
                # keep cancelling until the call returns: an adaptive
                # plan submits a NEW job after each cancelled one, so a
                # single cancelAllJobs only kills the current stage
                while not done.wait(2):
                    try:
                        cancel()
                    except Exception:  # noqa: BLE001
                        return

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            return fn()
        finally:
            done.set()

    # Checksum mode for quadratic-OUTPUT entries: above ROWCAP rows the
    # rehearsal never driver-materializes the result (a 96M-pair
    # collect() measures py4j, not the engine). Instead both engines
    # reduce the SAME result relation to exact-integer aggregates —
    # count, per-bigint-column sums, per-double-column sums of
    # floor(x*1e6+0.5) (doubles here are IEEE divisions of exact ints,
    # bit-identical cross-engine, so the scaled floor is too), string
    # columns as length sums — and those integers are compared. Full
    # value-hash correctness remains the sf0.01 driver gate's job; the
    # rehearsal proves the plan computes the same relation AT SCALE.
    rowcap = int(os.environ.get("BENCH_SF1_ROWCAP", "2000000"))

    def checksum_cols(sdf):
        from pyspark.sql import functions as F

        spark_aggs, duck_exprs = [F.count(F.lit(1)).alias("__n")], ["count(*)"]
        for f in sdf.schema.fields:
            t = f.dataType.simpleString()
            if t in ("bigint", "int", "smallint", "tinyint"):
                spark_aggs.append(F.sum(F.col(f.name)).alias(f.name))
                duck_exprs.append(f'sum("{f.name}")')
            elif t in ("double", "float"):
                spark_aggs.append(
                    F.sum(F.floor(F.col(f.name) * 1e6 + F.lit(0.5)).cast("long")).alias(f.name)
                )
                duck_exprs.append(f'sum(CAST(floor("{f.name}"*1e6 + 0.5) AS BIGINT))')
            elif t == "string":
                spark_aggs.append(F.sum(F.length(F.col(f.name)).cast("long")).alias(f.name))
                duck_exprs.append(f'sum(length("{f.name}"))')
        return spark_aggs, duck_exprs

    per_entry: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        ent: dict = {}
        cancel_spark = spark.sparkContext.cancelAllJobs
        try:
            t_all = time.perf_counter()
            try:
                sdf = qs[name](spark, SF_DIR)
                n_est = with_timeout(sdf.count, cancel_spark)
                if n_est <= rowcap:
                    with_timeout(
                        lambda: qs[name](spark, SF_DIR).collect(), cancel_spark
                    )  # warm (plan + JIT + caches)
                    t0 = time.perf_counter()
                    sdf = qs[name](spark, SF_DIR)
                    cols = sdf.columns
                    rows = with_timeout(sdf.collect, cancel_spark)
                else:
                    ent["compare"] = "checksum"
                    spark_aggs, duck_exprs = checksum_cols(sdf)
                    t0 = time.perf_counter()
                    sdf2 = qs[name](spark, SF_DIR)
                    srow = with_timeout(
                        lambda: sdf2.agg(*spark_aggs).collect()[0], cancel_spark
                    )
                    ent["spark_s"] = round(time.perf_counter() - t0, 3)
                    ent["rows"] = int(srow["__n"])
                    if name not in oracles:
                        ent["status"] = "rows_only"
                        n_rows_only += 1
                        per_entry[name] = ent
                        print(f"{name}: rows_only(checksum) {ent['rows']} rows", flush=True)
                        continue
                    t_duck = time.perf_counter()
                    dsql = (
                        f"SELECT {', '.join(duck_exprs)} FROM ({oracles[name]}) __t"
                    )
                    try:
                        drow = with_timeout(
                            lambda: con.sql(dsql).fetchone(), con.interrupt
                        )
                    except Exception as exc:  # noqa: BLE001
                        if "interrupt" not in str(exc).lower():
                            raise
                        ent["status"] = "oracle_timeout"
                        ent["duck_s"] = round(time.perf_counter() - t_duck, 1)
                        n_rows_only += 1
                        per_entry[name] = ent
                        print(
                            f"{name}: oracle_timeout(checksum) after "
                            f"{ent['duck_s']}s (spark {ent['spark_s']}s, "
                            f"{ent['rows']} rows)",
                            flush=True,
                        )
                        continue
                    ent["duck_s"] = round(time.perf_counter() - t_duck, 3)
                    svals = [None if v is None else int(v) for v in srow]
                    dvals = [None if v is None else int(v) for v in drow]
                    ok = svals == dvals
                    ent["status"] = "pass" if ok else "fail"
                    ent["ratio"] = round(ent["spark_s"] / max(ent["duck_s"], 1e-4), 2)
                    if ok:
                        n_pass += 1
                    else:
                        n_fail += 1
                        ent["detail"] = f"checksum {svals} vs {dvals}"[:300]
                    per_entry[name] = ent
                    print(
                        f"{name}: {ent['status']}(checksum) {ent['spark_s']}s "
                        f"duck={ent['duck_s']}s rows={ent['rows']}",
                        flush=True,
                    )
                    continue
            except Exception as exc:  # noqa: BLE001
                if "cancelled" not in str(exc).lower():
                    raise
                ent["status"] = "spark_timeout"
                ent["spark_s"] = round(time.perf_counter() - t_all, 1)
                n_fail += 1
                per_entry[name] = ent
                print(f"{name}: spark_timeout after {ent['spark_s']}s", flush=True)
                continue
            ent["spark_s"] = round(time.perf_counter() - t0, 3)
            ent["rows"] = len(rows)
            if name not in oracles:
                ent["status"] = "rows_only"
                n_rows_only += 1
            else:
                t_duck = time.perf_counter()
                try:
                    with_timeout(lambda: con.sql(oracles[name]).fetchall(), con.interrupt)
                    t0 = time.perf_counter()
                    rel = con.sql(oracles[name])
                    ocols, orows = with_timeout(
                        lambda: (list(rel.columns), rel.fetchall()), con.interrupt
                    )
                except Exception as exc:  # noqa: BLE001
                    if "interrupt" not in str(exc).lower():
                        raise
                    ent["status"] = "oracle_timeout"
                    ent["duck_s"] = round(time.perf_counter() - t_duck, 1)
                    n_rows_only += 1  # Spark side ran; comparison unavailable
                    per_entry[name] = ent
                    print(
                        f"{name}: oracle_timeout after {ent['duck_s']}s "
                        f"(spark side {ent['spark_s']}s, {ent['rows']} rows)",
                        flush=True,
                    )
                    continue
                ent["duck_s"] = round(time.perf_counter() - t0, 3)
                ok = (
                    sorted(cols) == sorted(ocols)
                    and len(rows) == len(orows)
                    and value_hash(rows, cols) == value_hash(orows, ocols)
                )
                ent["status"] = "pass" if ok else "fail"
                ent["ratio"] = round(ent["spark_s"] / max(ent["duck_s"], 1e-4), 2)
                if ok:
                    n_pass += 1
                else:
                    n_fail += 1
                    ent["detail"] = (
                        f"schema={sorted(cols) == sorted(ocols)} "
                        f"rows={len(rows)}vs{len(orows)}"
                    )
        except Exception as exc:  # noqa: BLE001
            ent["status"] = "error"
            ent["detail"] = f"{type(exc).__name__}: {exc}"[:300]
            n_fail += 1
        per_entry[name] = ent
        print(f"{name}: {ent['status']} {ent.get('spark_s', '-')}s "
              f"duck={ent.get('duck_s', '-')}s", flush=True)

    batch = {
        n: e
        for n, e in per_entry.items()
        if e.get("status") == "pass" and not n.startswith("streaming_")
    }
    summary = {
        "metric": "scale_rehearsal_sf1_total",
        "value": round(sum(e["spark_s"] for e in batch.values()), 2),
        "unit": "sec",
        "sf": 1.0,
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "n_entries": len(per_entry),
        "duck_total": round(sum(e["duck_s"] for e in batch.values()), 2),
        "protocol": "one_warm_pass_then_one_timed_pass_per_side",
    }
    summary["ratio_vs_duckdb"] = round(
        summary["value"] / max(summary["duck_total"], 1e-9), 4
    )
    out = os.path.join(REPO, "BENCH_SF1.json")
    with open(out, "w") as f:
        f.write(json.dumps(summary) + "\n")
        f.write(
            json.dumps(
                {"metric": "scale_rehearsal_sf1_per_entry", "entries": per_entry}
            )
            + "\n"
        )
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    print(f"wrote {out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
