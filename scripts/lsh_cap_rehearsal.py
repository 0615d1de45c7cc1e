#!/usr/bin/env python
"""End-to-end measurement of the LSH ``max_bucket`` hot-bucket guard at
sf1.0 (r10 judge item 6).

The guard (operators/dedup.py lsh_candidate_pairs) shipped in r10
default-off with pytest-only coverage. This script runs the sf1.0
dense-duplicate documents corpus through the EXACT signature relation
the catalogued MinHash tier bands (dedup.minhash_rep_signatures at the
catalog's t=0.8 / 32 hashes / 8 bands), once uncapped and once per cap,
and accounts for what the cap costs:

- capped candidate count vs the uncapped run (cand_capped is a SUBSET
  of cand_uncapped by construction — buckets are only ever dropped —
  so overall recall is a ratio of counts, no pair join needed);
- recall restricted to NON-BOILERPLATE pairs: pairs neither of whose
  members appears in ANY over-cap bucket. For those pairs every shared
  bucket is under the cap, so the guard provably retains them —
  measured here rather than argued (expect 1.0);
- hot-bucket census per cap (how many buckets/rows the cap drops);
- wall-clock per variant (candidate count job, same action both ways).

Output: one JSON line per cap + a summary line, for the SCALE.md table.

Usage: python scripts/lsh_cap_rehearsal.py [cap ...]   (default 128 512 2048)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".testdata/sf1.0"))
sys.path.insert(0, REPO)


def main() -> None:
    if os.path.commonpath([os.getcwd(), REPO]) == REPO:
        os.chdir("/tmp")
    from pyspark.sql import functions as F

    from ai_duckdb_spark.operators import dedup
    from ai_duckdb_spark.session import get_spark

    caps = [int(c) for c in sys.argv[1:]] or [128, 512, 2048]
    spark = get_spark(app_name="lsh_cap_rehearsal")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    groups, reps, sigs = dedup.minhash_rep_signatures(docs, "doc_id", "text", 32)
    n_reps = sigs.count()  # materializes the checkpointed signature frame

    # the banded bucket relation — the SAME projection lsh_candidate_pairs
    # joins on (shared helper, so the census can't desynchronize from
    # what the cap actually drops)
    bands = 8
    banded = dedup.banded_buckets(sigs, bands).localCheckpoint()
    bucket_sizes = banded.groupBy("__bucket").agg(F.count("*").alias("sz"))
    bucket_sizes = bucket_sizes.localCheckpoint()

    # Materialize each candidate relation ONCE to parquet and time the
    # write (the sink protocol — a 100 TB dedup writes its candidate
    # relation, it never collects it), then run every downstream count
    # against the parquet. localCheckpoint is NOT safe here: a
    # quarter-billion-pair relation overflows the memory store and an
    # evicted localCheckpoint block is a lost block (observed:
    # "Block rdd_54_20 does not exist" mid-recall-join).
    pairs_dir = tempfile.mkdtemp(prefix="lshcap_")

    def materialize(cand, tag):
        out = os.path.join(pairs_dir, tag)
        t0 = time.perf_counter()
        cand.write.mode("overwrite").parquet(out)
        wall = round(time.perf_counter() - t0, 2)
        dfp = spark.read.parquet(out)
        return dfp, dfp.count(), wall

    cand_u, n_u, wall_u = materialize(dedup.lsh_candidate_pairs(sigs, bands), "uncapped")
    print(
        json.dumps(
            {
                "variant": "uncapped",
                "n_reps": n_reps,
                "n_candidates": n_u,
                "wall_s": wall_u,
            }
        ),
        flush=True,
    )

    results = []
    for cap in caps:
        hot = bucket_sizes.filter(F.col("sz") > cap)
        n_hot_buckets = hot.count()
        hot_docs = (
            banded.join(hot.select("__bucket"), "__bucket").select("__id").distinct()
        ).localCheckpoint()
        n_hot_docs = hot_docs.count()

        cand_c, n_c, wall_c = materialize(
            dedup.lsh_candidate_pairs(sigs, bands, max_bucket=cap), f"cap{cap}"
        )

        # non-boilerplate slice: neither member in any over-cap bucket
        def nb(cand):
            return (
                cand.join(hot_docs.withColumnRenamed("__id", "id1"), "id1", "left_anti")
                .join(hot_docs.withColumnRenamed("__id", "id2"), "id2", "left_anti")
            )

        n_u_nb = nb(cand_u).count()
        n_c_nb = nb(cand_c).count()

        row = {
            "variant": f"max_bucket={cap}",
            "n_candidates": n_c,
            "wall_s": wall_c,
            "recall_overall": round(n_c / max(n_u, 1), 4),
            "n_hot_buckets": n_hot_buckets,
            "n_docs_in_hot_buckets": n_hot_docs,
            "n_nonboiler_pairs_uncapped": n_u_nb,
            "n_nonboiler_pairs_capped": n_c_nb,
            "recall_non_boilerplate": round(n_c_nb / max(n_u_nb, 1), 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(
        json.dumps(
            {
                "metric": "lsh_max_bucket_rehearsal",
                "sf": 1.0,
                "n_reps": n_reps,
                "uncapped": {"n_candidates": n_u, "wall_s": wall_u},
                "caps": results,
            }
        )
    )
    import shutil

    shutil.rmtree(pairs_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
