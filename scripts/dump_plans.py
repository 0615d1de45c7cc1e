#!/usr/bin/env python
"""Dump ``explain("formatted")`` for catalog entries to text files.

Usage:
    python scripts/dump_plans.py --root REPO_ROOT --out DIR --suffix before \
        entry1 entry2 ...

``--root`` selects WHICH repo revision's query code to import (a git
worktree of an older commit for the ``_before`` plans, the checkout
itself for ``_after``), so the committed plan files are reproducible
evidence of a plan change rather than prose claims. The DataFrame is
only constructed, never executed — entries whose build runs eager jobs
(index-backed tiers, streaming drains) pay those, which is why this
tool is pointed at lazy batch entries.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, os.path.abspath(args.root))
    import ai_duckdb_spark.queries  # noqa: F401  (registers every module)
    from ai_duckdb_spark.queries import catalog
    from ai_duckdb_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark()
    for name in args.entries:
        if name not in catalog.REGISTRY:
            print(f"SKIP {name}: not in catalog at {args.root}", file=sys.stderr)
            continue
        df = catalog.REGISTRY[name].builder(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
