#!/usr/bin/env python
"""Dump `.explain(\"formatted\")` for registered queries to files.

Usage:
    python scripts/dump_plan.py OUTDIR QUERY [QUERY ...] [--suffix S]

Writes OUTDIR/<query><suffix>.txt. Set PYTHONPATH at a git worktree of
an older commit to dump that commit's plan shapes (the `_before`
convention of plans/rNN/).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--suffix")]
    suffix = ""
    for i, a in enumerate(sys.argv):
        if a == "--suffix":
            suffix = sys.argv[i + 1]
    outdir, names = args[0], args[1:]
    os.makedirs(outdir, exist_ok=True)

    from streamprocess_spark.plans import QUERIES, query_map
    from streamprocess_spark.session import get_spark

    query_map()
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
