#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from streamprocess_spark import get_spark
    from streamprocess_spark.plans import QUERIES
    from streamprocess_spark.plans.registry import _ensure_loaded

    _ensure_loaded()
    spark = get_spark(app_name="streamprocess-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_names = [n for n, s in sorted(QUERIES.items()) if s.bench]
    timings: dict[str, float] = {}

    # warm the JVM + staged events copy once (not counted)
    QUERIES[bench_names[0]].builder(spark, sf_dir).count()

    total = 0.0
    for name in bench_names:
        # min of 2 runs: suppresses one-off JIT/GC noise so round-over-
        # round comparisons track plan quality, not jitter
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = QUERIES[name].builder(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        total += best
        print(f"# {name}: {best:.3f}s ({rows} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
