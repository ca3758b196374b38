"""One-off x1000 soak measurement (round-11 verdict #4 protocol).

Measures the named soak legs at SPARK_GRAFT_SOAK_FACTOR=1000 (5M docs /
2M embeddings) with the same-session x100 legs as per-decade
denominators, under the bench's noop-write timing action. Usage:

    python scripts/x1000_oneoff.py q139_substring_spans \
        q149_semdedup_scale_auto

Prints one JSON line per query: {query, x100_sec, x1000_sec,
per_decade_ratio}. Not part of the per-round bench (minute-scale; the
recorded figures live in SURVEY.md §8's standing x1000 table).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402
from streamprocess_spark.session import get_spark  # noqa: E402


def main(names: list[str]) -> None:
    from streamprocess_spark.plans import QUERIES, query_map

    query_map()          # populate the registry
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d100 = bench.ensure_soak_dir(sf_dir, factor=100)
    d1000 = bench.ensure_soak_dir(sf_dir, factor=1000)
    for name in names:
        builder = bench._SOAK_EXTRA.get(name) or QUERIES[name].builder
        times = {}
        for label, d in (("x100", d100), ("x1000", d1000)):
            t0 = time.perf_counter()
            bench._run_full(builder(spark, d))
            times[label] = round(time.perf_counter() - t0, 1)
            print(f"# {name} {label}: {times[label]}s", file=sys.stderr)
        print(json.dumps({
            "query": name,
            "x100_sec": times["x100"],
            "x1000_sec": times["x1000"],
            "per_decade_ratio": round(times["x1000"] / times["x100"], 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or ["q139_substring_spans",
                          "q149_semdedup_scale_auto"])
