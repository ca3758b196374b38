#!/usr/bin/env python
"""Round-12 measurement harness: time individual registered queries
(noop sink, min-of-N) at a chosen data dir and/or dump their
explain("formatted") plans.

Usage:
  python scripts/measure.py --dir /root/testdata/sf0.1 --n 3 q1_pricing_summary q2_shipping_priority
  python scripts/measure.py --deep --plans plans/r12 --suffix _before q45_minhash_lsh
  python scripts/measure.py --dir ... --all-bench

Timing methodology is identical to bench.py: noop-sink write of the
full result (every column, every row), min over N interleaved passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--deep", action="store_true",
                    help="use the bench deep x10 upscale dir")
    ap.add_argument("--n", type=int, default=3, help="timing passes")
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="_before",
                    help="plan filename suffix (_before / _after)")
    ap.add_argument("--all-bench", action="store_true",
                    help="measure every bench=True query")
    ap.add_argument("--no-time", action="store_true",
                    help="plans only, skip timing")
    args = ap.parse_args()

    from streamprocess_spark import get_spark
    from streamprocess_spark.plans import QUERIES
    from streamprocess_spark.plans.registry import _ensure_loaded

    _ensure_loaded()

    sf_dir = args.dir
    if args.deep:
        from bench import ensure_deep_dir
        sf_dir = ensure_deep_dir(args.dir)

    names = list(args.queries)
    if args.all_bench:
        names += [n for n, s in sorted(QUERIES.items())
                  if s.bench and n not in names]
    if not names:
        ap.error("no queries given")

    spark = get_spark(app_name="r12-measure")
    spark.sparkContext.setLogLevel("ERROR")

    def run_full(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup (not counted): first builder pays JVM/Arrow warm floor
    run_full(QUERIES[names[0]].builder(spark, sf_dir))

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = QUERIES[name].builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            out = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(f"# {name} @ {sf_dir}\n")
                f.write(plan)
            print(f"# wrote {out}", file=sys.stderr)

    timings: dict[str, float] = {}
    if not args.no_time:
        best = {n: float("inf") for n in names}
        for _pass in range(args.n):
            for name in names:
                spark.sparkContext.setJobDescription(f"r12-measure:{name}")
                t0 = time.perf_counter()
                run_full(QUERIES[name].builder(spark, sf_dir))
                el = time.perf_counter() - t0
                best[name] = min(best[name], el)
                print(f"# pass{_pass} {name}: {el:.3f}s", file=sys.stderr)
        timings = {n: round(v, 4) for n, v in best.items()}
    print(json.dumps({"dir": sf_dir, "n": args.n, "queries": timings}))


if __name__ == "__main__":
    main()
