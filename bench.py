#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "deep": {"factor": 10, "value": N, "queries": {...}}}

The "deep" section re-times the same queries on a 10x key-shifted
upscale of the base tables (generated once into a cached dir). At
sf0.1 every query is dominated by the ~1 s plan/Arrow warmup floor,
so round-over-round deltas there are noise; the deep run is where
plan-quality regressions (extra shuffles, lost pushdowns, skew) are
actually visible. Set SPARK_GRAFT_SKIP_DEEP=1 to skip it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

DEEP_FACTOR = int(os.environ.get("SPARK_GRAFT_DEEP_FACTOR", "10"))

# key shifts per replica: keep every FK relationship intact
# (orders.o_custkey ↔ customer.c_custkey shift together; lineitem
# joins dims that are NOT replicated, so part/supp keys are unshifted)
_DEEP_SQL = {
    "lineitem": (
        "SELECT l_orderkey + r.r * 10000000 AS l_orderkey, l_partkey, "
        "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        "FROM src, range({f}) r(r)"
    ),
    "orders": (
        "SELECT o_orderkey + r.r * 10000000 AS o_orderkey, "
        "o_custkey + r.r * 10000000 AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority "
        "FROM src, range({f}) r(r)"
    ),
    "customer": (
        "SELECT c_custkey + r.r * 10000000 AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM src, range({f}) r(r)"
    ),
    "events": (
        "SELECT event_id + r.r * 10000000 AS event_id, ts, "
        "user_id + r.r * 1000000 AS user_id, event_type, value, props "
        "FROM src, range({f}) r(r)"
    ),
    # per-replica suffix on EVERY word: within a replica the token
    # statistics are isomorphic to the base corpus (near-dup structure
    # preserved exactly), across replicas the token sets are disjoint
    # (shingle similarity ~0) — so the dedup workload scales linearly
    # (10x the original pair count). A trailing salt would leave
    # replicas near-duplicate (quadratic pair blowup); an interleaved
    # common token would make whole replicas self-similar (worse).
    "documents": (
        "SELECT doc_id + r.r * 1000000 AS doc_id, "
        "CASE WHEN r.r = 0 THEN text "
        "ELSE replace(text, ' ', cast(r.r AS VARCHAR) || ' ') END AS text, "
        "lang, source, n_chars FROM src, range({f}) r(r)"
    ),
    "embeddings": (
        "SELECT vec_id + r.r * 1000000 AS vec_id, embedding, label "
        "FROM src, range({f}) r(r)"
    ),
}

_COPY_TABLES = ("region", "nation", "supplier", "part")


def ensure_deep_dir(sf_dir: str, factor: int = DEEP_FACTOR) -> str:
    """Generate (once, cached) a factor-x upscale of the base tables."""
    import duckdb

    dst = os.environ.get(
        "SPARK_GRAFT_DEEP_DIR",
        os.path.join(tempfile.gettempdir(), f"spark_graft_deep_x{factor}"),
    )
    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for t in _COPY_TABLES:
        shutil.copy(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    con = duckdb.connect()
    for t, sql in _DEEP_SQL.items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"COPY ({sql.format(f=factor).replace('src', repr(src))}) "
            f"TO '{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)"
        )
    with open(marker, "w") as f:
        f.write("ok")
    return dst


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

    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
    }
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    result["sf"] = float(sf) if sf else None

    # streaming throughput: full events replay through the watermarked
    # tumbling-window aggregation (micro-batched availableNow run to a
    # converged sink) — the §6 "streaming" harness shape, reported as
    # end-to-end rows/sec of the stateful pipeline
    if "stream_tumbling_window" in QUERIES:
        import duckdb

        n_events = duckdb.sql(
            f"SELECT count(*) FROM '{os.path.join(sf_dir, 'events.parquet')}'"
        ).fetchone()[0]
        t0 = time.perf_counter()
        out_rows = QUERIES["stream_tumbling_window"].builder(spark, sf_dir).count()
        el = time.perf_counter() - t0
        result_stream = {
            "input_rows": int(n_events),
            "output_rows": int(out_rows),
            "value": round(el, 4),
            "rows_per_sec": round(n_events / el, 1),
        }
        print(
            f"# streaming replay: {el:.3f}s "
            f"({result_stream['rows_per_sec']} rows/s)",
            file=sys.stderr,
        )
    else:
        result_stream = None

    if not os.environ.get("SPARK_GRAFT_SKIP_DEEP"):
        t0 = time.perf_counter()
        deep_dir = ensure_deep_dir(sf_dir)
        gen_s = time.perf_counter() - t0
        print(f"# deep x{DEEP_FACTOR} data ready in {gen_s:.1f}s", file=sys.stderr)
        deep_timings: dict[str, float] = {}
        deep_total = 0.0
        for name in bench_names:
            t0 = time.perf_counter()
            rows = QUERIES[name].builder(spark, deep_dir).count()
            el = time.perf_counter() - t0
            deep_timings[name] = round(el, 4)
            deep_total += el
            print(f"# deep {name}: {el:.3f}s ({rows} rows)", file=sys.stderr)
        result["deep"] = {
            "factor": DEEP_FACTOR,
            "value": round(deep_total, 4),
            "queries": deep_timings,
        }

    if result_stream is not None:
        result["streaming"] = result_stream

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
