"""Named query registry — the single source of truth for the
correctness gate.

Each QuerySpec binds:
  - a Spark builder ``(SparkSession, sf_dir) -> DataFrame``
  - an equivalent DuckDB oracle SQL string (or None for ops that are
    not SQL-expressible — custom stateful streaming etc.; the driver
    then records a weaker rows-only check)
  - the SURVEY.md §2 operator ids the query covers.

Cross-engine determinism rules every query obeys:
  - Floating aggregates use the decimal-sum pattern:
    ``cast(sum(cast(expr as decimal(27,8))) as double)``. Decimal sums
    are exact and order-independent, so Spark's partition-parallel
    aggregation and DuckDB's sequential one produce bit-identical
    doubles. Plain double sums would differ in final ulps.
  - Per-row arithmetic is done in double with the same textual shape in
    both engines (IEEE ops are deterministic given identical operands).
  - Ranking/top-k always carries a unique tie-break key (event_id /
    orderkey), never raw floats alone.
  - Aggregate/computed columns are aliased identically in both engines
    (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    # Either the DuckDB SQL string, or a zero-arg callable returning it.
    # Callables are resolved lazily in oracle_sql_map() so a composite
    # module can reference other QuerySpecs' oracles without import-order
    # coupling (a bare `import plans.composites` must not KeyError).
    oracle: str | Callable[[], str] | None
    covers: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set

    def oracle_sql(self) -> str | None:
        return self.oracle() if callable(self.oracle) else self.oracle


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | Callable[[], str] | None,
    covers: tuple[str, ...] = (),
    doc: str = "",
    bench: bool = False,
):
    """Decorator: register a Spark query builder under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, covers=covers, doc=doc, bench=bench
        )
        return fn

    return wrap


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    from streamprocess_spark.plans.util import events_us_oracle

    _ensure_loaded()
    return {
        name: events_us_oracle(spec.oracle_sql())
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }


_LOADED = False


# Curated driver ordering. The correctness driver checks the FIRST 50
# entries of queries(), so the first 50 names here must jointly cover
# every SURVEY §2 operator id (asserted by tests/test_plan_lint.py).
# Composites stand in for their constituent thin queries inside the
# top 50; the constituents stay registered below slot 50 so the repo
# parity suite still checks each one individually.
#
# Round-8 rotation (round-7 verdict #7): 167 registered queries, 50
# driver slots — eight slots long-green since round <=3 (q4, q7, q8,
# q10, q31, q32, q69, q70; each with >=2 consecutive driver-green
# rounds in CORRECTNESS_r06/r07) rotate below slot 50 in favour of
# queries that never had driver-grade evidence (q99/q111/q122/q135/
# q139/q149 + the z-order/compaction layout planners). The rotated-out
# base ids (§2.8, O5, J4, R7, §2.10-builtins, free-rollup/-distinct/
# -cube) keep full oracle parity in the repo suite every run.
TOP50: tuple[str, ...] = (
    # relational core. Round-9 rotation (round-8 verdict #3): seven
    # slots driver-green since round <=2 rotate below 50 in favour of
    # never-evidenced LLM-pipeline entries — q2 (O1/O4; q9_argmax
    # repo-checked), q3 (tags fully redundant with q1/q71/q17),
    # q_semi_anti_join (J-free redundant; S11 proper via q_queue_admin),
    # q102 (§2.13-text via q_text_suite), q45 (dedup tags carried by
    # q122/q135/q139/q153/q_doc_signatures; q45 stays bench+soak-
    # measured every round), q49 (similarity via q48/q73/q99/q111;
    # stays in the ann_recall bench gate), q71 (A13 via q1; the skew
    # story lives in the flagship skew leg). q1 stays as the long-green
    # canary. In: q150_curation_dag (the composed end-to-end artifact),
    # q112/q124 (the BPE train->apply lifecycle), q141_sequence_packing,
    # q144_html_extract, q116_lm_perplexity, q118_domain_mixing.
    "q1_pricing_summary",
    "q150_curation_dag",
    "q112_bpe_train",
    "q124_bpe_apply",
    "q141_sequence_packing",
    # dataflow / queue engine
    "q_queue_admin",             # q11 + q12 + q13
    "q14_json_envelope",
    "q15_edf_order",
    # q16_length_bucketing rotated below 50 late round 8 (B3-B5/P3;
    # driver-green r01-r07) in favour of first driver-grade S5
    # evidence — the WARC stream planner's exactly-once intake ledger
    # vs its sorted-name/cap contract:
    "q156_warc_intake_ledger",
    "q17_request_result_join",
    "q18_zip_explode",
    "q19_batch_formation",
    # q68_region_blocks rotated below 50 late round 8 (J3; driver-green
    # r01-r07) in favour of first driver-grade S8 evidence — the stream
    # planner's budgeted offset-commit ledger vs its SQL contract:
    "q155_offset_commit_ledger",
    # q90_queue_source_counts rotated below 50 late round 8 (R1 covered
    # by q_queue_admin, S6/S7 by stream_state_suite; driver-green since
    # round 2) in favour of first driver-grade S13 evidence:
    "q152_oneof_routing",
    # windows / analytics
    "q20_tumbling_window",
    # q21_sliding_window rotated below 50 late round 8 (T3/W1 both
    # covered by q20/stream_window_suite; driver-green since round 1)
    # in favour of first driver-grade S4 evidence:
    "q151_sniffer_verdicts",
    "q_session_islands",         # q22 + q23
    "q24_topn_per_key",
    # q25_ordered_concat rotated below 50 late round 8 (A3; driver-green
    # r01-r07) in favour of first driver-grade T8 evidence — the idle
    # reap replayed per-incarnation with the full recursive-CTE oracle:
    "q154_idle_reap_replay",
    # q26_latency_percentiles rotated below 50 late round 8 (A7/A8/O3;
    # driver-green r01-r07) in favour of the REAL multi-trigger
    # streaming sessionizer (S1's file-replay re-expression, §2.11
    # state carried across micro-batches) under the driver gate — its
    # recursive-CTE oracle was always full-strength but it had never
    # held a driver slot:
    "stream_sessionizer",
    "q148_autoscaler_blend",     # full capacity+PID+predictive blend;
                                 # supersedes q_autoscale_plan's tags
                                 # (q27/q28 stay checked below slot 50)
    "q_worker_metrics",          # q29 + q30
    # q84_funnel rotated below 50 late round 8 (driver-green r01-r07;
    # its tags are all -adjacent/free echoes of ids covered above) in
    # favour of driver-grade evidence for the new bloom-admission
    # reduction:
    "q153_bloom_admission",
    # LLM data pipeline
    "q_text_suite",              # q40 + q41 + q42
    "q_doc_signatures",          # q43 + q44 + q46
    "q144_html_extract",
    "q108_udaf_energy",          # §2.12 UDAF leg; q47's dedup tag redundant
    "q48_embedding_topk",
    "q116_lm_perplexity",
    "q103_semdedup",             # same tags as q72 + the SemDeDup pipeline
    "q73_ann_ivf_topk",
    "q118_domain_mixing",
    "q_corpus_suite",            # q74 + q75 + q85 + q87 + q88
    # round-8 rotation: first driver-grade evidence for these
    "q99_ann_ivf_trained",
    "q111_pq_ann",
    "q122_incremental_dedup",
    "q135_cdc_dedup",
    "q139_substring_spans",
    "q149_semdedup_scale",
    "q109_zorder_layout",
    "q119_compaction_plan",
    # multimodal
    "q_audio_suite",             # q50 + q51 + q52 + q57 + q58 + WAV
    "q_image_suite",             # q54 + q60..q64 + q66
    "q_inference_suite",         # q55 + q56 + dual OCR engines
    "q_media_invariants",        # q59 + q67 + q128 (closed-form invariants)
    "q53_image_layout",
    # scale joins / frames
    "q_scale_join_suite",        # q79 + q80 + q83
    # streaming
    "stream_window_suite",       # 4 converged streaming runs
    "stream_state_suite",        # session-window + stream-join + top-k
    "sessionize_batch_segments",  # T1/T6/T7 sessionizer (recursive-CTE oracle)
)


def _curate_order() -> None:
    """Reorder QUERIES in-place: TOP50 first, rest in registration order."""
    ordered: dict[str, QuerySpec] = {}
    for name in TOP50:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    QUERIES.clear()
    QUERIES.update(ordered)


def _ensure_loaded() -> None:
    """Import all modules that register queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import streamprocess_spark.plans.relational  # noqa: F401
    import streamprocess_spark.plans.dataflow  # noqa: F401
    import streamprocess_spark.plans.analytic_windows  # noqa: F401
    import streamprocess_spark.plans.llm_pipeline  # noqa: F401
    import streamprocess_spark.plans.streaming_queries  # noqa: F401
    import streamprocess_spark.plans.stateful_queries  # noqa: F401
    import streamprocess_spark.plans.multimodal  # noqa: F401
    import streamprocess_spark.plans.scale_joins  # noqa: F401
    import streamprocess_spark.plans.composites  # noqa: F401

    _curate_order()
    _LOADED = True
