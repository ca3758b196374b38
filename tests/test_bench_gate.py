"""Unit coverage for bench.py's regression gate.

The gate is the only thing standing between a silent round-over-round
performance regression and a committed BENCH_r{N}.json, so its four
branches (per-query ratio, throughput-vs-median, scale-soak absolute
ratio, flagship skew) get direct synthetic-history tests here. The
median-of-3 throughput baseline exists because the recorded flagship
history (1173 -> 1055 -> 1993 chunks/s on unchanged pipeline code)
showed single-round wall-clock noise large enough that gating against
one lucky round would flag healthy runs; the tests below pin exactly
that scenario.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SOAK_MAX_RATIO, _GATE_RATIO, _regression_gate  # noqa: E402


def _write_round(tmp_path, n, parsed):
    p = tmp_path / f"BENCH_r{n:02d}.json"
    p.write_text(json.dumps({"parsed": parsed}))
    return p


def _base_round(**over):
    parsed = {
        "queries": {"q1": 1.0, "q2": 2.0},
        "deep": {"queries": {"q1": 4.0}},
        "flagship": {"chunks_per_sec": 1000.0},
        "streaming": {"rows_per_sec": 50000.0},
    }
    parsed.update(over)
    return parsed


def test_no_history_returns_empty_gate(tmp_path):
    out = _regression_gate({"queries": {"q1": 9.9}}, here=str(tmp_path))
    assert out == {"baseline_round": None, "threshold": _GATE_RATIO,
                   "flagged": {}}


def test_query_regression_flagged_against_last_round(tmp_path):
    _write_round(tmp_path, 1, _base_round())
    _write_round(tmp_path, 2, _base_round(queries={"q1": 1.0, "q2": 0.5}))
    now = {"queries": {"q1": 1.6, "q2": 0.6},  # q1 1.6x>1.5x; q2 vs r2's 0.5
           "deep": {"queries": {"q1": 4.1}}}
    out = _regression_gate(now, here=str(tmp_path))
    assert out["baseline_round"] == 2
    assert set(out["flagged"]) == {"q1"}
    assert out["flagged"]["q1"]["prev"] == 1.0  # r2, not r1


def test_query_regression_absolute_floor_ignores_warmup_jitter(tmp_path):
    _write_round(tmp_path, 1, _base_round(queries={"q1": 0.1}))
    out = _regression_gate({"queries": {"q1": 0.4}}, here=str(tmp_path))
    assert out["flagged"] == {}  # 4x slower but under the 0.5s floor


def test_deep_section_flagged_with_prefix(tmp_path):
    _write_round(tmp_path, 1, _base_round())
    now = {"queries": {}, "deep": {"queries": {"q1": 7.0}}}
    out = _regression_gate(now, here=str(tmp_path))
    assert set(out["flagged"]) == {"deep:q1"}


def test_throughput_gates_against_median_of_last_three(tmp_path):
    # the recorded flagship shape: one lucky round must not ratchet
    for n, v in ((4, 1173.0), (5, 1055.0), (6, 1993.0)):
        _write_round(tmp_path, n, _base_round(
            flagship={"chunks_per_sec": v}))
    # healthy steady-state above median(1173)/1.5: NOT flagged, even
    # though it is far below the single prior round's 1993
    ok = {"flagship": {"chunks_per_sec": 1300.0}}
    assert _regression_gate(ok, here=str(tmp_path))["flagged"] == {}
    # a real collapse below median/1.5 IS flagged, with the window
    bad = {"flagship": {"chunks_per_sec": 700.0}}
    out = _regression_gate(bad, here=str(tmp_path))
    fl = out["flagged"]["flagship:chunks_per_sec"]
    assert fl["prev"] == 1173.0
    assert fl["window"] == [1173.0, 1055.0, 1993.0]


def test_throughput_median_uses_only_last_three_rounds(tmp_path):
    for n, v in ((1, 99999.0), (4, 900.0), (5, 1000.0), (6, 1100.0)):
        _write_round(tmp_path, n, _base_round(
            streaming={"rows_per_sec": v}))
    # median excludes r1's outlier: baseline is 1000, so 600 < 1000/1.5
    out = _regression_gate({"streaming": {"rows_per_sec": 600.0}},
                           here=str(tmp_path))
    assert out["flagged"]["streaming:rows_per_sec"]["prev"] == 1000.0


def test_soak_gate_is_absolute_not_round_over_round(tmp_path):
    _write_round(tmp_path, 1, _base_round())
    now = {"soak": {"queries": {
        "q45": {"lo_sec": 1.0, "hi_sec": 5.0, "ratio": 5.0},
        "q103": {"lo_sec": 1.0, "hi_sec": SOAK_MAX_RATIO * 1.0 + 1,
                 "ratio": SOAK_MAX_RATIO + 1.0},
    }}}
    out = _regression_gate(now, here=str(tmp_path))
    assert set(out["flagged"]) == {"soak:q103"}


def test_flagship_skew_must_stay_within_2x_of_even(tmp_path):
    _write_round(tmp_path, 1, _base_round())
    now = {"flagship": {"chunks_per_sec": 1000.0,
                        "skew": {"chunks_per_sec": 400.0}}}
    out = _regression_gate(now, here=str(tmp_path))
    assert "flagship_skew:chunks_per_sec" in out["flagged"]
    ok = {"flagship": {"chunks_per_sec": 1000.0,
                       "skew": {"chunks_per_sec": 600.0}}}
    assert "flagship_skew:chunks_per_sec" not in _regression_gate(
        ok, here=str(tmp_path))["flagged"]


def test_unparseable_history_file_is_skipped(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    _write_round(tmp_path, 2, _base_round())
    out = _regression_gate({"queries": {"q1": 1.05}}, here=str(tmp_path))
    assert out["baseline_round"] == 2
    assert out["flagged"] == {}
