"""Backpressure gate semantics (SURVEY P5/P6): hysteresis pause/resume
at the reference's 0.8/0.6 watermarks (src/grpc_server/backpressure.py:
77-127) and the 4-level degradation ladder (:219-238)."""

from __future__ import annotations

from streamprocess_spark.io.queue_source import enqueue_job
from streamprocess_spark.streaming.backpressure import (
    DEGRADATION_PARAMS,
    BackpressureGate,
    degradation_level,
    queue_depth,
)


class TestGateHysteresis:
    def test_pauses_at_high_watermark(self):
        g = BackpressureGate(max_depth=100)
        assert g.update(79) is False
        assert g.update(80) is True          # >= 0.8 → pause
        assert g.total_pauses == 1

    def test_stays_paused_between_watermarks(self):
        """The hysteresis band: dropping below high does NOT resume."""
        g = BackpressureGate(max_depth=100)
        g.update(85)
        assert g.update(70) is True          # 0.6 < 0.7 < 0.8 → still paused
        assert g.update(61) is True
        assert g.update(60) is False         # <= 0.6 → resume
        assert g.total_pauses == 1

    def test_unpaused_band_never_flaps(self):
        g = BackpressureGate(max_depth=100)
        for d in (10, 70, 79, 70, 79):       # oscillate under high
            g.update(d)
        assert g.total_pauses == 0 and not g.paused

    def test_admit_blocks_while_paused(self):
        g = BackpressureGate(max_depth=10)
        assert g.admit(depth=2, n=5) == 5    # open: full offer admitted
        assert g.admit(depth=9, n=5) == 0    # 0.9 → paused
        assert g.admit(depth=7, n=5) == 0    # hysteresis: still paused
        assert g.admit(depth=6, n=5) == 4    # resumed, capacity-capped
        assert g.total_pauses == 1

    def test_stats_shape(self):
        g = BackpressureGate(max_depth=1000)
        g.update(800)
        s = g.stats()
        assert s["is_paused"] and s["utilization"] == 0.8
        assert s["high_watermark"] == 0.8 and s["low_watermark"] == 0.6


class TestDegradationLadder:
    def test_levels_match_reference_thresholds(self):
        # backpressure.py:231-238: <0.7→0, <0.8→1, <0.9→2, else 3
        assert degradation_level(0.0) == 0
        assert degradation_level(0.69) == 0
        assert degradation_level(0.7) == 1
        assert degradation_level(0.79) == 1
        assert degradation_level(0.8) == 2
        assert degradation_level(0.89) == 2
        assert degradation_level(0.9) == 3
        assert degradation_level(1.5) == 3

    def test_params_monotone(self):
        """Higher levels never relax the emission cadence."""
        prev = 0
        for lvl in (1, 2, 3):
            cur = DEGRADATION_PARAMS[lvl]["partial_interval_ms"]
            assert cur >= prev
            prev = cur
        assert DEGRADATION_PARAMS[0] == {}


def test_queue_depth_observes_backlog(tmp_path):
    qdir = str(tmp_path / "q")
    for i in range(5):
        enqueue_job(qdir, "normal", {"job_id": f"j{i}", "type": "t"})
    enqueue_job(qdir, "realtime", {"job_id": "rt", "type": "t"})
    assert queue_depth(qdir) == 6
    assert queue_depth(qdir, {"normal": 3}) == 3
    assert queue_depth(qdir, {"normal": 5, "realtime": 1}) == 0


def test_producer_gate_end_to_end(tmp_path):
    """Producer loop + gate: offered jobs above the high watermark are
    deferred, intake resumes after the consumer drains past the low
    watermark — queue depth never exceeds max_depth."""
    qdir = str(tmp_path / "qg")
    gate = BackpressureGate(max_depth=10)
    offered = [{"job_id": f"j{i}", "type": "t"} for i in range(14)]
    committed: dict[str, int] = {}
    enqueued = deferred = 0
    for job in offered[:12]:
        if gate.admit(queue_depth(qdir, committed), 1):
            enqueue_job(qdir, "normal", job)
            enqueued += 1
        else:
            deferred += 1
    assert enqueued == 8 and deferred == 4   # paused at depth 8 (0.8)
    # consumer drains 6 (commit offsets) → utilization 0.2 ≤ 0.6 → resume
    committed["normal"] = 6
    for job in offered[12:]:
        if gate.admit(queue_depth(qdir, committed), 1):
            enqueue_job(qdir, "normal", job)
            enqueued += 1
    assert enqueued == 10
    assert gate.total_pauses == 1
