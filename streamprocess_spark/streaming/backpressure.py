"""Backpressure admission gate (SURVEY §2.11 / §4 P5-P6).

The reference pauses producers when queue utilization crosses a high
watermark and resumes below a low watermark, with hysteresis
(src/grpc_server/backpressure.py:77-127, defaults 0.8/0.6 from
src/config.py:150-153), and degrades processing parameters in four
levels as utilization climbs (backpressure.py:171-247).

Spark-side split of those semantics:
  - CONSUMER intake pacing is the engine's job: the priority_queue
    source's ``max_records_per_batch`` option bounds how many records
    any trigger admits (maxOffsetsPerTrigger analog) — see
    io/queue_source.py. That keeps per-executor memory flat no matter
    how deep the backlog gets; at 100 TB a trigger can never inhale an
    unbounded queue.
  - PRODUCER admission is this module: a synchronous hysteresis gate
    driven by observed queue depth (A5) / consumer lag (A6), usable in
    a foreachBatch or an enqueue loop. No asyncio — a micro-batch
    boundary is the natural pacing point.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class BackpressureGate:
    """Hysteresis pause/resume gate.

    Pauses when utilization >= high_watermark, resumes only once it
    falls back to <= low_watermark — crossing down through `high` alone
    does NOT resume (that gap is what prevents flapping).
    """

    max_depth: int = 10_000          # queue cap (config.py:61 maxlen)
    high_watermark: float = 0.8      # pause threshold (config.py:150-153)
    low_watermark: float = 0.6       # resume threshold
    paused: bool = field(default=False, init=False)
    total_pauses: int = field(default=0, init=False)
    depth: int = field(default=0, init=False)

    def utilization(self) -> float:
        return self.depth / self.max_depth if self.max_depth > 0 else 0.0

    def update(self, depth: int) -> bool:
        """Feed the latest observed depth; returns the paused state."""
        self.depth = int(depth)
        util = self.utilization()
        if not self.paused and util >= self.high_watermark:
            self.paused = True
            self.total_pauses += 1
        elif self.paused and util <= self.low_watermark:
            self.paused = False
        return self.paused

    def should_pause(self) -> bool:
        return self.paused

    def admit(self, depth: int, n: int = 1) -> int:
        """Producer admission: how many of ``n`` offered records may be
        enqueued at the observed depth. A paused gate admits nothing
        until utilization recovers past the low watermark; an open gate
        admits up to the remaining capacity. This is the engine-side
        ``wait_for_capacity`` (backpressure.py:133-154) without
        blocking: the caller retries the remainder next batch."""
        if self.update(depth):
            return 0
        return max(0, min(n, self.max_depth - self.depth))

    def stats(self) -> dict:
        return {
            "is_paused": self.paused,
            "current_depth": self.depth,
            "max_depth": self.max_depth,
            "utilization": self.utilization(),
            "total_pauses": self.total_pauses,
            "high_watermark": self.high_watermark,
            "low_watermark": self.low_watermark,
        }


def degradation_level(utilization: float) -> int:
    """4-level load shedding ladder (backpressure.py:219-238):
    0 normal < 0.7 <= 1 light < 0.8 <= 2 moderate < 0.9 <= 3 severe."""
    if utilization < 0.7:
        return 0
    if utilization < 0.8:
        return 1
    if utilization < 0.9:
        return 2
    return 3


# Parameter ladders, re-expressed as engine knobs rather than model
# knobs: what each level changes in a Spark pipeline. The reference's
# ladder trades decode quality for throughput (backpressure.py:176-217);
# the engine analog trades trigger granularity and optional stages.
DEGRADATION_PARAMS: dict[int, dict] = {
    0: {},
    1: {"partial_interval_ms": 300, "chunk_size_ms": 500},
    2: {"partial_interval_ms": 500, "chunk_size_ms": 1000,
        "skip_optional_stages": True},
    3: {"partial_interval_ms": 1000, "chunk_size_ms": 2000,
        "skip_optional_stages": True, "sample_rate": 8000},
}


def queue_depth(path: str, committed: dict | None = None) -> int:
    """Observed backlog of a priority_queue directory: committed lines
    minus consumed offsets (A5 queue depth / A6 consumer lag)."""
    from streamprocess_spark.io.queue_source import (
        PRIORITIES,
        _count_lines,
        _log_path,
    )

    committed = committed or {}
    return sum(
        max(0, _count_lines(_log_path(path, p)) - int(committed.get(p, 0)))
        for p in PRIORITIES
    )
