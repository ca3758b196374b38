"""Operational metrics (SURVEY M7, A5-A13 ops analogs) via
StreamingQueryListener.

The reference exports Prometheus counters/gauges/histograms from every
component (queue depth redis_queue.py:346-362, consumer lag :364-380,
dequeue-latency histogram :241-244, per-label counters
stt_worker.py:21-39). In Spark the engine already emits the
equivalents on every micro-batch through StreamingQueryProgress; this
listener adapts them to the reference's metric vocabulary:

  queue depth (A5)      -> state rows (numRowsTotal per state operator)
  consumer lag (A6)     -> inputRowsPerSecond vs processedRowsPerSecond
  latency histogram (A7/A8) -> batch durationMs percentiles
  throughput (A8)       -> processedRowsPerSecond
  grouped counters (A13)-> per-query per-batch row counts

Driver-side only and O(#batches) memory — never touches executor data
paths, so it adds zero overhead at 100 TB.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchRecord:
    query_id: str
    batch_id: int
    num_input_rows: int
    input_rows_per_sec: float
    processed_rows_per_sec: float
    batch_duration_ms: int
    state_rows: int


@dataclass
class OpsMetrics:
    batches: list[BatchRecord] = field(default_factory=list)

    def _durations(self) -> list[int]:
        return sorted(b.batch_duration_ms for b in self.batches)

    @staticmethod
    def _pct(sorted_vals: list[int], q: float) -> float:
        if not sorted_vals:
            return 0.0
        i = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
        return float(sorted_vals[i])

    def summary(self) -> dict:
        """The reference's benchmark summary shape
        (run_benchmarks.py:582-611): throughput + p50/p95/p99."""
        d = self._durations()
        total_rows = sum(b.num_input_rows for b in self.batches)
        total_ms = sum(d) or 1
        return {
            "n_batches": len(self.batches),
            "total_input_rows": total_rows,
            "rows_per_sec": 1000.0 * total_rows / total_ms,
            "batch_ms_p50": self._pct(d, 0.50),
            "batch_ms_p95": self._pct(d, 0.95),
            "batch_ms_p99": self._pct(d, 0.99),
            "max_state_rows": max((b.state_rows for b in self.batches), default=0),
        }


class OpsMetricsListener(StreamingQueryListener):
    """Collects per-micro-batch progress for all queries on a session."""

    def __init__(self) -> None:
        self.metrics = OpsMetrics()
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(op.numRowsTotal for op in (p.stateOperators or []))
        rec = BatchRecord(
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            input_rows_per_sec=p.inputRowsPerSecond or 0.0,
            processed_rows_per_sec=p.processedRowsPerSecond or 0.0,
            batch_duration_ms=int(p.durationMs.get("triggerExecution", 0)),
            state_rows=state_rows,
        )
        with self._lock:
            self.metrics.batches.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> OpsMetricsListener:
    listener = OpsMetricsListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: OpsMetricsListener) -> None:
    spark.streams.removeListener(listener)
