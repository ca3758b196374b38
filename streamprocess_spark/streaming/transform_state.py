"""Per-key running state on the transformWithState API — Spark 4's
arbitrary-stateful successor to applyInPandasWithState.

The engine's main custom stateful operator (streaming/sessionizer.py,
SURVEY T1-T9) uses applyInPandasWithState; this module covers the NEW
API surface (StatefulProcessor + typed ValueState handles) with the
reference's simplest stateful contract: the per-session running
accumulator (`SessionState` counters, stt_worker.py:433-467 — per-key
totals that survive across micro-batches and emit an updated row per
batch, i.e. the partial-result revision stream of T6 in miniature).

Determinism: the running sum uses the per-row fixed-point image
(floor(value·1e6) as int64, plans/util.py), so the converged total is
order- and batch-split-independent — replaying the same events in 1
or N micro-batches converges to the identical (n, sum_fp) per key.

ENVIRONMENT GATE: transformWithState's state protocol needs the
``protobuf`` package (pyspark/sql/streaming/proto/StateMessage_pb2)
and the RocksDB state store provider. ``protobuf`` is not available
in this container, so the operator is exercised by a skip-gated test
(tests/test_transform_state.py) and is NOT in the oracle registry;
the production stateful path remains streaming/sessionizer.py
(applyInPandasWithState, fully tested). Use
:func:`transform_with_state_available` before calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_fp bigint"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """True iff the runtime can execute transformWithState (its state
    protocol imports google.protobuf in a separate driver worker)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class RunningUserStats(StatefulProcessor):
    """ValueState-backed running (count, fixed-point sum) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n bigint, s bigint")

    def handleInputRows(self, key, rows, timerValues):
        prev = self._agg.get()
        n, s = (int(prev[0]), int(prev[1])) if prev is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            s += int(
                np.floor(pdf["value"].to_numpy(dtype="float64") * 1_000_000.0)
                .astype("int64")
                .sum()
            )
        self._agg.update((n, s))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "sum_fp": [s]}
        )

    def close(self) -> None:
        pass


def running_user_stats(stream_df: DataFrame) -> DataFrame:
    """events stream → per-user running totals, one revision row per
    (user, micro-batch) in update mode."""
    return (
        stream_df.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
