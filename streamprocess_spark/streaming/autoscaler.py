"""Autoscaler control loop (SURVEY §2 A10/A11 runtime consumer; the
reference's scaling CONTROLLER, src/autoscaler/controller.py:253-330):
per worker type, walk the metric stream in event-time order, compute a
capacity-model target, and apply scale_up / scale_down / no_change
decisions under a cooldown — the stateful recurrence q_autoscale_plan's
stateless capacity query feeds.

Reference semantics reproduced:
  - capacity target = ceil(arrival_rate / target_utilization /
    service_rate), clamped to [min, max] (controller.py:315-330,
    config defaults 0.8/0.3 thresholds folded into the single
    capacity model per SURVEY's simplification note)
  - cooldown: no action within COOLDOWN_S of the last applied scale
    (controller.py:258-268; autoscale_cooldown_seconds)
  - last_scale advances ONLY when an action is applied

The recurrence (replicas, last_scale) is inherently sequential per
worker type — the legitimate imperative-stateful exception, run as
groupBy(worker_type).applyInPandas exactly like the sessionizer
(groups are tiny: one row per metric window). All arithmetic is
rational doubles + exact ceil/clamp, so a DuckDB recursive CTE
replays every decision bit-for-bit (q121's oracle).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SERVICE_RATE = 2.0        # jobs/s/worker (controller.py:131-135, STT)
TARGET_UTIL = 0.7         # target utilization headroom
MIN_WORKERS = 1
MAX_WORKERS = 20
COOLDOWN_S = 1800.0       # 300 s scaled to the 5-min metric cadence
_NEG_INF = -1.0e12


DECISION_SCHEMA = T.StructType([
    T.StructField("worker_type", T.StringType()),
    T.StructField("window_start", T.TimestampType()),
    T.StructField("rate", T.DoubleType()),
    T.StructField("target", T.LongType()),
    T.StructField("replicas", T.LongType()),
    T.StructField("action", T.StringType()),
])


def capacity_target(rate: float) -> int:
    """controller.py:315-330 capacity model, clamped."""
    t = math.ceil(rate / TARGET_UTIL / SERVICE_RATE)
    return max(MIN_WORKERS, min(MAX_WORKERS, t))


def controller_step(
    pdf: pd.DataFrame, replicas: int, last_scale: float
) -> tuple[pd.DataFrame, int, float]:
    """Seedable recurrence core: apply the control loop to a batch of
    metric windows starting from (replicas, last_scale); returns the
    decisions plus the carried-forward state (the streaming form
    persists it in GroupState across micro-batches)."""
    pdf = pdf.sort_values("window_start", ignore_index=True)
    rows = []
    for r in pdf.itertuples(index=False):
        ws = r.ws_epoch
        target = capacity_target(r.rate)
        if ws - last_scale < COOLDOWN_S:
            action = "no_change"
        elif target > replicas:
            action, replicas, last_scale = "scale_up", target, ws
        elif target < replicas:
            action, replicas, last_scale = "scale_down", target, ws
        else:
            action = "no_change"
        rows.append({
            "worker_type": r.worker_type,
            "window_start": r.window_start,
            "rate": r.rate,
            "target": target,
            "replicas": replicas,
            "action": action,
        })
    return pd.DataFrame(rows), replicas, last_scale


def run_controller(pdf: pd.DataFrame) -> pd.DataFrame:
    """One worker type's full metric history → decisions (batch form)."""
    out, _, _ = controller_step(pdf, MIN_WORKERS, _NEG_INF)
    return out


def autoscaler_decisions(metrics: DataFrame) -> DataFrame:
    """metrics: (worker_type, window_start timestamp, ws_epoch double,
    rate double) → decision stream. One tiny group per worker type."""
    return metrics.groupBy("worker_type").applyInPandas(
        run_controller, schema=DECISION_SCHEMA
    )


def autoscale_stream_fn(key, pdf_iter, state):
    """applyInPandasWithState form: (replicas, last_scale) persists in
    GroupState across micro-batches, so a resumed/checkpointed run
    continues the cooldown exactly where it left off — the streaming
    twin of q121 (decisions converge to the batch recurrence on full
    replay)."""
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    if state.exists:
        replicas, last_scale = state.get
    else:
        replicas, last_scale = MIN_WORKERS, _NEG_INF
    out, replicas, last_scale = controller_step(pdf, int(replicas), float(last_scale))
    state.update((int(replicas), float(last_scale)))
    yield out


STATE_SCHEMA = T.StructType([
    T.StructField("replicas", T.LongType()),
    T.StructField("last_scale", T.DoubleType()),
])


def autoscaler_stream_decisions(metrics_stream: DataFrame) -> DataFrame:
    return metrics_stream.groupBy("worker_type").applyInPandasWithState(
        autoscale_stream_fn,
        outputStructType=DECISION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
