"""Custom stateful streaming operator via applyInPandasWithState.

Per-user online statistics over the event stream: running event count,
running value sum, and an EWMA of `value` — state the built-in windowed
aggregates can't express (EWMA is order-dependent and unbounded-horizon).

State design for scale: keyed by user_id (hash-partitioned across the
cluster by the state store), one fixed-size tuple per user, with an
EVENT-TIME timeout tied to the stream's watermark so abandoned keys are
evicted instead of accumulating forever. Event-time (not processing-time)
timeouts are the right choice here twice over: eviction follows the data's
own clock under replay/backfill, and a ProcessingTimeTimeout keeps
scheduling wake-up micro-batches after the source drains, so
Trigger.AvailableNow backfills never terminate (observed on Spark 4.1).
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
# Keys idle for this much EVENT time past the watermark are evicted:
# without a timeout, per-user state grows with the all-time user count —
# unbounded at stream scale.
STATE_TTL_MS = 30 * 60 * 1000
WATERMARK_DELAY = "10 minutes"


def _update_user_stats(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle-key eviction: drop the state, emit nothing
        state.remove()
        return
    if state.exists:
        n, total, ewma = state.get
    else:
        n, total, ewma = 0, 0.0, None
    for pdf in pdfs:
        # event-time order within the batch for a deterministic EWMA
        pdf = pdf.sort_values(["ts", "event_id"])
        vals = pdf["value"].astype(float)
        if len(vals):
            n += int(len(vals))
            total += float(vals.sum())
            # vectorized order-dependent recurrence: ewm(adjust=False)
            # computes s_t = α·v_t + (1-α)·s_{t-1}; the carry-in state is
            # prepended so the first batch element folds against it
            if ewma is not None:
                vals = pd.concat(
                    [pd.Series([float(ewma)]), vals], ignore_index=True
                )
            ewma = float(
                vals.ewm(alpha=EWMA_ALPHA, adjust=False).mean().iloc[-1]
            )
    state.update((n, total, ewma if ewma is not None else 0.0))
    # re-arm the eviction clock: this key survives until the watermark
    # passes TTL beyond the last batch that touched it
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + STATE_TTL_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "ewma_value": [ewma if ewma is not None else 0.0],
        }
    )


def user_running_stats(
    stream: DataFrame, watermark_delay: str = WATERMARK_DELAY
) -> DataFrame:
    """Stateful per-user stats stream: emits the updated stats row for each
    user touched by each micro-batch. The watermark both bounds late data
    and drives state eviction (EventTimeTimeout)."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- stateful ordered funnel (the streaming twin of queries.q_events_funnel)

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_OUTPUT_SCHEMA = "user_id long, t1 double, t2 double, t3 double"
# epoch-second stage timestamps; -1.0 = stage not yet reached
FUNNEL_STATE_SCHEMA = "t1 double, t2 double, t3 double"


def _update_funnel(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    t1, t2, t3 = state.get if state.exists else (-1.0, -1.0, -1.0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, et in zip(pdf["ts"], pdf["event_type"]):
            s = ts.timestamp()
            if et == FUNNEL_STAGES[0] and t1 < 0:
                t1 = s
            elif et == FUNNEL_STAGES[1] and t1 >= 0 and s > t1 and t2 < 0:
                t2 = s
            elif et == FUNNEL_STAGES[2] and t2 >= 0 and s > t2 and t3 < 0:
                t3 = s
    state.update((t1, t2, t3))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + STATE_TTL_MS)
    yield pd.DataFrame(
        {"user_id": [user_id], "t1": [t1], "t2": [t2], "t3": [t3]}
    )


def user_funnel_stream(
    stream: DataFrame, watermark_delay: str = WATERMARK_DELAY
) -> DataFrame:
    """Streaming ordered funnel view → click → purchase: per user, the
    first view, the first click strictly after it, the first purchase
    strictly after that — maintained ONLINE as events arrive, the
    streaming twin of the batch `events_funnel` window chain. State is one
    fixed 3-double tuple per user with event-time TTL eviction, so memory
    follows the ACTIVE-user working set; each micro-batch emits the
    updated stage row per touched user (update mode — consumers keep the
    latest row per user).

    Equals the batch funnel whenever events arrive in event-time order
    across micro-batches (the stream-twin test's contract); within a
    micro-batch, events are explicitly re-sorted by (ts, event_id), so
    intra-batch disorder never changes the result. A view arriving in a
    LATER batch than a click it precedes is the inherent streaming funnel
    approximation — the greedy state cannot rewrite history (the batch
    twin is the replayable source of truth, same relationship as
    sessionize and its session_window twin)."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
