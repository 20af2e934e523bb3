"""Stream-stream interval join — event attribution as events ARRIVE.

The one Structured Streaming operator class the event surface hadn't
covered: joining two live streams (here: views to the purchases that
follow them within a tolerance — the standard attribution join). Spark
plans this as a symmetric state-store join; the two pieces that make it
bounded at scale are BOTH mandatory and encoded here:

- a watermark on EACH side (state for events older than the watermark is
  evicted), and
- a time-range predicate tying the two event times together (without it
  the state store would have to hold every past row forever).

The join kernel (`attribution_pairs`) is one DataFrame expression shared
verbatim with the batch twin (`queries.q_events_attribution`, DuckDB-
oracle-checked) — the Structured Streaming principle used throughout this
repo: one logical plan, two execution modes, so the oracle-checked batch
result IS the specification of what the stream computes.

Scale shape: the join shuffles both sides on user_id once; per-key state
is bounded by (watermark horizon × per-user event rate). At 100 TB-scale
ingest the file sources become Kafka topics; nothing else changes.

Reference analog: none (the reference has no streaming surface at all);
this belongs to the LLM-pipeline/event extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_TOLERANCE = "30 minutes"


def split_views_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two join sides out of an event table/stream: views
    (user_id, view_id, view_ts) and purchases (user_id, purchase_id,
    purchase_ts)."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return views, purchases


def attribution_pairs(
    views: DataFrame,
    purchases: DataFrame,
    tolerance: str = ATTRIBUTION_TOLERANCE,
) -> DataFrame:
    """Every (view, purchase) pair for the same user with
    view_ts <= purchase_ts <= view_ts + tolerance, plus the lag in
    seconds. Works identically on batch DataFrames and on watermarked
    streams (where the range predicate doubles as the state-eviction
    bound)."""
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {tolerance}")
        )
    )
    return (
        views.join(purchases, cond)
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            F.round(
                F.col("purchase_ts").cast("double")
                - F.col("view_ts").cast("double"),
                1,
            ).alias("lag_s"),
        )
    )


def stream_attribution(
    view_stream: DataFrame,
    purchase_stream: DataFrame,
    tolerance: str = ATTRIBUTION_TOLERANCE,
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming twin: watermark both sides, then the shared kernel.
    Append-mode safe (inner interval join); state per user is bounded by
    the watermark horizon."""
    # split each side independently so the watermarks attach to the
    # streaming sources, not a union
    v, _ = split_views_purchases(view_stream.withWatermark("ts", watermark))
    _, p = split_views_purchases(
        purchase_stream.withWatermark("ts", watermark)
    )
    return attribution_pairs(v, p, tolerance)


def stream_static_enrich(
    stream: DataFrame, profile: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich a live event stream with a static (or
    slowly-refreshed) profile table. The static side is re-planned per
    micro-batch, so a profile refresh lands without restarting the query;
    at scale the static side is the broadcast candidate and the stream
    never shuffles for the join. Left join — an unknown key must not drop
    the event (the enrichment is advisory, the event is the record)."""
    return stream.join(F.broadcast(profile), key, "left")
