"""Hypertable-style continuous aggregates (time-bucketed rollups).

The timeseries-DB pattern: maintain a materialized fine-grained rollup
(e.g. hourly) and answer coarser questions (daily/weekly) from the rollup
instead of the raw events. All chosen aggregates are algebraic
(count/sum/min/max), so re-aggregation from the rollup is EXACT — and at
100 TB the rollup is orders of magnitude smaller than the event stream,
making dashboard-class queries interactive.

Scale posture: the rollup table is partitioned by bucket date → coarser
queries prune to the requested time range; refresh is incremental by
re-rolling only the buckets a new micro-batch touched (pair with
streaming/events.tumbling_counts, whose windows are exactly these buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def build_rollup(
    events: DataFrame,
    path: str,
    bucket: str = "1 hour",
    distinct_col: str | None = None,
    lgk: int = 12,
) -> None:
    """Materialize the fine-grained rollup, partitioned by bucket date.

    With `distinct_col`, each bucket row also stores a Datasketches HLL
    sketch (`hll_sketch_agg`, binary, ~2^lgk bytes) of the column — the
    MERGEABLE distinct-count state that count(distinct) lacks: sketches
    re-aggregate to any coarser grain (`hll_union_agg`) without touching
    raw events, the property that makes distinct-users-per-day a
    rollup-servable question at 100 TB. Estimates are approximate
    (~1.6%/sqrt(2^lgk) relative error) but deterministic and
    merge-order-independent — the streaming refresh path yields
    bit-identical sketches to a one-shot build (asserted in
    tests/test_rollup.py).
    """
    # NB: Columns must be built lazily — module-level Column constants
    # require an active SparkContext at import time
    rollup_aggs = [
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]
    extra_cols = []
    if distinct_col is not None:
        hll_col = f"hll_{distinct_col}"
        rollup_aggs.append(
            F.hll_sketch_agg(F.col(distinct_col), F.lit(lgk)).alias(hll_col)
        )
        extra_cols = [hll_col]
    hourly = (
        events.groupBy(
            F.window(F.col("ts"), bucket).alias("w"), F.col("event_type")
        )
        .agg(*rollup_aggs)
        .select(
            F.col("w.start").alias("bucket_start"),
            F.to_date(F.col("w.start")).alias("bucket_date"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
            *extra_cols,
        )
    )
    hourly.write.mode("overwrite").partitionBy("bucket_date").parquet(path)


def refresh_rollup(
    events_delta: DataFrame,
    path: str,
    bucket: str = "1 hour",
    distinct_col: str | None = None,
    lgk: int = 12,
) -> None:
    """Incremental refresh: fold a new batch of events into the rollup by
    re-aggregating ONLY the date partitions the batch touches.

    Algebraic aggregates merge associatively, so the existing rollup rows
    for touched dates union with the delta's rollup and re-aggregate —
    untouched partitions are never read or written (dynamic partition
    overwrite). This is the foreachBatch body that keeps a continuous
    aggregate current under streaming ingest."""
    spark = events_delta.sparkSession
    delta_hourly = (
        events_delta.groupBy(
            F.window(F.col("ts"), bucket).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            *(
                [
                    F.hll_sketch_agg(F.col(distinct_col), F.lit(lgk)).alias(
                        f"hll_{distinct_col}"
                    )
                ]
                if distinct_col is not None
                else []
            ),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.to_date(F.col("w.start")).alias("bucket_date"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
            *([f"hll_{distinct_col}"] if distinct_col is not None else []),
        )
    )
    touched = [r.bucket_date for r in delta_hourly.select("bucket_date").distinct().collect()]
    # eager localCheckpoint materializes the touched rows BEFORE the
    # overwrite below — Spark must never lazily re-read a path it is
    # overwriting
    existing = (
        spark.read.parquet(path)
        .filter(F.col("bucket_date").isin(touched))
        .localCheckpoint(eager=True)
    )
    merged = (
        existing.unionByName(delta_hourly)
        .groupBy("bucket_start", "bucket_date", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            *(
                [
                    F.hll_union_agg(F.col(f"hll_{distinct_col}")).alias(
                        f"hll_{distinct_col}"
                    )
                ]
                if distinct_col is not None
                else []
            ),
        )
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("bucket_date").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def query_rollup(
    spark: SparkSession,
    path: str,
    grain: str = "day",
    distinct_col: str | None = None,
) -> DataFrame:
    """Answer a coarser-grain question exactly from the rollup: algebraic
    aggregates re-aggregate losslessly (sum of sums, min of mins, ...).

    With `distinct_col` (and a rollup built with the same), the coarser
    grain also reports the HLL-estimated distinct count — sketch UNION
    then estimate, so a day's distinct users is NOT the sum of its hours'
    (the whole point of storing the mergeable state, not the number)."""
    rollup = spark.read.parquet(path)
    aggs = [
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.round(F.sum("sum_value"), 2).alias("sum_value"),
        F.round(F.min("min_value"), 2).alias("min_value"),
        F.round(F.max("max_value"), 2).alias("max_value"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col(f"hll_{distinct_col}"))
            ).alias(f"approx_distinct_{distinct_col}")
        )
    return (
        rollup.groupBy(
            F.date_trunc(grain, F.col("bucket_start")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(*aggs)
    )
