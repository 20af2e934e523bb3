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
    events: DataFrame, path: str, bucket: str = "1 hour"
) -> None:
    """Materialize the fine-grained rollup, partitioned by bucket date."""
    # NB: Columns must be built lazily — module-level Column constants
    # require an active SparkContext at import time
    rollup_aggs = (
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
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
        )
    )
    hourly.write.mode("overwrite").partitionBy("bucket_date").parquet(path)


def refresh_rollup(
    events_delta: DataFrame, path: str, bucket: str = "1 hour"
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
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.to_date(F.col("w.start")).alias("bucket_date"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
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
) -> DataFrame:
    """Answer a coarser-grain question exactly from the rollup: algebraic
    aggregates re-aggregate losslessly (sum of sums, min of mins, ...)."""
    rollup = spark.read.parquet(path)
    return (
        rollup.groupBy(
            F.date_trunc(grain, F.col("bucket_start")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
            F.round(F.min("min_value"), 2).alias("min_value"),
            F.round(F.max("max_value"), 2).alias("max_value"),
        )
    )
