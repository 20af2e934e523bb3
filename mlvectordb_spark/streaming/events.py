"""Structured Streaming over event data (SURVEY.md §7 Phase 7).

The reference's only "stream" is REST inserts; here the events table gets a
real streaming surface: file-source ingest → watermarked windowed
aggregation / sessionization / dedup → any sink. The transformations are
the SAME DataFrame expressions as the batch twins in queries.py
(events_tumbling / events_sessionize / events_first_per_key), which is the
point of Structured Streaming: one logical plan, two execution modes.

Scale posture: the file source at 100 TB becomes Kafka/object-store
listing; watermarks bound state (late events beyond the watermark are
dropped deterministically); session windows and dedup state live in the
state store, keyed and partitioned by user/event — no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source streaming read of events parquet (one file = one
    micro-batch increment; swap for Kafka in production).

    Streaming sources need the schema declared up front, and the events
    table has shipped `ts` both as parquet TIMESTAMP(NANOS) (reads as long
    nanos under the legacy conf) and as TIMESTAMP(MICROS) — so probe the
    footer with a batch read (metadata-only, no data scan) and normalize to
    TimestampType either way, mirroring sources/testdata.py."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_is_nanos = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    except AnalysisException:
        # an empty source dir is a NORMAL state for a file stream waiting
        # for its first file (round-3 advice) — there is no footer to
        # probe, so assume the modern micros encoding; a nanos-era file
        # landing later in a fresh dir is a config change, not a runtime
        # state to guess at
        ts_is_nanos = False
    raw = (
        spark.readStream.schema(
            _events_schema(T.LongType() if ts_is_nanos else T.TimestampType())
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    if ts_is_nanos:
        # integer `div` keeps the conversion exact (double division rounds
        # the last microsecond at ~1.7e15 ns)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. The watermark
    bounds state: windows older than max(ts) - watermark are finalized and
    evicted; later-arriving events for them are dropped."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window counts (each event lands in
    window/slide overlapping windows) — the true-stream twin of
    queries.q_events_sliding; state is bounded the same way as
    tumbling_counts."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionized_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (session_window closes after `gap` of
    inactivity) — the streaming twin of the batch lag/cumsum sessionizer."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key dedup on event_id within the watermark horizon
    (late-data handling: duplicate state older than the watermark is
    evicted, bounding memory)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_to_memory_sink(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain the stream into an in-memory table with availableNow (test /
    local harness helper): processes everything currently available, then
    stops."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
