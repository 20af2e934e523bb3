"""Structured Streaming tests: the streaming operators must agree with
their batch twins on the same data (one logical plan, two modes)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.queries import QUERIES
from mlvectordb_spark.sources.testdata import load_table
from mlvectordb_spark.streaming.events import (
    read_event_stream,
    run_to_memory_sink,
    sessionized_counts,
    stream_dedup,
    tumbling_counts,
)

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    # the file streaming source requires a DIRECTORY of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS_PATH, d / "part-000.parquet")
    return read_event_stream(spark, str(d))


def test_stream_starts_on_empty_directory(spark, tmp_path):
    """A file stream waiting for its first file is a normal state: the
    schema probe must not throw on an empty source dir (round-3 advice)."""
    d = tmp_path / "empty_events"
    d.mkdir()
    stream = read_event_stream(spark, str(d))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_stream_tumbling_matches_batch(spark, stream, sf_dir):
    run_to_memory_sink(tumbling_counts(stream), "t_tumbling", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("t_tumbling").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in QUERIES["events_tumbling"](spark, sf_dir).collect()
    }
    assert got == batch


def test_stream_dedup_passes_unique_ids(spark, stream):
    run_to_memory_sink(stream_dedup(stream), "t_dedup", "append")
    n = spark.table("t_dedup").count()
    batch_n = load_table(spark, "/root/testdata/sf0.001", "events").count()
    # source event_ids are already unique → dedup must be a no-op
    assert n == batch_n
    assert spark.table("t_dedup").select("event_id").distinct().count() == n


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data handling: an event arriving in a later micro-batch with a
    timestamp far behind the watermark must be dropped from the windowed
    aggregation (state for its window was already finalized)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "late_events"
    d.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pdf["ts"].astype("int64")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), str(d / name))

    base_ns = 1_700_000_000 * 10**9
    hour = 3600 * 10**9
    # batch 1: events in hours 0..4 — watermark advances to max-2h = h2
    write_batch(
        "b1.parquet",
        [(i, base_ns + i * hour, 1, "view", 1.0, "{}") for i in range(5)],
    )
    # batch 2: one late event in hour 0 (far behind watermark) + one fresh
    write_batch(
        "b2.parquet",
        [
            (100, base_ns + int(0.5 * hour), 1, "view", 1.0, "{}"),  # LATE
            (101, base_ns + 5 * hour, 1, "view", 1.0, "{}"),  # fresh
        ],
    )
    stream = read_event_stream(spark, str(d))
    q = (
        tumbling_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.window_start.hour: r.n_events for r in spark.table("t_late").collect()}
    # hour-0 window must contain ONLY the on-time event: the late arrival
    # (event 100) was dropped because the watermark had passed its window
    assert rows.get(0, 0) == 1


def test_stream_sessionize_counts(spark, stream, sf_dir):
    run_to_memory_sink(sessionized_counts(stream), "t_sessions", "complete")
    sess = spark.table("t_sessions")
    # session totals per user must equal the batch sessionizer's
    got = {
        (r.user_id): (r.n_sessions, r.n_events)
        for r in sess.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in QUERIES["events_sessionize"](spark, sf_dir).collect()
    }
    assert got == batch
    # sessions must respect the gap: end-to-start separation within a user
    rows = sess.orderBy("user_id", "session_start").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        for a, b in zip(user_rows, user_rows[1:]):
            assert (b.session_start - a.session_end).total_seconds() >= 0


def test_stream_sliding_matches_batch(spark, stream, sf_dir):
    from mlvectordb_spark.streaming.events import sliding_counts

    run_to_memory_sink(sliding_counts(stream), "t_sliding", "complete")
    got = {
        (r.window_start, r.n_events) for r in spark.table("t_sliding").collect()
    }
    batch = {
        (r.window_start, r.n_events)
        for r in QUERIES["events_sliding"](spark, sf_dir).collect()
    }
    assert got == batch


def test_stream_stream_attribution_matches_batch(spark, tmp_path, sf_dir):
    """The stream-stream interval join (two watermarked sources, range
    predicate) produces exactly the batch twin's oracle-checked pairs."""
    from mlvectordb_spark.streaming.joins import stream_attribution

    ev = load_table(spark, sf_dir, "events")
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == "view").write.parquet(vdir)
    ev.filter(F.col("event_type") == "purchase").write.parquet(pdir)
    schema = ev.schema
    vs = spark.readStream.schema(schema).parquet(vdir)
    ps = spark.readStream.schema(schema).parquet(pdir)
    joined = stream_attribution(vs, ps)
    run_to_memory_sink(joined, "attribution_sink")
    got = {
        (r.user_id, r.view_id, r.purchase_id, r.lag_s)
        for r in spark.sql("SELECT * FROM attribution_sink").collect()
    }
    want = {
        (r.user_id, r.view_id, r.purchase_id, r.lag_s)
        for r in QUERIES["events_attribution"](spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_enrich_matches_batch(spark, stream, sf_dir):
    """Stream-static left join: per-user profile columns attach to every
    streamed event exactly as they do in batch."""
    from mlvectordb_spark.streaming.joins import stream_static_enrich

    ev = load_table(spark, sf_dir, "events")
    profile = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("lifetime_value"),
        F.count("*").alias("n_hist_events"),
    )
    enriched = stream_static_enrich(stream, profile).select(
        "event_id", "user_id", "lifetime_value", "n_hist_events"
    )
    run_to_memory_sink(enriched, "enrich_sink")
    got = {
        (r.event_id, r.user_id, r.lifetime_value, r.n_hist_events)
        for r in spark.sql("SELECT * FROM enrich_sink").collect()
    }
    want = {
        (r.event_id, r.user_id, r.lifetime_value, r.n_hist_events)
        for r in ev.join(F.broadcast(profile), "user_id", "left")
        .select("event_id", "user_id", "lifetime_value", "n_hist_events")
        .collect()
    }
    assert got == want and len(want) > 0
