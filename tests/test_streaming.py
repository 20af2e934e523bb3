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
