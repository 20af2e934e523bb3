"""Continuous-aggregate rollup: coarser grains re-aggregate exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.rollup import (
    build_rollup,
    query_rollup,
    refresh_rollup,
)
from mlvectordb_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def rollup_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup") / "hourly")
    build_rollup(load_table(spark, sf_dir, "events"), path)
    return path


def test_daily_from_rollup_equals_direct(spark, sf_dir, rollup_path):
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.bucket, r.event_type): (r.n, round(r.s, 2), r.lo, r.hi)
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .collect()
    }
    from_rollup = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in query_rollup(spark, rollup_path, "day").collect()
    }
    assert from_rollup == direct


def test_incremental_refresh_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Building from 80% of events then folding in the remaining 20% must
    equal a from-scratch build over everything."""
    from mlvectordb_spark.operators.rollup import refresh_rollup

    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")
    build_rollup(first, inc_path)
    refresh_rollup(delta, inc_path)
    build_rollup(ev, full_path)
    key = ["bucket_start", "event_type"]
    inc = {
        tuple(r[k] for k in key): (r.n_events, round(r.sum_value, 6))
        for r in spark.read.parquet(inc_path).collect()
    }
    full = {
        tuple(r[k] for k in key): (r.n_events, round(r.sum_value, 6))
        for r in spark.read.parquet(full_path).collect()
    }
    assert inc == full


def test_rollup_partitioned_by_date(spark, rollup_path):
    """Date partitioning → time-range queries prune partitions."""
    rollup = spark.read.parquet(rollup_path)
    one_day = rollup.filter(F.col("bucket_date") == "2024-01-02")
    plan = one_day._sc._jvm.PythonSQLUtils.explainString(
        one_day._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert one_day.count() > 0


def test_hll_distinct_merge_equals_oneshot(spark, sf_dir, tmp_path):
    """The mergeable-sketch property the HLL columns exist for: an
    incremental build (build + refresh) must produce the SAME daily
    distinct estimates as a one-shot build — sketch union is exact over
    merge order, so the streaming refresh path never drifts."""
    ev = load_table(spark, sf_dir, "events")
    p1, p2 = str(tmp_path / "one"), str(tmp_path / "inc")
    build_rollup(ev, p1, distinct_col="user_id")
    build_rollup(ev.filter(F.col("event_id") % 3 != 0), p2, distinct_col="user_id")
    refresh_rollup(ev.filter(F.col("event_id") % 3 == 0), p2, distinct_col="user_id")
    key = ["bucket", "event_type"]
    a = {
        tuple(r[k] for k in key): r.approx_distinct_user_id
        for r in query_rollup(spark, p1, "day", distinct_col="user_id").collect()
    }
    b = {
        tuple(r[k] for k in key): r.approx_distinct_user_id
        for r in query_rollup(spark, p2, "day", distinct_col="user_id").collect()
    }
    assert a == b and len(a) > 0


def test_hll_estimate_error_bound(spark, tmp_path):
    """At estimation-mode cardinality (100k distinct >> 2^12 registers)
    the daily estimate must stay within the published ~1.6%/sqrt(2^lgk)
    envelope (x3 safety: 5%)."""
    n = 200_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") % 2) * 86400
            ).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("id") % 100 / 10.0).alias("value"),
        )
    )
    path = str(tmp_path / "big")
    build_rollup(ev, path, distinct_col="user_id")
    got = {
        r.bucket: r.approx_distinct_user_id
        for r in query_rollup(spark, path, "day", distinct_col="user_id").collect()
    }
    exact = {
        r.bucket: r.n
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert len(got) == 2
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)


def test_hll_daily_not_sum_of_hourly(spark, tmp_path):
    """Users active in several hours must not be double-counted: the
    daily estimate comes from sketch UNION, so it is far below the sum
    of hourly estimates when users repeat across hours."""
    n = 50_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(86400))
            ).alias("ts"),
            F.pmod("id", F.lit(500)).alias("user_id"),  # every user, every hour
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
    )
    path = str(tmp_path / "rep")
    build_rollup(ev, path, distinct_col="user_id")
    daily = query_rollup(spark, path, "day", distinct_col="user_id").collect()
    assert len(daily) == 1
    hourly_sum = (
        query_rollup(spark, path, "hour", distinct_col="user_id")
        .agg(F.sum("approx_distinct_user_id"))
        .collect()[0][0]
    )
    assert abs(daily[0].approx_distinct_user_id - 500) / 500 < 0.03
    assert hourly_sum >= 500 * 20  # ~24 hours x 500 users each
