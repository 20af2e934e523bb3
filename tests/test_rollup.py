"""Continuous-aggregate rollup: coarser grains re-aggregate exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.rollup import build_rollup, query_rollup
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
