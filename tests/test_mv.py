"""Incremental materialized-view maintenance (operators/mv.py) against
full rebuilds, plus the preimage form of the CDF feed that powers it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.mv import (
    build_mv,
    incremental_refresh,
    mv_delta,
)
from mlvectordb_spark.streaming.merge_sink import (
    MergedTable,
    apply_merge_batch,
    table_changes,
)

SCHEMA = "id bigint, g string, val double, seq bigint, deleted boolean"


def _mk_table(spark, path, rows):
    table = MergedTable(spark, str(path), n_buckets=4)
    b0 = spark.createDataFrame(rows, SCHEMA)
    apply_merge_batch(table, b0, 0, "id", "seq", "deleted")
    return table


def _as_dict(df):
    return {
        r["g"]: (r["cnt"], round(r["sum_val"], 6)) for r in df.collect()
    }


def test_preimage_feed_shape(spark, tmp_path):
    table = _mk_table(
        spark,
        tmp_path / "t",
        [(1, "a", 1.0, 1, False), (2, "a", 2.0, 1, False), (3, "b", 3.0, 1, False)],
    )
    b1 = spark.createDataFrame(
        [(1, "a", 10.0, 2, False), (3, "b", 0.0, 2, True), (4, "c", 4.0, 2, False)],
        SCHEMA,
    )
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    got = {(r["id"], r["_change_type"]): r["val"] for r in feed.collect()}
    assert got == {
        (1, "update_preimage"): 1.0,
        (1, "update_postimage"): 10.0,
        (3, "delete"): 3.0,
        (4, "insert"): 4.0,
    }


def test_incremental_matches_full_rebuild(spark, tmp_path):
    rows = [(i, "g" + str(i % 3), float(i), 1, False) for i in range(30)]
    table = _mk_table(spark, tmp_path / "t", rows)
    mv0 = build_mv(table.df_at(0), ["g"], ["val"])
    b1 = spark.createDataFrame(
        [(0, "g0", 100.0, 2, False), (1, "g1", 0.0, 2, True), (90, "g0", 9.0, 2, False)],
        SCHEMA,
    )
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    inc = incremental_refresh(mv0, feed, ["g"], ["val"])
    full = build_mv(table.df_at(1), ["g"], ["val"])
    assert _as_dict(inc) == _as_dict(full)


def test_refreshes_chain_and_groups_drop(spark, tmp_path):
    table = _mk_table(
        spark,
        tmp_path / "t",
        [(1, "solo", 5.0, 1, False), (2, "pair", 1.0, 1, False), (3, "pair", 2.0, 1, False)],
    )
    mv = build_mv(table.df_at(0), ["g"], ["val"])
    # batch 1 deletes the only member of 'solo'
    b1 = spark.createDataFrame([(1, "solo", 0.0, 2, True)], SCHEMA)
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    mv = incremental_refresh(
        mv, table_changes(table, 0, 1, on="id", preimage=True), ["g"], ["val"]
    )
    assert _as_dict(mv) == {"pair": (2, 3.0)}  # emptied group dropped
    # batch 2 opens a brand-new group; refreshes chain off the refreshed mv
    b2 = spark.createDataFrame([(9, "fresh", 7.0, 3, False)], SCHEMA)
    apply_merge_batch(table, b2, 2, "id", "seq", "deleted")
    mv = incremental_refresh(
        mv, table_changes(table, 1, 2, on="id", preimage=True), ["g"], ["val"]
    )
    assert _as_dict(mv) == _as_dict(build_mv(table.df_at(2), ["g"], ["val"]))


def test_refresh_reads_only_the_pruned_feed(spark, tmp_path):
    """The refresh plan's ONLY parquet scans are the two bucket-pruned
    version reads inside the feed — the materialized view contributes no
    base-table lineage, so refresh cost is O(changed buckets) + O(view),
    never O(table)."""
    import re

    rows = [(i, "g" + str(i % 3), float(i), 1, False) for i in range(64)]
    table = _mk_table(spark, tmp_path / "t", rows)
    mv0 = build_mv(table.df_at(0), ["g"], ["val"]).localCheckpoint(eager=True)
    b1 = spark.createDataFrame([(5, "g2", 555.0, 2, False)], SCHEMA)
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    refreshed = incremental_refresh(mv0, feed, ["g"], ["val"])
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 2, plan  # feed's old + new version reads, nothing else
    for ln in scans:
        assert re.search(r"PartitionFilters: \[[^\]]*__bucket", ln), ln


def test_post_only_feed_rejected(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t", [(1, "a", 1.0, 1, False)])
    b1 = spark.createDataFrame([(1, "a", 2.0, 2, False)], SCHEMA)
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    post_only = table_changes(table, 0, 1, on="id")  # 'update' rows
    with pytest.raises(ValueError, match="preimage"):
        mv_delta(post_only, ["g"], ["val"])
