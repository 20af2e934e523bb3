"""Incremental materialized-view maintenance (operators/mv.py) against
full rebuilds, plus the preimage form of the CDF feed that powers it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.mv import (
    build_mv,
    build_mv_minmax,
    incremental_refresh,
    incremental_refresh_minmax,
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


def test_minmax_partial_recompute_handles_extremum_deletes(spark, tmp_path):
    """Deleting a group's current minimum is exactly the case signed
    deltas cannot express — the partial-recompute path must surface the
    runner-up, and untouched groups must carry forward bit-identically."""
    rows = [
        (1, "a", 1.0, 1, False),  # group-a minimum — will be deleted
        (2, "a", 5.0, 1, False),
        (3, "a", 9.0, 1, False),
        (4, "b", 2.0, 1, False),  # group b untouched by the batch
        (5, "b", 8.0, 1, False),
    ]
    table = _mk_table(spark, tmp_path / "t", rows)
    mv = build_mv_minmax(table.df_at(0), ["g"], ["val"]).localCheckpoint(
        eager=True
    )
    b1 = spark.createDataFrame(
        [(1, "a", 0.0, 2, True), (6, "a", 7.5, 2, False)], SCHEMA
    )
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    refreshed = incremental_refresh_minmax(
        mv, feed, table.df_at(1), ["g"], ["val"]
    )
    full = build_mv_minmax(table.df_at(1), ["g"], ["val"])
    as_rows = lambda df: {
        r["g"]: (r["cnt"], r["sum_val"], r["min_val"], r["max_val"])
        for r in df.collect()
    }
    got = as_rows(refreshed)
    assert got == as_rows(full)
    assert got["a"] == (3, 21.5, 5.0, 9.0)  # runner-up min surfaced
    # the recompute regroups ONLY affected groups: the snapshot scan is
    # pruned by a PUSHED predicate on the single affected group key, and
    # group b's rows enter the plan solely through the carried
    # (left_anti broadcast) branch
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert 'PushedFilters: [IsNotNull(g), EqualTo(g,a)]' in plan, plan


def test_minmax_pushdown_prunes_snapshot_scan(spark, tmp_path):
    """With a bounded affected set and a single group column, the
    recompute side filters the snapshot with an isin PREDICATE (reaches
    the parquet reader as a pushed filter) instead of a semi-join —
    and the result still matches the full rebuild."""
    rows = [(i, "g" + str(i % 5), float(i), 1, False) for i in range(40)]
    table = _mk_table(spark, tmp_path / "t", rows)
    mvx = build_mv_minmax(table.df_at(0), ["g"], ["val"]).localCheckpoint(
        eager=True
    )
    b1 = spark.createDataFrame([(0, "g0", 400.0, 2, False)], SCHEMA)
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    out = incremental_refresh_minmax(
        mvx, feed, table.df_at(1), ["g"], ["val"]
    )
    full = build_mv_minmax(table.df_at(1), ["g"], ["val"])
    as_set = lambda df: {
        (r["g"], r["cnt"], r["sum_val"], r["min_val"], r["max_val"])
        for r in df.collect()
    }
    assert as_set(out) == as_set(full)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    # Catalyst collapses a one-element In to EqualTo — either way the
    # group predicate reached the parquet reader
    assert re.search(r"PushedFilters: \[[^\]]*(In|EqualTo)\(g,", plan), plan
    # above the threshold it falls back to the null-safe semi-join
    fallback = incremental_refresh_minmax(
        mvx, feed, table.df_at(1), ["g"], ["val"], max_pushdown_groups=0
    )
    assert as_set(fallback) == as_set(full)
    fplan = fallback._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in fplan, fplan


def test_merged_table_sort_cols_cluster_files(spark, tmp_path):
    """sort_cols is persisted in the table meta, adopted on reopen, and
    rows inside each written bucket file come out clustered by it."""
    from mlvectordb_spark.streaming.merge_sink import MergedTable

    path = str(tmp_path / "t")
    table = MergedTable(spark, path, n_buckets=2, sort_cols=["g"])
    b0 = spark.createDataFrame(
        [(i, "g" + str(i % 7), float(i), 1, False) for i in range(70)], SCHEMA
    )
    apply_merge_batch(table, b0, 0, "id", "seq", "deleted")
    reopened = MergedTable(spark, path)
    assert reopened.sort_cols == ["g"] and reopened.n_buckets == 2
    import glob

    for f in glob.glob(f"{path}/v*/__bucket=*/part-*.parquet"):
        gs = [r["g"] for r in spark.read.parquet(f).collect()]
        assert gs == sorted(gs), f  # clustered within the file
    # reopening with a DIFFERENT sort preference persists it (meta is
    # rewritten), so a later default reopen adopts the new value instead
    # of silently dropping the clustering
    changed = MergedTable(spark, path, sort_cols=["val"])
    b1 = spark.createDataFrame([(99, "zz", 0.5, 2, False)], SCHEMA)
    apply_merge_batch(changed, b1, 1, "id", "seq", "deleted")
    assert MergedTable(spark, path).sort_cols == ["val"]


def test_null_group_keys_merge_not_duplicate(spark, tmp_path):
    """groupBy puts NULL keys in one real group, so the refresh joins
    must match NULL to NULL (null-safe equality) — plain equality split
    a NULL-keyed group into duplicate rows that compounded per refresh,
    and the min/max prune neither recomputed nor evicted it."""
    rows = [
        (1, None, 1.0, 1, False),
        (2, None, 2.0, 1, False),
        (3, "a", 3.0, 1, False),
    ]
    table = _mk_table(spark, tmp_path / "t", rows)
    mv = build_mv(table.df_at(0), ["g"], ["val"]).localCheckpoint(eager=True)
    mvx = build_mv_minmax(table.df_at(0), ["g"], ["val"]).localCheckpoint(
        eager=True
    )
    b1 = spark.createDataFrame(
        [(1, None, 0.0, 2, True), (9, None, 9.0, 2, False)], SCHEMA
    )
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    inc = incremental_refresh(mv, feed, ["g"], ["val"])
    assert _as_dict(inc) == _as_dict(build_mv(table.df_at(1), ["g"], ["val"]))
    assert inc.filter(F.col("g").isNull()).count() == 1  # ONE null group
    incx = incremental_refresh_minmax(
        mvx, feed, table.df_at(1), ["g"], ["val"]
    )
    full = build_mv_minmax(table.df_at(1), ["g"], ["val"])
    key = lambda df: {
        (r["g"], r["cnt"], r["sum_val"], r["min_val"], r["max_val"])
        for r in df.collect()
    }
    assert key(incx) == key(full) and len(key(incx)) == 2


def test_integer_measures_keep_type_and_null_sums(spark, tmp_path):
    """Refreshed sums must match the rebuild's SCHEMA, not just values:
    integer measures stay integral (coalescing with 0.0 used to promote
    bigint sums to double, losing >2^53 precision), and a group whose
    measures are all NULL keeps sum NULL instead of becoming 0."""
    schema = "id bigint, g string, m bigint, seq bigint, deleted boolean"
    table = MergedTable(spark, str(tmp_path / "t"), n_buckets=4)
    b0 = spark.createDataFrame(
        [(1, "a", 10, 1, False), (2, "a", 20, 1, False), (3, "n", None, 1, False)],
        schema,
    )
    apply_merge_batch(table, b0, 0, "id", "seq", "deleted")
    mv0 = build_mv(table.df_at(0), ["g"], ["m"]).localCheckpoint(eager=True)
    b1 = spark.createDataFrame(
        [(1, "a", 11, 2, False), (4, "n", None, 2, False)], schema
    )
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    inc = incremental_refresh(mv0, feed, ["g"], ["m"])
    full = build_mv(table.df_at(1), ["g"], ["m"])
    assert dict(inc.dtypes)["sum_m"] == dict(full.dtypes)["sum_m"], (
        inc.dtypes, full.dtypes,
    )
    as_d = lambda df: {r["g"]: (r["cnt"], r["sum_m"]) for r in df.collect()}
    got = as_d(inc)
    assert got == as_d(full)
    assert got["a"] == (2, 31) and got["n"] == (2, None)


def test_post_only_feed_rejected(spark, tmp_path):
    """A post-only feed ('update' rows) must fail at execution — the
    check rides inside the aggregation pass (assert_true), so the feed
    plan is never evaluated twice just to validate it."""
    table = _mk_table(spark, tmp_path / "t", [(1, "a", 1.0, 1, False)])
    b1 = spark.createDataFrame([(1, "a", 2.0, 2, False)], SCHEMA)
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    post_only = table_changes(table, 0, 1, on="id")  # 'update' rows
    with pytest.raises(Exception, match="preimage"):
        mv_delta(post_only, ["g"], ["val"]).collect()


def test_generic_recompute_maintains_topk_and_distinct(spark, tmp_path):
    """incremental_refresh_recompute generalizes the partial-recompute
    leg to ANY non-subtractable aggregate: a per-group top-2 list and an
    exact count-distinct view refresh correctly through updates and
    deletes that evict current top elements."""
    from mlvectordb_spark.operators.mv import incremental_refresh_recompute

    def build_topk(df):
        return (
            df.groupBy("g")
            .agg(
                F.slice(F.sort_array(F.collect_list("val"), asc=False), 1, 2).alias("top2"),
                F.count_distinct("val").alias("n_distinct"),
            )
        )

    table = _mk_table(
        spark,
        tmp_path / "t",
        [
            (1, "a", 5.0, 1, False),
            (2, "a", 9.0, 1, False),
            (3, "a", 7.0, 1, False),
            (4, "b", 1.0, 1, False),
            (5, "b", 1.0, 1, False),
        ],
    )
    mv0 = build_topk(table.df_at(0)).localCheckpoint(eager=True)
    # delete a's current max (9.0) and update b's 1.0 -> 2.0: both force
    # runner-up recomputation a subtractive path cannot express
    b1 = spark.createDataFrame(
        [(2, "a", 0.0, 2, True), (4, "b", 2.0, 2, False)], SCHEMA
    )
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id", preimage=True)
    mv1 = incremental_refresh_recompute(
        mv0, feed, table.df_at(1), ["g"], build_topk
    )
    got = {r["g"]: (r["top2"], r["n_distinct"]) for r in mv1.collect()}
    want = {
        r["g"]: (r["top2"], r["n_distinct"])
        for r in build_topk(table.df_at(1)).collect()
    }
    assert got == want
    assert got["a"] == ([7.0, 5.0], 2)
    assert got["b"] == ([2.0, 1.0], 2)
