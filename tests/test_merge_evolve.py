"""Schema evolution: merge_into(evolve_schema=) and the MergedTable
version-sidecar machinery that keeps hard-linked CoW buckets readable
across an evolution (Delta `mergeSchema` analog; the reference has no
table surface at all — src/mlvectordb/interfaces/storage_engine.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.merge import merge_into
from mlvectordb_spark.streaming.merge_sink import (
    MergedTable,
    apply_merge_batch,
    table_changes,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, val double"
    )


def _source_extra(spark):
    # id=2 updates, id=9 inserts; both carry the new `score` column
    return spark.createDataFrame(
        [(2, 21.0, 0.9), (9, 90.0, 0.5)], "id long, val double, score double"
    )


def test_merge_into_default_ignores_new_columns(spark):
    out = merge_into(_target(spark), _source_extra(spark), on="id")
    assert out.columns == ["id", "val"]
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0, 9: 90.0}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_merge_into_evolves_schema(spark, strategy):
    out = merge_into(
        _target(spark),
        _source_extra(spark),
        on="id",
        evolve_schema=True,
        strategy=strategy,
    )
    assert out.columns == ["id", "val", "score"]
    got = {r["id"]: (r["val"], r["score"]) for r in out.collect()}
    # untouched rows read NULL in the new column; matched + inserted
    # rows take the source value
    assert got == {
        1: (10.0, None),
        2: (21.0, 0.9),
        3: (30.0, None),
        9: (90.0, 0.5),
    }


def test_merge_into_evolve_with_explicit_update_set(spark):
    # update_set may reference the evolved column (it exists on the
    # widened target before clause validation)
    out = merge_into(
        _target(spark),
        _source_extra(spark),
        on="id",
        update_set={"score": F.col("s.score") * 2},
        evolve_schema=True,
    )
    got = {r["id"]: (r["val"], r["score"]) for r in out.collect()}
    assert got[2] == (20.0, 1.8)  # val untouched by update_set
    assert got[9] == (90.0, 0.5)  # insert takes the plain source value


def test_evolution_cannot_create_merge_keys(spark):
    # a merge key missing from the target must raise, not widen to NULL
    # (NULL keys match nothing: every source row would insert — silent
    # duplicate-key corruption)
    src = spark.createDataFrame(
        [(2, "eu", 21.0)], "id long, region string, val double"
    )
    with pytest.raises(ValueError, match="join keys"):
        merge_into(_target(spark), src, on=["id", "region"], evolve_schema=True)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id long, val double, seq long, deleted boolean"
    )


def _batch_scored(spark, rows):
    return spark.createDataFrame(
        rows, "id long, val double, score double, seq long, deleted boolean"
    )


def _apply_evolution_rounds(spark, path, n_buckets, record=False):
    """v0 bootstraps 8 keys (old schema), v1 merges a 2-key batch that
    adds `score` with evolve_schema=True. Returns the table."""
    t = MergedTable(spark, str(path), n_buckets=n_buckets)
    apply_merge_batch(
        t,
        _batch(
            spark,
            [(i, float(i) * 10, 1, False) for i in range(1, 9)],
        ),
        0,
        on="id",
        order_col="seq",
        delete_col="deleted",
        record_changes=record,
    )
    apply_merge_batch(
        t,
        _batch_scored(
            spark,
            [(2, 21.0, 0.9, 2, False), (9, 90.0, 0.5, 2, False)],
        ),
        1,
        on="id",
        order_col="seq",
        delete_col="deleted",
        record_changes=record,
        evolve_schema=True,
    )
    return t


@pytest.mark.parametrize("n_buckets", [0, 8])
def test_table_evolves_and_old_buckets_read_null(spark, tmp_path, n_buckets):
    t = _apply_evolution_rounds(spark, tmp_path / "t", n_buckets)
    cur = t.df().orderBy("id").collect()
    assert t.df().columns[:3] == ["id", "val", "seq"]
    assert "score" in t.df().columns
    by_id = {r["id"]: (r["val"], r["score"]) for r in cur}
    assert by_id[2] == (21.0, 0.9)
    assert by_id[9] == (90.0, 0.5)
    # rows in buckets the evolving merge never rewrote (hard-linked
    # forward with the OLD footer) must read NULL via the schema sidecar
    for i in (1, 3, 4, 5, 6, 7, 8):
        assert by_id[i] == (float(i) * 10, None)
    # time travel keeps the pre-evolution schema
    assert "score" not in t.df_at(0).columns


def test_evolution_without_flag_ignores_new_columns(spark, tmp_path):
    t = MergedTable(spark, str(tmp_path / "t"), n_buckets=4)
    apply_merge_batch(
        t, _batch(spark, [(1, 10.0, 1, False)]), 0,
        on="id", order_col="seq", delete_col="deleted",
    )
    apply_merge_batch(
        t, _batch_scored(spark, [(1, 11.0, 0.9, 2, False)]), 1,
        on="id", order_col="seq", delete_col="deleted",
        record_changes=True,  # recorded feed must not reference `score`
    )
    assert "score" not in t.df().columns
    assert t.df().collect()[0]["val"] == 11.0
    feed = table_changes(t, 0, 1, on="id")
    assert "score" not in feed.columns


@pytest.mark.parametrize("record", [False, True])
def test_table_changes_across_evolution_boundary(spark, tmp_path, record):
    """Both the snapshot-diff path (record=False) and the recorded-feed
    path agree: only the two merged keys changed; pre-evolution rows do
    not spuriously diff on the NULL-filled new column."""
    t = _apply_evolution_rounds(spark, tmp_path / "t", 8, record=record)
    feed = table_changes(t, 0, 1, on="id", preimage=True)
    rows = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert rows == {
        (2, "update_preimage"),
        (2, "update_postimage"),
        (9, "insert"),
    }
    post = {
        r["id"]: r["score"]
        for r in feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).collect()
    }
    assert post == {2: 0.9, 9: 0.5}


def test_composed_feed_across_evolution_boundary(spark, tmp_path):
    """A v0→v2 catch-up composed from recorded step feeds straddling the
    evolution: pre-boundary feed rows read NULL for the new column."""
    t = _apply_evolution_rounds(spark, tmp_path / "t", 8, record=True)
    # one more recorded post-evolution batch so composition has 2 steps
    apply_merge_batch(
        t,
        _batch_scored(spark, [(2, 22.0, 0.95, 3, False)]),
        2,
        on="id",
        order_col="seq",
        delete_col="deleted",
        record_changes=True,
        evolve_schema=True,
    )
    feed = table_changes(t, 0, 2, on="id", preimage=True)
    rows = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert rows == {
        (2, "update_preimage"),
        (2, "update_postimage"),
        (9, "insert"),
    }
    post = {
        r["id"]: (r["val"], r["score"])
        for r in feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).collect()
    }
    assert post == {2: (22.0, 0.95), 9: (90.0, 0.5)}


def test_vacuum_after_evolution_keeps_current_readable(spark, tmp_path):
    t = _apply_evolution_rounds(spark, tmp_path / "t", 8)
    t.vacuum(retain_last=1)
    assert t.versions() == [1]
    assert t.df().count() == 9
    assert {r["id"] for r in t.df().filter(F.col("score").isNull()).collect()} == {
        1, 3, 4, 5, 6, 7, 8
    }
