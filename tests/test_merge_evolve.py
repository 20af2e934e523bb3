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


def test_streaming_ingest_gates_expectations_into_quarantine(spark, tmp_path):
    """expect_or_drop on the CDC ingest: violating rows never reach the
    table; they land in the quarantine dir with _failed_rules + batch id."""
    import json as _json
    import os
    import time

    from mlvectordb_spark.operators.expectations import (
        Expectations,
        in_range,
        not_null,
    )
    from mlvectordb_spark.streaming.merge_sink import start_table_merge

    src = tmp_path / "cdc"
    src.mkdir()
    batches = [
        [
            {"id": 1, "val": 10.0, "seq": 1, "deleted": False},
            {"id": 2, "val": -5.0, "seq": 1, "deleted": False},  # range
            {"id": 3, "val": None, "seq": 1, "deleted": False},  # not_null
        ],
        [
            {"id": 1, "val": 11.0, "seq": 2, "deleted": False},
            {"id": 4, "val": 999.0, "seq": 2, "deleted": False},  # range
        ],
    ]
    base = time.time() - 1000
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        os.utime(p, (base + i, base + i))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("val", T.DoubleType(), True),
            T.StructField("seq", T.LongType(), False),
            T.StructField("deleted", T.BooleanType(), False),
        ]
    )
    table = MergedTable(spark, str(tmp_path / "table"), n_buckets=4)
    exp = Expectations([not_null("val"), in_range("val", 0.0, 100.0)])
    q = start_table_merge(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src)),
        table,
        on="id",
        order_col="seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="t_gated_ingest",
        delete_col="deleted",
        expectations=exp,
        quarantine_dir=str(tmp_path / "quarantine"),
        metrics_dir=str(tmp_path / "metrics"),
    )
    q.awaitTermination()
    got = {r["id"]: r["val"] for r in table.df().collect()}
    assert got == {1: 11.0}
    bad = spark.read.parquet(str(tmp_path / "quarantine"))
    rows = {
        (r["id"], r["__batch_id"]): set(r["_failed_rules"])
        for r in bad.collect()
    }
    assert rows == {
        (2, 0): {"in_range_val"},
        (3, 0): {"not_null_val"},
        (4, 1): {"in_range_val"},
    }
    metrics = spark.read.parquet(str(tmp_path / "metrics"))
    got = {
        (r["__batch_id"], r["rule"]): (r["violations"], r["total"])
        for r in metrics.collect()
    }
    assert got == {
        (0, "not_null_val"): (1, 3),
        (0, "in_range_val"): (1, 3),
        (1, "not_null_val"): (0, 2),
        (1, "in_range_val"): (1, 2),
    }


def test_join_mv_refresh_from_recorded_table_feeds(spark, tmp_path):
    """End-to-end IVM over TWO versioned tables: fact and dim both
    maintained by recorded merges; the join view refreshes from their
    recorded CDF feeds + time travel, matching a rebuild of the new
    join — zero snapshot diffs."""
    from mlvectordb_spark.operators.mv import (
        build_mv,
        incremental_refresh_join,
    )
    from mlvectordb_spark.streaming.merge_sink import (
        apply_merge_batch,
        table_changes,
    )

    fact = MergedTable(spark, str(tmp_path / "fact"), n_buckets=4)
    dim = MergedTable(spark, str(tmp_path / "dim"), n_buckets=4)
    f0 = spark.createDataFrame(
        [(1, 10, 1.0, 1), (2, 10, 2.0, 1), (3, 20, 4.0, 1)],
        "id long, k long, amt double, seq long",
    )
    d0 = spark.createDataFrame(
        [(10, "a", 1), (20, "b", 1)], "k long, seg string, seq long"
    )
    apply_merge_batch(fact, f0, 0, "id", "seq", record_changes=True)
    apply_merge_batch(dim, d0, 0, "k", "seq", record_changes=True)
    mv0 = build_mv(
        fact.df_at(0).drop("seq").join(dim.df_at(0).select("k", "seg"), "k"),
        ["seg"],
        ["amt"],
    ).localCheckpoint(eager=True)
    # step: fact updates id=1 and inserts id=4@k=20; dim moves k=20 to c
    apply_merge_batch(
        fact,
        spark.createDataFrame(
            [(1, 10, 100.0, 2), (4, 20, 8.0, 2)],
            "id long, k long, amt double, seq long",
        ),
        1,
        "id",
        "seq",
        record_changes=True,
    )
    apply_merge_batch(
        dim,
        spark.createDataFrame([(20, "c", 2)], "k long, seg string, seq long"),
        1,
        "k",
        "seq",
        record_changes=True,
    )
    ffeed = table_changes(fact, 0, 1, on="id", preimage=True).drop("seq")
    dfeed = table_changes(dim, 0, 1, on="k", preimage=True).drop("seq")
    mv1 = incremental_refresh_join(
        mv0,
        ffeed,
        dfeed,
        dim.df_at(0).select("k", "seg"),
        fact.df_at(1).drop("seq"),
        "k",
        ["seg"],
        ["amt"],
    )
    want = build_mv(
        fact.df_at(1).drop("seq").join(dim.df_at(1).select("k", "seg"), "k"),
        ["seg"],
        ["amt"],
    )
    as_d = lambda df: {  # noqa: E731
        r["seg"]: (r["cnt"], r["sum_amt"]) for r in df.collect()
    }
    assert as_d(mv1) == as_d(want)
