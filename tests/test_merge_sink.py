"""Streaming CDC → merged table (streaming/merge_sink.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from mlvectordb_spark.streaming.merge_sink import (
    MergedTable,
    start_table_merge,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("seq", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)


def _write_batches(src, batches):
    import os
    import time

    base = time.time() - 1000
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        # the file source orders batches by mtime; sub-ms writes tie and
        # the tie-break is arbitrary — pin strictly increasing mtimes
        os.utime(p, (base + i, base + i))


def test_cdc_stream_merges_into_table(spark, tmp_path):
    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(
        src,
        [
            # b0: bootstrap inserts (incl. an in-batch dup: seq 2 wins)
            [
                {"id": 1, "val": 10.0, "seq": 1, "deleted": False},
                {"id": 2, "val": 20.0, "seq": 1, "deleted": False},
                {"id": 2, "val": 21.0, "seq": 2, "deleted": False},
                {"id": 3, "val": 30.0, "seq": 1, "deleted": False},
            ],
            # b1: update 2 (latest-in-batch wins), delete 3, insert 4,
            # delete-never-existed 99 (must not ghost-insert)
            [
                {"id": 2, "val": 22.0, "seq": 3, "deleted": False},
                {"id": 2, "val": 23.0, "seq": 4, "deleted": False},
                {"id": 3, "val": 0.0, "seq": 5, "deleted": True},
                {"id": 4, "val": 40.0, "seq": 6, "deleted": False},
                {"id": 99, "val": 0.0, "seq": 7, "deleted": True},
            ],
            # b2: re-insert a previously deleted key
            [{"id": 3, "val": 33.0, "seq": 8, "deleted": False}],
        ],
    )
    table = MergedTable(spark, str(tmp_path / "table"))
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_table_merge(
        stream,
        table,
        on="id",
        order_col="seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="t_merge_sink",
        delete_col="deleted",
    )
    q.awaitTermination()

    got = {r["id"]: (r["val"], r["seq"]) for r in table.df().collect()}
    assert got == {
        1: (10.0, 1),
        2: (23.0, 4),
        3: (33.0, 8),
        4: (40.0, 6),
    }
    # delete marker column stays out of the table
    assert "deleted" not in table.df().columns
    # versions advanced monotonically with batch ids
    assert table.current_version() == 2


def test_out_of_order_batch_cannot_overwrite_newer(spark, tmp_path):
    """CDC monotonicity guard: a late-arriving OLDER batch must not
    clobber newer rows (the equal-mtime file-tie failure mode)."""
    from mlvectordb_spark.streaming.merge_sink import apply_merge_batch

    table = MergedTable(spark, str(tmp_path / "table"))
    newer = spark.createDataFrame(
        [(1, 5.0, 10, False)], "id bigint, val double, seq bigint, deleted boolean"
    )
    older = spark.createDataFrame(
        [(1, 1.0, 3, False), (2, 2.0, 4, False), (1, 0.0, 5, True)],
        "id bigint, val double, seq bigint, deleted boolean",
    )
    apply_merge_batch(table, newer, 0, "id", "seq", "deleted")
    apply_merge_batch(table, older, 1, "id", "seq", "deleted")
    got = {r["id"]: (r["val"], r["seq"]) for r in table.df().collect()}
    # id=1: late batch's update AND delete (both seq < 10) are ignored;
    # id=2: genuinely new key inserts fine
    assert got == {1: (5.0, 10), 2: (2.0, 4)}


def test_replay_of_published_batch_is_skipped(spark, tmp_path):
    """foreachBatch retry after the pointer flip (crash before checkpoint
    commit) must NOT re-apply: doing so would overwrite v{B} while the
    merge plan reads it, deleting the live files (code-review regression —
    previously FileNotFoundException + data loss)."""
    from mlvectordb_spark.streaming.merge_sink import apply_merge_batch

    table = MergedTable(spark, str(tmp_path / "table"))
    b0 = spark.createDataFrame(
        [(1, 1.0, 1, False)], "id bigint, val double, seq bigint, deleted boolean"
    )
    b1 = spark.createDataFrame(
        [(2, 2.0, 2, False)], "id bigint, val double, seq bigint, deleted boolean"
    )
    apply_merge_batch(table, b0, 0, "id", "seq", "deleted")
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    # replay batch 1 (already published) — must be a no-op, not a crash
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    assert table.current_version() == 1
    got = {r["id"]: r["val"] for r in table.df().collect()}
    assert got == {1: 1.0, 2: 2.0}


def test_table_changes_feed(spark, tmp_path):
    """CDC-out: full-outer snapshot diff classifies insert/update/delete
    and drops unchanged rows."""
    from mlvectordb_spark.streaming.merge_sink import (
        apply_merge_batch,
        table_changes,
    )

    table = MergedTable(spark, str(tmp_path / "table"))
    b0 = spark.createDataFrame(
        [(1, 1.0, 1, False), (2, 2.0, 1, False), (3, 3.0, 1, False)],
        "id bigint, val double, seq bigint, deleted boolean",
    )
    b1 = spark.createDataFrame(
        [(2, 20.0, 2, False), (3, 0.0, 2, True), (4, 4.0, 2, False)],
        "id bigint, val double, seq bigint, deleted boolean",
    )
    apply_merge_batch(table, b0, 0, "id", "seq", "deleted")
    apply_merge_batch(table, b1, 1, "id", "seq", "deleted")
    feed = table_changes(table, 0, 1, on="id")
    got = {r["id"]: (r["val"], r["_change_type"]) for r in feed.collect()}
    # id=1 unchanged -> absent; delete carries the FROM-version's values
    assert got == {
        2: (20.0, "update"),
        3: (3.0, "delete"),
        4: (4.0, "insert"),
    }
    with pytest.raises(ValueError, match="published"):
        table_changes(MergedTable(spark, str(tmp_path / "empty")), 0)


def test_restart_does_not_reapply(spark, tmp_path):
    src = tmp_path / "cdc"
    src.mkdir()
    _write_batches(
        src, [[{"id": 1, "val": 1.0, "seq": 1, "deleted": False}]]
    )
    table = MergedTable(spark, str(tmp_path / "table"))

    def run():
        stream = (
            spark.readStream.schema(CDC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = start_table_merge(
            stream,
            table,
            on="id",
            order_col="seq",
            checkpoint_dir=str(tmp_path / "ckpt"),
            query_name="t_merge_sink_restart",
            delete_col="deleted",
        )
        q.awaitTermination()

    run()
    v1 = table.current_version()
    # restart with no new files: checkpoint prevents re-application
    run()
    assert table.current_version() == v1
    # new file after restart: applied on top
    (src / "b9.json").write_text(
        json.dumps({"id": 1, "val": 2.0, "seq": 9, "deleted": False})
    )
    run()
    got = {r["id"]: r["val"] for r in table.df().collect()}
    assert got == {1: 2.0}
