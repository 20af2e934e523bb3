"""MERGE INTO (operators/merge.py): semantics, strategy parity, dedup,
and the scale contract (broadcast strategy must not shuffle the target)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.merge import dedup_source, merge_into


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id bigint, tag string, val double",
    )


@pytest.fixture()
def source(spark):
    # id=2 update, id=3 delete, id=9 insert, id=1 untouched-by-condition
    return spark.createDataFrame(
        [(2, "B", 200.0, False), (3, "C", 0.0, True), (9, "Z", 90.0, False)],
        "id bigint, tag string, val double, cancel boolean",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_semantics_broadcast(target, source):
    out = merge_into(
        target,
        source,
        on="id",
        delete_condition=F.col("s.cancel"),
        strategy="broadcast",
    )
    assert _rows(out) == [
        (1, "a", 10.0),
        (2, "B", 200.0),
        (4, "d", 40.0),
        (9, "Z", 90.0),
    ]


def test_strategy_parity(target, source):
    kw = dict(on="id", delete_condition=F.col("s.cancel"))
    b = merge_into(target, source, strategy="broadcast", **kw)
    s = merge_into(target, source, strategy="shuffle", **kw)
    assert _rows(b) == _rows(s)
    a = merge_into(target, source, strategy="auto", **kw)
    assert _rows(a) == _rows(b)


def test_update_set_and_condition(target, source):
    out = merge_into(
        target,
        source,
        on="id",
        update_set={"val": F.col("t.val") + F.col("s.val")},
        update_condition=F.col("s.val") > 100.0,
        insert=False,
        strategy="broadcast",
    )
    # only id=2 passes the condition; tag is NOT updated (not in update_set)
    assert _rows(out) == [
        (1, "a", 10.0),
        (2, "b", 220.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]


def test_insert_set_defaults_and_nulls(spark, target):
    src = spark.createDataFrame([(7, 70.0)], "id bigint, val double")
    out = merge_into(target, src, on="id", strategy="broadcast")
    got = {r["id"]: (r["tag"], r["val"]) for r in out.collect()}
    assert got[7] == (None, 70.0)  # tag absent from source -> NULL
    assert got[2] == ("b", 20.0)  # no update clauses beyond defaults? val updated
    # default update: source columns overwrite — id 2 not in src, untouched
    assert len(got) == 5


def test_default_update_overwrites_source_columns(spark, target):
    src = spark.createDataFrame([(2, 99.0)], "id bigint, val double")
    out = merge_into(target, src, on="id", insert=False, strategy="shuffle")
    got = {r["id"]: (r["tag"], r["val"]) for r in out.collect()}
    assert got[2] == ("b", 99.0)  # val from source, tag kept


def test_dedup_source(spark):
    src = spark.createDataFrame(
        [(1, 5, "old"), (1, 9, "new"), (2, 1, "only")],
        "id bigint, seq int, payload string",
    )
    out = dedup_source(src, ["id"], "seq")
    assert _rows(out) == [(1, 9, "new"), (2, 1, "only")]
    assert out.columns == src.columns


def test_broadcast_strategy_never_shuffles_target(target, source):
    out = merge_into(
        target,
        source,
        on="id",
        delete_condition=F.col("s.cancel"),
        strategy="broadcast",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both joins must be broadcast joins; the only Exchange allowed is the
    # broadcast exchange of the (small) source
    assert "BroadcastHashJoin" in plan
    import re

    non_broadcast_exchanges = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bExchange (?!.*broadcast)", ln.strip())
        and "BroadcastExchange" not in ln
    ]
    assert non_broadcast_exchanges == [], non_broadcast_exchanges


def test_shuffle_strategy_single_full_outer(target, source):
    out = merge_into(
        target,
        source,
        on="id",
        delete_condition=F.col("s.cancel"),
        strategy="shuffle",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan


def test_unknown_strategy_raises(target, source):
    with pytest.raises(ValueError, match="strategy"):
        merge_into(target, source, on="id", strategy="nope")


def test_stray_clause_column_raises(target, source):
    with pytest.raises(ValueError, match="totalprice"):
        merge_into(
            target,
            source,
            on="id",
            update_set={"totalprice": F.col("s.val")},  # typo'd column
        )
    with pytest.raises(ValueError, match="insert_set"):
        merge_into(
            target, source, on="id", insert_set={"nope": F.lit(1)}
        )


def test_insert_clause_t_alias_parity(target, source):
    """insert_set/insert_condition may reference t.<col> (NULL for inserts)
    under BOTH strategies — the broadcast anti-join path must graft the t
    side back (code-review regression)."""
    kw = dict(
        on="id",
        insert_set={"tag": F.coalesce(F.col("t.tag"), F.col("s.tag"))},
        insert_condition=F.col("t.id").isNull() & ~F.col("s.cancel"),
    )
    b = merge_into(target, source, strategy="broadcast", **kw)
    s = merge_into(target, source, strategy="shuffle", **kw)
    assert _rows(b) == _rows(s)
    assert (9, "Z", 90.0) in _rows(b)
