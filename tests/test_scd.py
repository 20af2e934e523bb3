"""SCD Type-2 history maintenance + asof strict mode + knn_df."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.scd import scd2_apply, scd2_init

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def history(spark):
    snap = spark.createDataFrame(
        [(1, "alice", "NY", T0), (2, "bob", "LA", T0)],
        "cust_id int, name string, city string, ts timestamp",
    )
    return scd2_init(snap, "ts").drop("ts")


def test_scd2_change_new_and_noop(spark, history):
    updates = spark.createDataFrame(
        [
            (1, "alice", "SF", T1),   # changed city -> new version
            (2, "bob", "LA", T1),     # identical -> no-op
            (3, "carol", "TX", T1),   # brand-new key
        ],
        "cust_id int, name string, city string, ts timestamp",
    )
    out = scd2_apply(history, updates, "cust_id", "ts", ["name", "city"])
    rows = {(r.cust_id, r.city): r for r in out.collect()}
    assert len(rows) == 4  # alice x2, bob x1, carol x1
    old_alice = rows[(1, "NY")]
    new_alice = rows[(1, "SF")]
    assert not old_alice.is_current and old_alice.valid_to == T1
    assert new_alice.is_current and new_alice.valid_from == T1
    assert rows[(2, "LA")].is_current  # untouched
    assert rows[(3, "TX")].is_current and rows[(3, "TX")].valid_from == T1


def test_scd2_second_batch_builds_chain(spark, history):
    u1 = spark.createDataFrame(
        [(1, "alice", "SF", T1)], "cust_id int, name string, city string, ts timestamp"
    )
    u2 = spark.createDataFrame(
        [(1, "alice", "TX", T2)], "cust_id int, name string, city string, ts timestamp"
    )
    h2 = scd2_apply(history, u1, "cust_id", "ts", ["name", "city"])
    h3 = scd2_apply(h2, u2, "cust_id", "ts", ["name", "city"])
    alice = sorted(
        [r for r in h3.collect() if r.cust_id == 1], key=lambda r: r.valid_from
    )
    assert [r.city for r in alice] == ["NY", "SF", "TX"]
    assert [r.is_current for r in alice] == [False, False, True]
    # ranges chain with no gaps
    assert alice[0].valid_to == alice[1].valid_from
    assert alice[1].valid_to == alice[2].valid_from
    assert alice[2].valid_to is None


def test_scd2_boundary_collision_and_null_transition(spark):
    """Round-2 verdict: change detection must be per-column null-safe.
    ("ab","c") vs ("a","bc") concatenate identically, and concat_ws skips
    NULLs so a NULL->"" transition looked like a no-op — both must be
    detected as real changes."""
    snap = spark.createDataFrame(
        [(1, "ab", "c", T0), (2, None, "x", T0)],
        "cust_id int, name string, city string, ts timestamp",
    )
    history = scd2_init(snap, "ts").drop("ts")
    updates = spark.createDataFrame(
        [(1, "a", "bc", T1), (2, "", "x", T1)],
        "cust_id int, name string, city string, ts timestamp",
    )
    out = scd2_apply(history, updates, "cust_id", "ts", ["name", "city"])
    cur = {r.cust_id: r for r in out.collect() if r.is_current}
    assert (cur[1].name, cur[1].city) == ("a", "bc")
    assert cur[2].name == ""
    # both keys carry two versions: the old row closed at T1
    closed = {r.cust_id: r for r in out.collect() if not r.is_current}
    assert closed[1].valid_to == T1 and closed[2].valid_to == T1


def test_asof_strict_excludes_same_instant(spark):
    from mlvectordb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, T1)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, T1, "same"), (1, T0, "earlier")], "k int, ts timestamp, tag string"
    )
    loose = asof_join(left, right, "k", "ts", "ts", ["tag"]).first()
    strict = asof_join(left, right, "k", "ts", "ts", ["tag"], strict=True).first()
    assert loose.asof_tag == "same"      # <= matches the same instant
    assert strict.asof_tag == "earlier"  # < skips it


def test_knn_df_matches_literal_knn(spark, sf_dir):
    from mlvectordb_spark.operators.knn import knn, knn_df
    from mlvectordb_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 3).select("embedding").head()[0]
    lit_res = [(r.vec_id, r.score) for r in knn(emb, qvec, 5, metric="cosine").collect()]
    df_res = [
        (r.vec_id, r.score)
        for r in knn_df(
            emb, emb.filter(F.col("vec_id") == 3), 5, metric="cosine"
        ).collect()
    ]
    assert lit_res == df_res
