"""Join-view incremental maintenance (operators/mv.py join leg):
Δ(F⋈D) = ΔF⋈D_old ∪ F_new⋈ΔD with multiplied signs, checked against
full rebuilds of the joined view under fact-only, dim-only, and
simultaneous both-sides change batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.mv import (
    build_mv,
    incremental_refresh_join,
    join_mv_delta,
)

FACT = "id bigint, k bigint, amt double"
DIM = "k bigint, seg string"


def _fact(spark, rows):
    return spark.createDataFrame(rows, FACT)


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM)


def _feed(spark, schema, rows):
    return spark.createDataFrame(rows, schema + ", _change_type string")


def _view(fact, dim):
    return build_mv(fact.join(dim, "k"), ["seg"], ["amt"])


def _as_dict(df):
    return {
        r["seg"]: (r["cnt"], None if r["sum_amt"] is None else round(r["sum_amt"], 6))
        for r in df.collect()
    }


@pytest.fixture()
def base(spark):
    fact = _fact(
        spark,
        [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 4.0), (4, 20, 8.0), (5, 30, 16.0)],
    )
    dim = _dim(spark, [(10, "a"), (20, "b"), (30, "b")])
    return fact, dim


def test_fact_only_changes(spark, base):
    fact, dim = base
    # update id=1 (amt 1→100), delete id=3, insert id=6 into k=30
    fact_feed = _feed(
        spark,
        FACT,
        [
            (1, 10, 1.0, "update_preimage"),
            (1, 10, 100.0, "update_postimage"),
            (3, 20, 4.0, "delete"),
            (6, 30, 32.0, "insert"),
        ],
    )
    fact_new = _fact(
        spark,
        [(1, 10, 100.0), (2, 10, 2.0), (4, 20, 8.0), (5, 30, 16.0), (6, 30, 32.0)],
    )
    mv0 = _view(fact, dim)
    got = incremental_refresh_join(
        mv0, fact_feed, None, dim, fact_new, "k", ["seg"], ["amt"]
    )
    assert _as_dict(got) == _as_dict(_view(fact_new, dim))


def test_dim_only_changes_move_groups(spark, base):
    fact, dim = base
    # dim k=20 moves from seg b to seg c: every k=20 fact row must
    # retract from b and land in c; k=30 is deleted outright
    dim_feed = _feed(
        spark,
        DIM,
        [
            (20, "b", "update_preimage"),
            (20, "c", "update_postimage"),
            (30, "b", "delete"),
        ],
    )
    dim_new = _dim(spark, [(10, "a"), (20, "c")])
    mv0 = _view(fact, dim)
    got = incremental_refresh_join(
        mv0, None, dim_feed, dim, fact, "k", ["seg"], ["amt"]
    )
    assert _as_dict(got) == _as_dict(_view(fact, dim_new))


def test_both_sides_change_cross_term_counted_once(spark, base):
    fact, dim = base
    # the adversarial overlap: a NEW fact row lands in a key whose dim
    # row ALSO changes in the same step — the ΔF⋈ΔD contribution must
    # appear exactly once (leg 2 joins fact_NEW, leg 1 joins dim_OLD)
    fact_feed = _feed(
        spark,
        FACT,
        [
            (6, 20, 32.0, "insert"),
            (5, 30, 16.0, "update_preimage"),
            (5, 30, 64.0, "update_postimage"),
        ],
    )
    fact_new = _fact(
        spark,
        [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 4.0), (4, 20, 8.0), (5, 30, 64.0), (6, 20, 32.0)],
    )
    dim_feed = _feed(
        spark,
        DIM,
        [(20, "b", "update_preimage"), (20, "z", "update_postimage")],
    )
    dim_new = _dim(spark, [(10, "a"), (20, "z"), (30, "b")])
    mv0 = _view(fact, dim)
    got = incremental_refresh_join(
        mv0, fact_feed, dim_feed, dim, fact_new, "k", ["seg"], ["amt"]
    )
    assert _as_dict(got) == _as_dict(_view(fact_new, dim_new))


def test_duplicate_join_keys_stay_exact(spark):
    # dim with DUPLICATE keys (a multiset join): each fact row matches
    # twice; the signed algebra must keep multiplicities exact
    fact = _fact(spark, [(1, 10, 1.0), (2, 10, 2.0)])
    dim = spark.createDataFrame([(10, "a"), (10, "b")], DIM)
    fact_feed = _feed(spark, FACT, [(3, 10, 4.0, "insert")])
    fact_new = _fact(spark, [(1, 10, 1.0), (2, 10, 2.0), (3, 10, 4.0)])
    mv0 = _view(fact, dim)
    got = incremental_refresh_join(
        mv0, fact_feed, None, dim, fact_new, "k", ["seg"], ["amt"]
    )
    assert _as_dict(got) == _as_dict(_view(fact_new, dim))


def test_refresh_chains(spark, base):
    fact, dim = base
    f1 = _feed(spark, FACT, [(6, 10, 32.0, "insert")])
    fact1 = _fact(
        spark,
        [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 4.0), (4, 20, 8.0), (5, 30, 16.0), (6, 10, 32.0)],
    )
    d2 = _feed(
        spark, DIM, [(10, "a", "update_preimage"), (10, "q", "update_postimage")]
    )
    dim2 = _dim(spark, [(10, "q"), (20, "b"), (30, "b")])
    mv0 = _view(fact, dim)
    mv1 = incremental_refresh_join(
        mv0, f1, None, dim, fact1, "k", ["seg"], ["amt"]
    ).localCheckpoint(eager=True)
    assert _as_dict(mv1) == _as_dict(_view(fact1, dim))
    mv2 = incremental_refresh_join(
        mv1, None, d2, dim, fact1, "k", ["seg"], ["amt"]
    )
    assert _as_dict(mv2) == _as_dict(_view(fact1, dim2))


def test_group_emptied_by_dim_delete_drops(spark, base):
    fact, dim = base
    dim_feed = _feed(spark, DIM, [(10, "a", "delete")])
    dim_new = _dim(spark, [(20, "b"), (30, "b")])
    got = incremental_refresh_join(
        _view(fact, dim), None, dim_feed, dim, fact, "k", ["seg"], ["amt"]
    )
    assert _as_dict(got) == _as_dict(_view(fact, dim_new))
    assert "a" not in _as_dict(got)


def test_pushdown_prunes_table_scan(spark, base):
    """With a feed touching ≤ max_pushdown_keys join keys, the other
    table's scan carries the keys as an isin predicate (reaches the
    parquet reader), not a join."""
    fact, dim = base
    import tempfile

    d = tempfile.mkdtemp()
    fact.write.mode("overwrite").parquet(f"{d}/fact")
    fact_pq = spark.read.parquet(f"{d}/fact")
    dim_feed = _feed(
        spark, DIM, [(20, "b", "update_preimage"), (20, "c", "update_postimage")]
    )
    delta = join_mv_delta(
        None, dim_feed, dim, fact_pq, "k", ["seg"], ["amt"]
    )
    raw = delta._jdf.queryExecution().toString()
    # Catalyst folds a one-value isin to EqualTo; either way the key
    # predicate must reach the parquet reader's PushedFilters
    pushed = [
        seg.split("\n")[0] for seg in raw.split("PushedFilters: ")[1:]
    ]
    assert any("In(k" in s or "EqualTo(k" in s for s in pushed), raw


def test_no_feed_rejected(spark, base):
    fact, dim = base
    with pytest.raises(ValueError):
        join_mv_delta(None, None, dim, fact, "k", ["seg"], ["amt"])


def test_join_view_maintainer_tracks_both_tables(spark, tmp_path):
    """JoinViewMaintainer bookmarks both tables and catches up over
    fact-only, dim-only, simultaneous, and MULTI-VERSION steps, matching
    a rebuild after every refresh. The fact-only step runs through a
    REAL start_table_merge(on_version=m.refresh) hook (foreachBatch),
    the rest through direct merges + manual refresh."""
    import json as _json
    import os
    import time

    from pyspark.sql import types as T

    from mlvectordb_spark.operators.mv import JoinViewMaintainer, build_mv
    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
        start_table_merge,
    )

    fact = MergedTable(spark, str(tmp_path / "fact"), n_buckets=4)
    dim = MergedTable(spark, str(tmp_path / "dim"), n_buckets=4)
    FS = "id long, k long, amt double, seq long"
    DS = "k long, seg string, seq long"
    stream_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("k", T.LongType(), False),
            T.StructField("amt", T.DoubleType(), True),
            T.StructField("seq", T.LongType(), False),
        ]
    )
    src = tmp_path / "cdc"
    src.mkdir()
    base_t = time.time() - 1000

    def write_file(i, rows):
        p = src / f"b{i}.json"
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        os.utime(p, (base_t + i, base_t + i))

    def run_stream(on_version=None):
        q = start_table_merge(
            spark.readStream.schema(stream_schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src)),
            fact,
            on="id",
            order_col="seq",
            checkpoint_dir=str(tmp_path / "ckpt"),
            query_name="t_join_mv_maintainer",
            record_changes=True,
            on_version=on_version,
        )
        q.awaitTermination()

    # fact v0 through the stream, dim v0 directly
    write_file(
        0,
        [
            {"id": 1, "k": 10, "amt": 1.0, "seq": 1},
            {"id": 2, "k": 10, "amt": 2.0, "seq": 1},
            {"id": 3, "k": 20, "amt": 4.0, "seq": 1},
        ],
    )
    run_stream()
    apply_merge_batch(
        dim, spark.createDataFrame([(10, "a", 1), (20, "b", 1)], DS),
        0, "k", "seq", record_changes=True,
    )
    m = JoinViewMaintainer(
        fact, dim, "id", "k", "k", ["seg"], ["amt"],
        fact_cols=["k", "amt"], dim_cols=["k", "seg"],
    )

    def want():
        return {
            r["seg"]: (r["cnt"], r["sum_amt"])
            for r in build_mv(
                fact.df().select("k", "amt").join(
                    dim.df().select("k", "seg"), "k"
                ),
                ["seg"], ["amt"],
            ).collect()
        }

    def got():
        return {r["seg"]: (r["cnt"], r["sum_amt"]) for r in m.view.collect()}

    # fact-only step delivered through the REAL on_version hook
    write_file(1, [{"id": 4, "k": 20, "amt": 8.0, "seq": 2}])
    run_stream(on_version=m.refresh)
    assert got() == want() and m.versions() == (1, 0)
    # dim-only step (segment move)
    apply_merge_batch(
        dim, spark.createDataFrame([(10, "z", 2)], DS),
        1, "k", "seq", record_changes=True,
    )
    m.refresh()
    assert got() == want() and m.versions() == (1, 1)
    # TWO fact versions + one dim version land before the next refresh:
    # catch-up composes the recorded feeds in one step
    apply_merge_batch(
        fact, spark.createDataFrame([(1, 10, 100.0, 3)], FS),
        2, "id", "seq", record_changes=True,
    )
    apply_merge_batch(
        fact, spark.createDataFrame([(5, 30, 16.0, 4)], FS),
        3, "id", "seq", record_changes=True,
    )
    apply_merge_batch(
        dim, spark.createDataFrame([(30, "c", 3)], DS),
        2, "k", "seq", record_changes=True,
    )
    m.refresh()
    assert got() == want() and m.versions() == (3, 2)
    # no-op refresh returns the same view
    assert m.refresh() is m.view and got() == want()


def test_join_view_maintainer_validates_default_projection(spark, tmp_path):
    from mlvectordb_spark.operators.mv import JoinViewMaintainer
    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
    )

    fact = MergedTable(spark, str(tmp_path / "fact"))
    dim = MergedTable(spark, str(tmp_path / "dim"))
    apply_merge_batch(
        fact,
        spark.createDataFrame([(1, 10, 1.0, 1)], "id long, k long, amt double, seq long"),
        0, "id", "seq",
    )
    apply_merge_batch(
        dim,
        spark.createDataFrame([(10, "a", 1)], "k long, seg string, seq long"),
        0, "k", "seq",
    )
    with pytest.raises(ValueError, match="not in the fact table"):
        JoinViewMaintainer(fact, dim, "id", "k", "k", ["seg"], ["seg_score"])
    with pytest.raises(ValueError, match="BOTH tables"):
        JoinViewMaintainer(fact, dim, "id", "k", "k", ["seq"], ["amt"])
    with pytest.raises(ValueError, match="neither table"):
        JoinViewMaintainer(fact, dim, "id", "k", "k", ["nope"], ["amt"])
    # default projection resolves when each group col has one home
    m = JoinViewMaintainer(fact, dim, "id", "k", "k", ["seg"], ["amt"])
    assert m.view.collect()[0]["seg"] == "a"


def test_vacuum_below_consumer_bookmark_raises_history_floor(
    spark, tmp_path
):
    """Retention contract at the boundary (round-7 verdict #9): a
    maintainer bookmarked below what vacuum retained must get the
    DOCUMENTED history-floor error — a loud re-bootstrap signal — never
    an opaque missing-path failure from a lazily-built snapshot diff
    (and never a silent rebuild from wrong state). Feeds between
    versions vacuum retained keep working."""
    from mlvectordb_spark.operators.mv import JoinViewMaintainer
    from mlvectordb_spark.streaming.merge_sink import (
        MergedTable,
        apply_merge_batch,
        table_changes,
    )

    FS = "id bigint, k bigint, amt double, seq bigint"
    DS = "k bigint, seg string, seq bigint"
    fact = MergedTable(spark, str(tmp_path / "f"), n_buckets=4)
    dim = MergedTable(spark, str(tmp_path / "d"), n_buckets=4)
    apply_merge_batch(
        fact,
        spark.createDataFrame([(1, 10, 1.0, 1), (2, 20, 2.0, 1)], FS),
        0, "id", "seq", record_changes=True,
    )
    apply_merge_batch(
        dim,
        spark.createDataFrame([(10, "a", 1), (20, "b", 1)], DS),
        0, "k", "seq", record_changes=True,
    )
    m = JoinViewMaintainer(
        fact, dim, "id", "k", "k", ["seg"], ["amt"],
        fact_cols=["k", "amt"], dim_cols=["k", "seg"],
    )
    # fact advances twice while the maintainer sleeps...
    apply_merge_batch(
        fact, spark.createDataFrame([(3, 10, 8.0, 2)], FS),
        1, "id", "seq", record_changes=True,
    )
    apply_merge_batch(
        fact, spark.createDataFrame([(1, 20, 9.0, 3)], FS),
        2, "id", "seq", record_changes=True,
    )
    # ...feeds between RETAINED versions still serve after a vacuum
    removed = fact.vacuum(retain_last=2)
    assert removed == [0]
    assert fact.history_floor() == 1
    got = {
        (r["id"], r["_change_type"])
        for r in table_changes(fact, 1, 2, on="id").collect()
    }
    assert got == {(1, "update")}
    # ...but the maintainer's bookmark (version 0) is below the floor
    with pytest.raises(ValueError, match="history floor"):
        m.refresh()
    # direct consumer, same boundary
    with pytest.raises(ValueError, match="history floor"):
        table_changes(fact, 0, 2, on="id").collect()
