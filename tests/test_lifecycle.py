"""Lifecycle extras (Q20-Q24) + distribution interfaces (D1/D2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.sharding import ReplicationManager, ShardingManager
from mlvectordb_spark.operators.store import VectorStore


@pytest.fixture()
def store(spark, tmp_path):
    s = VectorStore(spark, str(tmp_path / "store"))
    s.upsert_many([{"values": [float(i), 0.0], "metadata": {"i": str(i)}} for i in range(5)])
    return s


def test_iterate_vectors_streams_all(store):
    seen = [r.id for r in store.iterate_vectors()]
    assert len(seen) == 5


def test_dimension_inferred(store):
    assert store.dimension() == 2
    assert store.dimension("ghost") is None
    store.upsert_many([{"values": [1.0, 2.0, 3.0]}], namespace="d3")
    assert store.dimension("d3") == 3


def test_json_serialization_roundtrip(store):
    rows = store.to_json_df().collect()
    assert len(rows) == 5
    parsed = json.loads(rows[0].json)
    assert set(parsed) == {"id", "namespace", "values", "metadata_json"}


def test_from_json_df_rehydrates_store(store, spark, tmp_path):
    """Q20 both directions: to_json_df output ingests into a fresh store
    with ids, values, and metadata intact (the deserializing half)."""
    dump = store.to_json_df()
    other = VectorStore(spark, str(tmp_path / "rehydrated"))
    assert other.from_json_df(dump) == 5
    src = {r.id: r for r in store.df().collect()}
    dst = {r.id: r for r in other.df().collect()}
    assert set(src) == set(dst)
    for vid, r in src.items():
        assert dst[vid].values == r.values
        assert dict(dst[vid].metadata) == dict(r.metadata)
        assert dst[vid].namespace == r.namespace
    # idempotent: re-ingesting the same dump upserts, not duplicates
    assert other.from_json_df(dump) == 5
    assert other.count() == 5


def test_backup_restore(store, tmp_path):
    bpath = str(tmp_path / "backup")
    n = store.create_backup(bpath)
    assert n == 5
    store.delete([r.id for r in store.iterate_vectors()][:3])
    assert store.count() == 2
    restored = store.restore_from_backup(bpath)
    assert restored == 5
    assert store.count() == 5


def test_id_bloom_membership(store):
    """Bloom negative cache: no false negatives ever; false-positive rate
    near the configured fpp."""
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        store.maybe_exists("anything")
    store.build_id_bloom(fpp=0.01)
    stored_ids = [r.id for r in store.iterate_vectors()]
    assert all(store.maybe_exists(i) for i in stored_ids)  # no false negatives
    fp = sum(store.maybe_exists(f"missing-{i}") for i in range(500))
    assert fp <= 25  # ~1% fpp with slack


def test_sharding_expr_covers_and_balances(spark):
    mgr = ShardingManager(8)
    df = spark.range(1000).select(F.col("id").cast("string").alias("id"))
    sharded = mgr.assign(df)
    counts = {r.shard_id: r.n for r in sharded.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 3 * min(counts.values())  # roughly balanced
    assert sharded.rdd.getNumPartitions() == 8


def test_shard_for_id_stable(spark):
    mgr = ShardingManager(4)
    assert mgr.shard_for_id("abc") == mgr.shard_for_id("abc")
    assert mgr.all_shards() == [f"shard-{i}" for i in range(4)]
    assert mgr.shard_for_vector([1.0, 2.0]) in mgr.all_shards()
    with pytest.raises(ValueError):
        ShardingManager(0)


def test_shard_for_id_expr_matches_scalar(spark):
    """The distributed md5 routing (shard_for_id_expr) must agree
    row-for-row with the declared scalar API (shard_for_id) — the
    property that lets serving-layer routing and bulk assignment share
    one routing table. Mixed id shapes incl. negative and huge ints."""
    mgr = ShardingManager(7)
    ids = ["abc", "42", "-7", str(10**18), "", "x" * 100, "naïve"]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    got = {
        r.id: r.shard
        for r in df.select(
            "id", mgr.shard_for_id_expr("id").alias("shard")
        ).collect()
    }
    for i in ids:
        assert f"shard-{got[i]}" == mgr.shard_for_id(i), i


def test_replication_mirror_and_reconcile(spark, tmp_path):
    paths = [str(tmp_path / "r1"), str(tmp_path / "r2")]
    mgr = ReplicationManager(spark, paths)
    df = spark.range(10).select(F.col("id").cast("string").alias("id"))
    mgr.replicate_write(df)
    missing = mgr.reconcile()
    assert missing == {paths[0]: 0, paths[1]: 0}
    # degrade one replica → reconcile reports the gap
    extra = spark.createDataFrame([("x1",), ("x2",)], "id string")
    extra.write.mode("append").parquet(paths[0])
    missing = mgr.reconcile()
    assert missing[paths[0]] == 0 and missing[paths[1]] == 2


def test_incremental_backup_syncs_replica(spark, tmp_path):
    """Replica = full snapshot at v0, then incremental deltas: after each
    apply_incremental the replica's live view equals the primary's,
    including overwrites and deletes; re-applying a delta is idempotent."""
    from mlvectordb_spark.operators.store import VectorStore

    primary = VectorStore(
        spark, str(tmp_path / "primary"), rebuild_threshold=0.95
    )
    primary.upsert_by_id(
        [{"id": f"k{i}", "values": [float(i), 1.0]} for i in range(20)]
    )
    primary.create_backup(str(tmp_path / "full"))
    v0 = primary.current_version()

    replica = VectorStore(
        spark, str(tmp_path / "replica"), rebuild_threshold=0.95
    )
    replica.restore_from_backup(str(tmp_path / "full"))

    primary.upsert_by_id(
        [{"id": "k3", "values": [99.0, 1.0]}, {"id": "k21", "values": [21.0, 1.0]}]
    )
    primary.delete(["k5", "k7"])
    n = primary.backup_incremental(str(tmp_path / "delta1"), v0)
    assert n == 4

    applied = replica.apply_incremental(str(tmp_path / "delta1"))
    assert applied == 4

    def state(store):
        return {
            r.id: list(r.values) for r in store.df().collect()
        }

    assert state(replica) == state(primary)
    # idempotent: applying the same delta again changes nothing
    replica.apply_incremental(str(tmp_path / "delta1"))
    assert state(replica) == state(primary)
    # floor enforcement propagates: asking for a pre-floor delta raises
    primary.compact("default")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        primary.backup_incremental(str(tmp_path / "delta2"), v0)


def test_incremental_replica_preserves_nested_metadata_json(spark, tmp_path):
    """Round-5 advice (medium): the CDC feed carries the primary's exact
    metadata_json; the replay must not re-derive it from the flat map (the
    flat map cannot represent nesting), or JSON-path queries diverge on
    the replica."""
    import json as _json

    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.store import VectorStore

    primary = VectorStore(spark, str(tmp_path / "p2"), rebuild_threshold=0.95)
    primary.upsert_by_id([{"id": "seed", "values": [0.0, 0.0]}])
    primary.create_backup(str(tmp_path / "full2"))
    v0 = primary.current_version()
    replica = VectorStore(spark, str(tmp_path / "r2b"), rebuild_threshold=0.95)
    replica.restore_from_backup(str(tmp_path / "full2"))

    nested = {"a": {"b": [1, 2, {"c": "deep"}]}, "n": 3}
    primary.upsert_by_id(
        [{"id": "k-nested", "values": [1.0, 2.0], "metadata": nested}]
    )
    primary.backup_incremental(str(tmp_path / "d2"), v0)
    replica.apply_incremental(str(tmp_path / "d2"))

    def mj(store):
        return _json.loads(
            store.df().filter(F.col("id") == "k-nested").first().metadata_json
        )

    assert mj(replica) == mj(primary) == nested
    # JSON-path query agrees across primary and replica
    for s in (primary, replica):
        got = (
            s.df()
            .filter(F.get_json_object("metadata_json", "$.a.b[2].c") == "deep")
            .count()
        )
        assert got == 1
