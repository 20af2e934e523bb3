"""Streaming vector ingest: DTO stream → VectorStore, then the regular
query surface works over the streamed-in data."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.store import VectorStore
from mlvectordb_spark.streaming.ingest import INGEST_SCHEMA, start_vector_ingest


def test_stream_ingest_roundtrip(spark, tmp_path):
    # stage two json files of DTOs → two micro-batch increments
    src = tmp_path / "dtos"
    src.mkdir()
    batch1 = [
        {"values": [1.0, 0.0], "metadata": {"tag": "a"}, "namespace": "default"},
        {"values": [0.0, 1.0], "metadata": {"tag": "b"}, "namespace": "default"},
    ]
    batch2 = [
        {"values": [0.9, 0.1], "metadata": {"tag": "c"}, "namespace": "other"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))

    store = VectorStore(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_vector_ingest(
        stream, store, str(tmp_path / "ckpt"), "t_vec_ingest"
    )
    q.awaitTermination()

    assert store.count("default") == 2
    assert store.count("other") == 1
    assert sorted(store.list_namespaces()) == ["default", "other"]
    # the normal query surface operates on streamed-in vectors
    res = store.find_similar([1.0, 0.0], 1, namespace="default", metric="cosine")
    assert res[0]["metadata"]["tag"] == "a"
    # ids were assigned per row and are unique
    ids = [r.id for r in store.df().collect()]
    assert len(ids) == len(set(ids)) == 3
    # metadata_json derived executor-side matches the store's format
    row = store.df().filter(F.col("namespace") == "other").first()
    assert json.loads(row.metadata_json) == {"tag": "c"}


def test_indexed_ingest_keeps_serving_index_fresh(spark, tmp_path):
    """Mutation stream → store (versioned writes) → CDC feed → IVF index,
    one sync per micro-batch: after the stream drains, certified-exact
    search over the maintained index equals brute force over the store's
    current state, including overwrites and deletes."""
    import math

    from mlvectordb_spark.operators.ann import IVFIndex
    from mlvectordb_spark.operators.knn import knn
    from mlvectordb_spark.streaming.ingest import (
        UPSERT_INGEST_SCHEMA,
        start_indexed_ingest,
    )

    def vec(i: int) -> list[float]:
        return [math.cos(0.1 * i), math.sin(0.1 * i), float(i % 7)]

    base = [(f"k{i}", vec(i)) for i in range(100)]
    store = VectorStore(
        spark, str(tmp_path / "idxstore"), rebuild_threshold=0.95
    )
    base_df = spark.createDataFrame(
        [(k, v, "default") for k, v in base],
        "id string, values array<float>, namespace string",
    )
    store.upsert_df(base_df)
    idx = IVFIndex(n_clusters=4, seed=42)
    idx.build(
        base_df.select(
            F.col("id").alias("vec_id"), F.col("values").alias("embedding")
        )
    )

    src = tmp_path / "muts"
    src.mkdir()
    b1 = [
        {"id": f"k{i}", "values": [x * 2.0 for x in vec(i)],
         "namespace": "default", "op": "upsert", "seq": i}
        for i in range(0, 100, 10)
    ]
    b2 = (
        [
            {"id": f"k{i}", "values": None, "namespace": "default",
             "op": "delete", "seq": 100 + i}
            for i in range(0, 100, 7)
        ]
        + [
            {"id": f"new{i}", "values": vec(200 + i), "namespace": "default",
             "op": "upsert", "seq": 300 + i}
            for i in range(3)
        ]
        # intra-batch order must follow seq, not op grouping:
        # delete-then-upsert resurrects k5 ...
        + [
            {"id": "k5", "values": None, "namespace": "default",
             "op": "delete", "seq": 400},
            {"id": "k5", "values": vec(500), "namespace": "default",
             "op": "upsert", "seq": 401},
            # ... and upsert-then-delete removes k11
            {"id": "k11", "values": vec(600), "namespace": "default",
             "op": "upsert", "seq": 410},
            {"id": "k11", "values": None, "namespace": "default",
             "op": "delete", "seq": 411},
        ]
    )
    # b3 re-upserts k7 (deleted in b2): tombstone retirement bumps the CDC
    # floor past the batch's start version, forcing the full-resync
    # fallback instead of killing the stream (round-5 advice, high).
    b3 = [
        {"id": "k7", "values": vec(700), "namespace": "default",
         "op": "upsert", "seq": 500},
    ]
    # FileStreamSource orders batches by modification time — written
    # back-to-back the three files can share an mtime and process out of
    # order; pin strictly increasing mtimes.
    import os
    import time

    now = time.time()
    for off, (name, recs) in enumerate(
        [("b1.json", b1), ("b2.json", b2), ("b3.json", b3)]
    ):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in recs))
        os.utime(p, (now + off * 10, now + off * 10))

    stream = (
        spark.readStream.schema(UPSERT_INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_indexed_ingest(
        stream, store, idx, str(tmp_path / "ickpt"), "t_indexed_ingest"
    )
    q.awaitTermination()

    current = store.df().select(
        F.col("id").alias("vec_id"), F.col("values").alias("embedding")
    )
    live = {r.vec_id for r in current.select("vec_id").collect()}
    assert "k5" in live, "delete-then-upsert in one batch must resurrect"
    assert "k11" not in live, "upsert-then-delete in one batch must delete"
    assert "k7" in live, "floor bump must fall back to resync, not kill"
    assert sorted(r.vec_id for r in idx.indexed.select("vec_id").collect()) == sorted(
        live
    )
    qv = vec(0)
    got = [
        (r.vec_id, round(r.score, 4))
        for r in idx.search_exact(qv, 5, vec_col="embedding", id_col="vec_id").collect()
    ]
    want = [
        (r.vec_id, round(r.score, 4))
        for r in knn(current, qv, 5, metric="l2").collect()
    ]
    assert got == want


def test_store_ingest_keeps_all_namespace_indexes_fresh(spark, tmp_path):
    """start_store_ingest: a mutation stream spanning TWO namespaces keeps
    every attached per-namespace index converged on the store's truth —
    the streaming composition of attach_index + sync_indexes (round-6
    tasks 4+5)."""
    import math
    import os
    import time

    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.ann import IVFIndex, NamespaceIndexFamily
    from mlvectordb_spark.streaming.ingest import (
        UPSERT_INGEST_SCHEMA,
        start_store_ingest,
    )

    def vec(i):
        return [math.cos(0.15 * i), math.sin(0.15 * i), float(i % 4)]

    store = VectorStore(spark, str(tmp_path / "fam"), rebuild_threshold=0.95)
    rows = [(f"a{i}", vec(i), "nsA") for i in range(40)] + [
        (f"b{i}", vec(i + 7), "nsB") for i in range(40)
    ]
    store.upsert_df(
        spark.createDataFrame(
            rows, "id string, values array<float>, namespace string"
        )
    )
    fam = NamespaceIndexFamily(factory=lambda: IVFIndex(n_clusters=3, seed=5))
    fam.build(
        store.df().select("id", "values", "namespace"),
        vec_col="values", id_col="id",
    )
    for ns in fam.namespaces():
        store.attach_index(ns, fam.member(ns), vec_col="values", id_col="id")

    src = tmp_path / "fam_muts"
    src.mkdir()
    b1 = [
        {"id": "a3", "values": [9.0, 9.0, 9.0], "namespace": "nsA",
         "op": "upsert", "seq": 1},
        {"id": "b5", "values": None, "namespace": "nsB", "op": "delete",
         "seq": 2},
        {"id": "bnew", "values": vec(99), "namespace": "nsB", "op": "upsert",
         "seq": 3},
    ]
    b2 = [
        {"id": "a1", "values": None, "namespace": "nsA", "op": "delete",
         "seq": 10},
    ]
    now = time.time()
    for off, (name, recs) in enumerate([("b1.json", b1), ("b2.json", b2)]):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in recs))
        os.utime(p, (now + off * 10, now + off * 10))

    stream = (
        spark.readStream.schema(UPSERT_INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_store_ingest(stream, store, str(tmp_path / "famckpt"), "t_fam")
    q.awaitTermination()

    for ns, prefix in (("nsA", "a"), ("nsB", "b")):
        live = sorted(
            r.id
            for r in store.df().filter(F.col("namespace") == ns).select("id").collect()
        )
        idx_ids = sorted(
            r.id for r in fam.member(ns).indexed.select("id").collect()
        )
        assert idx_ids == live, ns
        assert all(i.startswith(prefix) or i == "bnew" for i in idx_ids), ns
    assert "a1" not in {r.id for r in fam.member("nsA").indexed.collect()}
    # routed serving read reflects the stream's writes, still exact
    got = store.find_similar(
        [9.0, 9.0, 9.0], 1, namespace="nsA", metric="l2", mode="indexed"
    )
    assert got[0]["id"] == "a3"


def test_indexed_ingest_with_graph_member(spark, tmp_path):
    """The streaming maintenance loop speaks the graph family too:
    mutation stream → store versioned writes → CDC feed →
    GraphANNIndex.apply_changes per micro-batch (upserts to the exact
    pending tail, deletes anti-joined from both segments) — after the
    stream drains, certified-exact search over the maintained graph
    equals brute force over the store's current state."""
    import json
    import math
    import os
    import time

    from pyspark.sql import functions as F

    from mlvectordb_spark.operators.graph_ann import GraphANNIndex
    from mlvectordb_spark.operators.knn import knn
    from mlvectordb_spark.streaming.ingest import (
        UPSERT_INGEST_SCHEMA,
        start_indexed_ingest,
    )

    def vec(i: int) -> list[float]:
        return [math.cos(0.1 * i), math.sin(0.1 * i), float(i % 5)]

    store = VectorStore(
        spark, str(tmp_path / "gistore"), rebuild_threshold=0.95
    )
    base_df = spark.createDataFrame(
        [(f"k{i}", vec(i), "default") for i in range(40)],
        "id string, values array<float>, namespace string",
    )
    store.upsert_df(base_df)
    idx = GraphANNIndex(n_blocks=2, m=4, ef_construction=16)
    idx.build(
        base_df.select(
            F.col("id").alias("vec_id"), F.col("values").alias("embedding")
        )
    )

    src = tmp_path / "gmuts"
    src.mkdir()
    b1 = [
        {"id": f"k{i}", "values": [x * 2.0 for x in vec(i)],
         "namespace": "default", "op": "upsert", "seq": i}
        for i in range(0, 40, 8)
    ]
    b2 = [
        {"id": f"k{i}", "values": None, "namespace": "default",
         "op": "delete", "seq": 100 + i}
        for i in range(0, 40, 9)
    ] + [
        {"id": f"gnew{i}", "values": vec(200 + i), "namespace": "default",
         "op": "upsert", "seq": 300 + i}
        for i in range(3)
    ]
    now = time.time()
    for off, (name, recs) in enumerate([("b1.json", b1), ("b2.json", b2)]):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in recs))
        os.utime(p, (now + off * 10, now + off * 10))

    stream = (
        spark.readStream.schema(UPSERT_INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_indexed_ingest(
        stream, store, idx, str(tmp_path / "gckpt"), "t_graph_ingest"
    )
    q.awaitTermination()

    current = store.df().select(
        F.col("id").alias("vec_id"), F.col("values").alias("embedding")
    )
    live = {r.vec_id for r in current.select("vec_id").collect()}
    assert "gnew0" in live and "k0" not in live
    qv = vec(3)
    got = [
        (r.vec_id, round(r.score, 4))
        for r in idx.search_exact(
            qv, 5, vec_col="embedding", id_col="vec_id"
        ).collect()
    ]
    want = [
        (r.vec_id, round(r.score, 4))
        for r in knn(current, qv, 5, metric="l2").collect()
    ]
    assert got == want
    # the streamed upserts live in the exact tail until a fold/rebuild
    assert idx.pending is not None
    tail_ids = {r.vec_id for r in idx.pending.select("vec_id").collect()}
    assert "gnew0" in tail_ids
