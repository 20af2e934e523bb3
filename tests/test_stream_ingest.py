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
