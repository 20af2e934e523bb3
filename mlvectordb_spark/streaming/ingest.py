"""Streaming vector ingest into VectorStore.

The reference's only write path is REST inserts one HTTP call at a time
(`api/rest_api.py:96-161`); the streaming-native equivalent is a
micro-batched ingest: a stream of VectorDTO-shaped records (values +
metadata + namespace) lands in the storage table via foreachBatch.

foreachBatch is the right tool (vs a direct parquet sink) because ingest
needs the store's write semantics: uuid assignment, float casting,
metadata_json derivation, namespace partitioning — and gets exactly-once
per micro-batch through the checkpointed batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mlvectordb_spark.operators.store import VectorStore

INGEST_SCHEMA = T.StructType(
    [
        T.StructField("values", T.ArrayType(T.FloatType()), nullable=False),
        T.StructField(
            "metadata", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
        T.StructField("namespace", T.StringType(), nullable=False),
    ]
)


def start_vector_ingest(
    stream: DataFrame, store: VectorStore, checkpoint_dir: str, query_name: str
):
    """Attach a DTO stream to a VectorStore. Returns the StreamingQuery.

    Each micro-batch is one distributed append via the store's bulk write
    kernel (`shape_ingest_df` → `insert_df`): uuid() per row executor-side
    (W1/W2 insert semantics — fresh id always), partitioned by namespace.
    `check_dims=False` skips the per-batch aggregation pass — hot-path
    latency beats the redundant check once the namespace dim is set.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        store.insert_df(batch_df, check_dims=False)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
