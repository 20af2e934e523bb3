"""Canonical schemas (SURVEY.md §1.4).

The reference's record model (`/root/reference/src/mlvectordb/interfaces/
vector.py:7-22`: id UUID, values float32 ndarray, metadata Mapping) maps to
one partitioned DataFrame schema:

- id: string uuid
- namespace: string (partition column → partition pruning = the reference's
  per-namespace index isolation, `implementations/index.py:19,32-48`)
- values: array<float> non-null elements (float32 parity with
  `implementations/vector.py:14`)
- metadata: map<string,string> for flat equality filters
- metadata_json: string for arbitrarily-nested metadata
  (`tests/test_storage_engine_in_memory.py:204-218` round-trips nesting)
"""

from __future__ import annotations

from pyspark.sql import types as T

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("namespace", T.StringType(), nullable=False),
        T.StructField(
            "values", T.ArrayType(T.FloatType(), containsNull=False), nullable=False
        ),
        T.StructField(
            "metadata", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
        T.StructField("metadata_json", T.StringType(), nullable=True),
    ]
)

# On-disk storage schema: VECTOR_SCHEMA plus a monotone write_version used
# by the latest-wins read path (true upserts append a new version instead of
# rewriting the namespace partition; compaction collapses back to one row
# per id). Files written before versioning (or by compaction, which writes
# the already-deduped survivors) read the column as null ≡ version 0.
STORAGE_SCHEMA = T.StructType(
    list(VECTOR_SCHEMA.fields)
    + [T.StructField("write_version", T.LongType(), nullable=True)]
)

# Ingest payload (the reference's VectorDTO, `interfaces/vector.py:19-22`):
# no id — ids are assigned at write time with uuid().
VECTOR_DTO_SCHEMA = T.StructType(
    [
        T.StructField(
            "values", T.ArrayType(T.FloatType(), containsNull=False), nullable=False
        ),
        T.StructField(
            "metadata", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
        T.StructField("metadata_json", T.StringType(), nullable=True),
    ]
)

# Search result (reference `interfaces/index.py:5-7` + enrichment shape
# `implementations/query_processor.py:43-48`).
SEARCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("values", T.ArrayType(T.FloatType()), nullable=True),
        T.StructField(
            "metadata", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
        T.StructField("score", T.DoubleType(), nullable=False),
    ]
)

# Multimodal document schema: opaque binary payload + typed metadata
# (media decode itself is stubbed — libs not in container — but the Spark
# plumbing is real; see multimodal.py).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), nullable=False),
        T.StructField("modality", T.StringType(), nullable=False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), nullable=True),
        T.StructField("mime_type", T.StringType(), nullable=True),
        T.StructField("width", T.IntegerType(), nullable=True),
        T.StructField("height", T.IntegerType(), nullable=True),
        T.StructField("duration_ms", T.LongType(), nullable=True),
        T.StructField(
            "extra", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
