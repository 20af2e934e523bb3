"""Bucketed table layout — co-located joins with NO exchange at read time.

At 100 TB the single biggest join cost is the shuffle: joining lineitem to
orders on orderkey exchanges BOTH tables across the cluster every time the
join runs. Spark's bucketed layout (`DataFrameWriter.bucketBy`) moves that
shuffle to WRITE time, once: both tables are hash-partitioned into the same
number of buckets on the join key as they land on disk, and every
subsequent join on that key is planned as a zero-exchange sort-merge join
(bucket i of A only ever meets bucket i of B). `sortBy` on the same key
additionally pre-orders each bucket file so the merge needs no sort either —
Spark >= 3.0 only honors that stored order when each bucket is one file
(write_bucketed repartitions to guarantee it) and
`spark.sql.legacy.bucketedTableScan.outputOrdering=true`; without the conf
the join still runs exchange-free and pays only a cheap partition-local
sort of already-sorted data.

This is the batch analog of `VectorStore`'s partitionBy(cluster_id) layout
(probe = partition pruning): declare the physical layout once, and Catalyst
drops the expensive operator from every downstream plan. The repo treats it
as the recommended layout for fact tables that join repeatedly on a stable
key — exactly the shape of an enrichment join a training-data pipeline runs
every epoch.

Bucketed tables must live in the session catalog (bucket metadata is
catalog state, not parquet metadata), so writers here `saveAsTable` into a
dedicated database whose LOCATION the caller controls — nothing touches the
default warehouse path.

Reference analog: none — the reference (a single-process hnswlib wrapper,
`/root/reference/src/implementations/index.py`) has no multi-table layout
surface; this belongs to the Spark-native scale layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BUCKET_DB = "colocated"


def ensure_bucket_db(spark: SparkSession, location: str) -> None:
    """Create the bucket database at an explicit filesystem location."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {BUCKET_DB} LOCATION '{location}'"
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed (and optionally per-bucket-sorted)
    catalog table. One shuffle now, zero shuffles in every later join or
    aggregation keyed on `bucket_cols`."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {BUCKET_DB}.{table}")
    # One file per bucket: the reader only trusts (and therefore only
    # ELIMINATES) the per-bucket sort order when a bucket is a single file;
    # multiple writer tasks per bucket would each emit their own sorted
    # file and put a Sort back into every downstream merge join.
    df = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(f"{BUCKET_DB}.{table}")


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(f"{BUCKET_DB}.{table}")
