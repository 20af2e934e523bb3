"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Plain `spark.read.parquet` — columnar scan, predicate pushdown and column
pruning come free from the parquet datasource. At cluster scale the same
call reads a partitioned table from object storage; nothing here collects
to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlvectordb_spark.schema import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# plan cache: footer/schema reads happen once per (session, dir, table).
# DataFrames are immutable logical plans, so sharing the object across
# queries is free and safe; keyed on the session so a new session re-reads.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; runtime-set the legacy conf (works even when the
        # session wasn't built by mlvectordb_spark.session.get_spark).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as long nanoseconds —
    # convert to a microsecond TimestampType (source data is µs-granular).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/1000` — double division at ~1.7e15 ns rounds
        # the last microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # newer testdata generations write TIMESTAMP(MICROS) without the
        # UTC-adjusted flag, which infers as TIMESTAMP_NTZ; normalize to
        # session-tz TIMESTAMP (tz pinned UTC, so values are unchanged) —
        # NTZ rejects casts like `ts::double` that the queries rely on.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for n in TESTDATA_TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
