"""File-format connectors (SURVEY.md §2.4 scans/sources/sinks row).

The reference has no file formats at all (in-memory dict storage,
`storage_engine_in_memory.py:11-12`; REST is its only connector). Here the
engine reads/writes the formats a Spark deployment actually uses. Parquet
is the canonical storage (columnar, predicate pushdown, partition pruning);
CSV/JSON are interchange formats; ORC is the alternate columnar container.

All writers accept `partition_by` so tables land partitioned for pruning;
readers take explicit schemas where inference would be lossy (CSV) or slow
at scale (JSON)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)
