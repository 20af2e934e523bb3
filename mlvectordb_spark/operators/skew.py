"""Skew mitigation: salting helpers + bucketed co-located joins.

At 100 TB the two shuffle killers are (a) one hot key swamping a reducer
and (b) re-shuffling a big fact table for every join. The helpers here are
the standard remedies:

- **Salted aggregation**: two-phase groupBy over (key, salt) — partial
  aggregates fan the hot key across `salt_buckets` reducers, then a cheap
  final merge over |keys| rows. Exact same results for decomposable aggs.
- **Salted join**: replicate the (small) right side per salt value, salt
  the left side — a hot left key spreads over `salt_buckets` tasks.
- **Bucketed tables**: `bucketBy` both join sides on the key at write time
  → Spark plans a sort-merge join with NO Exchange on either side.
  (AQE's skew-join splitting is ON in session defaults as the runtime
  safety net; these helpers are the static layout tools.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact groupBy(key).agg(count, sum) resistant to hot keys: phase 1
    aggregates (key, salt) partials, phase 2 merges per key."""
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count("*").alias("__n"), F.sum(sum_col).alias("__s"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.sum("__s").alias(f"sum_{sum_col}"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join where `left` has skewed keys: left rows get a random
    salt, right rows are replicated once per salt value, join key becomes
    (on, salt). Right side should be the smaller input (replication factor
    = salt_buckets)."""
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(salt_buckets)])
    ).alias("__salt")
    right_rep = right.select("*", salts)
    left_salted = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    return left_salted.join(right_rep, [on, "__salt"]).drop("__salt")


def bucketed_write(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table: both sides
    of a future join bucketed on the key ⇒ shuffle-free sort-merge join."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join_plan(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> tuple[DataFrame, str]:
    """Join two bucketed tables and return (df, physical plan text) so
    callers/tests can assert the absence of Exchange operators."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    joined = lt.join(rt, on)
    plan = lt._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        joined._jdf.queryExecution(), "formatted"
    )
    return joined, plan
