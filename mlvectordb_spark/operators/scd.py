"""SCD Type-2 (history-preserving upsert) without a transactional format.

The MERGE-INTO pattern emulated with plain DataFrame ops (anti-join +
union + window), per the classic recipe: a dimension table keeps one row
per (key, version) with [valid_from, valid_to) ranges and an is_current
flag; applying a batch of updates closes the current row of changed keys
and appends the new version.

Scale shape: one shuffle on the key for the join, one window per key group
— the update batch is typically small vs the dimension, so the join
broadcasts the updates. History rows for untouched keys are passed through
untouched (no rewrite amplification beyond the touched keys' partitions
when the output is partitioned by key-bucket)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Open a version-1 history from an initial snapshot."""
    return (
        snapshot.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Fold an update batch into the history.

    The returned frame references `history` from four branches, so when
    CHAINING applies, materialize between batches (persist/checkpoint or
    write-read — the history is stored state in production anyway):
    a lazy chain re-executes the previous fold's whole lineage per
    branch and the plan grows ~4× per batch.

    - unchanged keys: history rows pass through
    - changed keys: current row closes (valid_to = update ts,
      is_current = false), new version appends
    - brand-new keys: version-1 row appends
    Updates whose compare_cols equal the current row are no-ops.
    """
    cur = history.filter(F.col("is_current"))
    upd = F.broadcast(
        updates.select(
            F.col(key),
            F.col(ts_col).alias("__new_ts"),
            *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        )
    )
    joined = cur.join(upd, key, "left")
    # Per-column null-safe comparison. NOT a concat_ws fingerprint: any
    # separator can collide on column boundaries (("ab","c") vs ("a","bc")
    # when values may contain the separator) and concat_ws SKIPS nulls, so
    # a NULL->"" transition compares equal — real updates became no-ops.
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    changed_pred = F.col("__new_ts").isNotNull() & ~same
    # close changed current rows
    closed = joined.withColumn(
        "valid_to",
        F.when(changed_pred, F.col("__new_ts")).otherwise(F.col("valid_to")),
    ).withColumn(
        "is_current",
        F.when(changed_pred, F.lit(False)).otherwise(F.col("is_current")),
    ).select(*history.columns)
    # new versions for changed keys
    new_versions = (
        joined.filter(changed_pred)
        .select(
            F.col(key),
            *[F.col(f"__new_{c}").alias(c) for c in compare_cols],
            F.col("__new_ts").alias("valid_from"),
        )
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    # brand-new keys (not in history at all)
    fresh = (
        updates.join(history.select(key).distinct(), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(c) for c in compare_cols],
            F.col(ts_col).alias("valid_from"),
        )
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    hist_closed = history.filter(~F.col("is_current"))
    order = [key, *compare_cols, *SCD_COLS]
    return (
        hist_closed.select(*order)
        .unionByName(closed.select(*order))
        .unionByName(new_versions.select(*order))
        .unionByName(fresh.select(*order))
    )
