"""Generic MERGE INTO — lakehouse-style upsert over arbitrary DataFrames.

The store already has key-centric upsert (operators/store.py W2); this is
the *relational* operator: one statement that applies matched-UPDATE,
matched-DELETE, and not-matched-INSERT clauses from a source table to a
target table, like Delta Lake / Iceberg `MERGE INTO` (public API surface;
semantics per the ANSI SQL:2003 MERGE statement).

Reference analog: none — SudYar/MLVectorDB has no table mutation beyond
vector upsert/delete (src/mlvectordb/interfaces/storage_engine.py:21-44);
this belongs to the relational extension layer that makes the engine a
drop-in for training-data table maintenance (CDC feeds, returns feeds,
label corrections) at 100 TB.

Scale design — the whole point of having two physical strategies:

- ``strategy="broadcast"`` (the 100 TB default when the source is a
  bounded CDC batch): the target is NEVER shuffled. Matched rows are
  resolved with a LEFT OUTER join whose build side is the broadcast
  source; inserts are found with a source-side anti join against the
  target's *key column only* (column-pruned scan). Two target scans, zero
  target shuffles — at 100 TB this is the difference between a merge that
  runs in minutes and one that re-shuffles the lake.
- ``strategy="shuffle"``: one FULL OUTER join on the key (single target
  scan, one co-partitioning shuffle of both sides). Right when the source
  is comparable in size to the target.
- ``strategy="auto"`` picks broadcast when the source row count is under
  ``broadcast_threshold`` (a bounded count over the — typically tiny —
  source; callers with a known-huge source pass "shuffle" explicitly).

Source rows reference columns as-is; `update_set` / conditions reference
the two sides through the ``t.`` / ``s.`` aliases (Spark column
resolution over the joined frame).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_source(
    source: DataFrame, on: list[str], order_col: str
) -> DataFrame:
    """Keep the latest source row per key (greatest `order_col`, ties
    broken arbitrarily-but-deterministically by the remaining columns).

    MERGE requires at most one source row per target row (ANSI + Delta
    both error otherwise); CDC feeds routinely violate that within a
    batch, so callers dedup first. Struct-max aggregation — one shuffle
    on the key, no window sort."""
    others = [c for c in source.columns if c not in on]
    packed = F.max(
        F.struct(F.col(order_col), *[F.col(c) for c in others if c != order_col])
    ).alias("__m")
    out = source.groupBy(*on).agg(packed)
    return out.select(
        *on, *[F.col(f"__m.{c}").alias(c) for c in [order_col] + [c for c in others if c != order_col]]
    ).select(*source.columns)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str] | str,
    update_set: dict[str, Column] | None = None,
    update_condition: Column | None = None,
    delete_condition: Column | None = None,
    insert: bool = True,
    insert_set: dict[str, Column] | None = None,
    insert_condition: Column | None = None,
    strategy: str = "auto",
    broadcast_threshold: int = 1_000_000,
    evolve_schema: bool = False,
) -> DataFrame:
    """Return the merged target: ANSI-MERGE semantics, copy-on-write.

    - matched & `delete_condition`            -> row removed
    - matched & `update_condition` (def. all) -> `update_set` applied
      (default: every target column that also exists in the source is
      replaced by the source value)
    - matched otherwise                       -> target row kept as-is
    - not matched in target & `insert`        -> `insert_set` projected
      (default: source value where the column exists, else NULL),
      gated by `insert_condition` when given (e.g. a CDC feed's
      delete-markers for rows that never existed must NOT insert)
    - target rows with no source match        -> kept as-is

    Conditions and the values in `update_set`/`insert_set` may reference
    `F.col("t.<col>")` and `F.col("s.<col>")`. The source must be unique
    per key (see `dedup_source`).

    `evolve_schema=True` enables automatic schema evolution (the Delta
    `mergeSchema` analog, public API shape): source columns absent from
    the target are APPENDED to the output schema — existing target rows
    carry NULL there, matched-updated rows and inserts take the source
    value. By default (False) extra source columns are silently ignored,
    the ANSI behavior (the statement never references them).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if evolve_schema:
        new_cols = [c for c in source.columns if c not in target.columns]
        stray_keys = [k for k in keys if k in new_cols]
        if stray_keys:
            # widening a MERGE KEY to all-NULL would make the join match
            # nothing: every target row kept with a NULL key, every
            # source row inserted — silent duplicate-key corruption.
            # Delta raises in the analogous case; so do we.
            raise ValueError(
                f"merge key(s) {stray_keys} do not exist in the target; "
                "schema evolution cannot create join keys"
            )
        if new_cols:
            # widening the target FIRST makes evolution fall out of the
            # normal clause machinery: the new columns exist on the t side
            # as typed NULLs, so updates/inserts resolve source values and
            # untouched rows keep NULL — no special cases downstream
            target = target.select(
                "*",
                *[
                    F.lit(None).cast(source.schema[c].dataType).alias(c)
                    for c in new_cols
                ],
            )
    for label, clause in (("update_set", update_set), ("insert_set", insert_set)):
        if clause:
            stray = set(clause) - set(target.columns)
            if stray:
                raise ValueError(
                    f"{label} refers to column(s) not in the target: "
                    f"{sorted(stray)}"
                )
    t = target.withColumn("__t_present", F.lit(1)).alias("t")
    s = source.withColumn("__s_present", F.lit(1)).alias("s")

    if strategy == "auto":
        n_src = source.limit(broadcast_threshold + 1).count()
        strategy = "broadcast" if n_src <= broadcast_threshold else "shuffle"

    def _merged_value(c: str) -> Column:
        tc = F.col(f"t.{c}")
        if update_set is not None:
            upd = update_set.get(c, tc)
        elif c in keys:
            upd = tc
        elif c in source.columns:
            upd = F.col(f"s.{c}")
        else:
            upd = tc
        if update_condition is not None:
            upd = F.when(update_condition, upd).otherwise(tc)
        return upd

    def _insert_value(c: str) -> Column:
        dt = target.schema[c].dataType
        if insert_set is not None and c in insert_set:
            return insert_set[c].cast(dt)
        if c in source.columns:
            return F.col(f"s.{c}").cast(dt)
        return F.lit(None).cast(dt)

    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    matched = F.col("s.__s_present").isNotNull()
    keep = (
        F.lit(True)
        if delete_condition is None
        else F.when(matched & delete_condition, F.lit(False)).otherwise(
            F.lit(True)
        )
    )

    out_cols = [
        F.when(matched, _merged_value(c)).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]

    if strategy == "broadcast":
        # Target never shuffles: broadcast the source into a left join.
        upserted = (
            t.join(F.broadcast(s), cond, "left_outer")
            .filter(keep)
            .select(*out_cols)
        )
        if insert:
            # Which source keys exist in the target? A naive
            # `source ANTI target` would shuffle the target's key column
            # (huge at scale). Instead: broadcast-SEMI the source into a
            # key-pruned target scan — output is bounded by the matched
            # row count (≈ |source| for unique target keys) — then
            # broadcast-ANTI the source against that small key set. The
            # target is scanned, never shuffled.
            matched_keys = target.select(*keys).join(
                F.broadcast(source.select(*keys)), keys, "left_semi"
            )
            unmatched = s.join(
                F.broadcast(matched_keys.alias("t")), cond, "left_anti"
            )
            # contract parity with the shuffle strategy: insert clauses may
            # reference t.<col> (NULL for never-matched rows there). The
            # anti-join output has no t side, so graft one back as an empty
            # broadcast left join — Catalyst folds limit(0) to an empty
            # relation; every t.<col> resolves to NULL at zero cost.
            unmatched = unmatched.join(F.broadcast(t.limit(0)), cond, "left_outer")
            if insert_condition is not None:
                unmatched = unmatched.filter(insert_condition)
            inserts = unmatched.select(
                *[_insert_value(c).alias(c) for c in target.columns]
            )
            return upserted.unionByName(inserts)
        return upserted

    if strategy != "shuffle":
        raise ValueError(f"unknown merge strategy {strategy!r}")

    joined = t.join(s, cond, "full_outer")
    t_present = F.col("t.__t_present").isNotNull()
    merged = (
        joined.filter(t_present)
        .filter(keep)
        .select(*out_cols)
    )
    if insert:
        unmatched = joined.filter(~t_present)
        if insert_condition is not None:
            unmatched = unmatched.filter(insert_condition)
        inserts = unmatched.select(
            *[_insert_value(c).alias(c) for c in target.columns]
        )
        return merged.unionByName(inserts)
    return merged
