"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implementation is the union-marker pattern, not a range crossJoin:
union left and right rows tagged by side, sort within each key by
(time, side-priority), and carry the latest right-side values forward with
a last_value window. One shuffle on the key, O(n log n) per key, no
quadratic candidate explosion — this is the shape that survives 100 TB
(the alternative `l.time >= r.time` theta-join degenerates to a per-key
cross product).

`tolerance` optionally discards matches older than a horizon, which also
bounds state in a streaming adaptation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    right_time <= left_time (ties: right row wins over the left row at the
    same instant unless `strict`, which requires right_time < left_time).

    Returns all left columns plus `value_cols` (prefixed asof_) and
    `asof_time`."""
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_time)
        ]

    lt = F.col(left_time)
    # side marker: right rows sort BEFORE left rows at equal time when
    # non-strict (so last_value sees them), AFTER when strict
    right_marker = 0 if not strict else 2
    r = right.select(
        F.col(on).alias(on),
        F.col(right_time).alias("__t"),
        F.lit(right_marker).alias("__side"),
        F.col(right_time).alias("__asof_time"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__asof_time"].dataType).alias("__asof_time"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in l_cols],
        "__side",
        "__t",
        F.last(F.col("__asof_time"), ignorenulls=True).over(w).alias("asof_time"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        horizon = F.col("__t").cast("double") - F.col("asof_time").cast("double")
        keep = F.col("asof_time").isNotNull() & (horizon <= F.lit(tolerance_seconds))
        out = out.withColumn("asof_time", F.when(keep, F.col("asof_time"))).select(
            *l_cols,
            "asof_time",
            *[
                F.when(keep, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
        return out
    return out.drop("__t")
