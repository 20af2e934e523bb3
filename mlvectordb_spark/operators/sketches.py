"""Count-min-sketch prefiltered EXACT heavy hitters.

The straight `groupBy(value).count()` heavy-hitter query is shuffle-bound
by DISTINCT-value cardinality, not by answer size: at 100 TB a token /
n-gram / URL domain has billions of distinct values, almost all below any
interesting threshold, and every one of them crosses the wire to a
reducer just to be discarded. The fix is the same certify-then-verify
shape as the ANN operators (`operators/ann.py`): a lossy-but-one-sided
sketch prunes the candidate set, and an exact pass over the survivors
produces the final answer — never an approximate count.

Pass 1 — sketch build (one scan, near-zero shuffle): every occurrence
emits `depth` (row, bucket) pairs; `groupBy(row, bucket)` with map-side
combine means at most `partitions x depth x width` rows shuffle,
independent of distinct-value cardinality. The merged matrix (depth x
width longs — a few hundred KB) collects to the driver.

Pass 2 — certified prune + exact count: the matrix rides back as a
broadcast one-row frame; each occurrence's CMS estimate (min over depth
hashed cells) is computed JVM-side and compared to the threshold. CMS
only ever OVER-estimates (each cell sums the true count plus collisions),
so `estimate >= min_count` keeps a SUPERSET of the true heavy hitters —
no false negatives, certified. Only surviving occurrences (heavy values
plus a small collision leakage that shrinks with `width`) enter the exact
`groupBy`, whose final HAVING removes the leakage.

On a power-law corpus the prune drops the long tail — ~99% of distinct
values — before the shuffle; on a uniform corpus (the honest worst case)
it only drops values below threshold, and the cost degrades gracefully
to the plain groupBy it replaced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mlvectordb_spark.functions.localdf import local_rows_df


def _bucket(col: Column, seed: int, width: int) -> Column:
    """Row-`seed` hash bucket: xxhash64 (JVM, codegen) salted by seed."""
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(width))


def cms_matrix(
    df: DataFrame, col: str, width: int = 2048, depth: int = 3
) -> list[list[int]]:
    """Build the merged count-min matrix in ONE scan.

    Each occurrence explodes into `depth` (row, bucket) pairs; partial
    aggregation collapses them to bucket grain per task before the
    shuffle, so shuffle volume is O(partitions * depth * width) — bounded
    regardless of corpus size or distinct cardinality. The depth*width
    matrix is driver-bounded by construction.
    """
    c = F.col(col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"), _bucket(c, i, width).alias("b")
            )
            for i in range(depth)
        ]
    )
    counts = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy("p.r", "p.b")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    mat = [[0] * width for _ in range(depth)]
    for row in counts:
        mat[row.r][row.b] = row.c
    return mat


def with_cms_estimate(
    df: DataFrame,
    col: str,
    mat: list[list[int]],
    est_col: str = "__cms_est",
) -> DataFrame:
    """Attach each row's CMS count estimate (min over depth cells).

    The matrix rides as a broadcast single-row frame (arrays of longs);
    the lookup is element_at over the hashed bucket — pure Column
    arithmetic, no UDF. Estimates are exact-or-over, never under.
    """
    depth, width = len(mat), len(mat[0])
    spark = df.sparkSession
    schema = T.StructType(
        [
            T.StructField(f"__cms_{i}", T.ArrayType(T.LongType()))
            for i in range(depth)
        ]
    )
    cms_df = local_rows_df(spark, [tuple(mat)], schema=schema)
    est = F.least(
        *[
            F.element_at(
                F.col(f"__cms_{i}"),
                (_bucket(F.col(col), i, width) + 1).cast("int"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.crossJoin(F.broadcast(cms_df))
        .withColumn(est_col, est)
        .drop(*[f"__cms_{i}" for i in range(depth)])
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    width: int = 2048,
    depth: int = 3,
) -> DataFrame:
    """EXACT values-with-count >= min_count, sketch-pruned.

    Returns (col, cnt) with exact counts — identical to
    `df.groupBy(col).count().filter(count >= min_count)`, but only
    occurrences whose certified-superset CMS estimate clears the
    threshold enter the shuffle. The final filter removes collision
    leakage, so the sketch parameters affect COST only, never the answer.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    mat = cms_matrix(df, col, width=width, depth=depth)
    pruned = with_cms_estimate(df, col, mat).filter(
        F.col("__cms_est") >= min_count
    )
    return (
        pruned.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
