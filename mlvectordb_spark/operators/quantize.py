"""Scalar (int8) vector quantization — the storage-compression path.

At 100 TB the embedding column dominates storage and scan cost; SQ8 (one
byte per component, per-vector min/max scale) is the standard 4× shrink a
vector store offers (reference's hnswlib holds float32, but every
production ANN system pairs the index with a quantized codebook). Search
then runs in two stages: approximate scan over dequantized codes to build
a candidate pool, then exact rescoring of the pool against the full-
precision vectors — recall loss is confined to candidates whose quantized
score straddles the pool boundary.

All expressions are pure Catalyst array ops (no Python). Plan-shape rule
learned the hard way: per-vector scalars (min, scale) MUST be hoisted into
their own projection before any lambda references them — higher-order
functions evaluate interpreted, so an `array_min(v)` inlined into a
`transform` lambda is recomputed PER ELEMENT (O(d²) per row; measured 6-8×
slower on the 64-dim bench corpus). The helpers below stage `__v`,
`__mn`, `__scale` as columns and have lambdas reference them as plain
attributes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlvectordb_spark.functions.vector import l2_sq


def _dbl(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def with_sq8_stage(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the staged quantization scalars: `__v` (double vector),
    `__mn`, `__scale`. Constant vectors get scale 0 (codes all 0, exact
    reconstruction of mn)."""
    return df.withColumn("__v", _dbl(vec_col)).withColumn(
        "__mn", F.array_min("__v")
    ).withColumn(
        "__scale", (F.array_max("__v") - F.array_min("__v")) / F.lit(255.0)
    )


def sq8_codes() -> Column:
    """Int codes round((x-mn)/scale) over the staged columns."""
    mn, scale = F.col("__mn"), F.col("__scale")
    return F.transform(
        "__v",
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round((x - mn) / scale, 0))
        .cast("int"),
    )


def sq8_reconstruction() -> Column:
    """Round-tripped (quantize → dequantize) vector over staged columns."""
    mn, scale = F.col("__mn"), F.col("__scale")
    return F.transform(
        "__v",
        lambda x: mn
        + F.when(scale == 0.0, F.lit(0.0)).otherwise(F.round((x - mn) / scale, 0))
        * scale,
    )


def sq8_abs_error() -> Column:
    """Per-component |x - dequant(quant(x))| over staged columns."""
    return F.zip_with(F.col("__v"), sq8_reconstruction(), lambda a, b: F.abs(a - b))


def sq8_error_stats(
    df: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-group mean/max absolute reconstruction error — the quantization
    quality diagnostic. One narrow projection pass + one group-by."""
    staged = with_sq8_stage(df, vec_col)
    err = sq8_abs_error()
    per_vec = staged.select(
        group_col,
        (
            F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
            / F.size("__v")
        ).alias("mean_err"),
        F.array_max(err).alias("max_err"),
    )
    return per_vec.groupBy(group_col).agg(
        F.round(F.avg("mean_err"), 6).alias("avg_abs_err"),
        F.round(F.max("max_err"), 6).alias("max_abs_err"),
        F.count("*").cast("bigint").alias("n_vectors"),
    )


def knn_sq8(
    emb: DataFrame,
    qdf: DataFrame,
    k: int,
    pool: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage quantized KNN (squared-L2): stage 1 ranks the corpus by
    distance over SQ8-reconstructed vectors (what a scan over stored codes
    computes — the full-precision column is never touched); stage 2
    rescores only the `pool` best candidates exactly and returns top-k.

    Both stages are TakeOrderedAndProject over a narrow scan — no corpus
    shuffle; the pool (≥k, constant-sized) is the only intermediate."""
    q = F.broadcast(qdf.select(_dbl(vec_col).alias("__qvec")))
    staged = with_sq8_stage(emb, vec_col).crossJoin(q)
    approx = l2_sq(sq8_reconstruction(), F.col("__qvec"))
    cands = (
        staged.withColumn("__approx", approx)
        .orderBy(F.col("__approx").asc(), F.col(id_col).asc())
        .limit(pool)
    )
    exact = F.round(l2_sq(F.col("__v"), F.col("__qvec")), 4)
    return (
        cands.withColumn("score", exact)
        .orderBy(F.col("score").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__qvec", "__approx", "__v", "__mn", "__scale")
    )
