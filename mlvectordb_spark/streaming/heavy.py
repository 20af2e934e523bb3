"""Streaming heavy hitters — an accumulating count-min sketch over ingest.

The batch operator (`operators/sketches.heavy_hitters`) pays one full
sketch-building pass before it can prune; under continuous ingest that
pass would re-read the whole corpus every time the question is asked.
CMS is a LINEAR sketch — the sketch of a union is the cell-wise sum of
the sketches — so the streaming twin maintains it incrementally: each
micro-batch contributes only its own partial (depth x width bounded,
regardless of batch size), persisted as a `batch=<id>/` partition in the
same layout discipline as the dedup band index (`streaming/dedup.py`).
A replayed micro-batch overwrites its OWN partition, so crash-replay is
idempotent by construction — no exclusion dance needed, because partials
are per-batch disjoint state, not a shared screen.

Query time: merge the partials (one metadata-scale read of bounded
rows), then run the same certified prune + exact count over the
accumulated corpus — the expensive pass-1 never re-runs. Linearity makes
the contract testable bit-for-bit: the merged streamed matrix EQUALS the
one-shot batch matrix (asserted in tests/test_stream_heavy.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlvectordb_spark.functions.localdf import local_rows_df

from mlvectordb_spark.operators.sketches import (
    _bucket,
    with_cms_estimate,
)


def _meta_path(path: str) -> str:
    # underscore prefix => invisible to spark.read.parquet(path)'s
    # partition discovery over the batch=<id>/ partials
    return f"{path}/_cms_meta"


def _write_meta(spark: SparkSession, path: str, width: int, depth: int) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(_meta_path(path))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        return
    local_rows_df(spark, 
        [(json.dumps({"width": width, "depth": depth}),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(_meta_path(path))


def read_meta(spark: SparkSession, path: str) -> dict:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(_meta_path(path))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        raise FileNotFoundError(f"no CMS meta at {path}")
    return json.loads(spark.read.text(_meta_path(path)).collect()[0].value)


def write_partial(
    batch_df: DataFrame,
    col: str,
    path: str,
    batch_id: int,
    width: int = 2048,
    depth: int = 3,
) -> None:
    """Fold one micro-batch into the accumulating sketch: the batch's own
    partial matrix (<= depth*width rows however large the batch) lands at
    `path/batch=<id>/`, overwriting any residue from a failed prior
    attempt of the same batch."""
    _write_meta(batch_df.sparkSession, path, width, depth)
    c = F.col(col)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("r"), _bucket(c, i, width).alias("b"))
            for i in range(depth)
        ]
    )
    (
        batch_df.select(F.explode(pairs).alias("p"))
        .groupBy("p.r", "p.b")
        .agg(F.count("*").alias("c"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/batch={batch_id}")
    )


def merged_matrix(spark: SparkSession, path: str) -> list[list[int]]:
    """Cell-wise sum of all persisted partials (CMS linearity). The read
    is bounded: n_batches x depth x width rows of (r, b, c) — metadata
    scale, never corpus scale."""
    meta = read_meta(spark, path)
    width, depth = meta["width"], meta["depth"]
    rows = (
        spark.read.parquet(path)
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    mat = [[0] * width for _ in range(depth)]
    for row in rows:
        mat[row.r][row.b] = row.c
    return mat


def heavy_hitters_over(
    corpus_df: DataFrame,
    col: str,
    path: str,
    min_count: int,
) -> DataFrame:
    """EXACT heavy hitters over the accumulated corpus, pruned by the
    streamed sketch: same certified-superset contract as the batch
    operator, but pass-1 cost was already paid incrementally at ingest."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    spark = corpus_df.sparkSession
    mat = merged_matrix(spark, path)
    pruned = with_cms_estimate(corpus_df, col, mat).filter(
        F.col("__cms_est") >= min_count
    )
    return (
        pruned.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def start_heavy_ingest(
    stream: DataFrame,
    col: str,
    sketch_path: str,
    checkpoint_dir: str,
    query_name: str,
    width: int = 2048,
    depth: int = 3,
):
    """Attach a stream to the accumulating sketch. Each micro-batch folds
    in its partial; `heavy_hitters_over` answers at any time from the
    merged state. Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_partial(
            batch_df, col, sketch_path, batch_id, width=width, depth=depth
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
