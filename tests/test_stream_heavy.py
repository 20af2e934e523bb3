"""Streaming heavy hitters: CMS linearity, replay idempotence, exactness.

The accumulating sketch's whole contract is linearity — the merged
streamed partials must equal the one-shot batch matrix BIT-FOR-BIT, so
every downstream certification argument transfers unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from mlvectordb_spark.operators.sketches import cms_matrix
from mlvectordb_spark.streaming import heavy as H


def _drop_file(spark, df, src_dir, name):
    """Materialize df as ONE parquet file inside the stream source dir."""
    tmp = os.path.join(str(src_dir), f".__stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(str(src_dir), name))
    shutil.rmtree(tmp)


def _tokens(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("w"), F.pmod(F.xxhash64("id"), F.lit(200)).cast("string"))
        .alias("token")
    )


def test_streamed_partials_merge_to_batch_matrix(spark, tmp_path):
    path = str(tmp_path / "cms")
    full = _tokens(spark, 0, 30_000)
    for i, (lo, hi) in enumerate([(0, 10_000), (10_000, 25_000), (25_000, 30_000)]):
        H.write_partial(_tokens(spark, lo, hi), "token", path, i, width=256, depth=3)
    assert H.merged_matrix(spark, path) == cms_matrix(full, "token", 256, 3)


def test_replayed_batch_overwrites_not_doubles(spark, tmp_path):
    path = str(tmp_path / "cms")
    H.write_partial(_tokens(spark, 0, 5_000), "token", path, 0, width=256, depth=2)
    before = H.merged_matrix(spark, path)
    # crash-replay of batch 0: same data, same id -> state unchanged
    H.write_partial(_tokens(spark, 0, 5_000), "token", path, 0, width=256, depth=2)
    assert H.merged_matrix(spark, path) == before


def test_heavy_hitters_over_corpus_is_exact(spark, tmp_path):
    path = str(tmp_path / "cms")
    chunks = [(0, 12_000), (12_000, 30_000)]
    for i, (lo, hi) in enumerate(chunks):
        H.write_partial(_tokens(spark, lo, hi), "token", path, i, width=512, depth=3)
    corpus = _tokens(spark, 0, 30_000)
    got = {
        (r.token, r.cnt)
        for r in H.heavy_hitters_over(corpus, "token", path, 160).collect()
    }
    want = {
        (r.token, r.n)
        for r in corpus.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 160)
        .collect()
    }
    assert got == want and len(want) > 0


def test_meta_round_trip_and_mismatch_guard(spark, tmp_path):
    path = str(tmp_path / "cms")
    H.write_partial(_tokens(spark, 0, 100), "token", path, 0, width=128, depth=2)
    meta = H.read_meta(spark, path)
    assert meta == {"width": 128, "depth": 2}
    # later batches reuse the persisted geometry; merged matrix shape follows it
    mat = H.merged_matrix(spark, path)
    assert len(mat) == 2 and len(mat[0]) == 128


def test_end_to_end_stream(spark, tmp_path):
    """True readStream -> foreachBatch -> query cycle (availableNow)."""
    src = tmp_path / "src"
    src.mkdir()
    sketch, ckpt = str(tmp_path / "sk"), str(tmp_path / "ckpt")
    _drop_file(spark, _tokens(spark, 0, 8_000), src, "f1.parquet")
    stream = spark.readStream.schema("token string").parquet(str(src))
    q = H.start_heavy_ingest(stream, "token", sketch, ckpt, "heavy_b1", width=256)
    q.awaitTermination()
    _drop_file(spark, _tokens(spark, 8_000, 20_000), src, "f2.parquet")
    stream = spark.readStream.schema("token string").parquet(str(src))
    q = H.start_heavy_ingest(stream, "token", sketch, ckpt, "heavy_b2", width=256)
    q.awaitTermination()
    corpus = _tokens(spark, 0, 20_000)
    got = H.heavy_hitters_over(corpus, "token", sketch, 110)
    want = (
        corpus.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 110)
    )
    assert {(r.token, r.cnt) for r in got.collect()} == {
        (r.token, r.cnt) for r in want.collect()
    }
