"""Ingest-time streaming near-dup rejection: the accumulating LSH band
index screens each micro-batch against everything previously accepted."""

from __future__ import annotations

import os
import shutil


TEXT_A = "the quick brown fox jumps over the lazy dog again and again today"
TEXT_B = "completely different content describing spark execution engines and shuffles"
TEXT_C = "yet another unique document about parquet footers and column pruning"


def _drop_file(spark, rows, src_dir, name):
    """Materialize rows as ONE parquet file inside the stream source dir."""
    tmp = os.path.join(str(src_dir), f".__stage_{name}")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(str(src_dir), name))
    shutil.rmtree(tmp)


def test_ingest_dedup_accumulates_across_batches(spark, tmp_path):
    from mlvectordb_spark.streaming.dedup import start_dedup_ingest

    src = tmp_path / "src"
    src.mkdir()
    bands, out, ckpt = (str(tmp_path / d) for d in ("bands", "out", "ckpt"))

    def run_once(name):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        q = start_dedup_ingest(stream, bands, out, ckpt, name)
        q.awaitTermination()

    # batch 1: in-batch dup (1,2 identical) + one unique -> survivors {1, 3}
    _drop_file(spark, [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)], src, "b1.parquet")
    run_once("dedup_ingest_b1")
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 3}

    # batch 2: dup of the PERSISTED corpus (4=A), a fresh doc, and a doc too
    # short to shingle (carries no signal -> dropped)
    _drop_file(spark, [(4, TEXT_A), (5, TEXT_C), (6, "hi")], src, "b2.parquet")
    run_once("dedup_ingest_b2")
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 3, 5}

    # the band index only carries survivors
    idx_ids = {r.doc_id for r in spark.read.parquet(bands).collect()}
    assert idx_ids == {1, 3, 5}


def test_screen_batch_is_pure_and_reusable(spark, tmp_path):
    """The screening kernel works as a plain batch call (no stream) — the
    shared-kernel contract with q_dedup_minhash."""
    from mlvectordb_spark.streaming.dedup import screen_batch

    batch = spark.createDataFrame(
        [(10, TEXT_A), (11, TEXT_A), (12, TEXT_B)], "doc_id long, text string"
    )
    survivors, survivor_bands = screen_batch(
        batch, str(tmp_path / "nonexistent_bands")
    )
    assert {r.doc_id for r in survivors.collect()} == {10, 12}
    from mlvectordb_spark.operators.minhash import MINHASH_BANDS

    assert survivor_bands.count() == 2 * MINHASH_BANDS
