"""Ingest-time streaming near-dup rejection: the accumulating LSH band
index screens each micro-batch against everything previously accepted."""

from __future__ import annotations

import os
import shutil


TEXT_A = "the quick brown fox jumps over the lazy dog again and again today"
TEXT_B = "completely different content describing spark execution engines and shuffles"
TEXT_C = "yet another unique document about parquet footers and column pruning"
TEXT_D = "fourth corpus entry on adaptive query execution and shuffle partition sizing"
TEXT_E = "fifth text covering bloom filters vectorized readers and predicate pushdown"


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


def test_ingest_five_batches_with_compaction_and_no_cache_growth(spark, tmp_path):
    """A longer run: 5 micro-batches with compact_every=2. The survivor set
    must be what per-batch screening implies, the band index must end up
    folded into few dirs, and NO cached RDD may outlive the stream (the
    per-batch band cache is released in write_batch's finally)."""
    from mlvectordb_spark.streaming.dedup import start_dedup_ingest

    src = tmp_path / "src"
    src.mkdir()
    bands, out, ckpt = (str(tmp_path / d) for d in ("bands", "out", "ckpt"))

    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    batches = [
        [(1, TEXT_A), (2, TEXT_B)],          # b0: both survive
        [(3, TEXT_A), (4, TEXT_C)],          # b1: 3 rejected (corpus A), 4 survives
        [(5, TEXT_D)],                       # b2: survives (compaction fires first)
        [(6, TEXT_C), (7, TEXT_C)],          # b3: 6 rejected (corpus C); 7 also C
        [(8, TEXT_E), (9, TEXT_D)],          # b4: 8 survives, 9 rejected (corpus D)
    ]
    for i, rows in enumerate(batches):
        _drop_file(spark, rows, src, f"b{i}.parquet")
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        q = start_dedup_ingest(
            stream, bands, out, ckpt, f"dedup_ingest_seq_{i}", compact_every=2
        )
        q.awaitTermination()

    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert survivors == {1, 2, 4, 5, 8}
    idx_ids = {r.doc_id for r in spark.read.parquet(bands).collect()}
    assert idx_ids == survivors

    # compaction ran (compact_every=2 over 5 batches): fewer than one dir
    # per batch remains, and at least one negative-generation dir exists
    dirs = [d for d in os.listdir(bands) if d.startswith("batch=")]
    assert len(dirs) < 5
    assert any(int(d.split("=")[1]) < 0 for d in dirs)

    # no leaked executor storage: every per-batch cache was unpersisted
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= cached_before


def test_replayed_batch_is_not_screened_against_its_own_bands(spark, tmp_path):
    """The crash-replay case: a failed prior attempt already wrote this
    batch's bands under bands_path/batch=<id>. Screening the replay WITHOUT
    excluding that id would reject every doc against its own bands and then
    overwrite the outputs with empty sets — silent loss. With exclusion the
    batch screens exactly like a first attempt."""
    from mlvectordb_spark.operators.minhash import bands_from_shingles, shingle_table
    from mlvectordb_spark.streaming.dedup import screen_batch

    bands = str(tmp_path / "bands")
    batch = spark.createDataFrame(
        [(10, TEXT_A), (11, TEXT_B)], "doc_id long, text string"
    )
    # simulate the failed prior attempt of batch id 7
    bands_from_shingles(shingle_table(batch)).write.mode("overwrite").parquet(
        f"{bands}/batch=7"
    )

    survivors, _ = screen_batch(batch, bands, exclude_batch=7)
    assert {r.doc_id for r in survivors.collect()} == {10, 11}

    # sanity: without exclusion the self-collision bug would eat the batch
    survivors_bad, _ = screen_batch(batch, bands)
    assert survivors_bad.count() == 0


def test_compact_bands_preserves_band_set(spark, tmp_path):
    """Folding batch dirs must not change the logical band set, and the
    folded source dirs must be gone afterwards."""
    from mlvectordb_spark.operators.minhash import bands_from_shingles, shingle_table
    from mlvectordb_spark.streaming.dedup import compact_bands

    bands = str(tmp_path / "bands")
    for bid, text in [(0, TEXT_A), (1, TEXT_B), (2, TEXT_C)]:
        df = spark.createDataFrame([(bid * 10, text)], "doc_id long, text string")
        bands_from_shingles(shingle_table(df)).write.mode("overwrite").parquet(
            f"{bands}/batch={bid}"
        )

    before = {
        (r.doc_id, r.band_idx, r.band_hash)
        for r in spark.read.parquet(bands).drop("batch").collect()
    }
    folded = compact_bands(spark, bands, protect_batch=2)
    assert folded == 2  # batches 0,1 folded; 2 protected (in-flight)
    after = {
        (r.doc_id, r.band_idx, r.band_hash)
        for r in spark.read.parquet(bands).drop("batch").collect()
    }
    assert after == before
    dirs = sorted(os.listdir(bands))
    assert "batch=0" not in dirs and "batch=1" not in dirs
    assert "batch=2" in dirs and "batch=-3" in dirs


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
