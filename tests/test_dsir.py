"""Incremental / streaming DSIR LM (operators/dsir.DSIRState): the
mergeable-sketch contract — fold equals one-shot, merge is exact, replay
is a no-op, persistence round-trips, and the streaming accumulator
reaches the same state. The driver gate (`dsir_incremental` entry)
additionally proves fold+score == the one-shot DuckDB oracle
bit-for-bit at three SFs; these tests cover the state machinery."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlvectordb_spark.operators.dsir import (
    DSIRState,
    apply_dsir_batch,
    start_dsir_lm,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"tok{i % 7} tok{(i + 1) % 7} common words here", i % 3 == 0)
        for i in range(90)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_tgt boolean"
    ).cache()


def test_fold_equals_one_shot(spark, docs):
    one = DSIRState.of(docs, F.col("is_tgt"))
    a = DSIRState.of(docs.filter("doc_id < 30"), F.col("is_tgt"))
    b = DSIRState.of(docs.filter("doc_id >= 30"), F.col("is_tgt"))
    merged = a.merge(b)
    assert np.array_equal(merged.raw, one.raw)
    assert np.array_equal(merged.tgt, one.tgt)
    assert int(one.raw.sum()) > 0 and int(one.tgt.sum()) > 0


def test_merge_rejects_bucket_mismatch(spark, docs):
    a = DSIRState.of(docs, F.col("is_tgt"), n_buckets=1024)
    b = DSIRState.of(docs, F.col("is_tgt"), n_buckets=2048)
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        a.merge(b)


def test_replay_is_noop_and_persistence_roundtrips(spark, docs, tmp_path):
    path = str(tmp_path / "lm.npz")
    for bid in range(3):
        chunk = docs.filter(F.col("doc_id") % 3 == bid)
        apply_dsir_batch(path, chunk, bid, F.col("is_tgt"))
    st = DSIRState.load(path)
    replayed = apply_dsir_batch(
        path, docs.filter("doc_id % 3 = 1"), 1, F.col("is_tgt")
    )
    assert np.array_equal(replayed.raw, st.raw)
    assert np.array_equal(DSIRState.load(path).raw, st.raw)
    one = DSIRState.of(docs, F.col("is_tgt"))
    assert np.array_equal(st.raw, one.raw)
    assert np.array_equal(st.tgt, one.tgt)
    assert st.last_batch_id == 2


def test_score_matches_batch_operator(spark, docs):
    """A state folded over the whole corpus scores every doc exactly
    like the batch operator — the shared feature stream and scoring
    tail make the arithmetic identical, not merely close."""
    from mlvectordb_spark.operators.curation import dsir_log_weights

    st = DSIRState.of(docs, F.col("is_tgt"))
    inc = {r.doc_id: r for r in st.score(docs).collect()}
    bat = {
        r.doc_id: r
        for r in dsir_log_weights(docs, F.col("is_tgt")).collect()
    }
    assert set(inc) == set(bat)
    for k in bat:
        assert inc[k].n_feats == bat[k].n_feats
        assert inc[k].log_weight == bat[k].log_weight


def test_streaming_accumulator_reaches_batch_state(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 40), (40, 90)]):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).write.mode("overwrite").parquet(f"{src}/chunk={i}")
    stream = (
        spark.readStream.schema("doc_id long, text string, is_tgt boolean")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    path = str(tmp_path / "stream_lm.npz")
    q = start_dsir_lm(
        stream, F.col("is_tgt"), path,
        checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True,
    )
    q.awaitTermination(120)
    st = DSIRState.load(path)
    one = DSIRState.of(docs, F.col("is_tgt"))
    assert np.array_equal(st.raw, one.raw)
    assert np.array_equal(st.tgt, one.tgt)


def test_merge_rejects_salt_mismatch(spark, docs):
    a = DSIRState.of(docs, F.col("is_tgt"), salt="a:")
    b = DSIRState.of(docs, F.col("is_tgt"), salt="b:")
    with pytest.raises(ValueError, match="salt mismatch"):
        a.merge(b)


def test_score_covers_unseen_buckets(spark, docs):
    """Features the folded LM never saw must score under the smoothing
    term, not vanish: n_feats counts every feature of the scored doc
    even when the LM was folded from a disjoint corpus (r12 review —
    a seen-only log-ratio table silently dropped them)."""
    st = DSIRState.of(docs.filter("doc_id < 30"), F.col("is_tgt"))
    novel = spark.createDataFrame(
        [(999, "zzzunseen qqqnever wwwbefore")], "doc_id long, text string"
    )
    rows = st.score(novel).collect()
    assert len(rows) == 1
    # 3 unigrams + 2 bigrams, all almost surely unseen — every one
    # counted, each contributing the identical pure-smoothing ratio
    assert rows[0].n_feats == 5
    m = len(st.raw)
    import math

    expected = round(
        5 * (math.log(1.0 / (int(st.tgt.sum()) + m))
             - math.log(1.0 / (int(st.raw.sum()) + m))), 4)
    assert abs(rows[0].log_weight - expected) < 5e-4


def test_state_salt_persists(spark, docs, tmp_path):
    path = str(tmp_path / "salted.npz")
    DSIRState.of(docs, F.col("is_tgt"), salt="custom:").save(path)
    assert DSIRState.load(path).salt == "custom:"
