"""Curated streaming ingest: the Gopher quality gate composed with the
accumulating-index dedup screen in one exactly-once foreachBatch."""

from __future__ import annotations

import os
import shutil

GOOD_1 = (
    "the quick brown fox and the lazy dog have that with "
    + " ".join(f"word{i}" for i in range(14))
)
GOOD_2 = (
    "the striped grey cat and the small red hen have that with "
    + " ".join(f"item{i}" for i in range(14))
)
NO_STOPWORDS = " ".join(f"tok{i}" for i in range(30))
TOO_SHORT = "the of"


def _drop_file(spark, rows, src_dir, name):
    tmp = os.path.join(str(src_dir), f".__stage_{name}")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(str(src_dir), name))
    shutil.rmtree(tmp)


def test_curated_ingest_gates_quality_then_dedups(spark, tmp_path):
    from mlvectordb_spark.streaming.curated import start_curated_ingest

    src = tmp_path / "src"
    src.mkdir()
    bands, out, rej, ckpt = (
        str(tmp_path / d) for d in ("bands", "out", "rej", "ckpt")
    )

    def run_once(name):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        q = start_curated_ingest(stream, bands, out, rej, ckpt, name)
        q.awaitTermination()

    # batch 1: a good doc, its exact dup (dedup reject), a no-stopword doc
    # (quality reject)
    _drop_file(
        spark,
        [(1, GOOD_1), (2, GOOD_1), (3, NO_STOPWORDS)],
        src,
        "b1.parquet",
    )
    run_once("curated_b1")
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}
    rejects = {r.doc_id: r for r in spark.read.parquet(rej).collect()}
    assert set(rejects) == {3}
    # the reject store is self-explaining: per-rule flags travel with it
    assert rejects[3].ok_stopwords is False
    assert rejects[3].ok_word_count is True

    # batch 2: a corpus dup (vs batch 1), a fresh good doc, a too-short doc
    _drop_file(
        spark,
        [(4, GOOD_1), (5, GOOD_2), (6, TOO_SHORT)],
        src,
        "b2.parquet",
    )
    run_once("curated_b2")
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 5}
    rejects = {r.doc_id: r for r in spark.read.parquet(rej).collect()}
    assert set(rejects) == {3, 6}
    assert rejects[6].ok_word_count is False
    # quality rejects never claimed band buckets
    assert {r.doc_id for r in spark.read.parquet(bands).collect()} == {1, 5}
