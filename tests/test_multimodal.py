"""Multimodal plumbing tests: schema, mapInPandas batch shapes, determinism
of the fake feature path, stub gating of real decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlvectordb_spark import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthetic_media_df(spark, n=30).cache()


def test_schema_and_partition_counts(media):
    assert media.count() == 30
    by_mod = {r.modality: r.n for r in media.groupBy("modality").agg(F.count("*").alias("n")).collect()}
    assert by_mod == {"image": 10, "audio": 10, "video": 10}


def test_decode_is_stubbed(media):
    row = media.filter(F.col("modality") == "image").first()
    with pytest.raises(NotImplementedError):
        MM.decode_media(row.payload, "image")
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"", "video")


def test_fake_features_deterministic_and_shaped(spark, media):
    f1 = {r.media_id: r.feature for r in MM.fake_feature_extract(media).collect()}
    f2 = {r.media_id: r.feature for r in MM.fake_feature_extract(media).collect()}
    assert f1 == f2  # executor-side determinism
    assert len(f1) == 30
    assert all(len(v) == MM.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)


def test_feature_bytes_match_payload(media):
    out = {r.media_id: r.payload_bytes for r in MM.fake_feature_extract(media).collect()}
    src = {r.media_id: len(r.payload) for r in media.collect()}
    assert out == src


def test_frame_sample_expansion(media):
    frames = MM.frame_sample(media, every_ms=500, frame_bytes=48)
    rows = frames.collect()
    assert all(len(r.frame_payload) == 48 for r in rows)
    # expansion matches duration//every_ms per video row
    durs = {r.media_id: r.duration_ms for r in media.filter(F.col("modality") == "video").collect()}
    per_media: dict = {}
    for r in rows:
        per_media[r.media_id] = max(per_media.get(r.media_id, 0), r.frame_idx + 1)
    assert set(per_media) == set(durs)
    for mid, n in per_media.items():
        assert n == max(1, durs[mid] // 500)


def test_media_stats_without_payload_decode(media):
    out = {r.modality: r.n_items for r in MM.media_stats(media).collect()}
    assert out == {"image": 10, "audio": 10, "video": 10}
