"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema (MEDIA_SCHEMA), partitioning, Arrow-batched
mapInPandas pipelines, UDF signatures, batch shapes — is real and tested.
The actual media decoding is STUBBED: PIL / torchaudio / av are not in this
container, so `decode_media` raises NotImplementedError unless a decoder is
importable, and `fake_feature_extract` provides a deterministic
hash-derived feature vector so downstream pipelines (dedup, ANN) are
exercisable end-to-end.

Scale posture: payloads never pass through the driver; mapInPandas streams
Arrow batches executor-side, and `batch_rows` caps decoded bytes held per
batch (decode-bound stages want small batches, metadata stages want big
ones). Partition by (modality, date-ish key) in real deployments so a
video-only job prunes audio/image partitions at the scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlvectordb_spark.schema import MEDIA_SCHEMA

FEATURE_DIM = 32

FEATURE_SCHEMA = (
    "media_id string, modality string, feature array<float>, payload_bytes long"
)

FRAME_SCHEMA = (
    "media_id string, frame_idx int, frame_payload binary"
)


def synthetic_media_df(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    """Deterministic fake media corpus (payload = seeded pseudo-random
    bytes): stands in for a real binary-file ingest
    (spark.read.format('binaryFile') in production)."""
    rng = np.random.default_rng(seed)
    modalities = ("image", "audio", "video")
    rows = []
    for i in range(n):
        m = modalities[i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8)
        rows.append(
            (
                f"m{i:04d}",
                m,
                bytes(payload.tobytes()),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[m],
                64 + i % 32 if m == "image" else None,
                64 + i % 24 if m == "image" else None,
                (1000 + 250 * (i % 8)) if m in ("audio", "video") else None,
                {"source": f"src{i % 4}"},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, modality: str, mime_type: str | None = None):
    """Real decode — stubbed. The import-gated structure is the production
    shape; in this container no decoder exists, so callers must use the
    deterministic fake path instead."""
    if modality == "image":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL (not available in this environment); "
                "use fake_feature_extract for pipeline testing"
            ) from e
    raise NotImplementedError(f"no decoder wired for modality {modality!r}")


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: expand sha256(payload)
    into `dim` floats in [0, 1). Stable across processes/executors."""
    out = np.empty(dim, dtype=np.float32)
    h = b""
    counter = 0
    raw = b""
    while len(raw) < dim * 4:
        h = hashlib.sha256(payload + counter.to_bytes(4, "little")).digest()
        raw += h
        counter += 1
    ints = np.frombuffer(raw[: dim * 4], dtype="<u4")
    out[:] = ints / np.float32(2**32)
    return out


def fake_feature_extract(
    media: DataFrame, batch_rows: int = 32
) -> DataFrame:
    """Feature-extraction pipeline over binary payloads via mapInPandas —
    Arrow-batched, executor-side, bounded batches (the exact plumbing a
    real encoder UDF needs; only the kernel is fake)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "modality": chunk["modality"],
                        "feature": [
                            _fake_feature(p).tolist() for p in chunk["payload"]
                        ],
                        "payload_bytes": [len(p) for p in chunk["payload"]],
                    }
                )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 500, frame_bytes: int = 32
) -> DataFrame:
    """Frame sampling for video rows: emits one (deterministic fake) frame
    per `every_ms` of duration — a 1:N mapInPandas expansion, the batch
    shape a real ffmpeg-backed sampler produces."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["modality"] == "video"]
            out_ids, out_idx, out_payloads = [], [], []
            for _, row in vids.iterrows():
                n_frames = max(1, int((row["duration_ms"] or 0) // every_ms))
                for j in range(n_frames):
                    out_ids.append(row["media_id"])
                    out_idx.append(j)
                    digest = hashlib.sha256(
                        row["payload"] + j.to_bytes(4, "little")
                    ).digest()
                    reps = -(-frame_bytes // len(digest))  # ceil-div
                    out_payloads.append((digest * reps)[:frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_idx": out_idx,
                    "frame_payload": out_payloads,
                }
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata analytics over the binary table — runs without ever
    touching payloads (column pruning keeps the scan cheap)."""
    return media.groupBy("modality").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
