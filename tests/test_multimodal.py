"""Multimodal plumbing tests: schema, mapInPandas batch shapes, determinism
of the fake feature path, stub gating of real decode."""

from __future__ import annotations

import numpy as np
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


def test_decode_real_for_wav_bmp_stubbed_for_compressed(media):
    """WAV, BMP, PNG, and baseline+progressive JPEG decode natively
    (pure numpy/struct); WebP and video are adapter-decoded BY DESIGN —
    without a registered adapter the error names the contract."""
    img = media.filter(F.col("modality") == "image").first()
    arr = MM.decode_media(img.payload, "image", img.mime_type)
    assert arr.shape == (img.height, img.width, 3)
    aud = media.filter(F.col("modality") == "audio").first()
    samples, rate = MM.decode_media(aud.payload, "audio", aud.mime_type)
    assert rate == 8000
    assert abs(len(samples) / rate * 1000 - aud.duration_ms) < 1
    # JPEG is now a real decoder: garbage is a MALFORMED stream error,
    # not an unimplemented-format gate
    with pytest.raises(ValueError):
        MM.decode_media(b"\xff\xd8\xff fake jpeg", "image", "image/jpeg")
    # the no-adapter contract — pop any auto-registered plug-ins first
    # so the test holds in environments where PIL/PyAV ARE importable
    saved = {
        k: MM.MEDIA_ADAPTERS.pop(k)
        for k in ("webp", "video")
        if k in MM.MEDIA_ADAPTERS
    }
    try:
        with pytest.raises(
            NotImplementedError, match="register_media_adapter"
        ):
            MM.decode_media(
                b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image", "image/webp"
            )
        with pytest.raises(
            NotImplementedError, match="register_media_adapter"
        ):
            MM.decode_media(b"", "video")
    finally:
        MM.MEDIA_ADAPTERS.update(saved)


def test_media_adapter_seam_contract():
    """The r10 end-state for externally-coded formats (r9 verdict #7):
    `register_media_adapter` is the PERMANENT seam — a registered
    callable serves decode_media for WebP (sniffed by RIFF/WEBP magic
    even without a mime type) and video (mime-suffix key wins over the
    generic 'video' key); deregistering restores the contract-naming
    NotImplementedError."""
    webp_payload = b"RIFF\x00\x00\x00\x00WEBPVP8 rest-of-stream"
    calls = []

    def fake_webp(payload):
        calls.append(payload)
        return np.zeros((2, 2, 3), dtype=np.uint8)

    # snapshot whatever the environment auto-registered (PIL/PyAV may
    # be importable elsewhere) and restore it at the end
    saved = dict(MM.MEDIA_ADAPTERS)
    try:
        MM.register_media_adapter("webp", fake_webp)
        out = MM.decode_media(webp_payload, "image", "image/webp")
        assert out.shape == (2, 2, 3)
        # magic-byte sniffing without a mime type routes too
        MM.decode_media(webp_payload, "image", None)
        assert len(calls) == 2
        MM.MEDIA_ADAPTERS.pop("webp", None)
        with pytest.raises(
            NotImplementedError, match="register_media_adapter"
        ):
            MM.decode_media(webp_payload, "image", "image/webp")

        MM.register_media_adapter("video", lambda p: ["generic"])
        MM.register_media_adapter("mp4", lambda p: ["specific"])
        assert MM.decode_media(b"x", "video", "video/mp4") == ["specific"]
        assert MM.decode_media(b"x", "video", "video/ogg") == ["generic"]
    finally:
        MM.MEDIA_ADAPTERS.clear()
        MM.MEDIA_ADAPTERS.update(saved)


def test_media_adapter_auto_registers_pil(monkeypatch):
    """PIL is a supported plug-in: when importable, _auto_register wires
    the webp adapter without user code. Simulated with a stub PIL whose
    Image.open returns a convertible object."""
    import sys
    import types

    class _FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return np.full((3, 4, 3), 7, dtype=np.uint8)

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda fh: _FakeImg()
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)
    # drop any real auto-registered adapter so _auto_register's
    # setdefault installs the stub (restored afterwards)
    saved = dict(MM.MEDIA_ADAPTERS)
    MM.MEDIA_ADAPTERS.pop("webp", None)
    try:
        MM._auto_register()
        assert "webp" in MM.MEDIA_ADAPTERS
        out = MM.decode_media(
            b"RIFF\x00\x00\x00\x00WEBPVP8L...", "image", "image/webp"
        )
        assert out.shape == (3, 4, 3) and int(out[0, 0, 0]) == 7
    finally:
        MM.MEDIA_ADAPTERS.clear()
        MM.MEDIA_ADAPTERS.update(saved)


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


def test_wav_bmp_roundtrip():
    import numpy as np

    rng = np.random.default_rng(9)
    wave = np.clip(rng.normal(size=4000) * 0.2, -1, 1)
    back, rate = MM.decode_wav(MM.encode_wav(wave, 16000))
    assert rate == 16000 and len(back) == 4000
    assert float(np.abs(back - wave).max()) < 1.0 / 32000  # PCM16 quantization

    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd width -> row padding
    assert (MM.decode_bmp(MM.encode_bmp(img)) == img).all()


def test_real_features_measure_the_signal(spark, media):
    """Real features reflect the decoded signal: a pure sine's RMS is
    amplitude/sqrt(2)-ish, image channel means match the gradient
    construction, and video rows fall back to hash features."""
    import math

    import numpy as np

    out = {r.media_id: r for r in MM.real_feature_extract(media).collect()}
    aud = media.filter(F.col("modality") == "audio").first()
    f = out[aud.media_id].feature
    assert abs(f[0] - aud.duration_ms / 1000.0) < 0.01       # duration
    # 0.5*sin + 0.1*sin(3f): RMS = sqrt(0.5**2/2 + 0.1**2/2)
    assert abs(f[2] - math.sqrt(0.5 ** 2 / 2 + 0.1 ** 2 / 2)) < 0.02
    img = media.filter(F.col("modality") == "image").first()
    g = out[img.media_id].feature
    assert abs(g[0] - img.height / 256.0) < 1e-6
    assert abs(g[2] - 0.5) < 0.05                             # R gradient mean
    assert abs(g[3] - 0.5) < 0.05                             # G gradient mean
    vid = media.filter(F.col("modality") == "video").first()
    v = np.asarray(out[vid.media_id].feature)
    assert (v >= 0).all() and (v < 1).all() and v.std() > 0   # hash fallback


def _filter_scanlines(img, ftypes):
    """Reference PNG filtering (spec §9) to exercise the decoder's
    unfilter paths with every filter type."""
    import numpy as np

    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = flat[y]
        out = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (cur[x] - pred) & 0xFF
        raw += bytes([ft]) + out.astype(np.uint8).tobytes()
        prev = cur
    return bytes(raw)


def test_png_roundtrip_and_all_filter_types():
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    # encoder (filter 0) roundtrip
    assert (MM.decode_png(MM.encode_png(img)) == img).all()
    # hand-filtered stream cycling through ALL five filter types
    raw = _filter_scanlines(img, ftypes=[0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 7, 9, 8, 2, 0, 0, 0)
    payload = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(raw))
        + MM._png_chunk(b"IEND", b"")
    )
    assert (MM.decode_png(payload) == img).all()
    # RGBA (color type 6) with Paeth everywhere
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    raw4 = _filter_scanlines(rgba, ftypes=[4])
    ihdr4 = struct.pack(">IIBBBBB", 4, 5, 8, 6, 0, 0, 0)
    payload4 = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr4)
        + MM._png_chunk(b"IDAT", zlib.compress(raw4))
        + MM._png_chunk(b"IEND", b"")
    )
    assert (MM.decode_png(payload4) == rgba).all()
    # corrupted CRC must be rejected, not silently decoded
    bad = bytearray(MM.encode_png(img))
    bad[len(MM._PNG_SIG) + 8] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError):
        MM.decode_png(bytes(bad))


def test_synthetic_corpus_mixes_bmp_png_jpeg(spark):
    media = MM.synthetic_media_df(spark, n=30)
    imgs = media.filter(F.col("modality") == "image").collect()
    mimes = {r.mime_type for r in imgs}
    assert mimes == {"image/bmp", "image/png", "image/jpeg"}
    depths = set()
    for r in imgs:
        arr = MM.decode_media(r.payload, "image", r.mime_type)
        assert arr.shape == (r.height, r.width, 3)
        depths.add(arr.dtype.name)
    # the rotation must include both 8-bit rows and a 16-bit PNG row
    assert depths == {"uint8", "uint16"}


# ---------------------------------------------------------------- r10:
# full-variant PNG decode (palette / grayscale / sub-byte depths / Adam7)


def _imageio_rgb_png(spark, payload: bytes, tag: str) -> np.ndarray:
    """Independent ground truth for PNG tests: the JVM's javax.imageio
    PNG plugin decodes, hands pixels back losslessly as 24-bit BMP
    (alpha composited over black by the AWT draw — mirrored on our side
    in _composite), read by the repo's BMP decoder."""
    import os
    import tempfile

    jvm = spark._jvm
    d = tempfile.mkdtemp(prefix="png_gt_")
    pp, bp = os.path.join(d, f"{tag}.png"), os.path.join(d, f"{tag}.bmp")
    with open(pp, "wb") as f:
        f.write(payload)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(pp))
    assert img is not None
    out = jvm.java.awt.image.BufferedImage(
        img.getWidth(), img.getHeight(), 5
    )
    g = out.getGraphics()
    g.drawImage(img, 0, 0, None)
    g.dispose()
    jvm.javax.imageio.ImageIO.write(out, "bmp", jvm.java.io.File(bp))
    with open(bp, "rb") as f:
        return MM.decode_bmp(f.read())


def _composite(out: np.ndarray) -> np.ndarray:
    """Match the ground-truth path's shape: gray → RGB, RGBA → RGB over
    a black background."""
    if out.ndim == 2:
        return np.stack([out] * 3, axis=-1)
    if out.shape[2] == 4:
        a = out[..., 3:4].astype(np.float64) / 255.0
        return np.round(out[..., :3].astype(np.float64) * a).astype(
            np.uint8
        )
    return out


def test_png_third_party_interlaced_rgba(spark):
    """Adam7 + RGBA against libpng's OWN test image
    (tests/data/libpng-pngtest.png, from /usr/share/doc/libpng-dev —
    libpng license): seven independently-filtered subimages must
    reassemble to EXACTLY what the JVM's independent PNG decoder
    produces (both formats are lossless — zero tolerance)."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "data", "libpng-pngtest.png"), "rb") as f:
        payload = f.read()
    mine = MM.decode_png(payload)
    assert mine.shape == (69, 91, 4)
    truth = _imageio_rgb_png(spark, payload, "adam7")
    assert np.array_equal(_composite(mine), truth)


def test_png_third_party_palette_trns(spark):
    """8-bit palette + tRNS (CPython's Lib/test/imghdrdata/python.png,
    PSF license): indices resolve through PLTE, transparency through
    tRNS → (H, W, 4); pixel-exact vs the independent decoder."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "data", "cpython-python.png"), "rb") as f:
        payload = f.read()
    mine = MM.decode_png(payload)
    assert mine.shape == (16, 16, 4)  # tRNS present
    truth = _imageio_rgb_png(spark, payload, "pal8")
    assert np.array_equal(_composite(mine), truth)


def _build_png(w, h, depth, ctype, rows_samples, plte=None, trns=None):
    """Hand-assemble a filter-0 non-interlaced PNG from raw sample
    values (palette indices / gray levels / flattened channel samples),
    packing sub-byte depths and big-endian 16-bit samples."""
    import struct
    import zlib

    raw = bytearray()
    for r in rows_samples:
        if depth == 16:
            packed = np.asarray(r, dtype=np.uint16).astype(">u2").tobytes()
        else:
            arr = np.asarray(r, dtype=np.uint8)
            if depth == 8:
                packed = arr.tobytes()
            else:
                bits = (
                    (arr[:, None] >> np.arange(depth - 1, -1, -1)) & 1
                ).astype(np.uint8).reshape(-1)
                packed = np.packbits(bits).tobytes()
        raw += b"\x00" + packed
    out = MM._PNG_SIG + MM._png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    )
    if plte is not None:
        out += MM._png_chunk(b"PLTE", bytes(plte))
    if trns is not None:
        out += MM._png_chunk(b"tRNS", bytes(trns))
    out += MM._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + MM._png_chunk(b"IEND", b"")


def test_png_sub_byte_depths_vs_independent_decoder(spark):
    """Bit depths 1/2/4 for palette and grayscale color types:
    hand-assembled filter-0 streams (so every packing path runs) must
    agree pixel-exactly with javax.imageio."""
    rng = np.random.default_rng(5)
    cases = []
    for depth in (1, 2, 4):
        npal = 1 << depth
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=(7, 13), dtype=np.uint8)
        cases.append(("pal", depth, idx, pal.reshape(-1).tolist()))
        g = rng.integers(0, npal, size=(6, 11), dtype=np.uint8)
        cases.append(("gray", depth, g, None))
    for kind, depth, samples, plte in cases:
        h, w = samples.shape
        ctype = 3 if kind == "pal" else 0
        payload = _build_png(w, h, depth, ctype, list(samples), plte)
        mine = MM.decode_png(payload)
        truth = _imageio_rgb_png(spark, payload, f"{kind}{depth}")
        assert np.array_equal(_composite(mine), truth), (kind, depth)
    # grayscale scaling: a 1-bit '1' is full white, returned as (H, W)
    one_bit = MM.decode_png(_build_png(3, 1, 1, 0, [np.array([1, 0, 1])]))
    assert one_bit.shape == (1, 3)
    assert one_bit.tolist() == [[255, 0, 255]]


def test_png_gray_alpha_and_illegal_depth():
    """Gray+alpha (color type 4) expands to RGBA; an illegal (depth,
    color type) combination per spec §11.2.2 raises ValueError."""
    import struct
    import zlib

    raw = b"\x00" + bytes([10, 255, 200, 128])  # one row, two GA pixels
    payload = (
        MM._PNG_SIG
        + MM._png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0)
        )
        + MM._png_chunk(b"IDAT", zlib.compress(raw))
        + MM._png_chunk(b"IEND", b"")
    )
    out = MM.decode_png(payload)
    assert out.shape == (1, 2, 4)
    assert out[0, 0].tolist() == [10, 10, 10, 255]
    assert out[0, 1].tolist() == [200, 200, 200, 128]
    bad = (
        MM._PNG_SIG
        + MM._png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 1, 4, 2, 0, 0, 0)
        )  # 4-bit truecolor is not a legal combination
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 3))
        + MM._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        MM.decode_png(bad)


# ------------------------------------------------------------- r11:
# 16-bit depth (all color types that allow it) + tRNS color-key alpha


def _imageio_raster_pixels(spark, path: str) -> np.ndarray:
    """Independent 16-bit-safe ground truth: javax.imageio decodes and
    the raw Raster hands back full-precision samples via getPixels (the
    BMP transfer used by the 8-bit tests truncates to 8 bits)."""
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    assert img is not None
    w, h = img.getWidth(), img.getHeight()
    raster = img.getRaster()
    nb = raster.getNumBands()
    arr = spark.sparkContext._gateway.new_array(jvm.int, w * h * nb)
    out = raster.getPixels(0, 0, w, h, arr)
    return np.array(list(out), dtype=np.int64).reshape(h, w, nb)


def test_png_16bit_rgba_third_party(spark):
    """16-bit RGBA against a genuine third-party stream (CPython's
    idlelib Icons/idle_48.png, PSF license — depth 16, color type 6):
    every uint16 sample must equal what the JVM's independent decoder
    reads from its raw raster. Both lossless — zero tolerance."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "data", "cpython-idle-48.png")
    with open(path, "rb") as f:
        mine = MM.decode_png(f.read())
    assert mine.shape == (48, 48, 4) and mine.dtype == np.uint16
    truth = _imageio_raster_pixels(spark, path)
    assert np.array_equal(mine.astype(np.int64), truth)


def test_png_16bit_gray_third_party_encoder(spark, tmp_path):
    """16-bit grayscale ENCODED by the independent implementation
    (javax.imageio writes a depth-16 type-0 stream, filters chosen by
    its encoder): our decoder must reproduce the exact uint16 levels."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    w, h = 13, 9
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
    img = jvm.java.awt.image.BufferedImage(w, h, 11)  # TYPE_USHORT_GRAY
    arr = gw.new_array(jvm.int, w * h)
    for i, v in enumerate(vals.reshape(-1)):
        arr[i] = int(v)
    img.getRaster().setPixels(0, 0, w, h, arr)
    path = str(tmp_path / "gray16.png")
    assert jvm.javax.imageio.ImageIO.write(
        img, "png", jvm.java.io.File(path)
    )
    with open(path, "rb") as f:
        mine = MM.decode_png(f.read())
    assert mine.dtype == np.uint16
    assert np.array_equal(mine, vals)


def test_png_16bit_rgb_encode_decode_cross_checked(spark, tmp_path):
    """encode_png(uint16) writes a real 16-bit RGB stream: our decoder
    round-trips it exactly AND the independent decoder reads the same
    uint16 samples from it."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 65536, size=(5, 8, 3), dtype=np.uint16)
    payload = MM.encode_png(img)
    assert np.array_equal(MM.decode_png(payload), img)
    path = str(tmp_path / "rgb16.png")
    with open(path, "wb") as f:
        f.write(payload)
    truth = _imageio_raster_pixels(spark, path)
    assert np.array_equal(img.astype(np.int64), truth)


def test_png_color_key_transparency(spark, tmp_path):
    """tRNS color-key alpha for grayscale (type 0) and truecolor
    (type 2): pixels matching the key decode fully transparent, all
    others opaque; the 8-bit truecolor case is cross-checked against
    javax.imageio's composited output and the grayscale case against
    its raw raster samples (AWT's gray compositing applies a
    linear-gray→sRGB curve, so the BMP-composite harness can't be used
    for gray — the raster read is conversion-free and stronger)."""
    import struct

    # 8-bit truecolor, key = (10, 20, 30)
    px = np.array(
        [[10, 20, 30, 10, 20, 31], [200, 20, 30, 10, 20, 30]],
        dtype=np.uint8,
    )  # 2 rows × 2 RGB pixels
    payload = _build_png(
        2, 2, 8, 2, list(px), trns=struct.pack(">HHH", 10, 20, 30)
    )
    out = MM.decode_png(payload)
    assert out.shape == (2, 2, 4)
    assert out[..., 3].tolist() == [[0, 255], [255, 0]]
    assert out[0, 0, :3].tolist() == [10, 20, 30]  # RGB kept under key
    truth = _imageio_rgb_png(spark, payload, "ckey8")
    assert np.array_equal(_composite(out), truth)

    # 8-bit grayscale, key = 77
    g = np.array([[77, 5, 77]], dtype=np.uint8)
    payload = _build_png(3, 1, 8, 0, list(g), trns=struct.pack(">H", 77))
    out = MM.decode_png(payload)
    assert out.shape == (1, 3, 4)
    assert out[..., 3].tolist() == [[0, 255, 0]]
    assert out[0, 1, :3].tolist() == [5, 5, 5]
    gpath = str(tmp_path / "ckeyg8.png")
    with open(gpath, "wb") as f:
        f.write(payload)
    truth = _imageio_raster_pixels(spark, gpath)  # bands: (gray, alpha)
    assert truth.shape == (1, 3, 2)
    assert np.array_equal(out[..., 0].astype(np.int64), truth[..., 0])
    assert np.array_equal(out[..., 3].astype(np.int64), truth[..., 1])

    # 4-bit grayscale: the key compares against the RAW (pre-scaling)
    # level per §11.3.2 — key 3 matches level 3 (scaled output 51)
    g4 = np.array([[3, 15, 3]], dtype=np.uint8)
    payload = _build_png(3, 1, 4, 0, list(g4), trns=struct.pack(">H", 3))
    out = MM.decode_png(payload)
    assert out[..., 3].tolist() == [[0, 255, 0]]
    assert out[0, 0, :3].tolist() == [51, 51, 51]

    # 16-bit truecolor: full-range key and 16-bit opaque alpha
    px16 = np.array(
        [[1000, 40000, 65535, 1000, 40000, 65534]], dtype=np.uint16
    )
    payload = _build_png(
        2, 1, 16, 2, list(px16),
        trns=struct.pack(">HHH", 1000, 40000, 65535),
    )
    out = MM.decode_png(payload)
    assert out.dtype == np.uint16
    assert out[..., 3].tolist() == [[0, 65535]]


def test_adapter_decode_stats_routes_and_accounts(spark):
    """adapter_decode_stats drives decode_media's FULL routing
    executor-side: native rows decode 'native', video rows route through
    an adapter registered INSIDE the map function, unadapted formats
    report 'none', and a corrupt payload becomes an 'error' ROW in the
    report — never a dead Spark task."""
    media = MM.synthetic_media_df(spark, n=12)

    def toy(payload: bytes):
        buf = np.frombuffer(payload[:48], dtype=np.uint8)
        return [np.resize(buf, 48).reshape(4, 4, 3)]

    # corrupt image row: PNG signature but garbage body (zlib.error
    # territory) — must land as decode_path='error'
    bad = spark.createDataFrame(
        [(
            "bad01", "image", MM._PNG_SIG + b"\x00" * 32, "image/png",
            4, 4, None, {},
        )],
        MM.MEDIA_SCHEMA,
    )
    out = MM.adapter_decode_stats(
        media.unionByName(bad), adapters={"mp4": toy}
    ).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id["bad01"].decode_path == "error"
    assert by_id["bad01"].decoded_units == 0
    paths = {r.decode_path for r in out}
    assert paths == {"native", "adapter", "error"}
    vids = [r for r in out if r.modality == "video"]
    assert vids and all(r.decode_path == "adapter" for r in vids)
    assert all(r.decoded_units == 16 for r in vids)  # one 4x4 frame
    natives = [r for r in out if r.decode_path == "native"]
    assert natives and all(r.decoded_units > 0 for r in natives)


def test_partition_by_format_stripes_every_format(spark):
    """Every partition gets ~the same per-format mix (cost balance is
    deterministic, independent of input order), and no partition is
    empty — the measured layout contract in partition_by_format.
    sub_splits=1 pins the exact ≤1-row guarantee; the default salted
    mode (windows bounded per sub-stream so no single task ranks a
    whole format) keeps aggregate skew ≤ sub_splits."""
    media = MM.synthetic_media_df(spark, n=120)
    n_parts = 6

    def mix(laid):
        assert laid.rdd.getNumPartitions() == n_parts
        pdf = (
            laid.withColumn("pid", F.spark_partition_id())
            .groupBy("pid", "mime_type")
            .count()
            .toPandas()
        )
        assert int(pdf["count"].sum()) == 120
        assert pdf["pid"].nunique() == n_parts
        return pdf

    exact = mix(MM.partition_by_format(media, n_parts, sub_splits=1))
    for mt, grp in exact.groupby("mime_type"):
        counts = grp.set_index("pid")["count"].reindex(
            range(n_parts), fill_value=0
        )
        assert counts.max() - counts.min() <= 1, (mt, dict(counts))

    sub_splits = 4
    salted = mix(MM.partition_by_format(media, n_parts, sub_splits))
    for mt, grp in salted.groupby("mime_type"):
        counts = grp.set_index("pid")["count"].reindex(
            range(n_parts), fill_value=0
        )
        assert counts.max() - counts.min() <= sub_splits, (mt, dict(counts))


def test_adapter_decode_stats_restores_registry(spark):
    """Caller-supplied adapters must not leak into the process-global
    MEDIA_ADAPTERS after the pass (reused executor workers would
    silently route later decodes through a stale toy adapter)."""
    media = MM.synthetic_media_df(spark, n=12).filter(
        F.col("modality") == "video"
    )
    toy = lambda payload: iter(())  # noqa: E731
    MM.adapter_decode_stats(media, adapters={"video": toy}).collect()
    # driver-side registry untouched (the mutation happens executor-side
    # inside a snapshot/restore); and a second pass WITHOUT adapters
    # must report 'none', proving no worker kept the toy registered
    assert "video" not in MM.MEDIA_ADAPTERS or MM.MEDIA_ADAPTERS[
        "video"
    ] is not toy
    paths = {
        r.decode_path
        for r in MM.adapter_decode_stats(media).collect()
    }
    assert paths == {"none"}
