"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF).

The container has no PIL/libjpeg, and the reference's media surface
expects JPEG payloads to decode like any other image
(/root/reference/src/mlvectordb/ stores vectors only — the JPEG need
comes from this repo's multimodal training-data pipeline, where
image columns are opaque binary + typed metadata). Rather than leaving
`decode_media("image/jpeg")` import-gated forever, this module
implements the baseline sequential DCT process end-to-end in numpy:

- decoder: marker parse (DQT/DHT/SOF0/DRI/SOS), canonical Huffman
  decode with byte unstuffing and restart-interval handling, DC
  prediction, dezigzag, dequantize, vectorized 8x8 IDCT (orthonormal
  separable transform — one einsum over all blocks of a component),
  chroma upsampling for any (h, v) sampling factors incl. 4:2:0, and
  the JFIF BT.601 YCbCr→RGB transform.
- encoder (test/fixture-grade): the exact inverse pipeline with the
  Annex K quantization tables (libjpeg quality scaling) and Annex K
  Huffman tables, optional 4:2:0 subsampling, restart intervals off.

Scope, disclosed: BASELINE process only — SOF0 (and SOF1's identical
layout). Progressive (SOF2), arithmetic coding, and hierarchical modes
raise NotImplementedError with the marker named; 8-bit precision only.
Grayscale (1 component) and YCbCr (3 components) both decode.

This is a correctness-first kernel: entropy decode is a Python loop per
coefficient (JPEG's bitstream is inherently serial within a scan), but
everything block-shaped — IDCT, dequantize, level shift, color
transform — is batched numpy over all blocks at once. At pipeline scale
the parallelism comes from Spark: one image per row inside
mapInPandas/applyInPandas batches (multimodal.py), thousands of
concurrent decodes across executor cores.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 — luminance / chrominance base quantization (zigzag order
# NOT applied; these are in natural row-major order)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 — typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT basis: F = T @ f @ T.T matches T.81's definition
# exactly (a(0)=1/sqrt(8) reproduces the 1/4*C(u)*C(v) scaling)
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _u in range(1, 8):
    for _x in range(8):
        _T[_u, _x] = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality → quantization-table scaling."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) via T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the decoder-side view of the same table."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits): negatives use one's-complement form."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _T, blocks, _T, optimize=True)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,nuv,yv->nxy", _T.T, coefs, _T.T, optimize=True)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane → (n, 8, 8) blocks in raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — the standard encoder
    padding that avoids ringing at the right/bottom borders."""
    h, w = plane.shape
    H = (h + mh - 1) // mh * mh
    W = (w + mw - 1) // mw * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _encode_plane(
    blocks: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    writer: _BitWriter,
    pred: int,
) -> int:
    """Entropy-encode quantized blocks (already zigzagged ints)."""
    for blk in blocks:
        dc = int(blk[0])
        size, amp = _magnitude(dc - pred)
        code, length = dc_codes[size]
        writer.write(code, length)
        writer.write(amp, size)
        pred = dc
        run = 0
        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
        for i in range(1, 64):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, amp = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(amp, size)
            run = 0
            if i == last_nz:
                break
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coefs = _fdct_blocks(blocks)
    q = np.round(coefs / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box average (the conventional 4:2:0 chroma downsample)."""
    h, w = plane.shape
    p = plane[: h - h % 2, : w - w % 2].astype(np.float64)
    return (
        p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    )


def encode_jpeg(
    img: np.ndarray, quality: int = 75, subsample: bool = False
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB (or (H, W) grayscale) array as a
    baseline JFIF JPEG. 4:4:4 by default; `subsample=True` emits 4:2:0.
    Fixture-grade: Annex K Huffman tables, no restart intervals."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H, W, 3) RGB or (H, W) grayscale")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _quality_scaled(QUANT_LUM, quality)
    qchrom = _quality_scaled(QUANT_CHROM, quality)

    if gray:
        y = img.astype(np.float64)
        planes = [(_pad_to(y, 8, 8), qlum)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            mcu_h, mcu_w = 16, 16
            yp = _pad_to(y, mcu_h, mcu_w)
            cbp = _pad_to(_subsample2(_pad_to(cb, 2, 2)), 8, 8)
            crp = _pad_to(_subsample2(_pad_to(cr, 2, 2)), 8, 8)
            planes = [(yp, qlum), (cbp, qchrom), (crp, qchrom)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            yp = _pad_to(y, 8, 8)
            planes = [(yp, qlum), (_pad_to(cb, 8, 8), qchrom),
                      (_pad_to(cr, 8, 8), qchrom)]
            samp = [(1, 1), (1, 1), (1, 1)]

    quantized = [_quantize_plane(p, q) for p, q in planes]

    # ---- headers ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, tab in ((0, qlum),) + (() if gray else ((1, qchrom),)):
        body = bytes([tid]) + bytes(int(x) for x in tab[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    huff = [
        (0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS),
    ] + ([] if gray else [
        (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
        (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
    ])
    for tc_th, bits, vals in huff:
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # ---- interleaved entropy-coded scan ----
    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)
    writer = _BitWriter()
    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    widths = [planes[ci][0].shape[1] // 8 for ci in range(ncomp)]
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        bidx = (my * vs + by) * widths[ci] + (mx * hs + bx)
                        preds[ci] = _encode_plane(
                            quantized[ci][bidx : bidx + 1],
                            dct, act, writer, preds[ci],
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; RSTn markers are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # scan terminator (EOI / next segment): pad with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def skip_restart(self) -> None:
        """Consume an RSTn marker at the current byte boundary."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map amplitude bits back to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to (H, W, 3) uint8 RGB ((H, W) for
    grayscale). Raises NotImplementedError for progressive/arithmetic/
    hierarchical streams and ValueError for malformed ones."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab[UNZIGZAG]  # store natural order
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _decode_map(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both baseline layout)
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            fh, fw = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF marker 0x{marker:02X}); "
                "only baseline sequential DCT is implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"id": cs, "dc": tdta >> 4, "ac": tdta & 0x0F})
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qtabs, htabs, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    fh, fw, comps = frame["h"], frame["w"], frame["comps"]
    ncomp = len(comps)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = [by_id[s["id"]] for s in scan]
    if sorted(order) != list(range(ncomp)):
        raise NotImplementedError("partial / multi-scan decoding")
    # per-component coefficient storage: (blocks_y, blocks_x, 64)
    cw = [mcux * c["h"] for c in comps]
    ch = [mcuy * c["v"] for c in comps]
    coefs = [np.zeros((ch[i] * cw[i], 64), dtype=np.int64) for i in range(ncomp)]
    dc_t = [htabs[(0, s["dc"])] for s in scan]
    ac_t = [htabs[(1, s["ac"])] for s in scan]

    reader = _BitReader(data, pos)
    preds = [0] * ncomp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.skip_restart()
                preds = [0] * ncomp
            try:
                for si, ci in enumerate(order):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][
                                (my * c["v"] + by) * cw[ci] + mx * c["h"] + bx
                            ]
                            # DC
                            size = _huff_decode(reader, dc_t[si])
                            diff = _extend(reader.bits(size), size)
                            preds[ci] += diff
                            blk[0] = preds[ci]
                            # AC
                            k = 1
                            while k < 64:
                                rs = _huff_decode(reader, ac_t[si])
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0x0F
                                if k > 63:
                                    raise ValueError("AC index overrun")
                                blk[k] = _extend(reader.bits(size), size)
                                k += 1
            except _RestartMarker:
                raise ValueError("restart marker inside an MCU")
            mcu_count += 1

    # ---- reconstruct each component plane (all blocks batched) ----
    planes = []
    for i, c in enumerate(comps):
        # coefs are stored in zigzag order — dequantize with the
        # zigzag-ordered table, THEN permute to natural order
        q = qtabs[c["tq"]][ZIGZAG].reshape(1, 64)
        nat = (coefs[i] * q)[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        spatial = _idct_blocks(nat) + 128.0
        plane = _from_blocks(spatial, ch[i] * 8, cw[i] * 8)
        # upsample to full MCU-grid resolution, then crop to frame size
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if ncomp != 3:
        raise NotImplementedError(f"{ncomp}-component JPEG (CMYK?)")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
