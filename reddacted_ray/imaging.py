"""Minimal pure-Python image codecs + PSNR for the image+caption table.

The graft input (BASELINE.json input_hint) is a table of encoded images
(``bytes: binary``, ``fmt: string``) whose pixels must survive the pipeline
unchanged: the per-row invariant is decoded-pixel allclose, PSNR >= 40 dB
for lossy formats. No image library (PIL etc.) exists in this container, so:

  * ``png``: a real, spec-conformant PNG codec (RGB8, filter 0, single
    IDAT) implemented on ``zlib`` + ``struct``. Encoding is deterministic
    and decode(encode(x)) == x exactly.
  * ``jpeg``: the container has no JPEG codec, so per the task instructions
    the lossy path is a DETERMINISTIC FAKE, clearly marked: a "FJP2" byte
    format that quantizes each channel to 6 bits (center-of-bucket
    reconstruction, per-channel error in {-2..1} ⇒ worst-case MSE 4 ⇒
    PSNR >= 42.1 dB GUARANTEED for every image, satisfying the >= 40 dB
    lossy invariant deterministically — the earlier 5-bit "FJPG" bound was
    only statistical and a worst-case 8x8 image could dip to ~36 dB) and
    zlib-compresses. The Ray-side plumbing (binary column handling,
    schema, batch sizing) is real; only the codec mathematics is a
    stand-in. Swap ``encode_fake_jpeg`` / ``decode_fake_jpeg`` for a real
    libjpeg binding in production.

Pixels are ``numpy`` arrays of shape (h, w, 3), dtype uint8.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJP2"  # v2: 6-bit quantization; decode REJECTS v1 "FJPG"
# payloads rather than silently mis-reconstructing them (regenerate caches)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB8 -> PNG bytes (color type 2, bit depth 8, filter 0 per row)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB8 pixels. Supports what ``encode_png`` emits
    (RGB8, filter 0); raises on other PNG variants."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only RGB8 non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise NotImplementedError("only filter 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC lossy stand-in for JPEG (see module docstring)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = pixels & 0xFC  # keep top 6 bits
    payload = zlib.compress(q.tobytes(), 6)
    return FJPG_MAGIC + struct.pack(">II", w, h) + payload


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FJPG_MAGIC:
        raise ValueError("not a FJP2 payload (stale v1 cache? regenerate)")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # center-of-bucket reconstruction (+2): error in {-2,-1,0,+1} per
    # channel, worst-case MSE 4 => PSNR >= 42.1 dB for EVERY image
    return (q | 0x02).copy()


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_fake_jpeg(pixels)
    raise NotImplementedError(f"format {fmt!r} not available in this container")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_fake_jpeg(data)
    raise NotImplementedError(f"format {fmt!r} not available in this container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(pixels: np.ndarray) -> int:
    """Perceptual hash: 8x8 mean-threshold aHash over the grayscale image,
    downsampled by block averaging. Deterministic; used to generate the
    ``phash`` column and by tests. (A production system would use a DCT
    pHash; aHash keeps this container dependency-free.)"""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # block-average to 8x8 (pad to a multiple of 8 by edge-clipping reshape)
    ys = (np.arange(8 + 1) * h // 8).astype(int)
    xs = (np.arange(8 + 1) * w // 8).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = g[ys[i] : max(ys[i] + 1, ys[i + 1]),
                            xs[j] : max(xs[j] + 1, xs[j + 1])].mean()
    bits = (cells > cells.mean()).flatten()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out
