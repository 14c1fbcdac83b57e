"""Minimal pure-numpy video codec + features for the video-clip table.

No video library ships in this container, so (per the task brief) the
container format is a DETERMINISTIC stand-in with real semantics, completing
the multimodal trio (``reddacted_ray.imaging`` FJP2 for images,
``reddacted_ray.audio`` FPCM for audio):

  * ``fvid``: a lossless grayscale clip container — magic ``FVID`` +
    (w, h, n_frames, fps) + zlib-compressed temporal-delta-coded frames.
    Delta coding (frame 0 raw, then per-pixel diffs mod 256) makes slow-
    moving content compress like a real inter-frame codec, and
    ``decode_video(encode_video(x)) == x`` exactly, every clip.
  * ``video_features``: an embedding-style vector with real video
    semantics — per-temporal-segment mean luminance + per-segment motion
    energy (mean abs frame-to-frame pixel delta) + global contrast +
    spatial gradient energy — all computable with numpy alone. Swap the
    codec for an ffmpeg binding in production; the Ray-side stages keep
    the same schema (binary in -> list<float> out).
  * ``vfp64``: a 64-bit video fingerprint — 8 temporal segments x a 3x3
    block-luminance grid per segment, one bit per adjacent-block
    sign-of-delta (8 per segment). Sign-of-delta is invariant to global
    gain/brightness scaling, so re-encoded / brightness-shifted copies of
    a clip land within small hamming distance — the video analog of the
    image table's ``phash`` and the audio table's ``afp`` columns, and it
    feeds the same banded-hamming near-dup blocking.

Frames are numpy uint8 arrays shaped ``(n_frames, h, w)`` (grayscale).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FVID_MAGIC = b"FVID"


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    """uint8 grayscale frames (n, h, w) -> FVID bytes (lossless)."""
    assert frames.dtype == np.uint8 and frames.ndim == 3
    n, h, w = frames.shape
    assert 0 < n < 1 << 16 and 0 < h < 1 << 16 and 0 < w < 1 << 16
    # temporal delta coding: frame 0 raw, then per-pixel diff mod 256 —
    # static regions become zero runs that zlib collapses (inter-frame
    # compression with exact reconstruction via modular cumsum)
    d = frames.astype(np.int16)
    delta = np.concatenate([d[:1], d[1:] - d[:-1]]) % 256
    payload = zlib.compress(delta.astype(np.uint8).tobytes(), 6)
    return FVID_MAGIC + struct.pack(">HHHH", w, h, n, fps) + payload


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """FVID bytes -> (uint8 frames (n, h, w), fps). Raises on other formats."""
    if data[:4] != FVID_MAGIC:
        raise ValueError("not an FVID payload")
    w, h, n, fps = struct.unpack(">HHHH", data[4:12])
    delta = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    if len(delta) != n * h * w:
        raise ValueError("FVID length mismatch")
    delta = delta.reshape(n, h, w)
    frames = (delta.astype(np.uint64).cumsum(axis=0) % 256).astype(np.uint8)
    return frames, fps


def decode(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt == "fvid":
        return decode_video(data)
    raise NotImplementedError(f"video format {fmt!r} not available in this container")


def _segment_bounds(n: int, k: int) -> np.ndarray:
    """k+1 split points over [0, n] (each segment gets >= 1 frame when
    n >= k; degenerate clips repeat the last frame index)."""
    return np.minimum(np.round(np.linspace(0, n, k + 1)).astype(int), n)


def video_features(
    frames: np.ndarray, n_segments: int = 8, grid_h: int = 2, grid_w: int = 4
) -> np.ndarray:
    """Deterministic spatiotemporal feature vector: per-segment 2x4
    block-luminance grid (``n_segments * grid_h * grid_w`` — encodes WHERE
    the brightness sits over time, i.e. the motion trajectory) +
    per-segment motion energy (``n_segments``) + global contrast (std) +
    spatial gradient energy. float32, length
    ``n_segments * grid_h * grid_w + n_segments + 2`` (74 by default)."""
    nblocks = grid_h * grid_w
    dim = n_segments * nblocks + n_segments + 2
    n = frames.shape[0]
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    h, w = frames.shape[1], frames.shape[2]
    x = frames.astype(np.float64) / 255.0
    bounds = _segment_bounds(n, n_segments)
    ys = _segment_bounds(h, grid_h)
    xs = _segment_bounds(w, grid_w)
    lum = np.zeros((n_segments, nblocks))
    motion = np.zeros(n_segments)
    diffs = np.abs(x[1:] - x[:-1]).mean(axis=(1, 2)) if n > 1 else np.zeros(0)
    for s in range(n_segments):
        lo, hi = bounds[s], max(bounds[s + 1], bounds[s] + 1)
        lo, hi = min(lo, n - 1), min(hi, n)
        seg = x[lo:hi].mean(axis=0)
        for by in range(grid_h):
            for bx in range(grid_w):
                y0, y1 = ys[by], max(ys[by + 1], ys[by] + 1)
                x0, x1 = xs[bx], max(xs[bx + 1], xs[bx] + 1)
                lum[s, by * grid_w + bx] = seg[
                    min(y0, h - 1) : min(y1, h), min(x0, w - 1) : min(x1, w)
                ].mean()
        dlo, dhi = min(lo, max(n - 2, 0)), min(hi, n - 1)
        motion[s] = diffs[dlo:dhi].mean() if dhi > dlo else 0.0
    contrast = float(x.std())
    grad = float(
        (np.abs(np.diff(x, axis=2)).mean() + np.abs(np.diff(x, axis=1)).mean()) / 2
        if h > 1 and w > 1
        else 0.0
    )
    return np.concatenate([lum.ravel(), motion, [contrast, grad]]).astype(np.float32)


def vfp64(frames: np.ndarray, n_segments: int = 9, grid_h: int = 2, grid_w: int = 4) -> int:
    """64-bit video fingerprint: pool each of 9 temporal segments to a
    2x4 block-luminance map (8 blocks) and emit one bit per (block,
    temporal delta) — 1 iff that block's luminance ROSE vs the previous
    segment (8 blocks x 8 deltas = 64 bits). Temporal sign-of-delta tracks
    the motion trajectory (which blocks brighten/darken over time), not the
    static background, and is invariant to global gain/brightness scaling
    (signs survive y = a*x + b, a > 0) — TV-style TIRI block fingerprint."""
    n, h, w = frames.shape
    if n == 0:
        return 0
    x = frames.astype(np.float64)
    bounds = _segment_bounds(n, n_segments)
    ys = _segment_bounds(h, grid_h)
    xs = _segment_bounds(w, grid_w)
    nblocks = grid_h * grid_w
    blocks = np.zeros((n_segments, nblocks))
    for s in range(n_segments):
        lo, hi = bounds[s], max(bounds[s + 1], bounds[s] + 1)
        lo, hi = min(lo, n - 1), min(hi, n)
        seg = x[lo:hi].mean(axis=0)
        for by in range(grid_h):
            for bx in range(grid_w):
                y0, y1 = ys[by], max(ys[by + 1], ys[by] + 1)
                x0, x1 = xs[bx], max(xs[bx + 1], xs[bx] + 1)
                blocks[s, by * grid_w + bx] = seg[
                    min(y0, h - 1) : min(y1, h), min(x0, w - 1) : min(x1, w)
                ].mean()
    out = 0
    bit = 0
    for s in range(n_segments - 1):
        for b in range(nblocks):
            if blocks[s + 1, b] > blocks[s, b]:
                out |= 1 << bit
            bit += 1
    return out
