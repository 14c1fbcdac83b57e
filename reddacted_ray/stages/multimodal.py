"""Multimodal (image/audio/video) actor-pool stages.

Images are opaque ``binary`` columns with typed metadata (``w,h,fmt``);
every operator here is a ``map_batches`` actor stage over zero-copy Arrow
batches. The container ships no image/audio/video libraries, so (per the
task brief) the codecs are REAL deterministic stand-ins — png + lossy FJP2
(``reddacted_ray.imaging``), FPCM audio (``reddacted_ray.audio``), FVID
delta-coded video (``reddacted_ray.video``) — while formats we can't
decode raise ``NotImplementedError`` — the Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested for all
three modalities.

Batch-size guidance: rows carry encoded image payloads, so callers should
use small ``batch_size`` (128-512) to keep ``batch x concurrency`` within
worker heap; Ray's streaming executor + object-store spill handles the rest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..imaging import decode, encode, phash64


class DecodeStats:
    """Decode each image and emit pixel statistics + a recomputed phash.

    Output columns: ``mean_lum: float64``, ``phash_check: int64``,
    ``decode_ok: bool``. Unknown formats yield decode_ok=false rather than
    failing the batch (reference row-error policy: skip row, keep going —
    reference ``sentiment.py:280-284``)."""

    def __init__(self) -> None:
        pass  # codec tables are module-level; nothing to load

    def __call__(self, t: pa.Table) -> pa.Table:
        lum = np.zeros(t.num_rows, dtype=np.float64)
        ph = np.zeros(t.num_rows, dtype=np.int64)
        ok = np.zeros(t.num_rows, dtype=bool)
        for i, (blob, fmt) in enumerate(
            zip(t["bytes"].to_pylist(), t["fmt"].to_pylist())
        ):
            try:
                px = decode(blob, fmt)
            except (NotImplementedError, ValueError):
                continue
            lum[i] = float(px.astype(np.float64).mean())
            p = phash64(px)
            ph[i] = p - (1 << 64) if p >= 1 << 63 else p
            ok[i] = True
        t = t.append_column("mean_lum", pa.array(lum))
        t = t.append_column("phash_check", pa.array(ph))
        return t.append_column("decode_ok", pa.array(ok))


class Resize:
    """Nearest-neighbor resize to (out_w, out_h); re-encodes in the row's
    own format and rewrites ``bytes/w/h``. Real for png/fake-jpeg."""

    def __init__(self, out_w: int, out_h: int) -> None:
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        ys = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
        xs = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
        return px[ys][:, xs]

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs, ws, hs = [], [], []
        for blob, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            px = self._resize(decode(blob, fmt))
            blobs.append(encode(px, fmt))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
        t = t.drop_columns(["bytes", "w", "h"])
        t = t.append_column("bytes", pa.array(blobs, pa.binary()))
        t = t.append_column("w", pa.array(ws, pa.int32()))
        return t.append_column("h", pa.array(hs, pa.int32()))


class ImageFeatures:
    """Feature extraction: decode -> normalized color histogram + moments.

    Emits ``img_features: list<float>`` (3 channels x ``bins`` histogram
    + per-channel mean/std), a real embedding-style vector usable by the
    similarity / embedding-dedup stages. Real for png/fake-jpeg."""

    def __init__(self, bins: int = 8) -> None:
        self.bins = bins

    def _features(self, px: np.ndarray) -> np.ndarray:
        feats = []
        flat = px.reshape(-1, 3).astype(np.float64)
        npx = flat.shape[0]
        for c in range(3):
            hist = np.bincount(
                (flat[:, c] * self.bins / 256.0).astype(np.int64).clip(0, self.bins - 1),
                minlength=self.bins,
            )
            feats.append(hist / npx)
        feats.append(flat.mean(axis=0) / 255.0)
        feats.append(flat.std(axis=0) / 255.0)
        return np.concatenate(feats).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        dim = 3 * self.bins + 6
        out = []
        for blob, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            try:
                out.append(self._features(decode(blob, fmt)).tolist())
            except (NotImplementedError, ValueError):
                out.append([0.0] * dim)
        return t.append_column(
            "img_features", pa.array(out, pa.list_(pa.float32()))
        )


class AudioDecodeStats:
    """Decode each audio clip (FPCM) and emit stream statistics + a
    recomputed fingerprint. Output columns: ``duration_s: float64``,
    ``rms: float64``, ``peak: float64``, ``afp_check: int64``,
    ``decode_ok: bool``. Unknown formats yield decode_ok=false (reference
    row-error policy: skip row, keep going)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..audio import afp64, decode as adecode

        n = t.num_rows
        dur = np.zeros(n, dtype=np.float64)
        rms = np.zeros(n, dtype=np.float64)
        peak = np.zeros(n, dtype=np.float64)
        fp = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, (blob, fmt) in enumerate(
            zip(t["bytes"].to_pylist(), t["fmt"].to_pylist())
        ):
            try:
                samples, sr = adecode(blob, fmt)
            except (NotImplementedError, ValueError):
                continue
            x = samples.astype(np.float64) / 32768.0
            dur[i] = len(samples) / sr if sr else 0.0
            rms[i] = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            peak[i] = float(np.abs(x).max()) if len(x) else 0.0
            f = afp64(samples)
            fp[i] = f - (1 << 64) if f >= 1 << 63 else f
            ok[i] = True
        t = t.append_column("duration_s", pa.array(dur))
        t = t.append_column("rms", pa.array(rms))
        t = t.append_column("peak", pa.array(peak))
        t = t.append_column("afp_check", pa.array(fp))
        return t.append_column("decode_ok", pa.array(ok))


class AudioFeatures:
    """Feature extraction: decode (FPCM) -> spectral band energies +
    centroid / zero-crossing rate / RMS (``reddacted_ray.audio``).

    Emits ``audio_features: list<float>`` — a real embedding-style vector
    usable by the similarity / embedding-dedup stages (the audio analog of
    ``ImageFeatures``). Undecodable rows get a zero vector. The codec is
    the deterministic FPCM stand-in (no audio library in this container);
    swap ``reddacted_ray.audio.decode`` for a real codec in production —
    the stage contract (binary in -> list<float> out) is unchanged."""

    def __init__(self, n_bands: int = 12) -> None:
        self.n_bands = n_bands

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..audio import audio_features, decode as adecode

        dim = self.n_bands + 3
        out = []
        for blob, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            try:
                samples, sr = adecode(blob, fmt)
                out.append(audio_features(samples, sr, self.n_bands).tolist())
            except (NotImplementedError, ValueError):
                out.append([0.0] * dim)
        return t.append_column(
            "audio_features", pa.array(out, pa.list_(pa.float32()))
        )


class VideoDecodeStats:
    """Decode each video clip (FVID) and emit stream statistics + a
    recomputed TIRI fingerprint. Output columns: ``duration_s: float64``,
    ``mean_lum: float64``, ``motion: float64`` (mean abs frame-to-frame
    pixel delta), ``vfp_check: int64``, ``decode_ok: bool``. Unknown
    formats yield decode_ok=false (reference row-error policy: skip row,
    keep going — reference ``sentiment.py:280-284``)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..video import decode as vdecode, vfp64

        n = t.num_rows
        dur = np.zeros(n, dtype=np.float64)
        lum = np.zeros(n, dtype=np.float64)
        motion = np.zeros(n, dtype=np.float64)
        fp = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, (blob, fmt) in enumerate(
            zip(t["bytes"].to_pylist(), t["fmt"].to_pylist())
        ):
            try:
                frames, fps = vdecode(blob, fmt)
            except (NotImplementedError, ValueError):
                continue
            x = frames.astype(np.float64) / 255.0
            dur[i] = frames.shape[0] / fps if fps else 0.0
            lum[i] = float(x.mean())
            motion[i] = (
                float(np.abs(x[1:] - x[:-1]).mean()) if frames.shape[0] > 1 else 0.0
            )
            f = vfp64(frames)
            fp[i] = f - (1 << 64) if f >= 1 << 63 else f
            ok[i] = True
        t = t.append_column("duration_s", pa.array(dur))
        t = t.append_column("mean_lum", pa.array(lum))
        t = t.append_column("motion", pa.array(motion))
        t = t.append_column("vfp_check", pa.array(fp))
        return t.append_column("decode_ok", pa.array(ok))


class VideoFeatures:
    """Feature extraction: decode (FVID) -> per-segment luminance/motion +
    contrast/gradient vector (``reddacted_ray.video.video_features``).

    Emits ``video_features: list<float>`` — a real embedding-style vector
    usable by the similarity / embedding-dedup stages (the video analog of
    ``ImageFeatures``/``AudioFeatures``). Undecodable rows get a zero
    vector. Swap ``reddacted_ray.video.decode`` for a real demuxer in
    production — the stage contract (binary in -> list<float> out) is
    unchanged."""

    def __init__(self, n_segments: int = 8) -> None:
        self.n_segments = n_segments

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..video import decode as vdecode, video_features

        dim = self.n_segments * 8 + self.n_segments + 2  # 2x4 grid default
        out = []
        for blob, fmt in zip(t["bytes"].to_pylist(), t["fmt"].to_pylist()):
            try:
                frames, _fps = vdecode(blob, fmt)
                out.append(video_features(frames, self.n_segments).tolist())
            except (NotImplementedError, ValueError):
                out.append([0.0] * dim)
        return t.append_column(
            "video_features", pa.array(out, pa.list_(pa.float32()))
        )


class FrameSample:
    """Video frame sampling: decode (FVID), take every ``stride``-th frame,
    and emit each as an IMAGE-TABLE-shaped row (grayscale stacked to RGB,
    re-encoded png) — a real flat-map expansion (1 clip row -> ceil(n/stride)
    frame rows) whose output feeds the existing image stages (DecodeStats,
    ImageFeatures, phash dedup) unchanged. Undecodable clips emit no rows
    (reference row-error policy). ``max_frames`` caps the fan-out so one
    long clip can't blow up a block (output rows, not input rows, carry the
    pixel payload — keep caller batch_size small)."""

    def __init__(self, stride: int = 8, max_frames: int = 16) -> None:
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..imaging import encode
        from ..video import decode as vdecode

        ids, frame_idx, blobs, ws, hs = [], [], [], [], []
        for vid, blob, fmt in zip(
            t["video_id"].to_pylist(), t["bytes"].to_pylist(), t["fmt"].to_pylist()
        ):
            try:
                frames, _fps = vdecode(blob, fmt)
            except (NotImplementedError, ValueError):
                continue
            for fi in list(range(0, frames.shape[0], self.stride))[: self.max_frames]:
                px = np.repeat(frames[fi][:, :, None], 3, axis=2)
                ids.append(vid)
                frame_idx.append(fi)
                blobs.append(encode(px, "png"))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
        return pa.table(
            {
                "image_id": pa.array(
                    [f"{v}#f{f:04d}" for v, f in zip(ids, frame_idx)], pa.string()
                ),
                "video_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(["png"] * len(ids), pa.string()),
            }
        )


def decode_stats(ds: rd.Dataset, batch_size: int = 256, concurrency=(1, 8)) -> rd.Dataset:
    return ds.map_batches(DecodeStats, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def resize(ds: rd.Dataset, out_w: int, out_h: int, batch_size: int = 256,
           concurrency=(1, 8)) -> rd.Dataset:
    return ds.map_batches(Resize, fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


class Augment:
    """Deterministic augmentation EXPANSION: each input image row fans
    out to len(ops)+1 rows — the original plus one per op in
    ``('hflip', 'rot90', 'vflip')`` subsets — re-encoded in the row's
    own format, tagged in an ``aug`` column. The training-data
    augmentation shape: a flat-map over binary payloads where the
    output is a multiple of the input, so batch_size must be sized for
    (fanout x payload) in heap. Real pixel ops on the self-contained
    codecs (np flips/rot90); pixel-exactness locked by tests."""

    OPS = {
        "hflip": lambda px: px[:, ::-1],
        "vflip": lambda px: px[::-1],
        "rot90": lambda px: np.rot90(px, 1),
    }

    def __init__(self, ops: tuple = ("hflip", "rot90")) -> None:
        unknown = set(ops) - set(self.OPS)
        if unknown:
            raise ValueError(f"unknown augment ops: {unknown}")
        self.ops = tuple(ops)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, augs, blobs, ws, hs, fmts = [], [], [], [], [], []
        for iid, blob, fmt in zip(t["image_id"].to_pylist(),
                                  t["bytes"].to_pylist(),
                                  t["fmt"].to_pylist()):
            px = decode(blob, fmt)
            variants = [("orig", px)]
            variants += [(op, self.OPS[op](px)) for op in self.ops]
            for name, v in variants:
                v = np.ascontiguousarray(v)
                ids.append(iid)
                augs.append(name)
                blobs.append(encode(v, fmt))
                hs.append(v.shape[0])
                ws.append(v.shape[1])
                fmts.append(fmt)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "aug": pa.array(augs, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
        })


def augment(ds: rd.Dataset, ops: tuple = ("hflip", "rot90"),
            batch_size: int = 128, concurrency=(1, 8)) -> rd.Dataset:
    """Augmentation fan-out stage (see ``Augment``). batch_size defaults
    smaller than the other image stages because output payload is
    (len(ops)+1) x input."""
    return ds.map_batches(Augment, fn_constructor_kwargs=dict(ops=ops),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)
