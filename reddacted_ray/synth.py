"""Deterministic synthetic image+caption table generator.

Produces the BASELINE.json input_hint table shape
(``image_id, bytes, w, h, fmt, caption, phash``) with the FIXTURES.md
caption corpus embedded, a heavy-tailed caption-length distribution (skew
exercise for repartitioning), and phash duplicate clusters including one hot
cluster (skewed-groupby exercise). Seeded — identical output across
processes and runs. Writes sharded Parquet so reads parallelize.

No external data: everything is generated from the fixed seed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .imaging import encode, phash64
from .schema import IMAGES_SCHEMA

# FIXTURES.md §3 labeled captions (PII-positive, boost, veto, validator,
# gate, sentiment, normalizer cases). These seed every generated table so
# conformance rows always exist at any scale.
LABELED_CAPTIONS: list[str] = [
    # 3a PII-positive patterns
    "Contact me at john.doe@example.com for details",
    "My phone number is (415) 555-0123",
    "SSN on file: 123-45-6789",
    "Card used: 4111 1111 1111 1111",
    "I live at 123 Maple Street near the park",
    "Dr. Jane Smith was my professor",
    # 3b context boost
    "call me at 415-555-0123 anytime",
    "my name is attached: reach me at a@b.io",
    # 3c false-positive vetoes
    "running 8 gpu nodes for training",
    "watched it 100 times already",
    "finished in 3rd place",
    "downloaded 16gb yesterday from a@b.com",
    # 3d validator edges
    "short num 555-012",
    "lot 1234 5678 road",
    # 3e gate cases
    "My phone number is 555-0123",
    "I live at 123 Main St, Springfield",
    "Just a regular comment about cats",
    "RaunchyRaccoon that looks a lot like Miami Springs!",
    # 3f sentiment
    "Looks sick!",
    "10/10 very art such picasso wow",
    "this is terrible and I hate it",
    "#DOGE HOLD IT",
    # 3g normalizer
    "hello   world  &amp;#x200B; ",
    "some <b>bold</b> claim",
    "already reddacted: This comment has been reddacted to preserve online "
    "privacy - see r/reddacted for more info",
]

_FILLER_WORDS = (
    "a photo of sunset mountain river forest city street portrait close up "
    "view wide angle macro shot of an old wooden bridge over calm water with "
    "soft light and gentle clouds drifting past green hills while birds fly "
    "slowly above quiet fields of golden wheat swaying near small stone "
    "houses beside winding gravel paths under clear blue skies"
).split()

_PII_TEMPLATES = [
    "photographer contact {u}@{d}.com for licensing",
    "send prints to {u}@{d}.org please",
    "my name is {U} and you can reach me at {u}@{d}.net",
    "credit Dr. {U} {U2} for this capture",
    "email {u}.{u2}@{d}.io about reuse rights",
]

_TOXIC_TEMPLATES = [
    "what an idiot took this worthless garbage shot",
    "this is disgusting trash from a pathetic loser",
]

_NAMES = ["alex", "sam", "kim", "lee", "pat", "jo", "max", "ray", "ida", "ben"]
_UNAMES = ["Alex", "Sam", "Kim", "Lee", "Pat", "Jo", "Max", "Ray", "Ida", "Ben"]
_DOMAINS = ["example", "mail", "photo", "pix", "shot"]


def _filler_caption(rng: np.random.RandomState) -> str:
    # heavy-tailed length: mostly 4-12 words, rare multi-hundred-word tails
    r = rng.rand()
    if r < 0.85:
        n = rng.randint(4, 13)
    elif r < 0.98:
        n = rng.randint(13, 60)
    else:
        n = rng.randint(200, 600)
    idx = rng.randint(0, len(_FILLER_WORDS), size=n)
    return " ".join(_FILLER_WORDS[i] for i in idx)


def _pii_caption(rng: np.random.RandomState) -> str:
    t = _PII_TEMPLATES[rng.randint(len(_PII_TEMPLATES))]
    return t.format(
        u=_NAMES[rng.randint(10)],
        u2=_NAMES[rng.randint(10)],
        U=_UNAMES[rng.randint(10)],
        U2=_UNAMES[rng.randint(10)],
        d=_DOMAINS[rng.randint(5)],
    )


def _make_pixels(rng: np.random.RandomState, w: int, h: int) -> np.ndarray:
    # smooth-ish gradient + noise so phash varies but compresses well
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None, None]
    base = (x + y) / 2 + rng.randint(0, 32, size=(h, w, 3))
    return np.clip(base, 0, 255).astype(np.uint8)


def generate_table(num_rows: int, seed: int = 42, start_id: int = 0) -> pa.Table:
    """Generate one shard of the images table. Deterministic in (seed, start_id)."""
    rng = np.random.RandomState(seed + start_id)
    sizes = [(8, 8), (16, 16), (16, 8), (32, 32), (64, 64)]
    # phash duplicate clusters: ~3% of rows reuse one of a few shared images;
    # one hot cluster takes half the duplicate mass (skew exercise).
    shared_pixels = [_make_pixels(rng, 16, 16) for _ in range(8)]
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in range(num_rows):
        gid = start_id + i
        # caption choice
        if gid < len(LABELED_CAPTIONS):
            cap = LABELED_CAPTIONS[gid]  # conformance rows live at the front
        else:
            r = rng.rand()
            if r < 0.04:
                cap = _pii_caption(rng)
            elif r < 0.05:
                cap = _TOXIC_TEMPLATES[rng.randint(len(_TOXIC_TEMPLATES))]
            elif r < 0.06:
                cap = "I live at home with " + _filler_caption(rng)  # gate disclosure
            else:
                cap = _filler_caption(rng)
        # image choice
        r = rng.rand()
        if r < 0.015:
            px = shared_pixels[0]  # hot duplicate cluster
        elif r < 0.03:
            px = shared_pixels[1 + rng.randint(7)]
        else:
            w0, h0 = sizes[rng.randint(len(sizes))]
            px = _make_pixels(rng, w0, h0)
        fmt = "jpeg" if rng.rand() < 0.3 else "png"
        blob = encode(px, fmt)
        ph = phash64(px)
        if ph >= 1 << 63:
            ph -= 1 << 64  # two's-complement into int64
        ids.append(f"img{gid:08d}")
        blobs.append(blob)
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(fmt)
        caps.append(cap)
        phs.append(ph)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )


def _make_clip(rng: np.random.RandomState) -> tuple[np.ndarray, int]:
    """One deterministic clip: 2-4 sine harmonics + white noise, int16."""
    sr = 8000
    n = rng.randint(4000, 16001)
    t = np.arange(n, dtype=np.float64) / sr
    x = np.zeros(n)
    for _ in range(rng.randint(2, 5)):
        f0 = rng.uniform(80.0, 2000.0)
        amp = rng.uniform(0.05, 0.3)
        x += amp * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
    x += rng.normal(0, 0.02, size=n)
    return (np.clip(x, -0.999, 0.999) * 32767).astype(np.int16), sr


def generate_audio_table(num_rows: int, seed: int = 42, start_id: int = 0) -> pa.Table:
    """One shard of the audio-clip table (``AUDIO_SCHEMA``): FPCM blobs +
    caption + 64-bit audio fingerprint, with duplicate clusters mirroring
    the image table (~3% shared clips, one hot cluster). Deterministic in
    (seed, start_id)."""
    from .audio import afp64, encode_pcm
    from .schema import AUDIO_SCHEMA

    rng = np.random.RandomState(seed * 7 + start_id + 1)
    shared = [_make_clip(rng) for _ in range(8)]
    ids, blobs, srs, ns, fmts, caps, afps = [], [], [], [], [], [], []
    for i in range(num_rows):
        gid = start_id + i
        if gid < len(LABELED_CAPTIONS):
            cap = LABELED_CAPTIONS[gid]
        else:
            r = rng.rand()
            cap = _pii_caption(rng) if r < 0.04 else _filler_caption(rng)
        r = rng.rand()
        if r < 0.015:
            clip, sr = shared[0]  # hot duplicate cluster
        elif r < 0.03:
            clip, sr = shared[1 + rng.randint(7)]
        else:
            clip, sr = _make_clip(rng)
        fp = afp64(clip)
        if fp >= 1 << 63:
            fp -= 1 << 64
        ids.append(f"aud{gid:08d}")
        blobs.append(encode_pcm(clip, sr))
        srs.append(sr)
        ns.append(len(clip))
        fmts.append("fpcm")
        caps.append(cap)
        afps.append(fp)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sr": pa.array(srs, pa.int32()),
            "n_samples": pa.array(ns, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "afp": pa.array(afps, pa.int64()),
        },
        schema=AUDIO_SCHEMA,
    )


def write_audio_dataset(
    out_dir: str, num_rows: int, seed: int = 42, rows_per_shard: int = 2_000
) -> str:
    """Sharded Parquet audio dataset; idempotent via _SYNTH_MANIFEST
    (same contract as ``write_dataset``)."""
    return _write_sharded(
        out_dir, num_rows, rows_per_shard,
        tag=f"audio-v1 rows={num_rows} seed={seed} shard={rows_per_shard}",
        gen=lambda start, n: generate_audio_table(n, seed=seed, start_id=start),
    )


def _make_video_clip(rng: np.random.RandomState) -> tuple[np.ndarray, int]:
    """One deterministic clip: random background gradient + a bright box
    moving on a random trajectory + sensor noise. uint8 (n, h, w)."""
    n = rng.randint(24, 49)
    h, w = 24, 32
    gx, gy = rng.uniform(-100, 100), rng.uniform(-60, 60)
    base = (
        np.linspace(0, gx, w)[None, :]
        + np.linspace(0, gy, h)[:, None]
        + rng.uniform(40.0, 160.0)
    )
    bx, by = rng.randint(0, w - 8), rng.randint(0, h - 6)
    vx, vy = rng.randint(1, 4), rng.randint(1, 3)
    frames = np.zeros((n, h, w))
    for f in range(n):
        fr = base + rng.normal(0, 2.0, (h, w))
        x0 = (bx + vx * f) % (w - 8)
        y0 = (by + vy * f) % (h - 6)
        fr[y0 : y0 + 6, x0 : x0 + 8] += 100.0
        frames[f] = fr
    return np.clip(frames, 0, 255).astype(np.uint8), 12


def generate_video_table(num_rows: int, seed: int = 42, start_id: int = 0) -> pa.Table:
    """One shard of the video-clip table (``VIDEO_SCHEMA``): FVID blobs +
    caption + 64-bit TIRI fingerprint, with duplicate clusters mirroring
    the image/audio tables (~1.5% one hot byte-identical cluster, ~1.5%
    smaller clusters, plus ~1% gain-scaled NEAR-dups of the hot clip —
    hamming <= ~4 from it but byte-distinct). Deterministic in
    (seed, start_id)."""
    from .schema import VIDEO_SCHEMA
    from .video import encode_video, vfp64

    rng = np.random.RandomState(seed * 13 + start_id + 2)
    shared = [_make_video_clip(rng) for _ in range(8)]
    ids, blobs, ws, hs, nfs, fpss, fmts, caps, vfps = ([] for _ in range(9))
    for i in range(num_rows):
        gid = start_id + i
        if gid < len(LABELED_CAPTIONS):
            cap = LABELED_CAPTIONS[gid]
        else:
            cap = _pii_caption(rng) if rng.rand() < 0.04 else _filler_caption(rng)
        r = rng.rand()
        if r < 0.015:
            clip, fps = shared[0]  # hot duplicate cluster
        elif r < 0.03:
            clip, fps = shared[1 + rng.randint(7)]
        elif r < 0.04:  # gain-scaled near-dup of the hot clip
            src, fps = shared[0]
            gain = rng.uniform(0.8, 0.95)
            clip = np.clip(src.astype(np.float64) * gain + rng.uniform(5, 15), 0, 255).astype(np.uint8)
        else:
            clip, fps = _make_video_clip(rng)
        fp = vfp64(clip)
        if fp >= 1 << 63:
            fp -= 1 << 64
        ids.append(f"vid{gid:08d}")
        blobs.append(encode_video(clip, fps))
        nfs.append(clip.shape[0])
        hs.append(clip.shape[1])
        ws.append(clip.shape[2])
        fpss.append(fps)
        fmts.append("fvid")
        caps.append(cap)
        vfps.append(fp)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nfs, pa.int32()),
            "fps": pa.array(fpss, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "vfp": pa.array(vfps, pa.int64()),
        },
        schema=VIDEO_SCHEMA,
    )


def write_video_dataset(
    out_dir: str, num_rows: int, seed: int = 42, rows_per_shard: int = 1_000
) -> str:
    """Sharded Parquet video dataset; idempotent via _SYNTH_MANIFEST
    (same contract as ``write_dataset``)."""
    return _write_sharded(
        out_dir, num_rows, rows_per_shard,
        tag=f"video-v1 rows={num_rows} seed={seed} shard={rows_per_shard}",
        gen=lambda start, n: generate_video_table(n, seed=seed, start_id=start),
    )


def _write_sharded(out_dir: str, num_rows: int, rows_per_shard: int,
                   tag: str, gen) -> str:
    manifest = os.path.join(out_dir, "_SYNTH_MANIFEST")
    if os.path.exists(manifest):
        with open(manifest) as f:
            if f.read().strip() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for old in os.listdir(out_dir):
        if old.endswith(".parquet"):
            os.remove(os.path.join(out_dir, old))
    shards = [
        (i, start, min(rows_per_shard, num_rows - start))
        for i, start in enumerate(range(0, num_rows, rows_per_shard))
    ]
    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray and len(shards) > 1:
        import ray

        @ray.remote
        def _gen(shard: int, start: int, n: int) -> None:
            pq.write_table(
                gen(start, n), os.path.join(out_dir, f"part-{shard:05d}.parquet")
            )

        ray.get([_gen.remote(s, st, n) for s, st, n in shards])
    else:
        for s, st, n in shards:
            pq.write_table(
                gen(st, n), os.path.join(out_dir, f"part-{s:05d}.parquet")
            )
    with open(manifest, "w") as f:
        f.write(tag)
    return out_dir


def write_dataset(
    out_dir: str, num_rows: int, seed: int = 42, rows_per_shard: int = 5_000
) -> str:
    """Write a sharded Parquet images dataset; idempotent (skips if a
    matching _SYNTH_MANIFEST exists). Returns ``out_dir``.
    Shards are seeded independently -> parallel generation is
    bit-identical to sequential. (Tag v2: FJP2 6-bit lossy codec — old v1
    caches hold FJPG payloads the current decoder rejects.)"""
    return _write_sharded(
        out_dir, num_rows, rows_per_shard,
        tag=f"v2 rows={num_rows} seed={seed} shard={rows_per_shard}",
        gen=lambda start, n: generate_table(n, seed=seed, start_id=start),
    )
