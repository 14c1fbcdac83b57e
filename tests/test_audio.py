"""Audio codec + feature + dedup tests (task brief: multimodal columns as
first-class operators; round-2 VERDICT #4 — real audio feature operator
with ground-truth duplicate recovery like the image path's 48/48)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reddacted_ray.audio import (
    afp64,
    audio_features,
    decode,
    decode_pcm,
    encode_pcm,
)


@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=500),
       st.integers(1, 96000))
@settings(max_examples=40, deadline=None)
def test_fpcm_roundtrip_exact(vals, sr):
    x = np.array(vals, dtype=np.int16)
    y, sr2 = decode_pcm(encode_pcm(x, sr))
    assert sr2 == sr and y.dtype == np.int16 and (x == y).all()


def test_decode_rejects_unknown_format():
    with pytest.raises(ValueError):
        decode_pcm(b"RIFF....")
    with pytest.raises(NotImplementedError):
        decode(b"xxxx", "mp3")


def test_audio_features_shape_and_determinism():
    rng = np.random.RandomState(3)
    x = (rng.randn(8000) * 4000).astype(np.int16)
    f1 = audio_features(x, 8000)
    f2 = audio_features(x.copy(), 8000)
    assert f1.shape == (15,) and f1.dtype == np.float32
    assert (f1 == f2).all() and np.isfinite(f1).all()
    assert audio_features(np.array([], dtype=np.int16), 8000).tolist() == [0.0] * 15
    # tiny clip does not crash (degenerate band edges)
    assert np.isfinite(audio_features(x[:3], 8000)).all()


def test_afp64_discrimination():
    """Identical clips -> distance 0; distinct synthetic clips -> far apart
    (the near-dup radius of 2 must not glue random clips together)."""
    from reddacted_ray.synth import _make_clip

    rng = np.random.RandomState(7)
    clips = [_make_clip(rng)[0] for _ in range(40)]
    fps = [afp64(c) for c in clips]
    assert afp64(clips[0].copy()) == fps[0]
    dists = [
        bin(fps[i] ^ fps[j]).count("1")
        for i in range(len(fps)) for j in range(i)
    ]
    assert min(dists) > 2
    assert afp64(np.array([], dtype=np.int16)) == afp64(np.zeros(1, np.int16))


def _expected_dup_map(table: pa.Table, id_col: str) -> dict:
    groups = collections.defaultdict(list)
    for i, b in enumerate(table["bytes"].to_pylist()):
        groups[b].append(table[id_col][i].as_py())
    expected = {}
    for ids in groups.values():
        if len(ids) > 1:
            rep = min(ids)
            for x in ids:
                if x != rep:
                    expected[x] = rep
    return expected


def test_audio_feature_dedup_finds_exact_dups(ray_session):
    from reddacted_ray.pipelines.queries import q_dedup_audio_features
    from reddacted_ray.synth import generate_audio_table

    out = q_dedup_audio_features("/root/testdata/sf0.001").to_pandas()
    expected = _expected_dup_map(generate_audio_table(2000, seed=42), "audio_id")
    got = dict(zip(out["audio_id"], out["dup_of"]))
    assert got == expected  # every duplicate clip found, nothing spurious
    assert len(expected) > 20  # the planted mass actually exists


def test_audio_near_dup_superset_of_exact(ray_session):
    """afp-hamming near-dup must recover at least every byte-identical
    pair (distance 0) and may add close-sounding clips."""
    from reddacted_ray.pipelines.queries import q_dedup_audio_near
    from reddacted_ray.synth import generate_audio_table

    out = q_dedup_audio_near("/root/testdata/sf0.001").to_pandas()
    expected = _expected_dup_map(generate_audio_table(2000, seed=42), "audio_id")
    got = dict(zip(out["audio_id"], out["dup_of"]))
    for dup_id in expected:
        assert dup_id in got


def test_audio_decode_stats(ray_session):
    from reddacted_ray.pipelines.queries import q_audio_decode_stats

    df = q_audio_decode_stats("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 2000
    assert df["decode_ok"].all()
    assert (df["duration_s"] > 0).all() and (df["rms"] > 0).all()
    # recomputed fingerprint matches the stored column
    import pyarrow.dataset as pads

    t = pads.dataset("/tmp/graft_audio/small_sf0.001", format="parquet").to_table()
    stored = dict(zip(t["audio_id"].to_pylist(), t["afp"].to_pylist()))
    for aid, chk in zip(df["audio_id"], df["afp_check"]):
        assert stored[aid] == chk


def test_audio_features_stage_zero_vector_on_bad_rows(ray_session):
    import ray.data as rd

    from reddacted_ray.stages.multimodal import AudioFeatures

    t = pa.table(
        {
            "audio_id": pa.array(["a", "b"]),
            "bytes": pa.array([encode_pcm(np.ones(100, np.int16), 8000),
                               b"garbage"], pa.binary()),
            "fmt": pa.array(["fpcm", "mp3"]),
        }
    )
    out = rd.from_arrow(t).map_batches(
        AudioFeatures, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=1,
    ).to_pandas()
    assert len(out["audio_features"][0]) == 15
    assert all(v == 0.0 for v in out["audio_features"][1])
