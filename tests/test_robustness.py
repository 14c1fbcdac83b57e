"""Robustness: empty inputs, unicode, degenerate tables through the engine."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from reddacted_ray.oracle import LabelerConfig, label_rows
from reddacted_ray.pipelines.quality_filter import build
from reddacted_ray.pipelines.report import aggregates
from reddacted_ray.schema import IMAGES_SCHEMA
from reddacted_ray.stages.dedup import exact_dedup, minhash_lsh_duplicates


def _write(tmp_path, table, name="t.parquet"):
    p = tmp_path / name
    pq.write_table(table, str(p))
    return str(p)


def test_empty_images_table(ray_session, tmp_path):
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in IMAGES_SCHEMA}, schema=IMAGES_SCHEMA
    )
    path = _write(tmp_path, empty)
    ds = build(path, cfg=LabelerConfig())
    assert ds.count() == 0
    agg = aggregates(build(path, cfg=LabelerConfig()))
    assert agg["num_rows"] == 0 and agg["mean_sentiment"] == 0.0
    assert agg["max_risk_image_id"] is None


def test_unicode_and_edge_captions_e2e(ray_session, tmp_path):
    caps = [
        "café naïve 你好 🙂 email x@y.com",
        "",
        "   ",
        "a" * 5000,
        "<" * 100,
        "mixed ümlauts & emojis 🎉 with Dr. Ünal Smith",
    ]
    t = pa.table(
        {
            "image_id": pa.array([f"u{i}" for i in range(len(caps))]),
            "bytes": pa.array([b"\x00"] * len(caps), pa.binary()),
            "w": pa.array([1] * len(caps), pa.int32()),
            "h": pa.array([1] * len(caps), pa.int32()),
            "fmt": pa.array(["raw"] * len(caps)),
            "caption": pa.array(caps),
            "phash": pa.array([0] * len(caps), pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )
    path = _write(tmp_path, t)
    out = build(path, cfg=LabelerConfig(), batch_size=2).to_pandas()
    oracle = {r["image_id"]: r for r in label_rows(
        [(f"u{i}", c) for i, c in enumerate(caps)]
    )}
    assert len(out) == len(caps)
    for row in out.itertuples():
        o = oracle[row.image_id]
        assert row.keep == o["keep"]
        assert row.caption_scrubbed == o["caption_scrubbed"]


def test_dedup_on_empty_and_singleton(ray_session):
    single = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"])})
    )
    assert exact_dedup(single, "text", "doc_id").count() == 1
    assert minhash_lsh_duplicates(single, "text", "doc_id").count() == 0


def test_null_caption_rows_are_skipped(ray_session, tmp_path):
    # reference row-error policy (sentiment.py:280-284): bad row skipped,
    # processing continues — both in the oracle and the Ray stage
    t = pa.table(
        {
            "image_id": pa.array(["a", "b", "c"]),
            "bytes": pa.array([b""] * 3, pa.binary()),
            "w": pa.array([1] * 3, pa.int32()),
            "h": pa.array([1] * 3, pa.int32()),
            "fmt": pa.array(["raw"] * 3),
            "caption": pa.array(["fine one", None, "another fine"]),
            "phash": pa.array([0] * 3, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )
    path = _write(tmp_path, t, "nulls.parquet")
    out = build(path, cfg=LabelerConfig(), batch_size=2).to_pandas()
    assert sorted(out["image_id"]) == ["a", "c"]
    res = label_rows([("a", "fine one"), ("b", None), ("c", "another fine")])
    assert sorted(r["image_id"] for r in res) == ["a", "c"]


def test_flagship_streams_with_tiny_blocks(ray_session, synth_dir):
    """Backpressure sanity: with a tiny target block size the flagship must
    still stream to completion (many small blocks, no full materialization
    anywhere in the pipeline)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        cfg = LabelerConfig(skip_text="This comment has been reddacted")
        n = build(synth_dir, cfg=cfg, batch_size=64, mode="decide").count()
        assert n == 1199
    finally:
        ctx.target_max_block_size = old
