"""Resumable-run tests: atomic partition writes, lineage, skip-on-rerun."""

import json
import os

import pyarrow.dataset as pads
import pytest

from reddacted_ray.oracle import LabelerConfig
from reddacted_ray.pipelines.quality_filter import build
from reddacted_ray.state.manifest import Manifest, plan_partitions, run_resumable

CFG = LabelerConfig(skip_text="This comment has been reddacted")


def _build_fn(files):
    return build(files, cfg=CFG, batch_size=256, concurrency=(1, 2))


def test_plan_is_deterministic():
    p1 = plan_partitions(["b.parquet", "a.parquet", "c.parquet"], 2)
    p2 = plan_partitions(["c.parquet", "a.parquet", "b.parquet"], 2)
    assert p1 == p2
    assert p1[0] == ("00000", ["a.parquet", "b.parquet"])


def test_resume_skips_completed(ray_session, synth_dir, tmp_path):
    out = str(tmp_path / "out")
    # interrupted run: only 2 of 4 partitions
    r1 = run_resumable(synth_dir, out, _build_fn, files_per_partition=1,
                       max_partitions=2)
    assert r1["partitions_ran"] == 2 and r1["partitions_total"] == 4
    # rerun completes the rest, skipping the committed ones
    r2 = run_resumable(synth_dir, out, _build_fn, files_per_partition=1)
    assert r2["partitions_ran"] == 2 and r2["partitions_skipped"] == 2
    # third run is a full no-op
    r3 = run_resumable(synth_dir, out, _build_fn, files_per_partition=1)
    assert r3["partitions_ran"] == 0 and r3["partitions_skipped"] == 4

    # lineage records: one per partition with metrics
    with open(os.path.join(out, "manifest.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 4
    for rec in recs:
        assert rec["rows_out"] == rec["kept"] + rec["dropped"]
        assert rec["wall_s"] > 0 and rec["input_files"]

    # output completeness: all rows present exactly once
    total = sum(r["rows_out"] for r in recs)
    import glob

    part_files = sorted(glob.glob(os.path.join(out, "partition_id=*", "*.parquet")))
    dset = pads.dataset(part_files, format="parquet")
    assert dset.count_rows() == total
    full = build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 2))
    assert total == full.count()


def test_resume_reruns_remapped_partitions(ray_session, tmp_path):
    """If the input dir gains a file, partition ids remap; the resume check
    must re-run (and overwrite) every partition whose input_files changed."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    ind = tmp_path / "in"
    ind.mkdir()
    for name, lo in [("a.parquet", 0), ("c.parquet", 100)]:
        pq.write_table(pa.table({"x": pa.array(range(lo, lo + 5))}),
                       str(ind / name))
    out = str(tmp_path / "out")
    fn = lambda files: rd.read_parquet(files)
    r1 = run_resumable(str(ind), out, fn, files_per_partition=1)
    assert r1["partitions_ran"] == 2
    # new file sorts between a and c -> partition 00001 now holds b, not c
    pq.write_table(pa.table({"x": pa.array(range(200, 205))}),
                   str(ind / "b.parquet"))
    r2 = run_resumable(str(ind), out, fn, files_per_partition=1)
    # 00000 (a) unchanged -> skipped; 00001 (b) + 00002 (c) re-run
    assert r2["partitions_skipped"] == 1 and r2["partitions_ran"] == 2
    dset = pads.dataset(out, format="parquet",
                        exclude_invalid_files=True)
    got = sorted(dset.to_table()["x"].to_pylist())
    assert got == list(range(0, 5)) + list(range(100, 105)) + list(range(200, 205))


def test_atomic_dir_discards_on_failure(tmp_path):
    mf = Manifest(str(tmp_path / "o"))
    with pytest.raises(RuntimeError):
        with mf.atomic_write_dir("00001") as tmp:
            open(os.path.join(tmp, "x"), "w").write("partial")
            raise RuntimeError("boom")
    assert not os.path.exists(mf.partition_dir("00001"))
    assert "00001" not in mf.completed()


def test_error_lineage_rows_and_failed_ids(ray_session, tmp_path):
    """SURVEY §4 + reference A5 (api/reddit.py:242-245): with emit_errors a
    poison row stays as an error-lineage row (keep=false, error set), the
    manifest counts it and records its id, and every output row carries its
    partition_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from reddacted_ray.schema import IMAGES_SCHEMA

    ind = tmp_path / "in"
    ind.mkdir()
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
    pq.write_table(t, str(ind / "p.parquet"))
    out = str(tmp_path / "out")
    cfg = LabelerConfig(emit_errors=True)
    summary = run_resumable(
        str(ind), out,
        lambda files: build(files, cfg=cfg, batch_size=2, concurrency=(1, 2)),
        files_per_partition=1,
    )
    assert summary["partitions_ran"] == 1
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert recs[0]["rows_out"] == 3
    assert recs[0]["failed"] == 1 and recs[0]["failed_ids"] == ["b"]
    assert recs[0]["kept"] + recs[0]["dropped"] == 3
    back = pads.dataset(
        os.path.join(out, "partition_id=00000"), format="parquet"
    ).to_table().sort_by("image_id")
    assert back.column("partition_id").to_pylist() == ["00000"] * 3
    rows = {r["image_id"]: r for r in back.to_pylist()}
    assert rows["b"]["error"] and not rows["b"]["keep"]
    assert rows["a"]["error"] is None and rows["c"]["error"] is None


def test_resume_removes_orphan_partitions(ray_session, tmp_path):
    """If the input SHRANK, trailing partition ids fall out of the plan;
    their stale output dirs and manifest records must be removed or the
    output would serve duplicated/ghost rows forever."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    ind = tmp_path / "in"
    ind.mkdir()
    for name, lo in [("a.parquet", 0), ("b.parquet", 100), ("c.parquet", 200)]:
        pq.write_table(pa.table({"x": pa.array(range(lo, lo + 5))}),
                       str(ind / name))
    out = str(tmp_path / "out")
    fn = lambda files: rd.read_parquet(files)
    r1 = run_resumable(str(ind), out, fn, files_per_partition=1)
    assert r1["partitions_ran"] == 3
    os.remove(str(ind / "b.parquet"))  # input shrinks: b gone, c remaps
    r2 = run_resumable(str(ind), out, fn, files_per_partition=1)
    # 00000 (a) unchanged; 00001 now holds c -> re-run; 00002 orphaned
    assert r2["partitions_total"] == 2
    assert not os.path.exists(os.path.join(out, "partition_id=00002"))
    dset = pads.dataset(out, format="parquet", exclude_invalid_files=True)
    got = sorted(dset.to_table()["x"].to_pylist())
    assert got == list(range(0, 5)) + list(range(200, 205))  # no ghosts/dups
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert all(r["partition_id"] in ("00000", "00001") for r in recs)
