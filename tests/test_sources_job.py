"""Tests: comment-source analogs (S1-S5), job CLI config merge, report sink."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from reddacted_ray.job import merge_configs
from reddacted_ray.sources.comments import read_comments


@pytest.fixture(scope="module")
def comments_path(tmp_path_factory):
    # golden reader fixture pattern (reference tests/test_scraper.py:29-119):
    # small frozen input, exact expected rows
    t = pa.table(
        {
            "id": pa.array([f"c{i}" for i in range(8)]),
            "text": pa.array(
                [
                    "First   comment &amp;#x200B; here",
                    "",  # dropped: empty body
                    "  spaced   out  ",
                    "the quick brown fox",
                    "Nothing Special",
                    "LOUD TEXT about Foxes",
                    "tail row one",
                    "tail row two",
                ]
            ),
            "upvotes": pa.array([5, 0, 50, 3, 9, 2, 1, 7], pa.int64()),
            "downvotes": pa.array([1, 0, 4, 9, 0, 2, 0, 1], pa.int64()),
            "permalink": pa.array([f"/r/x/{i}" for i in range(8)]),
        }
    )
    p = tmp_path_factory.mktemp("comments") / "comments.parquet"
    pq.write_table(t, str(p))
    return str(p)


def test_read_comments_normalizes_and_drops_empty(ray_session, comments_path):
    rows = read_comments(comments_path, limit=0).to_pandas().set_index("id")
    assert len(rows) == 7  # empty body dropped (api/scraper.py:62)
    # entity removed AFTER whitespace collapse -> double space survives
    # (reference statement order, api/scraper.py:56-58)
    assert rows.loc["c0", "text"] == "First comment  here"
    assert rows.loc["c2", "text"] == "spaced out"


def test_read_comments_sort_top_and_limit(ray_session, comments_path):
    rows = read_comments(comments_path, limit=3, sort="top").to_pandas()
    assert list(rows["id"]) == ["c2", "c4", "c7"]  # by upvotes desc


def test_read_comments_hot_uses_score(ray_session, comments_path):
    rows = read_comments(comments_path, limit=2, sort="hot").to_pandas()
    assert list(rows["id"]) == ["c2", "c4"]  # ups-downs: 46, 9
    assert "score" not in rows.columns


def test_read_comments_text_match(ray_session, comments_path):
    rows = read_comments(comments_path, limit=0, text_match="fox").to_pandas()
    assert set(rows["id"]) == {"c3", "c5"}  # case-insensitive


def test_merge_configs_precedence():
    out = merge_configs(
        {"limit": "5", "pii_only": "true", "input": "/env",
         "time_filter": "week"},
        {"limit": 7},
        {"input": "/flag", "batch_size": None, "time_filter": "day"},
    )
    assert out == {"limit": 7, "pii_only": True, "input": "/flag",
                   "time_filter": "day"}


@pytest.fixture(scope="module")
def timed_comments_path(tmp_path_factory):
    import datetime as dt

    base = dt.datetime(2026, 8, 17, 12, 0, 0)
    ages = [dt.timedelta(minutes=30), dt.timedelta(hours=5),
            dt.timedelta(days=3), dt.timedelta(days=40),
            dt.timedelta(days=400)]
    t = pa.table(
        {
            "id": pa.array([f"t{i}" for i in range(5)]),
            "text": pa.array([f"comment number {i}" for i in range(5)]),
            "upvotes": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "downvotes": pa.array([0] * 5, pa.int64()),
            "permalink": pa.array([f"/r/x/t{i}" for i in range(5)]),
            "created_utc": pa.array([base - a for a in ages],
                                    pa.timestamp("us")),
        }
    )
    p = tmp_path_factory.mktemp("timed") / "comments.parquet"
    pq.write_table(t, str(p))
    return str(p), base


def test_read_comments_time_filter(ray_session, timed_comments_path):
    """Reference api/reddit.py:348-382 time_filter semantics: trailing
    window anchored at an explicit 'now'; scan-level predicate."""
    import datetime as dt

    path, base = timed_comments_path
    from reddacted_ray.sources.comments import read_comments

    def ids(tf):
        rows = read_comments(path, limit=0, time_filter=tf, now=base)
        df = rows.to_pandas()
        assert "created_utc" not in df.columns  # reference 5-field shape
        return sorted(df["id"])

    assert ids("hour") == ["t0"]
    assert ids("day") == ["t0", "t1"]
    assert ids("week") == ["t0", "t1", "t2"]
    assert ids("year") == ["t0", "t1", "t2", "t3"]
    assert ids("all") == ["t0", "t1", "t2", "t3", "t4"]

    with pytest.raises(ValueError):
        read_comments(path, time_filter="fortnight", now=base)
    with pytest.raises(ValueError):
        read_comments(path, time_filter="day")  # no anchor


def test_job_cli_end_to_end(synth_dir, tmp_path):
    out = str(tmp_path / "jobout")
    rep = str(tmp_path / "report.md")
    env = dict(os.environ, REDD_SKIP_TEXT="This comment has been reddacted")
    proc = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", synth_dir,
         "--output", out, "--report", rep, "--num-cpus", "4"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["output"] == out and summary["wall_s"] > 0
    import pyarrow.dataset as pads

    n = pads.dataset(out, format="parquet").count_rows()
    assert n == 1199  # 1200 rows - 1 skip-text row
    md = open(rep).read()
    assert "# PII Analysis Report" in md and "Rows analyzed: 1199" in md
    # per-row detail sections for the riskiest rows (K1 analog)
    assert "## Row 1" in md and "Pattern-based PII Detected" in md


def test_job_cli_refuses_nonempty_output(tmp_path):
    """Non-resumable rerun into an existing output dir would silently append
    duplicate rows (write_parquet appends) — the CLI must refuse up front."""
    out = tmp_path / "dirty"
    out.mkdir()
    (out / "old.parquet").write_bytes(b"stale")
    proc = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", "/nonexistent",
         "--output", str(out)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 2
    assert "non-empty" in proc.stderr


def test_job_cli_requires_io():
    proc = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 2


def test_job_cli_resumable(synth_dir, tmp_path):
    out = str(tmp_path / "rout")
    env = dict(os.environ, REDD_SKIP_TEXT="This comment has been reddacted")
    args = [sys.executable, "-m", "reddacted_ray.job", "--input", synth_dir,
            "--output", out, "--resumable", "--files-per-partition", "2",
            "--num-cpus", "4"]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p1 = subprocess.run(args, capture_output=True, text=True, env=env, cwd=cwd)
    assert p1.returncode == 0, p1.stderr[-2000:]
    s1 = json.loads(p1.stdout.strip().splitlines()[-1])
    assert s1["partitions_ran"] == 2 and s1["partitions_total"] == 2
    p2 = subprocess.run(args, capture_output=True, text=True, env=env, cwd=cwd)
    s2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert s2["partitions_ran"] == 0 and s2["partitions_skipped"] == 2


def test_read_jsonl_source(ray_session, tmp_path):
    """JSONL source (scraper JSON-stream analog): parse + project + feed
    the normal comment pipeline."""
    import json as _json

    from reddacted_ray.sources.tables import read_jsonl

    p = tmp_path / "comments.jsonl"
    rows = [
        {"id": f"j{i}", "text": f"comment   number {i}", "upvotes": i,
         "downvotes": 0, "permalink": f"/r/x/j{i}", "extra": "ignored"}
        for i in range(6)
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl(str(p), columns=["id", "text", "upvotes"])
    df = ds.to_pandas().sort_values("id")
    assert list(df.columns) == ["id", "text", "upvotes"]
    assert len(df) == 6 and df["upvotes"].sum() == 15


def test_hash_split_deterministic_and_balanced(ray_session):
    """Split assignments must be identical across runs (no RNG) and track
    the requested fractions on a few thousand ids."""
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.stages.sampling import hash_split

    ids = pa.table({"doc_id": pa.array(range(4000), pa.int64())})
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(rd.from_arrow(ids), "doc_id", splits).to_pandas()
    b = hash_split(rd.from_arrow(ids), "doc_id", splits).to_pandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # rows keep their assignment under any subset (hash is per-id, not
    # positional) — sample 100 ids and re-split them alone
    sub = pa.table({"doc_id": pa.array(range(0, 4000, 40), pa.int64())})
    c = hash_split(rd.from_arrow(sub), "doc_id", splits).to_pandas()
    merged = c.merge(a, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_load_config_mode_and_flags():
    from reddacted_ray.job import load_config

    cfg = load_config(["--input", "a", "--output", "b", "--mode", "decide",
                       "--emit-errors", "--time-filter", "day"])
    assert cfg["mode"] == "decide" and cfg["emit_errors"] is True
    assert cfg["time_filter"] == "day"


def test_job_cli_decide_then_apply(synth_dir, tmp_path):
    """The full decide->apply chain through the CLI: phase 1 writes the
    id-keyed decision table (no bytes), phase 2 joins it back onto the
    full-byte input and writes kept rows with scrubbed captions."""
    import pyarrow.dataset as pads

    dec = str(tmp_path / "dec")
    fin = str(tmp_path / "fin")
    env = dict(os.environ, REDD_SKIP_TEXT="This comment has been reddacted")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p1 = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", synth_dir,
         "--output", dec, "--mode", "decide", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert p1.returncode == 0, p1.stderr[-2000:]
    dtab = pads.dataset(dec, format="parquet").to_table()
    assert "bytes" not in dtab.schema.names  # decision table is byte-free
    p2 = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", synth_dir,
         "--output", fin, "--mode", "apply", "--decisions", dec,
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd=cwd,
    )
    assert p2.returncode == 0, p2.stderr[-2000:]
    ftab = pads.dataset(fin, format="parquet").to_table()
    import pyarrow.compute as pc

    n_kept = pc.sum(pc.cast(dtab["keep"], "int64")).as_py()
    assert ftab.num_rows == n_kept
    assert "bytes" in ftab.schema.names and "caption" in ftab.schema.names
    # applied captions are the scrubbed ones
    dec_map = dict(zip(dtab["image_id"].to_pylist(),
                       dtab["caption_scrubbed"].to_pylist()))
    for iid, cap in zip(ftab["image_id"].to_pylist()[:100],
                        ftab["caption"].to_pylist()[:100]):
        assert cap == dec_map[iid]


def test_write_bucketed_roundtrip(ray_session, tmp_path):
    """Hash-bucketed sink: every row lands in exactly one stable bucket;
    reading one bucket back returns exactly its members (the co-location
    primitive for shuffle-free bucket-pair joins)."""
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.functions.hashing import stable_hash64
    from reddacted_ray.stages.sampling import read_bucket, write_bucketed

    ids = list(range(500))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "v": pa.array([i * 2 for i in ids])}))
    out = write_bucketed(ds, "doc_id", 8, str(tmp_path / "buckets"))
    total = 0
    for b in range(8):
        got = read_bucket(out, b, columns=["doc_id", "v"]).to_pandas()
        total += len(got)
        for i in got["doc_id"]:
            assert stable_hash64(str(i)) % 8 == b
        assert (got["v"] == got["doc_id"] * 2).all()
    assert total == 500


def test_read_comments_tz_aware_anchor(ray_session, timed_comments_path):
    """A tz-aware anchor against a naive timestamp column must coerce (not
    raise / mis-filter): naive storage is interpreted as UTC (r2 ADVICE)."""
    import datetime as dt

    path, base = timed_comments_path
    from reddacted_ray.sources.comments import read_comments

    aware = base.replace(tzinfo=dt.timezone.utc)
    got = sorted(
        read_comments(path, limit=0, time_filter="day", now=aware).to_pandas()["id"]
    )
    ref = sorted(
        read_comments(path, limit=0, time_filter="day", now=base).to_pandas()["id"]
    )
    assert got == ref == ["t0", "t1"]


@pytest.fixture(scope="module")
def voted_images_path(tmp_path_factory):
    from reddacted_ray.imaging import encode
    import numpy as np

    n = 8
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode(px, "png")
    t = pa.table(
        {
            "image_id": pa.array([f"img{i:02d}" for i in range(n)]),
            "bytes": pa.array([blob] * n, pa.binary()),
            "w": pa.array([4] * n, pa.int32()),
            "h": pa.array([4] * n, pa.int32()),
            "fmt": pa.array(["png"] * n),
            "caption": pa.array([f"a plain caption {i}" for i in range(n)]),
            "phash": pa.array(list(range(n)), pa.int64()),
            "upvotes": pa.array([3, 9, 1, 7, 5, 8, 2, 6], pa.int64()),
            "downvotes": pa.array([0, 8, 0, 1, 5, 0, 1, 2], pa.int64()),
        }
    )
    p = tmp_path_factory.mktemp("voted") / "images.parquet"
    pq.write_table(t, str(p))
    return str(p)


def test_build_sort_top_limits_before_scoring(ray_session, voted_images_path):
    """Reference 'sort' config (cli.py:243-244): analyze the top-N of the
    sorted listing. decide mode drops the vote column from the output."""
    from reddacted_ray.oracle import LabelerConfig
    from reddacted_ray.pipelines.quality_filter import build

    cfg = LabelerConfig(limit=3)
    df = build(voted_images_path, cfg=cfg, mode="decide", sort="top").to_pandas()
    assert sorted(df["image_id"]) == ["img01", "img03", "img05"]  # ups 9,8,7
    assert "upvotes" not in df.columns
    hot = build(voted_images_path, cfg=cfg, mode="decide", sort="hot").to_pandas()
    # ups-downs: img05=8, img03=6, img02... img07=4 -> top3: img05, img03, img07
    assert sorted(hot["image_id"]) == ["img03", "img05", "img07"]
    with pytest.raises(ValueError):
        build(voted_images_path, sort="rising")


def test_split_thresholds_zero_tail_catches_all():
    """A trailing zero-fraction split must not steal rows: any cumulative
    bound reaching 2^32 becomes the catch-all (r2 ADVICE low)."""
    from reddacted_ray.stages.sampling import split_thresholds

    bounds = dict(split_thresholds({"a": 1.0, "b": 0.0}))
    assert bounds["a"] == "g" * 8  # not the 9-char '100000000'
    for _, b in split_thresholds({"x": 0.5, "y": 0.5}).__iter__():
        assert len(b) == 8


def test_split_zero_tail_assignment(ray_session):
    import ray.data as rd

    from reddacted_ray.stages.sampling import hash_split

    ids = pa.table({"doc_id": pa.array(list(range(200)), pa.int64())})
    out = hash_split(rd.from_arrow(ids), "doc_id", {"a": 1.0, "b": 0.0}).to_pandas()
    assert (out["split"] == "a").all()


def test_write_bucketed_rerun_overwrites(ray_session, tmp_path):
    """write_parquet appends into existing dirs; a write_bucketed rerun must
    clear the layout first or every bucket doubles (r2 ADVICE medium)."""
    import ray.data as rd

    from reddacted_ray.stages.sampling import read_bucket, write_bucketed

    t = pa.table({"doc_id": pa.array(list(range(64)), pa.int64()),
                  "v": pa.array(list(range(64)), pa.int64())})
    out = str(tmp_path / "bkt")
    write_bucketed(rd.from_arrow(t), "doc_id", 4, out)
    write_bucketed(rd.from_arrow(t), "doc_id", 4, out)  # rerun
    total = sum(
        read_bucket(out, b, columns=["doc_id"]).count() for b in range(4)
    )
    assert total == 64


def test_apply_colocated_equals_hash_join(ray_session, synth_dir, tmp_path):
    """Zero-shuffle provenance-co-located apply == the global hash-join
    apply, byte for byte; a rerun skips every completed partition."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from reddacted_ray.oracle import LabelerConfig
    from reddacted_ray.pipelines.quality_filter import (
        apply_decisions, apply_decisions_colocated, build,
    )
    from reddacted_ray.state.manifest import run_resumable

    cfg = LabelerConfig(skip_text="This comment has been reddacted")
    dec = str(tmp_path / "dec")
    run_resumable(
        synth_dir, dec,
        lambda files: build(files, cfg=cfg, mode="decide"),
        files_per_partition=2,
    )
    out = str(tmp_path / "fin")
    s = apply_decisions_colocated(synth_dir, dec, out)
    assert s["partitions_ran"] == 2 and s["partitions_skipped"] == 0

    got = (
        pads.dataset(out, format="parquet").to_table().to_pandas()
        .sort_values("image_id").reset_index(drop=True)
    )
    dec_files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(dec) for f in fs if f.endswith(".parquet")
    ]
    ref = (
        apply_decisions(synth_dir, rd.read_parquet(dec_files)).to_pandas()
        .sort_values("image_id").reset_index(drop=True)
    )
    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref) == s["rows_out"]
    for c in got.columns:
        assert (got[c] == ref[c]).all(), c

    # rerun: all partitions already applied -> nothing runs, output stable
    s2 = apply_decisions_colocated(synth_dir, dec, out)
    assert s2["partitions_ran"] == 0 and s2["partitions_skipped"] == 2


def test_job_cli_quality_gate_flags(synth_dir, tmp_path):
    """--max-dup-frac/--blocklist/--gate-drop run the quality gate from
    the CLI: the output carries keep_quality and (with --gate-drop)
    only gate survivors, matching the library-level gate row count."""
    out = str(tmp_path / "gated")
    proc = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", synth_dir,
         "--output", out, "--num-cpus", "4",
         "--max-dup-frac", "0.4", "--blocklist", "the,ssn",
         "--gate-drop"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    import pyarrow.dataset as pads

    t = pads.dataset(out, format="parquet").to_table()
    assert "keep_quality" in t.schema.names
    assert t["keep_quality"].combine_chunks().false_count == 0
    # annotate-only run keeps every row and marks the same survivors
    out2 = str(tmp_path / "annot")
    proc2 = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", synth_dir,
         "--output", out2, "--num-cpus", "4",
         "--max-dup-frac", "0.4", "--blocklist", "the,ssn"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    t2 = pads.dataset(out2, format="parquet").to_table()
    assert t2.num_rows > t.num_rows
    assert t2["keep_quality"].combine_chunks().true_count == t.num_rows


def test_compact_parquet_merges_small_files(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    from reddacted_ray.sources.tables import compact_parquet

    src = tmp_path / "shards"
    src.mkdir()
    for i in range(20):  # 20 tiny files
        pq.write_table(
            pa.table({"id": pa.array(range(i * 50, (i + 1) * 50), pa.int64()),
                      "v": pa.array([i] * 50, pa.int64())}),
            src / f"part-{i:03d}.parquet")
    out = tmp_path / "compacted"
    stats = compact_parquet(str(src), str(out), min_rows_per_file=500,
                            max_rows_per_file=1000)
    assert stats["files_in"] == 20 and stats["rows"] == 1000
    assert stats["files_out"] < 5
    a = pads.dataset(str(src), format="parquet").to_table().sort_by("id")
    b = pads.dataset(str(out), format="parquet").to_table().sort_by("id")
    assert a.equals(b)
    # non-empty target refused (append hazard)
    import pytest

    with pytest.raises(ValueError):
        compact_parquet(str(src), str(out))


def test_job_cli_compact_mode(tmp_path):
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    src = tmp_path / "many"
    src.mkdir()
    for i in range(12):
        pq.write_table(
            pa.table({"x": pa.array(range(i * 25, (i + 1) * 25), pa.int64())}),
            src / f"f{i}.parquet")
    out = str(tmp_path / "merged")
    proc = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--input", str(src),
         "--output", out, "--mode", "compact", "--min-rows-per-file", "150",
         "--max-rows-per-file", "300", "--num-cpus", "4"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "compact"
    assert summary["files_in"] == 12 and summary["rows"] == 300
    assert summary["files_out"] <= 2
    a = pads.dataset(str(src), format="parquet").to_table().sort_by("x")
    b = pads.dataset(out, format="parquet").to_table().sort_by("x")
    assert a.equals(b)


def test_read_table_lance_seam(synth_dir, monkeypatch, tmp_path):
    """The TableSource seam dispatches to rd.read_lance (with pruned
    columns AND the pushed row filter) whenever the lance package exists
    and the path looks like a Lance dataset — verified with a fake
    read_lance since the container lacks the package; the same call
    falls back to parquet otherwise (SURVEY §8.5 disclosure)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from reddacted_ray.sources import tables as T

    calls = {}

    def fake_read_lance(uri, *, columns=None, scanner_options=None, **kw):
        calls["uri"] = uri
        calls["columns"] = columns
        calls["scanner_options"] = scanner_options
        return rd.range(1)

    monkeypatch.setattr(T, "HAVE_LANCE", True)
    monkeypatch.setattr(T.rd, "read_lance", fake_read_lance)
    expr = pads.field("image_id") >= 0
    ds = T.read_table("/data/corpus.lance", columns=["image_id"],
                      filter_expr=expr)
    assert calls["uri"] == "/data/corpus.lance"
    assert calls["columns"] == ["image_id"]
    assert calls["scanner_options"]["filter"].equals(expr)
    assert ds.count() == 1

    # non-lance path with the package "present" still reads parquet
    out = T.read_table(synth_dir, columns=["image_id"],
                       filter_expr=pads.field("image_id") != "")
    assert calls["uri"] == "/data/corpus.lance"  # fake not re-invoked
    assert out.count() > 0


def test_read_ipc_roundtrip(ray_session, tmp_path):
    """Feather/IPC files read back identical to the parquet source,
    with column pruning applied at the decode."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import feather

    from reddacted_ray.sources.tables import read_ipc

    src = pq.read_table("/root/testdata/sf0.001/nation.parquet")
    d = tmp_path / "ipc"
    d.mkdir()
    feather.write_feather(src.slice(0, 10), str(d / "a.arrow"))
    feather.write_feather(src.slice(10), str(d / "b.arrow"))
    got = (read_ipc(str(d), columns=["n_nationkey", "n_name"])
           .to_pandas().sort_values("n_nationkey").reset_index(drop=True))
    exp = (src.select(["n_nationkey", "n_name"]).to_pandas()
           .sort_values("n_nationkey").reset_index(drop=True))
    assert got.equals(exp)


def test_read_table_union_schema_evolution(ray_session, tmp_path):
    """Union-by-name across generations: old files missing a column get
    typed nulls; both branches emit the unified column order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from reddacted_ray.sources.tables import read_table_union

    old = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "txt": pa.array(["a", "b"])})
    new = pa.table({"id": pa.array([3], pa.int64()),
                    "txt": pa.array(["c"]),
                    "score": pa.array([0.5], pa.float64())})
    p1, p2 = str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet")
    pq.write_table(old, p1)
    pq.write_table(new, p2)
    got = (read_table_union([p1, p2]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert list(got.columns) == ["id", "txt", "score"]
    assert got["score"].isna().tolist() == [True, True, False]
    assert got["txt"].tolist() == ["a", "b", "c"]


def test_write_ipc_roundtrip(ray_session, tmp_path):
    """write_ipc -> read_ipc roundtrips a table exactly (values and
    schema), one file per non-empty block."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from reddacted_ray.sources.tables import read_ipc, write_ipc

    src = "/root/testdata/sf0.001/customer.parquet"
    ds = rd.read_parquet(src)
    out = str(tmp_path / "ipc_out")
    n = write_ipc(ds, out)
    exp = pq.read_table(src).to_pandas().sort_values(
        "c_custkey").reset_index(drop=True)
    got = (read_ipc(out).to_pandas().sort_values("c_custkey")
           .reset_index(drop=True)[list(exp.columns)])
    assert n == len(exp)
    assert got.equals(exp)


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.sources.tables import read_jsonl, write_jsonl

    t = pa.table({
        "id": pa.array([3, 1, 2], pa.int64()),
        "txt": pa.array(["a", 'b "quoted"', "c\nnewline"], pa.string()),
        "v": pa.array([1.5, -2.0, 0.0], pa.float64()),
    })
    out = str(tmp_path / "jl")
    n = write_jsonl(rd.from_arrow(t), out)
    assert n == 3
    back = (read_jsonl(out).to_pandas()
            .sort_values("id").reset_index(drop=True))
    exp = t.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["id", "txt", "v"]], exp,
                                  check_dtype=False)
    # append hazard: refuses a non-empty target
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        write_jsonl(rd.from_arrow(t), out)


def test_job_cli_rejects_resumable_for_corpus_and_compact(tmp_path):
    # r4 ADVICE #3: corpus/compact have no resumable implementation —
    # the old exemption let a rerun APPEND duplicate rows silently
    for mode in ("corpus", "compact"):
        proc = subprocess.run(
            [sys.executable, "-m", "reddacted_ray.job",
             "--input", str(tmp_path / "in"), "--output",
             str(tmp_path / "out"), "--mode", mode, "--resumable"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert proc.returncode == 2
        assert "not implemented" in proc.stderr


def test_read_write_orc_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.sources.tables import read_orc, write_orc

    t = pa.table({"k": pa.array(range(500), pa.int64()),
                  "s": pa.array([f"v{i}" for i in range(500)])})
    ds = rd.from_arrow(t).repartition(4)
    out = str(tmp_path / "orc")
    rows = write_orc(ds, out)
    assert rows == 500
    back = read_orc(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert back["k"].tolist() == list(range(500))
    # column pruning at the decode
    pruned = read_orc(out, columns=["k"]).to_pandas()
    assert list(pruned.columns) == ["k"]
    # append hazard guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_orc(ds, out)


def test_read_write_sqlite_roundtrip(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from reddacted_ray.sources.tables import read_sqlite, write_sqlite

    t = pa.table({
        "k": pa.array(range(1000), pa.int64()),
        "s": pa.array([f"v{i}" for i in range(1000)]),
        "x": pa.array(np.arange(1000) * 0.5, pa.float64()),
        "b": pa.array([bytes([i % 256, 7]) for i in range(1000)],
                      pa.binary()),
    })
    db = str(tmp_path / "t.db")
    rows = write_sqlite(rd.from_arrow(t).repartition(4), db, "tbl")
    assert rows == 1000
    back = (read_sqlite(db, "tbl").to_pandas()
            .sort_values("k").reset_index(drop=True))
    assert back["k"].tolist() == list(range(1000))
    assert back["s"].tolist() == [f"v{i}" for i in range(1000)]
    assert back["x"].tolist() == (np.arange(1000) * 0.5).tolist()
    assert back["b"].tolist() == [bytes([i % 256, 7])
                                  for i in range(1000)]
    # column pruning in the SQL projection + stable dtypes
    pruned = read_sqlite(db, "tbl", columns=["x", "k"])
    assert pruned.schema().names == ["x", "k"]
    assert pruned.count() == 1000
    # rowid ranges really partition (no dup/loss at partition seams)
    many = read_sqlite(db, "tbl", partitions=7).to_pandas()
    assert sorted(many["k"].tolist()) == list(range(1000))
    # append hazard guard
    with _pytest.raises(ValueError):
        write_sqlite(rd.from_arrow(t), db, "tbl")
    # missing table
    with _pytest.raises(ValueError):
        read_sqlite(db, "nope")


def test_job_cli_audit_mode(tmp_path):
    """--mode audit: read-only corpus health report over a documents
    table written as one json file; a rerun into the same file refuses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "docs")
    os.makedirs(d)
    texts = (["x" * 45 + " alpha", "x" * 45 + " beta", "short one",
              "y" * 60] * 3)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array((["en", "en", "de", "de"] * 3), pa.string()),
        "source": pa.array((["s1", "s2"] * 6), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    out = str(tmp_path / "audit.json")
    args = [sys.executable, "-m", "reddacted_ray.job", "--mode", "audit",
            "--input", d, "--output", out, "--num-cpus", "4"]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(args, capture_output=True, text=True, cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.load(open(out))
    assert {r["lang"] for r in rep["length_gate"]} == {"en", "de"}
    assert rep["dup_matrix_cells"] >= 1  # planted prefix-40 dups
    assert set(rep["split_leakage"]) == {
        "n_multi_clusters", "n_leaky_clusters", "n_holdout_leaked"}
    assert len(rep["lang_drift_top_pairs"]) >= 1
    # overwrite refusal
    p2 = subprocess.run(args, capture_output=True, text=True, cwd=cwd)
    assert p2.returncode == 2 and "already exists" in p2.stderr


def test_job_cli_catalog_mode(tmp_path):
    """--mode catalog: metadata-only catalog report (schemas, rows,
    footer bytes, candidate keys) into one json file; rerun refuses."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "snap")
    os.makedirs(d)
    for t in ("region nation customer supplier part orders lineitem"
              " events documents embeddings").split():
        shutil.copy(os.path.join(src, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"))
    out = str(tmp_path / "catalog.json")
    args = [sys.executable, "-m", "reddacted_ray.job", "--mode",
            "catalog", "--input", d, "--output", out,
            "--num-cpus", "4"]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(args, capture_output=True, text=True,
                          cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.load(open(out))
    assert len(rep["tables"]) == 10
    assert rep["total_rows"] > 0
    assert rep["total_compressed_bytes"] > 0
    keys = {r["combo"]: r["is_key"] for r in rep["order_keys"]}
    assert keys["orderkey"] == 1
    p2 = subprocess.run(args, capture_output=True, text=True,
                        cwd=cwd)
    assert p2.returncode == 2 and "already exists" in p2.stderr
