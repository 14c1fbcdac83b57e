"""End-to-end conformance: Ray quality-filter pipeline vs the oracle labeler.

This is the BASELINE.json correctness gate: keep/drop F1 >= 0.99 (here:
exact agreement, since pipeline and oracle share the same cores), scrubbed
caption equality per row, and the decoded-pixel invariant (exact for png,
PSNR >= 40 dB for the lossy format)."""

import numpy as np
import pyarrow.dataset as pads
import pytest

from reddacted_ray.imaging import decode, psnr
from reddacted_ray.oracle import LabelerConfig, label_rows, report_aggregates
from reddacted_ray.pipelines.quality_filter import build, write_output
from reddacted_ray.pipelines.report import aggregates

CFG = LabelerConfig(skip_text="This comment has been reddacted")


@pytest.fixture(scope="module")
def scored_and_oracle(ray_session, synth_dir):
    ds = build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 4))
    out = ds.to_pandas()
    src = pads.dataset(synth_dir, format="parquet").to_table()
    oracle = {
        r["image_id"]: r
        for r in label_rows(
            zip(src["image_id"].to_pylist(), src["caption"].to_pylist()), CFG
        )
    }
    return out, oracle, src


def test_row_counts_match(scored_and_oracle):
    out, oracle, _ = scored_and_oracle
    assert len(out) == len(oracle) > 0


def test_keep_drop_f1(scored_and_oracle):
    out, oracle, _ = scored_and_oracle
    tp = fp = fn = 0
    agree = 0
    for row in out.itertuples():
        o = oracle[row.image_id]
        if row.keep == o["keep"]:
            agree += 1
        # F1 on the "drop" (positive = risky) class
        if not row.keep and not o["keep"]:
            tp += 1
        elif not row.keep and o["keep"]:
            fp += 1
        elif row.keep and not o["keep"]:
            fn += 1
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    assert agree == len(out)
    assert f1 >= 0.99
    assert tp > 0  # the synthetic table must actually exercise drops


def test_scores_and_scrub_exact(scored_and_oracle):
    out, oracle, _ = scored_and_oracle
    for row in out.itertuples():
        o = oracle[row.image_id]
        assert row.caption_scrubbed == o["caption_scrubbed"], row.image_id
        assert row.sentiment_score == o["sentiment_score"]
        assert row.pii_risk_score == o["pii_risk_score"]
        assert row.risk_score == o["risk_score"]
        assert row.gate_flag == o["gate_flag"]
        assert row.lang == o["lang"]
        assert row.ppl == o["ppl"]
        assert [m["type"] for m in row.pii_matches] == [
            m["type"] for m in o["pii_matches"]
        ]
        assert list(row.rule_hits) == o["rule_hits"]


def test_pixels_pass_through_unchanged(scored_and_oracle, synth_dir):
    out, _, src = scored_and_oracle
    src_bytes = dict(zip(src["image_id"].to_pylist(), src["bytes"].to_pylist()))
    src_fmt = dict(zip(src["image_id"].to_pylist(), src["fmt"].to_pylist()))
    sample = out.iloc[:: max(1, len(out) // 50)]
    for row in sample.itertuples():
        blob = bytes(row.bytes)
        assert blob == src_bytes[row.image_id]  # bytes untouched end-to-end
        orig = decode(src_bytes[row.image_id], src_fmt[row.image_id])
        got = decode(blob, row.fmt)
        if row.fmt == "png":
            assert np.array_equal(orig, got)
        else:
            assert psnr(orig, got) == float("inf")  # same encoded payload


def test_report_aggregates_match_oracle(ray_session, synth_dir, scored_and_oracle):
    _, oracle, _ = scored_and_oracle
    ds = build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 4))
    got = aggregates(ds)
    exp = report_aggregates(list(oracle.values()))
    assert got == exp


def test_pii_only_filter(ray_session, synth_dir, scored_and_oracle):
    _, oracle, _ = scored_and_oracle
    cfg = LabelerConfig(skip_text=CFG.skip_text, pii_only=True)
    n = build(synth_dir, cfg=cfg, batch_size=256, concurrency=(1, 4)).count()
    exp = sum(1 for r in oracle.values() if r["pii_risk_score"] > 0 or r["gate_flag"])
    assert n == exp


def test_write_output_partitioned(ray_session, synth_dir, tmp_path):
    ds = build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 4))
    out_dir = str(tmp_path / "out")
    write_output(ds, out_dir)
    back = pads.dataset(out_dir, format="parquet").to_table()
    assert back.num_rows == ds.count()
    assert "caption_scrubbed" in back.schema.names


def test_quality_gate_composition(ray_session, synth_dir, scored_and_oracle):
    from reddacted_ray.stages.quality_gate import QualityGateConfig, apply_quality_gate

    _, oracle, _ = scored_and_oracle
    ds = build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 4))
    qcfg = QualityGateConfig(allowed_langs=["en", "und"], max_ppl=30.0)
    out = apply_quality_gate(ds, qcfg).to_pandas()
    for row in out.itertuples():
        o = oracle[row.image_id]
        exp = o["keep"] and o["lang"] in ("en", "und") and o["ppl"] <= 30.0
        assert row.keep_quality == exp, row.image_id
    assert out["keep_quality"].sum() < out["keep"].sum()  # gate actually bites
    n_drop = apply_quality_gate(
        build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 4)), qcfg, drop=True
    ).count()
    assert n_drop == int(out["keep_quality"].sum())


def test_quality_gate_repetition_and_blocklist(ray_session, synth_dir):
    """The Gopher-repetition caps and C4 blocklist knobs must match a
    pure-Python per-row reference over the scrubbed caption."""
    from reddacted_ray.stages.quality_gate import (
        QualityGateConfig,
        apply_quality_gate,
    )

    ds = build(synth_dir, cfg=CFG, batch_size=256, concurrency=(1, 4))
    qcfg = QualityGateConfig(max_dup_word_frac=0.4, max_top_bigram_share=0.5,
                             blocklist=["the", "ssn"])
    out = apply_quality_gate(ds, qcfg).to_pandas()

    def ref_ok(text: str, keep: bool) -> bool:
        ws = text.split(" ")
        n, nd = len(ws), len(set(ws))
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        top = max((bgs.count(b) for b in set(bgs)), default=0)
        ok = keep
        ok = ok and (n - nd) / max(n, 1) <= 0.4
        ok = ok and top / max(n - 1, 1) <= 0.5
        ok = ok and not any(w in ("the", "ssn") for w in ws)
        return ok

    got = out["keep_quality"].to_numpy()
    want = [ref_ok(r.caption_scrubbed, bool(r.keep)) for r in out.itertuples()]
    assert got.tolist() == want
    assert 0 < sum(want) < len(want)  # both branches exercised


def test_apply_decisions_closes_decide_loop(ray_session, synth_dir):
    """Decide-mode phase 2: joining the decision table back onto the
    full-byte table must reproduce exactly the kept rows of a
    materialize-mode run — same ids, same untouched bytes, and the caption
    column now carries the scrubbed text."""
    from reddacted_ray.pipelines.quality_filter import apply_decisions

    decisions = build(synth_dir, cfg=CFG, mode="decide", batch_size=256)
    out = apply_decisions(synth_dir, decisions, num_partitions=4).to_pandas()
    mat = build(synth_dir, cfg=CFG, mode="materialize", batch_size=256).to_pandas()
    kept = mat[mat["keep"]]
    assert sorted(out["image_id"]) == sorted(kept["image_id"])
    m = kept.set_index("image_id")
    o = out.set_index("image_id")
    sample = o.index[:: max(1, len(o) // 100)]
    for iid in sample:
        assert bytes(o.loc[iid, "bytes"]) == bytes(m.loc[iid, "bytes"])
        assert o.loc[iid, "caption"] == m.loc[iid, "caption_scrubbed"]


def test_build_time_filter_on_images(ray_session, tmp_path):
    """The job-level time_filter path: build() pushes the trailing-window
    predicate to the scan when the images table carries created_utc."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from reddacted_ray.schema import IMAGES_SCHEMA

    base = dt.datetime(2026, 8, 17, 12, 0, 0)
    ages = [dt.timedelta(hours=2), dt.timedelta(days=2), dt.timedelta(days=100)]
    t = pa.table(
        {
            "image_id": pa.array(["x0", "x1", "x2"]),
            "bytes": pa.array([b""] * 3, pa.binary()),
            "w": pa.array([1] * 3, pa.int32()),
            "h": pa.array([1] * 3, pa.int32()),
            "fmt": pa.array(["raw"] * 3),
            "caption": pa.array(["one fine", "two fine", "three fine"]),
            "phash": pa.array([0] * 3, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    ).append_column("created_utc", pa.array([base - a for a in ages],
                                            pa.timestamp("us")))
    p = tmp_path / "timed.parquet"
    pq.write_table(t, str(p))
    out = build(str(p), cfg=LabelerConfig(), time_filter="week",
                now=base, batch_size=2).to_pandas()
    assert sorted(out["image_id"]) == ["x0", "x1"]
    assert "created_utc" not in out.columns
