"""Report aggregates over the scored dataset (A1-A4, SURVEY.md §2.5).

Small-result aggregates computed distributed, materialized only as scalars
on the driver (reference ``utils/report.py:109-193``, ``sentiment.py:309-323``).
"""

from __future__ import annotations

from typing import Any

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Sum


def aggregates(scored: rd.Dataset) -> dict[str, Any]:
    """A1 mean sentiment (round 4dp), A3 pii/gate counts, A4 max-risk + argmax,
    kept/dropped counts. One distributed aggregate pass + one tiny top-1 sort."""
    scored = scored.map_batches(_flag_columns, batch_format="pyarrow", zero_copy_batch=True)
    agg = scored.aggregate(
        Mean("sentiment_score", alias_name="mean_sentiment"),
        Count(alias_name="num_rows"),
        Sum("pii_flag", alias_name="pii_rows"),
        Sum("gate_int", alias_name="gate_rows"),
        Sum("keep_int", alias_name="kept_rows"),
        Max("risk_score", alias_name="max_risk"),
    )
    n = int(agg["num_rows"])
    # A4 argmax row: top-1 by (risk, image_id) — tiny k sort
    top = (
        scored.sort(["risk_score", "image_id"], descending=[True, True])
        .limit(1)
        .select_columns(["image_id"])
        .take(1)
    )
    return {
        "num_rows": n,
        "mean_sentiment": round(float(agg["mean_sentiment"]), 4) if n else 0.0,
        "pii_rows": int(agg["pii_rows"] or 0),
        "gate_rows": int(agg["gate_rows"] or 0),
        "kept_rows": int(agg["kept_rows"] or 0),
        "dropped_rows": n - int(agg["kept_rows"] or 0),
        "max_risk": float(agg["max_risk"]) if n else 0.0,
        "max_risk_image_id": top[0]["image_id"] if top else None,
    }


def _detail_section(rows: list[dict[str, Any]]) -> list[str]:
    """Per-row detail blocks (reference ``write_comment_details``,
    ``utils/report.py:75-106``): text, scores, per-match list, gate risk."""
    out: list[str] = []
    for i, r in enumerate(rows, 1):
        preview = r.get("caption_scrubbed") or r.get("caption_clean", "")
        if len(preview) > 100:
            preview = preview[:100] + "..."  # F15 riskiest-preview truncate
        out += [
            f"## Row {i}",
            "",
            f"**Text**: {preview}",
            "",
            f"- Sentiment Score: `{r['sentiment_score']:.2f}` ({r['sentiment_label']})",
            f"- PII Risk Score: `{r['pii_risk_score']:.2f}`",
            f"- Row ID: `{r['image_id']}`",
        ]
        if r.get("pii_matches"):
            out += ["", "### Pattern-based PII Detected"]
            out += [
                f"- **{m['type']}** (confidence: {m['confidence']:.2f})"
                for m in r["pii_matches"]
            ]
        if r.get("gate_flag"):
            out += ["", "### Gate Analysis",
                    f"- **Risk Score**: `{r['gate_risk']:.2f}`",
                    "- **Flagged**: Yes"]
        out.append("")
    out.append("---")
    return out


def write_markdown_report(
    agg: dict[str, Any],
    path: str,
    source_label: str = "",
    pii_only: bool = False,
    detail_rows: list[dict[str, Any]] | None = None,
) -> None:
    """K1 sink analog: the reference's markdown report
    (``utils/report.py:137-202``) — header, optional per-row detail
    sections (pass e.g. the top-k riskiest rows), summary aggregates."""
    lines = [
        "# PII Analysis Report",
        "",
        f"- Source: {source_label}",
        f"- Rows analyzed: {agg['num_rows']}",
        f"- PII-only filter: {pii_only}",
        "",
    ]
    if detail_rows:
        lines += _detail_section(detail_rows)
    lines += [
        "## Summary",
        "",
        f"- Overall sentiment score: {agg['mean_sentiment']}",
        f"- Rows with PII risk: {agg['pii_rows']}"
        f" ({100.0 * agg['pii_rows'] / max(1, agg['num_rows']):.1f}%)",
        f"- Rows flagged by gate: {agg['gate_rows']}",
        f"- Kept: {agg['kept_rows']}  Dropped: {agg['dropped_rows']}",
        f"- Max risk score: {agg['max_risk']}"
        f" (row {agg['max_risk_image_id']})",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _flag_columns(t):
    import pyarrow as pa
    import pyarrow.compute as pc

    t = t.append_column(
        "pii_flag", pc.cast(pc.greater(t["pii_risk_score"], 0.0), pa.int64())
    )
    t = t.append_column("gate_int", pc.cast(t["gate_flag"], pa.int64()))
    t = t.append_column("keep_int", pc.cast(t["keep"], pa.int64()))
    return t
