"""Canonical Arrow schemas for the engine (SURVEY.md §1.7)."""

from __future__ import annotations

import pyarrow as pa

# Input table (authoritative, from BASELINE.json input_hint).
IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr", pa.int32()),
        ("n_samples", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("afp", pa.int64()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("n_frames", pa.int32()),
        ("fps", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("vfp", pa.int64()),
    ]
)

PII_MATCH_TYPE = pa.struct(
    [("type", pa.string()), ("value", pa.string()), ("confidence", pa.float64())]
)

# The reference's per-row LLM response shape (``llm_detector.py:20-26``):
# a nested semi-structured column the engine carries end-to-end
# (struct<..., list<struct>> through map_batches, shuffles and parquet).
FINDINGS_TYPE = pa.struct(
    [
        ("has_pii", pa.bool_()),
        ("confidence", pa.float64()),
        (
            "details",
            pa.list_(
                pa.struct([("type", pa.string()), ("example", pa.string())])
            ),
        ),
        ("reasoning", pa.string()),
        ("risk_factors", pa.list_(pa.string())),
    ]
)

# Columns appended by the quality-filter pipeline (reference semantics 1:1,
# see SURVEY.md §1.7 output schema).
ANALYSIS_FIELDS = [
    ("sentiment_score", pa.float64()),
    ("sentiment_label", pa.string()),
    ("pii_risk_score", pa.float64()),
    ("pii_matches", pa.list_(PII_MATCH_TYPE)),
    ("rule_hits", pa.list_(pa.string())),  # per-row lineage (SURVEY §1.7)
    ("gate_flag", pa.bool_()),
    ("gate_risk", pa.float64()),
    ("risk_score", pa.float64()),
    ("lang", pa.string()),
    ("lang_conf", pa.float64()),
    ("ppl", pa.float64()),
    ("keep", pa.bool_()),
    ("caption_scrubbed", pa.string()),
]

OUTPUT_SCHEMA = pa.schema(list(IMAGES_SCHEMA) + [pa.field(n, t) for n, t in ANALYSIS_FIELDS])
