"""Single-process reference labeler — the correctness oracle.

A faithful, sequential reimplementation of the reference's analysis flow
(reference ``sentiment.py:176-323`` restated in SURVEY.md §3 E1):

    clean (F2 html-strip after F1 normalize) -> skip filter (F3) ->
    sentiment (F8/F9) -> PII (F5/F6) -> gate (replaces LLM, F10) ->
    risk merge (F11) -> keep/drop (F13) -> scrub (F7) -> aggregates (A1-A4)

The Ray Data pipeline (``reddacted_ray.pipelines.quality_filter``) must
reproduce these labels at F1 >= 0.99 (BASELINE.json north_rule); both import
the identical per-row cores from ``reddacted_ray.functions``, so agreement
is by construction and the tests verify it end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Optional

from .functions import pii as piimod
from .functions import sentiment as sentmod
from .functions.gate import GateBank
from .functions.pii import CompiledBank
from .functions.textnorm import normalize_text, strip_html_text
from .functions.textstats import TrigramLM, predict_lang

RISK_THRESHOLD = 0.5  # reference ``results.py:170-175``


@dataclass
class LabelerConfig:
    """Pipeline-parameter surface (reference config keys, SURVEY.md §1.5)."""

    skip_text: Optional[str] = None  # F3 marker; None = filter disabled
    pii_only: bool = False  # F12: keep only rows with any risk signal
    text_match: Optional[str] = None  # F4 substring keep-filter
    limit: int = 0  # 0 = unlimited (reference ``sentiment.py:56-58``)
    scrub_mode: str = "token"  # token | reference | uuid (reference K3)
    risk_threshold: float = RISK_THRESHOLD
    # SURVEY §4 error lineage: False = reference row-error policy (failing
    # rows silently skipped, sentiment.py:280-284); True = failing rows
    # stay in the output with an ``error`` column set (keep=False, neutral
    # scores) so lineage/manifest can count and list them
    emit_errors: bool = False


def scrub_payload(cfg: LabelerConfig, image_id: str) -> str | None:
    """Replacement payload per scrub mode (reference ``api/reddit.py:280-292``).

    ``uuid`` mode is the seeded analog of the reference's ``uuid.uuid4()``:
    ``uuid5(NAMESPACE_URL, image_id)`` so runs are reproducible
    (SURVEY.md §7.5 deterministic-scrub note). Returns None for token mode
    (span-level token replacement instead of whole-text)."""
    if cfg.scrub_mode == "reference":
        return piimod.REDACTION_MESSAGE
    if cfg.scrub_mode == "uuid":
        import uuid

        return str(uuid.uuid5(uuid.NAMESPACE_URL, image_id))
    return None


def label_row(
    caption: str,
    image_id: str,
    bank: CompiledBank,
    gate: GateBank,
    lm: TrigramLM,
    cfg: LabelerConfig,
) -> Optional[dict[str, Any]]:
    """Label one row; returns None if the row is filtered out (F3/F4)."""
    clean = strip_html_text(normalize_text(caption))
    if cfg.skip_text and cfg.skip_text in clean:
        return None  # F3 (reference sentiment.py:208-211)
    if cfg.text_match and cfg.text_match.lower() not in clean.lower():
        return None  # F4 (reference api/reddit.py:394-407)
    sentiment_score = sentmod.compound_score(clean)
    pii_risk, matches = bank.risk_score(clean)
    gate_flag, gate_risk = gate.score(clean)
    # F11 risk merge (reference sentiment.py:262-267)
    risk = max(pii_risk, gate_risk) if gate_flag else pii_risk
    # F13 keep/drop (reference results.py:170-175)
    keep = not (risk > cfg.risk_threshold or gate_flag)
    if keep:
        scrubbed = clean
    else:
        payload = scrub_payload(cfg, image_id)
        scrubbed = bank.scrub_spans(clean) if payload is None else payload
    lang, lang_conf = predict_lang(clean)
    return {
        "image_id": image_id,
        "caption_clean": clean,
        "sentiment_score": sentiment_score,
        "sentiment_label": sentmod.label(sentiment_score),
        "pii_risk_score": pii_risk,
        "pii_matches": [
            {"type": m.type, "value": m.value, "confidence": m.confidence}
            for m in matches
        ],
        # per-row lineage (SURVEY §1.7): which rule families fired
        "rule_hits": [m.type for m in matches] + (["gate"] if gate_flag else []),
        "gate_flag": gate_flag,
        "gate_risk": gate_risk,
        "risk_score": risk,
        "lang": lang,
        "lang_conf": lang_conf,
        "ppl": lm.perplexity(clean),
        "keep": keep,
        "caption_scrubbed": scrubbed,
    }


def label_rows(
    rows: Iterable[tuple[str, str]], cfg: LabelerConfig | None = None
) -> list[dict[str, Any]]:
    """Label (image_id, caption) pairs sequentially — the oracle run."""
    cfg = cfg or LabelerConfig()
    bank, gate, lm = CompiledBank(), GateBank(), TrigramLM()
    out = []
    n = 0
    for image_id, caption in rows:
        if cfg.limit and n >= cfg.limit:
            break
        try:
            r = label_row(caption, image_id, bank, gate, lm, cfg)
        except Exception:
            # reference row-error policy: skip the failing row and continue
            # (sentiment.py:280-284)
            continue
        if r is None:
            continue
        if cfg.pii_only and not (r["pii_risk_score"] > 0 or r["gate_flag"]):
            continue  # F12 (reference utils/report.py:50-63)
        out.append(r)
        n += 1
    return out


def report_aggregates(results: list[dict[str, Any]]) -> dict[str, Any]:
    """Driver-side report scalars A1-A4 (reference ``utils/report.py:109-193``,
    ``sentiment.py:309-323``)."""
    n = len(results)
    if n == 0:
        return {
            "num_rows": 0,
            "mean_sentiment": 0.0,
            "pii_rows": 0,
            "gate_rows": 0,
            "kept_rows": 0,
            "dropped_rows": 0,
            "max_risk": 0.0,
            "max_risk_image_id": None,
        }
    mean_sent = round(sum(r["sentiment_score"] for r in results) / n, 4)
    max_row = max(results, key=lambda r: (r["risk_score"], r["image_id"]))
    return {
        "num_rows": n,
        "mean_sentiment": mean_sent,
        "pii_rows": sum(1 for r in results if r["pii_risk_score"] > 0),
        "gate_rows": sum(1 for r in results if r["gate_flag"]),
        "kept_rows": sum(1 for r in results if r["keep"]),
        "dropped_rows": sum(1 for r in results if not r["keep"]),
        "max_risk": max_row["risk_score"],
        "max_risk_image_id": max_row["image_id"],
    }
