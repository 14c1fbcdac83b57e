"""Training-data quality gate — thresholds over the scorer's quality signals.

The quality_filter tier composes the reference-faithful PII/toxicity
keep/drop (F13, column ``keep``) with data-quality thresholds over the
graft's added signals (language-ID confidence, trigram-LM perplexity).
The gate emits a SEPARATE ``keep_quality`` column so F13 parity with the
reference labeler is never disturbed; filtering on it is opt-in.

Vectorized: one Arrow pass, no Python per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


@dataclass
class QualityGateConfig:
    allowed_langs: Optional[list[str]] = None  # None = any language
    max_ppl: Optional[float] = None  # None = no perplexity cap
    min_lang_conf: float = 0.0
    # Gopher-style repetition caps (Rae et al. 2021 §A1.1 analogs) over
    # ``text_col``: drop docs whose duplicate-word fraction or top-bigram
    # share exceeds the cap. None = no cap.
    max_dup_word_frac: Optional[float] = None
    max_top_bigram_share: Optional[float] = None
    # C4-style blocklist (Raffel et al. 2020 §2.2): drop docs containing
    # ANY of these tokens. None/[] = no blocklist.
    blocklist: Optional[list[str]] = None
    text_col: str = "caption_scrubbed"


def quality_mask(t: pa.Table, qcfg: QualityGateConfig):
    mask = t["keep"]
    if qcfg.allowed_langs is not None:
        mask = pc.and_(
            mask, pc.is_in(t["lang"], value_set=pa.array(qcfg.allowed_langs))
        )
    if qcfg.min_lang_conf > 0:
        mask = pc.and_(mask, pc.greater_equal(t["lang_conf"], qcfg.min_lang_conf))
    if qcfg.max_ppl is not None:
        mask = pc.and_(mask, pc.less_equal(t["ppl"], qcfg.max_ppl))
    if (qcfg.max_dup_word_frac is not None
            or qcfg.max_top_bigram_share is not None):
        import numpy as np

        from ..functions.textstats import repetition_counts

        lens, nd, top = repetition_counts(t[qcfg.text_col])
        ok = np.ones(len(lens), dtype=bool)
        if qcfg.max_dup_word_frac is not None:
            nw = np.maximum(lens, 1).astype(np.float64)
            ok &= (lens - nd) / nw <= qcfg.max_dup_word_frac
        if qcfg.max_top_bigram_share is not None:
            nbg = np.maximum(lens - 1, 1).astype(np.float64)
            ok &= top / nbg <= qcfg.max_top_bigram_share
        mask = pc.and_(mask, pa.array(ok))
    if qcfg.blocklist:
        from ..functions.textstats import blocklist_hits

        blocked = blocklist_hits(t[qcfg.text_col], pa.array(qcfg.blocklist))
        mask = pc.and_(mask, pa.array(~blocked))
    return mask


def apply_quality_gate(
    scored: rd.Dataset, qcfg: QualityGateConfig, drop: bool = False
) -> rd.Dataset:
    """Append ``keep_quality``; with ``drop=True`` also filter to survivors."""

    def gate(t: pa.Table) -> pa.Table:
        mask = quality_mask(t, qcfg)
        t = t.append_column("keep_quality", mask)
        return t.filter(mask) if drop else t

    return scored.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
