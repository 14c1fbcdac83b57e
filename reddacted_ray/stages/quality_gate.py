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
