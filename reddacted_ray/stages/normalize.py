"""Stateless normalize/filter stage (F1-F4) — vectorized Arrow kernels.

Adds ``caption_clean`` (F1 whitespace/entity normalize + F2 HTML strip) and
applies the optional F3 skip-text / F4 text-match row filters inside the
same batch pass (filtering inside ``map_batches`` beats per-row
``ds.filter``; the streaming executor fuses this with adjacent map stages).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textnorm import contains_mask, normalize_array, strip_html_array


def make_normalize_fn(
    text_col: str = "caption",
    skip_text: Optional[str] = None,
    text_match: Optional[str] = None,
    out_col: str = "caption_clean",
):
    """Build the batch fn for ``ds.map_batches(fn, batch_format="pyarrow")``."""

    def normalize_batch(batch: pa.Table) -> pa.Table:
        clean = strip_html_array(normalize_array(batch[text_col]))
        if out_col == text_col:
            batch = batch.set_column(
                batch.schema.get_field_index(out_col), out_col, clean
            )
        else:
            batch = batch.append_column(out_col, clean)
        mask = None
        if skip_text:
            mask = pc.invert(contains_mask(batch[out_col], skip_text))
        if text_match:
            m2 = contains_mask(batch[out_col], text_match, ignore_case=True)
            mask = m2 if mask is None else pc.and_(mask, m2)
        if mask is not None:
            batch = batch.filter(mask)
        return batch

    return normalize_batch
