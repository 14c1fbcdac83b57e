"""Text-analysis stages over a documents table (graft additions: language-ID,
quality scoring, token counting, fingerprinting, perplexity).

One fused actor stage computes all per-doc text statistics in a single
pass (state — compiled regexes + trigram LM — loads once per actor)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.textstats import (
    TrigramLM,
    fingerprint_md5,
    predict_lang,
    quality_stats,
    token_count_bpe,
    token_count_ws,
)


class TextStats:
    """Append lang, lang_conf, quality ratios, token counts, fingerprint, ppl."""

    def __init__(self, text_col: str = "text", with_ppl: bool = True) -> None:
        self.text_col = text_col
        self.lm = TrigramLM() if with_ppl else None

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        n = len(texts)
        langs, confs = [], np.empty(n)
        punct = np.empty(n)
        alpha = np.empty(n)
        stopr = np.empty(n)
        mtl = np.empty(n)
        tws = np.empty(n, dtype=np.int64)
        tbpe = np.empty(n, dtype=np.int64)
        fps = []
        # whole-column perplexity: one gather + segmented reduceat
        ppls = (
            self.lm.perplexity_batch(texts)
            if self.lm
            else np.zeros(n, dtype=np.float64)
        )
        for i, s in enumerate(texts):
            lg, c = predict_lang(s)
            langs.append(lg)
            confs[i] = c
            q = quality_stats(s)
            punct[i] = q["punct_ratio"]
            alpha[i] = q["alpha_ratio"]
            stopr[i] = q["stopword_ratio"]
            mtl[i] = q["mean_token_len"]
            tws[i] = token_count_ws(s)
            tbpe[i] = token_count_bpe(s)
            fps.append(fingerprint_md5(s))
        for name, arr in [
            ("pred_lang", pa.array(langs, pa.string())),
            ("pred_lang_conf", pa.array(confs)),
            ("punct_ratio", pa.array(punct)),
            ("alpha_ratio", pa.array(alpha)),
            ("stopword_ratio", pa.array(stopr)),
            ("mean_token_len", pa.array(mtl)),
            ("n_tokens_ws", pa.array(tws)),
            ("n_tokens_bpe", pa.array(tbpe)),
            ("fingerprint", pa.array(fps, pa.string())),
            ("ppl", pa.array(ppls)),
        ]:
            t = t.append_column(name, arr)
        return t


def text_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    with_ppl: bool = True,
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> rd.Dataset:
    from . import process_cached

    return ds.map_batches(
        process_cached(TextStats, text_col=text_col, with_ppl=with_ppl),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
