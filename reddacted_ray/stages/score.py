"""Fused scoring stage — the stateful actor-pool heart of the pipeline.

One ``map_batches`` callable class computes, per zero-copy Arrow batch:
sentiment (F8/F9), PII risk + matches (F5/F6), gate (LLM replacement),
risk merge (F11), language-ID + perplexity (ST4), keep/drop (F13) and the
scrub (F7). Fusing all scorers into ONE actor stage avoids re-materializing
rows per scorer (SURVEY.md §7.2 step 3) and amortizes all state builds
(regex banks, lexicon, trigram LM) across the actor's lifetime: state is
built once in ``__init__`` (reference rebuilt its analyzer per call,
``sentiment.py:183`` — an inefficiency we fix).

The per-string PII/sentiment cores retain their Python ``finditer``
multi-match semantics (not exactly vectorizable, SURVEY.md §2.8), but the
hot path is vectorized around them: one Arrow RE2 prefilter scan per signal
family masks out the rows that provably score zero (the overwhelming
majority), perplexity is one whole-column gather (``TrigramLM
.perplexity_batch``, shared with the oracle for bit parity), and language-ID
runs as Arrow count kernels. Only rows with actual signal pay the per-row
Python cost. Batches arrive zero-copy; the wide ``bytes`` column is passed
through untouched (never decoded here).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ..functions import sentiment as sentmod
from ..functions.gate import GateBank
from ..functions.pii import CompiledBank
from ..functions.textstats import TrigramLM
from ..oracle import LabelerConfig, scrub_payload
from ..schema import PII_MATCH_TYPE


_PROCESS_SCORERS: dict[str, "Scorer"] = {}


def make_scorer_fn(cfg=None, id_col: str = "image_id", text_col: str = "caption_clean"):
    """Stateless-task variant of the scorer stage.

    Ray reuses worker processes across tasks, so caching the compiled
    ``Scorer`` in a module-level dict gives actor-pool-style state
    amortization with plain-task elasticity — measured 1.7x faster
    end-to-end than an autoscaling actor pool here, because the task pool
    has no spin-up cliff (the pool served ~3 concurrent actors during the
    ramp; tasks saturate all CPUs immediately). Use the ``Scorer`` class
    with ``concurrency=`` instead when per-worker state is genuinely heavy
    (big models), where construction cost must be bounded by pool size.
    """
    key = f"{repr(cfg)}|{id_col}|{text_col}"

    def score_batch(batch: pa.Table) -> pa.Table:
        sc = _PROCESS_SCORERS.get(key)
        if sc is None:
            sc = _PROCESS_SCORERS[key] = Scorer(cfg, id_col, text_col)
        return sc(batch)

    return score_batch


class Scorer:
    """Callable for ``ds.map_batches(Scorer, concurrency=N, ...)``.

    Expects a ``caption_clean`` column (produced by the normalize stage);
    appends the analysis columns of ``schema.ANALYSIS_FIELDS``.
    """

    def __init__(
        self,
        cfg: Optional[LabelerConfig] = None,
        id_col: str = "image_id",
        text_col: str = "caption_clean",
    ) -> None:
        self.cfg = cfg or LabelerConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.bank = CompiledBank()
        self.gate = GateBank()
        self.lm = TrigramLM()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.textstats import LANG_ORDER, LANG_STOPWORDS

        cfg = self.cfg
        caps: list[str] = batch[self.text_col].to_pylist()
        ids: list[str] = [str(x) for x in batch[self.id_col].to_pylist()]
        n = len(caps)
        # language-ID counts vectorized in Arrow C++ (identical non-overlap
        # count semantics to the oracle's re.findall); argmax over
        # LANG_ORDER == the oracle's first-max tie-break
        low = pc.utf8_lower(batch[self.text_col])
        lang_counts = np.empty((len(LANG_ORDER), n), dtype=np.int64)
        for li, lang in enumerate(LANG_ORDER[:-1]):
            pat = r"\b(?:" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
            lang_counts[li] = pc.fill_null(
                pc.count_substring_regex(low, pat), 0
            ).to_numpy(zero_copy_only=False)
        lang_counts[-1] = pc.fill_null(
            pc.count_substring_regex(batch[self.text_col], "[一-鿿]"), 0
        ).to_numpy(zero_copy_only=False)
        # rows needing the exact Python path: non-ASCII (Unicode \b / digit /
        # casefold semantics) or non-string (row-error policy applies)
        exact_path = np.fromiter(
            (not (isinstance(s, str) and s.isascii()) for s in caps), bool, n
        )
        # Arrow/RE2 \b is ASCII-only while the oracle's Python re \b is
        # Unicode (e.g. 'für' adjacent to non-ASCII word chars counts
        # differently). Exact parity: recompute the rare non-ASCII rows with
        # the oracle's own per-row path.
        from ..functions.textstats import lang_scores as _lang_scores

        for i in np.nonzero(exact_path)[0]:
            if isinstance(caps[i], str):
                sc = _lang_scores(caps[i])
                for li, lang in enumerate(LANG_ORDER):
                    lang_counts[li, i] = sc[lang]
        lang_totals = lang_counts.sum(axis=0)
        lang_best_idx = lang_counts.argmax(axis=0)
        # --- vectorized prefilter masks (Arrow RE2, one C++ DFA scan per
        # signal family instead of a Python regex scan per row). Each mask is
        # a proven over-approximation of "this row can have a nonzero
        # signal": sentiment needs a delimited lexicon token, PII needs a
        # digit/@/title, the gate needs a disclosure/toxicity hit (RE2 \b
        # over-triggers vs Python's Unicode \b, never under-triggers, for
        # the banks' all-ASCII literals). Non-ASCII / non-string rows take
        # the exact per-row path (mask forced True) so Unicode digit /
        # casefold edge semantics stay oracle-identical.
        col = batch[self.text_col]

        def _mask(pattern: str) -> np.ndarray:
            m = pc.fill_null(
                pc.match_substring_regex(col, pattern, ignore_case=True), False
            ).to_numpy(zero_copy_only=False)
            return m | exact_path

        from ..functions.pii import PREFILTER_RE2 as PII_PREFILTER_RE2

        sent_hit = _mask(sentmod.PREFILTER_RE2)
        pii_hit = _mask(PII_PREFILTER_RE2)
        gate_hit = _mask(self.gate._any.pattern)
        # whole-column perplexity: one gather + segmented reduceat (the
        # oracle's per-row ``perplexity`` delegates to this same kernel, so
        # results are bit-identical regardless of batching)
        ppl = self.lm.perplexity_batch(caps)
        sent = np.zeros(n, dtype=np.float64)
        pii_risk = np.empty(n, dtype=np.float64)
        gate_flag = np.empty(n, dtype=bool)
        gate_risk = np.empty(n, dtype=np.float64)
        risk = np.empty(n, dtype=np.float64)
        keep = np.empty(n, dtype=bool)
        matches_col: list[list[dict[str, Any]]] = []
        rule_hits_col: list[list[str]] = []
        langs: list[str] = []
        lang_confs = np.empty(n, dtype=np.float64)
        scrubbed: list[str] = []
        error_rows: list[int] = []
        errors: list[Optional[str]] = []
        for i, (cid, text) in enumerate(zip(ids, caps)):
            row_error = None
            try:
                if sent_hit[i]:
                    sent[i] = sentmod.compound_score(text)
                if pii_hit[i]:
                    pr, ms = self.bank.risk_score(text)
                else:
                    pr, ms = 0.0, ()
                pii_risk[i] = pr
                row_matches = [
                    {"type": m.type, "value": m.value, "confidence": m.confidence}
                    for m in ms
                ]
                if gate_hit[i]:
                    gf, gr = self.gate.score(text)
                else:
                    gf, gr = False, 0.0
                gate_flag[i] = gf
                gate_risk[i] = gr
                r = max(pr, gr) if gf else pr
                risk[i] = r
                k = not (r > cfg.risk_threshold or gf)
                keep[i] = k
                if k:
                    row_scrubbed = text
                else:
                    payload = scrub_payload(cfg, cid)
                    row_scrubbed = (
                        self.bank.scrub_spans(text) if payload is None else payload
                    )
                if lang_totals[i] == 0:
                    row_lang = "und"
                    lang_confs[i] = 0.0
                else:
                    bi = int(lang_best_idx[i])
                    row_lang = LANG_ORDER[bi]
                    # same ints, same IEEE division, same Python round as the
                    # oracle's predict_lang — bit-identical confidence
                    lang_confs[i] = round(
                        int(lang_counts[bi, i]) / int(lang_totals[i]), 6
                    )
                row_hits = [m["type"] for m in row_matches] + (
                    ["gate"] if gf else []
                )
            except Exception as exc:
                # reference row-error policy: the failing row is skipped and
                # processing continues (sentiment.py:280-284). With
                # cfg.emit_errors the row instead STAYS as an error-lineage
                # row (SURVEY §4): keep=False, neutral scores, error set.
                error_rows.append(i)
                row_error = f"{type(exc).__name__}: {exc}"
                row_matches, row_lang, row_scrubbed, row_hits = [], "und", "", []
                sent[i] = 0.0
                pii_risk[i] = 0.0
                gate_flag[i] = False
                gate_risk[i] = 0.0
                risk[i] = 0.0
                keep[i] = False
                lang_confs[i] = 0.0
                ppl[i] = 0.0
            matches_col.append(row_matches)
            rule_hits_col.append(row_hits)
            langs.append(row_lang)
            scrubbed.append(row_scrubbed)
            errors.append(row_error)
        sent_label = np.where(sent == 0, "neu", np.where(sent > 0, "pos", "neg"))
        cols = {
            "sentiment_score": pa.array(sent),
            "sentiment_label": pa.array(sent_label.tolist(), pa.string()),
            "pii_risk_score": pa.array(pii_risk),
            "pii_matches": pa.array(matches_col, pa.list_(PII_MATCH_TYPE)),
            "rule_hits": pa.array(rule_hits_col, pa.list_(pa.string())),
            "gate_flag": pa.array(gate_flag),
            "gate_risk": pa.array(gate_risk),
            "risk_score": pa.array(risk),
            "lang": pa.array(langs, pa.string()),
            "lang_conf": pa.array(lang_confs),
            "ppl": pa.array(ppl),
            "keep": pa.array(keep),
            "caption_scrubbed": pa.array(scrubbed, pa.string()),
        }
        if cfg.emit_errors:
            cols["error"] = pa.array(errors, pa.string())
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        if error_rows and not cfg.emit_errors:
            mask = np.ones(n, dtype=bool)
            mask[error_rows] = False
            batch = batch.filter(pa.array(mask))
        return batch
