"""End-to-end corpus assembly: the composition a training-data team
actually runs over a raw web crawl — quality gate -> exact dedup ->
per-source quota cap -> temperature mix — built entirely from the
engine's existing stages and deterministic end to end (md5 thresholds,
min-id survivors, integer gates), so a rerun reproduces the corpus
bit-for-bit.

Scale shape: the gate is a scan map; dedup is one 8-byte-key exchange;
survivor ids flow back through the size-policied adaptive semi-join
(broadcast under the 2M cap, Bloom+left_semi past it); the cap is one
co-locating source bucket shuffle; the mix is a zero-shuffle scan
filter against |sources| broadcast thresholds. Nothing fact-sized ever
reaches the driver.

Reference parity: graft addition (task brief: LLM training-data
pipeline operators); no analog in the reference CLI.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import md5_top32_batch
from ..functions.textstats import repetition_batch
from ..sources.tables import sf_table
from ..stages.dedup import exact_dedup
from ..stages.joins import adaptive_semi_join
from ..stages.windows import grouped_vectorized, per_group_head_prune


@dataclass
class CorpusConfig:
    min_words: int = 5
    max_dup_word_frac: float = 0.5
    cap_per_source: int = 100
    mix_k: int = 20  # temperature constant: keep ~k*sqrt(n)/n per source


def assemble_corpus(sf_dir: str,
                    cfg: CorpusConfig | None = None) -> rd.Dataset:
    """documents -> gated, deduped, capped, mixed corpus (full rows +
    `rn` source rank lineage)."""
    cfg = cfg or CorpusConfig()
    docs = sf_table(sf_dir, "documents",
                    columns=["doc_id", "text", "lang", "source"])

    min_words = cfg.min_words
    max_frac = cfg.max_dup_word_frac

    def gate(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        stats = repetition_batch(
            pa.table({"doc_id": t["doc_id"], "text": txt}))
        nw = stats["n_words"].to_numpy()
        frac = stats["dup_word_frac"].to_numpy()
        mask = (nw >= min_words) & (frac <= max_frac)
        return t.filter(pa.array(mask))

    # materialize: three consumers below (dedup pass, semi-join fact
    # side, and the dim probe) — a lazy ds would re-run the gate scan
    gated = docs.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    # exact dedup: min-doc_id survivor per text body (8-byte-key
    # exchange); survivors rejoin by id through the adaptive policy
    survivors = exact_dedup(gated, "text", "doc_id")
    deduped = adaptive_semi_join(gated, "doc_id",
                                 survivors, "doc_id")

    cap = cfg.cap_per_source

    def capper(g):
        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        rn = g.groupby("source", sort=False).cumcount() + 1
        out = g[rn <= cap].copy()
        out["rn"] = rn[rn <= cap].astype(np.int64)
        return out

    # per-block head prune bounds one dominant source's shuffle mass to
    # cap x blocks rows (r5 VERDICT #2); lossless for the global cap
    pruned = per_group_head_prune(deduped, "source", "doc_id", cap)
    capped = grouped_vectorized(pruned, "source", capper).materialize()

    # temperature mix: per-source keep fraction f = min(1, k*isqrt(n)/n)
    # (integer sqrt -> identical doubles everywhere), row survives iff
    # md5(doc_id) top-32 < threshold — the split_train_test idiom.
    # Thresholds are INTEGERS (r5 VERDICT #6): comparing the uint32
    # hash value against floor(f * 2^32) is exactly the old 8-hex-char
    # lexicographic compare (md5_top32_batch docstring), with the
    # t >= 2^32 keep-all case naturally ordered above every hash.
    from ray.data.aggregate import Count as _Cnt

    counts = (capped.groupby("source")
              .aggregate(_Cnt(alias_name="n")).to_pandas())
    thr: dict[str, int] = {}
    for src, n in zip(counts["source"], counts["n"].astype(int)):
        f = min(1.0, (float(cfg.mix_k) * float(math.isqrt(int(n))))
                / float(n))
        thr[src] = min(int(math.floor(f * 4294967296.0)), 2**32)
    srcs = pa.array(sorted(thr))
    bounds = pa.array([thr[s] for s in sorted(thr)], pa.int64())

    def mix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = md5_top32_batch(t["doc_id"]).astype(np.int64)
        b = pc.take(bounds, pc.index_in(t["source"], value_set=srcs))
        return t.filter(pa.array(h < b.to_numpy(zero_copy_only=False)))

    return capped.map_batches(mix, batch_format="pyarrow",
                              zero_copy_batch=True)


def corpus_summary(corpus: rd.Dataset) -> rd.Dataset:
    """Per (source, lang) manifest of the assembled corpus: docs,
    whitespace tokens, chars — the mix report that ships with a corpus
    release. One |sources x langs|-bounded exchange."""
    from ..stages.agg import grouped_sums

    def stats(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t["text"], pa.string()),
                           "").combine_chunks()
        toks = pc.list_value_length(pc.split_pattern(txt, " "))
        return pa.table({
            "source": t["source"],
            "lang": t["lang"],
            "n_words": pc.cast(toks, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return grouped_sums(
        corpus.map_batches(stats, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["source", "lang"], ["n_words", "n_chars"],
        count_alias="n_docs")
