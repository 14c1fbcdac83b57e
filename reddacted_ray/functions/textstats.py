"""Text-analysis scalar functions: language-ID, quality scores, token counts,
document fingerprints, and a KenLM-style character n-gram perplexity model.

These are the large-scale training-data-pipeline additions layered on top of
the reference's operator set (SURVEY.md §2 graft additions; north_star:
"fastText language-ID, KenLM-style n-gram perplexity scoring"). fastText /
KenLM are not available in this environment, so:

  * language-ID is a deterministic stopword/charset profile heuristic,
    deliberately designed to be expressible in ANSI SQL (DuckDB
    ``regexp_extract_all`` counts) so the driver can oracle-check parity;
  * perplexity is a self-contained character-trigram LM with add-k
    smoothing trained once per worker on an embedded seed corpus
    (KenLM-style in spirit: n-gram counts + backoff-free smoothing) —
    not SQL-expressible, covered by rows-only checks + unit tests.

All functions are deterministic and shared by the oracle labeler and the
Ray stages.
"""

from __future__ import annotations

import hashlib
import math
import re

# ---------------------------------------------------------------------------
# Language ID (SQL-parity design: per-language stopword occurrence counts,
# argmax with fixed tie-break order; "zh" scored by CJK char count).
# ---------------------------------------------------------------------------

LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour", "que", "pas"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por", "como"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break order
CJK_RE = re.compile(r"[一-鿿]")

_LANG_RES = {
    lang: re.compile(r"\b(?:" + "|".join(words) + r")\b")
    for lang, words in LANG_STOPWORDS.items()
}


def lang_scores(text: str) -> dict[str, int]:
    low = text.lower()
    scores = {lang: len(rx.findall(low)) for lang, rx in _LANG_RES.items()}
    # CJK scan only when non-ASCII bytes can exist (pure optimization)
    scores["zh"] = 0 if text.isascii() else len(CJK_RE.findall(text))
    return scores


def predict_lang(text: str) -> tuple[str, float]:
    """Return (lang, confidence). Unknown/empty -> ("und", 0.0).

    confidence = best_count / total_counts, rounded to 6 dp (matches the
    SQL oracle's ROUND(...,6)).
    """
    scores = lang_scores(text)
    total = sum(scores.values())
    if total == 0:
        return "und", 0.0
    best = max(LANG_ORDER, key=lambda l: (scores[l], -LANG_ORDER.index(l)))
    return best, round(scores[best] / total, 6)


# ---------------------------------------------------------------------------
# Quality scores (SQL-parity design; every ratio ROUND(...,6)).
# ---------------------------------------------------------------------------

_WS_TOKEN_RE = re.compile(r"\S+")
_BPE_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_PUNCT_RE = re.compile(r"[^\w\s]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_EN_STOP_RE = _LANG_RES["en"]


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(_WS_TOKEN_RE.findall(text))


def token_count_bpe(text: str) -> int:
    """BPE-ish token count: alpha runs + digit runs + single punctuation."""
    return len(_BPE_TOKEN_RE.findall(text))


def quality_stats(text: str) -> dict[str, float]:
    """Length / punctuation / stopword / alpha ratios (quality-filter signals)."""
    n_chars = len(text)
    toks = _WS_TOKEN_RE.findall(text)
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    n_alpha = len(_ALPHA_RE.findall(text))
    n_stop = len(_EN_STOP_RE.findall(text.lower()))
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "punct_ratio": round(n_punct / n_chars, 6) if n_chars else 0.0,
        "alpha_ratio": round(n_alpha / n_chars, 6) if n_chars else 0.0,
        "stopword_ratio": round(n_stop / n_tokens, 6) if n_tokens else 0.0,
        "mean_token_len": round(mean_tok, 6),
    }


def fingerprint_md5(text: str) -> str:
    """Document fingerprint: md5 hex of the text (DuckDB ``md5()`` parity)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# KenLM-style char-trigram perplexity
# ---------------------------------------------------------------------------

_SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "a photo of a cat sitting on a wooden table near the window. "
    "sunset over the mountains with orange clouds in the sky. "
    "two people walking along the beach at low tide in the morning. "
    "a close up view of a red flower with green leaves after rain. "
    "children playing football in the park on a sunny afternoon. "
    "an old street with brick houses and parked cars on both sides. "
    "fresh bread and coffee on a kitchen counter next to a bowl of fruit. "
    "the city skyline at night reflected in the calm river water. "
    "a dog running through tall grass chasing a yellow ball. "
    "query scan filter join group order sort merge hash table column row "
    "batch stream window key value data part customer line spark big small "
    "fast slow agg vector the a "
)


class TrigramLM:
    """Byte-trigram language model with add-k smoothing, fully vectorized.

    Build once per worker (actor ``__init__``): trigram/bigram counts over
    the seed corpus are folded into two dense log-probability tables
    indexed by packed byte-trigram codes, so scoring a document is one
    numpy gather + sum (no per-char Python loop). Lower perplexity ⇒ more
    natural text (quality signal; north_star's "KenLM-style n-gram
    perplexity scoring"). Bytes outside the corpus alphabet share one
    "unknown" bucket (count 0 ⇒ the smoothed floor probability).
    """

    __slots__ = ("vocab", "k", "A", "lut", "tableD", "lut32")

    def __init__(self, corpus: str = _SEED_CORPUS, k: float = 0.1) -> None:
        import numpy as np

        self.k = k
        data = ("  " + corpus.lower()).encode("utf-8")
        present = sorted(set(data))
        self.A = len(present) + 1  # +1 unknown bucket
        lut = np.full(256, len(present), dtype=np.int64)
        for i, b in enumerate(present):
            lut[b] = i
        self.lut = lut
        arr = lut[np.frombuffer(data, dtype=np.uint8)]
        A = self.A
        k2 = arr[:-1] * A + arr[1:]
        k3 = (arr[:-2] * A + arr[1:-1]) * A + arr[2:]
        bi = np.bincount(k2, minlength=A * A).astype(np.float64)
        tri = np.bincount(k3, minlength=A * A * A).astype(np.float64)
        self.vocab = len(present) + 1
        # tableD[k3] == log((tri+k)/(bi+k*V)) for that trigram
        self.tableD = np.log(tri + k) - np.log(bi.repeat(A) + k * self.vocab)
        # int32 code path halves memory traffic in the batch kernel
        self.lut32 = lut.astype(np.int32)

    def logprob(self, text: str) -> float:
        import numpy as np

        data = ("  " + text.lower()).encode("utf-8")
        if len(data) < 3:
            return 0.0
        arr = self.lut[np.frombuffer(data, dtype=np.uint8)]
        k3 = (arr[:-2] * self.A + arr[1:-1]) * self.A + arr[2:]
        return float(self.tableD[k3].sum())

    def perplexity_batch(self, texts) -> "np.ndarray":
        """Score a whole column in one numpy gather (the Ray-batch kernel).

        All texts are concatenated into one byte buffer; per-row log-prob
        sums are segmented ``np.add.reduceat`` calls whose result depends
        only on the row's own trigrams — so batching composition cannot
        perturb a row's float result, and ``perplexity`` (the oracle's
        per-row entry point) delegates here for bit-identical parity
        between the distributed stage and the sequential labeler.
        Non-string rows score as empty (the pipeline's row-error policy
        drops them via the detector path before ppl is ever read).
        """
        import numpy as np

        n = len(texts)
        out = np.full(n, float(self.vocab), dtype=np.float64)
        datas = []
        lens = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            b = ("  " + t.lower()).encode("utf-8") if isinstance(t, str) and t else b""
            datas.append(b)
            lens[i] = len(b)
        if not lens.any():
            return out
        # 2 sentinel bytes keep every segment end index < len(k3)
        buf = b"".join(datas) + b"  "
        arr = self.lut32[np.frombuffer(buf, dtype=np.uint8)]
        A = np.int32(self.A)
        k3 = arr[:-2] * (A * A)
        k3 += arr[1:-1] * A
        k3 += arr[2:]
        vals = self.tableD[k3]
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        live = np.nonzero(lens)[0]
        counts = lens[live] - 2  # trigrams per live row, always >= 1
        # interleaved [start, end) pairs; cross-row trigram positions fall in
        # the 2-slot gaps between segments and are never summed
        inter = np.empty(2 * len(live), dtype=np.int64)
        inter[0::2] = offs[live]
        inter[1::2] = offs[live] + counts
        sums = np.add.reduceat(vals, inter)[0::2]
        # IEEE division is correctly rounded (batch == scalar bitwise);
        # math.exp keeps the historical per-row semantics exactly
        out[live] = [round(math.exp(x), 4) for x in (-sums / counts).tolist()]
        return out

    def perplexity(self, text: str) -> float:
        if not text:
            return float(self.vocab)
        return float(self.perplexity_batch([text])[0])


# ---------------------------------------------------------------------------
# Repetition quality signals (Gopher-style, Rae et al. 2021 §A1.1 analogs
# for a whitespace word-stream corpus): duplicate-word fraction and
# top-bigram share per document. Fully batched — one Arrow split/flatten
# per batch, per-doc distinct/bigram counting via Arrow hash aggregation
# over (doc, token) pair tables; no Python loop over rows or tokens.
# ---------------------------------------------------------------------------


def repetition_counts(texts):
    """Per-doc integer repetition counts over a string array/chunked
    array: (n_words, n_distinct, top_bigram_count) numpy int64 arrays."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # Null text -> "" (a null list's length is null, which would turn
    # lens into float64 NaN and crash np.repeat); "" splits to [""],
    # counting as one word of zero repetition — same as empty text.
    words = pc.split_pattern(pc.fill_null(texts, ""), " ")
    lens = pc.cast(pc.list_value_length(words), pa.int64()).to_numpy(
        zero_copy_only=False)
    n = len(lens)
    flat = pc.list_flatten(words).combine_chunks()
    didx = np.repeat(np.arange(n, dtype=np.int64), lens)

    uniq = pa.table({"d": didx, "w": flat}).group_by(["d", "w"]).aggregate([])
    per_doc = uniq.group_by(["d"]).aggregate([("w", "count")])
    nd = np.zeros(n, dtype=np.int64)
    nd[per_doc["d"].to_numpy()] = per_doc["w_count"].to_numpy()

    # consecutive-token bigrams: shift the flat token column by one and
    # mask doc boundaries — no per-doc slicing
    total = len(flat)
    top = np.zeros(n, dtype=np.int64)
    if total > 1:
        left, right = flat.slice(0, total - 1), flat.slice(1)
        same = didx[:-1] == didx[1:]
        bg = pc.binary_join_element_wise(left, right, " ")
        bt = pa.table({
            "d": didx[:-1][same],
            "b": pc.filter(bg, pa.array(same)),
        })
        bc = bt.group_by(["d", "b"]).aggregate([("b", "count")])
        mx = bc.group_by(["d"]).aggregate([("b_count", "max")])
        top[mx["d"].to_numpy()] = mx["b_count_max"].to_numpy()
    return lens, nd, top


def blocklist_hits(texts, block_values) -> "object":
    """Per-doc boolean: does the doc contain ANY blocked token? One
    split/flatten + ``pc.is_in`` + segmented reduceat any() — no Python
    token loop. ``block_values`` is a pyarrow string array."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    words = pc.split_pattern(pc.fill_null(texts, ""), " ")
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(words)
    hit = pc.is_in(flat, value_set=block_values).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(hit) == 0:
        return np.zeros(len(lens), dtype=bool)
    # split("") yields [""] so every doc has >= 1 token — spans
    # partition the flat array exactly and reduceat needs no pads
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return np.maximum.reduceat(hit, offs) > 0


def repetition_batch(t):
    """pyarrow.Table[doc_id, text] -> per-doc repetition stats table.

    Output columns: n_words, n_distinct, top_bigram_n (0 when the doc has
    no bigram), dup_word_frac = (n_words - n_distinct) / n_words, and
    top_bigram_share = top_bigram_n / (n_words - 1) (null when no
    bigrams). Ratios are float64 over the integer counts — the identical
    IEEE expression tree as the SQL oracle, so doubles are bit-exact."""
    import numpy as np
    import pyarrow as pa

    lens, nd, top = repetition_counts(t["text"])
    nw = lens.astype(np.float64)
    dup_frac = np.where(nw > 0, (lens - nd) / nw, 0.0)
    nbg = lens - 1
    share = np.where(nbg > 0, top / nbg.astype(np.float64), np.nan)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_words": pa.array(lens),
        "n_distinct": pa.array(nd),
        "top_bigram_n": pa.array(np.where(nbg > 0, top, 0).astype(np.int64)),
        "dup_word_frac": pa.array(dup_frac),
        "top_bigram_share": pa.array(share, pa.float64(), from_pandas=True),
    })


def levenshtein_batch(a, b):
    """Exact Levenshtein distance for P string pairs at once — the
    verify kernel of fuzzy (edit-distance) dedup. Vectorized
    Wagner-Fischer: the DP rows advance with (P,)-wide numpy mins, so
    Python-level work is O(maxlen^2) loop steps regardless of the pair
    count (chars compared as UTF-32 code points, matching SQL
    ``levenshtein`` character semantics for non-combining text)."""
    import numpy as np

    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a], dtype=np.int32)
    lb = np.array([len(s) for s in b], dtype=np.int32)
    maxla, maxlb = int(la.max()), int(lb.max())
    A = np.zeros((P, max(maxla, 1)), dtype=np.uint32)
    B = np.zeros((P, max(maxlb, 1)), dtype=np.uint32)
    for p, s in enumerate(a):
        if s:
            A[p, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)
    for p, s in enumerate(b):
        if s:
            B[p, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)

    out = np.zeros(P, dtype=np.int64)
    prev = np.tile(np.arange(maxlb + 1, dtype=np.int32), (P, 1))
    done = la == 0
    out[done] = lb[done]
    for i in range(1, maxla + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B).astype(np.int32)
        for j in range(1, maxlb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub[:, j - 1])
        hit = la == i
        if hit.any():
            out[hit] = cur[hit, lb[hit]]
        prev = cur
    return out


def char_entropy_batch(texts) -> "object":
    """Per-document byte-level Shannon entropy in bits (base-2) — the
    CCNet-style gibberish / encoding-noise quality signal. Empty or null
    text scores 0.0.

    Fully batched over an Arrow string column: one zero-copy view of the
    column's flat UTF-8 value buffer plus its offsets, byte counts from a
    single ``np.unique`` over composite (doc_index * 256 + byte) keys.

    SQL-pinned expression tree (r5 promotion of the ``char_entropy``
    registry entry from rows-only to hash-matched): entropy is computed
    as ``log2(n) - (sum_b k_b*log2(k_b)) / n`` — algebraically equal to
    ``-sum p*log2(p)`` but with log2 taken only of INTEGERS (counts and
    lengths), where glibc ``math.log2`` is bit-identical to DuckDB's
    ``log2`` (numpy's SIMD log2 is NOT — measured ulp divergence); the
    per-doc sum accumulates left-to-right in ascending byte order,
    matching the oracle's ``list_sum(list(... ORDER BY byte))``
    sequential semantics. The alphabet bounds the ordered-accumulation
    loop at <=256 vectorized steps (total work stays O(pairs));
    ``np.add.reduceat`` would be pairwise, not sequential. Entropy is
    over utf-8 BYTES; the SQL oracle explodes CHARS via ascii(), equal
    on ASCII corpora (the testdata contract)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.cast(pa.large_string())
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    # value buffer + offsets (account for the array's own offset slice)
    buf = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(texts.buffers()[1], dtype=np.int64)[
        texts.offset: texts.offset + n + 1]
    lens = np.diff(offs)
    flat = buf[offs[0]: offs[-1]]
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    key = doc_of * np.int64(256) + flat.astype(np.int64)
    uniq, counts = np.unique(key, return_counts=True)
    udoc = uniq >> np.int64(8)
    # glibc log2 over the bounded unique-count domain
    uc, cinv = np.unique(counts, return_inverse=True)
    l2c = np.array([math.log2(int(v)) for v in uc], np.float64)
    contrib = counts.astype(np.float64) * l2c[cinv]
    # per-doc ordered sum: the key sort already lays each doc's bytes
    # out ascending; step j adds every doc's j-th distinct byte
    # (sequential within a doc, vectorized across docs)
    starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
    seg_doc = udoc[starts]
    seg_len = np.diff(np.r_[starts, len(udoc)])
    s = np.zeros(n, dtype=np.float64)
    for j in range(int(seg_len.max()) if len(seg_len) else 0):
        m = seg_len > j
        s[seg_doc[m]] += contrib[starts[m] + j]
    out = np.zeros(n, dtype=np.float64)
    nz = lens > 0
    if nz.any():
        ul, linv = np.unique(lens[nz], return_inverse=True)
        l2n = np.array([math.log2(int(v)) for v in ul], np.float64)
        out[nz] = l2n[linv] - s[nz] / lens[nz].astype(np.float64)
    return out
