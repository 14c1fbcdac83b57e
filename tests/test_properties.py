"""Property-based tests (hypothesis): the optimized hot paths must be
semantically identical to straightforward reference implementations.

These guard the prefilter optimizations in ``functions/pii.py`` /
``functions/gate.py`` and the vectorized normalizer: any input where an
optimization changes behavior is a bug.
"""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from reddacted_ray.functions import pii as piimod
from reddacted_ray.functions.gate import DISCLOSURE_PATTERNS, TOXIC_WORDS, default_gate
from reddacted_ray.functions.pii import CompiledBank
from reddacted_ray.functions.textnorm import (
    normalize_array,
    normalize_text,
    strip_html_array,
    strip_html_text,
)

BANK = CompiledBank()
GATE = default_gate()

# text alphabet that exercises every prefilter branch: digits, '@', titles,
# keywords, html, whitespace runs
_CHUNKS = st.sampled_from(
    [
        "hello", "world", "123", "4111 1111 1111 1111", "a@b.com", "Dr.",
        "Mr. John Smith", "call me", "contact", "ssn", "8 gpu", "3rd",
        "100 times", "<b>", "</b>", " ", "  ", "\t", "\n", "&amp;#x200B;",
        "my phone number is", "I live at", "idiot", "garbage", "16gb",
        "555-0123", "(415) 555-0123", "123-45-6789", "Maple Street",
        "x", ".", ",", "!", "so good", "not bad",
    ]
)
TEXTS = st.lists(_CHUNKS, min_size=0, max_size=12).map(" ".join)


def naive_analyze(text: str):
    """Un-optimized transliteration of the reference detector
    (pii_detector.py:67-107) — no prefilters."""
    cp = {
        n: (re.compile(p, re.IGNORECASE), c) for n, (p, c) in piimod.PATTERNS.items()
    }
    fps = [re.compile(p, re.IGNORECASE) for p in piimod.COMMON_FALSE_POSITIVES]
    if any(fp.search(text) for fp in fps):
        return []
    out = []
    for t, (rx, conf) in cp.items():
        for m in rx.finditer(text):
            full = m.group(0)
            if t == "phone" and len(full.replace("-", "").replace(" ", "")) < 10:
                continue
            if t == "address" and not any(c.isalpha() for c in full.split()[-2]):
                continue
            out.append((t, full, conf))
    boost = (
        0.15
        if any(
            re.search(rf"\b{re.escape(kw)}\b", text, re.IGNORECASE)
            for kw in piimod.CONTEXT_KEYWORDS
        )
        else 0.0
    )
    return [(t, v, min(1.0, c + boost)) for t, v, c in out]


def naive_scrub(text: str) -> str:
    for p, _c in piimod.PATTERNS.values():
        text = re.sub(p, piimod.REDACTION_TOKEN, text, flags=re.IGNORECASE)
    return text


def naive_gate(text: str):
    risk = 0.0
    for p, c in DISCLOSURE_PATTERNS:
        if re.search(p, text, re.IGNORECASE):
            risk = max(risk, c)
    tox = 0.0
    for w, sc in TOXIC_WORDS.items():
        if re.search(rf"\b{re.escape(w)}\b", text, re.IGNORECASE):
            tox += sc
    risk = max(risk, min(1.0, tox))
    return risk >= 0.5, risk


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_prefiltered_detector_equals_naive(text):
    got = [(m.type, m.value, m.confidence) for m in BANK.analyze_text(text)]
    assert got == naive_analyze(text)


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_prefiltered_scrub_equals_naive(text):
    assert BANK.scrub_spans(text) == naive_scrub(text)


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_prefiltered_gate_equals_naive(text):
    assert GATE.score(text) == naive_gate(text)


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_vectorized_normalize_equals_reference(texts):
    arr = pa.array(texts, pa.string())
    vec = strip_html_array(normalize_array(arr)).to_pylist()
    assert vec == [strip_html_text(normalize_text(t)) for t in texts]


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_risk_score_bounds_and_determinism(text):
    score, matches = BANK.risk_score(text)
    assert 0.0 <= score <= 1.0
    assert (score == 0.0) == (not matches)
    assert BANK.risk_score(text) == (score, matches)


# -- imaging & hashing properties -------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 48), st.integers(1, 48))
def test_png_roundtrip_random_images(seed, w, h):
    import numpy as np

    from reddacted_ray.imaging import decode_png, encode_png

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(8, 48), st.integers(8, 48))
def test_fake_jpeg_psnr_bound(seed, w, h):
    import numpy as np

    from reddacted_ray.imaging import decode_fake_jpeg, encode_fake_jpeg, psnr

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_fake_jpeg(encode_fake_jpeg(px))
    assert psnr(px, out) >= 40.0


@settings(max_examples=40, deadline=None)
@given(TEXTS, TEXTS)
def test_minhash_estimates_jaccard(t1, t2):
    import numpy as np

    from reddacted_ray.functions.hashing import MinHasher, ngram_jaccard, shingles

    if not shingles(t1) or not shingles(t2):
        return
    mh = MinHasher(num_perm=128, bands=16)
    est = float(np.mean(mh.signature(t1) == mh.signature(t2)))
    true = ngram_jaccard(t1, t2)
    assert abs(est - true) <= 0.3  # 128 perms: generous statistical bound


# -- scorer hot-path vectorizations (round 2) --------------------------------

import numpy as np
import pyarrow.compute as pc

from reddacted_ray.functions import sentiment as sentmod
from reddacted_ray.functions.pii import PREFILTER_RE2 as PII_PRE
from reddacted_ray.functions.textstats import TrigramLM

LM = TrigramLM()


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_sentiment_prefilter_is_sound(text):
    """Arrow RE2 prefilter miss must imply compound_score == 0 (ASCII inputs;
    non-ASCII rows bypass the mask in the Scorer)."""
    hit = pc.match_substring_regex(
        pa.array([text]), sentmod.PREFILTER_RE2, ignore_case=True
    )[0].as_py()
    if not hit:
        assert sentmod.compound_score(text) == 0.0


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_pii_prefilter_is_sound(text):
    hit = pc.match_substring_regex(
        pa.array([text]), PII_PRE, ignore_case=True
    )[0].as_py()
    if not hit:
        assert BANK.risk_score(text) == (0.0, [])


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_gate_prefilter_is_sound(text):
    hit = pc.match_substring_regex(
        pa.array([text]), GATE._any.pattern, ignore_case=True
    )[0].as_py()
    if not hit:
        assert GATE.score(text) == (False, 0.0)


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXTS, min_size=0, max_size=12))
def test_perplexity_batch_equals_single(texts):
    """Batch composition must not perturb any row's ppl (bitwise): the
    oracle scores per row, the Ray stage per column, through this kernel."""
    batch = LM.perplexity_batch(texts)
    single = np.array([LM.perplexity(t) for t in texts], dtype=np.float64)
    assert np.array_equal(batch, single)


@settings(max_examples=300, deadline=None)
@given(st.floats(-1e6, 1e6, allow_nan=False))
def test_money_int_rounds_ties_away_from_zero(x):
    """_money_int must match DuckDB round(): ties away from zero — pyarrow's
    default half_to_even would diverge on exact .5 products."""
    from reddacted_ray.pipelines.queries import _money_int

    got = _money_int(pa.array([x]), 100.0)[0].as_py()
    y = x * 100.0
    exp = int(np.sign(y) * np.floor(np.abs(y) + 0.5))
    assert got == exp


def test_money_int_exact_ties():
    from reddacted_ray.pipelines.queries import _money_int

    vals = [0.125, -0.125, 0.005, -0.005, 0.015, -0.015]
    got = _money_int(pa.array(vals), 100.0).to_pylist()
    assert got == [13, -13, 1, -1, 2, -2]  # ties away from zero, DuckDB-style


# -- batched hashing kernels == scalar reference ----------------------------

# include unicode edge cases the Arrow-side tokenizer must match (str.lower
# vs utf8_lower divergences like U+0130 are why lowering stays in Python)
_HASH_TEXTS = st.lists(
    st.one_of(TEXTS, st.text(max_size=40)), min_size=0, max_size=10
)


@given(_HASH_TEXTS)
@settings(max_examples=60, deadline=None)
def test_tokens_hashed_batch_equals_per_doc(texts):
    import numpy as np

    from reddacted_ray.functions.hashing import (
        _token_hashes, tokens, tokens_hashed_batch,
    )

    hashes, counts = tokens_hashed_batch(texts)
    ref = [_token_hashes(tokens(t)) for t in texts]
    assert counts.tolist() == [len(r) for r in ref]
    cat = (
        np.concatenate(ref) if any(len(r) for r in ref)
        else np.empty(0, np.uint64)
    )
    assert hashes.tolist() == cat.tolist()


@given(_HASH_TEXTS)
@settings(max_examples=60, deadline=None)
def test_minhash_signature_batch_equals_per_doc(texts):
    import numpy as np

    from reddacted_ray.functions.hashing import _MERSENNE, MinHasher

    mh = MinHasher(num_perm=16, bands=4, shingle_n=3)
    sigs = mh.signature_batch(texts)
    p = np.uint64(_MERSENNE)
    for i, t in enumerate(texts):
        hv = mh._shingle_hashes(t)
        if not len(hv):
            assert (sigs[i] == p).all()
            continue
        prod = np.broadcast_to(hv, (mh.num_perm, len(hv))) * mh.a[:, None]
        prod = (prod + mh.b[:, None]) % p
        assert sigs[i].tolist() == prod.min(axis=1).tolist()


@given(_HASH_TEXTS)
@settings(max_examples=60, deadline=None)
def test_simhash_batch_equals_scalar(texts):
    from reddacted_ray.functions.hashing import simhash64, simhash64_batch

    got = simhash64_batch(texts)
    assert [int(g) for g in got] == [simhash64(t) for t in texts]


@given(st.lists(st.text(max_size=30), min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_buffer_hash_batches_equal_scalar(texts):
    import hashlib

    import pyarrow as _pa

    from reddacted_ray.functions.hashing import (
        content_hash, content_hash_batch, md5_top32_batch, stable_hash64,
        stable_hash64_batch,
    )

    arr = _pa.array(texts, _pa.string())
    assert content_hash_batch(arr).tolist() == [content_hash(t) for t in texts]
    assert stable_hash64_batch(arr, seed=3).tolist() == [
        stable_hash64(t, 3) for t in texts
    ]
    assert md5_top32_batch(arr).tolist() == [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in texts
    ]


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=10))
@settings(max_examples=30, deadline=None)
def test_buffer_hash_int_cast_matches_str(ids):
    import hashlib

    import pyarrow as _pa

    from reddacted_ray.functions.hashing import md5_top32_batch, stable_hash64

    arr = _pa.array(ids, _pa.int64())
    assert md5_top32_batch(arr).tolist() == [
        int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) for v in ids
    ]


WORD_TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24), min_size=1,
    max_size=8)


@settings(max_examples=200, deadline=None)
@given(WORD_TEXTS)
def test_repetition_batch_matches_python_reference(texts):
    import pyarrow as _pa

    from reddacted_ray.functions.textstats import repetition_batch

    t = _pa.table({
        "doc_id": _pa.array(range(len(texts)), _pa.int64()),
        "text": _pa.array(texts),
    })
    out = repetition_batch(t).to_pydict()
    for i, s in enumerate(texts):
        ws = s.split(" ")
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        top = max((bgs.count(b) for b in set(bgs)), default=0)
        assert out["n_words"][i] == len(ws)
        assert out["n_distinct"][i] == len(set(ws))
        assert out["top_bigram_n"][i] == top
        assert out["dup_word_frac"][i] == (len(ws) - len(set(ws))) / len(ws)
        if len(ws) > 1:
            assert out["top_bigram_share"][i] == top / (len(ws) - 1)
        else:
            assert out["top_bigram_share"][i] is None


@settings(max_examples=200, deadline=None)
@given(WORD_TEXTS, st.lists(st.sampled_from(["a", "b", "ab", "c", ""]),
                            max_size=3))
def test_blocklist_hits_matches_python_reference(texts, block):
    import pyarrow as _pa

    from reddacted_ray.functions.textstats import blocklist_hits

    got = blocklist_hits(_pa.chunked_array([_pa.array(texts)]),
                         _pa.array(block, _pa.string()))
    want = [any(w in block for w in s.split(" ")) for s in texts]
    assert got.tolist() == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 10)),
                min_size=1, max_size=40))
def test_skyline2d_mask_matches_brute_force(points):
    import numpy as _np

    from reddacted_ray.pipelines.queries import _skyline2d_mask

    price = _np.array([p for p, _ in points], dtype=_np.int64)
    size = _np.array([s for _, s in points], dtype=_np.int64)
    got = _skyline2d_mask(price, size)
    for i in range(len(points)):
        dominated = any(
            price[j] <= price[i] and size[j] >= size[i]
            and (price[j] < price[i] or size[j] > size[i])
            for j in range(len(points))
        )
        assert got[i] == (not dominated), (i, points)
