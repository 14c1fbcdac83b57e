"""Unit tests: sentiment, gate, textnorm equivalence, textstats, hashing."""

import numpy as np
import pyarrow as pa

from reddacted_ray.functions import sentiment as sm
from reddacted_ray.functions.gate import default_gate
from reddacted_ray.functions.hashing import (
    MinHasher,
    content_hash,
    hamming64,
    ngram_jaccard,
    simhash64,
)
from reddacted_ray.functions.textnorm import (
    normalize_array,
    normalize_text,
    strip_html_array,
    strip_html_text,
)
from reddacted_ray.functions.textstats import (
    TrigramLM,
    fingerprint_md5,
    predict_lang,
    quality_stats,
    token_count_bpe,
    token_count_ws,
)


# -- sentiment ---------------------------------------------------------------

def test_sentiment_signs():
    assert sm.compound_score("this is terrible and I hate it") < 0
    assert sm.compound_score("what a wonderful beautiful day") > 0
    assert sm.compound_score("#DOGE HOLD IT") == 0.0  # no lexicon hits -> 0
    assert sm.compound_score("") == 0.0


def test_sentiment_negation_flips():
    pos = sm.compound_score("this is good")
    neg = sm.compound_score("this is not good")
    assert pos > 0 and neg < 0


def test_sentiment_booster_amplifies():
    assert sm.compound_score("really great stuff") > sm.compound_score("great stuff")


def test_sentiment_exclamation_amplifies():
    assert sm.compound_score("great!") > sm.compound_score("great")


def test_sentiment_label():
    assert sm.label(0.0) == "neu"
    assert sm.label(0.3) == "pos"
    assert sm.label(-0.3) == "neg"


def test_sentiment_deterministic():
    t = "I love this amazing photo but the noise is terrible!"
    assert sm.compound_score(t) == sm.compound_score(t)


# -- gate --------------------------------------------------------------------

def test_gate_disclosures():
    g = default_gate()
    assert g.score("My phone number is 555-0123") == (True, 0.95)
    assert g.score("I live at 123 Main St, Springfield")[0] is True
    assert g.score("Just a regular comment about cats") == (False, 0.0)
    assert g.score("RaunchyRaccoon that looks a lot like Miami Springs!") == (True, 0.85)


def test_gate_toxicity_accumulates():
    g = default_gate()
    flag, risk = g.score("what an idiot took this worthless garbage shot")
    assert flag and risk >= 0.5


# -- textnorm ----------------------------------------------------------------

def test_normalize_reference_core():
    # reference order: collapse whitespace FIRST, then drop the entity —
    # so the space that preceded the entity survives (reference-faithful)
    assert normalize_text("hello   world  &amp;#x200B; ") == "hello world "
    assert strip_html_text("some <b>bold</b> claim") == "some bold claim"


def test_normalize_vectorized_equals_reference():
    cases = [
        "hello   world  &amp;#x200B; ",
        "  lead and trail  ",
        "tabs\tand\nnewlines here",
        "a &amp;#x200B; b",
        "",
        "nochange",
        "<i>tag</i>  soup <br/>",
    ]
    arr = pa.array(cases, pa.string())
    vec = strip_html_array(normalize_array(arr)).to_pylist()
    ref = [strip_html_text(normalize_text(c)) for c in cases]
    assert vec == ref


# -- textstats ---------------------------------------------------------------

def test_predict_lang_parity_shape():
    lang, conf = predict_lang("the cat and the dog in the house")
    assert lang == "en" and 0 < conf <= 1
    assert predict_lang("xyzzy qwerty") == ("und", 0.0)


def test_token_counts():
    assert token_count_ws("a b  c") == 3
    assert token_count_bpe("can't stop, won't stop") == 9


def test_quality_stats_keys():
    q = quality_stats("The quick brown fox!")
    assert q["n_tokens"] == 4.0 and 0 < q["punct_ratio"] < 1


def test_fingerprint_md5():
    import hashlib

    assert fingerprint_md5("abc") == hashlib.md5(b"abc").hexdigest()


def test_trigram_lm_orders_quality():
    lm = TrigramLM()
    natural = lm.perplexity("the quick brown fox jumps over the lazy dog")
    junk = lm.perplexity("zxqj wvkp qqqq xjzv kkkk")
    assert natural < junk
    assert lm.perplexity("the cat") == lm.perplexity("the cat")


# -- hashing -----------------------------------------------------------------

def test_content_hash_stable_and_int64():
    h = content_hash("hello world")
    assert h == content_hash("hello world")
    assert 0 <= h < 1 << 63


def test_minhash_similarity():
    mh = MinHasher(num_perm=64, bands=16)
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river bend"
    c = "completely different words about spark query plans and shuffles"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = float(np.mean(sa == sb))
    sim_ac = float(np.mean(sa == sc))
    assert sim_ab > 0.5 > sim_ac
    # near-dups share at least one LSH band
    assert set(mh.band_keys(sa)) & set(mh.band_keys(sb))


def test_simhash_hamming():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("spark query shuffle partition skew")
    assert hamming64(a, b) < hamming64(a, c)


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "v w x y z") == 0.0


def test_scorer_langid_matches_oracle_on_non_ascii():
    """ADVICE r1: Arrow/RE2 \\b is ASCII-only vs Python's Unicode \\b — the
    Scorer must fall back to the oracle path for non-ASCII rows ('fürs' must
    NOT count as a 'für' stopword hit)."""
    from reddacted_ray.stages.score import Scorer

    texts = [
        "das haus ist fürs leben und der garten",  # RE2 would over-count 'fürs'
        "für die katze und der hund ist nicht da",
        "le chat est dans la maison pour que",
        "the quick brown fox is in the house",
        "日本語 一 二 三 the and",
        "",
    ]
    t = pa.table(
        {
            "image_id": pa.array([str(i) for i in range(len(texts))]),
            "caption_clean": pa.array(texts),
        }
    )
    out = Scorer()(t)
    for i, s in enumerate(texts):
        lang, conf = predict_lang(s)
        assert out["lang"][i].as_py() == lang, s
        assert out["lang_conf"][i].as_py() == conf, s


def test_simhash_uses_all_64_bits():
    """Regression: token hashes must keep their full 64 bits — a mod-2^61
    cache value would zero three vote columns and weaken hamming banding."""
    import random

    rng = random.Random(7)
    words = ["w%d" % rng.randrange(10_000) for _ in range(4000)]
    texts = [" ".join(words[i:i + 20]) for i in range(0, 4000, 20)]
    seen = 0
    for t in texts:
        seen |= simhash64(t)
    assert seen == (1 << 64) - 1  # every bit position fires somewhere
