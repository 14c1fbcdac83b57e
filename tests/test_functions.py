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


def test_char_entropy_batch_ground_truth():
    """Byte-level Shannon entropy matches the hand-computed definition,
    including null/empty docs and multi-byte UTF-8 (entropy is over
    BYTES, so 'é' contributes its two UTF-8 bytes)."""
    import math
    from collections import Counter

    import numpy as np
    import pyarrow as pa

    from reddacted_ray.functions.textstats import char_entropy_batch

    texts = ["aaaa", "ab", "", None, "abcd", "aab", "héé"]

    def ref(s):
        if not s:
            return 0.0
        b = s.encode("utf-8")
        c = Counter(b)
        return -sum((k / len(b)) * math.log2(k / len(b))
                    for k in c.values())

    got = char_entropy_batch(pa.chunked_array([pa.array(texts)]))
    exp = [ref(s) for s in texts]
    assert np.allclose(got, exp)
    # sliced-offset arrays (zero-copy view with a non-zero offset)
    arr = pa.array(["xx"] + texts).slice(1)
    got2 = char_entropy_batch(pa.chunked_array([arr]))
    assert np.allclose(got2, exp)


def test_rolling_time_range_includes_ts_peers(ray_session):
    """SQL RANGE ... CURRENT ROW includes ALL ts-peers of the current
    row — verify the searchsorted frame math against a hand-built case
    with duplicate timestamps and a window boundary exactly 1h back
    (RANGE 1 HOUR PRECEDING is inclusive of ts - 1h)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.pipelines.queries import q_rolling_1h_sum

    # build a tiny events parquet in the sf layout
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="roll_")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600, "s").astype("timedelta64[us]")
    ts = [base, base, base + h, base + 2 * h, base + 2 * h]
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    }), os.path.join(d, "events.parquet"))

    out = (q_rolling_1h_sum(d).to_pandas()
           .set_index("event_id")["rolling_cents"].to_dict())
    # events 10,11 share ts -> both frames cover both peers (300)
    # event 12 at +1h: window [0, 1h] inclusive -> 100+200+400 = 700
    # event 13 at +2h: window [1h, 2h] -> 400+800 = 1200
    # event 14: other user -> 1600
    assert out == {10: 300, 11: 300, 12: 700, 13: 1200, 14: 1600}
