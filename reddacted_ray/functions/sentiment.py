"""Self-contained VADER-style sentiment scorer.

The reference scores sentiment with ``vaderSentiment``'s
``SentimentIntensityAnalyzer().polarity_scores(text)["compound"]``
(reference ``sentiment.py:183, 217-218``) and labels by sign
(``sentiment.py:325-337``). The vaderSentiment / nltk packages are not
available in this environment, so this module implements a compact,
deterministic analyzer following the published VADER algorithm
(Hutto & Gilbert, "VADER: A Parsimonious Rule-based Model for Sentiment
Analysis of Social Media Text", ICWSM 2014 — public knowledge):

  * token valence lookup in an embedded lexicon,
  * booster/dampener words shift the next valence (+/- 0.293 scaled),
  * negation within the preceding 3 tokens flips valence by -0.74,
  * ALL-CAPS emphasis (+/- 0.733) when the text is mixed-case,
  * exclamation-mark amplification (up to 4 marks, +0.292 each),
  * compound = sum / sqrt(sum^2 + 15), clamped to [-1, 1].

This analyzer is the project's own oracle for sentiment: the Ray stage and
the single-process labeler share this exact function, so parity is by
construction. Scores are in [-1, 1]; label semantics match the reference:
0 -> "neu", >0 -> "pos", <0 -> "neg".
"""

from __future__ import annotations

import math
import re

# Compact valence lexicon (VADER-style scale, roughly [-4, 4]).
LEXICON: dict[str, float] = {
    # positive
    "good": 1.9, "great": 3.1, "awesome": 3.1, "amazing": 2.8, "love": 3.2,
    "loved": 2.9, "loves": 2.7, "like": 1.5, "liked": 1.8, "likes": 1.6,
    "best": 3.2, "better": 1.9, "nice": 1.8, "happy": 2.7, "joy": 2.8,
    "wonderful": 2.7, "fantastic": 2.6, "excellent": 2.7, "perfect": 2.7,
    "beautiful": 2.9, "cool": 1.3, "fun": 2.3, "funny": 1.9, "glad": 2.0,
    "win": 2.8, "winner": 2.8, "winning": 2.4, "wow": 2.8, "yes": 1.7,
    "thanks": 1.9, "thank": 1.5, "helpful": 1.8, "impressive": 2.3,
    "brilliant": 2.8, "enjoy": 2.2, "enjoyed": 2.3, "favorite": 2.0,
    "recommend": 1.5, "recommended": 1.5, "solid": 1.5, "stunning": 2.8,
    "delight": 2.9, "delightful": 2.8, "superb": 3.0, "smooth": 1.3,
    "success": 2.7, "successful": 2.6, "easy": 1.9, "clean": 1.6,
    "fresh": 1.3, "gorgeous": 3.0, "lovely": 2.8, "pleasant": 2.3,
    "art": 1.1, "masterpiece": 3.1, "crisp": 1.2, "vibrant": 1.9,
    # negative
    "bad": -2.5, "worse": -2.1, "worst": -3.1, "terrible": -2.1,
    "horrible": -2.5, "awful": -2.0, "hate": -2.7, "hated": -2.6,
    "hates": -1.9, "sad": -2.1, "angry": -2.3, "mad": -2.2, "ugly": -2.3,
    "broken": -1.6, "fail": -2.5, "failed": -2.3, "failure": -2.4,
    "poor": -2.1, "disappointing": -2.1, "disappointed": -2.3,
    "disgusting": -2.9, "gross": -2.1, "nasty": -2.6, "annoying": -1.9,
    "boring": -1.3, "useless": -1.8, "waste": -2.0, "wrong": -2.1,
    "problem": -1.7, "problems": -1.7, "issue": -1.1, "issues": -1.2,
    "bug": -1.4, "bugs": -1.5, "crash": -2.0, "crashed": -2.0,
    "slow": -1.2, "pain": -2.0, "painful": -2.2, "noise": -1.1,
    "noisy": -1.4, "blurry": -1.5, "dark": -0.9, "sick": -2.3,
    "scam": -2.6, "spam": -1.9, "creepy": -2.1, "weird": -0.7,
    "no": -1.2, "not": 0.0, "trash": -2.2, "garbage": -2.2,
    "corrupt": -2.4, "corrupted": -2.2, "missing": -1.4, "lost": -1.3,
    "stupid": -2.4, "dumb": -2.3, "hideous": -2.7, "offensive": -2.4,
}

BOOSTERS: dict[str, float] = {
    "very": 0.293, "really": 0.293, "extremely": 0.293, "absolutely": 0.293,
    "incredibly": 0.293, "so": 0.293, "totally": 0.293, "super": 0.293,
    "quite": 0.293, "amazingly": 0.293, "utterly": 0.293, "highly": 0.293,
    "slightly": -0.293, "somewhat": -0.293, "barely": -0.293,
    "hardly": -0.293, "kinda": -0.293, "kind of": -0.293, "marginally": -0.293,
}

NEGATIONS = frozenset(
    [
        "not", "no", "never", "none", "nobody", "nothing", "neither",
        "nowhere", "isnt", "isn't", "arent", "aren't", "wasnt", "wasn't",
        "werent", "weren't", "dont", "don't", "doesnt", "doesn't", "didnt",
        "didn't", "cant", "can't", "cannot", "couldnt", "couldn't", "wont",
        "won't", "wouldnt", "wouldn't", "shouldnt", "shouldn't", "aint",
        "ain't", "without",
    ]
)

NEGATION_FACTOR = -0.74
CAPS_INCR = 0.733
EXCL_INCR = 0.292
NORM_ALPHA = 15.0

_TOKEN_RE = re.compile(r"[A-Za-z']+|!")

# RE2-safe vectorized prefilter (Arrow ``match_substring_regex``): matches
# iff the text contains a lexicon word delimited by non-token chars — i.e.
# exactly when ``compound_score`` can be nonzero (no lexicon token -> 0.0
# regardless of boosters/negation/exclamation). Char-class delimiters
# instead of \b because RE2's \b is ASCII-word-based and would miss a token
# after a digit ("123good"); existence is decided by the leftmost delimited
# occurrence, so match consumption of the right delimiter cannot hide hits.
PREFILTER_RE2 = (
    "(?:^|[^A-Za-z'])(?:" + "|".join(sorted(LEXICON)) + ")(?:[^A-Za-z']|$)"
)


def _normalize(total: float) -> float:
    score = total / math.sqrt(total * total + NORM_ALPHA)
    return max(-1.0, min(1.0, score))


def compound_score(text: str) -> float:
    """Compound sentiment in [-1, 1]; 0.0 for neutral / empty text."""
    if not text:
        return 0.0
    raw_tokens = _TOKEN_RE.findall(text)
    words = [t for t in raw_tokens if t != "!"]
    n_excl = min(4, sum(1 for t in raw_tokens if t == "!"))
    if text.islower():
        # fast path (identical semantics): no cased-upper tokens exist, so
        # tokens are already lowercase and caps emphasis cannot apply
        lowered = words
        has_caps_mix = False
    else:
        lowered = [w.lower() for w in words]
        # caps emphasis only applies when the text is mixed-case
        has_caps_mix = any(w.isupper() and len(w) > 1 for w in words) and not all(
            w.isupper() for w in words if len(w) > 1
        )
    total = 0.0
    hit_any = False
    for i, w in enumerate(lowered):
        if w in BOOSTERS:
            continue
        valence = LEXICON.get(w)
        if valence is None or valence == 0.0:
            continue
        hit_any = True
        if has_caps_mix and words[i].isupper():
            valence += CAPS_INCR if valence > 0 else -CAPS_INCR
        # booster scan over up to 3 preceding tokens with distance damping
        for dist in (1, 2, 3):
            j = i - dist
            if j < 0:
                break
            b = BOOSTERS.get(lowered[j])
            if b is not None and lowered[j] not in NEGATIONS:
                scalar = b * (1.0 - 0.05 * (dist - 1))
                valence += scalar if valence > 0 else -scalar
        if any(lowered[i - d] in NEGATIONS for d in (1, 2, 3) if i - d >= 0):
            valence *= NEGATION_FACTOR
        total += valence
    if not hit_any:
        return 0.0
    if total > 0:
        total += n_excl * EXCL_INCR
    elif total < 0:
        total -= n_excl * EXCL_INCR
    return round(_normalize(total), 4)


def label(score: float) -> str:
    """Reference ``sentiment.py:325-337`` (emoji -> pos/neu/neg recast)."""
    if score == 0:
        return "neu"
    return "pos" if score > 0 else "neg"
