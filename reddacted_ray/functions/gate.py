"""Toxicity / implicit-PII gate — local replacement for the reference's LLM gate.

The reference sends each comment to an LLM and gets back
``{has_pii, confidence, ...}`` (reference ``llm_detector.py:20-26``); the
gate then participates in the risk merge
``pii_risk = max(pii_risk, llm_risk) if has_pii`` (``sentiment.py:262-267``)
and the keep/drop rule ``risky iff pii_risk > 0.5 or has_pii``
(``results.py:170-175``). Per the graft north_star, the LLM is replaced by a
deterministic local scorer with the SAME merge/decision semantics.

The gate flags two things:
  * implicit PII phrasing — first-person disclosure templates the regex
    bank can't see ("I live at/in …", "my name is …", "I work at …"),
    mirroring the reference's LLM test expectations
    (``tests/test_llm.py:18-49``);
  * toxicity — an embedded profanity/attack word list scored by hit
    density (a stand-in for a toxicity model; deterministic, public
    knowledge).

Output per row: ``gate_flag: bool`` (≙ has_pii), ``gate_risk: float`` in
[0, 1] (≙ llm confidence). Everything is compiled once per worker.
"""

from __future__ import annotations

import re
from typing import Tuple

# Disclosure templates -> gate confidence (mirrors the confidences the
# reference's LLM fixtures expect, tests/test_llm.py:18-49).
DISCLOSURE_PATTERNS: list[tuple[str, float]] = [
    (r"\bmy (?:phone|cell|mobile)(?: number)? is\b", 0.95),
    (r"\bi live (?:at|on|in)\b", 0.90),
    (r"\bmy (?:home )?address is\b", 0.90),
    (r"\bmy name is\b", 0.85),
    (r"\bi(?: a|')m from\b", 0.70),
    (r"\bi work (?:at|for)\b", 0.70),
    (r"\bmy ssn\b|\bmy social security\b", 0.97),
    (r"\bmy email(?: address)? is\b", 0.95),
    (r"\bborn (?:in|on) \d", 0.70),
    (r"\bi(?: a|')m \d{1,2} years? old\b", 0.70),
    (r"\bthat looks a lot like\b", 0.85),  # location-inference case, test_llm.py:49
]

TOXIC_WORDS: dict[str, float] = {
    "idiot": 0.6, "moron": 0.6, "stupid": 0.4, "dumb": 0.4, "loser": 0.5,
    "trash": 0.4, "garbage": 0.4, "shut up": 0.5, "hate you": 0.7,
    "kill yourself": 1.0, "kys": 1.0, "die": 0.3, "ugly": 0.4,
    "pathetic": 0.5, "worthless": 0.6, "disgusting": 0.5, "freak": 0.5,
    "creep": 0.5, "scum": 0.7, "filth": 0.6,
}

GATE_THRESHOLD = 0.5


class GateBank:
    """Compiled gate state; build once per worker."""

    __slots__ = ("disclosure", "toxic", "_disclosure_any", "_toxic_any", "_any")

    def __init__(self) -> None:
        self.disclosure = [
            (re.compile(p, re.IGNORECASE), c) for p, c in DISCLOSURE_PATTERNS
        ]
        self.toxic = [
            (re.compile(rf"\b{re.escape(w)}\b", re.IGNORECASE), s)
            for w, s in TOXIC_WORDS.items()
        ]
        # one-pass prefilters: an alternation that matches iff some member
        # pattern matches — skips the per-pattern loops on clean text
        self._disclosure_any = re.compile(
            "|".join(f"(?:{p})" for p, _ in DISCLOSURE_PATTERNS), re.IGNORECASE
        )
        self._toxic_any = re.compile(
            r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_WORDS) + r")\b",
            re.IGNORECASE,
        )
        # single-scan early exit over both signal families
        self._any = re.compile(
            self._disclosure_any.pattern + "|" + self._toxic_any.pattern,
            re.IGNORECASE,
        )

    def score(self, text: str) -> Tuple[bool, float]:
        """Return (gate_flag, gate_risk) for one text."""
        if self._any.search(text) is None:
            return False, 0.0
        risk = 0.0
        if self._disclosure_any.search(text) is not None:
            for rx, conf in self.disclosure:
                if rx.search(text):
                    risk = max(risk, conf)
        if self._toxic_any.search(text) is not None:
            tox = 0.0
            for rx, s in self.toxic:
                if rx.search(text):
                    tox += s
            risk = max(risk, min(1.0, tox))
        return risk >= GATE_THRESHOLD, risk


_DEFAULT: GateBank | None = None


def default_gate() -> GateBank:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = GateBank()
    return _DEFAULT
