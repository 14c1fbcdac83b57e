"""PII detection core — exact reimplementation of the reference semantics.

This module is the single source of truth for the detection rules. Both the
single-process oracle labeler (``reddacted_ray.oracle``) and the distributed
Ray Data scoring stage (``reddacted_ray.stages.score``) import from here, so
the distributed pipeline can never drift from the reference semantics.

Reference parity (taylorwilsdon/reddacted):
  - pattern bank + base confidences .... reference ``pii_detector.py:24-34``
  - context keywords (+0.15 boost) ..... ``pii_detector.py:37-50, 94-105``
  - false-positive whole-record veto ... ``pii_detector.py:52-57, 75-77``
  - per-type validators ................ ``pii_detector.py:86-90``
  - weighted risk score ................ ``pii_detector.py:109-134``

Notable reference-faithful behaviors we deliberately preserve (verified by
executing the reference patterns, see tests/test_pii.py):
  * The 4th veto pattern ``\\b\\d+[km]?b?\\b`` matches ANY standalone integer
    token, so any text containing a bare number (phones, SSNs, card numbers,
    street numbers) is vetoed to zero matches. In practice only ``email`` and
    ``name_pattern`` can fire on ordinary text. Fidelity to the reference —
    not "better" detection — is the goal.
  * All patterns compile with ``re.IGNORECASE``, which makes the
    ``[A-Z][a-z]+`` classes in ``name_pattern`` case-insensitive, so e.g.
    ``"Dr. Jane Smith was"`` matches (the lowercase "was" is consumed).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Tuple

# Pattern bank: name -> (regex, base confidence). Insertion order matters:
# matches are accumulated in this order and the scrub applies patterns in
# this order (reference iterates ``self.PATTERNS.items()``).
PATTERNS: dict[str, tuple[str, float]] = {
    "email": (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", 0.95),
    "phone": (r"\b(\+\d{1,2}\s?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}\b", 0.85),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", 0.97),
    "credit_card": (r"\b(?:\d{4}[- ]?){3}\d{4}\b", 0.95),
    "address": (
        r"\b\d{2,5}\s+(?:[A-Za-z]+\s)+(?:street|st|avenue|ave|road|rd|boulevard|blvd|lane|ln|drive|dr)\.?\b",
        0.65,
    ),
    "name_pattern": (
        r"\b(?:Mr\.|Mrs\.|Ms\.|Dr\.)\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,2}\b",
        0.7,
    ),
}

CONTEXT_KEYWORDS: list[str] = [
    "name is",
    "live at",
    "address",
    "reach me",
    "phone",
    "email",
    "contact",
    "call me",
    "ssn",
    "social security",
    "credit card",
    "driver license",
]

COMMON_FALSE_POSITIVES: list[str] = [
    r"\b\d+ (llm|ai|gpu|cpu|ram|mb|gb|ghz|mhz|api)\b",
    r"\b\d+ (times|years|days|hours|minutes|seconds)\b",
    r"\b\d+(?:st|nd|rd|th)\b",
    r"\b\d+[km]?b?\b",
]

CONTEXT_BOOST = 0.15

# RE2-safe vectorized prefilter (Arrow ``match_substring_regex``, ASCII rows
# only — callers route non-ASCII rows to the exact Python path because
# Python's \d also matches Unicode digits): same sufficient condition as
# ``CompiledBank._any_signal`` — every pattern needs a digit, an '@', or a
# title token, so a non-matching row is provably (0.0, []).
PREFILTER_RE2 = r"[0-9@]|\b(?:Mr|Mrs|Ms|Dr)\."

TYPE_WEIGHTS: dict[str, float] = {
    "ssn": 1.2,
    "credit_card": 1.2,
    "email": 1.0,
    "phone": 0.9,
    "address": 0.7,
    "name_pattern": 0.6,
}

# Whole-text replacement payload used by the reference's remediation write
# path (reference ``api/reddit.py:291``).
REDACTION_MESSAGE = (
    "This comment has been reddacted to preserve online privacy - "
    "see r/reddacted for more info"
)
# Span-level replacement token used by the vectorized scrub (graft recast of
# the reference's LLM rewrite, see SURVEY.md F7).
REDACTION_TOKEN = "[REDACTED]"


@dataclass
class PIIMatch:
    """One PII hit (reference ``pii_detector.py:11-17``)."""

    type: str
    value: str
    confidence: float


class CompiledBank:
    """Compiled regex bank. Build once per worker (actor ``__init__``)."""

    __slots__ = (
        "patterns", "false_positives", "context", "scrub_patterns",
        "_digit", "_title", "_context_any", "_any_signal",
    )

    def __init__(self) -> None:
        self.patterns = {
            name: (re.compile(pat, re.IGNORECASE), conf)
            for name, (pat, conf) in PATTERNS.items()
        }
        self.false_positives = [
            re.compile(p, re.IGNORECASE) for p in COMMON_FALSE_POSITIVES
        ]
        # Reference compiles the keyword search lazily per call
        # (``pii_detector.py:98``); we precompile the identical regexes.
        self.context = [
            re.compile(rf"\b{re.escape(kw)}\b", re.IGNORECASE)
            for kw in CONTEXT_KEYWORDS
        ]
        self.scrub_patterns = [rx for rx, _ in self.patterns.values()]
        # Hot-path prefilters (pure optimizations — provably no behavior
        # change): every FP-veto pattern and every numeric PII pattern
        # requires a digit; email requires '@'; name_pattern requires a
        # title token; the context boost only fires via whole-word keyword
        # hits, so one alternation regex is equivalent to the 12 singles
        # (all keywords start/end on word characters).
        self._digit = re.compile(r"\d")
        self._title = re.compile(r"\b(?:Mr|Mrs|Ms|Dr)\.", re.IGNORECASE)
        self._context_any = re.compile(
            r"\b(?:" + "|".join(re.escape(kw) for kw in CONTEXT_KEYWORDS) + r")\b",
            re.IGNORECASE,
        )
        # one-search early exit: every pattern (and every veto) requires a
        # digit, an '@', or a title token — most clean rows leave after
        # this single scan
        self._any_signal = re.compile(r"[\d@]|\b(?:Mr|Mrs|Ms|Dr)\.", re.IGNORECASE)

    # -- detection ---------------------------------------------------------

    def analyze_text(self, text: str) -> List[PIIMatch]:
        """Reference ``PIIDetector.analyze_text`` (``pii_detector.py:67-107``)."""
        if self._any_signal.search(text) is None:
            return []
        has_digit = self._digit.search(text) is not None
        if has_digit and any(fp.search(text) for fp in self.false_positives):
            return []
        has_at = "@" in text
        has_title = self._title.search(text) is not None
        if not (has_digit or has_at or has_title):
            return []
        matches: List[PIIMatch] = []
        for pii_type, (rx, confidence) in self.patterns.items():
            if pii_type == "email":
                if not has_at:
                    continue
            elif pii_type == "name_pattern":
                if not has_title:
                    continue
            elif not has_digit:  # phone / ssn / credit_card / address
                continue
            for m in rx.finditer(text):
                full = m.group(0)
                if pii_type == "phone" and len(full.replace("-", "").replace(" ", "")) < 10:
                    continue
                if pii_type == "address" and not any(
                    c.isalpha() for c in full.split()[-2]
                ):
                    continue
                matches.append(PIIMatch(pii_type, full, confidence))
        if (
            matches
            and self._context_any.search(text) is not None
            and any(rx.search(text) for rx in self.context)
        ):
            for m in matches:
                m.confidence = min(1.0, m.confidence + CONTEXT_BOOST)
        return matches

    def risk_score(self, text: str) -> Tuple[float, List[PIIMatch]]:
        """Reference ``PIIDetector.get_pii_risk_score`` (``pii_detector.py:109-134``)."""
        matches = self.analyze_text(text)
        if not matches:
            return 0.0, []
        total_w = sum(TYPE_WEIGHTS.get(m.type, 1.0) for m in matches)
        weighted = sum(m.confidence * TYPE_WEIGHTS.get(m.type, 1.0) for m in matches)
        return min(1.0, weighted / total_w), matches

    # -- scrub -------------------------------------------------------------

    def scrub_spans(self, text: str, replacement: str = REDACTION_TOKEN) -> str:
        """Replace every pattern-bank match span with ``replacement``.

        Patterns apply sequentially in bank order over the progressively
        rewritten string — the vectorized-scrub recast of the reference's
        text rewrite (SURVEY.md F7; replacement payload per reference
        ``api/reddit.py:287-292``). Validators and the FP veto do NOT gate
        the scrub: scrubbing is applied only to rows already decided
        ``keep=false``, and over-scrubbing a dropped row is safe.
        """
        # prefilters mirror analyze_text; the replacement token introduces
        # no '@'/digit/title characters, so flags from the original text
        # remain sufficient conditions across the sequential rewrites
        has_digit = self._digit.search(text) is not None
        has_at = "@" in text
        has_title = self._title.search(text) is not None
        for pii_type, (rx, _conf) in self.patterns.items():
            if pii_type == "email":
                if not has_at:
                    continue
            elif pii_type == "name_pattern":
                if not has_title:
                    continue
            elif not has_digit:
                continue
            text = rx.sub(replacement, text)
        return text


_DEFAULT_BANK: CompiledBank | None = None


def default_bank() -> CompiledBank:
    """Process-local singleton for driver-side / oracle use."""
    global _DEFAULT_BANK
    if _DEFAULT_BANK is None:
        _DEFAULT_BANK = CompiledBank()
    return _DEFAULT_BANK
