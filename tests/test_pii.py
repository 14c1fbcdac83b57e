"""Conformance tests for the PII core against reference semantics
(reference ``pii_detector.py``; cases from FIXTURES.md §3, corrected to the
reference's ACTUAL behavior — verified by executing the reference's exact
patterns: the 4th FP veto matches any standalone number, so numeric PII is
always vetoed; IGNORECASE makes name_pattern consume lowercase words)."""

from reddacted_ray.functions.pii import (
    REDACTION_TOKEN,
    CompiledBank,
    default_bank,
)

BANK = default_bank()


def types_of(text):
    return [m.type for m in BANK.analyze_text(text)]


def test_email_detected():
    ms = BANK.analyze_text("Contact me at john.doe@example.com for details")
    assert [(m.type, m.value) for m in ms] == [("email", "john.doe@example.com")]
    # context keyword "contact" boosts 0.95 -> min(1.0, 1.10) = 1.0
    assert ms[0].confidence == 1.0


def test_email_no_context_boost():
    ms = BANK.analyze_text("posted by someone@example.com yesterday evening")
    assert ms[0].confidence == 0.95


def test_name_pattern_ignorecase_greedy():
    # IGNORECASE makes [A-Z][a-z]+ case-insensitive: "was" is consumed
    ms = BANK.analyze_text("Dr. Jane Smith was my professor")
    assert [(m.type, m.value) for m in ms] == [("name_pattern", "Dr. Jane Smith was")]


def test_bare_number_vetoes_everything():
    # reference-faithful: \b\d+[km]?b?\b matches any standalone integer
    for text in [
        "My phone number is (415) 555-0123",
        "SSN on file: 123-45-6789",
        "Card used: 4111 1111 1111 1111",
        "I live at 123 Maple Street near the park",
        "call me at 415-555-0123 anytime",
        "watched it 100 times already",
        "finished in 3rd place",
        "running 8 gpu nodes for training",
    ]:
        assert BANK.analyze_text(text) == [], text


def test_glued_number_does_not_veto():
    # "16gb" has no word boundary between 6 and g -> no veto; email survives
    ms = BANK.analyze_text("downloaded 16gb yesterday from a@b.com")
    assert [(m.type, m.value) for m in ms] == [("email", "a@b.com")]


def test_context_boost_capped():
    ms = BANK.analyze_text("my name is attached: reach me at a@b.io")
    assert ms[0].confidence == 1.0  # min(1.0, 0.95 + 0.15)


def test_risk_score_weighted_mean():
    score, ms = BANK.risk_score("mail a@b.com or c@d.org about it")
    assert len(ms) == 2
    assert score == 0.95  # equal weights -> mean of equal confidences


def test_risk_score_mixed_types():
    text = "by Dr. John Smith photo, email me at x@y.com"
    score, ms = BANK.risk_score(text)
    types = {m.type for m in ms}
    assert types == {"email", "name_pattern"}
    # context "email" boosts both: email 1.0*1.0, name 0.85*0.6
    expected = (1.0 * 1.0 + 0.85 * 0.6) / (1.0 + 0.6)
    assert abs(score - expected) < 1e-12


def test_risk_zero_when_clean():
    assert BANK.risk_score("a photo of a cat on a table")[0] == 0.0


def test_scrub_spans():
    # name_pattern (IGNORECASE) consumes up to 2 trailing words: "here" too
    out = BANK.scrub_spans("mail a@b.com or Dr. John Smith here")
    assert out == f"mail {REDACTION_TOKEN} or {REDACTION_TOKEN}"
    out2 = BANK.scrub_spans("contact a@b.com now")
    assert out2 == f"contact {REDACTION_TOKEN} now"


def test_bank_is_reusable():
    b = CompiledBank()
    assert b.analyze_text("x@y.com")[0].type == "email"
    assert b.analyze_text("x@y.com")[0].type == "email"
