"""Text normalization — vectorized Arrow kernels + exact per-row reference core.

Reference semantics:
  * reader normalize (F1): ``rstrip()`` then collapse all whitespace with
    ``" ".join(s.split())`` then drop the literal ``&amp;#x200B;`` entity
    (reference ``api/scraper.py:56-58, 104-107``);
  * pre-analysis HTML strip (F2): ``re.sub(r"<.*?>", "", text)``
    (reference ``sentiment.py:189, 205``);
  * skip-text filter (F3): drop rows whose cleaned text contains the
    redaction marker (reference ``sentiment.py:208-211``);
  * text-match filter (F4): case-insensitive substring keep
    (reference ``api/reddit.py:394-407``).

``normalize_array`` / ``strip_html_array`` are the vectorized hot-path
variants over ``pyarrow`` string arrays; ``normalize_text`` is the per-row
reference core used by the oracle. They are equivalence-tested against each
other in tests/test_textnorm.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

HTML_TAG_RE = r"<.*?>"
ZWSP_ENTITY = "&amp;#x200B;"


def normalize_text(s: str) -> str:
    """Per-row reference core (``api/scraper.py:56-58``)."""
    s = s.rstrip()
    s = " ".join(s.split())
    return s.replace(ZWSP_ENTITY, "")


def strip_html_text(s: str) -> str:
    """Per-row reference core (``sentiment.py:189``)."""
    import re

    return re.sub(HTML_TAG_RE, "", s)


def normalize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized F1 over an Arrow string array.

    Matches ``" ".join(s.split())`` exactly: Python ``str.split()`` splits
    on runs of arbitrary whitespace and drops leading/trailing whitespace,
    which equals trim + collapse ``\\s+`` -> single space. The entity strip
    runs after collapsing, same as the reference's statement order (the
    entity contains no whitespace so the order is immaterial — kept
    identical anyway).
    """
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    arr = pc.utf8_trim_whitespace(arr)
    return pc.replace_substring(arr, pattern=ZWSP_ENTITY, replacement="")


def strip_html_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized F2: ``pc.replace_substring_regex(col, "<.*?>", "")``."""
    return pc.replace_substring_regex(arr, pattern=HTML_TAG_RE, replacement="")


def contains_mask(
    arr: pa.Array | pa.ChunkedArray, needle: str, ignore_case: bool = False
) -> pa.Array | pa.ChunkedArray:
    """Vectorized substring containment (F3 / F4 predicates)."""
    return pc.match_substring(arr, needle, ignore_case=ignore_case)
