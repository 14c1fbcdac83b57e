"""Exact big-integer reductions over int64 numpy arrays.

Rank-correlation partials (spearman, autocorr) sum per-element products
whose TOTAL exceeds int64 long before the per-element product does:
centered ranks satisfy |a0| <= N, so a0*b0 fits int64 for N up to
~3.03e9 (sqrt(2^63)), but sum(a0^2) <= N^3 wraps past ~2.1e6 rows per
block at N=1e9. ``exact_prod_sum`` makes the reduction exact for ANY
row count by a two's-complement split — p == (p >> 32)*2^32 +
(p & 0xffffffff) holds for arithmetic shift — so every numpy partial
stays far inside int64/uint64 range and the 2^32 recombination happens
in Python big ints.

Bounds (per 2^30-element chunk):
  * hi = p >> 32: |hi| <= N^2/2^32 <= 2.1e8 at N=1e9; chunk sum <= 2.3e17.
  * lo = p & 0xffffffff in [0, 2^32): chunk sum < 2^62 as uint64.

Round-5 VERDICT #1 fix (queries.py spearman/autocorr int64 ceiling).
"""

from __future__ import annotations

import numpy as np

# per-element product must fit int64: |a|,|b| <= _PROD_BOUND
_PROD_BOUND = 3_000_000_000
_CHUNK = 1 << 30
_MASK = np.int64(0xFFFFFFFF)


def exact_prod_sum(a: np.ndarray, b: np.ndarray) -> int:
    """Exact Python-int ``sum(a[i] * b[i])`` for int64 inputs whose
    per-element product fits int64 (|a|, |b| <= 3e9 — asserted) but
    whose sum may not. Vectorized: two numpy reductions per 2^30-row
    chunk, no object dtype, no per-row Python."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if len(a) == 0:
        return 0
    # loud contract failure instead of a silent product wrap (ADVICE r4)
    amax = int(np.max(np.abs(a)))
    bmax = int(np.max(np.abs(b)))
    if amax > _PROD_BOUND or bmax > _PROD_BOUND:
        raise OverflowError(
            f"exact_prod_sum: |values| up to {max(amax, bmax)} exceed the "
            f"int64 per-element product bound {_PROD_BOUND}")
    total = 0
    for i in range(0, len(a), _CHUNK):
        p = a[i:i + _CHUNK] * b[i:i + _CHUNK]
        hi = int(np.sum(p >> 32, dtype=np.int64))
        lo = int(np.sum(p & _MASK, dtype=np.uint64))
        total += (hi << 32) + lo
    return total


def split_i128(v: int) -> tuple[int, int]:
    """Split a Python int into (hi, lo) int64-safe halves with
    v == (hi << 32) + lo and lo in [0, 2^32). Lets an exact block
    partial travel through an int64 Arrow column pair; reassemble with
    ``combine_i128`` (or sum hi/lo columns separately — the identity
    distributes over addition)."""
    lo = v & 0xFFFFFFFF
    hi = (v - lo) >> 32
    if not (-(1 << 62) <= hi < (1 << 62)):  # pragma: no cover
        raise OverflowError(f"split_i128: value {v} out of 96-bit range")
    return hi, lo


def combine_i128(hi: int, lo: int) -> int:
    """Inverse of ``split_i128``; also correct on column SUMS of many
    (hi, lo) pairs because the recombination is linear."""
    return (int(hi) << 32) + int(lo)
