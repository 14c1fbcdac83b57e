"""Deterministic hashing primitives for dedup: shingles, MinHash, SimHash,
rolling hashes, and n-gram Jaccard.

All hashes are seeded and process-independent (no Python ``hash()``, which is
salted per process) so that distributed stages and driver-side oracles agree
bit-for-bit. Used by ``reddacted_ray.stages.dedup``.
"""

from __future__ import annotations

import hashlib
import re
import struct


import numpy as np

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def shingles(text: str, n: int = 3) -> set[str]:
    """Word n-gram shingles of the lowercased token stream."""
    toks = tokens(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def stable_hash64(s: str, seed: int = 0) -> int:
    """64-bit stable hash via blake2b (keyed by seed)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little")
    )
    return struct.unpack("<Q", h.digest())[0]


def content_hash(text: str) -> int:
    """Exact-dup key: 63-bit stable content hash (fits int64)."""
    return stable_hash64(text) >> 1


# -- MinHash ----------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """MinHash signatures with banding for LSH. Build once per worker."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                 seed: int = 42) -> None:
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.shingle_n)
        if not sh:
            return np.full(self.num_perm, np.uint64(_MERSENNE), dtype=np.uint64)
        hv = np.array([stable_hash64(s) % _MERSENNE for s in sh], dtype=np.uint64)
        # (a*h + b) mod p over permutations x shingles. NOTE: a and h are
        # ~2^61, so the uint64 product intentionally wraps mod 2^64 before
        # the Mersenne mod — this is a deterministic mixed-modulus hash, not
        # textbook Carter-Wegman mod p. Uniformity is empirically fine for
        # LSH banding (see test_minhash_estimates_jaccard) and the wrap is
        # identical on every worker, which is what dedup correctness needs.
        prod = (self.a[:, None] * hv[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> list[int]:
        """One stable 63-bit key per band (band index folded in)."""
        keys = []
        for bi in range(self.bands):
            chunk = sig[bi * self.rows : (bi + 1) * self.rows].tobytes()
            h = hashlib.blake2b(chunk, digest_size=8,
                                key=bi.to_bytes(8, "little")).digest()
            keys.append(struct.unpack("<Q", h)[0] >> 1)
        return keys


# -- SimHash ----------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (Charikar 2002)."""
    toks = tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for t in toks:
        h = np.uint64(stable_hash64(t))
        bits = ((h >> bit_idx) & np.uint64(1)).astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# -- Jaccard ----------------------------------------------------------------

def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def ngram_jaccard(t1: str, t2: str, n: int = 3) -> float:
    return jaccard(shingles(t1, n), shingles(t2, n))


# -- rolling hash -----------------------------------------------------------

def rolling_fingerprints(text: str, window: int = 16, base: int = 257) -> list[int]:
    """Polynomial rolling hashes of char windows (Rabin-Karp style), mod 2^61-1."""
    s = text.lower()
    if len(s) < window:
        return [content_hash(s)] if s else []
    p = _MERSENNE
    power = pow(base, window - 1, p)
    h = 0
    out = []
    for i, ch in enumerate(s):
        h = (h * base + ord(ch)) % p
        if i >= window - 1:
            out.append(h)
            h = (h - ord(s[i - window + 1]) * power) % p
    return out
