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


# per-process token->hash cache: the token vocabulary is Zipfian, so after
# warm-up nearly every token is a dict hit and the blake2b cost amortizes
# away. Deterministic across workers (stable_hash64 is seeded, the cache
# only memoizes it). Bounded: reset beyond 1M entries. Stores the FULL
# 64-bit hash — simhash needs all 64 vote columns live (a mod-2^61 value
# would zero 3 bit positions and silently weaken hamming banding).
_TOKEN_HASH_CACHE: dict[str, int] = {}
_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) > 1_000_000:
                cache.clear()
            h = cache[t] = stable_hash64(t)
        out[i] = h
    return out


class MinHasher:
    """MinHash signatures with banding for LSH. Build once per worker.

    Shingle hashing is vectorized: each token hashes once (cached), and a
    word n-gram's hash is the polynomial combine of its token hashes over
    a sliding window — one numpy pass instead of a blake2b call per
    shingle string (measured 5x faster per doc). The combine intentionally
    wraps mod 2^64 before the final Mersenne mod (deterministic on every
    worker; uniformity validated by test_minhash_estimates_jaccard)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                 seed: int = 42) -> None:
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_perm, seed)

    def _shingle_hashes(self, text: str) -> np.ndarray:
        toks = tokens(text)
        if not toks:
            return np.empty(0, dtype=np.uint64)
        th = _token_hashes(toks)
        n = self.shingle_n
        if len(toks) < n:
            n = len(toks)  # degenerate shingle = all tokens (cf. shingles())
        hv = th[: len(th) - n + 1].copy()
        for k in range(1, n):
            hv *= _SHINGLE_MIX
            hv += th[k : len(th) - n + 1 + k]
        hv %= np.uint64(_MERSENNE)
        return np.unique(hv)

    def signature(self, text: str) -> np.ndarray:
        return self.signature_batch([text])[0]

    def signature_batch(self, texts: list[str]) -> np.ndarray:
        """Signatures for a whole column at once — (n, num_perm) uint64.

        All docs' shingle hashes concatenate into one array; the
        permutation products compute as one (num_perm, total_shingles)
        matrix and per-doc minima fall out of ``np.minimum.reduceat``
        (min is order-independent, so batch == per-doc exactly). Chunked
        so the temporary stays ~100 MB regardless of batch size."""
        n = len(texts)
        out = np.full((n, self.num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
        hvs = [self._shingle_hashes(t) for t in texts]
        live = [i for i, v in enumerate(hvs) if len(v)]
        if not live:
            return out
        p = np.uint64(_MERSENNE)
        # chunk over docs so (num_perm x shingles) stays bounded
        max_shingles = max(1, 200_000 // self.num_perm * 64)
        start = 0
        while start < len(live):
            end = start
            tot = 0
            while end < len(live) and (tot == 0 or tot + len(hvs[live[end]]) <= max_shingles):
                tot += len(hvs[live[end]])
                end += 1
            idx = live[start:end]
            cat = np.concatenate([hvs[i] for i in idx])
            offs = np.zeros(len(idx), dtype=np.int64)
            np.cumsum([len(hvs[i]) for i in idx[:-1]], out=offs[1:])
            # (a*h + b) mod p (wraps mod 2^64 first — same intentional
            # mixed-modulus arithmetic as the shingle combine).
            # broadcast_to instead of the outer-product spelling: numpy's
            # uint64 (P,1)x(1,S) broadcast multiply takes a ~25x slower
            # generic path than (P,S)x(P,1)
            prod = np.broadcast_to(cat, (self.num_perm, len(cat))) * self.a[:, None]
            prod += self.b[:, None]
            prod %= p
            mins = np.minimum.reduceat(prod, offs, axis=1)  # (P, len(idx))
            out[idx] = mins.T
            start = end
        return out

    def band_keys(self, sig: np.ndarray) -> list[int]:
        """One stable 63-bit key per band (band index folded in)."""
        return self.band_keys_batch(sig[None, :])[0].tolist()

    def band_keys_batch(self, sigs: np.ndarray) -> np.ndarray:
        """(n, num_perm) signatures -> (n, bands) int64 band keys, fully
        vectorized: each band's rows fold by polynomial combine (wrap mod
        2^64 then Mersenne mod) with the band index mixed in — replaces a
        blake2b call per (doc, band)."""
        s = sigs.reshape(len(sigs), self.bands, self.rows)
        acc = np.zeros((len(sigs), self.bands), dtype=np.uint64)
        for k in range(self.rows):
            acc *= _SHINGLE_MIX
            acc += s[:, :, k]
        acc *= _SHINGLE_MIX
        acc += np.arange(self.bands, dtype=np.uint64)[None, :]
        acc %= np.uint64(_MERSENNE)
        return acc.astype(np.int64)


# -- SimHash ----------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (Charikar 2002), vectorized: token
    hashes come from the shared per-process cache, the ±1 bit-vote matrix
    is one ``unpackbits`` + column sum (no per-token Python loop)."""
    toks = tokens(text)
    if not toks:
        return 0
    th = _token_hashes(toks)
    bits = np.unpackbits(
        np.ascontiguousarray(th).view(np.uint8).reshape(len(th), 8), axis=1
    )  # (T, 64); bit order is a fixed permutation — irrelevant for hamming
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(th)
    packed = np.packbits(votes > 0)
    return int.from_bytes(packed.tobytes(), "big")


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
