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
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


# -- batched buffer-level digests -------------------------------------------
#
# hashlib has no batch API, so a digest per row is unavoidable — but the
# to_pylist() -> str -> .encode() round trip per row is not. These kernels
# hash the Arrow string column's utf-8 DATA BUFFER directly (memoryview
# slices, zero copies, no per-row Python string objects) and are
# bit-identical to their scalar counterparts (Arrow strings are utf-8, so
# ``buffer[o_i:o_{i+1}] == s.encode("utf-8")``). Locked by equivalence
# tests in tests/test_functions.py.


def _utf8_view(arr) -> tuple[np.ndarray, memoryview]:
    """(offsets, data) view of a string/large_string array's utf-8 bytes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        if not pa.types.is_string(arr.type):
            arr = pc.cast(arr, pa.string())
        odt = np.int32
    bufs = arr.buffers()
    if bufs[1] is None:  # some zero-length arrays carry no offsets buffer
        return np.zeros(len(arr) + 1, dtype=odt), memoryview(b"")
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return offs, data


def stable_hash64_batch(arr, seed: int = 0) -> np.ndarray:
    """Column version of ``stable_hash64`` (uint64). Non-string columns are
    cast with Arrow's string cast, which matches Python ``str()`` for
    integer and string keys (the supported key types)."""
    offs, data = _utf8_view(arr)
    key = seed.to_bytes(8, "little")
    b2 = hashlib.blake2b
    out = np.empty(len(offs) - 1, dtype=np.uint64)
    for i in range(len(out)):
        out[i] = int.from_bytes(
            b2(data[offs[i] : offs[i + 1]], digest_size=8, key=key).digest(),
            "little",
        )
    return out


def content_hash_batch(arr) -> np.ndarray:
    """Column version of ``content_hash`` (int64, 63-bit)."""
    return (stable_hash64_batch(arr) >> np.uint64(1)).astype(np.int64)


def md5_hex_batch(arr) -> list[str]:
    """Full 32-char md5 hexdigest per row (buffer-level; SQL ``md5()``
    parity for exact-dedup keys)."""
    offs, data = _utf8_view(arr)
    md5 = hashlib.md5
    return [
        md5(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(offs) - 1)
    ]


def md5_top32_batch(arr) -> np.ndarray:
    """Top 32 bits of ``md5(str(v))`` per row (uint64 < 2**32). Comparing
    these integers == comparing the first 8 hex chars of the md5 hexdigest
    lexicographically (the SQL-oracle split/sample key)."""
    offs, data = _utf8_view(arr)
    md5 = hashlib.md5
    out = np.empty(len(offs) - 1, dtype=np.uint64)
    for i in range(len(out)):
        out[i] = int.from_bytes(md5(data[offs[i] : offs[i + 1]]).digest()[:4], "big")
    return out


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


def tokens_flat_batch(texts: list[str]) -> tuple[pa.Array, np.ndarray]:
    """One Arrow RE2 tokenize pass for a whole column: ``(flat_tokens,
    doc_of_token)`` — the non-empty ``[a-z0-9]+`` tokens of every doc
    concatenated (doc order preserved) and each token's doc index.
    Lowercasing stays in Python: ``utf8_lower`` uses simple case mapping
    which diverges from ``str.lower`` on e.g. U+0130."""
    low = pa.array([t.lower() for t in texts], pa.string())
    sp = pc.split_pattern_regex(low, "[^a-z0-9]+")
    flat = pc.list_flatten(sp)
    offs = np.asarray(sp.offsets)
    # split emits empty strings at separator edges; drop them
    # (findall-equivalence: split on the complement class)
    nonempty = pc.greater(pc.binary_length(flat), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    doc_of_token = np.repeat(np.arange(len(texts)), np.diff(offs))
    return flat.filter(nonempty), doc_of_token[mask]


def tokens_hashed_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Token-hash stream for a whole column: ``(hashes, counts)`` where
    ``hashes`` is the uint64 concatenation of every doc's token hashes (doc
    order preserved) and ``counts[i]`` is doc i's token count.

    Bit-identical to ``_token_hashes(tokens(t))`` per doc, but the regex
    runs ONCE as an Arrow RE2 split over the column, and the token->hash
    map applies to the ``dictionary_encode`` uniques only (the vocabulary
    is Zipfian: uniques << tokens), then gathers by index — replacing the
    per-doc ``re.findall`` + per-token dict loop that dominated dedup cost
    (round-2 VERDICT #1)."""
    flat_ne, doc_ne = tokens_flat_batch(texts)
    counts = np.bincount(doc_ne, minlength=len(texts))
    enc = pc.dictionary_encode(flat_ne)
    uniq = enc.dictionary.to_pylist()
    cache = _TOKEN_HASH_CACHE
    uh = np.empty(len(uniq), dtype=np.uint64)
    for i, t in enumerate(uniq):
        h = cache.get(t)
        if h is None:
            if len(cache) > 1_000_000:
                cache.clear()
            h = cache[t] = stable_hash64(t)
        uh[i] = h
    idx = enc.indices.to_numpy(zero_copy_only=False)
    hashes = uh[idx] if len(idx) else np.empty(0, dtype=np.uint64)
    return hashes, counts


def _segment_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated ``[starts[i], starts[i]+lens[i])`` ranges, vectorized."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, dtype=np.int64)
    out = np.repeat(starts.astype(np.int64), lens)
    base = np.concatenate([[0], np.cumsum(lens)[:-1]])
    within = np.arange(tot, dtype=np.int64) - np.repeat(base, lens)
    return out + within


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
        """Per-doc reference path (the batch path is equivalence-tested
        against it; np.unique only prunes work — min ignores duplicates)."""
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

    def _shingle_concat(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """All docs' shingle hashes as ONE array (doc order) + per-doc
        counts. The sliding-window polynomial combine runs globally over
        the concatenated token-hash stream; positions whose window crosses
        a doc boundary are simply not gathered. Docs shorter than the
        shingle width get their degenerate whole-doc shingle via a tiny
        per-distinct-length vectorized pass."""
        th, tcounts = tokens_hashed_batch(texts)
        n = self.shingle_n
        T = len(th)
        tstarts = np.concatenate([[0], np.cumsum(tcounts)])
        scounts = np.zeros(len(texts), dtype=np.int64)
        long_mask = tcounts >= n
        scounts[long_mask] = tcounts[long_mask] - n + 1
        short_mask = (tcounts > 0) & (tcounts < n)
        scounts[short_mask] = 1
        out = np.empty(int(scounts.sum()), dtype=np.uint64)
        ostarts = np.concatenate([[0], np.cumsum(scounts)])
        if T >= n:
            hv_all = th[: T - n + 1].copy()
            for k in range(1, n):
                hv_all *= _SHINGLE_MIX
                hv_all += th[k : T - n + 1 + k]
            li = np.nonzero(long_mask)[0]
            if len(li):
                src = _segment_arange(tstarts[li], scounts[li])
                dst = _segment_arange(ostarts[li], scounts[li])
                out[dst] = hv_all[src]
        si = np.nonzero(short_mask)[0]
        if len(si):
            for length in np.unique(tcounts[si]):
                dd = si[tcounts[si] == length]
                hv = th[tstarts[dd]].copy()
                for k in range(1, int(length)):
                    hv *= _SHINGLE_MIX
                    hv += th[tstarts[dd] + k]
                out[ostarts[dd]] = hv
        out %= np.uint64(_MERSENNE)
        return out, scounts

    def signature(self, text: str) -> np.ndarray:
        return self.signature_batch([text])[0]

    def signature_batch(self, texts: list[str]) -> np.ndarray:
        """Signatures for a whole column at once — (n, num_perm) uint64.

        Shingle hashes for the whole batch come from one vectorized pass
        (``_shingle_concat``); the permutation products compute as one
        (num_perm, total_shingles) matrix and per-doc minima fall out of
        ``np.minimum.reduceat`` (min is order-independent, so batch ==
        per-doc exactly). Chunked so the temporary stays ~100 MB
        regardless of batch size."""
        n = len(texts)
        out = np.full((n, self.num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
        cat, counts = self._shingle_concat(texts)
        live = np.nonzero(counts > 0)[0]
        if not len(live):
            return out
        starts = np.concatenate([[0], np.cumsum(counts)])
        p = np.uint64(_MERSENNE)
        # chunk over docs so (num_perm x shingles) stays bounded
        max_shingles = max(1, 200_000 // self.num_perm * 64)
        start = 0
        while start < len(live):
            end = start
            tot = 0
            while end < len(live) and (tot == 0 or tot + counts[live[end]] <= max_shingles):
                tot += counts[live[end]]
                end += 1
            idx = live[start:end]
            # live docs are contiguous in `cat` (empty docs contribute zero
            # length), so the chunk is a plain slice
            lo = starts[idx[0]]
            chunk = cat[lo : starts[idx[-1] + 1]]
            offs = (starts[idx] - lo).astype(np.int64)
            # (a*h + b) mod p (wraps mod 2^64 first — same intentional
            # mixed-modulus arithmetic as the shingle combine).
            # broadcast_to instead of the outer-product spelling: numpy's
            # uint64 (P,1)x(1,S) broadcast multiply takes a ~25x slower
            # generic path than (P,S)x(P,1)
            prod = np.broadcast_to(chunk, (self.num_perm, len(chunk))) * self.a[:, None]
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


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Column version of ``simhash64`` (uint64 per doc, bit-identical).
    One tokenize+hash pass for the batch, per-doc bit-vote sums via
    ``np.add.reduceat`` over the shared unpacked-bit matrix."""
    th, counts = tokens_hashed_batch(texts)
    out = np.zeros(len(counts), dtype=np.uint64)
    live = np.nonzero(counts > 0)[0]
    if not len(live):
        return out
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    bits = np.unpackbits(
        np.ascontiguousarray(th).view(np.uint8).reshape(len(th), 8), axis=1
    )
    # (64, T) contiguous: reduceat along axis=1 runs ~5x faster than the
    # strided axis=0 spelling (measured)
    bt = np.ascontiguousarray(bits.T).astype(np.int32)
    sums = np.add.reduceat(bt, starts[live], axis=1).T  # (L, 64)
    votes = 2 * sums - counts[live][:, None]
    packed = np.packbits(votes > 0, axis=1).astype(np.uint64)  # (L, 8)
    acc = np.zeros(len(live), dtype=np.uint64)
    for j in range(8):  # big-endian byte composition, cf. int.from_bytes
        acc = (acc << np.uint64(8)) | packed[:, j]
    out[live] = acc
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
