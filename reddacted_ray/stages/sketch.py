"""Mergeable distinct-count sketch (KMV / bottom-k) as a Ray Data stage.

For approximate COUNT DISTINCT at 100 TB scale: each batch emits one
serialized sketch (its k smallest stable hashes); sketches merge
associatively in a tiny reduce — the guide's "emit one mergeable sketch per
batch" pattern. Estimate: (k - 1) / max_of_k_smallest (unit-interval KMV
estimator, Bar-Yossef et al. 2002 — public knowledge). Error ~ 1/sqrt(k).

The exact path (`q_distinct_users`) stays SQL-checkable; this sketch is
covered by a tolerance unit test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import stable_hash64

_SCALE = float(1 << 63)


class KMVSketch:
    __slots__ = ("k", "values")

    def __init__(self, k: int = 1024, values: np.ndarray | None = None) -> None:
        self.k = k
        self.values = (
            values if values is not None else np.empty(0, dtype=np.uint64)
        )

    def add_hashes(self, hs: np.ndarray) -> "KMVSketch":
        merged = np.concatenate([self.values, hs.astype(np.uint64)])
        merged = np.unique(merged)  # sorted + deduped
        return KMVSketch(self.k, merged[: self.k])

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        return self.add_hashes(other.values)

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:  # saw fewer than k distinct hashes -> exact
            return float(n)
        kth = float(self.values[self.k - 1]) / _SCALE  # 63-bit hash -> (0,1)
        return (self.k - 1) / kth

    def serialize(self) -> bytes:
        return self.values.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, k: int) -> "KMVSketch":
        return cls(k, np.frombuffer(data, dtype=np.uint64).copy())


def approx_distinct(
    ds: rd.Dataset, col: str, k: int = 1024
) -> float:
    """Approximate distinct count of ``col``: one sketch per batch (parallel
    map), merged on the driver (tiny: <= k uint64 each)."""

    def per_batch(t: pa.Table) -> pa.Table:
        hs = np.array(
            [stable_hash64(str(v)) >> 1 for v in t[col].to_pylist()],
            dtype=np.uint64,
        )
        sk = KMVSketch(k).add_hashes(hs)
        return pa.table({"sketch": pa.array([sk.serialize()], pa.binary())})

    parts = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    acc = KMVSketch(k)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["sketch"].to_pylist():
            acc = acc.merge(KMVSketch.deserialize(blob, k))
    return acc.estimate()


# ---------------------------------------------------------------------------
# Mergeable heavy-hitters summary (Misra-Gries)
# ---------------------------------------------------------------------------


def _mg_compress(counts: dict, err: int, k: int) -> tuple[dict, int]:
    """Shrink to <= k counters by subtracting the (k+1)-th largest count
    from every counter and dropping non-positives (Misra-Gries step). The
    subtracted amount accumulates into ``err`` — the one-sided undercount
    bound every surviving counter carries."""
    if len(counts) <= k:
        return counts, err
    vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))[::-1]
    thresh = int(vals[k])
    return (
        {key: c - thresh for key, c in counts.items() if c > thresh},
        err + thresh,
    )


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 64) -> pa.Table:
    """Approximate top frequent values of ``col`` via MERGEABLE Misra-Gries
    summaries (Agarwal et al., "Mergeable Summaries", PODS 2012 — public):
    each batch emits one <= k-counter summary; summaries merge
    associatively (add counts, re-compress) in a tiny driver reduce — raw
    values never leave their block, so the wide step ships O(k) rows per
    block regardless of data size.

    Returns (item, count_lower, count_upper) sorted by count_lower desc:
    the true count is guaranteed inside [count_lower, count_upper], and
    every item with true count > total_error (~= n/(k+1) worst case,
    reported as count_upper - count_lower) is guaranteed present. The
    EXACT SQL-checkable path is ``q_top_terms``; this is its one-pass
    no-shuffle sibling for 100 TB cardinalities."""

    def per_batch(t: pa.Table) -> pa.Table:
        vc = pa.chunked_array(t[col]).value_counts()
        counts = dict(
            zip(
                (str(v) for v in vc.field("values").to_pylist()),
                (int(c) for c in vc.field("counts").to_pylist()),
            )
        )
        counts, err = _mg_compress(counts, 0, k)
        # ONE row per summary (list-typed), so downstream re-blocking can
        # never split a summary or conflate two summaries' err terms
        return pa.table(
            {
                "items": pa.array([list(counts.keys())], pa.list_(pa.string())),
                "counts": pa.array([list(counts.values())], pa.list_(pa.int64())),
                "err": pa.array([err], pa.int64()),
            }
        )

    parts = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    acc: dict = {}
    total_err = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        for items, counts, err in zip(
            b["items"].to_pylist(), b["counts"].to_pylist(), b["err"].to_pylist()
        ):
            total_err += int(err)
            for item, c in zip(items, counts):
                acc[item] = acc.get(item, 0) + c
            acc, total_err = _mg_compress(acc, total_err, k)
    items = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {
            "item": pa.array([i for i, _ in items], pa.string()),
            "count_lower": pa.array([c for _, c in items], pa.int64()),
            "count_upper": pa.array([c + total_err for _, c in items], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary (per-block order-statistic compaction)
# ---------------------------------------------------------------------------

def approx_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], k: int = 256
) -> list[float]:
    """Approximate quantiles of a CONTINUOUS column at scale.

    Each block compacts its sorted values into <= ``k`` evenly spaced order
    statistics, each weighted by the rows it represents; the per-block
    summaries (k floats each — tiny) merge on the driver as a weighted
    quantile. Deterministic (no sampling RNG); per-block rank error is
    <= n_block / k, so overall error ~ 1/k of the data per block boundary.
    The exact path for low-cardinality columns is ``q_quantiles``
    (value-counts two-phase); this is its continuous-column sibling."""

    def per_block(t: pa.Table) -> pa.Table:
        v = np.sort(
            t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        n = len(v)
        if n == 0:
            return pa.table(
                {"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        m = min(k, n)
        idx = np.round(np.linspace(0, n - 1, m)).astype(np.int64)
        w = np.full(m, n / m, dtype=np.float64)
        return pa.table({"v": pa.array(v[idx]), "w": pa.array(w)})

    parts = ds.map_batches(per_block, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    parts = parts.sort_values("v", kind="mergesort")
    cum = parts["w"].cumsum().to_numpy()
    total = float(cum[-1]) if len(cum) else 0.0
    vals = parts["v"].to_numpy()
    out = []
    for q in qs:
        if total == 0.0:
            out.append(float("nan"))
            continue
        j = int(np.searchsorted(cum, q * total, side="left"))
        out.append(float(vals[min(j, len(vals) - 1)]))
    return out


def grouped_approx_quantiles(
    ds: rd.Dataset, group_col: str, col: str, qs: list[float], k: int = 128
) -> "object":
    """Per-GROUP approximate quantiles at scale.

    Same per-block order-statistic compaction as ``approx_quantiles``, but
    emitted per (block, group); the only wide step shuffles the compacted
    summaries (<= k rows per group per block), never the raw values, and
    each group's summaries merge independently in ``map_groups``. Returns
    a Dataset (group_col, q, value)."""
    import pandas as pd

    def per_block(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t[group_col].to_pandas(),
                "v": t[col].to_pandas().astype("float64"),
            }
        )
        gs, vs, ws = [], [], []
        for g, sub in df.groupby("g", sort=False):
            v = np.sort(sub["v"].to_numpy())
            m = min(k, len(v))
            idx = np.round(np.linspace(0, len(v) - 1, m)).astype(np.int64)
            gs.extend([g] * m)
            vs.extend(v[idx].tolist())
            ws.extend([len(v) / m] * m)
        return pa.table(
            {
                group_col: pa.array(gs),
                "v": pa.array(vs, pa.float64()),
                "w": pa.array(ws, pa.float64()),
            }
        )

    summaries = ds.map_batches(per_block, batch_format="pyarrow",
                               zero_copy_batch=True)

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("v", kind="mergesort")
        cum = g["w"].cumsum().to_numpy()
        total = float(cum[-1])
        vals = g["v"].to_numpy()
        out_q, out_v = [], []
        for q in qs:
            j = int(np.searchsorted(cum, q * total, side="left"))
            out_q.append(q)
            out_v.append(float(vals[min(j, len(vals) - 1)]))
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]] * len(qs),
                "q": out_q,
                "value": out_v,
            }
        )

    return summaries.groupby(group_col).map_groups(merge, batch_format="pandas")


# -- Bloom filter (mergeable membership sketch) ------------------------------

_SPLITMIX_C1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C3 = np.uint64(0x94D049BB133111EB)
_BLOOM_ODD = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixer)."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _SPLITMIX_C1)
        z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C2
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C3
        return z ^ (z >> np.uint64(31))


def column_hashes64(col) -> np.ndarray:
    """uint64 hashes of an Arrow column: vectorized splitmix64 for integer
    keys, keyed blake2b for strings/binary (shared with the dedup family)."""
    if pa.types.is_integer(col.type):
        return _mix64(
            col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )
    from ..functions.hashing import stable_hash64_batch

    return stable_hash64_batch(col)


class BloomFilter:
    """Fixed-size mergeable Bloom filter (double hashing, Kirsch-
    Mitzenmacher): k probe positions derive from two 64-bit hashes, so
    membership tests are k vectorized gathers. Same-shape filters merge by
    bitwise OR — build one per block, OR the (n_bits/8)-byte summaries;
    the key set itself never moves. No false negatives; false-positive
    rate ~ (1 - e^{-kn/m})^k."""

    __slots__ = ("n_bits", "k", "words")

    def __init__(self, n_bits: int = 1 << 20, k: int = 5,
                 words: np.ndarray | None = None) -> None:
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = k
        self.words = (
            words if words is not None
            else np.zeros(n_bits // 64, dtype=np.uint64)
        )

    def _positions(self, hs: np.ndarray) -> np.ndarray:
        """(k, n) probe positions for n key hashes."""
        with np.errstate(over="ignore"):
            h1 = hs
            # n_bits is a power of two, so `mod n_bits` keeps only LOW
            # bits — derive h2 from the HIGH bits or two keys sharing
            # low bits would share their entire probe sequence
            h2 = ((hs >> np.uint64(32)) * _BLOOM_ODD) | np.uint64(1)
            i = np.arange(self.k, dtype=np.uint64)[:, None]
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.n_bits)).astype(np.int64)

    def add_hashes(self, hs: np.ndarray) -> "BloomFilter":
        pos = self._positions(hs).ravel()
        np.bitwise_or.at(
            self.words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )
        return self

    def contains_hashes(self, hs: np.ndarray) -> np.ndarray:
        pos = self._positions(hs)
        bits = (self.words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        self.words |= other.words
        return self

    def serialize(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, n_bits: int, k: int) -> "BloomFilter":
        return cls(n_bits, k, np.frombuffer(data, np.uint64).copy())


def bloom_from_column(
    ds: rd.Dataset, col: str, n_bits: int = 1 << 20, k: int = 5
) -> BloomFilter:
    """Distributed Bloom build: each block emits ONE (n_bits/8)-byte
    summary, a distributed fan-in level ORs up to 64 summaries per task
    (associative), and the driver merges only the fan-in survivors — so
    driver bytes stay O(blocks/64), not O(blocks), at 100 TB block
    counts. The use: build over the SMALL join side, broadcast the
    fixed-size filter, and prefilter the BIG side's rows before they
    enter the join shuffle."""

    def per_block(t: pa.Table) -> pa.Table:
        b = BloomFilter(n_bits, k).add_hashes(column_hashes64(t[col]))
        return pa.table({"bloom": pa.array([b.serialize()], pa.binary())})

    def merge_batch(t: pa.Table) -> pa.Table:
        acc = BloomFilter(n_bits, k)
        for blob in t["bloom"].to_pylist():
            acc.merge(BloomFilter.deserialize(blob, n_bits, k))
        return pa.table({"bloom": pa.array([acc.serialize()], pa.binary())})

    parts = ds.map_batches(per_block, batch_format="pyarrow",
                           zero_copy_batch=True)
    parts = parts.map_batches(merge_batch, batch_size=64,
                              batch_format="pyarrow")
    out = BloomFilter(n_bits, k)
    for batch in parts.iter_batches(batch_format="pyarrow"):
        for blob in batch["bloom"].to_pylist():
            out.merge(BloomFilter.deserialize(blob, n_bits, k))
    return out


def bloom_prefilter(ds: rd.Dataset, col: str, bloom: BloomFilter,
                    invert: bool = False) -> rd.Dataset:
    """Drop rows whose ``col`` is definitely NOT in the filtered key set
    (no false negatives — every true match survives; survivors still need
    the exact verify/join). One ``ray.put`` broadcast, k gathers/batch.

    ``invert=True`` keeps the COMPLEMENT — rows certainly absent from
    the set (the certainty direction: Bloom absence is exact). The
    incremental-dedup pattern uses both: absent rows are novel with no
    join at all; present-maybe rows go to the exact anti-join."""
    import ray

    from . import process_cached

    ref = ray.put((bloom.serialize(), bloom.n_bits, bloom.k, invert))

    class Pre:
        def __init__(self) -> None:
            blob, n_bits, k, inv = ray.get(ref)
            self.bloom = BloomFilter.deserialize(blob, n_bits, k)
            self.inv = inv

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = self.bloom.contains_hashes(column_hashes64(t[col]))
            return t.filter(pa.array(~mask if self.inv else mask))

    return ds.map_batches(process_cached(Pre), batch_format="pyarrow",
                          zero_copy_batch=True)


# -- Count-Min sketch (mergeable frequency estimation) -----------------------


class CountMinSketch:
    """Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005 — public):
    a depth x width counter grid; each key increments one counter per row
    (double hashing, same Kirsch-Mitzenmacher derivation as the Bloom
    filter), point queries take the min over rows. Estimates OVERCOUNT
    only — est >= true always; est <= true + eps*N with probability
    1 - delta for width = ceil(e/eps), depth = ceil(ln 1/delta).
    Same-shape sketches merge by elementwise ADD, so one fixed-size
    summary per block + a driver (or tree) sum replaces shuffling the
    raw keys."""

    __slots__ = ("width", "depth", "table")

    def __init__(self, width: int = 2048, depth: int = 4,
                 table: np.ndarray | None = None) -> None:
        self.width = width
        self.depth = depth
        self.table = (
            table if table is not None
            else np.zeros((depth, width), dtype=np.int64)
        )

    def _positions(self, hs: np.ndarray) -> np.ndarray:
        """(depth, n) counter columns for n key hashes."""
        with np.errstate(over="ignore"):
            h2 = ((hs >> np.uint64(32)) * _BLOOM_ODD) | np.uint64(1)
            i = np.arange(self.depth, dtype=np.uint64)[:, None]
            return ((hs[None, :] + i * h2[None, :])
                    % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, hs: np.ndarray,
                   counts: np.ndarray | None = None) -> "CountMinSketch":
        pos = self._positions(hs)
        w = (np.ones(len(hs), np.int64) if counts is None
             else counts.astype(np.int64))
        for r in range(self.depth):
            np.add.at(self.table[r], pos[r], w)
        return self

    def estimate_hashes(self, hs: np.ndarray) -> np.ndarray:
        pos = self._positions(hs)
        return np.min(
            np.stack([self.table[r][pos[r]] for r in range(self.depth)]),
            axis=0,
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, width: int, depth: int) -> "CountMinSketch":
        return cls(width, depth,
                   np.frombuffer(data, np.int64).reshape(depth, width).copy())


def cm_from_column(
    ds: rd.Dataset, col: str, width: int = 2048, depth: int = 4
) -> CountMinSketch:
    """Distributed Count-Min build: pre-aggregate value counts inside each
    block (value_counts — one counter update per DISTINCT value, not per
    row), emit ONE (depth*width*8)-byte summary per block, add-merge on
    the driver. Point frequencies over 100 TB then cost zero shuffle."""

    def per_block(t: pa.Table) -> pa.Table:
        vc = pa.chunked_array(t[col]).value_counts()
        sk = CountMinSketch(width, depth).add_hashes(
            column_hashes64(vc.field("values")),
            vc.field("counts").to_numpy(zero_copy_only=False),
        )
        return pa.table({"cm": pa.array([sk.serialize()], pa.binary())})

    out = CountMinSketch(width, depth)
    for batch in ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["cm"].to_pylist():
            out.merge(CountMinSketch.deserialize(blob, width, depth))
    return out


# -- Grouped approximate distinct count (KMV per group) ----------------------


def grouped_approx_distinct(
    ds: rd.Dataset, group_col: str, col: str, k: int = 256
) -> rd.Dataset:
    """Approximate COUNT(DISTINCT col) per group: each block emits one
    <= k-hash KMV summary PER GROUP PRESENT (sort-segmented, vectorized
    hashing); only those fixed-size summaries shuffle to the per-group
    merge. Exact below k distinct; error ~ 1/sqrt(k) above. The exact
    SQL path is a two-phase distinct groupby — this sibling bounds the
    wide step at O(groups * k * 8) bytes regardless of row count."""
    import pandas as pd

    def per_block(t: pa.Table) -> pa.Table:
        hs = column_hashes64(t[col]) >> np.uint64(1)  # 63-bit, KMV scale
        g = t[group_col].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g_sorted, hs_sorted = g[order], hs[order]
        uniq, starts = np.unique(g_sorted, return_index=True)
        bounds = np.append(starts, len(g_sorted))
        sks = [
            KMVSketch(k).add_hashes(hs_sorted[bounds[i]:bounds[i + 1]])
            for i in range(len(uniq))
        ]
        return pa.table({
            group_col: pa.array(uniq.tolist(), t[group_col].type),
            "sketch": pa.array([s.serialize() for s in sks], pa.binary()),
        })

    summaries = ds.map_batches(per_block, batch_format="pyarrow",
                               zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = KMVSketch(k)
        for blob in df["sketch"]:
            acc = acc.merge(KMVSketch.deserialize(bytes(blob), k))
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            "approx_distinct": [acc.estimate()],
        })

    return summaries.groupby(group_col).map_groups(merge, batch_format="pandas")


# -- HyperLogLog (constant-size mergeable distinct-count sketch) -------------


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized floor(log2(x))+1 for uint64 (0 for x==0) via binary
    shifts — no float64 log2, whose 53-bit mantissa misrounds near 2^k."""
    x = x.copy()
    r = np.zeros(len(x), dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += np.uint64(s)
        x[m] >>= np.uint64(s)
    r[x > 0] += np.uint64(1)
    return r


class HLLSketch:
    """HyperLogLog (Flajolet et al. 2007 — public): 2^p one-byte
    registers, each the max leading-zero run of hashes routed to it.
    Relative error ~ 1.04/sqrt(2^p) at CONSTANT size (vs KMV's k stored
    hashes), with linear-counting correction in the small range; 64-bit
    hashes need no large-range correction. Same-p sketches merge by
    elementwise max — the associative summary shape."""

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 12, regs: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.regs = (
            regs if regs is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hs: np.ndarray) -> "HLLSketch":
        hs = hs.astype(np.uint64)
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rem = hs & ((np.uint64(1) << np.uint64(64 - self.p)) - np.uint64(1))
        rho = (np.uint64(64 - self.p) - _bitlen_u64(rem) + np.uint64(1)).astype(
            np.uint8
        )
        np.maximum.at(self.regs, idx, rho)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-self.regs.astype(np.float64)))
        zeros = int(np.count_nonzero(self.regs == 0))
        if e <= 2.5 * m and zeros:
            return float(m * np.log(m / zeros))  # linear counting
        return float(e)

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        assert self.p == other.p
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def serialize(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int) -> "HLLSketch":
        return cls(p, np.frombuffer(data, np.uint8).copy())


def hll_from_column(ds: rd.Dataset, col: str, p: int = 12) -> HLLSketch:
    """Distributed HLL build: one 2^p-byte summary per block, distributed
    64-way fan-in max-merge, tiny driver finish — approximate COUNT
    DISTINCT whose wide step is O(blocks/64 * 2^p) bytes total."""

    def per_block(t: pa.Table) -> pa.Table:
        sk = HLLSketch(p).add_hashes(column_hashes64(t[col]))
        return pa.table({"hll": pa.array([sk.serialize()], pa.binary())})

    def merge_batch(t: pa.Table) -> pa.Table:
        acc = HLLSketch(p)
        for blob in t["hll"].to_pylist():
            acc.merge(HLLSketch.deserialize(blob, p))
        return pa.table({"hll": pa.array([acc.serialize()], pa.binary())})

    parts = ds.map_batches(per_block, batch_format="pyarrow",
                           zero_copy_batch=True)
    parts = parts.map_batches(merge_batch, batch_size=64,
                              batch_format="pyarrow")
    out = HLLSketch(p)
    for batch in parts.iter_batches(batch_format="pyarrow"):
        for blob in batch["hll"].to_pylist():
            out.merge(HLLSketch.deserialize(blob, p))
    return out
