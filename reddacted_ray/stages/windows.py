"""Bucketed vectorized per-group windowing.

``groupby(key).map_groups(fn)`` pays a Python call — and a DataFrame
construction — PER GROUP. Fine at 10^3 groups; at 10^8 users the per-call
overhead dominates the actual window math (round-2 VERDICT #9 stretch).

``grouped_vectorized`` keeps the exact same single-shuffle plan but
co-locates groups by a HASH BUCKET of the key: ``fn`` receives each
bucket's frame — ALL of its groups at once, ~n_groups/n_buckets each —
and computes with pandas' C-level grouped kernels (``groupby(...).cumsum/
head/agg`` over a sorted frame). Python-call count drops from O(groups)
to O(buckets) while results stay bit-identical (each group is wholly
inside one bucket; the kernels sort by key first, so group order within
the bucket is deterministic).

Pick ``n_buckets`` ~ 4-16x the cluster's core count: enough parallelism
for the shuffle, small enough that per-bucket frames stay memory-sized
(bucket mass ~ rows/n_buckets for hash-uniform keys; a single hot KEY
still lands in one bucket — cap it with a salted pre-aggregation when the
window math is re-aggregable, cf. q_salted_counts).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(col: pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        h = col.to_numpy(zero_copy_only=False).astype(np.uint64) * _GOLDEN
        return ((h >> np.uint64(17)) % np.uint64(n_buckets)).astype(np.int64)
    from ..functions.hashing import stable_hash64_batch

    return (stable_hash64_batch(col) % np.uint64(n_buckets)).astype(np.int64)


def ntile_of(pos: np.ndarray, cnt: np.ndarray, k: int) -> np.ndarray:
    """SQL NTILE(k) fill rule, vectorized over rank positions: with n
    rows in the partition the first ``n % k`` tiles take ``n // k + 1``
    rows, the rest ``n // k``. ``pos`` is the 0-based ORDER BY position
    within the partition, ``cnt`` the partition size (both per-row
    arrays); returns 1-based tile numbers."""
    small, extra = cnt // k, cnt % k
    cut = extra * (small + 1)
    tile = np.where(
        pos < cut,
        pos // np.maximum(small + 1, 1),
        extra + np.where(small > 0, (pos - cut) // np.maximum(small, 1), 0),
    )
    return (tile + 1).astype(np.int64)


def grouped_vectorized(
    ds: rd.Dataset,
    key_col: str,
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
) -> rd.Dataset:
    """Apply ``bucket_fn`` to each hash bucket of complete key groups.

    ``bucket_fn`` sees a frame holding every row of every key hashing to
    the bucket (no ``_bucket`` column) and should use vectorized pandas
    ``groupby(key_col, sort=False)`` kernels internally."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(_bucket_of(t[key_col], n_buckets))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=["_bucket"]))

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
    return keyed.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def per_group_head_prune(
    ds: rd.Dataset,
    group_col: str,
    order_col,
    cap: int,
) -> rd.Dataset:
    """Per-BLOCK prune to the ``cap`` lowest-``order_col`` rows per
    group — the exchange bound for a global per-group head cap (r5
    VERDICT #2). The global first-``cap`` rows of a group are
    necessarily within every block's local first-``cap`` (a row among
    the global cap-smallest is among its block's cap-smallest), so
    pruning before the co-locating shuffle is lossless for the final
    head/rank cap while bounding what one hot source ships to its
    bucket from |source| rows to ``cap × blocks``. Downstream ranks
    over the pruned set equal global ranks for every surviving row:
    all order-predecessors of a global-top-``cap`` row are themselves
    global-top-``cap`` and therefore survive the prune. ``order_col``
    may be a list for composite (e.g. tie-broken) orders."""
    import pyarrow.compute as pc

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= cap:
            return t
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending")]
                              + [(c, "ascending") for c in order_cols])
        srt = t.take(idx)
        g = srt[group_col].to_numpy(zero_copy_only=False)
        new = np.r_[True, g[1:] != g[:-1]]
        pos = np.arange(len(g), dtype=np.int64)
        rn = pos - np.maximum.accumulate(np.where(new, pos, 0))
        return srt.filter(pa.array(rn < cap))

    return ds.map_batches(prune, batch_format="pyarrow",
                          zero_copy_batch=True)


def ordered_prefix_sum(
    ds: rd.Dataset,
    order_col: str,
    val_col: str,
    range_width: int = 100_000,
    out_col: str = "prefix_sum",
    n_buckets: int = 64,
) -> rd.Dataset:
    """Distributed INCLUSIVE prefix sum of ``val_col`` in global
    ``order_col`` order (SQL ``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED
    PRECEDING)``) — the primitive behind sequence packing, global
    rank-by-position, and ordered quota cuts.

    Custom operator (Ray Data has no ordered scan). Shape: ``order_col``
    buckets into FIXED-WIDTH key ranges (``key // range_width``) — a
    deterministic range partitioning that needs NO sort shuffle; one
    slim (range, sum) exchange gives per-range totals, the driver runs
    an exclusive scan over the ordered ranges (bounded by key-domain /
    range_width rows) and broadcasts the offsets; each range then
    cumsums locally inside the bucketed shuffle and adds its offset.

    Partitioning assumptions (documented per the custom-operator
    contract): ``order_col`` is a non-negative integer key, globally
    UNIQUE (ties would make 'global order' ambiguous), and the number
    of distinct ranges (max_key / range_width) stays driver-sized —
    pick ``range_width`` accordingly for the key domain."""
    return _ordered_prefix(ds, order_col, val_col, range_width, out_col,
                           n_buckets, op="sum")


def ordered_prefix_max(
    ds: rd.Dataset,
    order_col: str,
    val_col: str,
    range_width: int = 100_000,
    out_col: str = "prefix_max",
    n_buckets: int = 64,
) -> rd.Dataset:
    """Distributed INCLUSIVE running max in global ``order_col`` order
    (SQL ``MAX(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``) — the
    watermark primitive for streaming late-data semantics. Same
    range-partitioned shape and key contract as ``ordered_prefix_sum``;
    the driver scan and the in-bucket combine use max instead of +."""
    return _ordered_prefix(ds, order_col, val_col, range_width, out_col,
                           n_buckets, op="max")


def _ordered_prefix(
    ds: rd.Dataset,
    order_col: str,
    val_col: str,
    range_width: int,
    out_col: str,
    n_buckets: int,
    op: str,
) -> rd.Dataset:
    from ray.data.aggregate import Max, Sum

    def tag(t: pa.Table) -> pa.Table:
        rng = pa.compute.divide(
            pa.compute.cast(t[order_col], pa.int64()),
            pa.scalar(range_width, pa.int64()))
        return t.append_column("_rng", rng)

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    agg = (Sum if op == "sum" else Max)(val_col, alias_name="_s")
    partials = (tagged.groupby("_rng")
                .aggregate(agg).to_pandas()
                .sort_values("_rng"))
    sums = partials["_s"].to_numpy()
    if op == "sum":
        scan = np.r_[0, np.cumsum(sums)[:-1]]
    else:
        lowest = np.iinfo(np.int64).min
        scan = np.r_[lowest, np.maximum.accumulate(sums)[:-1]]
    offsets = dict(zip(partials["_rng"].astype(int),
                       scan.astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # the bucket holds MANY ranges (grouped_vectorized contract):
        # grouped scan per range combined with that range's broadcast
        # exclusive-prefix offset
        g = g.sort_values(["_rng", order_col], kind="mergesort")
        grp = g.groupby("_rng", sort=False)[val_col]
        off = g["_rng"].map(offsets).fillna(0).to_numpy(dtype=np.int64)
        out = g.drop(columns=["_rng"]).copy()
        if op == "sum":
            out[out_col] = grp.cumsum().to_numpy() + off
        else:
            out[out_col] = np.maximum(grp.cummax().to_numpy(), off)
        return out

    return grouped_vectorized(tagged, "_rng", per_bucket,
                              n_buckets=n_buckets)


def cogrouped_vectorized(
    ds_a: rd.Dataset,
    ds_b: rd.Dataset,
    key_a: str,
    key_b: str,
    bucket_fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
) -> rd.Dataset:
    """CoGroup two datasets on a shared key domain in ONE co-locating
    shuffle (Spark's cogroup; Ray Data has no native analog): both
    sides are typed-null padded to a common schema, side-tagged,
    unioned, and hash-bucketed by key, so ``bucket_fn(a_frame,
    b_frame)`` sees every row of BOTH sides for every key hashing to
    the bucket. Use for per-key logic a join can't express without
    fanout (stream merges, full-outer per-key aggregation, asymmetric
    window alignment).

    Partitioning assumptions (custom-operator contract): keys on both
    sides are hash-compatible (same dtype family — both int or both
    string); payload column NAMES must be disjoint between the sides
    (the pad makes them one flat schema); ``bucket_fn`` must compute
    per-key groups internally (a bucket holds many keys) and gets each
    side's frame WITHOUT the pad columns, key column named ``_key``."""
    sa = dict(zip(ds_a.schema().names, ds_a.schema().types))
    sb = dict(zip(ds_b.schema().names, ds_b.schema().types))
    a_cols = [n for n in sa if n != key_a]
    b_cols = [n for n in sb if n != key_b]
    clash = set(a_cols) & set(b_cols)
    if clash:
        raise ValueError(f"cogroup payload columns must be disjoint: {clash}")

    def widen(key_col: str, own: list, other: list, other_t: dict,
              side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {"_key": t[key_col]}
            for c in own:
                cols[c] = t[c]
            for c in other:
                cols[c] = pa.nulls(n, other_t[c])
            cols["_side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)

        return fn

    wa = ds_a.map_batches(widen(key_a, a_cols, b_cols, sb, 0),
                          batch_format="pyarrow", zero_copy_batch=True)
    wb = ds_b.map_batches(widen(key_b, b_cols, a_cols, sa, 1),
                          batch_format="pyarrow", zero_copy_batch=True)
    # align column ORDER (union is positional in arrow terms)
    order = ["_key"] + a_cols + b_cols + ["_side"]
    wa = wa.map_batches(lambda t: t.select(order),
                        batch_format="pyarrow", zero_copy_batch=True)
    wb = wb.map_batches(lambda t: t.select(order),
                        batch_format="pyarrow", zero_copy_batch=True)
    unioned = wa.union(wb)

    def split(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_side"].to_numpy()
        af = g.loc[side == 0, ["_key"] + a_cols]
        bf = g.loc[side == 1, ["_key"] + b_cols]
        return bucket_fn(af, bf)

    return grouped_vectorized(unioned, "_key", split,
                              n_buckets=n_buckets)
