"""Distributed KMeans (Lloyd's) over an embedding column.

The reference has no clustering; this is the training-data-pipeline op
(diversity bucketing / IVF-style coarse quantization done on the FULL
corpus, not a driver sample — contrast ``similarity.IVFIndex.train``,
which k-means a driver-side sample only).

Scale shape per iteration:
  * centroids broadcast ONCE via ``ray.put`` (k x d floats — tiny);
  * one ``map_batches`` pass assigns every row vectorized (one numpy
    matmul per batch) and emits <= k PARTIAL rows per block
    (cluster, n, per-dimension sums) — the classic map-side combine;
  * the partials re-aggregate through ``grouped_sums`` (distributed
    fan-in), so the driver only ever reads k finished rows.
Nothing row-sized crosses an exchange and nothing is materialized; the
corpus is re-streamed from storage each iteration (at 100 TB the scan is
cheaper than pinning the dataset in the object store across iterations).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from . import process_cached
from .agg import grouped_sums
from .similarity import _as_matrix


def _assign_partials(ds: rd.Dataset, vec_col: str, cent_ref) -> rd.Dataset:
    class Assign:
        def __init__(self) -> None:
            self.c = ray.get(cent_ref)  # (k, d) float64
            self.c_sq = (self.c * self.c).sum(axis=1)

        def __call__(self, t: pa.Table) -> pa.Table:
            k, d = self.c.shape
            if t.num_rows == 0:  # zero-row blocks survive upstream filters
                cols = {"cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64())}
                cols.update({f"s{j}": pa.array([], pa.float64())
                             for j in range(d)})
                return pa.table(cols)
            m = _as_matrix(t[vec_col]).astype(np.float64)
            # argmin ||x - c||^2 == argmin (||c||^2 - 2 x.c); ||x||^2 drops
            d2 = self.c_sq[None, :] - 2.0 * (m @ self.c.T)
            lab = d2.argmin(axis=1)
            n = np.bincount(lab, minlength=k).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, lab, m)
            present = n > 0
            cols = {"cluster": pa.array(
                        np.arange(k, dtype=np.int64)[present]),
                    "n": pa.array(n[present])}
            for j in range(d):
                cols[f"s{j}"] = pa.array(sums[present, j])
            return pa.table(cols)

    return ds.map_batches(process_cached(Assign), batch_format="pyarrow",
                          zero_copy_batch=True)


def kmeans_fit(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 10,
    tol: float = 1e-6,
    sample_n: int = 2048,
) -> np.ndarray:
    """Lloyd's over the full dataset; returns (k, d) float64 centroids.

    Init is the deterministic unbiased ``hash_head`` sample (md5-ordered,
    rerun-stable, no RNG) refined by a few driver-local rounds — then every
    full-data iteration is one streamed pass emitting k-row partials."""
    from .sampling import hash_head

    rows = hash_head(ds, id_col, sample_n).take_all()  # sample_n rows
    sm = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    if sm.shape[0] < k:
        raise ValueError(f"need >= {k} rows to fit {k} clusters")
    # maximin (farthest-point) init: deterministic kmeans++-style spread —
    # first-k init can land every seed in one blob and Lloyd's never
    # escapes that local minimum.
    chosen = [0]
    d_min = ((sm - sm[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d_min.argmax())
        chosen.append(nxt)
        d_min = np.minimum(d_min, ((sm - sm[nxt]) ** 2).sum(axis=1))
    cent = sm[chosen].copy()
    for _ in range(3):  # cheap driver-local warm start on the sample
        d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sm @ cent.T)
        lab = d2.argmin(axis=1)
        for j in range(k):
            pts = sm[lab == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)

    d = cent.shape[1]
    for _ in range(iters):
        cent_ref = ray.put(cent)
        partials = _assign_partials(ds, vec_col, cent_ref)
        merged = grouped_sums(partials, ["cluster"],
                              ["n"] + [f"s{j}" for j in range(d)])
        rows = merged.take_all()  # <= k rows
        new = cent.copy()
        for r in rows:
            if r["n"] > 0:
                new[int(r["cluster"])] = np.array(
                    [r[f"s{j}"] for j in range(d)]) / r["n"]
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift < tol:
            break
    return cent


def kmeans_assign(
    ds: rd.Dataset,
    vec_col: str,
    centroids: np.ndarray,
    out_col: str = "cluster",
) -> rd.Dataset:
    """Tag every row with its nearest centroid (broadcast once)."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Tag:
        def __init__(self) -> None:
            self.c = ray.get(cent_ref)
            self.c_sq = (self.c * self.c).sum(axis=1)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column(out_col, pa.array([], pa.int64()))
            m = _as_matrix(t[vec_col]).astype(np.float64)
            d2 = self.c_sq[None, :] - 2.0 * (m @ self.c.T)
            return t.append_column(
                out_col, pa.array(d2.argmin(axis=1).astype(np.int64)))

    return ds.map_batches(process_cached(Tag), batch_format="pyarrow",
                          zero_copy_batch=True)
