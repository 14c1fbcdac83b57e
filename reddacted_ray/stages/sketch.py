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
