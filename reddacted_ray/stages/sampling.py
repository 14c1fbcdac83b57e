"""Deterministic sampling / splitting operators for training-data prep.

A 100 TB corpus is never split by ``random()``: assignments must be stable
across reruns, machines and engines, so everything here keys on
``md5(str(id))`` — reproducible, uniform, and expressible in ANSI SQL
(DuckDB ``md5()``) so the driver can oracle-check exact parity. No state,
no shuffle for the split itself (a pure ``map_batches``); the stratified
sampler's only wide step is the per-group groupby.

Semantics:
  * ``hash_split`` — assign each row to a named split by comparing the
    first 8 hex chars of ``md5(str(id))`` against cumulative-fraction
    thresholds (hex-string comparison == numeric comparison of the hash's
    top 32 bits; no float anywhere).
  * ``stratified_sample`` — per group, keep the ``n`` rows with the
    smallest ``(md5(str(id)), id)`` — a deterministic "random" n-per-group
    sample (SQL: ``row_number() OVER (PARTITION BY g ORDER BY md5, id)``).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _md5_hex8(val) -> str:
    return hashlib.md5(str(val).encode()).hexdigest()[:8]


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """[(name, upper-bound hex8)] with cumulative fractions over 2^32.
    The last split's bound is 'ffffffff'+1 territory (catch-all)."""
    total = sum(splits.values())
    out = []
    acc = 0.0
    names = list(splits)
    for i, name in enumerate(names):
        acc += splits[name] / total
        bound = "g" * 8 if i == len(names) - 1 else format(int(acc * 2**32), "08x")
        out.append((name, bound))
    return out


def hash_split(
    ds: rd.Dataset, id_col: str, splits: dict[str, float]
) -> rd.Dataset:
    """Append a ``split`` column with the row's deterministic assignment."""
    bounds = split_thresholds(splits)

    def assign(t: pa.Table) -> pa.Table:
        names = []
        for v in t[id_col].to_pylist():
            h = _md5_hex8(v)
            for name, bound in bounds:
                if h < bound:
                    names.append(name)
                    break
        return t.append_column("split", pa.array(names, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def write_bucketed(
    ds: rd.Dataset, key_col: str, n_buckets: int, out_dir: str
) -> str:
    """Hash-bucketed parquet sink: rows land in ``bucket=K/`` directories by
    a stable hash of the key column. The 100 TB payoff: two tables bucketed
    the same way co-locate their keys, so a later join/dedup reads matching
    bucket pairs independently — no all-to-all shuffle — and a failed run
    resumes per bucket. Buckets come from blake2b (process-stable), not
    Python ``hash()``."""
    from ..functions.hashing import stable_hash64

    def tag(t: pa.Table) -> pa.Table:
        b = [stable_hash64(str(v)) % n_buckets for v in t[key_col].to_pylist()]
        return t.append_column("bucket", pa.array(b, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def read_bucket(out_dir: str, bucket: int, columns=None) -> rd.Dataset:
    """Read one bucket of a ``write_bucketed`` layout (path-pruned)."""
    import os

    d = os.path.join(out_dir, f"bucket={bucket}")
    paths = [
        os.path.join(d, f) for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ] if os.path.isdir(d) else []
    if not paths:
        raise FileNotFoundError(f"no parquet files under {d}")
    return rd.read_parquet(paths, columns=columns)


def stratified_sample(
    ds: rd.Dataset, group_col: str, id_col: str, n_per_group: int
) -> rd.Dataset:
    """Deterministic n-per-group sample: smallest (md5(id), id) per group."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        keyed = g.assign(_h=[_md5_hex8(v) for v in g[id_col]])
        keyed = keyed.sort_values(["_h", id_col], kind="mergesort")
        return keyed.head(n_per_group).drop(columns=["_h"])

    return ds.groupby(group_col).map_groups(pick, batch_format="pandas")
