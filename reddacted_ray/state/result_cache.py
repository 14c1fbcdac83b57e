"""Fingerprint-keyed query result cache.

An incremental-recompute layer for the registry: a query's result is
cached as parquet under ``cache_dir`` keyed by (query name, input
fingerprint).  The fingerprint digests the *byte-identity metadata* of
every parquet file in the input dir (relative path, size, mtime_ns) —
the same inputs-unchanged contract a build system uses — so re-running
a report suite over an unchanged snapshot pays zero Ray compute, while
ANY file mutation (append, rewrite, new shard) invalidates exactly the
affected queries.

At 100 TB the fingerprint never reads data pages: it is one directory
listing (``os.stat`` per file), and the cache payload is the query
RESULT (bounded driver-sized tables for every registry entry), never
the input.

Reference parity note: the reference CLI recomputes its analysis on
every invocation (reddacted/cli.py); the cache is a graft-side addition
for the batch-engine setting where the same corpus snapshot backs many
reports.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Callable

import pyarrow as pa
import pyarrow.parquet as pq


def input_fingerprint(sf_dir: str) -> str:
    """md5 over (relpath, size, mtime_ns) of every parquet file under
    ``sf_dir`` (sorted) — metadata-only, no data pages read."""
    h = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(sf_dir)):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            rel = os.path.relpath(p, sf_dir)
            h.update(
                f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _as_table(res: Any) -> pa.Table:
    import pandas as pd
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return pa.Table.from_pandas(res.to_pandas(),
                                    preserve_index=False)
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    raise TypeError(f"uncacheable result type {type(res)!r}")


def cached_query(
    name: str,
    fn: Callable[[str], Any],
    sf_dir: str,
    cache_dir: str,
) -> tuple[pa.Table, bool]:
    """Run ``fn(sf_dir)`` through the cache. Returns ``(table, hit)``.

    The cache file is ``{cache_dir}/{name}-{fingerprint}.parquet``;
    stale entries for the same query (older fingerprints) are removed
    on write so the cache dir stays bounded by the query count."""
    os.makedirs(cache_dir, exist_ok=True)
    fp = input_fingerprint(sf_dir)
    path = os.path.join(cache_dir, f"{name}-{fp}.parquet")
    if os.path.exists(path):
        return pq.read_table(path), True
    table = _as_table(fn(sf_dir))
    for old in os.listdir(cache_dir):
        if old.startswith(f"{name}-") and old.endswith(".parquet"):
            os.unlink(os.path.join(cache_dir, old))
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return table, False
