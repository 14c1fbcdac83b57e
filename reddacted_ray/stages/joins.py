"""Broadcast join helpers — the documented small-side pattern as an API.

The query suite hand-rolls these shapes where each needs bespoke output
columns (see ``q_revenue_by_nation`` / ``q_semijoin_bigspenders``); this
module packages the pattern for engine users: the small side ships to the
object store ONCE via ``ray.put`` and every task reads it zero-copy — never
re-shipped per batch, never a shuffle. Use Ray Data's native hash-partitioned
``Dataset.join`` instead when BOTH sides are large (see ``q_join_priority``,
``apply_decisions``).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from . import process_cached


def bucketed_join(
    dir_a: str,
    dir_b: str,
    key_col: str,
    n_buckets: int,
    columns_a: Optional[Sequence[str]] = None,
    columns_b: Optional[Sequence[str]] = None,
) -> rd.Dataset:
    """Shuffle-FREE inner join of two ``write_bucketed`` layouts.

    Partitioning assumption (documented per the custom-operator contract):
    both inputs were bucketed with the SAME key column, hash and
    ``n_buckets``, so matching keys co-locate in the same ``bucket=K``
    directory pair. Each bucket pair then joins independently inside one
    Ray task (an in-memory Acero join over two memory-sized buckets) — no
    all-to-all exchange, linear fan-out of ``n_buckets`` tasks, and a
    failed run can re-run individual buckets. This is the join shape that
    stays cheap at 100 TB when the bucketing cost is amortized across many
    downstream joins."""
    import os

    @ray.remote
    def _join_bucket(ba: list, bb: list) -> pa.Table:
        import pyarrow.parquet as pq

        ta = pa.concat_tables([pq.read_table(p, columns=columns_a) for p in ba])
        tb = pa.concat_tables([pq.read_table(p, columns=columns_b) for p in bb])
        # pa.Table.join defaults to LEFT OUTER — be explicit
        return ta.join(tb, keys=[key_col], join_type="inner")

    def _bucket_files(root: str, b: int) -> list:
        d = os.path.join(root, f"bucket={b}")
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]

    refs = []
    for b in range(n_buckets):
        fa, fb = _bucket_files(dir_a, b), _bucket_files(dir_b, b)
        if fa and fb:  # a missing side means zero matches for the bucket
            refs.append(_join_bucket.remote(fa, fb))
    if not refs:
        return rd.from_items([])
    return rd.from_arrow_refs(refs)


def broadcast_semi_join(
    ds: rd.Dataset,
    keys: Sequence,
    key_col: str,
    anti: bool = False,
) -> rd.Dataset:
    """Keep rows whose ``key_col`` is in ``keys`` (or NOT in, with
    ``anti=True``). ``keys`` must be driver-small (id lists, config sets);
    it broadcasts once."""
    keys_ref = ray.put(pa.array(sorted(set(keys))))

    class Semi:
        def __init__(self) -> None:
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[key_col], value_set=self.keys)
            if anti:
                mask = pc.invert(mask)
            return t.filter(mask)

    return ds.map_batches(process_cached(Semi), batch_format="pyarrow",
                          zero_copy_batch=True)


def broadcast_lookup_join(
    ds: rd.Dataset,
    mapping: Mapping,
    key_col: str,
    out_col: str,
    default=None,
    out_type: Optional[pa.DataType] = None,
) -> rd.Dataset:
    """Append ``out_col = mapping[key_col]`` per row (dimension-table
    enrichment). Missing keys get ``default``. The dict broadcasts once."""
    map_ref = ray.put(dict(mapping))

    class Lookup:
        def __init__(self) -> None:
            self.map = ray.get(map_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vals = [self.map.get(k, default) for k in t[key_col].to_pylist()]
            arr = pa.array(vals, out_type) if out_type else pa.array(vals)
            return t.append_column(out_col, arr)

    return ds.map_batches(process_cached(Lookup), batch_format="pyarrow",
                          zero_copy_batch=True)
