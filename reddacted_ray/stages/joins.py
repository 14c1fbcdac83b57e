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
