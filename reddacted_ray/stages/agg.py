"""Partial (combiner-style) grouped aggregation.

A bare ``groupby(key).aggregate(...)`` shuffles every row. When the group
count is far smaller than the row count, pre-aggregating inside
``map_batches`` (one partial row per key per block, computed with Arrow's
native hash aggregation) shrinks the exchange to partials — the classic
map-side combine. Sums here are integer-unit columns, so re-aggregation is
exact and order-free.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Sum


def grouped_sums(
    ds: rd.Dataset,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str | None = None,
    max_cols: Sequence[str] = (),
) -> rd.Dataset:
    """groupby(keys) computing Sum for each of ``sum_cols`` (same output
    names), optionally a row count and per-group Max columns, with
    map-side partial aggregation (max re-aggregates exactly like sum)."""
    keys = list(keys)
    sum_cols = list(sum_cols)
    max_cols = list(max_cols)

    def partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        aggs += [(c, "max") for c in max_cols]
        if count_alias:
            t = t.append_column(
                "__ones", pa.array(np.ones(t.num_rows, dtype=np.int64))
            )
            aggs.append(("__ones", "sum"))
        g = t.group_by(keys).aggregate(aggs)
        renames = {f"{c}_sum": c for c in sum_cols}
        renames.update({f"{c}_max": c for c in max_cols})
        if count_alias:
            renames["__ones_sum"] = count_alias
        return g.rename_columns([renames.get(n, n) for n in g.schema.names])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final_aggs = [Sum(c, alias_name=c) for c in sum_cols]
    final_aggs += [Max(c, alias_name=c) for c in max_cols]
    if count_alias:
        final_aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*final_aggs)


def unpivot(
    ds: rd.Dataset,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> rd.Dataset:
    """Wide -> long reshape (the inverse of conditional-aggregation pivot):
    each input row yields one output row per ``value_cols`` entry, tagged
    with the source column name. Purely map-side (zero shuffle, streams) —
    one Arrow concat of ``len(value_cols)`` slices per block."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)

    def melt(t: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array([c] * t.num_rows, pa.string())
            cols[value_name] = t[c]
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def grouped_agg(
    ds: rd.Dataset,
    keys: Sequence[str],
    specs: Sequence[tuple],
) -> rd.Dataset:
    """groupby(keys) with mixed re-aggregable kernels — ``specs`` is
    [(col, "sum"|"min"|"max"[, out_name]), ...]; out_name defaults to col
    and every output name must be unique (aggregate the same column under
    two kernels by naming the outputs). Same map-side combine shape as
    ``grouped_sums``: Arrow hash-aggregates each block to one partial row
    per key, so the exchange ships partials, and the kernels' idempotent
    re-aggregation (sum of sums, min of mins, max of maxes) finishes
    exactly."""
    from ray.data.aggregate import Max, Min

    keys = list(keys)
    norm = [(s[0], s[1], s[2] if len(s) > 2 else s[0]) for s in specs]
    outs = [o for _, _, o in norm]
    if len(set(outs)) != len(outs):
        raise ValueError(f"duplicate output names in specs: {outs}")

    def partial(t: pa.Table) -> pa.Table:
        for c, _, o in norm:
            if o != c:
                t = t.append_column(o, t[c])
        g = t.group_by(keys).aggregate([(o, fn) for _, fn, o in norm])
        renames = {f"{o}_{fn}": o for _, fn, o in norm}
        return g.rename_columns([renames.get(n, n) for n in g.schema.names])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    kinds = {"sum": Sum, "min": Min, "max": Max}
    final = [kinds[fn](o, alias_name=o) for _, fn, o in norm]
    return partials.groupby(keys).aggregate(*final)
