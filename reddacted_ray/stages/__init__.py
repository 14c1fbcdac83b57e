"""Ray Data stages. ``process_cached`` wraps a callable-class stage as a
stateless task fn whose instance is cached per worker process — actor-style
state amortization without actor-pool spin-up latency (Ray reuses worker
processes across tasks). Prefer it for cheap-state stages; keep real actor
pools (``map_batches(Cls, concurrency=...)``) for heavyweight per-worker
state whose construction count must be bounded."""

from __future__ import annotations

_PROCESS_CACHE: dict = {}


def process_cached(cls, **kwargs):
    # unique tag per wrap: closure classes sharing a qualname (or the same
    # class built over different broadcast refs) must not collide; the tag
    # rides inside the serialized closure, so all tasks of one stage share
    # one cache entry while distinct stages stay distinct
    import uuid

    key = (cls.__module__, cls.__qualname__, repr(sorted(kwargs.items())),
           uuid.uuid4().hex)

    def fn(batch):
        inst = _PROCESS_CACHE.get(key)
        if inst is None:
            inst = _PROCESS_CACHE[key] = cls(**kwargs)
        return inst(batch)

    return fn


def ensure_schema(ds, fields):
    """Rewrite zero-COLUMN empty blocks into schema-ful empty tables.

    ``groupby().aggregate`` emits schema-less empty blocks for empty hash
    partitions; Acero hash joins then fail with "no match for key field".
    ``fields`` is [(name, pyarrow type), ...] — the canonical schema an
    empty block should carry. (``repartition`` is NOT a substitute: over an
    all-empty dataset it strips schema from every block again.)"""
    import pyarrow as pa

    fields = list(fields)

    def fix(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({n: pa.array([], ty) for n, ty in fields})
        return t

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
