"""Source helpers: pruned Parquet reads (Lance-gated) for all tables.

The graft names Lance as the primary format (BASELINE.json input_hint);
the ``lance`` package is not installed in this container, so reads go
through Parquet with an import-gate that switches to ``read_lance`` when
available. Always pass ``columns=`` so only needed columns leave storage
(scan pruning; see SURVEY.md §2.1 S1-S5).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray.data as rd

try:  # pragma: no cover - lance not present in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(
    path: str,
    columns: Optional[Sequence[str]] = None,
    filter_expr=None,
    **kwargs,
) -> rd.Dataset:
    """Read a Lance or Parquet table as a Dataset with column pruning and
    optional row filter pushdown (a ``pyarrow.dataset`` expression).
    ``path`` may be a single path or a list of files (one partition)."""
    if isinstance(path, (list, tuple)):
        kw = dict(kwargs)
        if columns is not None:
            kw["columns"] = list(columns)
        if filter_expr is not None:
            kw["filter"] = filter_expr
        return rd.read_parquet(list(path), **kw)
    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=list(columns) if columns else None, **kwargs)
    kw = dict(kwargs)
    if columns is not None:
        kw["columns"] = list(columns)
    if filter_expr is not None:
        kw["filter"] = filter_expr
    return rd.read_parquet(path, **kw)


def coerce_anchor(now, path, ts_col: str):
    """Align a datetime anchor's tz-awareness with the stored timestamp
    column so a pushed-down scan predicate compares cleanly — pyarrow
    refuses (or mis-filters) naive-vs-aware comparisons (round-2 ADVICE).
    Naive anchors are interpreted as UTC. Unreadable schema / missing
    column leaves the anchor untouched (the scan will surface the error)."""
    import datetime as dt

    import pyarrow.dataset as pads

    try:
        typ = pads.dataset(path).schema.field(ts_col).type
        tz = getattr(typ, "tz", None)
    except Exception:
        return now
    if tz is None and now.tzinfo is not None:
        return now.astimezone(dt.timezone.utc).replace(tzinfo=None)
    if tz is not None and now.tzinfo is None:
        return now.replace(tzinfo=dt.timezone.utc)
    return now


def sf_table(sf_dir: str, name: str, columns: Optional[Sequence[str]] = None) -> rd.Dataset:
    """Read one of the driver's testdata tables (TESTDATA.md)."""
    return read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_jsonl(
    path: str, columns: Optional[Sequence[str]] = None
) -> rd.Dataset:
    """JSON-lines source — the batch analog of the reference scraper's JSON
    record stream (``api/scraper.py:23-119`` parses Reddit's JSON listing
    into 5-field records). JSON has no column projection at the read; the
    select happens immediately after parse so downstream stages see only
    the requested fields."""
    ds = rd.read_json(path)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def read_csv(
    path: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> rd.Dataset:
    """CSV source (interchange-format ingest). CSV cannot prune columns at
    the byte level, so the projection happens immediately after parse —
    downstream stages and every exchange see only the requested fields."""
    ds = rd.read_csv(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds
