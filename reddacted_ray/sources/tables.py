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
        kw = dict(kwargs)
        if filter_expr is not None:
            # Lance scanners accept pyarrow dataset expressions — the row
            # filter pushes down to the fragment scan exactly like the
            # parquet branch (never silently dropped)
            kw["scanner_options"] = {
                **kw.get("scanner_options", {}), "filter": filter_expr}
        return rd.read_lance(path, columns=list(columns) if columns else None,
                             **kw)
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


def compact_parquet(
    in_dir: str,
    out_dir: str,
    min_rows_per_file: int = 100_000,
    max_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction — the maintenance op every long-running
    partitioned sink eventually needs (thousands of KB-scale files turn
    the NEXT job's scan into a metadata storm). Streams the input
    through Ray Data and rewrites with row-count bounds per file; no
    driver materialization, no schema change. Returns {files_in,
    files_out, rows}. The output dir must not exist or be empty
    (write_parquet APPENDS into existing dirs)."""
    import os

    import ray.data as rd

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"compact_parquet: out_dir {out_dir!r} is non-empty")
    files_in = sum(
        1 for _, _, fs in os.walk(in_dir) for f in fs if f.endswith(".parquet")
    )
    ds = rd.read_parquet(in_dir)
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file,
                     max_rows_per_file=max_rows_per_file)
    files_out = sum(
        1 for _, _, fs in os.walk(out_dir) for f in fs if f.endswith(".parquet")
    )
    import pyarrow.dataset as pads

    return {
        "files_in": files_in,
        "files_out": files_out,
        "rows": pads.dataset(out_dir, format="parquet").count_rows(),
    }


def read_ipc(
    path, columns: Optional[Sequence[str]] = None
) -> rd.Dataset:
    """Arrow IPC / Feather-v2 source (the zero-copy interchange format
    sitting between engines in an Arrow-native stack). ``path`` may be
    a file, a directory of ``.arrow``/``.feather``/``.ipc`` files, or an
    explicit list. The driver holds only the PATH list; each file
    decodes inside a task (``pyarrow.feather.read_table`` memory-maps
    uncompressed files) with column pruning applied at the decode."""
    import glob as _glob

    import pyarrow as pa

    if isinstance(path, (list, tuple)):
        files = [str(p) for p in path]
    elif os.path.isdir(path):
        files = sorted(
            f for ext in ("*.arrow", "*.feather", "*.ipc")
            for f in _glob.glob(os.path.join(path, ext))
        )
    else:
        files = [path]
    if not files:
        raise ValueError(f"read_ipc: no IPC files under {path!r}")
    cols = list(columns) if columns is not None else None

    def decode(t: pa.Table) -> pa.Table:
        from pyarrow import feather

        tabs = [feather.read_table(p, columns=cols)
                for p in t["item"].to_pylist()]
        return pa.concat_tables(tabs)

    return rd.from_items(files).map_batches(
        decode, batch_format="pyarrow", batch_size=1)


def read_orc(
    path, columns: Optional[Sequence[str]] = None
) -> rd.Dataset:
    """ORC source (the columnar interchange format of the Hive/Trino
    world — the handoff a warehouse migration reads from). ``path`` may
    be a file, a directory of ``.orc`` files, or an explicit list. The
    driver holds only the PATH list; each file decodes inside a task
    with column pruning applied at the decode."""
    import glob as _glob

    import pyarrow as pa

    if isinstance(path, (list, tuple)):
        files = [str(p) for p in path]
    elif os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.orc")))
    else:
        files = [path]
    if not files:
        raise ValueError(f"read_orc: no ORC files under {path!r}")
    cols = list(columns) if columns is not None else None

    def decode(t: pa.Table) -> pa.Table:
        from pyarrow import orc

        tabs = [orc.ORCFile(p).read(columns=cols)
                for p in t["item"].to_pylist()]
        return pa.concat_tables(tabs)

    return rd.from_items(files).map_batches(
        decode, batch_format="pyarrow", batch_size=1)


def write_orc(ds: rd.Dataset, out_dir: str) -> int:
    """ORC sink: one ``.orc`` file per block, written inside the map
    tasks (the driver sees only per-file row counts). The output dir
    must be empty/absent (same append-hazard rule as write_parquet).
    Returns rows written."""
    import pyarrow as pa

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"write_orc: out_dir {out_dir!r} is non-empty")
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        from uuid import uuid4

        from pyarrow import orc

        if t.num_rows:
            orc.write_table(
                t, os.path.join(out_dir, f"part-{uuid4().hex}.orc"))
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(dump, batch_format="pyarrow",
                         zero_copy_batch=True)
    from ray.data.aggregate import Sum

    res = out.aggregate(Sum("rows", alias_name="rows"))
    return int(res["rows"] or 0)


def read_hive(
    root: str, columns: Optional[Sequence[str]] = None
) -> rd.Dataset:
    """Hive-layout parquet source: walks ``root`` for
    ``key=value/.../part.parquet`` files and APPENDS the partition
    keys parsed from each file's directory path as typed columns
    (int64 when every value of a key parses as an integer, else
    string). The driver holds only the file list + parsed keys; each
    file decodes in its own task with ``columns`` pruned at the read
    (partition columns come from the PATH, never from data pages).
    Values are URL-ish unescaped only for the common ``%3D``/``%2F``
    cases. A file with no ``key=value`` segments simply contributes
    no partition columns (missing keys -> null)."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa

    files = sorted(_glob.glob(os.path.join(root, "**", "*.parquet"),
                              recursive=True))
    if not files:
        raise ValueError(f"read_hive: no parquet under {root!r}")

    def keys_of(path: str) -> dict:
        out = {}
        rel = os.path.relpath(os.path.dirname(path), root)
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, v = seg.split("=", 1)
                v = v.replace("%3D", "=").replace("%2F", "/")
                out[k] = v
        return out

    metas = [keys_of(f) for f in files]
    all_keys = sorted({k for m in metas for k in m})
    int_keys = {
        k for k in all_keys
        if all(m[k].lstrip("-").isdigit()
               for m in metas if k in m)
    }
    cols = list(columns) if columns is not None else None

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        tabs = []
        for i in t["item"].to_pylist():
            p = files[i]
            tab = _pq.read_table(p, columns=cols)
            for k in all_keys:
                v = metas[i].get(k)
                if k in int_keys:
                    arr = pa.array(
                        np.full(tab.num_rows,
                                int(v) if v is not None else 0,
                                np.int64),
                        pa.int64()) if v is not None else pa.nulls(
                        tab.num_rows, pa.int64())
                else:
                    arr = pa.array([v] * tab.num_rows, pa.string())
                tab = tab.append_column(k, arr)
            tabs.append(tab)
        return pa.concat_tables(tabs, promote_options="default")

    return rd.from_items(list(range(len(files)))).map_batches(
        decode, batch_format="pyarrow", batch_size=1)


def read_table_union(
    paths: Sequence[str], columns: Optional[Sequence[str]] = None
) -> rd.Dataset:
    """Union-by-name read across Parquet files with HETEROGENEOUS
    schemas (schema evolution: columns added/dropped between snapshot
    generations). Files group by schema signature so the plan unions a
    handful of branches, not one per file (multi-branch unions schedule
    poorly in Ray 2.49); each branch reads only its present columns and
    pads the missing ones with typed nulls in the scan map, emitting
    the unified column order everywhere."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    groups: dict[tuple, list[str]] = {}
    schemas: dict[tuple, pa.Schema] = {}
    for p in paths:
        s = pq.read_schema(p)
        sig = tuple(zip(s.names, (str(t) for t in s.types)))
        groups.setdefault(sig, []).append(p)
        schemas[sig] = s
    unified = pa.unify_schemas(list(schemas.values()))
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])

    branches = []
    for sig, files in groups.items():
        present = [f.name for f in unified
                   if schemas[sig].get_field_index(f.name) != -1]
        target = unified  # captured; pa.Schema is picklable

        def pad(t: pa.Table, _present=tuple(present)) -> pa.Table:
            cols = {}
            for f in target:
                if f.name in _present:
                    cols[f.name] = t[f.name]
                else:
                    cols[f.name] = pa.nulls(t.num_rows, f.type)
            return pa.table(cols)

        branches.append(
            rd.read_parquet(files, columns=present or None)
            .map_batches(pad, batch_format="pyarrow",
                         zero_copy_batch=True))
    out = branches[0]
    return out.union(*branches[1:]) if len(branches) > 1 else out


def read_text_docs(path: str) -> rd.Dataset:
    """Raw-text corpus source: one document per ``.txt`` file ->
    ``(doc_id, path, text, n_chars)`` rows in the documents-table
    shape. File bytes decode INSIDE the read tasks (utf-8, surrogate
    errors replaced); doc_id is the stable 63-bit hash of the file
    path, so re-ingest is id-stable across runs and machines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import stable_hash64_batch

    ds = rd.read_binary_files(path, include_paths=True)

    def decode(t: pa.Table) -> pa.Table:
        raw = t["bytes"]
        texts = pa.array(
            [b.as_py().decode("utf-8", errors="replace")
             for b in raw], pa.string())
        paths = pc.cast(t["path"], pa.string())
        ids = stable_hash64_batch(paths).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "path": paths,
            "text": texts,
            "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
        })

    return ds.map_batches(decode, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_csv(ds: rd.Dataset, out_dir: str) -> int:
    """CSV sink: one ``.csv`` file per block (header included),
    serialized inside the map tasks with Arrow's C++ CSV writer (the
    driver never sees data — only per-file row counts). Complements
    ``read_csv``. The output dir must be empty/absent (same
    append-hazard rule as write_parquet). Returns rows written."""
    import pyarrow as pa

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"write_csv: out_dir {out_dir!r} is non-empty")
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        from uuid import uuid4

        from pyarrow import csv as pacsv

        if t.num_rows:
            pacsv.write_csv(
                t, os.path.join(out_dir, f"part-{uuid4().hex}.csv"))
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(dump, batch_format="pyarrow",
                         zero_copy_batch=True)
    from ray.data.aggregate import Sum

    res = out.aggregate(Sum("rows", alias_name="rows"))
    return int(res["rows"] or 0)


def write_jsonl(ds: rd.Dataset, out_dir: str) -> int:
    """JSON-lines sink: one ``.jsonl`` file per block, serialized inside
    the map tasks with pandas' C-level ``to_json`` (the driver never
    sees data — only per-file row counts). Complements ``read_jsonl``
    for interchange with line-oriented consumers. The output dir must
    be empty/absent (same append-hazard rule as write_parquet).
    Returns rows written."""
    import pyarrow as pa

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"write_jsonl: out_dir {out_dir!r} is non-empty")
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        from uuid import uuid4

        if t.num_rows:
            t.to_pandas().to_json(
                os.path.join(out_dir, f"part-{uuid4().hex}.jsonl"),
                orient="records", lines=True)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(dump, batch_format="pyarrow",
                         zero_copy_batch=True)
    from ray.data.aggregate import Sum

    res = out.aggregate(Sum("rows", alias_name="rows"))
    return int(res["rows"] or 0)


def write_ipc(ds: rd.Dataset, out_dir: str,
              compression: Optional[str] = None) -> int:
    """Arrow IPC/Feather sink: one ``.arrow`` file per block written
    inside the map tasks (zstd-framed IPC stream the ``read_ipc``
    source round-trips) — the driver only sees per-file row counts.
    ``compression`` passes through to feather (None = pyarrow's
    default codec). The output dir must be empty/absent (same
    append-hazard rule as write_parquet). Returns rows written."""
    import pyarrow as pa
    import pyarrow.feather as paf

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise ValueError(f"write_ipc: out_dir {out_dir!r} is non-empty")
    os.makedirs(out_dir, exist_ok=True)
    comp = compression

    def dump(t: pa.Table) -> pa.Table:
        from uuid import uuid4

        if t.num_rows:
            kw = {"compression": comp} if comp else {}
            paf.write_feather(
                t, os.path.join(out_dir, f"part-{uuid4().hex}.arrow"),
                **kw)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(dump, batch_format="pyarrow",
                         zero_copy_batch=True)
    from ray.data.aggregate import Sum

    res = out.aggregate(Sum("rows", alias_name="rows"))
    return int(res["rows"] or 0)


_SQLITE_ARROW_TYPES = {
    "INTEGER": "int64",
    "INT": "int64",
    "BIGINT": "int64",
    "SMALLINT": "int64",
    "TINYINT": "int64",
    "REAL": "float64",
    "FLOAT": "float64",
    "DOUBLE": "float64",
    "NUMERIC": "float64",
    "TEXT": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "CLOB": "string",
    "BLOB": "binary",
}


def _sqlite_schema(db_path: str, table: str):
    """Arrow schema for a SQLite table from its declared column types
    (SQLite affinity rules; unknown decltypes map to string)."""
    import pyarrow as pa
    import sqlite3

    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        info = con.execute(
            f'PRAGMA table_info("{table}")').fetchall()
    finally:
        con.close()
    if not info:
        raise ValueError(
            f"read_sqlite: no such table {table!r} in {db_path!r}")
    fields = []
    for _, name, decl, *_rest in info:
        base = (decl or "").split("(")[0].strip().upper()
        fields.append(pa.field(
            name, getattr(pa, _SQLITE_ARROW_TYPES.get(base, "string"))()))
    return pa.schema(fields)


def read_sqlite(
    db_path: str,
    table: str,
    columns: Optional[Sequence[str]] = None,
    partitions: int = 16,
) -> rd.Dataset:
    """SQLite source: parallel rowid-range scans over one table. The
    driver probes only metadata (PRAGMA schema + min/max rowid); each
    range decodes inside a Ray task through the stdlib ``sqlite3``
    module opened read-only, so N tasks share the file without writer
    locks (the multi-node story is a file-per-shard layout — this
    reader takes one file and splits it by rowid, the unit SQLite can
    seek). Declared column types map to a STABLE Arrow schema so empty
    ranges stay typed (requires a rowid table — WITHOUT ROWID tables
    are rejected). Column pruning happens in the SQL projection."""
    import sqlite3

    import numpy as np
    import pyarrow as pa

    schema = _sqlite_schema(db_path, table)
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    cols = list(schema.names)

    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        try:
            lo, hi = con.execute(
                f'SELECT min(rowid), max(rowid) FROM "{table}"'
            ).fetchone()
        except sqlite3.OperationalError as exc:
            raise ValueError(
                f"read_sqlite: {table!r} has no rowid "
                f"(WITHOUT ROWID table?): {exc}") from exc
    finally:
        con.close()
    if lo is None:
        return rd.from_arrow(schema.empty_table())
    bounds = np.unique(
        np.linspace(lo, hi + 1, num=min(partitions, hi - lo + 1) + 1,
                    dtype=np.int64))
    ranges = [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])]
    proj = ", ".join(f'"{c}"' for c in cols)

    def scan(t: pa.Table) -> pa.Table:
        tabs = []
        for a, b in zip(t["lo"].to_pylist(), t["hi"].to_pylist()):
            c2 = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
            try:
                rows = c2.execute(
                    f'SELECT {proj} FROM "{table}" '
                    f"WHERE rowid >= ? AND rowid < ?", (a, b)
                ).fetchall()
            finally:
                c2.close()
            arrays = [
                pa.array([r_[i] for r_ in rows], schema.field(i).type)
                for i in range(len(cols))
            ]
            tabs.append(pa.table(dict(zip(cols, arrays)), schema=schema))
        return pa.concat_tables(tabs) if tabs else schema.empty_table()

    return rd.from_items(
        [{"lo": a, "hi": b} for a, b in ranges]
    ).map_batches(scan, batch_format="pyarrow", batch_size=1)


def write_sqlite(ds: rd.Dataset, db_path: str, table: str) -> int:
    """SQLite sink. SQLite is single-writer by design, so the faithful
    shape is: blocks stream to the driver (``iter_batches`` — bounded
    memory, no full materialization) and land in ONE transaction via
    executemany. Refuses to append into an existing table (same
    append-hazard rule as the parquet sinks). Returns rows written.
    For parallel writes at scale use the file-per-shard layout
    (one .db per partition) and this sink per shard."""
    import sqlite3

    import pyarrow as pa

    con = sqlite3.connect(db_path)
    try:
        exists = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' "
            "AND name = ?", (table,)).fetchone()
        if exists:
            raise ValueError(
                f"write_sqlite: table {table!r} already exists in "
                f"{db_path!r}")
        schema = ds.schema()
        decls = []
        for name, typ in zip(schema.names, schema.types):
            if pa.types.is_integer(typ) or pa.types.is_boolean(typ):
                d = "INTEGER"
            elif pa.types.is_floating(typ):
                d = "REAL"
            elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                d = "BLOB"
            else:
                d = "TEXT"
            decls.append(f'"{name}" {d}')
        con.execute(f'CREATE TABLE "{table}" ({", ".join(decls)})')
        marks = ", ".join("?" for _ in schema.names)
        ins = f'INSERT INTO "{table}" VALUES ({marks})'
        n = 0
        with con:
            for batch in ds.iter_batches(batch_format="pyarrow"):
                cols = [
                    batch.column(i).to_pylist()
                    for i in range(batch.num_columns)
                ]
                con.executemany(ins, list(zip(*cols)))
                n += batch.num_rows
        return n
    finally:
        con.close()
