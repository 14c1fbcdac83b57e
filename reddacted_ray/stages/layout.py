"""Z-order (Morton-curve) data layout.

Multi-dimensional clustering for scan pruning: interleaving the bits of
k key columns gives a 1-D sort key whose ordering keeps rows close in
EVERY dimension at once. Files written in z-order carry tight per-file
min/max ranges on ALL the interleaved columns, so a reader with a
predicate on any of them can skip most files from footer statistics
alone — a single-column sort only prunes its own column. The sort
itself is Ray's distributed range-partition sort (one exchange); the
z-value computation is pure vectorized numpy bit math, identical to the
SQL closed form used by the ``zorder_events`` oracle.

Overflow contract: ``bits * len(cols) <= 62`` so the Morton code fits a
non-negative int64.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

_ZCOL = "__zval"


def zvalue(cols: Sequence[np.ndarray], bits: int = 8) -> np.ndarray:
    """Morton code of k equal-length int arrays (each masked to ``bits``
    low bits): bit i of column j lands at output bit ``i*k + j``. A
    ``bits * k``-step loop of vectorized shifts — no per-row Python."""
    k = len(cols)
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds int64 capacity")
    mask = np.int64((1 << bits) - 1)
    z = np.zeros(len(cols[0]), np.int64)
    for j, c in enumerate(cols):
        v = c.astype(np.int64) & mask
        for i in range(bits):
            z |= ((v >> np.int64(i)) & np.int64(1)) << np.int64(i * k + j)
    return z


def zvalue_sql(cols: Sequence[str], bits: int = 8) -> str:
    """The identical Morton code as a SQL expression over integer
    columns — generated from the same (i, j) -> i*k + j bit map so the
    engine and the DuckDB oracle cannot drift."""
    k = len(cols)
    m = (1 << bits) - 1
    # fully parenthesized: DuckDB's shift operators bind LOOSER than
    # '+', so a bare 'x << 3 + y << 5' would parse as x << (3+y) << 5
    terms = [
        f"(((({c} & {m}) >> {i}) & 1) << {i * k + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    ds: rd.Dataset,
    cols: Sequence[str],
    out_dir: str,
    bits: int = 8,
    rows_per_file: int = 10_000,
) -> str:
    """Sort by the Morton code of ``cols`` and write parquet files of
    ~``rows_per_file`` rows. One distributed sort exchange; the z column
    is dropped from the files (derivable). Clears ``out_dir`` first
    (write_parquet appends into existing dirs)."""
    cols = list(cols)
    shutil.rmtree(out_dir, ignore_errors=True)

    def tag(t: pa.Table) -> pa.Table:
        z = zvalue(
            [t[c].to_numpy(zero_copy_only=False) for c in cols], bits)
        return t.append_column(_ZCOL, pa.array(z))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    (tagged.sort(_ZCOL)
     .drop_columns([_ZCOL])
     .write_parquet(out_dir, min_rows_per_file=rows_per_file,
                    max_rows_per_file=rows_per_file))
    return out_dir


def file_ranges(out_dir: str, cols: Sequence[str]) -> dict[str, list[tuple]]:
    """Per-file (min, max) footer statistics for ``cols`` — the pruning
    metadata a predicate-pushdown reader would consult."""
    out: dict[str, list[tuple]] = {c: [] for c in cols}
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out_dir, f)).metadata
        idx = {md.schema.column(i).name: i
               for i in range(len(md.schema))}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out[c].append((lo, hi))
    return out


def pruned_fraction(
    ranges: list[tuple], lo, hi
) -> float:
    """Fraction of files a [lo, hi] predicate can SKIP from min/max
    stats alone."""
    n = len(ranges)
    overlap = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return (n - overlap) / n if n else 0.0
