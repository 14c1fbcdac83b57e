"""Local driver-mimic: run queries() vs oracle_sql() at a given sf and
compare row-count + schema + order-insensitive value hash, like the
driver's CORRECTNESS gate. Usage: python tools/check_oracle.py [sf_dir] [names...]"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"ERROR  {name}: ray side raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oq:
            print(f"rows-only  {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        try:
            exp = con.sql(oq[name]).df()
        except Exception as ex:
            print(f"ERROR  {name}: sql side raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(f"{status}{name}: rows {len(got)}/{len(exp)} cols_match={ok_cols} hash_match={ok_hash}")
        if not ok_hash and ok_rows and ok_cols:
            m = got[sorted(got.columns)].copy()
            x = exp[sorted(exp.columns)].copy()
            key = sorted(got.columns)[0]
            m = m.sort_values(list(m.columns)).reset_index(drop=True)
            x = x.sort_values(list(x.columns)).reset_index(drop=True)
            neq = (m.astype(str) != x.astype(str)).any(axis=1)
            print(m[neq].head(3))
            print(x[neq].head(3))
        elif not ok_cols:
            print("   got :", sorted(got.columns))
            print("   want:", sorted(exp.columns))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
