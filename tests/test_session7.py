"""Round-5 session-5 operators: Cliff's delta between return flags,
year-over-year monthly revenue deltas, month-end order share.

Fixtures are adversarial: cross-flag quantity ties (neither gt nor
lt), a single-row flag group, leap-year February month-ends, months
missing a prior-year counterpart, and the runs-test n1 = n2 = 1
zero-variance edge (DuckDB x / sqrt(0) is NULL, not a crash)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BATCH10 = [
    "cliffs_delta_flags",
    "yoy_revenue_by_month",
    "month_end_share",
]


def _vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort")
    body = "|".join(
        ",".join(repr(x) for x in df[c].tolist()) for c in df.columns
    )
    return hashlib.md5(body.encode()).hexdigest()


@pytest.fixture(scope="module")
def batch10_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch10"))
    # lineitem: flag A and R share quantity 3 (tie -> neither gt nor
    # lt), flag N is a singleton; A dominates R overall
    qty = [3.0, 7.0, 9.0, 3.0, 1.0, 2.0, 5.0]
    flg = ["A", "A", "A", "R", "R", "R", "N"]
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_returnflag": pa.array(flg, pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    # orders: 2023-01, 2023-02, 2024-01, 2024-03, 2025-01 — only
    # (2024-01, 2025-01) has a prior-year January; 2024-03 and 2023-02
    # have no counterpart. Month-end probes: 2023-02-26 (within last
    # 3 of a 28-day Feb), 2024-02-26 (leap year: 27/28/29 are the last
    # 3, so the 26th is NOT), 2024-04-28 (within last 3 of April),
    # 2023-01-28 (NOT within last 3 of a 31-day month)
    dates = ["2023-01-28", "2023-02-26", "2024-01-10",
             "2024-02-26", "2024-03-05", "2024-04-28", "2025-01-31"]
    price = [100.00, 20.50, 31.25, 7.75, 42.00, 13.13, 99.99]
    us = [int(np.datetime64(x).astype("datetime64[us]").astype(np.int64))
          for x in dates]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(us, pa.timestamp("us")),
        "o_totalprice": pa.array(price, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH10)
def test_batch10_match_oracle(ray_session, batch10_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch10_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch10_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_cliffs_delta_hand_check(ray_session, batch10_dir):
    import __ray_entry__ as e

    out = (e.queries()["cliffs_delta_flags"](batch10_dir).to_pandas()
           .set_index(["flag_a", "flag_b"]))
    # A = {3,7,9} vs R = {3,1,2}: gt pairs = 3+3+2 = 8, lt = 0,
    # tie (3,3) counts in neither; delta = 8/9
    row = out.loc[("A", "R")]
    assert int(row["gt_pairs"]) == 8
    assert int(row["lt_pairs"]) == 0
    assert row["delta"] == pytest.approx(8.0 / 9.0)
    # singleton flag N = {5}: vs A {3,7,9} -> gt 1, lt 2
    row = out.loc[("A", "N")]
    assert int(row["gt_pairs"]) == 2 and int(row["lt_pairs"]) == 1


def test_month_end_calendar_awareness(ray_session, batch10_dir):
    import __ray_entry__ as e

    out = (e.queries()["month_end_share"](batch10_dir).to_pandas()
           .set_index("year"))
    # 2023: Feb 26 qualifies (28-day Feb), Jan 28 does not -> 1 of 2
    assert int(out.loc[2023, "n_month_end"]) == 1
    # 2024: leap Feb 26 does NOT qualify; Apr 28 does; Jan 10 and
    # Mar 5 do not -> 1 of 4
    assert int(out.loc[2024, "n_month_end"]) == 1
    # 2025: Jan 31 qualifies -> 1 of 1
    assert int(out.loc[2025, "n_month_end"]) == 1


def test_yoy_inner_match_only(ray_session, batch10_dir):
    import __ray_entry__ as e

    out = e.queries()["yoy_revenue_by_month"](batch10_dir).to_pandas()
    # 2024-01 (vs 2023-01), 2024-02 (vs 2023-02) and 2025-01
    # (vs 2024-01) pair up; 2024-03 and 2023-* have no prior year
    assert sorted(zip(out["year"], out["month"])) == [
        (2024, 1), (2024, 2), (2025, 1)]
    r = out.set_index(["year", "month"])
    assert int(r.loc[(2024, 1), "yoy_diff"]) == 3125 - 10000
    assert int(r.loc[(2024, 2), "yoy_diff"]) == 775 - 2050
    assert int(r.loc[(2025, 1), "yoy_diff"]) == 9999 - 3125


def test_runs_test_zero_variance_is_null(ray_session, tmp_path):
    """n1 = n2 = 1: variance is 0; the z must be NULL (DuckDB
    x / sqrt(0.0) semantics), not a ZeroDivisionError."""
    import duckdb

    import __ray_entry__ as e

    d = str(tmp_path)
    DAY = 86_400_000_000
    base = 1_600_000_000_000_000
    pq.write_table(pa.table({
        "o_orderdate": pa.array([base, base + DAY], pa.timestamp("us")),
        "o_totalprice": pa.array([1.00, 9.00], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = e.queries()["runs_test_daily"](d).to_pandas()
    assert int(got["n1"][0]) == 1 and int(got["n2"][0]) == 1
    assert pd.isna(got["z_runs"][0])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    exp = con.sql(e.oracle_sql()["runs_test_daily"]).df()
    assert pd.isna(exp["z_runs"][0])
