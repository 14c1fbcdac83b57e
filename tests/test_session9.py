"""Round-5 session-9 operators, batch 1: turning-point census,
record-day counts, sweep-line peak concurrency.

Fixtures are adversarial: a revenue plateau (strict-comparison
contract excludes ties from both turning points and records), a
single-day year, a two-day year (no triple), windows that touch
exactly end-to-start (half-open [ts, ts+30m) must NOT count them as
concurrent), an instant where one window closes exactly as another
opens (close-before-open ordering), and a pair that overlaps across
an hour-bucket boundary (carry-in path of the distributed sweep)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BATCH1 = [
    "turning_points_daily",
    "record_days_by_year",
    "peak_concurrency",
]


def _vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort")
    body = "|".join(
        ",".join(repr(x) for x in df[c].tolist()) for c in df.columns
    )
    return hashlib.md5(body.encode()).hexdigest()


def _us(dates):
    return [int(np.datetime64(x).astype("datetime64[us]")
                .astype(np.int64)) for x in dates]


@pytest.fixture(scope="module")
def batch1_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s9batch1"))
    # 2023: daily revenue 5,3,8,8,2,9,1 (one order per day)
    #   turning: 3 (min), plateau 8,8 excluded twice, 2 (min), 9 (max)
    #     -> 3;  rec highs 5,8,9 -> 3;  rec lows 5,3,2,1 -> 4
    # 2024: 4,4 -> no triple; highs 1 (tie not a record), lows 1
    # 2025: single day -> n_days 1, highs/lows 1, turning 0
    days = (["2023-01-0%d" % i for i in range(1, 8)]
            + ["2024-02-01", "2024-02-02"] + ["2025-03-01"])
    vals = [5.0, 3.0, 8.0, 8.0, 2.0, 9.0, 1.0, 4.0, 4.0, 7.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    # events: type a peaks at 3 (10:30 close processed before the
    # 10:30 open); b singleton; c overlaps across the 11:00 hour
    # boundary; d windows touch exactly -> peak 1
    ts = _us(["2024-01-01T10:00", "2024-01-01T10:10",
              "2024-01-01T10:20", "2024-01-01T10:30",
              "2024-01-01T12:00",
              "2024-01-01T08:00",
              "2024-01-01T10:50", "2024-01-01T11:05",
              "2024-01-01T09:00", "2024-01-01T09:30"])
    et = ["a"] * 5 + ["b"] + ["c"] * 2 + ["d"] * 2
    pq.write_table(pa.table({
        "event_type": pa.array(et),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH1)
def test_batch1_match_oracle(ray_session, batch1_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch1_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch1_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_turning_points_values(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["turning_points_daily"](batch1_dir)
           .to_pandas().set_index("y"))
    assert int(out.loc[2023, "n_turning"]) == 3
    assert int(out.loc[2023, "n_days"]) == 7
    assert int(out.loc[2024, "n_turning"]) == 0
    assert int(out.loc[2025, "n_days"]) == 1


def test_record_days_values(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["record_days_by_year"](batch1_dir)
           .to_pandas().set_index("y"))
    assert int(out.loc[2023, "n_rec_high"]) == 3
    assert int(out.loc[2023, "n_rec_low"]) == 4
    # the 4,4 plateau: a tie is NOT a record
    assert int(out.loc[2024, "n_rec_high"]) == 1
    assert int(out.loc[2024, "n_rec_low"]) == 1
    assert int(out.loc[2025, "n_rec_high"]) == 1


def test_peak_concurrency_values(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["peak_concurrency"](batch1_dir)
           .to_pandas().set_index("event_type"))
    assert int(out.loc["a", "peak"]) == 3
    assert int(out.loc["b", "peak"]) == 1
    assert int(out.loc["c", "peak"]) == 2  # across the hour boundary
    assert int(out.loc["d", "peak"]) == 1  # exact touch: half-open


BATCH2 = ["cucconi_flags", "lmoments_by_flag"]


@pytest.fixture(scope="module")
def batch2_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s9batch2"))
    # flags: A = [2,2,5] (tie run), R = [1,2,3], N = [9,9] (excluded
    # from cucconi; excluded from lmoments by the n>=3 gate).
    # Hand L-moments: A -> b0=9 b1=12 b2=10: l2=1 (l2_e2=100),
    # t3 = 6/6 = 1 (t3_abs_e6=1000000); R -> b0=6 b1=8 b2=6:
    # l1=2 (l1_e2=200), l2num=4, lcv_e6 = 4e6 // 12 = 333333,
    # t3num = 0 -> sign 1, abs 0.
    flags = ["A", "A", "A", "R", "R", "R", "N", "N"]
    qty = [2.0, 2.0, 5.0, 1.0, 2.0, 3.0, 9.0, 9.0]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags),
        "l_quantity": pa.array(qty, pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH2)
def test_batch2_match_oracle(ray_session, batch2_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch2_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM"
            f" '{batch2_dir}/lineitem.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_lmoments_hand_values(ray_session, batch2_dir):
    import __ray_entry__ as e

    out = (e.queries()["lmoments_by_flag"](batch2_dir)
           .to_pandas().set_index("flag"))
    assert "N" not in out.index  # n=2 < 3 gate
    assert int(out.loc["A", "l2_e2"]) == 100
    assert int(out.loc["A", "t3_abs_e6"]) == 1000000
    assert int(out.loc["R", "l1_e2"]) == 200
    assert int(out.loc["R", "lcv_e6"]) == 333333
    assert int(out.loc["R", "t3_abs_e6"]) == 0


def test_cucconi_finite(ray_session, batch2_dir):
    import math

    import __ray_entry__ as e

    out = e.queries()["cucconi_flags"](batch2_dir).to_pandas()
    assert int(out.loc[0, "m"]) == 3 and int(out.loc[0, "n"]) == 3
    c = float(out.loc[0, "c"])
    assert math.isfinite(c) and c >= 0.0
