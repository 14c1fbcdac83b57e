"""Round-5 session-10 operators, batch 1: Kendall tau-b over the
bounded (qty, discount-cents) joint histogram, daily OHLC candles,
Pettitt change-point test on daily revenue.

Fixtures are adversarial: ties in BOTH Kendall dimensions (tau-b tie
corrections), a concordant/discordant mix with a hand-computed 6/11;
OHLC days with ts ties broken by event_id, a single-event day
(open==close==high==low) and negative values; a Pettitt series whose
score vector is all ties-with-self (counts[idx] includes the row) and
whose max |U| is attained once, mid-series."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BATCH1 = [
    "kendall_tau_qty_disc",
    "daily_ohlc",
    "pettitt_revenue",
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
    d = str(tmp_path_factory.mktemp("s10batch1"))
    # Kendall cells: (1,1) (1,2) (2,1) (2,2)x2 (3,3)
    # conc = 2+1+1+1+2 = 7, disc = (1,2)-(2,1) = 1, n0 = 15,
    # n1 = n2 = 1+3+0 = 4, den = sqrt(11*11) = 11, tau = 6/11.
    pq.write_table(pa.table({
        "l_quantity": pa.array(
            [1.0, 1.0, 2.0, 2.0, 2.0, 3.0], pa.float64()),
        "l_discount": pa.array(
            [0.01, 0.02, 0.01, 0.02, 0.02, 0.03], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    # OHLC: day A has a ts tie at 09:00 broken by event_id (2 < 7 ->
    # open is the eid-2 row), close at 17:00; day B is a single
    # negative-value event.
    ts = _us(["2024-05-01T09:00", "2024-05-01T09:00",
              "2024-05-01T12:00", "2024-05-01T17:00",
              "2024-05-02T10:00"])
    pq.write_table(pa.table({
        "event_id": pa.array([7, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([4.50, 1.25, 9.00, 3.00, -2.50],
                          pa.float64()),
    }), os.path.join(d, "events.parquet"))
    # Pettitt daily revenue [1,1,5,5,5,1]: scores [-3,-3,3,3,3,-3],
    # U_(1..5) = -3,-6,-3,0,3 -> K = 6 at t=2 (day 2), u = -6.
    days = ["2023-01-0%d" % i for i in range(1, 7)]
    vals = [1.0, 1.0, 5.0, 5.0, 5.0, 1.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
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
    for t in ("lineitem", "events", "orders"):
        p = os.path.join(batch1_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_kendall_hand_values(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = e.queries()["kendall_tau_qty_disc"](batch1_dir).to_pandas()
    assert int(out.loc[0, "n"]) == 6
    assert int(out.loc[0, "conc"]) == 7
    assert int(out.loc[0, "disc"]) == 1
    assert abs(float(out.loc[0, "tau_b"]) - 6.0 / 11.0) < 1e-12


def test_ohlc_hand_values(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["daily_ohlc"](batch1_dir)
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert len(out) == 2
    # day A: ts tie at 09:00 -> eid 2 (1.25) opens, NOT eid 7 (4.50)
    assert int(out.loc[0, "open_v"]) == 125
    assert int(out.loc[0, "high_v"]) == 900
    assert int(out.loc[0, "low_v"]) == 125
    assert int(out.loc[0, "close_v"]) == 300
    assert int(out.loc[0, "n_events"]) == 4
    # day B: singleton, negative
    for c in ("open_v", "high_v", "low_v", "close_v"):
        assert int(out.loc[1, c]) == -250
    assert int(out.loc[1, "n_events"]) == 1


def test_pettitt_hand_values(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = e.queries()["pettitt_revenue"](batch1_dir).to_pandas()
    assert int(out.loc[0, "n_days"]) == 6
    assert int(out.loc[0, "k_stat"]) == 6
    assert int(out.loc[0, "u_at_cp"]) == -6
    day2 = _us(["2023-01-02"])[0] // (86_400 * 1_000_000)
    assert int(out.loc[0, "cp_day"]) == day2


def test_pettitt_single_day_empty(ray_session, tmp_path):
    import __ray_entry__ as e

    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(["2023-01-01"]),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([9.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    out = e.queries()["pettitt_revenue"](d).to_pandas()
    assert len(out) == 0
