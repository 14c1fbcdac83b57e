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


BATCH11 = [
    "lagged_crosscorr",
    "sorted_neighborhood_pairs",
    "run_length_hist",
]


@pytest.fixture(scope="module")
def batch11_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch11"))
    # lineitem: runs that STRADDLE the 65536-wide key ranges
    # (key = orderkey*8 + linenumber). orderkey 8191 ends range 0 at
    # keys 65529/65535; orderkey 8192 starts range 1. One flag-A run
    # crosses the boundary; orderkeys 16384..16390 are ALL flag R so
    # range 2 is single-run and must chain into range 3's leading R.
    rows = []
    rows += [(8191, 1, "N"), (8191, 2, "A"), (8191, 7, "A")]
    rows += [(8192, 1, "A"), (8192, 2, "R")]          # A-run len 3
    rows += [(16384 + i, 1, "R") for i in range(7)]   # range 2 all R
    rows += [(24576, 1, "R"), (24576, 2, "N")]        # R continues
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
        "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    # orders: 5 consecutive days + a gap day (lag pairing must skip
    # missing days), constant-count days (x variance still > 0 via
    # day 3's double order)
    DAY = 86_400_000_000
    base = 1_600_000_000_000_000
    day_of = [0, 1, 2, 3, 3, 4, 7]
    price = [10.0, 20.0, 15.0, 12.0, 30.0, 25.0, 50.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array([base + DAY * k for k in day_of],
                                pa.timestamp("us")),
        "o_totalprice": pa.array(price, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    # documents: two near-dups sharing lang+prefix4 (distance 2 on the
    # 40-char prefix), one same-block far doc (distance > 8), one doc
    # alone in its block, and an identical-text pair (distance 0,
    # doc_id breaks the sort tie)
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zetQ eta theta",
        "alphQQQQWWWWEEEERRRRTTTTYYYYUUUUIIIIOOOO done",
        "solo block nothing matches this one",
        "twin text exactly equal",
        "twin text exactly equal",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
    }), os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH11)
def test_batch11_match_oracle(ray_session, batch11_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch11_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch11_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_run_length_boundary_stitch(ray_session, batch11_dir):
    import __ray_entry__ as e

    out = (e.queries()["run_length_hist"](batch11_dir).to_pandas()
           .set_index(["flag", "run_len"]))
    # A-run of 3 crosses ranges 0->1; R-run of 9 spans ranges 1->2->3
    # (single-run range 2 chains through); two N singletons
    assert int(out.loc[("A", 3), "n_runs"]) == 1
    assert int(out.loc[("R", 9), "n_runs"]) == 1
    assert int(out.loc[("N", 1), "n_runs"]) == 2
    assert int(out["n_runs"].sum()) == 4


def test_sorted_neighborhood_hand_check(ray_session, batch11_dir):
    import __ray_entry__ as e

    out = e.queries()["sorted_neighborhood_pairs"](batch11_dir) \
        .to_pandas()
    pairs = {(int(a), int(b)): int(dd) for a, b, dd in
             zip(out["doc_a"], out["doc_b"], out["dist"])}
    # near-dup pair found at prefix-40 distance 1 (doc 2's 'zetQ'
    # sorts before doc 1's 'zeta'); identical twins at 0; the far doc
    # in the same block exceeds the threshold
    assert pairs[(2, 1)] == 1
    assert pairs[(5, 6)] == 0
    assert len(pairs) == 2


def test_lagged_crosscorr_gap_days(ray_session, batch11_dir):
    import __ray_entry__ as e

    out = (e.queries()["lagged_crosscorr"](batch11_dir).to_pandas()
           .set_index("lag"))
    # days 0..4 and 7 exist; lag 3 pairs: (0,3),(1,4),(4,7) -> 3
    assert int(out.loc[3, "n_pairs"]) == 3
    # lag 5 pairs: (2,7) only
    assert int(out.loc[5, "n_pairs"]) == 1
    # lag 6 has none: (1,7)? day 1 + 6 = 7 exists -> 1 pair
    assert int(out.loc[6, "n_pairs"]) == 1
    assert int(out.loc[0, "n_pairs"]) == 6


BATCH12 = [
    "page_trend_priority",
    "fano_factor_by_type",
    "supplier_part_assortativity",
]


@pytest.fixture(scope="module")
def batch12_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch12"))
    # orders: 2023 has all 3 priorities with a TIE between 1-URGENT
    # and 2-HIGH (midrank path); 2024 is MISSING 3-MEDIUM entirely
    # (coalesce-0 cell, which also ties nothing)
    DAY = 86_400_000_000
    y23 = 1_672_531_200_000_000   # 2023-01-01
    y24 = 1_704_067_200_000_000   # 2024-01-01
    rows = [
        (y23, "1-URGENT", 50.00), (y23 + DAY, "2-HIGH", 50.00),
        (y23 + 2 * DAY, "3-MEDIUM", 10.00),
        (y24, "1-URGENT", 30.00), (y24 + DAY, "2-HIGH", 70.00),
    ]
    pq.write_table(pa.table({
        "o_orderdate": pa.array([r[0] for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in rows], pa.string()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    # events: 'view' over 3 days with counts 1/1/4 (bursty), 'click'
    # on a single day (n = 1 -> fano NULL)
    ev_days = [0, 1, 2, 2, 2, 2, 5]
    ev_type = ["view", "view", "view", "view", "view", "view", "click"]
    pq.write_table(pa.table({
        "ts": pa.array([y23 + DAY * k for k in ev_days],
                       pa.timestamp("us")),
        "event_type": pa.array(ev_type, pa.string()),
        "user_id": pa.array([1] * len(ev_days), pa.int64()),
    }), os.path.join(d, "events.parquet"))
    # lineitem: edges with duplicates (must dedup); part 1 uses supps
    # {1,2}, part 2 supps {1}, part 3 supps {2,3}: degrees p:(2,1,2),
    # s:(2,2,1)
    ek = [(1, 1), (1, 1), (1, 2), (2, 1), (3, 2), (3, 3), (3, 3)]
    pq.write_table(pa.table({
        "l_partkey": pa.array([a for a, _ in ek], pa.int64()),
        "l_suppkey": pa.array([b for _, b in ek], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH12)
def test_batch12_match_oracle(ray_session, batch12_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch12_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch12_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_page_trend_hand_check(ray_session, batch12_dir):
    import __ray_entry__ as e

    out = e.queries()["page_trend_priority"](batch12_dir).to_pandas()
    # 2023 cents (5000, 5000, 1000): doubled midranks (5, 5, 2) ->
    # contribution 1*5 + 2*5 + 3*2 = 21
    # 2024 cents (3000, 7000, 0): doubled ranks (4, 6, 2) ->
    # contribution 1*4 + 2*6 + 3*2 = 22
    assert int(out["l2"][0]) == 43
    assert int(out["n_blocks"][0]) == 2 and int(out["k"][0]) == 3
    # EL2 = n*k*(k+1)^2/2 = 2*3*16/2 = 48
    assert int(out["el2"][0]) == 48


def test_fano_hand_check(ray_session, batch12_dir):
    import __ray_entry__ as e

    out = (e.queries()["fano_factor_by_type"](batch12_dir).to_pandas()
           .set_index("event_type"))
    # view daily counts (1, 1, 4): n=3 s=6 ss=18; fano = (3*18-36)/(2*6)
    assert int(out.loc["view", "ss"]) == 18
    assert out.loc["view", "fano"] == pytest.approx(18.0 / 12.0)
    assert pd.isna(out.loc["click", "fano"])


def test_assortativity_hand_check(ray_session, batch12_dir):
    import __ray_entry__ as e

    out = e.queries()["supplier_part_assortativity"](batch12_dir) \
        .to_pandas()
    # 5 distinct edges; x = dp(part) per edge, y = ds(supp) per edge:
    # (1,1):(2,2) (1,2):(2,2) (2,1):(1,2) (3,2):(2,2) (3,3):(2,1)
    assert int(out["n_edges"][0]) == 5
    assert int(out["sxy"][0]) == 4 + 4 + 2 + 4 + 2
    assert int(out["sx"][0]) == 9 and int(out["sy"][0]) == 9


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
