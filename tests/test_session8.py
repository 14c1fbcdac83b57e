"""Round-5 session-8 operators: ABC part classification, order-gap
coefficient-of-variation histogram, hour-of-day uniformity chi-square.

Fixtures are adversarial: a part landing EXACTLY on the 70% cumulative
boundary (inclusive-A contract), revenue ties broken by partkey,
all-same-day customers (s = 0 -> bucket -1), a two-order customer
(excluded by the >= 3 orders gate), perfectly regular cadence
(cv = 0), and a single-hour event type (maximal chi2 = 23n)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BATCH1 = [
    "abc_parts",
    "order_gap_cv",
    "hour_uniformity",
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
    d = str(tmp_path_factory.mktemp("s8batch1"))
    # lineitem: part revenues (e4 after *10000): p1 7000, p2 2000,
    # p3 1000 -> total 10000. Sorted desc: p1 cum 7000 (10*7000 ==
    # 7*10000 -> A inclusive), p2 cum 9000 (== 9*tot -> B inclusive),
    # p3 cum 10000 -> C. p4/p5 tie at 0.1, partkey breaks the order.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([0.7, 0.2, 0.1], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    # orders:
    #  cust 1: days 0, 10, 20, 35 -> gaps 10,10,15; s=35, s2=425,
    #    g=3: cv2*100 = 100*(3*425-1225)//1225 = 100*50//1225 = 4
    #  cust 2: 3 orders SAME day -> gaps 0,0 -> s=0 -> bucket -1
    #  cust 3: only 2 orders -> 1 gap -> excluded
    #  cust 4: days 0, 7, 14 -> constant gap -> bucket 0
    dates = (["2024-01-01", "2024-01-11", "2024-01-21", "2024-02-05"]
             + ["2024-03-01"] * 3
             + ["2024-04-01", "2024-04-05"]
             + ["2024-05-01", "2024-05-08", "2024-05-15"])
    cust = [1, 1, 1, 1, 2, 2, 2, 3, 3, 4, 4, 4]
    pq.write_table(pa.table({
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderdate": pa.array(_us(dates), pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    # events: type 'burst' all in hour 3 (n=4 -> chi2 = (24*16-16)/4
    # = 92 = 23n); type 'flat' one event in each of 4 distinct hours
    # (n=4, ss=4 -> chi2 = (96-16)/4 = 20)
    ts = _us(["2024-01-01T03:10", "2024-01-02T03:20",
              "2024-01-03T03:30", "2024-01-04T03:59",
              "2024-01-01T00:05", "2024-01-01T06:05",
              "2024-01-01T12:05", "2024-01-01T18:05"])
    pq.write_table(pa.table({
        "event_type": pa.array(["burst"] * 4 + ["flat"] * 4),
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
    for t in ("orders", "lineitem", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch1_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_abc_boundary_inclusive(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["abc_parts"](batch1_dir).to_pandas()
           .set_index("abc_class"))
    # p1 sits EXACTLY at 70% -> A; p2 exactly at 90% -> B; p3 -> C
    assert int(out.loc["A", "n_parts"]) == 1
    assert int(out.loc["A", "revenue_e4"]) == 7000
    assert int(out.loc["B", "n_parts"]) == 1
    assert int(out.loc["B", "revenue_e4"]) == 2000
    assert int(out.loc["C", "n_parts"]) == 1


def test_order_gap_cv_edges(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["order_gap_cv"](batch1_dir).to_pandas()
           .set_index("bucket"))
    # cust 2 (all same day) -> bucket -1; cust 4 (constant gap) ->
    # bucket 0; cust 1 -> bucket 4; cust 3 excluded (only one gap)
    assert int(out.loc[-1, "n_customers"]) == 1
    assert int(out.loc[0, "n_customers"]) == 1
    assert int(out.loc[4, "n_customers"]) == 1
    assert int(out["n_customers"].sum()) == 3


def test_hour_uniformity_extremes(ray_session, batch1_dir):
    import __ray_entry__ as e

    out = (e.queries()["hour_uniformity"](batch1_dir).to_pandas()
           .set_index("event_type"))
    # single-hour burst hits the chi2 maximum 23 * n
    assert out.loc["burst", "chi2"] == pytest.approx(23.0 * 4)
    assert out.loc["flat", "chi2"] == pytest.approx(20.0)


BATCH2 = [
    "cvm_flags",
    "quade_priority",
]


@pytest.fixture(scope="module")
def batch2_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s8batch2"))
    # flags: X and Y identical multisets (T = 0 exactly); Z disjoint
    # and far away (T near its maximum); ties inside and across flags
    qty = [1.0, 2.0, 2.0, 5.0,   1.0, 2.0, 2.0, 5.0,   40.0, 41.0, 41.0]
    flg = ["X"] * 4 + ["Y"] * 4 + ["Z"] * 3
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_returnflag": pa.array(flg, pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    # orders: 3 years x 3 priorities with one missing cell (2025 has
    # no LOW order -> v = 0 by the domain-completion contract) and two
    # years with IDENTICAL ranges (tied block weights -> midranks)
    rows = [
        ("2023-01-05", "HIGH", 30.00), ("2023-02-05", "MED", 20.00),
        ("2023-03-05", "LOW", 10.00),
        ("2024-01-05", "HIGH", 35.00), ("2024-02-05", "MED", 25.00),
        ("2024-03-05", "LOW", 15.00),  # range 2000 == 2023's range
        ("2025-01-05", "HIGH", 90.00), ("2025-02-05", "MED", 1.00),
    ]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us([r[0] for r in rows]),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in rows]),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
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
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch2_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def _cvm_bruteforce(xs, ys):
    """Exact rational T over the combined grid via fractions."""
    from fractions import Fraction
    n, m = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    t = Fraction(0)
    for v in grid:
        w = xs.count(v) + ys.count(v)
        fx = Fraction(sum(1 for x in xs if x <= v), n)
        gy = Fraction(sum(1 for y in ys if y <= v), m)
        t += Fraction(w, n + m) * (fx - gy) ** 2
    return t * Fraction(n * m, (n + m) ** 2)


def test_cvm_identical_and_brute(ray_session, batch2_dir):
    import __ray_entry__ as e

    out = (e.queries()["cvm_flags"](batch2_dir).to_pandas()
           .set_index(["flag_a", "flag_b"]))
    # identical samples -> every cumulative difference is 0
    assert int(out.loc[("X", "Y"), "t_e6"]) == 0
    # brute-force rational reference for the other pairs
    xs = [1, 2, 2, 5]
    zs = [40, 41, 41]
    ref = _cvm_bruteforce(xs, zs)
    got = int(out.loc[("X", "Z"), "t_e6"])
    assert got == (ref.numerator * 1_000_000) // ref.denominator


def test_quade_matches_scipy_form(ray_session, batch2_dir):
    """Hand-computed Quade on the 3x3 fixture (with the 2025 LOW cell
    completed as 0 and tied block ranges midranked)."""
    import __ray_entry__ as e

    out = (e.queries()["quade_priority"](batch2_dir).to_pandas()
           .set_index("priority"))
    # blocks: 2023 (1000,2000,3000) rg 2000; 2024 (1500,2500,3500) rg
    # 2000; 2025 (0,100,9000) rg 9000. q2 doubled midranks of ranges
    # (2000,2000,9000) -> (3,3,6). within-block doubled ranks are
    # (LOW,MED,HIGH) = (2,4,6) in every block; centered = (-2,0,2).
    # S4: LOW = 3*-2 + 3*-2 + 6*-2 = -24; MED = 0; HIGH = +24
    assert int(out.loc["LOW", "s4"]) == -24
    assert int(out.loc["MED", "s4"]) == 0
    assert int(out.loc["HIGH", "s4"]) == 24
    # A16 = sum q2^2 * 4 over cells with centered != 0:
    # per block: q2^2*(4+0+4) = 8*q2^2 -> 8*(9+9+36) = 432
    assert int(out["a16"].iloc[0]) == 432
    n, sb = 3, 24 * 24 * 2
    assert int(out["num"].iloc[0]) == (n - 1) * sb
    assert int(out["den"].iloc[0]) == n * 432 - sb


BATCH3 = [
    "km_risk_table",
    "rapid_users",
    "char_trigram_top",
]


@pytest.fixture(scope="module")
def batch3_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s8batch3"))
    # events (global max day = day of u9's last event, 2024-03-01):
    #  u1: view d0, purchase d3        -> event t=3
    #  u2: purchase d1 BEFORE view d2  -> that purchase ignored,
    #      censored at max day (t = maxday - d2)
    #  u3: view d0, no purchase        -> censored
    #  u4: same-us view+purchase       -> event t=0
    #  u5: only purchases              -> excluded (no view)
    #  u9: view at the global max day  -> censored t=0
    ev_rows = [
        (1, "view", "2024-01-01"), (1, "purchase", "2024-01-04"),
        (2, "purchase", "2024-01-02"), (2, "view", "2024-01-03"),
        (3, "view", "2024-01-01"),
        (4, "view", "2024-01-10T08:00"),
        (4, "purchase", "2024-01-10T08:00"),
        (5, "purchase", "2024-01-05"),
        (9, "view", "2024-03-01"),
    ]
    # u6: 5 events with tiny gaps (rapid); u7: 5 events, huge gaps
    # (not rapid); u8: 4 events tiny gaps (below the >= 5 gate).
    # u6 gaps: 1s,1s,2s,10h -> sorted [1s,1s,2s,10h], lower median
    # idx ceil(4/2)-1 = 1 -> 1s < 6h -> rapid
    ev_rows += [(6, "click", f"2024-02-01T00:00:0{i}")
                for i in (0, 1, 2, 4)]
    ev_rows += [(6, "click", "2024-02-01T10:00:04")]
    ev_rows += [(7, "click", f"2024-02-{dd:02d}") for dd in
                (1, 5, 9, 13, 17)]
    ev_rows += [(8, "click", f"2024-02-02T00:00:0{i}")
                for i in (0, 1, 2, 3)]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in ev_rows], pa.int64()),
        "event_type": pa.array([r[1] for r in ev_rows]),
        "ts": pa.array(_us([r[2] for r in ev_rows]), pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    # documents: en has 'abc' x2 (from "abcabc": abc,bca,cab,abc) vs
    # others x1 -> top (abc,2); fr is "zzzz" -> overlapping zzz x2;
    # de doc shorter than 3 chars contributes nothing, second de doc
    # ties "aab" and "aba" at 1 -> lexicographic 'aab' wins
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["abcabc", "zzzz", "hi", "aab aba"]),
        "lang": pa.array(["en", "fr", "de", "de"]),
    }), os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH3)
def test_batch3_match_oracle(ray_session, batch3_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch3_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch3_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_km_semantics(ray_session, batch3_dir):
    import __ray_entry__ as e

    out = (e.queries()["km_risk_table"](batch3_dir).to_pandas()
           .set_index("t"))
    # event times: t=0 (u4 same-instant) and t=3 (u1). u5 excluded;
    # u2's pre-view purchase does NOT count as an event.
    assert set(out.index) == {0, 3}
    # at t=0 every view-user is still at risk (u1,u2,u3,u4,u9 = 5)
    assert int(out.loc[0, "n_risk"]) == 5
    assert int(out.loc[0, "d_events"]) == 1
    # u9 censored at duration 0 -> counted in c_censored at t=0
    assert int(out.loc[0, "c_censored"]) == 1
    assert int(out.loc[3, "d_events"]) == 1


def test_rapid_users_gates(ray_session, batch3_dir):
    import __ray_entry__ as e

    out = e.queries()["rapid_users"](batch3_dir).to_pandas()
    # only u6 qualifies: u7 slow, u8 below the 5-event gate
    assert out["user_id"].tolist() == [6]
    assert int(out["n_events"].iloc[0]) == 5
    # lower median of sorted [1s,1s,2s,36004s] -> 1s
    assert int(out["med_gap_us"].iloc[0]) == 1_000_000


def test_trigram_ties_and_overlap(ray_session, batch3_dir):
    import __ray_entry__ as e

    out = (e.queries()["char_trigram_top"](batch3_dir).to_pandas()
           .set_index("lang"))
    assert out.loc["en", "trigram"] == "abc"
    assert int(out.loc["en", "n"]) == 2
    # overlapping windows of "zzzz" -> two "zzz"
    assert out.loc["fr", "trigram"] == "zzz"
    assert int(out.loc["fr", "n"]) == 2
    # de: "hi" contributes nothing; tie between 'aab'/'ab '/' ab'...
    # lexicographic smallest with count 1 among {'aab','ab ','b a',
    # ' ab','aba'} is ' ab' (space < letters)
    assert out.loc["de", "trigram"] == " ab"


BATCH4 = [
    "odds_ratio_flags",
    "kendalls_w_priorities",
]


@pytest.fixture(scope="module")
def batch4_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s8batch4"))
    # 2x2: a=2 (R, >=25), b=1 (R, <25), c=1 (not R, >=25), d=3 ->
    # OR = 2*3/(1*1) = 6.0; boundary qty exactly 25 counts as bulk
    qty = [25.0, 30.0, 10.0, 40.0, 5.0, 6.0, 7.0]
    flg = ["R", "R", "R", "N", "N", "A", "A"]
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_returnflag": pa.array(flg, pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    # kendall W: 2 years fully agreeing on 3 priorities (perfect
    # concordance, no ties) -> W = 1 exactly
    rows = [
        ("2023-01-05", "HIGH", 30.00), ("2023-02-05", "MED", 20.00),
        ("2023-03-05", "LOW", 10.00),
        ("2024-01-05", "HIGH", 35.00), ("2024-02-05", "MED", 25.00),
        ("2024-03-05", "LOW", 15.00),
    ]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us([r[0] for r in rows]),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in rows]),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH4)
def test_batch4_match_oracle(ray_session, batch4_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch4_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch4_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_odds_ratio_cells(ray_session, batch4_dir):
    import __ray_entry__ as e

    out = e.queries()["odds_ratio_flags"](batch4_dir).to_pandas()
    assert (int(out["a"][0]), int(out["b"][0]),
            int(out["c"][0]), int(out["d"][0])) == (2, 1, 1, 3)
    assert int(out["or_e6"][0]) == 6_000_000


def test_kendalls_w_perfect_concordance(ray_session, batch4_dir):
    import __ray_entry__ as e

    out = e.queries()["kendalls_w_priorities"](batch4_dir).to_pandas()
    assert out["w"][0] == pytest.approx(1.0)
    assert int(out["tie_t"][0]) == 0


def test_kendalls_w_all_tied_is_null(ray_session, tmp_path):
    """Every year fully tied -> denominator 0 -> NULL, not a crash."""
    import __ray_entry__ as e

    d = str(tmp_path)
    rows = [("2023-01-05", "HIGH", 10.00), ("2023-02-05", "LOW", 10.00),
            ("2024-01-05", "HIGH", 20.00), ("2024-02-05", "LOW", 20.00)]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us([r[0] for r in rows]),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[1] for r in rows]),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    out = e.queries()["kendalls_w_priorities"](d).to_pandas()
    assert pd.isna(out["w"][0])
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    exp = con.sql(e.oracle_sql()["kendalls_w_priorities"]).df()
    assert _vhash(out) == _vhash(exp)


BATCH5 = [
    "dwell_time_percentiles",
    "longest_alt_run_hist",
    "stopword_ratio_hist",
    "bigram_diversity_hist",
]


@pytest.fixture(scope="module")
def batch5_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s8batch5"))
    # events: u1 has 10 gaps of exactly 1..10 minutes (order-stat
    # probes: p50 -> 5, p90 -> 9, p99 -> 10); u2 has a ts TIE broken
    # by event_id (alternation depends on the total order: types
    # a,b,a at the same us — eid order makes the run length 3)
    base = int(np.datetime64("2024-01-01T00:00").astype(
        "datetime64[us]").astype(np.int64))
    u1_ts = [base]
    for gap_min in range(1, 11):
        u1_ts.append(u1_ts[-1] + gap_min * 60_000_000)
    rows = [(1, "view", ts, i) for i, ts in enumerate(u1_ts)]
    # u1 types: view,view,... -> longest alt run 1
    tie = base + 10**9
    rows += [(2, "a", tie, 100), (2, "b", tie, 101), (2, "a", tie, 102),
             (2, "a", tie + 60_000_000, 103)]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[3] for r in rows], pa.int64()),
    }), os.path.join(d, "events.parquet"))
    # documents: en doc "the and xyz qrs" -> 2 stopwords of 4 tokens
    # -> bucket 50; zh doc (no bank) -> bucket 0; "aaaa" -> 1 distinct
    # bigram / 3 positions -> bucket 33; "abab" -> 2/3 -> 66
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["the and xyz qrs", "mao zedong", "aaaa",
                          "abab"]),
        "lang": pa.array(["en", "zh", "fr", "fr"]),
    }), os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH5)
def test_batch5_match_oracle(ray_session, batch5_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch5_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch5_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_dwell_order_stats(ray_session, batch5_dir):
    import __ray_entry__ as e

    out = e.queries()["dwell_time_percentiles"](batch5_dir).to_pandas()
    # 13 gaps total: u1's 1..10 plus u2's 0,0,1 -> sorted
    # [0,0,1,1,2,3,4,5,6,7,8,9,10]; p50 idx ceil(6.5)-1=6 -> 4
    assert int(out["n_gaps"][0]) == 13
    assert int(out["p50"][0]) == 4
    assert int(out["p99"][0]) == 10


def test_alt_run_tie_break(ray_session, batch5_dir):
    import __ray_entry__ as e

    out = (e.queries()["longest_alt_run_hist"](batch5_dir).to_pandas()
           .set_index("run_len"))
    # u1: 11 identical types -> run 1; u2: a,b,a (eid order), then a
    # repeats -> longest run 3
    assert int(out.loc[1, "n_users"]) == 1
    assert int(out.loc[3, "n_users"]) == 1


def test_stopword_and_bigram_buckets(ray_session, batch5_dir):
    import __ray_entry__ as e

    sw = (e.queries()["stopword_ratio_hist"](batch5_dir).to_pandas()
          .set_index(["lang", "bucket"]))
    assert int(sw.loc[("en", 50), "n_docs"]) == 1
    assert int(sw.loc[("zh", 0), "n_docs"]) == 1
    bg = (e.queries()["bigram_diversity_hist"](batch5_dir).to_pandas()
          .set_index(["lang", "bucket"]))
    assert int(bg.loc[("fr", 33), "n_docs"]) == 1
    assert int(bg.loc[("fr", 66), "n_docs"]) == 1
