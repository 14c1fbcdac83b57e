"""Round-5 session-5 operators, batch 1: Bartels rank von Neumann
randomness test, Cox-Stuart trend sign test, daily technical
indicators (RSI-14 / stochastic %K / OBV as exact integers), Aroon-25
via composite integer window extremes, Moors octile kurtosis.

Fixtures are adversarial: heavy value ties (doubled mid-ranks,
Cox-Stuart tie census), a day with two orders (day-sum + OBV volume),
flat stochastic windows, Aroon high/low ties that must resolve to the
LATEST day, an octile set with zero interpolation remainder (n=9) and
one with every remainder nonzero (n=10), an all-equal flag (den8=0),
an n<8 flag (excluded), and single-day series (empty result on both
sides)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAILY_A = ["bartels_rank_test", "cox_stuart_trend",
           "tech_indicators_daily"]


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


def _write_orders(d, days, vals):
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))


def _match_oracle(name, fix_dir):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](fix_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        p = os.path.join(fix_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name
    return got


@pytest.fixture(scope="module")
def daily16_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11daily16"))
    # 16 days; day 1 split into two orders (2.0 + 3.0 = 5.0) to
    # exercise the day-sum and the v=2 OBV volume (never used: OBV
    # weights start at day 2).
    days = (["2023-01-01", "2023-01-01"]
            + ["2023-01-%02d" % i for i in range(2, 17)])
    vals = [2.0, 3.0, 3.0, 3.0, 8.0, 2.0, 9.0, 1.0, 4.0, 4.0,
            7.0, 6.0, 10.0, 2.0, 5.0, 5.0, 12.0]
    _write_orders(d, days, vals)
    return d


@pytest.fixture(scope="module")
def daily30_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11daily30"))
    # 30 days, constant 7 except two tied highs (9 at idx 10 and 20)
    # and two tied lows (1 at idx 5 and 28) — Aroon must pick the
    # LATEST on both sides.
    vals = [7.0] * 30
    vals[10] = 9.0
    vals[20] = 9.0
    vals[5] = 1.0
    vals[28] = 1.0
    days = ["2023-02-%02d" % i for i in range(1, 29)] + \
           ["2023-03-01", "2023-03-02"]
    _write_orders(d, days, vals)
    return d


@pytest.fixture(scope="module")
def moors_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11moors"))
    qty = ([1, 2, 3, 4, 5, 6, 7, 8, 100]          # A: n=9, rem==0
           + [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]   # C: n=10, rem>0
           + [5] * 8                               # D: all equal
           + [1, 2, 3, 4, 5, 6, 7])                # B: n=7 excluded
    flag = ["A"] * 9 + ["C"] * 10 + ["D"] * 8 + ["B"] * 7
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flag, pa.string()),
        "l_quantity": pa.array([float(x) for x in qty], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d


@pytest.mark.parametrize("name", DAILY_A)
def test_daily16_match_oracle(ray_session, daily16_dir, name):
    _match_oracle(name, daily16_dir)


@pytest.mark.parametrize("name",
                         DAILY_A + ["aroon_25"])
def test_daily30_match_oracle(ray_session, daily30_dir, name):
    _match_oracle(name, daily30_dir)


def test_moors_match_oracle(ray_session, moors_dir):
    _match_oracle("moors_kurtosis_by_flag", moors_dir)


def test_bartels_hand_values(ray_session, daily16_dir):
    import __ray_entry__ as e

    out = e.queries()["bartels_rank_test"](daily16_dir).to_pandas()
    assert int(out.loc[0, "n_days"]) == 16
    assert int(out.loc[0, "num4"]) == 3316
    assert int(out.loc[0, "den4"]) == 1346
    assert int(out.loc[0, "rvn_e6"]) == 3316_000_000 // 1346


def test_cox_stuart_hand_values(ray_session, daily16_dir):
    import __ray_entry__ as e

    out = e.queries()["cox_stuart_trend"](daily16_dir).to_pandas()
    # a = [5,3,3,8,2,9,1,4], b = [4,7,6,10,2,5,5,12]
    assert int(out.loc[0, "n_pairs"]) == 8
    assert int(out.loc[0, "n_pos"]) == 5
    assert int(out.loc[0, "n_neg"]) == 2
    assert int(out.loc[0, "n_tie"]) == 1


def test_tech_indicators_hand_values(ray_session, daily16_dir):
    import __ray_entry__ as e

    out = (e.queries()["tech_indicators_daily"](daily16_dir)
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert len(out) == 2
    assert int(out.loc[0, "close_v"]) == 500
    assert int(out.loc[0, "gain14"]) == 2500
    assert int(out.loc[0, "loss14"]) == 2500
    assert int(out.loc[0, "stoch_num"]) == 400
    assert int(out.loc[0, "stoch_den"]) == 900
    assert list(out["obv"]) == [1, 2]
    assert int(out.loc[1, "stoch_num"]) == 1100
    assert int(out.loc[1, "stoch_den"]) == 1100


def test_aroon_latest_tie_rule(ray_session, daily30_dir):
    import __ray_entry__ as e

    out = (e.queries()["aroon_25"](daily30_dir)
           .to_pandas().sort_values("day").reset_index(drop=True))
    assert len(out) == 6          # idx 24..29
    last = out.iloc[-1]           # idx 29: highs at 10,20 -> 20
    assert int(last["days_since_high"]) == 9
    assert int(last["days_since_low"]) == 1   # lows at 5,28 -> 28
    first = out.iloc[0]           # idx 24: high 20, low 5
    assert int(first["days_since_high"]) == 4
    assert int(first["days_since_low"]) == 19


def test_moors_hand_values(ray_session, moors_dir):
    import __ray_entry__ as e

    out = (e.queries()["moors_kurtosis_by_flag"](moors_dir)
           .to_pandas().set_index("flag"))
    assert sorted(out.index) == ["A", "C", "D"]   # B (n=7) excluded
    assert int(out.loc["A", "num8"]) == 32
    assert int(out.loc["A", "den8"]) == 32
    assert int(out.loc["A", "moors_e6"]) == 1_000_000
    assert int(out.loc["C", "num8"]) == 191
    assert int(out.loc["C", "den8"]) == 134
    assert int(out.loc["C", "moors_e6"]) == 191_000_000 // 134
    assert int(out.loc["D", "den8"]) == 0
    assert int(out.loc["D", "moors_e6"]) == 0


def test_single_day_empty_both_sides(ray_session, tmp_path):
    import duckdb

    import __ray_entry__ as e

    d = str(tmp_path)
    _write_orders(d, ["2023-01-01"], [5.0])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM"
            f" '{os.path.join(d, 'orders.parquet')}'")
    for name in ("bartels_rank_test", "cox_stuart_trend"):
        got = e.queries()[name](d).to_pandas()
        exp = con.sql(e.oracle_sql()[name]).df()
        assert len(got) == 0 and len(exp) == 0, name


# ---------------------------------------------------------------------------
# batch 2: sequential basket, FD audit, vocab richness, rolling med/MAD
# ---------------------------------------------------------------------------


def _match_oracle2(name, fix_dir, tables):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](fix_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(fix_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name
    return got


@pytest.fixture(scope="module")
def basket_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11basket"))
    # cust 1: o1(d1: parts 10,10,11) -> o2(d2: 20) -> o3(d3: 10)
    # cust 2: single order (no link); cust 3: same-date pair, the
    # orderkey tiebreak must order o40 before o41.
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 9, 40, 41], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "o_orderdate": pa.array(_us(
            ["2023-01-01", "2023-01-05", "2023-01-09",
             "2023-01-02", "2023-02-01", "2023-02-01"]),
            pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 3, 9, 40, 41], pa.int64()),
        "l_partkey": pa.array([10, 10, 11, 20, 10, 99, 5, 6],
                              pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d


def test_next_order_part_pairs(ray_session, basket_dir):
    got = _match_oracle2("next_order_part_pairs", basket_dir,
                         ["orders", "lineitem"])
    got = got.sort_values(["n", "part_a", "part_b"],
                          ascending=[False, True, True])
    rows = [tuple(map(int, r)) for r in
            got[["part_a", "part_b", "n"]].itertuples(index=False)]
    # (10,20) twice via the duplicated part-10 lineitem row
    assert rows == [(10, 20, 2), (5, 6, 1), (11, 20, 1), (20, 10, 1)]


@pytest.fixture(scope="module")
def fd_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11fd"))
    pq.write_table(pa.table({
        "p_brand": pa.array(["A", "A", "B", "B", "B"], pa.string()),
        "p_type": pa.array(["t1", "t1", "t1", "t2", "t2"],
                           pa.string()),
        "p_size": pa.array([1, 2, 1, 3, 3], pa.int32()),
    }), os.path.join(d, "part.parquet"))
    return d


def test_fd_audit_hand_values(ray_session, fd_dir):
    got = _match_oracle2("fd_audit_parts", fd_dir, ["part"])
    g = got.set_index("fd")
    # brand->type: A ok, B viol; type->size: t1 viol, t2 ok;
    # size->brand: 1 viol, 2 ok, 3 ok
    assert (int(g.loc["brand->type", "n_groups"]),
            int(g.loc["brand->type", "n_violating"])) == (2, 1)
    assert (int(g.loc["type->size", "n_groups"]),
            int(g.loc["type->size", "n_violating"])) == (2, 1)
    assert (int(g.loc["size->brand", "n_groups"]),
            int(g.loc["size->brand", "n_violating"])) == (3, 1)


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11vocab"))
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "fr"], pa.string()),
        "text": pa.array(["a a b b c", "a d", "x y"], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    return d


def test_vocab_richness_hand_values(ray_session, vocab_dir):
    got = _match_oracle2("vocab_richness_by_lang", vocab_dir,
                         ["documents"])
    en = got.set_index("lang").loc["en"]
    # a:3 b:2 c:1 d:1 -> N=7 V=4 s2=15 v2=1
    assert int(en["n_tokens"]) == 7
    assert int(en["vocab"]) == 4
    assert int(en["s2"]) == 15
    assert int(en["v2"]) == 1
    assert int(en["yule_k_e4"]) == (15 - 7) * 100_000_000 // 49
    assert int(en["sichel_e6"]) == 250_000
    assert int(en["guiraud_r2_e6"]) == 16 * 1_000_000 // 7


@pytest.fixture(scope="module")
def med9_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11med9"))
    days = ["2023-01-%02d" % i for i in range(1, 10)]
    _write_orders(d, days, [5.0, 3.0, 8.0, 2.0, 9.0, 1.0, 4.0,
                            7.0, 6.0])
    return d


def test_rolling_median7_mad_hand_values(ray_session, med9_dir):
    got = _match_oracle2("rolling_median7_mad", med9_dir, ["orders"])
    got = got.sort_values("day").reset_index(drop=True)
    assert list(got["med7"]) == [400, 400, 600]
    assert list(got["mad7"]) == [200, 300, 200]


# ---------------------------------------------------------------------------
# batch 3: PACF lag-2, candidate keys, Ansari-Bradley, expanding median
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pacf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11pacf"))
    # x (k$ units) = [1,3,2,5,4]: a0=250, a1=0, a2=25
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  [1000.0, 3000.0, 2000.0, 5000.0, 4000.0])
    return d


@pytest.fixture(scope="module")
def pacf_neg_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11pacfneg"))
    # x = [1,2,1,2,1]: a0=30, a1=-24, a2=17 ->
    # pacf2 = -66e6 / 324 = -203703.7 -> TRUNCATES to -203703
    # (floor would give -203704 — locks the DuckDB // parity rule)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  [1000.0, 2000.0, 1000.0, 2000.0, 1000.0])
    return d


def test_pacf_hand_values(ray_session, pacf_dir):
    got = _match_oracle("pacf_lag2", pacf_dir)
    assert int(got.loc[0, "rho1_e6"]) == 0
    assert int(got.loc[0, "rho2_e6"]) == 25_000_000 // 250
    assert int(got.loc[0, "pacf2_e6"]) == 6_250_000_000 // 62_500


def test_pacf_negative_truncation(ray_session, pacf_neg_dir):
    got = _match_oracle("pacf_lag2", pacf_neg_dir)
    assert int(got.loc[0, "rho1_e6"]) == -800_000
    assert int(got.loc[0, "pacf2_e6"]) == -203_703   # NOT -203704


@pytest.fixture(scope="module")
def keyaudit_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11keys"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([5, 5, 6], pa.int64()),
        "o_orderdate": pa.array(
            _us(["2023-01-01", "2023-01-01", "2023-01-02"]),
            pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    return d


def test_candidate_key_hand_values(ray_session, keyaudit_dir):
    got = _match_oracle("candidate_key_audit", keyaudit_dir)
    g = got.set_index("combo")
    assert int(g.loc["orderkey", "is_key"]) == 1
    assert int(g.loc["custkey", "n_distinct"]) == 2
    assert int(g.loc["custkey", "is_key"]) == 0
    assert int(g.loc["custkey|orderdate", "n_distinct"]) == 2
    assert int(g.loc["custkey|orderdate", "is_key"]) == 0


@pytest.fixture(scope="module")
def ansari_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11ansari"))
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "A", "R", "R", "N"],
                                 pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 2.0, 2.0, 9.0, 50.0],
                               pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d


def test_ansari_hand_values(ray_session, ansari_dir):
    got = _match_oracle("ansari_bradley_flags", ansari_dir)
    # pooled A=[1,2,2] R=[2,9] (the N row excluded): d=[2,6,6,6,10],
    # s2=min(d,12-d) -> 1:2, 2:6, 9:2
    assert int(got.loc[0, "n_a"]) == 3
    assert int(got.loc[0, "n_r"]) == 2
    assert int(got.loc[0, "ab2_a"]) == 14
    assert int(got.loc[0, "ab2_r"]) == 8


def test_expanding_median_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 5)],
                  [5.0, 3.0, 8.0, 2.0])
    got = (_match_oracle("expanding_median_x4", d)
           .sort_values("day").reset_index(drop=True))
    assert list(got["med_x4"]) == [2000, 1600, 2000, 1600]


# ---------------------------------------------------------------------------
# batch 4: above-own-avg orders, AMS F2 sketch, priority transitions
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def aboveavg_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11above"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0, 4.0, 4.0],
                                 pa.float64()),
        "o_orderdate": pa.array(_us(
            ["2023-01-01", "2023-01-02", "2023-01-03",
             "2023-01-01", "2023-01-05", "2023-01-05"]),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "2-HIGH", "2-HIGH", "5-LOW",
             "3-MEDIUM", "4-NOT SPECIFIED"], pa.string()),
    }), os.path.join(d, "orders.parquet"))
    return d


def test_above_avg_hand_values(ray_session, aboveavg_dir):
    # cust1 [10,20,30]: only 30 STRICTLY above mean 20 -> 1
    # cust2 [5] -> 0; cust3 [4,4] -> 0 (equal, not strict)
    got = _match_oracle("above_avg_orders", aboveavg_dir)
    g = got.set_index("n_above")
    assert int(g.loc[0, "n_customers"]) == 2
    assert int(g.loc[1, "n_customers"]) == 1


def test_priority_transitions_hand_values(ray_session, aboveavg_dir):
    got = _match_oracle("priority_transition_matrix", aboveavg_dir)
    cells = {(r.prev_priority, r.priority): int(r.n)
             for r in got.itertuples(index=False)}
    # cust1: URGENT->HIGH, HIGH->HIGH; cust3 same-date orderkey
    # tiebreak: key5 (MEDIUM) before key6 (NOT SPECIFIED)
    assert cells == {("1-URGENT", "2-HIGH"): 1,
                     ("2-HIGH", "2-HIGH"): 1,
                     ("3-MEDIUM", "4-NOT SPECIFIED"): 1}


@pytest.fixture(scope="module")
def ams_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11ams"))
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
    }), os.path.join(d, "events.parquet"))
    return d


def test_ams_f2_hand_values(ray_session, ams_dir):
    import duckdb
    import hashlib

    import __ray_entry__ as e

    got = e.queries()["ams_f2_sketch"](ams_dir).to_pandas()
    assert int(got.loc[0, "exact_f2"]) == 10     # 3^2 + 1^2
    # recompute the deterministic estimator independently
    groups = []
    for gi in range(5):
        tot = 0
        for j in range(4 * gi, 4 * gi + 4):
            z = 0
            for t_, f_ in (("a", 3), ("b", 1)):
                hx = hashlib.md5(
                    f"{t_}:{j}".encode()).hexdigest()[:8]
                z += f_ if hx < "80000000" else -f_
            tot += z * z
        groups.append(tot)
    est4 = sorted(groups)[2]
    assert int(got.loc[0, "est4"]) == est4
    assert int(got.loc[0, "ratio_e4"]) == est4 * 10_000 // 40
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM"
            f" '{os.path.join(ams_dir, 'events.parquet')}'")
    exp = con.sql(e.oracle_sql()["ams_f2_sketch"]).df()
    assert _vhash(got) == _vhash(exp)


# ---------------------------------------------------------------------------
# batch 5: Chatterjee xi, KMV Jaccard audit, parquet footer audit
# ---------------------------------------------------------------------------


def test_chatterjee_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    # y=[5,3,8,8,2]: r=[3,2,5,5,1], l=[3,4,2,2,5], S=8, T=22
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  [5.0, 3.0, 8.0, 8.0, 2.0])
    got = _match_oracle("chatterjee_xi_daily", d)
    assert int(got.loc[0, "s_abs"]) == 8
    assert int(got.loc[0, "t_sum"]) == 22
    assert int(got.loc[0, "xi_e6"]) == 4_000_000 // 44


def test_chatterjee_negative_truncation(ray_session, tmp_path):
    d = str(tmp_path)
    # alternating y: xi = -16/24 -> -666666 TRUNCATED (not -666667)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  [1.0, 2.0, 1.0, 2.0, 1.0])
    got = _match_oracle("chatterjee_xi_daily", d)
    assert int(got.loc[0, "xi_e6"]) == -666_666


def test_chatterjee_constant_series(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 4)],
                  [5.0, 5.0, 5.0])
    got = _match_oracle("chatterjee_xi_daily", d)
    assert int(got.loc[0, "t_sum"]) == 0
    assert int(got.loc[0, "xi_e6"]) == 0


@pytest.fixture(scope="module")
def kmv_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11kmv"))
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "de", "fr"], pa.string()),
        "text": pa.array(["a b c d", "c d e", "z z z"], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    return d


def test_kmv_hand_values(ray_session, kmv_dir):
    got = _match_oracle2("kmv_jaccard_audit", kmv_dir, ["documents"])
    # union {a,b,c,d,e}=5, inter {c,d}=2; k>=union so the KMV sample
    # IS the union -> estimate == exact (fr tokens excluded)
    assert int(got.loc[0, "exact_union"]) == 5
    assert int(got.loc[0, "exact_inter"]) == 2
    assert int(got.loc[0, "kmv_k"]) == 5
    assert int(got.loc[0, "kmv_inter"]) == 2
    assert int(got.loc[0, "kmv_jac_e6"]) == 400_000
    assert int(got.loc[0, "exact_jac_e6"]) == 400_000


def test_parquet_footer_audit_parity(ray_session, kmv_dir):
    import duckdb

    import __ray_entry__ as e

    got = (e.queries()["parquet_footer_audit"](kmv_dir)
           .to_pandas().set_index("file"))
    exp = duckdb.sql(
        "SELECT regexp_extract(file_name, '[^/]+$') AS file,"
        " CAST(sum(total_compressed_size) AS BIGINT) AS comp,"
        " CAST(sum(total_uncompressed_size) AS BIGINT) AS unc"
        f" FROM parquet_metadata('{kmv_dir}/*.parquet')"
        " GROUP BY 1").df().set_index("file")
    fexp = duckdb.sql(
        "SELECT regexp_extract(file_name, '[^/]+$') AS file,"
        " num_rows, num_row_groups"
        f" FROM parquet_file_metadata('{kmv_dir}/*.parquet')"
        ).df().set_index("file")
    assert set(got.index) == {"documents.parquet"}
    r = got.loc["documents.parquet"]
    assert int(r["compressed_bytes"]) == int(
        exp.loc["documents.parquet", "comp"])
    assert int(r["uncompressed_bytes"]) == int(
        exp.loc["documents.parquet", "unc"])
    assert int(r["n_rows"]) == int(
        fexp.loc["documents.parquet", "num_rows"])
    assert int(r["n_row_groups"]) == int(
        fexp.loc["documents.parquet", "num_row_groups"])


# ---------------------------------------------------------------------------
# batch 6: chunk overlap, rare-token mass, hash16 collisions, batch padding
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11chunk"))
    # token counts 64 (k=1, ct=64), 65 (k=2, ct=64+17=81), 3 (k=1)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
        "text": pa.array(["w " * 64, "w " * 65, "a b c"],
                         pa.string()),
    }), os.path.join(d, "documents.parquet"))
    return d


def test_chunk_overlap_hand_values(ray_session, chunk_dir):
    got = _match_oracle2("chunk_overlap_stats", chunk_dir,
                         ["documents"])
    assert int(got.loc[0, "doc_tokens"]) == 132
    assert int(got.loc[0, "n_chunks"]) == 4
    assert int(got.loc[0, "chunk_tokens"]) == 148
    assert int(got.loc[0, "dup_e6"]) == 148_000_000 // 132


@pytest.fixture(scope="module")
def rare_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11rare"))
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "en"], pa.string()),
        "text": pa.array(["a a a a a a a a a a a a b", "b c"],
                         pa.string()),
    }), os.path.join(d, "documents.parquet"))
    return d


def test_rare_token_mass_hand_values(ray_session, rare_dir):
    got = _match_oracle2("rare_token_mass_by_lang", rare_dir,
                         ["documents"])
    # a:12 (common), b:2, c:1 (rare): mass 3/15, types 2/3
    assert int(got.loc[0, "n_tokens"]) == 15
    assert int(got.loc[0, "vocab"]) == 3
    assert int(got.loc[0, "rare_types"]) == 2
    assert int(got.loc[0, "rare_mass"]) == 3
    assert int(got.loc[0, "rare_mass_e6"]) == 200_000
    assert int(got.loc[0, "rare_type_e6"]) == 666_666


def test_hash16_collision_planted(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    # find a doc_id whose 16-bit md5 prefix collides with doc_id 1
    target = hashlib.md5(b"1").hexdigest()[:4]
    twin = next(i for i in range(2, 200_000)
                if hashlib.md5(str(i).encode()).hexdigest()[:4]
                == target)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, twin, twin + 1], pa.int64()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "text": pa.array(["x"] * 3, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("hash16_collision_audit", d, ["documents"])
    assert int(got.loc[0, "n_ids"]) == 3
    assert int(got.loc[0, "n_hash_values"]) == 2
    assert int(got.loc[0, "n_colliding_ids"]) == 2
    assert int(got.loc[0, "max_bucket"]) == 2


def test_batch_padding_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    # 64 docs alternating 1-token / 100-token: arrival batches mix
    # (max 100 both), sorted batches separate (max 1 then 100)
    ids = list(range(1, 65))
    texts = ["x" if i % 2 == 1 else "x " * 100 for i in ids]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(["en"] * 64, pa.string()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("batch_padding_compare", d, ["documents"])
    assert int(got.loc[0, "n_docs"]) == 64
    assert int(got.loc[0, "n_tokens"]) == 3232
    assert int(got.loc[0, "pad_arrival"]) == 6400
    assert int(got.loc[0, "pad_sorted"]) == 3232
    assert int(got.loc[0, "saving_e6"]) == 3168 * 1_000_000 // 6400


# ---------------------------------------------------------------------------
# batch 7: Haar details, isotonic PAVA, nation seasonality, YoY sign test
# ---------------------------------------------------------------------------


def test_haar_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  [1.0, 2.0, 3.0, 4.0, 5.0])
    got = _match_oracle("haar_details_daily", d)
    got = got.sort_values(["level", "block"]).reset_index(drop=True)
    # L1: (100-200), (300-400); day 5 dropped. L2: (100+200)-(300+400)
    assert [tuple(map(int, r)) for r in
            got[["level", "block", "detail"]].itertuples(index=False)
            ] == [(1, 0, -100), (1, 1, -100), (2, 0, -400)]


def _brute_pava(vals):
    # vals: list of (q, sum, cnt); returns per-block pooled (sum, cnt)
    out = []
    for q, s, c in vals:
        out.append([q, s, c])
        while len(out) >= 2 and \
                out[-2][1] * out[-1][2] > out[-1][1] * out[-2][2]:
            s2, c2 = out[-1][1], out[-1][2]
            out.pop()
            out[-1][1] += s2
            out[-1][2] += c2
    return out


def test_isotonic_pools_violators(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 4.0, 6.0, 9.0],
                                    pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    import __ray_entry__ as e

    got = (e.queries()["isotonic_qty_revenue"](d)
           .to_pandas().sort_values("q").reset_index(drop=True))
    # 1000 > 400 pools; 1400/2 > 600 pools -> block(1..3) = 2000/3;
    # then 900 >= 2000/3 stays separate
    assert list(got["block_start"]) == [1, 1, 1, 4]
    assert list(got["fit_num"]) == [2000, 2000, 2000, 900]
    assert list(got["fit_den"]) == [3, 3, 3, 1]
    # property: fitted means nondecreasing; totals preserved per block
    means = [n / dnm for n, dnm in zip(got["fit_num"],
                                      got["fit_den"])]
    assert all(means[i] <= means[i + 1] + 1e-12
               for i in range(len(means) - 1))


def test_isotonic_monotone_input_unpooled(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "l_extendedprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    import __ray_entry__ as e

    got = (e.queries()["isotonic_qty_revenue"](d)
           .to_pandas().sort_values("q").reset_index(drop=True))
    assert list(got["block_start"]) == [1, 2, 3]
    assert list(got["fit_den"]) == [1, 1, 1]


@pytest.fixture(scope="module")
def nation_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s11nation"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([7, 8], pa.int64()),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(
            ["2023-01-05", "2023-01-20", "2023-02-01",
             "2023-06-15"]), pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    return d


def test_nation_seasonality_hand_values(ray_session, nation_dir):
    got = _match_oracle2("nation_seasonality_amplitude", nation_dir,
                         ["orders", "customer"])
    g = got.set_index("nk")
    # nation 7: months [2,1,0,...] -> amp (2-0)/3
    assert int(g.loc[7, "max_month_n"]) == 2
    assert int(g.loc[7, "min_month_n"]) == 0
    assert int(g.loc[7, "amplitude_e6"]) == 2_000_000 // 3
    assert int(g.loc[8, "n_orders"]) == 1


def test_yoy_sign_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["1995-01-10", "1995-02-10", "1995-03-10",
                      "1997-01-10", "1997-02-10"],
                  [1.0, 2.0, 9.0, 5.0, 2.0])
    got = _match_oracle("yoy_month_sign_test", d)
    assert int(got.loc[0, "year_a"]) == 1995
    assert int(got.loc[0, "year_b"]) == 1997
    assert int(got.loc[0, "n_pairs"]) == 2   # March unpaired
    assert int(got.loc[0, "n_pos"]) == 1
    assert int(got.loc[0, "n_neg"]) == 0
    assert int(got.loc[0, "n_tie"]) == 1


# ---------------------------------------------------------------------------
# batch 8: weekly ANOVA folding, MMD poly2, winsorized corr, rank-biserial
# ---------------------------------------------------------------------------


def test_weekly_folding_matches_oracle(ray_session, tmp_path):
    d = str(tmp_path)
    days = ["2023-01-%02d" % i for i in range(1, 15)]
    vals = [5000.0, 8000.0, 3000.0, 9000.0, 2000.0, 7000.0, 4000.0,
            6000.0, 8000.0, 2000.0, 9000.0, 3000.0, 7000.0, 5000.0]
    _write_orders(d, days, vals)
    got = _match_oracle("weekly_folding_anova", d)
    assert int(got.loc[0, "n"]) == 14
    x = np.array([5, 8, 3, 9, 2, 7, 4, 6, 8, 2, 9, 3, 7, 5],
                 dtype=float)
    tot_ss = float(np.sum(x * x) - x.sum() ** 2 / 14)
    assert abs(float(got.loc[0, "ssb"]) + float(got.loc[0, "ssw"])
               - tot_ss) < 1e-9


def test_mmd_poly2_hand_values(ray_session, ansari_dir):
    # reuse ansari fixture: A=[1,2,2], R=[2,9] -> recompute directly
    got = _match_oracle("mmd_poly2_flags", ansari_dir)
    na, s1a, s2a = 3, 5, 9
    nr, s1r, s2r = 2, 11, 85
    kaa = s2a * s2a + 2 * s1a * s1a + na * na
    krr = s2r * s2r + 2 * s1r * s1r + nr * nr
    kar = s2a * s2r + 2 * s1a * s1r + na * nr
    num = kaa * nr * nr + krr * na * na - 2 * kar * na * nr
    den = na * na * nr * nr
    assert int(got.loc[0, "n_a"]) == 3
    assert int(got.loc[0, "n_r"]) == 2
    assert int(got.loc[0, "mmd_e6"]) == num * 1_000_000 // den


def test_winsorized_corr_identity(ray_session, tmp_path):
    d = str(tmp_path)
    q = list(range(1, 21)) + [100]
    pq.write_table(pa.table({
        "l_quantity": pa.array([float(x) for x in q], pa.float64()),
        "l_discount": pa.array([x / 100.0 for x in q], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("winsorized_corr_qty_disc", d)
    # dd == q exactly, same clipping both margins -> corr == 1
    assert abs(float(got.loc[0, "corr_w"]) - 1.0) < 1e-12


def test_rank_biserial_hand_values(ray_session, ansari_dir):
    got = _match_oracle("rank_biserial_flags", ansari_dir)
    # A=[1,2,2], R=[2,9]: sum_A d2 = 14, u2 = 2,
    # rbc = (2-6)/6 -> -666666 TRUNCATED
    assert int(got.loc[0, "u2"]) == 2
    assert int(got.loc[0, "rbc_e6"]) == -666_666


# ---------------------------------------------------------------------------
# batch 9: copula density grid, matrix profile, LIS
# ---------------------------------------------------------------------------


def test_copula_antidiagonal(ray_session, tmp_path):
    d = str(tmp_path)
    q = list(range(1, 11))
    pq.write_table(pa.table({
        "l_quantity": pa.array([float(x) for x in q], pa.float64()),
        "l_discount": pa.array([(11 - x) / 100.0 for x in q],
                               pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("copula_density_qty_disc", d)
    cells = {(int(r.cell_q), int(r.cell_d)): int(r.n)
             for r in got.itertuples(index=False)}
    # anti-monotone margins -> pure anti-diagonal, 2 rows per cell
    assert cells == {(0, 4): 2, (1, 3): 2, (2, 2): 2,
                     (3, 1): 2, (4, 0): 2}


def test_matrix_profile_planted_motif(ray_session, tmp_path):
    d = str(tmp_path)
    pat = [5.0, 9.0, 2.0, 7.0, 3.0, 8.0, 4.0]
    vals = pat + pat + [20.0, 1.0]
    days = ["2023-03-%02d" % i for i in range(1, 17)]
    _write_orders(d, days, vals)
    got = _match_oracle("matrix_profile_7day", d)
    g = got.set_index("kind")
    day0 = _us(["2023-03-01"])[0] // (86_400 * 1_000_000)
    # identical windows at idx 0 and 7 -> motif distance 0
    assert int(g.loc["motif", "l1"]) == 0
    assert int(g.loc["motif", "day_a"]) == day0
    assert int(g.loc["motif", "day_b"]) == day0 + 7
    # discord: brute-force reference
    r = np.array([int(round(v * 100)) for v in vals], dtype=np.int64)
    m = len(r) - 6
    W = np.stack([r[i:i + 7] for i in range(m)])
    D = np.abs(W[:, None, :] - W[None, :, :]).sum(axis=2)
    for i in range(m):
        for j in range(m):
            if abs(i - j) < 7:
                D[i, j] = 1 << 62
    nnd = D.min(axis=1)
    valid = np.flatnonzero(nnd < (1 << 62))
    da = int(valid[np.argmax(nnd[valid])])
    assert int(g.loc["discord", "day_a"]) == day0 + da
    assert int(g.loc["discord", "l1"]) == int(nnd[da])


def test_lis_hand_and_brute(ray_session, tmp_path):
    d = str(tmp_path)
    vals = [1.0, 3.0, 2.0, 4.0, 2.5, 0.5]
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 7)], vals)
    import __ray_entry__ as e

    got = e.queries()["lis_daily"](d).to_pandas()

    def brute(seq):
        n = len(seq)
        dp = [1] * n
        for i in range(n):
            for j in range(i):
                if seq[j] < seq[i]:
                    dp[i] = max(dp[i], dp[j] + 1)
        return max(dp)

    r = [int(round(v * 100)) for v in vals]
    assert int(got.loc[0, "lis_len"]) == brute(r) == 3
    assert int(got.loc[0, "lds_len"]) == brute([-v for v in r]) == 3


# ---------------------------------------------------------------------------
# batch 10: two-way ANOVA, weekday chi2 drift cells, LPT shard plan
# ---------------------------------------------------------------------------


def test_twoway_anova_decomposition(ray_session, tmp_path):
    d = str(tmp_path)
    flags = ["A", "A", "N", "N", "R", "R", "A", "N", "R", "A", "N",
             "R"]
    sts = ["F", "O"] * 6
    qty = [1.0, 5.0, 2.0, 7.0, 3.0, 9.0, 4.0, 6.0, 8.0, 2.0, 3.0,
           1.0]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "l_linestatus": pa.array(sts, pa.string()),
        "l_quantity": pa.array(qty, pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("twoway_anova_flag_status", d)
    q = np.array([round(v) for v in qty], dtype=float)
    tot_ss = float(np.sum(q * q) - q.sum() ** 2 / len(q))
    assert abs(float(got.loc[0, "ss_cells"])
               + float(got.loc[0, "ss_resid"]) - tot_ss) < 1e-9
    assert float(got.loc[0, "ss_cells"]) >= \
        float(got.loc[0, "ss_flag"]) - 1e-9
    assert float(got.loc[0, "ss_cells"]) >= \
        float(got.loc[0, "ss_status"]) - 1e-9


def test_dow_chi2_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    # 2023-01-02 Mon x3, 01-03 Tue x1; 2024-01-01 Mon x1, 01-02 Tue x3
    days = (["2023-01-02"] * 3 + ["2023-01-03"]
            + ["2024-01-01"] + ["2024-01-02"] * 3)
    _write_orders(d, days, [1.0] * 8)
    got = _match_oracle("dow_chi2_drift", d)
    assert len(got) == 4
    # every cell: e=2, (o*8-16)^2 = 64 -> 64e6 // 128 = 500000
    assert set(got["contrib_e6"]) == {500_000}
    assert sorted(got["o"]) == [1, 1, 3, 3]


def test_lpt_shard_plan_planted(ray_session, tmp_path):
    d = str(tmp_path)
    masses = [8, 7, 6, 5, 4, 3, 2, 1, 1]
    langs = [f"l{i}" for i in range(9)]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(9)), pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 9, pa.string()),
        "text": pa.array(["w " * m for m in masses], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    import __ray_entry__ as e

    got = e.queries()["lpt_shard_plan"](d).to_pandas()
    assert len(got) == 9
    loads = got.groupby("shard")["mass"].sum()
    total, mx = sum(masses), max(masses)
    assert loads.max() == 8            # LPT optimum here
    assert loads.min() == 2            # 1+1 packed together
    assert loads.max() <= total / 8 + mx   # LPT bound
    # deterministic: rerun identical
    again = e.queries()["lpt_shard_plan"](d).to_pandas()
    assert got.sort_values(["lang"]).reset_index(drop=True).equals(
        again.sort_values(["lang"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# batch 11: brand dispersion, German tank, capture-recapture, up/down runs
# ---------------------------------------------------------------------------


def test_brand_dispersion_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["X", "Y"], pa.string()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
        "l_returnflag": pa.array(["R", "R", "N", "A",
                                  "N", "N", "A", "A"], pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle2("brand_return_dispersion", d,
                         ["lineitem", "part"])
    g = got.set_index("brand")
    # N=8 R=2: X (4,2): (16-8)^2/(4*2*6); Y (4,0): (0-8)^2/(48)
    assert int(g.loc["X", "contrib_e6"]) == 64_000_000 // 48
    assert int(g.loc["Y", "contrib_e6"]) == 64_000_000 // 48


def test_german_tank_recompute(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    keys = list(range(1, 201))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("german_tank_audit", d)
    samp = [k for k in keys
            if hashlib.md5(str(k).encode()).hexdigest()[:2] < "10"]
    assert int(got.loc[0, "sample_k"]) == len(samp)
    assert int(got.loc[0, "sample_max"]) == max(samp)
    assert int(got.loc[0, "est_e2"]) == \
        max(samp) * (len(samp) + 1) * 100 // len(samp) - 100
    assert int(got.loc[0, "true_max"]) == 200


def test_capture_recapture_recompute(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    uids = list(range(1, 101))
    pq.write_table(pa.table({
        "event_id": pa.array(uids, pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
    }), os.path.join(d, "events.parquet"))
    import duckdb

    import __ray_entry__ as e

    got = e.queries()["capture_recapture_users"](d).to_pandas()
    a = [u for u in uids if hashlib.md5(
        f"{u}:A".encode()).hexdigest()[:2] < "40"]
    b = [u for u in uids if hashlib.md5(
        f"{u}:B".encode()).hexdigest()[:2] < "40"]
    m = len(set(a) & set(b))
    assert int(got.loc[0, "true_users"]) == 100
    assert int(got.loc[0, "cap_a"]) == len(a)
    assert int(got.loc[0, "recaptured"]) == m
    assert int(got.loc[0, "est_e2"]) == len(a) * len(b) * 100 // m
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM"
            f" '{os.path.join(d, 'events.parquet')}'")
    exp = con.sql(e.oracle_sql()["capture_recapture_users"]).df()
    assert _vhash(got) == _vhash(exp)


def test_runs_up_down_hand_values(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  [5.0, 3.0, 3.0, 8.0, 2.0])
    got = _match_oracle("runs_up_down_daily", d)
    # deltas -2, 0(dropped), +5, -6 -> runs: [-],[+],[-]
    assert int(got.loc[0, "n_moves"]) == 3
    assert int(got.loc[0, "n_up"]) == 1
    assert int(got.loc[0, "n_down"]) == 2
    assert int(got.loc[0, "n_runs"]) == 3


def test_runs_up_down_flat_empty(ray_session, tmp_path):
    import duckdb

    import __ray_entry__ as e

    d = str(tmp_path)
    _write_orders(d, ["2023-01-01", "2023-01-02"], [5.0, 5.0])
    got = e.queries()["runs_up_down_daily"](d).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM"
            f" '{os.path.join(d, 'orders.parquet')}'")
    exp = con.sql(e.oracle_sql()["runs_up_down_daily"]).df()
    assert len(got) == 0 and len(exp) == 0


# ---------------------------------------------------------------------------
# batch 12: orders-before-event, A/B balance, dow-adjusted outliers
# ---------------------------------------------------------------------------


def test_orders_before_event_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-02", "2023-01-06"]),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array(_us(["2023-01-01", "2023-01-02",
                            "2023-01-10", "2023-01-05",
                            "2023-01-05"]), pa.timestamp("us")),
        "event_type": pa.array(["purchase", "purchase", "purchase",
                                "view", "purchase"], pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("orders_before_event", d,
                         ["events", "orders"])
    h = {int(r.n_orders_before): int(r.n_events)
         for r in got.itertuples(index=False)}
    # user1: 0 before d1, 1 at d2 (inclusive), 2 at d10;
    # user3 purchase with no orders -> 0; user2 view excluded
    assert h == {0: 2, 1: 1, 2: 1}


def test_ab_balance_recompute(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    uids = [1, 2, 3, 4, 1, 2]
    ts = _us(["2023-01-01T10:00"] * 4 + ["2023-01-02T10:00"] * 2)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = (_match_oracle2("ab_balance_daily", d, ["events"])
           .sort_values("day").reset_index(drop=True))
    va = {u: hashlib.md5(str(u).encode()).hexdigest()[:8]
          < "80000000" for u in set(uids)}
    d1 = [va[u] for u in uids[:4]]
    d2 = [va[u] for u in uids[4:]]
    assert int(got.loc[0, "n_a"]) == sum(d1)
    assert int(got.loc[1, "n_a"]) == sum(d2)
    exp_cum = (2 * sum(d1) - 4) + (2 * sum(d2) - 2)
    assert int(got.loc[1, "cum_diff"]) == exp_cum


def test_dow_outliers_spike(ray_session, tmp_path):
    d = str(tmp_path)
    days = ["2023-01-%02d" % i for i in range(2, 16)]   # 14 days
    vals = [5.0] * 14
    vals[7] = 50.0            # same weekday as day 0 (Mondays)
    _write_orders(d, days, vals)
    got = (_match_oracle("dow_adjusted_outliers", d)
           .sort_values("day").reset_index(drop=True))
    # Monday group [500, 5000]: med_x4 = 11000; residuals +-9000;
    # all other residuals 0 -> MAD 0 -> flag the two Mondays
    assert len(got) == 2
    assert sorted(got["resid_x4"]) == [-9000, 9000]


# ---------------------------------------------------------------------------
# batch 13: supplier p-chart, Lindley backlog, brand unit-price drift
# ---------------------------------------------------------------------------


def test_supplier_pchart_hand(ray_session, tmp_path):
    d = str(tmp_path)
    n_per = 10
    sks, oks, ships = [], [], []
    dates = []
    ok = 0
    for sk, lates in ((1, 10), (2, 0), (3, 5)):
        for i in range(n_per):
            ok += 1
            sks.append(sk)
            oks.append(ok)
            dates.append("2023-01-01")
            ships.append("2023-04-01" if i < lates else "2023-01-05")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(oks, pa.int64()),
        "o_orderdate": pa.array(_us(dates), pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(oks, pa.int64()),
        "l_suppkey": pa.array(sks, pa.int64()),
        "l_shipdate": pa.array(_us(ships), pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("supplier_late_pchart", d).set_index("sk")
    # N=30 L=15: s1 (10 late): 150^2 > 9*10*15*15 -> ooc;
    # s2 (0): same; s3 (5): 0 -> in control
    assert int(got.loc[1, "ooc"]) == 1
    assert int(got.loc[2, "ooc"]) == 1
    assert int(got.loc[3, "ooc"]) == 0


def test_lindley_hand(ray_session, tmp_path):
    d = str(tmp_path)
    days = ["2023-01-01"] * 3 + ["2023-01-04"]
    _write_orders(d, days, [1.0] * 4)
    got = (_match_oracle("daily_backlog_lindley", d)
           .sort_values("day").reset_index(drop=True))
    # counts [3,0,0,1], cap 2 -> W = [1,0,0,0]
    assert list(got["n_orders"]) == [3, 0, 0, 1]
    assert list(got["backlog"]) == [1, 0, 0, 0]


def test_brand_unit_drift_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": pa.array(["B1"], pa.string()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1], pa.int64()),
        "l_shipdate": pa.array(_us(["1995-06-01", "1995-07-01",
                                    "1996-06-01"]),
                               pa.timestamp("us")),
        "l_quantity": pa.array([1.0, 1.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([4.0, 6.0, 30.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle2("brand_unit_price_drift", d,
                         ["lineitem", "part"]).set_index("y")
    # 1995: 1000c / 2 -> 5000000 e4; 1996: 3000c / 4 -> 7500000 e4
    assert int(got.loc[1995, "unit_e4"]) == 1000 * 10_000 // 2
    assert int(got.loc[1996, "unit_e4"]) == 3000 * 10_000 // 4


# ---------------------------------------------------------------------------
# batch 14: part intro cohorts, MASE ratio, atomic shipment share
# ---------------------------------------------------------------------------


def test_part_intro_cohorts_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # part 1 intro 1995 (ages 0,1); part 2 intro 1996 (age 0)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_shipdate": pa.array(_us(["1995-03-01", "1995-08-01",
                                    "1996-02-01", "1996-05-01"]),
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([1.0, 2.0, 4.0, 8.0],
                                    pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("part_intro_cohorts", d)
    cells = {(int(r.intro_year), int(r.age)): int(r.cents)
             for r in got.itertuples(index=False)}
    assert cells == {(1995, 0): 300, (1995, 1): 400, (1996, 0): 800}


def test_mase_hand(ray_session, tmp_path):
    d = str(tmp_path)
    vals = [1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0]
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 10)],
                  vals)
    got = _match_oracle("mase_seasonal_naive", d)
    # perfect weekly-7 alternation offset: lag7 diffs: |2-1|,|1-2|
    # = 200; lag1 diffs: 8*100 = 800
    assert int(got.loc[0, "s7"]) == 200
    assert int(got.loc[0, "s1"]) == 800
    assert int(got.loc[0, "mase_e6"]) == \
        200 * 8 * 1_000_000 // (800 * 2)


def test_atomic_shipment_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"],
                                    pa.string()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array(_us(["1995-03-01", "1995-03-28",
                                    "1995-03-30", "1995-04-02"]),
                               pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle2("atomic_shipment_share", d,
                         ["lineitem", "orders"])
    # order 1 same month, order 2 crosses March->April
    assert int(got.loc[0, "n_orders"]) == 2
    assert int(got.loc[0, "n_atomic"]) == 1
    assert int(got.loc[0, "share_e4"]) == 5000


# ---------------------------------------------------------------------------
# batch 15: delta-encoding audit, DiD, bigram independence
# ---------------------------------------------------------------------------


def test_delta_encoding_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: ts 0, 1s, 1s (zero gap), 9s; user 2: single event
    base = _us(["2023-01-01T00:00:00"])[0]
    ts = [base, base + 1_000_000, base + 1_000_000,
          base + 9_000_000, base]
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("delta_encoding_audit", d, ["events"])
    # gaps: 1e6 (20 bits), 0 (1 bit), 8e6 (23 bits); heads 2*64
    assert int(got.loc[0, "n_gaps"]) == 3
    assert int(got.loc[0, "delta_bits"]) == 20 + 1 + 23 + 128
    assert int(got.loc[0, "raw_bits"]) == 320


def test_did_counts_hand(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    uids = [1, 2, 1, 2, 1, 1]
    days = ["2023-01-01", "2023-01-02", "2023-01-09", "2023-01-10",
            "2023-01-10", "2023-01-01"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(_us(days), pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("did_counts", d, ["events"])
    va = {u: hashlib.md5(str(u).encode()).hexdigest()[:8]
          < "80000000" for u in (1, 2)}
    # mid = (d0+d1)//2 -> period 2 = later half
    a1 = sum(1 for u, dy in zip(uids, days)
             if va[u] and dy < "2023-01-06")
    a2 = sum(1 for u, dy in zip(uids, days)
             if va[u] and dy > "2023-01-05")
    assert int(got.loc[0, "a_before"]) == a1
    assert int(got.loc[0, "a_after"]) == a2
    assert int(got.loc[0, "did"]) == (
        int(got.loc[0, "a_after"]) - int(got.loc[0, "a_before"])
        - int(got.loc[0, "b_after"]) + int(got.loc[0, "b_before"]))


def test_bigram_independence_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: a->b->a->b ; user 2: a->a
    types = ["a", "b", "a", "b", "a", "a"]
    uids = [1, 1, 1, 1, 2, 2]
    ts = _us(["2023-01-01T00:00:0%d" % i for i in range(6)])
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("bigram_independence_cells", d, ["events"])
    cells = {(r.prev, r.cur): (int(r.o), int(r.contrib_e6))
             for r in got.itertuples(index=False)}
    # pairs: (a,b)x2, (b,a)x1, (a,a)x1 -> N=4, r_a=3, r_b=1,
    # c_a=2, c_b=2
    assert cells[("a", "b")][0] == 2
    # contrib(a,b) = (2*4 - 3*2)^2 e6 / (3*2*4) = 4e6/24
    assert cells[("a", "b")][1] == 4_000_000 // 24
    assert cells[("b", "a")][0] == 1
    # contrib(b,a) = (4 - 2)^2 e6 / (1*2*4) = 4e6/8
    assert cells[("b", "a")][1] == 4_000_000 // 8


# ---------------------------------------------------------------------------
# batch 16: holiday lift, split-half reliability, prefix granularity
# ---------------------------------------------------------------------------


def test_holiday_effect_hand(ray_session, tmp_path):
    d = str(tmp_path)
    days = (["2023-12-25"] * 6 + ["2023-12-24"] * 2
            + ["2023-12-27"] + ["2023-12-28"])
    _write_orders(d, days, [1.0] * 10)
    got = _match_oracle("holiday_effect", d)
    # holiday: 2 days / 8 orders; other: 2 days / 2 orders
    assert int(got.loc[0, "h_days"]) == 2
    assert int(got.loc[0, "h_orders"]) == 8
    assert int(got.loc[0, "lift_e4"]) == 8 * 2 * 10_000 // (2 * 2)


def test_split_half_reliability_match(ray_session, tmp_path):
    d = str(tmp_path)
    # users with varying even/odd-day splits
    uids = [1, 1, 1, 2, 2, 3, 3, 3, 3]
    days = ["2023-01-02", "2023-01-02", "2023-01-03",
            "2023-01-02", "2023-01-03",
            "2023-01-02", "2023-01-03", "2023-01-03", "2023-01-04"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(9)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(_us(days), pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("split_half_reliability", d, ["events"])
    assert int(got.loc[0, "n_users"]) == 3
    r = float(got.loc[0, "corr_half"])
    assert abs(float(got.loc[0, "spearman_brown"])
               - (2 * r) / (1 + r)) < 1e-15


def test_prefix_granularity_hand(ray_session, tmp_path):
    d = str(tmp_path)
    texts = [
        "aaaaaaaaaaaaaaaaaaaa" + "X" * 20 + " tail one",
        "aaaaaaaaaaaaaaaaaaaa" + "X" * 20 + " tail two",
        "aaaaaaaaaaaaaaaaaaaa" + "Y" * 20 + " other",
        "bbbbbbbbbbbbbbbbbbbb" + "Z" * 20,
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("prefix_granularity_audit", d,
                         ["documents"])
    # 20-prefix groups: {a*: 3, b*: 1} -> 3 pairs;
    # 40-prefix groups: {aX: 2, aY: 1, bZ: 1} -> 1 pair
    assert int(got.loc[0, "pairs_20"]) == 3
    assert int(got.loc[0, "pairs_40"]) == 1
    assert int(got.loc[0, "precision_e6"]) == 1_000_000 // 3


# ---------------------------------------------------------------------------
# batch 17: consistent-hash balance, session entry conversion
# ---------------------------------------------------------------------------


def test_consistent_hash_recompute(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    ids = list(range(1, 101))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * 100, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("consistent_hash_balance", d,
                         ["documents"])
    ring = sorted((hashlib.md5(f"{n}:{v}".encode()).hexdigest(), n)
                  for n in range(8) for v in range(16))
    pos = [h for h, _ in ring]
    import bisect
    loads = {}
    for i in ids:
        hx = hashlib.md5(str(i).encode()).hexdigest()
        j = bisect.bisect_left(pos, hx)
        node = ring[j % len(ring)][1]
        loads[node] = loads.get(node, 0) + 1
    g = got.set_index("node")["n_docs"].to_dict()
    assert {int(k): int(v) for k, v in g.items()} == loads
    assert int(got["n_docs"].sum()) == 100


def test_session_entry_conversion_hand(ray_session, tmp_path):
    d = str(tmp_path)
    base = _us(["2023-01-01T00:00:00"])[0]
    MIN = 60 * 1_000_000
    # user 1: session A view->purchase (converted), 40min gap,
    #   session B click only
    # user 2: session C purchase entry (converted, entry=purchase)
    ts = [base, base + 5 * MIN, base + 50 * MIN, base]
    uids = [1, 1, 1, 2]
    types = ["view", "purchase", "click", "purchase"]
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("session_entry_conversion", d, ["events"])
    g = {r.entry: (int(r.n_sessions), int(r.n_converted))
         for r in got.itertuples(index=False)}
    assert g == {"view": (1, 1), "click": (1, 0),
                 "purchase": (1, 1)}


# ---------------------------------------------------------------------------
# batch 18: learned-index audit, sMAPE naive
# ---------------------------------------------------------------------------


def test_learned_index_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # keys 10,20,30,50: linear approx rank = 1 + (k-10)*3//40
    # -> [1,1,2,4]; true [1,2,3,4]; errs [0,1,1,0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20, 30, 50], pa.int64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("learned_index_audit", d)
    assert int(got.loc[0, "n"]) == 4
    assert int(got.loc[0, "max_err"]) == 1
    assert int(got.loc[0, "mean_err_e2"]) == 2 * 100 // 4


def test_smape_hand(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["2023-01-01", "2023-01-02", "2023-01-03"],
                  [1.0, 3.0, 3.0])
    got = _match_oracle("smape_naive_daily", d)
    # sm1 = 200e6 // 400 = 500000; sm2 = 0
    assert int(got.loc[0, "max_smape_e6"]) == 500_000
    assert int(got.loc[0, "mean_smape_e6"]) == 500_000 // 2


# ---------------------------------------------------------------------------
# batch 19: Gwet AC1, term burstiness, fold stability
# ---------------------------------------------------------------------------


def test_gwets_ac1_perfect_agreement(ray_session, tmp_path):
    d = str(tmp_path)
    # one clean English + one clean German doc, both classified
    # correctly -> K=2, pa=1, AC1 = 1 exactly
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "de"], pa.string()),
        "text": pa.array(["the cat and the dog is here",
                          "der hund und die katze ist nicht da"],
                         pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("gwets_ac1_langid", d, ["documents"])
    assert int(got.loc[0, "agree"]) == 2
    assert int(got.loc[0, "k_labels"]) == 2
    assert int(got.loc[0, "ac1_e6"]) == 1_000_000


def test_term_burstiness_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # 'a': counts [3,0,0] bursty; 'b': [1,1,1] uniform
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a a a b", "b c", "b d"], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("term_burstiness_top", d, ["documents"])
    g = got.set_index("tok")
    # b: S=3 S2=3 N=3 -> vmr = (9-9)/(2*3) = 0
    assert int(g.loc["b", "vmr_e6"]) == 0
    # a: S=3 S2=9 -> (27-9)e6 // (2*3) = 3e6
    assert int(g.loc["a", "vmr_e6"]) == 3_000_000
    assert int(g.loc["a", "df"]) == 1


def test_fold_stability_recompute(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    keys = list(range(1, 51))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_totalprice": pa.array([float(k) for k in keys],
                                 pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("fold_stability_audit", d)
    ths = ["33333333", "66666666", "99999999", "cccccccc"]
    folds = {}
    for k in keys:
        h8 = hashlib.md5(str(k).encode()).hexdigest()[:8]
        f = sum(h8 >= t for t in ths)
        n, sm = folds.get(f, (0, 0))
        folds[f] = (n + 1, sm + k * 100)
    g = got.set_index("fold")
    for f, (n, sm) in folds.items():
        assert int(g.loc[f, "n"]) == n
        assert int(g.loc[f, "s"]) == sm


# ---------------------------------------------------------------------------
# batch 20: Markov order-2 audit, Chebyshev audit, result cache
# ---------------------------------------------------------------------------


def test_markov_order2_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: a b a b a  -> trigrams aba x2, bab x1;
    # bigrams ab x2, ba x2
    types = ["a", "b", "a", "b", "a"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(5)), pa.int64()),
        "user_id": pa.array([1] * 5, pa.int64()),
        "ts": pa.array(_us(["2023-01-01T00:00:0%d" % i
                            for i in range(5)]),
                       pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("markov_order2_audit", d, ["events"])
    cells = {(r.a, r.b, r.c): (int(r.o), int(r.contrib_e6))
             for r in got.itertuples(index=False)}
    # (a,b,a): o=2, n_ab=2, n_ba=2, nb(b->)=2:
    # (2*2 - 2*2)^2 = 0
    assert cells[("a", "b", "a")] == (2, 0)
    # (b,a,b): o=1, n_ba=2, n_ab=2, na(a->)=2:
    # (1*2 - 4)^2 e6 // (2*2*2) = 4e6 // 8
    assert cells[("b", "a", "b")] == (1, 500_000)


def test_chebyshev_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # k$ values [1,1,1,1,10]: mean 2.8, only the 10 is beyond 2s
    vals = [1000.0, 1000.0, 1000.0, 1000.0, 10000.0]
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 6)],
                  vals)
    got = _match_oracle("chebyshev_audit_daily", d).set_index("k")
    x = np.array([1, 1, 1, 1, 10])
    n, s1, s2 = 5, int(x.sum()), int((x * x).sum())
    for k in (2, 3, 4):
        exp = int(np.sum((n * x - s1) ** 2
                         > k * k * (n * s2 - s1 * s1)))
        assert int(got.loc[k, "n_beyond"]) == exp
        assert int(got.loc[k, "bound_n"]) == 5 // (k * k)


def test_result_cache_hit_and_invalidate(ray_session, tmp_path):
    import time

    from reddacted_ray.state.result_cache import cached_query

    d = str(tmp_path / "data")
    os.makedirs(d)
    cache = str(tmp_path / "cache")
    _write_orders(d, ["2023-01-01", "2023-01-02"], [1.0, 2.0])
    calls = {"n": 0}

    import __ray_entry__ as e

    def fn(sf):
        calls["n"] += 1
        return e.queries()["runs_up_down_daily"](sf)

    t1, hit1 = cached_query("runs", fn, d, cache)
    t2, hit2 = cached_query("runs", fn, d, cache)
    assert (hit1, hit2) == (False, True)
    assert calls["n"] == 1
    assert t1.equals(t2)
    # mutate input -> invalidation + stale-entry cleanup
    time.sleep(0.01)
    _write_orders(d, ["2023-01-01", "2023-01-02", "2023-01-03"],
                  [1.0, 2.0, 5.0])
    t3, hit3 = cached_query("runs", fn, d, cache)
    assert not hit3 and calls["n"] == 2
    assert len([f for f in os.listdir(cache)
                if f.startswith("runs-")]) == 1


# ---------------------------------------------------------------------------
# batch 21: cents last-digit cells, ABC-XYZ matrix
# ---------------------------------------------------------------------------


def test_cents_lastdigit_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # cents endings: 01 x3, 50 x1 -> N=4
    _write_orders(d, ["2023-01-0%d" % i for i in range(1, 5)],
                  [1.01, 2.01, 3.01, 9.50])
    got = _match_oracle("cents_lastdigit_cells", d).set_index("d2")
    assert int(got.loc[1, "o"]) == 3
    # (300-4)^2 e6 // 400
    assert int(got.loc[1, "contrib_e6"]) == 296 ** 2 * 1_000_000 // 400
    assert int(got.loc[50, "contrib_e6"]) == 96 ** 2 * 1_000_000 // 400


def test_abc_xyz_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # revenues 70/10/10/10: inclusive-cum bands -> A, B, B, C;
    # part 1 steady (X), parts 2-4 single-month spikes (Z)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 3, 4], pa.int64()),
        "l_shipdate": pa.array(_us(["1995-01-05", "1995-02-05",
                                    "1995-03-05", "1995-02-20",
                                    "1995-02-21", "1995-02-22"]),
                               pa.timestamp("us")),
        "l_quantity": pa.array([5.0, 5.0, 5.0, 9.0, 4.0, 2.0],
                               pa.float64()),
        "l_extendedprice": pa.array([20.0, 25.0, 25.0, 10.0, 10.0,
                                     10.0], pa.float64()),
        "l_discount": pa.array([0.0] * 6, pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("abc_xyz_matrix", d)
    cells = {(r.abc_class, r.xyz_class): int(r.n_parts)
             for r in got.itertuples(index=False)}
    assert sum(cells.values()) == 4
    # part1: n=3, s=15, s2=75: var_n2 = 0 -> X; 10*70 <= 7*100 -> A
    assert cells[("A", "X")] == 1
    assert cells[("B", "Z")] == 2
    assert cells[("C", "Z")] == 1


# ---------------------------------------------------------------------------
# batch 22: Talagrand histogram, discount consistency, Ruzicka
# ---------------------------------------------------------------------------


def test_talagrand_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # 9 increasing days: days 8,9 rank 7 (above all predecessors)
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 10)],
                  [float(i) for i in range(1, 10)])
    got = (_match_oracle("talagrand_rank_hist", d)
           .set_index("rank"))
    assert int(got.loc[7, "n_days"]) == 2
    assert int(got["n_days"].sum()) == 2


def test_discount_consistency_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([10, 10, 11, 10, 10], pa.int64()),
        "l_discount": pa.array([0.05, 0.10, 0.05, 0.05, 0.05],
                               pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("discount_consistency_audit", d)
    # pairs: (1,10) two discounts VIOLATES, (1,11), (2,10) ok
    assert int(got.loc[0, "n_pairs"]) == 3
    assert int(got.loc[0, "n_violating"]) == 1
    assert int(got.loc[0, "rate_e6"]) == 1_000_000 // 3


def test_ruzicka_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["src0", "src1", "src9"], pa.string()),
        "text": pa.array(["a a b", "a b b c", "z z"], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("source_ruzicka", d, ["documents"])
    # src0: a2 b1; src1: a1 b2 c1 -> min 1+1+0=2, max 2+2+1=5
    assert int(got.loc[0, "sum_min"]) == 2
    assert int(got.loc[0, "sum_max"]) == 5
    assert int(got.loc[0, "ruzicka_e6"]) == 400_000


# ---------------------------------------------------------------------------
# batch 23: DiD placebo rank, Shapley 2ch, seasonal rank stability
# ---------------------------------------------------------------------------


def test_did_placebo_recompute(ray_session, tmp_path):
    import hashlib

    d = str(tmp_path)
    uids = [1, 2, 3, 4] * 3
    days = (["2023-01-01"] * 4 + ["2023-01-05"] * 4
            + ["2023-01-09"] * 4)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(12)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(_us(days), pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("did_placebo_rank", d, ["events"])
    # independently recompute the actual DiD
    mid = (0 + 8) // 2   # day offsets 0,4,8 -> mid = day0+4
    base = _us(["2023-01-01"])[0] // (86_400 * 1_000_000)
    did = 0
    for u, dy in zip(uids, days):
        late = (_us([dy])[0] // (86_400 * 1_000_000)) > base + mid
        isa = hashlib.md5(str(u).encode()).hexdigest()[:8] \
            < "80000000"
        sign = 1 if late else -1
        did += sign if isa else -sign
    assert int(got.loc[0, "did_actual"]) == did
    assert 0 <= int(got.loc[0, "n_more_extreme"]) <= 20


def test_shapley_hand(ray_session, tmp_path):
    d = str(tmp_path)
    base = _us(["2023-01-01T00:00:00"])[0]
    MIN = 60 * 1_000_000
    # s1: view+click+purchase -> 1/2 each (credit2 1,1)
    # s2 (40min later): view+purchase -> view full (credit2 2)
    # s3 user2: click only, no purchase -> nothing
    ts = [base, base + MIN, base + 2 * MIN,
          base + 45 * MIN, base + 46 * MIN, base]
    uids = [1, 1, 1, 1, 1, 2]
    types = ["view", "click", "purchase", "view", "purchase",
             "click"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("shapley_attribution_2ch", d, ["events"])
    assert int(got.loc[0, "n_conv"]) == 2
    assert int(got.loc[0, "credit2_view"]) == 3
    assert int(got.loc[0, "credit2_click"]) == 1


def test_seasonal_rank_stability_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # 1995: Jan 1, Feb 5; 1996: Jan 10, Feb 2 -> ordering flips
    _write_orders(d, ["1995-01-10", "1995-02-10",
                      "1996-01-10", "1996-02-10"],
                  [1.0, 5.0, 10.0, 2.0])
    got = _match_oracle("seasonal_rank_stability", d)
    assert len(got) == 1
    assert int(got.loc[0, "n_months"]) == 2
    assert int(got.loc[0, "conc"]) == 0
    assert int(got.loc[0, "disc"]) == 1


# ---------------------------------------------------------------------------
# batch 24: nation-segment chi2 cells, type clustering, read_hive
# ---------------------------------------------------------------------------


def test_nation_segment_chi2_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([1, 1, 2, 2], pa.int64()),
        "c_mktsegment": pa.array(["S1", "S2", "S1", "S1"],
                                 pa.string()),
    }), os.path.join(d, "customer.parquet"))
    got = _match_oracle2("nation_segment_chi2_cells", d,
                         ["customer"])
    cells = {(int(r.nk), r.seg): int(r.contrib_e6)
             for r in got.itertuples(index=False)}
    # N=4; cell (1,S1): o=1, r=2, c=3: (4-6)^2 e6 // 24
    assert cells[(1, "S1")] == 4_000_000 // 24
    # cell (2,S1): o=2: (8-6)^2 e6 // 24
    assert cells[(2, "S1")] == 4_000_000 // 24


def test_type_clustering_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # user1 {a,b,c} -> triangle; user2 {c,d} -> edge c-d
    uids = [1, 1, 1, 2, 2]
    types = ["a", "b", "c", "c", "d"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(5)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = (_match_oracle2("type_local_clustering", d, ["events"])
           .set_index("et"))
    assert int(got.loc["a", "deg"]) == 2
    assert int(got.loc["a", "cc_e6"]) == 1_000_000
    assert int(got.loc["c", "deg"]) == 3
    # c's neighborhood {a,b,d}: one closed pair (a,b) of 3
    assert int(got.loc["c", "n_triangles"]) == 1
    assert int(got.loc["c", "cc_e6"]) == 2 * 1_000_000 // 6
    assert int(got.loc["d", "deg"]) == 1
    assert int(got.loc["d", "cc_e6"]) == 0


def test_read_hive_roundtrip(ray_session, tmp_path):
    from reddacted_ray.sources.tables import read_hive

    root = str(tmp_path)
    for y, src, vals in ((1995, "web", [1, 2]), (1996, "app", [3])):
        d = os.path.join(root, f"year={y}", f"source={src}")
        os.makedirs(d)
        pq.write_table(pa.table({"v": pa.array(vals, pa.int64())}),
                       os.path.join(d, "part-0.parquet"))
    ds = read_hive(root)
    df = ds.to_pandas().sort_values("v").reset_index(drop=True)
    assert list(df["v"]) == [1, 2, 3]
    assert list(df["year"]) == [1995, 1995, 1996]   # int-typed
    assert list(df["source"]) == ["web", "web", "app"]
    # column pruning still attaches partition keys
    df2 = read_hive(root, columns=["v"]).to_pandas()
    assert sorted(df2.columns) == ["source", "v", "year"]


# ---------------------------------------------------------------------------
# batch 25: LTV curve, prefix pair curve, acceleration extremes
# ---------------------------------------------------------------------------


def test_ltv_by_order_index_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-02-01",
                                     "2023-01-15", "2023-03-01"]),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 30.0, 20.0, 50.0],
                                 pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = (_match_oracle("ltv_by_order_index", d)
           .set_index("order_idx"))
    # idx1: (1000+2000)/2; idx2: (3000+5000)/2
    assert int(got.loc[1, "mean_cents"]) == 1500
    assert int(got.loc[2, "mean_cents"]) == 4000
    assert int(got.loc[1, "n_customers"]) == 2


def test_prefix_pair_curve_monotone(ray_session, tmp_path):
    d = str(tmp_path)
    texts = ["aaaaaaaaaaAAAAAAAAAAxxxx one",
             "aaaaaaaaaaAAAAAAAAAAxxxx two",
             "aaaaaaaaaaBBBBBBBBBB other",
             "zzzzzzzzzz tail"]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = (_match_oracle2("prefix_pair_curve", d, ["documents"])
           .set_index("prefix_len"))
    # len10: {a*:3} -> 3 pairs; len20: {aA:2} -> 1; len30/40: 1
    assert int(got.loc[10, "n_pairs"]) == 3
    assert int(got.loc[20, "n_pairs"]) == 1
    # coarser keys can only merge more: curve non-increasing
    vals = [int(got.loc[k, "n_pairs"]) for k in (10, 20, 30, 40)]
    assert vals == sorted(vals, reverse=True)


def test_revenue_acceleration_hand(ray_session, tmp_path):
    d = str(tmp_path)
    _write_orders(d, ["2023-01-0%d" % i for i in range(1, 6)],
                  [1.0, 1.0, 10.0, 1.0, 1.0])
    got = _match_oracle("revenue_acceleration_top", d)
    g = got.sort_values("accel").reset_index(drop=True)
    # accel at day3 = +900, day4 = -1800, day5 = +900
    assert list(g["accel"]) == [-1800, 900, 900]


# ---------------------------------------------------------------------------
# batch 26: return-experience effect, supplier co-late pairs
# ---------------------------------------------------------------------------


def test_return_experience_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # cust1: o1(R, 100) -> o2(50) SHRANK after return;
    #        o2(no R) -> o3(80) grew after ok
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-02-01",
                                     "2023-03-01"]),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 50.0, 80.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N", "A"], pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("return_experience_effect", d)
    assert int(got.loc[0, "after_r_shrank"]) == 1
    assert int(got.loc[0, "after_r_grew"]) == 0
    assert int(got.loc[0, "after_ok_shrank"]) == 0
    assert int(got.loc[0, "after_ok_grew"]) == 1
    assert int(got.loc[0, "rate_diff_e6"]) == 1_000_000


def test_supplier_colate_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # orders 1,2 both have suppliers 5 and 6 late -> pair (5,6) x2;
    # order 2 also supplier 7 late -> (5,7),(6,7) x1
    oks = [1, 1, 2, 2, 2, 3]
    sks = [5, 6, 5, 6, 7, 5]
    ships = ["2023-04-01"] * 5 + ["2023-01-03"]   # last on time
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 3),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(oks, pa.int64()),
        "l_suppkey": pa.array(sks, pa.int64()),
        "l_shipdate": pa.array(_us(ships), pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("supplier_colate_top", d)
    rows = [tuple(map(int, r)) for r in
            got[["sk_a", "sk_b", "n"]].itertuples(index=False)]
    assert rows[0] == (5, 6, 2)
    assert set(rows[1:]) == {(5, 7, 1), (6, 7, 1)}


# ---------------------------------------------------------------------------
# batch 27: SAX words, catalog audit
# ---------------------------------------------------------------------------


def test_sax_words_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # 16 days -> 2 words. Days: low block then high block repeated
    vals = [1.0, 1.0, 2.0, 2.0, 8.0, 8.0, 9.0, 9.0] * 2
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 17)],
                  vals)
    got = _match_oracle("sax_words_daily", d)
    # segments x8: [200,400,1600,1800] x2; quartiles over 8 sums;
    # both windows identical -> one word with count 2
    assert len(got) == 1
    assert int(got.loc[0, "n"]) == 2
    w = got.loc[0, "word"]
    assert len(w) == 4 and w[0] < w[2]   # low letters then high


def test_catalog_audit_match(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["catalog_audit"](sf).to_pandas()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem"
              " events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{sf}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()["catalog_audit"]).df()
    assert _vhash(got) == _vhash(exp)
    assert len(got) == 10


# ---------------------------------------------------------------------------
# batch 28: Poincare SD ratio, quantizer RD curve
# ---------------------------------------------------------------------------


def test_poincare_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # k$ x = [1, 3, 1, 3]: u = [2,-2,2], v = [4,4,4]
    _write_orders(d, ["2023-01-0%d" % i for i in range(1, 5)],
                  [1000.0, 3000.0, 1000.0, 3000.0])
    got = _match_oracle("poincare_sd_daily", d)
    # VU = 3*12 - 2^2 = 32; VV = 3*48 - 144 = 0
    assert int(got.loc[0, "vu_n2"]) == 32
    assert int(got.loc[0, "vv_n2"]) == 0
    assert int(got.loc[0, "ratio_e6"]) == 0


def test_quantizer_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # x = [0..3] k$: range 3; b=2 (k=4): cells exact thirds
    _write_orders(d, ["2023-01-0%d" % i for i in range(1, 5)],
                  [0.0, 1000.0, 2000.0, 3000.0])
    got = (_match_oracle("quantizer_rd_curve", d)
           .set_index("bits"))
    x = np.array([0, 1, 2, 3])
    for b in (2, 3, 4, 5):
        k = 1 << b
        cell = np.minimum((x - 0) * k // 3, k - 1)
        e = 2 * k * x - (2 * cell + 1) * 3
        assert int(got.loc[b, "sse_scaled"]) == int((e * e).sum())


# ---------------------------------------------------------------------------
# batch 29: reorder hazard, price stickiness
# ---------------------------------------------------------------------------


def test_reorder_hazard_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # cust1 gaps: 3d (w0), 10d (w1); cust2 single order (no gap)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-01-04",
                                     "2023-01-14", "2023-06-01"]),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    got = (_match_oracle("reorder_hazard_weekly", d)
           .set_index("week"))
    assert int(got.loc[0, "n_reordered"]) == 1
    assert int(got.loc[0, "n_at_risk"]) == 2
    assert int(got.loc[0, "hazard_e6"]) == 500_000
    assert int(got.loc[1, "n_at_risk"]) == 1
    assert int(got.loc[1, "hazard_e6"]) == 1_000_000
    assert int(got.loc[2, "n_at_risk"]) == 0


def test_price_stickiness_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # part 1: unit prices 100, 100, 200 -> pairs (same, diff)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1], pa.int64()),
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-01", "2023-02-01",
                                    "2023-03-01"]),
                               pa.timestamp("us")),
        "l_quantity": pa.array([2.0, 4.0, 2.0], pa.float64()),
        "l_extendedprice": pa.array([2.0, 4.0, 4.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("price_stickiness", d)
    assert int(got.loc[0, "n_pairs"]) == 2
    assert int(got.loc[0, "n_same"]) == 1
    assert int(got.loc[0, "sticky_e6"]) == 500_000


# ---------------------------------------------------------------------------
# batch 30: seasonal diff variance ratio, acctbal gap splits
# ---------------------------------------------------------------------------


def test_seasonal_diff_ratio_perfect_weekly(ray_session, tmp_path):
    d = str(tmp_path)
    # exact 7-day periodic series: lag-7 diffs all zero -> ratio 0
    pat = [1000.0, 2000.0, 3000.0, 1000.0, 5000.0, 2000.0, 4000.0]
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 15)],
                  pat + pat)
    got = _match_oracle("seasonal_diff_variance_ratio", d)
    assert int(got.loc[0, "vd_n2"]) == 0
    assert int(got.loc[0, "ratio_e6"]) == 0
    assert int(got.loc[0, "vy_n2"]) > 0


def test_acctbal_gap_splits_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_acctbal": pa.array([1.00, 1.10, 5.00, 5.05, 20.00],
                              pa.float64()),
    }), os.path.join(d, "customer.parquet"))
    got = _match_oracle2("acctbal_gap_splits", d, ["customer"])
    rows = [tuple(map(int, r)) for r in
            got[["lo", "hi", "width"]].itertuples(index=False)]
    assert rows[0] == (505, 2000, 1495)
    assert rows[1] == (110, 500, 390)
    assert rows[2] == (100, 110, 10)


# ---------------------------------------------------------------------------
# batch 31: popularity hit-rate, part rebuy rate
# ---------------------------------------------------------------------------


def test_popularity_hitrate_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # part 7 dominates popularity; cust1 last order has it (hit),
    # cust2 last order doesn't (miss)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-02-01",
                                     "2023-01-01", "2023-02-01"]),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    # make >10 distinct parts so top-10 excludes the rare one (99)
    oks = [1] * 3 + [2, 2] + [3] + [4]
    pks = [7, 7, 7, 7, 5, 7, 99]
    extra_ok = [1] * 12
    extra_pk = list(range(20, 32))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(oks + extra_ok, pa.int64()),
        "l_partkey": pa.array(pks + extra_pk, pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("popularity_hitrate", d)
    assert int(got.loc[0, "n_customers"]) == 2
    # cust1 last order (ok=2) has part 7 (top) -> hit;
    # cust2 last order (ok=4) only part 99 (13 distinct parts,
    # 99 is count-1 tie but pk ordering keeps it out of top10)
    assert int(got.loc[0, "n_hit"]) == 1
    assert int(got.loc[0, "rate_e6"]) == 500_000


def test_part_rebuy_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2], pa.int64()),
        "l_partkey": pa.array([5, 5, 6], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("part_rebuy_rate", d)
    # (1,5) bought twice -> 1 rebuy of 3 lines
    assert int(got.loc[0, "n_lines"]) == 3
    assert int(got.loc[0, "n_rebuys"]) == 1
    assert int(got.loc[0, "rate_e6"]) == 1_000_000 // 3


# ---------------------------------------------------------------------------
# batch 32: extremal index, VaR backtest
# ---------------------------------------------------------------------------


def test_extremal_index_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # 40 days at 1.0 with spikes 60,70 adjacent and 50 isolated:
    # q95_x20 = 19*5000 + 6000 -> strict threshold 5050 cents, so
    # only the 60 and 70 days exceed — ONE adjacent cluster
    vals = [1.0] * 40
    vals[10] = 60.0
    vals[11] = 70.0
    vals[30] = 50.0
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 32)]
                  + ["2023-02-%02d" % i for i in range(1, 10)],
                  vals)
    got = _match_oracle("extremal_index_daily", d)
    assert int(got.loc[0, "n_exceed"]) == 2
    assert int(got.loc[0, "n_clusters"]) == 1
    assert int(got.loc[0, "theta_e6"]) == 500_000


def test_var_backtest_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # train: 20 days at 100 with two dips to 10; test: 20 days with
    # three dips BELOW the train q05
    vals = [100.0] * 40
    vals[3] = vals[7] = 10.0
    vals[25] = vals[30] = vals[35] = 1.0
    _write_orders(d, ["2023-01-%02d" % i for i in range(1, 32)]
                  + ["2023-02-%02d" % i for i in range(1, 10)],
                  vals)
    got = _match_oracle("var_backtest_daily", d)
    assert int(got.loc[0, "n_train"]) == 20
    assert int(got.loc[0, "n_test"]) == 20
    # train q05: k,rem = divmod(19,20) = (0,19):
    # x20 = 1*1000 + 19*1000 = 20000 -> threshold 10.0
    assert int(got.loc[0, "var_x20"]) == 20_000
    assert int(got.loc[0, "n_violations"]) == 3
    assert int(got.loc[0, "expected_n"]) == 1


def test_payday_effect_hand(ray_session, tmp_path):
    d = str(tmp_path)
    days = (["2023-01-02"] * 6 + ["2023-01-05"] * 2
            + ["2023-01-20"] + ["2023-01-25"])
    _write_orders(d, days, [1.0] * 10)
    got = _match_oracle("payday_effect", d)
    # payday band: 2 days / 8 orders; other: 2 days / 2 orders
    assert int(got.loc[0, "p_days"]) == 2
    assert int(got.loc[0, "p_orders"]) == 8
    assert int(got.loc[0, "lift_e4"]) == 8 * 2 * 10_000 // (2 * 2)


# ---------------------------------------------------------------------------
# batch 34: name-key consistency, week-hour peak
# ---------------------------------------------------------------------------


def test_name_key_consistency_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array([0, 1, 2, 3], pa.int64()),
        "c_name": pa.array(["Customer#000000000",
                            "Customer#000000009",   # wrong key
                            "Cust#2",               # bad format
                            "Customer#000000003"], pa.string()),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([5], pa.int64()),
        "s_name": pa.array(["Supplier#000000005"], pa.string()),
    }), os.path.join(d, "supplier.parquet"))
    got = _match_oracle2("name_key_consistency", d,
                         ["customer", "supplier"]).set_index("tbl")
    assert int(got.loc["customer", "n"]) == 4
    assert int(got.loc["customer", "fmt_ok"]) == 3
    assert int(got.loc["customer", "key_match"]) == 2
    assert int(got.loc["supplier", "key_match"]) == 1


def test_week_hour_peak_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # Monday 2023-01-02 10:00 x3, Tuesday 11:00 x1
    ts = _us(["2023-01-02T10:05", "2023-01-02T10:20",
              "2023-01-02T10:50", "2023-01-03T11:00"])
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("week_hour_peak", d, ["events"])
    top = got.iloc[0]
    assert (int(top["dow"]), int(top["hour"]), int(top["n"])) \
        == (1, 10, 3)


# ---------------------------------------------------------------------------
# batch 35: QTE deciles, dedup survivor bias
# ---------------------------------------------------------------------------


def test_qte_hand(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A"] * 11 + ["R"] * 11,
                                 pa.string()),
        "l_quantity": pa.array(
            [float(i) for i in range(1, 12)]
            + [float(10 * i) for i in range(1, 12)], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = (_match_oracle("qte_flags", d).set_index("decile"))
    # n=11 each: positions j exactly integer -> qa = j+1, qr = 10j+10
    for j in range(1, 10):
        assert int(got.loc[j, "qa_x10"]) == 10 * (j + 1)
        assert int(got.loc[j, "qr_x10"]) == 100 * (j + 1)
        assert int(got.loc[j, "diff_x10"]) == -90 * (j + 1)


def test_dedup_survivor_bias_hand(ray_session, tmp_path):
    d = str(tmp_path)
    base = "z" * 40
    texts = [base + " a", base + " b", base + " c", "unique " * 8]
    pq.write_table(pa.table({
        "doc_id": pa.array([4, 2, 9, 1], pa.int64()),
        "source": pa.array(["s1", "s2", "s1", "s3"], pa.string()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = (_match_oracle2("dedup_survivor_bias", d, ["documents"])
           .set_index("source"))
    # cluster of 3 (ids 4,2,9): survivor id 2 (s2)
    assert int(got.loc["s1", "members"]) == 2
    assert int(got.loc["s1", "survivors"]) == 0
    assert int(got.loc["s2", "survivors"]) == 1
    assert "s3" not in got.index      # singleton excluded


# ---------------------------------------------------------------------------
# batch 36: weekly TV peak, type MST
# ---------------------------------------------------------------------------


def test_weekly_tv_peak_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # week A: all 'a' x4; week B: 2a 2b -> global 6a 2b (N=8)
    ts = _us(["2023-01-02T10:00"] * 4 + ["2023-01-09T10:00"] * 4)
    types = ["a"] * 4 + ["a", "a", "b", "b"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(8)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("weekly_type_tv_peak", d, ["events"])
    # week A: |4*8-4*6| + |0*8-4*2| = 8+8 = 16, den 64 -> 0.25
    # week B: |2*8-4*6| + |2*8-4*2| = 8+8 = 16, den 64 -> tie;
    # earliest week wins
    assert int(got.loc[0, "tv_num"]) == 16
    assert int(got.loc[0, "tv_e6"]) == 250_000


def test_type_mst_properties(ray_session, tmp_path):
    d = str(tmp_path)
    # users: {a,b}, {b,c}, {a,b} again -> weights ab=2, bc=1
    uids = [1, 1, 2, 2, 3, 3]
    types = ["a", "b", "b", "c", "a", "b"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    import __ray_entry__ as e

    got = e.queries()["type_mst_edges"](d).to_pandas()
    rows = {(r.a, r.b): int(r.w) for r in got.itertuples(index=False)}
    # spanning tree over {a,b,c}: 2 edges, must include ab (w=2)
    assert len(got) == 2
    assert rows[("a", "b")] == 2
    assert rows[("b", "c")] == 1


def test_blomqvist_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # (q, dd): (1,1),(2,2),(3,3),(4,4),(5,1) -> med_q=3, med_d=2:
    # quadrants (ties on either median drop): (1,1) conc, (2,2) q-tie
    # on nothing... q=2<3 dd=2 ON median -> drop; (3,3) q on median
    # -> drop; (4,4) conc; (5,1) disc
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 5.0],
                               pa.float64()),
        "l_discount": pa.array([0.01, 0.02, 0.03, 0.04, 0.01],
                               pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("blomqvist_beta_qty_disc", d)
    assert int(got.loc[0, "n_conc"]) == 2
    assert int(got.loc[0, "n_disc"]) == 1
    assert int(got.loc[0, "beta_e6"]) == 1_000_000 // 3


# ---------------------------------------------------------------------------
# batch 38: same-day reorders, hourly rhythm ACF-24
# ---------------------------------------------------------------------------


def test_same_day_reorders_hand(ray_session, tmp_path):
    d = str(tmp_path)
    days = ["2023-01-01", "2023-01-01", "2023-01-01",
            "2023-01-02", "2023-02-01", "2023-02-01"]
    cks = [1, 1, 1, 1, 2, 3]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(6)), pa.int64()),
        "o_custkey": pa.array(cks, pa.int64()),
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("same_day_reorders", d)
    # (1,d1)x3, (1,d2), (2,f1), (3,f1) -> 4 pairs, 1 multi, burst 3
    assert int(got.loc[0, "n_cust_days"]) == 4
    assert int(got.loc[0, "n_multi_days"]) == 1
    assert int(got.loc[0, "n_multi_customers"]) == 1
    assert int(got.loc[0, "max_burst"]) == 3


def test_hourly_rhythm_perfect_cycle(ray_session, tmp_path):
    d = str(tmp_path)
    # 49 hours: events only at hours 0, 24, 48 -> perfect 24h cycle
    base = _us(["2023-01-01T00:30"])[0]
    H = 3_600 * 1_000_000
    ts = [base, base + 24 * H, base + 48 * H]
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("hourly_rhythm_acf24", d, ["events"])
    # x and lag-24 series identical -> num == den -> 1e6 exactly
    assert int(got.loc[0, "acf24_e6"]) == 1_000_000


def test_pietra_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # user counts [3, 1]: n=2 S=4; |6-4|+|2-4| = 4 -> 4/(2*2*4)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("pietra_user_activity", d, ["events"])
    assert int(got.loc[0, "pietra_e6"]) == 4 * 1_000_000 // 16


def test_best_leadlag_planted(ray_session, tmp_path):
    d = str(tmp_path)
    # 14 days; view spikes day 3 & 8; purchase spikes day 5 & 10
    # -> purchases trail views by exactly 2 days
    rows_ts, rows_ty = [], []
    base = _us(["2023-01-01T12:00"])[0]
    DAY = 86_400 * 1_000_000
    for day in range(14):
        rows_ts.append(base + day * DAY)
        rows_ty.append("view")           # 1/day baseline spans grid
    for day in (3, 8):
        for _ in range(5):
            rows_ts.append(base + day * DAY)
            rows_ty.append("view")
    for day in (5, 10):
        for _ in range(5):
            rows_ts.append(base + day * DAY)
            rows_ty.append("purchase")
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows_ts))), pa.int64()),
        "ts": pa.array(rows_ts, pa.timestamp("us")),
        "event_type": pa.array(rows_ty, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = _match_oracle2("best_leadlag_view_purchase", d, ["events"])
    assert int(got.loc[0, "best_lag"]) == 2
    assert int(got.loc[0, "xc_e6"]) > 900_000


# ---------------------------------------------------------------------------
# batch 41: doc gate funnel, first purchase position
# ---------------------------------------------------------------------------


def test_doc_gate_funnel_hand(ray_session, tmp_path):
    d = str(tmp_path)
    long_rich = " ".join(f"w{i}" for i in range(30))      # passes all
    long_dull = " ".join(["dup"] * 40)                    # fails TTR
    short = "tiny text"                                    # fails len
    long_few = "x" * 120                                   # 1 token
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([long_rich, long_dull, short, long_few],
                         pa.string()),
    }), os.path.join(d, "documents.parquet"))
    got = _match_oracle2("doc_gate_funnel", d, ["documents"])
    assert int(got.loc[0, "n_docs"]) == 4
    assert int(got.loc[0, "pass_len"]) == 3
    assert int(got.loc[0, "pass_tok"]) == 2
    assert int(got.loc[0, "pass_ttr"]) == 1
    assert int(got.loc[0, "rate_e4"]) == 2500


def test_first_purchase_position_hand(ray_session, tmp_path):
    d = str(tmp_path)
    base = _us(["2023-01-01T00:00:00"])[0]
    MIN = 60 * 1_000_000
    # session: view, click, purchase, purchase -> first at pos 3
    # session2 (user 2): purchase at pos 1
    ts = [base, base + MIN, base + 2 * MIN, base + 3 * MIN, base]
    uids = [1, 1, 1, 1, 2]
    types = ["view", "click", "purchase", "purchase", "purchase"]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(5)), pa.int64()),
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    }), os.path.join(d, "events.parquet"))
    got = (_match_oracle2("first_purchase_position_hist", d,
                          ["events"]).set_index("pos"))
    assert int(got.loc[3, "n"]) == 1
    assert int(got.loc[1, "n"]) == 1


# ---------------------------------------------------------------------------
# batch 42: part gap medians, pair confidence asymmetry
# ---------------------------------------------------------------------------


def test_part_gap_median_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # part 1 ships on days 1, 4, 10 -> gaps [3, 6] -> med_x4 = 18
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-01", "2023-01-04",
                                    "2023-01-10", "2023-05-01"]),
                               pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    got = (_match_oracle("part_order_gap_median", d)
           .set_index("pk"))
    assert int(got.loc[1, "n_ship"]) == 3
    assert int(got.loc[1, "med_gap_x4"]) == 2 * 3 + 2 * 6
    assert 2 not in got.index          # single shipment, no gaps


def test_pair_confidence_asym_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # pair (1,2) in orders 1,2 (c=2); part 1 in 4 orders, part 2 in 2
    oks = [1, 1, 2, 2, 3, 4]
    pks = [1, 2, 1, 2, 1, 1]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(oks, pa.int64()),
        "l_partkey": pa.array(pks, pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("pair_confidence_asym", d)
    r = got.iloc[0]
    assert (int(r["pa"]), int(r["pb"]), int(r["c"])) == (1, 2, 2)
    # |2/4 - 2/2| = 1/2 -> 2*|2-4|*1e6 // (4*2)
    assert int(r["asym_e6"]) == 2 * 2 * 1_000_000 // 8


# ---------------------------------------------------------------------------
# batch 43: supplier balance-late corr, weekly momentum
# ---------------------------------------------------------------------------


def test_supplier_balance_late_corr_sign(ray_session, tmp_path):
    d = str(tmp_path)
    # poor supplier 1 always late, rich supplier 2 never ->
    # negative correlation
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 4),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-04-01", "2023-04-02",
                                    "2023-01-05", "2023-01-06"]),
                               pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_acctbal": pa.array([10.0, 9000.0], pa.float64()),
    }), os.path.join(d, "supplier.parquet"))
    got = _match_oracle2("supplier_balance_late_corr", d,
                         ["lineitem", "orders", "supplier"])
    assert float(got.loc[0, "corr_bl"]) < -0.99


def test_weekly_momentum_hand(ray_session, tmp_path):
    d = str(tmp_path)
    # three consecutive epoch weeks with rev 1, 3, 2 -> ups: 1 of 2
    _write_orders(d, ["2023-01-02", "2023-01-09", "2023-01-16"],
                  [1.0, 3.0, 2.0])
    got = _match_oracle("weekly_momentum_share", d)
    assert int(got.loc[0, "n_pairs"]) == 2
    assert int(got.loc[0, "n_up"]) == 1
    assert int(got.loc[0, "share_e4"]) == 5000
