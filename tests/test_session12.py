"""Round-5 session-6 operators, batch 1: two-sample distribution
tests — Cramér-von Mises (tie-aware, pooled-edf), Anderson-Darling
(per-term floored integers), Wasserstein-1D (integer lattice = gap
weighted), Kuiper V, Brunner-Munzel (doubled midranks + moment
identity), Cohen's d / Hedges' g.

Fixtures are adversarial: heavy ties across groups, a HOLE in the
quantity lattice (gap-weighted SQL must equal the lattice walk),
single-value overlap at both extremes, and brute-force references
computed from first principles (sorted-sample transport for W1,
argsort midranks for BM)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BATCH = ["cvm_two_flags", "anderson_darling_flags",
         "wasserstein_flags", "brunner_munzel_flags",
         "cohens_d_flags"]


def _vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort")
    body = "|".join(
        ",".join(repr(x) for x in df[c].tolist()) for c in df.columns
    )
    return hashlib.md5(body.encode()).hexdigest()


def _match_oracle(name, fix_dir, tables=("lineitem", "orders", "events")):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](fix_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(fix_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name
    return got


@pytest.fixture(scope="module")
def flags_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12flags"))
    # R: ties at 1 and 7, extremes 1 and 12; A: hole at 5-6 shared
    # with R (neither group has 5 or 6 -> lattice gap), ties at 3.
    r = [1, 1, 1, 2, 3, 4, 7, 7, 9, 12]
    a = [1, 2, 3, 3, 3, 4, 7, 8, 10, 11, 12, 12]
    n = len(r) + len(a)
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["R"] * len(r) + ["A"] * len(a)
                                 + ["N"] * 3),
        "l_quantity": pa.array([float(x) for x in r + a]
                               + [5.0, 5.0, 5.0], pa.float64()),
        "l_extendedprice": pa.array(
            [100.25 * x for x in r + a] + [1.0, 2.0, 3.0],
            pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d, np.array(r), np.array(a)


def test_batch_matches_oracle(flags_dir):
    d, _, _ = flags_dir
    for name in BATCH:
        _match_oracle(name, d)


def test_wasserstein_vs_sorted_transport(flags_dir):
    """W1 on the lattice == the classic quantile-coupling integral,
    computed brute-force from the two sorted samples."""
    import __ray_entry__ as e

    d, r, a = flags_dir
    got = e.queries()["wasserstein_flags"](d).to_pandas()
    n, m = len(r), len(a)
    # brute: integrate |F1 - F2| over a fine grid
    lo, hi = 1, 12
    grid = np.arange(lo, hi)  # unit steps, integer support
    f1 = np.searchsorted(np.sort(r), grid, side="right") / n
    f2 = np.searchsorted(np.sort(a), grid, side="right") / m
    w1 = float(np.sum(np.abs(f1 - f2)))
    assert int(got["w1_e6"][0]) == int(w1 * n * m) * 10**6 // (n * m) \
        or abs(got["w1_e6"][0] / 1e6 - w1) < 1e-9


def test_brunner_munzel_vs_argsort_midranks(flags_dir):
    """BM p_hat / W from the histogram machinery == the direct
    per-observation midrank computation."""
    import __ray_entry__ as e

    d, r, a = flags_dir
    got = e.queries()["brunner_munzel_flags"](d).to_pandas()
    x, y = r.astype(float), a.astype(float)
    n, m = len(x), len(y)
    pooled = np.concatenate([x, y])

    def midranks(vals, ref):
        lo = np.searchsorted(np.sort(ref), vals, side="left")
        hi = np.searchsorted(np.sort(ref), vals, side="right")
        return (lo + hi + 1) / 2.0

    rp = midranks(pooled, pooled)
    r1, r2 = rp[:n], rp[n:]
    r1w = midranks(x, x)
    r2w = midranks(y, y)
    p_hat = (r2.mean() - (m + 1) / 2.0) / n
    s1 = np.var(r1 - r1w, ddof=1)
    s2 = np.var(r2 - r2w, ddof=1)
    se = (n + m) * np.sqrt(s1 / (n * m * m) + s2 / (n * n * m))
    w = (r2.mean() - r1.mean()) / se
    assert abs(got["p_hat"][0] - p_hat) < 1e-12
    assert abs(got["w_stat"][0] - w) < 1e-10


def test_cvm_vs_direct(flags_dir):
    """CvM integer numerator == direct pooled-edf integral."""
    import __ray_entry__ as e

    d, r, a = flags_dir
    got = e.queries()["cvm_two_flags"](d).to_pandas()
    n, m = len(r), len(a)
    N = n + m
    vals = np.unique(np.concatenate([r, a]))
    t = np.array([np.sum(r == v) + np.sum(a == v) for v in vals])
    f1 = np.searchsorted(np.sort(r), vals, side="right") / n
    f2 = np.searchsorted(np.sort(a), vals, side="right") / m
    tstat = float(np.sum(t * (f1 - f2) ** 2)) * n * m / (N * N)
    assert int(got["t_e6"][0]) == int(tstat * 1e6) \
        or abs(got["t_e6"][0] / 1e6 - tstat) < 1e-6


def test_cohens_d_vs_direct(flags_dir):
    import __ray_entry__ as e

    d, r, a = flags_dir
    got = e.queries()["cohens_d_flags"](d).to_pandas()
    # half-away-from-zero like DuckDB round() / _money_int
    x = np.floor(100.25 * r + 0.5)
    y = np.floor(100.25 * a + 0.5)
    sp = np.sqrt(((len(x) - 1) * np.var(x, ddof=1)
                  + (len(y) - 1) * np.var(y, ddof=1))
                 / (len(x) + len(y) - 2))
    dval = (x.mean() - y.mean()) / sp
    assert abs(got["cohens_d"][0] - dval) < 1e-9
    jf = 1.0 - 3.0 / (4.0 * (len(x) + len(y)) - 9.0)
    assert abs(got["hedges_g"][0] - dval * jf) < 1e-9


@pytest.fixture(scope="module")
def kuiper_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12kuiper"))
    # view shifted up at the top, purchase heavier at the bottom:
    # both D+ and D- strictly positive, plus cross-group cent ties.
    ts = pa.array([np.datetime64("2023-01-01T00:00:00")
                   .astype("datetime64[us]")] * 12,
                  pa.timestamp("us"))
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(12)), pa.int64()),
        "ts": ts,
        "user_id": pa.array([1] * 12, pa.int64()),
        "event_type": pa.array(["view"] * 6 + ["purchase"] * 5
                               + ["click"]),
        "value": pa.array([1.00, 2.50, 2.50, 9.00, 9.50, 10.00,
                           0.50, 1.00, 2.50, 3.00, 9.00, 99.0],
                          pa.float64()),
    }), os.path.join(d, "events.parquet"))
    return d


def test_kuiper_matches_oracle_and_direct(kuiper_dir):
    import __ray_entry__ as e

    got = _match_oracle("kuiper_drift", kuiper_dir)
    v = [1.00, 2.50, 2.50, 9.00, 9.50, 10.00]
    p = [0.50, 1.00, 2.50, 3.00, 9.00]
    cents = np.unique(np.array(v + p))
    f1 = np.searchsorted(np.sort(v), cents, side="right") / len(v)
    f2 = np.searchsorted(np.sort(p), cents, side="right") / len(p)
    vstat = float(np.max(f1 - f2) if np.max(f1 - f2) > 0 else 0.0) \
        + float(np.max(f2 - f1) if np.max(f2 - f1) > 0 else 0.0)
    assert abs(got["v_e6"][0] / 1e6 - vstat) < 1e-5


# ---------------------------------------------------------------------------
# batch 2: daily-series stats + event-gap dynamics
# ---------------------------------------------------------------------------

DAILY_B = ["kpss_level_daily", "ljung_box_daily",
           "variance_ratio_daily", "rescaled_range_daily"]


def _us(dates):
    return [int(np.datetime64(x).astype("datetime64[us]")
                .astype(np.int64)) for x in dates]


@pytest.fixture(scope="module")
def daily12_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12daily"))
    # 12 observed days with a CALENDAR GAP (index-based lags must
    # ignore it) and one day split across two orders; revenues in k$
    # multiples plus sub-k$ noise that the //100000 floor must eat.
    days = (["2023-01-01", "2023-01-01"]
            + ["2023-01-%02d" % i for i in range(2, 9)]
            + ["2023-02-%02d" % i for i in range(1, 5)])
    vals = [1000.0, 1000.5, 3000.0, 1500.25, 4000.0, 2000.0, 5000.0,
            2500.0, 6000.0, 1000.0, 7000.0, 3500.75, 2000.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    return d


def test_daily_batch_matches_oracle(daily12_dir):
    for name in DAILY_B:
        _match_oracle(name, daily12_dir)


def test_kpss_vs_direct(daily12_dir):
    import __ray_entry__ as e

    got = e.queries()["kpss_level_daily"](daily12_dir).to_pandas()
    # rebuild the k$ series the same way and compute eta directly
    r = np.array([2, 3, 1, 4, 2, 5, 2, 6,
                  1, 7, 3, 2])  # floor k$ per day
    n = len(r)
    ee = r - r.mean()
    s = np.cumsum(ee)
    eta = float(np.sum(s * s)) / (n * n * np.var(r) * n) * n
    # eta = sum(S_t^2) / (n^2 * sigma2) with sigma2 = sum(e^2)/n
    eta = float(np.sum(s * s)) / (n * n * (np.sum(ee * ee) / n))
    assert abs(got["kpss_e4"][0] / 1e4 - eta) < 2e-4
    assert int(got["n_days"][0]) == n


def test_variance_ratio_vs_direct(daily12_dir):
    import __ray_entry__ as e

    got = e.queries()["variance_ratio_daily"](daily12_dir).to_pandas()
    r = np.array([2, 3, 1, 4, 2, 5, 2, 6,
                  1, 7, 3, 2], dtype=float)
    w = np.convolve(r, np.ones(5), "valid")
    vr = np.var(w) / (5 * np.var(r))
    assert abs(got["vr_e4"][0] / 1e4 - vr) < 2e-4


def test_rescaled_range_vs_direct(daily12_dir):
    import __ray_entry__ as e

    got = e.queries()["rescaled_range_daily"](daily12_dir).to_pandas()
    r = np.array([2, 3, 1, 4, 2, 5, 2, 6,
                  1, 7, 3, 2], dtype=float)
    c = np.cumsum(r - r.mean())
    rng = max(c.max(), 0) - min(c.min(), 0)
    rs = rng / np.sqrt(np.mean((r - r.mean()) ** 2))
    assert abs(got["rs_stat"][0] - rs) < 1e-9


def test_ljung_box_vs_direct(daily12_dir):
    import __ray_entry__ as e

    got = e.queries()["ljung_box_daily"](daily12_dir).to_pandas()
    r = np.array([2, 3, 1, 4, 2, 5, 2, 6,
                  1, 7, 3, 2], dtype=float)
    n = len(r)
    ee = r - r.mean()
    c0 = float(np.sum(ee * ee))
    q = 0.0
    for k in range(1, 6):
        rk = float(np.sum(ee[:-k] * ee[k:])) / c0
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert abs(got["q_lb"][0] - q) < 1e-8


@pytest.fixture(scope="module")
def gaps_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12gaps"))
    # user 1: four events -> two consecutive-gap pairs, with a ts TIE
    # broken by event_id; user 2: two events (no pair); user 3: one.
    base = int(np.datetime64("2023-01-01T00:00:00")
               .astype("datetime64[us]").astype(np.int64))
    H = 3_600_000_000
    rows = [
        (1, base, 10), (1, base + 2 * H, 11),
        (1, base + 2 * H, 12),           # tie: event_id orders it
        (1, base + 7 * H, 13),
        (2, base, 20), (2, base + 5 * H, 21),
        (3, base, 30),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view", "click", "view", "purchase",
                                "view", "view", "click"]),
        "value": pa.array([1.0] * 7, pa.float64()),
    }), os.path.join(d, "events.parquet"))
    return d


def test_gap_memory_matches_oracle_and_direct(gaps_dir):
    got = _match_oracle("gap_memory_coeff", gaps_dir)
    # user1 gaps (hours): 2, 0, 5 -> pairs (2,0),(0,5); user2: single
    # gap, no pair. corr of x=[2,0], y=[0,5]
    x, y = np.array([2.0, 0.0]), np.array([0.0, 5.0])
    ref = np.corrcoef(x, y)[0, 1]
    assert int(got["n_pairs"][0]) == 2
    assert abs(got["memory_coeff"][0] - ref) < 1e-12


def test_burstiness_matches_oracle(gaps_dir):
    got = _match_oracle("burstiness_by_type", gaps_dir)
    # global per-type stream ordered by (ts, event_id): views are
    # ids 10(t0), 20(t0), 12(t+2h), 21(t+5h) -> gaps 0, 7200, 10800 s
    # (the t0 tie resolved by event_id); clicks have ONE gap (n<2,
    # excluded); purchase has none. Only 'view' survives.
    assert list(got["event_type"]) == ["view"]
    g = np.array([0, 7200, 10800], dtype=float)
    mu, sd = g.mean(), g.std()
    assert int(got["n_gaps"][0]) == 3
    assert abs(got["b_stat"][0] - (sd - mu) / (sd + mu)) < 1e-12


# ---------------------------------------------------------------------------
# batch 3: transitions / sessions / business
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def trans_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12trans"))
    base = int(np.datetime64("2023-01-01T00:00:00")
               .astype("datetime64[us]").astype(np.int64))
    M = 60_000_000
    # user 1: view -> click(30m exactly: same session) -> view(31m gap:
    # breaks session) -> click; user 2: view -> view at SAME ts (order
    # by event_id), then purchase at exactly 600s (self-excite edge
    # is <= so purchase->purchase n/a, view->view 0s gap).
    rows = [
        (1, 0, 1, "view"), (1, 30 * M, 2, "click"),
        (1, 61 * M, 3, "view"), (1, 62 * M, 4, "click"),
        (2, 0, 5, "view"), (2, 0, 6, "view"),
        (2, 600 * 1_000_000, 7, "view"),
        (3, 0, 8, "purchase"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(base + r[1], "us")
                        for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), os.path.join(d, "events.parquet"))
    return d


def test_transition_gap_median_oracle(trans_dir):
    got = _match_oracle("transition_gap_median", trans_dir)
    gm = {(r["from_type"], r["to_type"]): r
          for _, r in got.iterrows()}
    # view->click gaps: u1 (1800s, 60s) -> even n: g_lo=60, g_hi=1800
    vc = gm[("view", "click")]
    assert (vc["n_trans"], vc["g_lo"], vc["g_hi"]) == (2, 60, 1800)
    # view->view: u2 gaps 0 (tie) and 600
    vv = gm[("view", "view")]
    assert (vv["n_trans"], vv["g_lo"], vv["g_hi"]) == (2, 0, 600)


def test_self_excitation_boundary(trans_dir):
    got = _match_oracle("self_excitation_10min", trans_dir)
    m = {r["event_type"]: r for _, r in got.iterrows()}
    # views: u1 has 2 views 61min apart (no hit from first, last no
    # next); u2 views at 0,0,600s: gaps 0s (hit) and 600s (hit, <=
    # boundary). n=5 views total, hits=2.
    assert (m["view"]["n_events"], m["view"]["n_hits"]) == (5, 2)
    assert m["view"]["share_e4"] == 2 * 10_000 // 5
    assert m["purchase"]["n_hits"] == 0


def test_session_depth_survival_boundary(trans_dir):
    got = _match_oracle("session_depth_survival", trans_dir)
    # sessions: u1 {view,click} (30m gap NOT > 30m), {view,click};
    # u2 {view,view} then 600s later view -> all within 30m: one
    # session of 3; u3 {purchase}. Depths: 2,2,3,1.
    n_ge = dict(zip(got["k"], got["n_ge"]))
    assert (n_ge[1], n_ge[2], n_ge[3], n_ge[4]) == (4, 3, 1, 0)
    r = dict(zip(got["k"], got["ratio_e4"]))
    assert r[1] == 10000 and r[2] == 3 * 10000 // 4
    assert r[3] == 10000 // 3 and r[4] == 0


@pytest.fixture(scope="module")
def decile_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12decile"))
    # years 2020, 2021, 2023 (2021->2023 NOT adjacent: excluded).
    # 2020: custs 1..10 spends equal (ties -> decile by custkey);
    # 2021: reversed spends.
    days, cks, vals = [], [], []
    for ck in range(1, 11):
        days.append("2020-06-01"); cks.append(ck); vals.append(100.0)
        days.append("2021-06-01"); cks.append(ck)
        vals.append(float(100 + (10 - ck)))
        days.append("2023-06-01"); cks.append(ck); vals.append(50.0)
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_custkey": pa.array(cks, pa.int64()),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    return d


def test_decile_migration_oracle(decile_dir):
    got = _match_oracle("decile_migration_yoy", decile_dir)
    assert set(got["from_year"]) == {2020}
    # 2020 all-tied spends -> decile = rank by custkey - 1; 2021
    # reversed -> cust k decile = 10 - k. Each cell n=1, anti-diagonal.
    assert len(got) == 10 and got["n"].sum() == 10
    for _, r in got.iterrows():
        assert r["d_from"] + r["d_to"] == 9


@pytest.fixture(scope="module")
def basket_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12basket"))
    # parts: 1 and 2 ALWAYS together (conf=1 both ways -> excluded);
    # 3 -> 4 in 2 of 3 orders containing 3; part 4 also alone.
    ok = [10, 10, 11, 11, 20, 20, 21, 21, 22, 23,
          30, 30, 31]
    pk = [1, 2, 1, 2, 3, 4, 3, 4, 3, 4,
          5, 6, 5]
    sk = list(range(1, len(ok) + 1))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_quantity": pa.array([1.0] * len(ok), pa.float64()),
        "l_extendedprice": pa.array([10.0] * len(ok), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(ok)),
        "l_shipdate": pa.array(
            _us(["2023-01-05"] * len(ok)), pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    return d


def test_pair_conviction_oracle(basket_dir):
    got = _match_oracle("pair_conviction_top", basket_dir)
    # rule 1->2 and 2->1 have conf=1 (na == c) -> EXCLUDED.
    pairs = set(zip(got["pa"], got["pb"]))
    assert (1, 2) not in pairs and (2, 1) not in pairs
    # rule 4->3: n=8 orders, n3=3, n4=3, c=2: conv = (8-3)*3*1e4 //
    # (8*(3-2)) = 150000 // 8... = 18750
    row = got[(got["pa"] == 4) & (got["pb"] == 3)]
    assert len(row) == 1 and int(row["conv_e4"].iloc[0]) == \
        (8 - 3) * 3 * 10000 // (8 * 1)


def test_supplier_leadtime_cv_filters(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12slcv"))
    # supplier 1: 25 shipments alternating 10/20-day lag (kept);
    # supplier 2: 25 shipments all ZERO lag (s1=0 -> excluded);
    # supplier 3: 5 shipments (n<20 -> excluded).
    ok, sk, ship, odate = [], [], [], []
    k = 0
    for i in range(25):
        k += 1; ok.append(k); sk.append(1)
        odate.append("2023-01-01")
        ship.append("2023-01-%02d" % (11 if i % 2 == 0 else 21))
    for i in range(25):
        k += 1; ok.append(k); sk.append(2)
        odate.append("2023-02-01"); ship.append("2023-02-01")
    for i in range(5):
        k += 1; ok.append(k); sk.append(3)
        odate.append("2023-03-01"); ship.append("2023-03-05")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_shipdate": pa.array(_us(ship), pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_orderdate": pa.array(_us(odate), pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("supplier_leadtime_cv", d)
    assert list(got["sk"]) == [1]
    g = np.array([10, 20] * 13)[:25]
    n, s1, sq = 25, int(g.sum()), int((g * g).sum())
    assert int(got["cv2_e6"][0]) == (n * sq - s1 * s1) * 10**6 \
        // (s1 * s1)


# ---------------------------------------------------------------------------
# batch 4: dependence tests + corpus character stats
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dep_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12dep"))
    # quantity/discount grid with heavy ties and a non-monotone
    # (V-shaped) relation hoeffding should flag; flags R on the
    # high-qty arm for somers.
    q = [1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 1, 6, 3, 4]
    dc = [0.05, 0.05, 0.03, 0.03, 0.01, 0.01, 0.01, 0.02,
          0.03, 0.04, 0.05, 0.05, 0.04, 0.04, 0.02, 0.01]
    rf = ["R" if x >= 4 else "N" for x in q]
    rf[0] = "R"  # one low-qty return: discordant pairs exist
    pq.write_table(pa.table({
        "l_quantity": pa.array([float(x) for x in q], pa.float64()),
        "l_discount": pa.array(dc, pa.float64()),
        "l_returnflag": pa.array(rf),
        "l_extendedprice": pa.array([10.0] * len(q), pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    return d, np.array(q), np.array([round(x * 100) for x in dc]), rf


def test_hoeffding_vs_brute(dep_dir):
    d, q, dc, _ = dep_dir
    got = _match_oracle("hoeffding_d_qty_disc", d)
    n = len(q)
    # brute per-point with the SAME convention: doubled midranks,
    # strictly-less-in-both c_i
    d1 = d2x16 = d3x4 = 0
    for i in range(n):
        r2 = 2 * int(np.sum(q < q[i])) + int(np.sum(q == q[i])) + 1
        s2 = 2 * int(np.sum(dc < dc[i])) + int(np.sum(dc == dc[i])) + 1
        c = int(np.sum((q < q[i]) & (dc < dc[i])))
        d1 += c * (c - 1)
        d2x16 += (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
        d3x4 += (r2 - 4) * (s2 - 4) * c
    num = 30 * (16 * (n - 2) * (n - 3) * d1 + d2x16
                - 8 * (n - 2) * d3x4) * 10**6
    den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    ref = abs(num) // abs(den) * (1 if (num >= 0) == (den > 0) else -1)
    assert int(got["d_e6"][0]) == ref
    assert int(got["n_rows"][0]) == n


def test_somers_vs_brute(dep_dir):
    d, q, _, rf = dep_dir
    got = _match_oracle("somers_d_qty_return", d)
    y = np.array([1 if f == "R" else 0 for f in rf])
    nc = nd = 0
    n = len(q)
    for i in range(n):
        for j in range(i + 1, n):
            if q[i] == q[j] or y[i] == y[j]:
                continue
            conc = (q[i] < q[j]) == (y[i] < y[j])
            nc += conc
            nd += not conc
    t = pd.Series(q).value_counts().to_numpy()
    w = n * (n - 1) // 2 - int(np.sum(t * (t - 1) // 2))
    assert int(got["n_conc"][0]) == nc
    assert int(got["n_disc"][0]) == nd
    num = (nc - nd) * 10**6
    ref = abs(num) // w * (1 if num >= 0 else -1)
    assert int(got["d_e6"][0]) == ref


@pytest.fixture(scope="module")
def chardocs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12chars"))
    # doc_ids exercising every t2 branch: 105 (%7,%3,%5 all), 7, 3,
    # 5, 1 (none); an empty doc and a 1-char doc for the bigram
    # boundary; duplicate bigrams across docs of the same lang.
    pq.write_table(pa.table({
        "doc_id": pa.array([105, 7, 3, 5, 1, 2, 4], pa.int64()),
        "text": pa.array(["ab ab", "cd", "ab", "x", "", "a", "abab"]),
        "lang": pa.array(["en", "en", "en", "de", "de", "de", "fr"]),
        "source": pa.array(["s"] * 7),
        "n_chars": pa.array([5, 2, 2, 1, 0, 1, 4], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    return d


def test_charclass_mix_oracle(chardocs_dir):
    got = _match_oracle("charclass_mix_by_lang", chardocs_dir,
                        tables=("documents",))
    m = {r["lang"]: r for _, r in got.iterrows()}
    # de doc 5 ("x"): t2 = "x by dr. alice smith" -> 2 dots? no:
    # " by dr. alice smith" has one '.'; doc 1 ("") %nothing -> "";
    # doc 2 ("a") -> "a". digits: none in de.
    assert m["de"]["n_digit"] == 0
    assert m["de"]["n_punct"] == 1
    # en doc 105: all three suffixes (digits from '105' twice + email)
    assert m["en"]["n_digit"] > 0


def test_char_bigram_diversity_boundaries(chardocs_dir):
    got = _match_oracle("char_bigram_diversity", chardocs_dir,
                        tables=("documents",))
    m = {r["lang"]: r for _, r in got.iterrows()}
    # fr "abab": pairs ab, ba, ab -> total 3, distinct 2
    assert (m["fr"]["n_total"], m["fr"]["n_distinct"]) == (3, 2)
    # de: "x"(len1) + ""(len0) + "a"(len1) -> NO pairs; lang absent
    assert "de" not in m
    # en: "ab ab" -> ab,'b ',' a',ab ; "cd" -> cd ; "ab" -> ab
    # total 6, distinct: ab,'b ',' a',cd -> 4 (no cross-doc 'bc'/'da')
    assert (m["en"]["n_total"], m["en"]["n_distinct"]) == (6, 4)


# ---------------------------------------------------------------------------
# batch 5: variance/outlier screens + corpus letters + overlap
# ---------------------------------------------------------------------------


def test_cusum_dixon_small(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12cusum"))
    # k$ series 1,1,9,1 (day 3 split into 0.5+0.5 -> floor 1k$? no:
    # 500.0+500.0 = 1000.0 dollars = 1 k$). min tie: days 1,2,4 all
    # 1 -> dixon q_low = (x2-x1)/(xn-x1) = 0.
    days = ["2023-01-01", "2023-01-02", "2023-01-03",
            "2023-01-04", "2023-01-04"]
    vals = [1000.0, 1000.0, 9000.0, 500.0, 500.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("dixon_q_daily", d)
    assert (int(got["q_low_e6"][0]), int(got["q_high_e6"][0])) == \
        (0, 10**6)
    got2 = _match_oracle("cusum_squares_daily", d)
    r = np.array([1, 1, 9, 1], dtype=object)
    w = r * r
    sn = int(w.sum())
    sk = np.cumsum(w)
    best = max(abs(int(s) * 4 - (k + 1) * sn)
               for k, s in enumerate(sk))
    assert int(got2["d_e6"][0]) == best * 10**6 // (4 * sn)


def test_cochran_c_excludes_singletons(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12coch"))
    # URGENT: var > 0 (n=3); HIGH: n=1 (excluded); LOW: zero-var.
    pri = ["1-URGENT"] * 3 + ["2-HIGH"] + ["5-LOW"] * 2
    vals = [100.0, 200.0, 600.0, 999.0, 50.0, 50.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            _us(["2023-01-01"] * 6), pa.timestamp("us")),
        "o_orderpriority": pa.array(pri),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("cochran_c_priority", d)
    # only URGENT has positive variance -> C = 1, n_groups = 1
    assert int(got["n_groups"][0]) == 1
    assert abs(got["c_stat"][0] - 1.0) < 1e-15


def test_letter_freq_and_overlap(chardocs_dir, flags_dir):
    got = _match_oracle("letter_freq_by_lang", chardocs_dir,
                        tables=("documents",))
    fr = got[got["lang"] == "fr"]
    # fr "abab": a x2, b x2, share 500000 each; spaces never counted
    assert sorted(zip(fr["letter"], fr["n"])) == [("a", 2), ("b", 2)]
    assert set(fr["share_e6"]) == {500000}

    d, r, a = flags_dir
    got2 = _match_oracle("overlap_coeff_flags", d)
    n, m = len(r), len(a)
    ref = sum(min(int(np.sum(r == v)) * m, int(np.sum(a == v)) * n)
              for v in np.unique(np.r_[r, a]))
    assert int(got2["overlap_e6"][0]) == ref * 10**6 // (n * m)


def test_basket_size_by_segment(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12bask"))
    # seg X: 2 orders with 3+1 items; seg Y: 1 order, 2 items;
    # customer 3 (seg Z) has NO orders -> absent.
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_nationkey": pa.array([0, 0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["X", "Y", "Z"]),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 20], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 3),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 10, 11, 20, 20], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 1, 1, 2], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("basket_size_by_segment", d,
                        tables=("lineitem", "orders", "customer"))
    m = {r["seg"]: r for _, r in got.iterrows()}
    assert set(m) == {"X", "Y"}
    assert (m["X"]["n_orders"], m["X"]["n_items"],
            m["X"]["avg_items_e4"]) == (2, 4, 20000)
    assert m["Y"]["avg_items_e4"] == 20000


# ---------------------------------------------------------------------------
# batch 6: rank uniformity, supply census, calendar peaks, token shapes
# ---------------------------------------------------------------------------


def test_within_customer_rank_hist(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12wcr"))
    # cust 1: 5 orders with VALUE TIES (ranks broken by orderkey);
    # cust 2: 4 orders (below min, excluded entirely).
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9], pa.int64()),
        "o_custkey": pa.array([1] * 5 + [2] * 4, pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 9),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 10.0, 10.0, 20.0, 30.0,
                                  1.0, 2.0, 3.0, 4.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("within_customer_rank_hist", d)
    # 5 orders -> deciles (pos*10//5): 0,2,4,6,8 one each
    assert sorted(got["decile"]) == [0, 2, 4, 6, 8]
    assert set(got["n"]) == {1}


def test_part_supplier_hist_and_endings(basket_dir):
    got = _match_oracle("part_supplier_count_hist", basket_dir)
    # suppkeys are all unique per row: parts 1,2,5 have 2 distinct
    # suppliers, parts 3,4 have 3, part 6 has 1
    m = dict(zip(got["n_suppliers"], got["n_parts"]))
    assert m == {2: 3, 3: 2, 1: 1}
    got2 = _match_oracle("cents_ending_hist", basket_dir)
    # all prices 10.0 -> ending 0 share 10000
    assert (int(got2["ending"][0]), int(got2["share_e4"][0])) == \
        (0, 10000)


def test_weekly_peak_day_and_benford(daily12_dir):
    got = _match_oracle("weekly_peak_day", daily12_dir)
    assert (got["share_e4"] <= 10000).all()
    assert ((got["peak_dow"] >= 0) & (got["peak_dow"] <= 6)).all()
    got2 = _match_oracle("benford_second_digit", daily12_dir)
    # every total >= 500.00 -> cents string >= 5 chars; shares sum
    # to <= 10000 with floor
    assert got2["n"].sum() == 13
    assert got2["share_e4"].sum() <= 10000


def test_token_position_lengths(chardocs_dir):
    got = _match_oracle("token_position_lengths", chardocs_dir,
                        tables=("documents",))
    m = {int(r["pos"]): r for _, r in got.iterrows()}
    # texts: "ab ab"(2 toks), "cd", "ab", "x", ""(1 empty tok), "a",
    # "abab" -> pos1: 7 docs, lens 2,2,2,1,0,1,4 = 12
    assert (m[1]["n_docs"], m[1]["sum_len"]) == (7, 12)
    # pos2: only "ab ab" -> len 2
    assert (m[2]["n_docs"], m[2]["sum_len"]) == (1, 2)
    assert 3 not in m


# ---------------------------------------------------------------------------
# batch 7: co-supply graph, tenure, first/last, quartile shapes, JB
# ---------------------------------------------------------------------------


def test_shared_parts_and_span(basket_dir):
    got = _match_oracle("supplier_shared_parts_top", basket_dir)
    # all suppkeys unique per row -> each pair shares exactly 1 part
    assert (got["n_shared"] == 1).all()


def test_first_last_type_matrix(trans_dir):
    got = _match_oracle("first_last_type_matrix", trans_dir)
    m = {(r["first_type"], r["last_type"]): r["n"]
         for _, r in got.iterrows()}
    # u1 view..click, u2 view..view (ts tie at start: event_id 5
    # first), u3 purchase..purchase
    assert m == {("view", "click"): 1, ("view", "view"): 1,
                 ("purchase", "purchase"): 1}


def test_quartile_shape_and_span_hist(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12qsh"))
    # flag R: 1..8 (n=8): positions (n-1)p: q1 at 1.75 -> 4Q1 =
    # (4-3)*2+3*3 = 11; q2 at 3.5 -> 2*(4+5)=18; q3 at 5.25 ->
    # (4-1)*6+1*7 = 25. bowley num = 11+25-36 = 0.
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["R"] * 8 + ["A"] * 2),
        "l_quantity": pa.array([1.0, 2, 3, 4, 5, 6, 7, 8, 5, 5],
                               pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("quartile_shape_by_flag", d)
    # A is all-ties (q3 == q1) -> excluded
    assert list(got["flag"]) == ["R"]
    r = got.iloc[0]
    assert (r["q1_x4"], r["q2_x4"], r["q3_x4"]) == (11, 18, 25)
    assert r["bowley_e6"] == 0
    assert r["trimean_x16"] == 11 + 36 + 25

    # customer span: cust 1 orders 100 days apart -> bucket 3;
    # cust 2 single order -> excluded
    d2 = str(tmp_path_factory.mktemp("s12span"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-04-11",
                                     "2023-01-01"]),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 1.0, 1.0], pa.float64()),
    }), os.path.join(d2, "orders.parquet"))
    got2 = _match_oracle("customer_order_span_hist", d2)
    assert list(got2["span_months"]) == [100 // 30]
    assert list(got2["n_customers"]) == [1]


def test_jarque_bera_split_double_parity(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12jb"))
    # strongly LEFT-skewed k$ series -> s3 NEGATIVE: locks the
    # sign-split abs-divmod parity (floor vs trunc trap) on both
    # sides; values large enough that s3/s4 exceed 2^62 would need
    # bigger data, but the expression path is identical.
    days = ["2023-01-%02d" % i for i in range(1, 13)]
    vals = [9000.0] * 9 + [1000.0, 2000.0, 1000.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("jarque_bera_daily", d)
    r = np.array([9] * 9 + [1, 2, 1], dtype=float)
    n = len(r)
    e = r - r.mean()
    m2 = np.mean(e ** 2)
    sk = np.mean(e ** 3) / m2 ** 1.5
    ku = np.mean(e ** 4) / m2 ** 2 - 3
    jb = n / 6 * (sk ** 2 + ku ** 2 / 4)
    assert abs(got["jb_stat"][0] - jb) < 1e-9
    assert np.mean(e ** 3) < 0  # the negative-s3 branch really ran


def test_ship_delay_median_by_month(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12sdm"))
    # one month, gaps 1,2,9 (odd n: g_lo == g_hi == 2); another
    # month gaps 4,6 (even: 4/6)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-02", "2023-01-03",
                                    "2023-01-10", "2023-02-05",
                                    "2023-02-07"]),
                               pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-01-01",
                                     "2023-01-01", "2023-02-01",
                                     "2023-02-01"]),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("ship_delay_median_by_month", d)
    m = {int(r["month"]): r for _, r in got.iterrows()}
    jan = (2023 - 1970) * 12 + 0
    assert (m[jan]["g_lo"], m[jan]["g_hi"]) == (2, 2)
    assert (m[jan + 1]["g_lo"], m[jan + 1]["g_hi"]) == (4, 6)


# ---------------------------------------------------------------------------
# batch 8: post-hoc ranks, changepoint, inversions, median CI, CV
# ---------------------------------------------------------------------------


def test_dunn_and_cv_priority(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12dunn"))
    # three priorities with cross-group dollar TIES; URGENT clearly
    # above LOW -> z(URGENT, LOW) ordering locked
    pri = (["1-URGENT"] * 4 + ["3-MEDIUM"] * 4 + ["5-LOW"] * 4)
    vals = [900.0, 900.0, 800.0, 700.0,
            500.0, 500.0, 400.0, 300.0,
            100.0, 100.0, 200.0, 900.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(["2023-01-01"] * 12),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(pri),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("dunn_pairs_priority", d)
    assert len(got) == 3  # 3 priorities -> 3 pairs
    m = {(r["p1"], r["p2"]): r["z"] for _, r in got.iterrows()}
    assert m[("1-URGENT", "5-LOW")] > 0  # URGENT ranks higher
    got2 = _match_oracle("order_value_cv_by_priority", d)
    assert len(got2) == 3 and (got2["cv2_e6"] >= 0).all()


def test_changepoint_day(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12chg"))
    # level shift after day 4: 1,1,1,1 -> 9,9,9,9 (k$)
    days = ["2023-01-%02d" % i for i in range(1, 9)]
    vals = [1000.0] * 4 + [9000.0] * 4
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("changepoint_day", d)
    d4 = int(np.datetime64("2023-01-04").astype("datetime64[D]")
             .astype(np.int64))
    assert int(got["break_day"][0]) == d4
    # B - S^2/n at the true break: two perfect segments
    r = np.array([1] * 4 + [9] * 4, dtype=float)
    b = (4 * 4 / 4 + 36 * 36 / 4) - r.sum() ** 2 / 8
    assert abs(got["b_stat"][0] - b) < 1e-9


def test_price_inversions_and_median_ci(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12inv"))
    # part 1: prices 300,200,100 on days 1<2<3 -> all 3 pairs
    # inverted; SAME-day pair (days tie) never counts: part 2 has
    # two rows same day opposite prices -> 0 inversions
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-01", "2023-01-02",
                                    "2023-01-03", "2023-02-01",
                                    "2023-02-01"]),
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([3.0, 2.0, 1.0, 5.0, 4.0],
                                    pa.float64()),
        "l_returnflag": pa.array(["N"] * 5),
        "l_quantity": pa.array([1.0, 2, 3, 4, 5], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("price_time_inversions", d)
    assert (int(got["n_inversions"][0]), int(got["n_pairs"][0])) == \
        (3, 4)
    got2 = _match_oracle("median_ci_by_flag", d)
    r = got2.iloc[0]
    # N flag: q = 1..5, n=5, d=isqrt(5)=2: med 3/3, ci 1..5
    assert (r["med_lo"], r["med_hi"], r["ci_lo"], r["ci_hi"]) == \
        (3, 3, 1, 5)


def test_never_returned_parts(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12nrp"))
    # part 1: 10 rows no R (counts, never-returned); part 2: 10 rows
    # one R; part 3: 9 rows (below cutoff)
    pk = [1] * 10 + [2] * 10 + [3] * 9
    rf = ["N"] * 10 + ["N"] * 9 + ["R"] + ["N"] * 9
    pq.write_table(pa.table({
        "l_partkey": pa.array(pk, pa.int64()),
        "l_returnflag": pa.array(rf),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("never_returned_parts", d)
    assert (int(got["n_eligible"][0]),
            int(got["n_never_returned"][0]),
            int(got["share_e4"][0])) == (2, 1, 5000)


# ---------------------------------------------------------------------------
# batch 9: embedding axes, activity concentration, regional quartiles
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12emb"))
    # 4-dim vectors: one with a TIE at the max (first-max rule),
    # one with a value exactly at float32(0.01) (the f32-vs-f64
    # comparison boundary), one all-negative.
    vecs = [
        [0.5, 0.9, 0.9, 0.1],            # tie: argmax dim 2
        [np.float32(0.01), 0.2, 0.3, 0.4],  # boundary value
        [-0.5, -0.001, -0.9, -0.2],      # argmax dim 2 (-0.001)
        [1.0, 0.0, 0.005, -0.005],
    ]
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, 0, 1], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    return d


def test_argmax_and_sparsity(emb_dir):
    got = _match_oracle("argmax_dim_hist", emb_dir,
                        tables=("embeddings",))
    m = dict(zip(got["dim"], got["n"]))
    assert m == {2: 2, 1: 1, 4: 1}
    got2 = _match_oracle("dim_sparsity_counts", emb_dir,
                         tables=("embeddings",))
    m2 = {int(r["dim"]): int(r["n_small"])
          for _, r in got2.iterrows()}
    # dim1: |f32(0.01)| < 0.01 in DOUBLE (f32(0.01) ~ 0.0099999998):
    # counts as small -> dims: d1 {0.5, ~0.01, 0.5, 1.0} -> 1;
    # d2 {0.9, .2, .001, 0} -> 2; d3 {.9,.3,.9,.005} -> 1;
    # d4 {.1,.4,.2,.005} -> 1
    assert m2 == {1: 1, 2: 2, 3: 1, 4: 1}


def test_user_share_and_value_medians(trans_dir):
    got = _match_oracle("user_event_share_top_decile", trans_dir)
    # 3 users: (rank-1)*10//3 tops out at 6 -> decile 9 is EMPTY
    # (the tie-stable decile rule needs >= 10 users to populate it)
    assert int(got["n_top_users"][0]) == 0
    assert int(got["share_e4"][0]) == 0
    got2 = _match_oracle("value_median_by_dow", trans_dir)
    assert (got2["med_lo"] <= got2["med_hi"]).all()
    got3 = _match_oracle("value_round_share_by_type", trans_dir)
    # all fixture values are 1.0 -> whole-dollar share 10000
    assert (got3["share_e4"] == 10000).all()


def test_region_quartiles(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12region"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["EAST", "WEST"]),
    }), os.path.join(d, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["A", "B"]),
        "n_regionkey": pa.array([0, 1], pa.int32()),
    }), os.path.join(d, "nation.parquet"))
    # EAST: balances -5, 1, 2, 100 (negative quartile interp);
    # WEST: single supplier -> excluded (n < 2)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "s_name": pa.array(["s"] * 5),
        "s_nationkey": pa.array([0, 0, 0, 0, 1], pa.int32()),
        "s_acctbal": pa.array([-5.0, 1.0, 2.0, 100.0, 9.0],
                              pa.float64()),
    }), os.path.join(d, "supplier.parquet"))
    got = _match_oracle("supplier_balance_quartiles_by_region", d,
                        tables=("supplier", "nation", "region"))
    assert list(got["region"]) == ["EAST"]
    r = got.iloc[0]
    # cents sorted: -500, 100, 200, 10000; n=4: q1 pos .75 ->
    # 4Q1 = 1*(-500) + 3*100 = -200; q2 pos 1.5 -> 2*(100+200)=600;
    # q3 pos 2.25 -> 3*200 + 1*10000 = 10600
    assert (r["q1_x4"], r["q2_x4"], r["q3_x4"]) == (-200, 600, 10600)


# ---------------------------------------------------------------------------
# batch 10: stability, activation, dispersion, quadrants, cadence
# ---------------------------------------------------------------------------


def test_onboarding_retention(trans_dir):
    got = _match_oracle("onboarding_retention_2x2", trans_dir)
    # u1: first session {view,click} depth 2 (30m gap INCLUSIVE stays)
    # -> shallow; never returns past 7d. u2: first session 3 events
    # -> deep, no 7d return. u3: single event -> shallow, no return.
    assert (int(got["n_deep_ret"][0]), int(got["n_deep_lost"][0]),
            int(got["n_shallow_ret"][0]),
            int(got["n_shallow_lost"][0])) == (0, 1, 0, 2)


def test_dispersion_and_accel(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12disp"))
    # daily counts 1,3,1,3: mean 2, var .. dispersion < 1e4 would be
    # (4*20-64)*1e4 // (4*8) = 16*1e4//32 = 5000
    days = ["2023-01-01", "2023-01-02", "2023-01-02", "2023-01-02",
            "2023-01-03", "2023-01-04", "2023-01-04", "2023-01-04"]
    ck = [1, 1, 2, 3, 1, 1, 2, 3]
    ok = list(range(1, 9))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(ck, pa.int64()),
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array([100.0] * 8, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("order_count_dispersion", d)
    assert int(got["dispersion_e4"][0]) == 5000
    # cust 1 orders days 1,2,3,4 -> gaps 1,1,1 (k=3, h=1): first 1
    # vs last 1 -> flat; cust 2/3 have 2 orders -> excluded
    got2 = _match_oracle("order_gap_accel_counts", d)
    assert (int(got2["n_accel"][0]), int(got2["n_decel"][0]),
            int(got2["n_flat"][0])) == (0, 0, 1)


def test_quadrants_and_curve(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12quad"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a"] * 4),
        "c_nationkey": pa.array([0] * 4, pa.int32()),
        "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
        "c_mktsegment": pa.array(["X"] * 4),
    }), os.path.join(d, "customer.parquet"))
    # spends: c1 100, c2 0 (no orders), c3 50, c4 200
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 3, 4], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 3),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 50.0, 200.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("balance_spend_quadrants", d,
                        tables=("customer", "orders"))
    # bal median (lower) = 20 -> high: {3,4}; spend sorted 0,50,100,
    # 200 -> median 50 -> high: {1,4}. n11={4}, n10={3}, n01={1},
    # n00={2}
    assert (int(got["n_hh"][0]), int(got["n_hl"][0]),
            int(got["n_lh"][0]), int(got["n_ll"][0])) == (1, 1, 1, 1)
    # perfectly balanced 2x2 -> phi = 0
    assert abs(got["phi"][0]) < 1e-15


def test_top_parts_stability_and_price_curve(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12tps"))
    # first half (before midpoint day): parts 1,2 lead; second half:
    # parts 2,3 lead -> intersection {2} among top-100 (all parts
    # qualify; top-100 > 3 parts so jaccard counts full sets)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-01", "2023-01-02",
                                    "2023-06-01", "2023-06-02"]),
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([5.0, 3.0, 4.0, 6.0],
                                    pa.float64()),
        "l_quantity": pa.array([1.0, 1.0, 2.0, 2.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("top_parts_stability", d)
    # half A = {1, 2}, half B = {2, 3}: common 1, union 3
    assert (int(got["n_top_a"][0]), int(got["n_top_b"][0]),
            int(got["n_common"][0])) == (2, 2, 1)
    assert int(got["jaccard_e4"][0]) == 10_000 // 3
    got2 = _match_oracle("price_by_qty_curve", d)
    m = {int(r["q"]): r for _, r in got2.iterrows()}
    assert int(m[1]["avg_e2"]) == (500 + 300) * 100 // 2
    assert int(m[2]["avg_e2"]) == (400 + 600) * 100 // 2


# ---------------------------------------------------------------------------
# batch 11: SPC chart, Neyman allocation, Benford-by-source, cohorts
# ---------------------------------------------------------------------------


def test_xmr_and_neyman(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12xmr"))
    days = ["2023-01-%02d" % i for i in range(1, 9)]
    vals = [2000.0, 2000.0, 2000.0, 2000.0, 2000.0, 2000.0,
            2000.0, 20000.0]  # one massive spike
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("xmr_chart_daily", d)
    # r = [2]*7 + [20]; xbar = 4.25, mrbar = 18/7; ucl ~ 11.09:
    # only the spike violates
    assert int(got["n_viol"][0]) == 1

    d2 = str(tmp_path_factory.mktemp("s12ney"))
    # two segments: X high-variance big stratum, Y zero-variance ->
    # w=0 -> all 1000 to X
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(1, 7)), pa.int64()),
        "c_name": pa.array(["c"] * 6),
        "c_nationkey": pa.array([0] * 6, pa.int32()),
        "c_acctbal": pa.array([0.0, 100.0, 0.0, 100.0, 5.0, 5.0],
                              pa.float64()),
        "c_mktsegment": pa.array(["AUTOMOBILE"] * 4 + ["BUILDING"] * 2),
    }), os.path.join(d2, "customer.parquet"))
    got2 = _match_oracle("neyman_allocation_segments", d2,
                         tables=("customer",))
    m = dict(zip(got2["seg"], got2["alloc"]))
    assert m["AUTOMOBILE"] == 1000 and m["BUILDING"] == 0


def test_benford_source_and_first_week(chardocs_dir, trans_dir):
    got = _match_oracle("nchars_benford_by_source", chardocs_dir,
                        tables=("documents",))
    # n_chars: 5,2,2,1,0(excluded),1,4 all source 's': digits
    # {5:1, 2:2, 1:2, 4:1} of 6
    m = {int(r["digit"]): int(r["n"]) for _, r in got.iterrows()}
    assert m == {5: 1, 2: 2, 1: 2, 4: 1}
    got2 = _match_oracle("first_week_activity_curve", trans_dir)
    # all fixture events are within hours of each user's first ->
    # offset 0 only
    assert list(got2["off_day"]) == [0]
    assert int(got2["n"][0]) == 8


def test_return_month_and_basket_dups(basket_dir):
    got = _match_oracle("return_rate_by_month", basket_dir)
    assert (got["rate_e4"] == 0).all()  # fixture has no 'R'
    got2 = _match_oracle("basket_fingerprint_dups", basket_dir)
    # baskets: {1,2}x2 (orders 10,11), {3,4}x2 (20,21), {3}, {4},
    # {5,6}, {5} -> 6 distinct sigs, 2 dup groups, 4 orders in dups
    assert (int(got2["n_baskets"][0]), int(got2["n_dup_groups"][0]),
            int(got2["n_orders_in_dups"][0])) == (6, 2, 4)


# ---------------------------------------------------------------------------
# batch 12: lifecycle drift, zipf fit, bimodality, size regression
# ---------------------------------------------------------------------------


def test_lifecycle_and_latest_percentile(trans_dir, daily12_dir):
    got = _match_oracle("type_lifecycle_drift", trans_dir)
    # all fixture events are on one day -> second half (cut at
    # midpoint of a 1-day span means day >= cut) gets everything
    # OR nothing depending on rounding; both halves must sum to n
    assert ((got["n_first_half"] + got["n_second_half"]) > 0).all()
    assert (got["first_day"] <= got["last_day"]).all()
    got2 = _match_oracle("latest_day_percentile", daily12_dir)
    assert 0 < int(got2["pct_e4"][0]) <= 10000


def test_zipf_fit_deviation(chardocs_dir):
    got = _match_oracle("zipf_fit_deviation", chardocs_dir,
                        tables=("documents",))
    # tokens across docs: ab x4 ('ab ab' gives 2, 'ab', 'abab' is
    # one token), plus cd, x, '', a -> top tokens exist; d_e6 within
    # [0, 1e6]
    assert 0 <= int(got["d_e6"][0]) <= 10**6
    assert int(got["n_top"][0]) >= 5


def test_bimodality_daily(daily12_dir):
    got = _match_oracle("bimodality_daily", daily12_dir)
    r = np.array([2, 3, 1, 4, 2, 5, 2, 6, 1, 7, 3, 2], dtype=float)
    e = r - r.mean()
    m2 = np.mean(e ** 2)
    sk = np.mean(e ** 3) / m2 ** 1.5
    ku = np.mean(e ** 4) / m2 ** 2
    assert abs(got["bc_stat"][0] - (sk * sk + 1) / ku) < 1e-9


def test_size_regression_and_reach(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12szr"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["a", "b", "c"]),
        "p_brand": pa.array(["B"] * 3),
        "p_type": pa.array(["T"] * 3),
        "p_size": pa.array([10, 20, 30], pa.int32()),
        "p_retailprice": pa.array([1.0] * 3, pa.float64()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8], pa.int64()),
        "l_quantity": pa.array([30.0, 20.0, 10.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("size_qty_regression", d,
                        tables=("lineitem", "part"))
    # perfect inverse line qty = 40 - size  -> slope -1
    assert abs(got["slope"][0] + 1.0) < 1e-12
    assert abs(got["intercept"][0] - 40.0) < 1e-9

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 2),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([3, 4], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["X", "Y"]),
    }), os.path.join(d, "customer.parquet"))
    got2 = _match_oracle("supplier_reach_top", d,
                         tables=("lineitem", "orders", "customer"))
    m = dict(zip(got2["sk"], got2["n_nations"]))
    # supp 7 ships order 1 (nation 3) twice -> 1 nation;
    # supp 8 -> nation 4
    assert m == {7: 1, 8: 1}


# ---------------------------------------------------------------------------
# batch 13: SLA KS, activity density, brand premium, whale share
# ---------------------------------------------------------------------------


def test_ship_delay_ks_and_single_priority(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12ks"))
    # URGENT gaps all 1 day, LOW gaps all 10 days -> KS = 1e6
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-02", "2023-01-02",
                                    "2023-01-11", "2023-01-11"]),
                               pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 4),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "5-LOW", "5-LOW"]),
        "o_totalprice": pa.array([1.0] * 4, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("ship_delay_ks_priorities", d)
    assert int(got["d_e6"][0]) == 10**6
    got2 = _match_oracle("single_priority_customers", d)
    # cust 1: both URGENT (single), cust 2: both LOW (single)
    assert (int(got2["n_customers"][0]),
            int(got2["n_single_priority"][0])) == (2, 2)
    got3 = _match_oracle("daily_whale_share", d)
    assert (got3["share_e4"] <= 10000).all()


def test_activity_density(gaps_dir):
    got = _match_oracle("activity_density_hist", gaps_dir)
    # u1: events within hours -> 1 active day/1 span -> dens 1e4 ->
    # bucket 10; u2: same-day -> bucket 10; u3: single day -> 10
    assert list(got["bucket"]) == [10]
    assert int(got["n_users"][0]) == 3


def test_brand_premium_and_family(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12brand"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["a", "b"]),
        "p_brand": pa.array(["B1", "B2"]),
        "p_type": pa.array(["STANDARD ANODIZED BRASS",
                            "ECONOMY ANODIZED TIN"]),
        "p_size": pa.array([1, 2], pa.int32()),
        "p_retailprice": pa.array([100.0, 300.0], pa.float64()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1], pa.int64()),
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 300.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("brand_price_premium", d, tables=("part",))
    m = {r["brand"]: r for _, r in got.iterrows()}
    # global avg 200: B1 premium = 10000*100/200 = 5000
    assert int(m["B1"]["premium_e4"]) == 5000
    assert int(m["B2"]["premium_e4"]) == 15000
    got2 = _match_oracle("ptype_family_revenue", d,
                         tables=("part", "lineitem"))
    m2 = {r["family"]: int(r["share_e4"])
          for _, r in got2.iterrows()}
    assert m2 == {"STANDARD": 2500, "ECONOMY": 7500}


# ---------------------------------------------------------------------------
# batch 14: RLE, argmax-label chi2, gap quartiles, modal hour, MW
# ---------------------------------------------------------------------------


def test_rle_and_argmax_chi2(chardocs_dir, emb_dir):
    got = _match_oracle("rle_compressibility_by_lang", chardocs_dir,
                        tables=("documents",))
    m = {r["lang"]: r for _, r in got.iterrows()}
    # fr "abab": runs = 1 + 3 changes = 4, chars 4 -> ratio 1e4
    assert (int(m["fr"]["n_runs"]), int(m["fr"]["n_chars"])) == (4, 4)
    # de: "x"(1 run), ""(skipped), "a"(1 run): runs 2, chars 2
    assert (int(m["de"]["n_runs"]), int(m["de"]["n_chars"])) == (2, 2)
    got2 = _match_oracle("argmax_label_chi2_cells", emb_dir,
                         tables=("embeddings",))
    assert len(got2) <= 10 and (got2["chi2_e6"] >= 0).all()


def test_gap_quartiles_and_modal_hour(gaps_dir):
    got = _match_oracle("gap_quartiles_by_type", gaps_dir)
    # only 'view' has >= 2 gaps: [0, 7200, 10800] -> 4Q2 = 4*7200
    m = {r["event_type"]: r for _, r in got.iterrows()}
    assert set(m) == {"view"}
    assert int(m["view"]["q2_x4"]) == 4 * 7200
    got2 = _match_oracle("modal_type_by_hour", gaps_dir)
    assert (got2["share_e4"] <= 10000).all()
    assert got2["hour"].is_unique


def test_weekend_mw_and_universal(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12wmw"))
    # 2023-01-07/08 = Sat/Sun; 09/10 weekdays. Weekend revenue
    # strictly above weekday -> two_u_weekend = n_we * n_wd * 2
    days = ["2023-01-07", "2023-01-08", "2023-01-09", "2023-01-10"]
    vals = [900.0, 800.0, 100.0, 200.0]
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("weekend_revenue_mw", d)
    # 2U = 2*R - n(n+1) with weekend holding top ranks: R = 3+4=7
    # doubled: two_sum = 2*7 = ... two_u = 2*U1 where U1 = 4 (all
    # pairs won) -> two_u = 8
    assert (int(got["n_weekend"][0]), int(got["n_weekday"][0]),
            int(got["two_u_weekend"][0])) == (2, 2, 8)

    d2 = str(tmp_path_factory.mktemp("s12upc"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["E", "W"]),
    }), os.path.join(d2, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["A", "B"]),
        "n_regionkey": pa.array([0, 1], pa.int32()),
    }), os.path.join(d2, "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["X", "X"]),
    }), os.path.join(d2, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 2),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
    }), os.path.join(d2, "orders.parquet"))
    # part 1 ships to BOTH regions (universal), part 2 only region E
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 1], pa.int64()),
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
    }), os.path.join(d2, "lineitem.parquet"))
    got2 = _match_oracle("universal_parts_count", d2,
                         tables=("lineitem", "orders", "customer",
                                 "nation", "region"))
    assert (int(got2["n_regions"][0]),
            int(got2["n_parts_shipped"][0]),
            int(got2["n_universal"][0])) == (2, 2, 1)


# ---------------------------------------------------------------------------
# batch 15: discount calendar, silences, weekly ACF, tails, cov ints
# ---------------------------------------------------------------------------


def test_silence_and_weekly_acf(gaps_dir, daily12_dir):
    got = _match_oracle("max_silence_by_type", gaps_dir)
    m = {r["event_type"]: r for _, r in got.iterrows()}
    # view stream gaps 0, 7200, 10800 -> max 10800 starting at the
    # 2h event; click gap 7200
    assert int(m["view"]["max_gap_s"]) == 10800
    assert int(m["click"]["max_gap_s"]) == 7200
    got2 = _match_oracle("weekly_count_autocorr", daily12_dir)
    # 12 observed days -> defined; bounded in [-1e6, 1e6]
    assert abs(int(got2["rho7_e6"][0])) <= 10**6


def test_tail_ratio_by_flag(flags_dir):
    d, r, a = flags_dir
    got = _match_oracle("tail_ratio_by_flag", d)
    assert (got["p99"] >= got["p50"]).all()


def test_lineitem_cov_integers(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12cov"))
    q = [1, 2, 3]
    p = [10.0, 20.0, 30.0]
    dc = [0.05, 0.10, 0.02]
    pq.write_table(pa.table({
        "l_quantity": pa.array([float(x) for x in q], pa.float64()),
        "l_extendedprice": pa.array(p, pa.float64()),
        "l_discount": pa.array(dc, pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("lineitem_cov_integers", d)
    qq = np.array(q, dtype=object)
    pp = np.array([10, 20, 30], dtype=object)
    dd = np.array([5, 10, 2], dtype=object)
    n = 3
    assert int(got["cov_qty_price_num"][0]) == \
        n * int(sum(qq * pp)) - int(sum(qq)) * int(sum(pp))
    assert int(got["cov_qty_disc_num"][0]) == \
        n * int(sum(qq * dd)) - int(sum(qq)) * int(sum(dd))
    assert int(got["cov_price_disc_num"][0]) == \
        n * int(sum(pp * dd)) - int(sum(pp)) * int(sum(dd))


def test_monthly_discount_and_priority_mix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12madp"))
    pq.write_table(pa.table({
        "l_shipdate": pa.array(_us(["2023-01-05", "2023-01-20",
                                    "2023-02-05"]),
                               pa.timestamp("us")),
        "l_discount": pa.array([0.05, 0.10, 0.02], pa.float64()),
        "l_quantity": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "l_returnflag": pa.array(["N", "R", "N"]),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("monthly_avg_discount", d)
    jan = (2023 - 1970) * 12
    m = {int(r["month"]): int(r["avg_disc_e4"])
         for _, r in got.iterrows()}
    # jan: (5 + 10) * 100 // 2 = 750; feb: 200
    assert m == {jan: 750, jan + 1: 200}

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW",
                                     "1-URGENT"]),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 3),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["X", "Y"]),
    }), os.path.join(d, "customer.parquet"))
    got2 = _match_oracle("priority_share_by_segment", d,
                         tables=("orders", "customer"))
    m2 = {(r["seg"], r["p"]): int(r["share_e4"])
          for _, r in got2.iterrows()}
    assert m2 == {("X", "1-URGENT"): 5000, ("X", "5-LOW"): 5000,
                  ("Y", "1-URGENT"): 10000}


# ---------------------------------------------------------------------------
# batch 16: brand x region, nation medians, eta2, audits, band
# ---------------------------------------------------------------------------


def test_discount_delay_and_eta2(trans_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12ddc"))
    # discount x, delay y perfectly anticorrelated
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_discount": pa.array([0.01, 0.05, 0.10], pa.float64()),
        "l_shipdate": pa.array(_us(["2023-01-10", "2023-01-06",
                                    "2023-01-02"]),
                               pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 3),
                                pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("discount_delay_corr", d)
    assert got["corr"][0] < -0.9
    got2 = _match_oracle("value_hour_eta2", trans_dir)
    assert 0.0 <= got2["eta2"][0] <= 1.0 + 1e-12


def test_nchars_audit(chardocs_dir):
    got = _match_oracle("nchars_consistency_audit", chardocs_dir,
                        tables=("documents",))
    # fixture n_chars match text lengths exactly
    assert (int(got["n_mismatch"][0]), int(got["max_abs_gap"][0])) \
        == (0, 0)


def test_median_band_and_nation_medians(daily12_dir,
                                        tmp_path_factory):
    got = _match_oracle("median_band_occupancy_daily", daily12_dir)
    assert 0 < int(got["share_e4"][0]) <= 10000

    d = str(tmp_path_factory.mktemp("s12ovm"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
        "n_name": pa.array(["ZION"]),
        "n_regionkey": pa.array([0], pa.int32()),
    }), os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_name": pa.array(["a"]),
        "c_nationkey": pa.array([0], pa.int32()),
        "c_acctbal": pa.array([0.0], pa.float64()),
        "c_mktsegment": pa.array(["X"]),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 4),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0],
                                 pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got2 = _match_oracle("order_value_median_by_nation", d,
                         tables=("orders", "customer", "nation"))
    r = got2.iloc[0]
    # even n=4: lo = 2000 cents, hi = 3000 cents
    assert (r["nation"], r["med_lo"], r["med_hi"]) == \
        ("ZION", 2000, 3000)


# ---------------------------------------------------------------------------
# batch 17: persistence, activity corr, home bias, drift TV, deciles
# ---------------------------------------------------------------------------


def test_priority_persistence(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12pp"))
    # cust 1: U,U,L (pairs: same, diff); cust 2: single order (no
    # pairs); same-day orders ordered by orderkey
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-01-01",
                                     "2023-01-02", "2023-01-01"]),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "5-LOW", "2-HIGH"]),
        "o_totalprice": pa.array([1.0] * 4, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("priority_persistence_e4", d)
    assert (int(got["n_pairs"][0]), int(got["n_same"][0])) == (2, 1)


def test_activity_corr_and_home_bias(tmp_path_factory):
    dce = str(tmp_path_factory.mktemp("s12adc"))
    # u1: 4 events over 3 days; u2: 2 events 1 day; u3: 1 event
    rows = [(1, "2023-01-01"), (1, "2023-01-02"), (1, "2023-01-02"),
            (1, "2023-01-05"), (2, "2023-02-01"), (2, "2023-02-01"),
            (3, "2023-03-01")]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array(_us([r[1] for r in rows]), pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), os.path.join(dce, "events.parquet"))
    got = _match_oracle("activity_days_events_corr", dce)
    # x=(4,2,1), y=(3,1,1): strong positive correlation
    assert got["corr"][0] > 0.9

    d = str(tmp_path_factory.mktemp("s12shb"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["s1", "s2"]),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64()),
    }), os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["X", "X"]),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 2),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    # supp 1 (nation 0): ships order1 (cust nation 0: home) and
    # order2 (nation 1: away); supp 2: order2 only (home)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got2 = _match_oracle("supplier_home_bias", d,
                         tables=("lineitem", "supplier", "orders",
                                 "customer"))
    m = {int(r["supp_nation"]): r for _, r in got2.iterrows()}
    assert (m[0]["n_items"], m[0]["n_home"]) == (2, 1)
    assert (m[1]["n_items"], m[1]["n_home"]) == (1, 1)


def test_drift_tv_and_balance_deciles(daily12_dir, tmp_path_factory):
    got = _match_oracle("dow_profile_drift_tv", daily12_dir)
    assert 0 <= int(got["tv_e6"][0]) <= 10**6
    d = str(tmp_path_factory.mktemp("s12bdo"))
    # 10 customers, balances 1..10; only top-balance cust orders
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(1, 11)), pa.int64()),
        "c_name": pa.array(["c"] * 10),
        "c_nationkey": pa.array([0] * 10, pa.int32()),
        "c_acctbal": pa.array([float(i) for i in range(1, 11)],
                              pa.float64()),
        "c_mktsegment": pa.array(["X"] * 10),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 10], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 2),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got2 = _match_oracle("balance_decile_order_rate", d,
                         tables=("customer", "orders"))
    m = dict(zip(got2["decile"], got2["orders_e4"]))
    assert m[9] == 20000 and all(m[k] == 0 for k in range(9))


# ---------------------------------------------------------------------------
# batch 18: Gini by type, LTV corr, cross-metrics, SLA p95
# ---------------------------------------------------------------------------


def test_value_gini_and_p95(trans_dir, tmp_path_factory):
    got = _match_oracle("value_gini_by_type", trans_dir)
    # all fixture values 1.0 -> perfect equality -> gini 0 per type
    assert (got["gini_e6"] == 0).all()

    d = str(tmp_path_factory.mktemp("s12p95"))
    # 20 URGENT gaps 1..20 -> p50 = sorted[(19)//2]=sorted[9]=10,
    # p95 = sorted[19*95//100]=sorted[18]=19
    ok = list(range(1, 21))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_shipdate": pa.array(
            _us(["2023-01-%02d" % (i + 1) for i in ok]),
            pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01"] * 20),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 20),
    }), os.path.join(d, "orders.parquet"))
    got2 = _match_oracle("ship_delay_p95_by_priority", d)
    r = got2.iloc[0]
    assert (r["p50"], r["p95"]) == (10, 19)


def test_first_value_ltv_and_trend(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12fltv"))
    # cust 1: first 100 then 1,1 (total 102); cust 2: first 500 then
    # 600,700 (total 1800); cust 3: single 50 order -> first==total.
    # Also exercises value_trend: c1 k=3 h=1: first 100 vs last 1 ->
    # down; c2: 500 vs 700 -> up; c3 excluded.
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            _us(["2023-01-01", "2023-01-02", "2023-01-03",
                 "2023-01-01", "2023-01-02", "2023-01-03",
                 "2023-01-01"]), pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 1.0, 1.0, 500.0, 600.0,
                                  700.0, 50.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("first_value_ltv_corr", d)
    f = np.array([100, 500, 50], dtype=float)
    s = np.array([102, 1800, 50], dtype=float)
    ref = np.corrcoef(f, s)[0, 1]
    assert abs(got["corr"][0] - ref) < 1e-12
    got2 = _match_oracle("value_trend_sign_counts", d)
    assert (int(got2["n_up"][0]), int(got2["n_down"][0]),
            int(got2["n_flat"][0])) == (1, 1, 0)


def test_yearly_peak_and_premium_corr(daily12_dir, tmp_path_factory):
    got = _match_oracle("yearly_peak_day_share", daily12_dir)
    assert list(got["year"]) == [2023]
    assert 0 < int(got["peak_share_e4"][0]) <= 10000

    d = str(tmp_path_factory.mktemp("s12bprc"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["a", "b"]),
        "p_brand": pa.array(["B1", "B2"]),
        "p_type": pa.array(["T X Y", "T X Z"]),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([100.0, 300.0], pa.float64()),
    }), os.path.join(d, "part.parquet"))
    # B2 premium AND higher return rate -> positive corr (n=2 -> +-1)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_returnflag": pa.array(["N", "N", "R", "N"]),
    }), os.path.join(d, "lineitem.parquet"))
    got2 = _match_oracle("brand_premium_return_corr", d,
                         tables=("part", "lineitem"))
    assert abs(got2["corr"][0] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# batch 19: Siegel repeated median, full-price share, weekend ships
# ---------------------------------------------------------------------------


def test_siegel_repeated_median(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12sieg"))
    # perfect line slope 2 k$/day with ONE wild outlier day: the
    # repeated median must ignore it completely
    days = ["2023-01-%02d" % i for i in range(1, 8)]
    vals = [2000.0 * i for i in range(1, 8)]
    vals[3] = 50000.0  # outlier
    pq.write_table(pa.table({
        "o_orderdate": pa.array(_us(days), pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("siegel_repeated_median", d)
    assert abs(got["slope"][0] - 2.0) < 1e-12


def test_fullprice_and_weekend_ship(basket_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12zd"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["a", "b"]),
        "p_brand": pa.array(["B1", "B2"]),
        "p_type": pa.array(["T", "T"]),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0], pa.float64()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_discount": pa.array([0.0, 0.05, 0.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("zero_discount_share_by_brand", d,
                        tables=("lineitem", "part"))
    m = {r["brand"]: int(r["share_e4"]) for _, r in got.iterrows()}
    assert m == {"B1": 5000, "B2": 10000}

    d2 = str(tmp_path_factory.mktemp("s12ws"))
    # 2023-01-07 = Saturday (weekend), 01-09 = Monday
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-07", "2023-01-09"]),
                               pa.timestamp("us")),
    }), os.path.join(d2, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"]),
    }), os.path.join(d2, "orders.parquet"))
    got2 = _match_oracle("weekend_ship_share_by_priority", d2)
    assert int(got2["share_e4"][0]) == 5000


# ---------------------------------------------------------------------------
# batch 20: runs, switches, footrule, drift, tenure, cadence
# ---------------------------------------------------------------------------


def test_increasing_run_and_drift(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12run"))
    # cust 1 values 1,2,3,1,5: longest increasing run 3;
    # cust 2: 5,4: run 1
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, 8)), pa.int64()),
        "o_custkey": pa.array([1] * 5 + [2] * 2, pa.int64()),
        "o_orderdate": pa.array(
            _us(["2023-01-0%d" % i for i in range(1, 6)]
                + ["2023-01-01", "2023-01-02"]),
            pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 1.0, 5.0,
                                  5.0, 4.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got = _match_oracle("max_increasing_value_run", d)
    m = dict(zip(got["run_len"], got["n_customers"]))
    assert m == {3: 1, 1: 1}
    got2 = _match_oracle("tenure_spend_corr", d)
    assert -1.0 - 1e-12 <= got2["corr"][0] <= 1.0 + 1e-12

    # price drift: part 1 first 300 last 100 (down), part 2 only 1
    # shipment (excluded), part 3 same-day tie -> first 100 last 200
    dd = str(tmp_path_factory.mktemp("s12drift"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "l_shipdate": pa.array(_us(["2023-01-01", "2023-02-01",
                                    "2023-01-01", "2023-03-01",
                                    "2023-03-01"]),
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([3.0, 1.0, 9.0, 1.0, 2.0],
                                    pa.float64()),
    }), os.path.join(dd, "lineitem.parquet"))
    got3 = _match_oracle("price_drift_census", dd)
    assert (int(got3["n_up"][0]), int(got3["n_down"][0]),
            int(got3["n_flat"][0])) == (1, 1, 0)


def test_switch_footrule_cadence(trans_dir, daily12_dir,
                                 tmp_path_factory):
    got = _match_oracle("type_switch_rate", trans_dir)
    # u1: v->c, c->v, v->c (3 switches of 3 pairs); u2: v->v, v->v
    # (0 of 2); u3 none. 3/5 pairs switch.
    assert (int(got["n_pairs"][0]), int(got["n_switch"][0])) == (5, 3)
    got2 = _match_oracle("dow_rank_footrule", daily12_dir)
    assert 0 <= int(got2["footrule"][0]) <= 24

    d = str(tmp_path_factory.mktemp("s12gms"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_name": pa.array(["a"]),
        "c_nationkey": pa.array([0], pa.int32()),
        "c_acctbal": pa.array([0.0], pa.float64()),
        "c_mktsegment": pa.array(["X"]),
    }), os.path.join(d, "customer.parquet"))
    # gaps 1, 9 -> med_lo 1, med_hi 9
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderdate": pa.array(_us(["2023-01-01", "2023-01-02",
                                     "2023-01-11"]),
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    got3 = _match_oracle("gap_median_by_segment", d,
                         tables=("orders", "customer"))
    r = got3.iloc[0]
    assert (r["n_gaps"], r["med_lo"], r["med_hi"]) == (2, 1, 9)


# ---------------------------------------------------------------------------
# batch 21: value CV by type, supplier rank corr, busiest days
# ---------------------------------------------------------------------------


def test_value_cv_and_busiest(trans_dir):
    got = _match_oracle("value_cv_by_type", trans_dir)
    # all values 1.0 -> zero variance -> cv2 0 everywhere
    assert (got["cv2_e6"] == 0).all()
    got2 = _match_oracle("busiest_days_event_share", trans_dir)
    # few days -> k=1; the busiest day holds all 8 fixture events?
    # (all same day) -> share 1e4
    assert int(got2["k_days"][0]) == 1
    assert int(got2["share_e4"][0]) == 10000


def test_supplier_rank_spearman(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s12sbs"))
    # balances and volumes perfectly concordant (with a balance TIE)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "s_name": pa.array(["s"] * 4),
        "s_nationkey": pa.array([0] * 4, pa.int32()),
        "s_acctbal": pa.array([10.0, 10.0, 30.0, 40.0], pa.float64()),
    }), os.path.join(d, "supplier.parquet"))
    sk = [1] + [2] * 2 + [3] * 3 + [4] * 4
    pq.write_table(pa.table({
        "l_suppkey": pa.array(sk, pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    got = _match_oracle("supplier_balance_volume_spearman", d,
                        tables=("lineitem", "supplier"))
    # monotone up to the tie -> rho close to 1 but < 1
    assert 0.9 < got["rho"][0] <= 1.0
