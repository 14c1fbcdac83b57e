"""Round-5 session-4 operators: rank-test family (Kruskal-Wallis,
Wilcoxon signed-rank, Friedman), Durbin-Watson, Goodman-Kruskal gamma.

Each op is verified against its DuckDB oracle on an ADVERSARIAL
fixture: cross-group rank ties, users whose even/odd-month spends
cancel exactly (d = 0 drops), weekday cells with a missing treatment
(coalesce-0 rank path), tied daily counts, and ordinal cells tied on
one axis (neither concordant nor discordant)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BATCH8 = [
    "kruskal_wallis_priority",
    "wilcoxon_signed_rank",
    "durbin_watson_counts",
    "gk_gamma_qty_discount",
    "friedman_event_types",
    "partial_corr_qty_price",
    "hampel_outliers",
    "window_funnel_1h",
    "energy_distance_drift",
    "peer_group_window_sum",
    "rolling_distinct_types_7d",
    "jonckheere_priority",
    "moods_median_priority",
    "grouped_top3_values",
    "qn_quantity",
    "top1pct_share_by_year",
    "rrf_customers",
    "consecutive_dup_events",
    "cvar_daily_revenue",
    "spearman_footrule",
    "dau_jaccard_adjacent",
    "cusum_changepoint_day",
    "session_count_sensitivity",
]


def _vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort")
    body = "|".join(
        ",".join(repr(x) for x in df[c].tolist()) for c in df.columns
    )
    return hashlib.md5(body.encode()).hexdigest()


@pytest.fixture(scope="module")
def batch8_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch8"))
    # orders: rank ties ACROSS priorities (same totalprice in 1-URGENT
    # and 2-HIGH), a singleton priority group, tied daily counts plus
    # one heavy day (DW denominator nonzero, numerator mixes 0 and big
    # first differences)
    DAY = 86_400_000_000
    base = 1_600_000_000_000_000
    prio = ["1-URGENT", "2-HIGH", "1-URGENT", "2-HIGH", "3-MEDIUM",
            "3-MEDIUM", "4-LOW", "4-LOW", "5-LOW", "1-URGENT"]
    price = [100.00, 100.00, 250.50, 99.99, 100.00,
             300.25, 42.42, 42.42, 7.77, 100.00]
    day_of = [0, 0, 0, 1, 1, 2, 2, 2, 2, 3]
    pq.write_table(pa.table({
        "o_orderpriority": pa.array(prio, pa.string()),
        "o_totalprice": pa.array(price, pa.float64()),
        "o_orderdate": pa.array([base + DAY * k for k in day_of],
                                pa.timestamp("us")),
        # custkey 7 ranks 1st by count (4 orders) but mid by spend;
        # 5 ranks 1st by spend on one order (rrf fusion disagreement)
        "o_custkey": pa.array([7, 7, 3, 3, 7, 5, 2, 2, 9, 7],
                              pa.int64()),
    }), os.path.join(d, "orders.parquet"))
    # events: user 1 cancels exactly (d = 0, must drop); users 2/3 tie
    # on |d| with opposite signs (pooled-tie doubled ranks); user 4 has
    # only even-month events; weekday x type grid leaves one type
    # absent on one weekday (coalesce-0 Friedman cell) and plants a
    # within-block tie of cell sums
    JAN = 1_704_067_200_000_000   # 2024-01-01 (even month idx 648)
    FEB = 1_706_745_600_000_000   # 2024-02-01 (odd month idx 649)
    HOUR = 3_600_000_000
    ev = [
        (JAN, 1, "view", 5.00), (FEB, 1, "click", 5.00),
        (JAN, 2, "view", 9.00), (FEB, 2, "click", 2.00),
        (JAN, 3, "click", 2.00), (FEB, 3, "view", 9.00),
        (JAN, 4, "purchase", 1.23),
        (JAN + DAY, 5, "view", 3.00), (FEB + DAY, 5, "view", 4.00),
        # same weekday, two types with EQUAL cell sums (in-block tie)
        (JAN + 2 * DAY, 6, "view", 7.00),
        (JAN + 2 * DAY, 6, "click", 7.00),
        # funnel edges: user 7 click at the EXACT +1h boundary
        # (included) but purchase 1us past it (level 2 only); user 8
        # click at the SAME ts as its view (strict > excludes it, a
        # later in-window click rescues) then purchase in-window
        # (level 3); user 9 has a huge value spike (Hampel flag)
        (JAN + 3 * DAY, 7, "view", 1.00),
        (JAN + 3 * DAY + HOUR, 7, "click", 1.00),
        (JAN + 3 * DAY + HOUR + 1, 7, "purchase", 1.00),
        (JAN + 4 * DAY, 8, "view", 1.00),
        (JAN + 4 * DAY, 8, "click", 1.00),
        (JAN + 4 * DAY + 50, 8, "click", 1.00),
        (JAN + 4 * DAY + 100, 8, "purchase", 1.00),
        (JAN + 5 * DAY, 9, "view", 1.00),
        (JAN + 5 * DAY + 1, 9, "view", 480.00),
        (JAN + 5 * DAY + 2, 9, "view", 1.00),
        (JAN + 5 * DAY + 3, 9, "view", 1.00),
        (JAN + 5 * DAY + 4, 9, "view", 1.00),
        # 7d RANGE boundary probes (non-funnel types): user 10's view2
        # at exactly +7d still sees the error (inclusive bound); the
        # scroll 1us later drops it
        (JAN + 6 * DAY, 10, "error", 1.00),
        (JAN + 13 * DAY, 10, "scroll", 1.00),
        (JAN + 13 * DAY + 1, 10, "scroll", 1.00),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(ev))), pa.int64()),
        "ts": pa.array([r[0] for r in ev], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in ev], pa.int64()),
        "event_type": pa.array([r[2] for r in ev], pa.string()),
        "value": pa.array([r[3] for r in ev], pa.float64()),
    }), os.path.join(d, "events.parquet"))
    # lineitem: ties on one axis only (same qty, different discount and
    # vice versa), a fully concordant and a fully discordant pair; two
    # return flags, each with variance in qty/price/discount (partial
    # correlation denominators nonzero)
    qty = [1.0, 1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 4.0]
    dsc = [0.00, 0.05, 0.05, 0.05, 0.10, 0.00, 0.08, 0.02]
    prc = [10.0, 25.5, 14.0, 99.9, 55.0, 120.0, 80.0, 33.3]
    flg = ["A", "A", "A", "A", "R", "R", "R", "R"]
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_discount": pa.array(dsc, pa.float64()),
        "l_extendedprice": pa.array(prc, pa.float64()),
        "l_returnflag": pa.array(flg, pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH8)
def test_batch8_match_oracle(ray_session, batch8_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch8_dir)
    if isinstance(got, (rd.Dataset,)):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch8_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_wilcoxon_drops_zero_diff(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = e.queries()["wilcoxon_signed_rank"](batch8_dir).to_pandas()
    # hand-computed cent diffs: u1 = 500-500 = 0 (drops), u2 = +700,
    # u3 = -700, u4 = +123, u5 = 300-400 = -100, u6 = +1400,
    # u7 = +300, u8 = +400, u9 = +48400, u10 = +300 (all-January)
    assert int(out["n_pos"][0]) == 7
    assert int(out["n_neg"][0]) == 2


def test_kruskal_doubled_ranks_are_integers(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = (e.queries()["kruskal_wallis_priority"](batch8_dir)
           .to_pandas().sort_values("o_orderpriority"))
    n = int(out["n_rows"].sum())
    # sum of doubled ranks over ALL rows = 2 * (1 + ... + n) = n(n+1)
    assert int(out["two_rank_sum"].sum()) == n * (n + 1)


def test_friedman_block_rank_sums(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = e.queries()["friedman_event_types"](batch8_dir).to_pandas()
    k = len(out)  # treatments
    # each block contributes k(k+1) doubled rank mass; blocks = distinct
    # weekdays in the fixture
    ev = pq.read_table(os.path.join(batch8_dir, "events.parquet"))
    us = ev["ts"].cast(pa.int64()).to_numpy()
    blocks = len(np.unique((us // 86_400_000_000 + 4) % 7))
    assert int(out["two_rank_sum"].sum()) == blocks * k * (k + 1)


BATCH9 = [
    "length_gate_by_lang",
    "cross_source_dup_matrix",
    "rolling_corr_30d",
    "stickiness_by_week",
    "rule_router_counts",
    "kwic_window",
    "pii_joint_counts",
    "brand_triples_top",
    "langid_margin_hist",
    "dedup_suffix",
    "median_norm_by_label",
    "lang_half_consistency",
    "linenumber_gap_audit",
    "source_common_prefix",
    "dedup_normalized",
]


@pytest.fixture(scope="module")
def batch9_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("batch9"))
    # documents: a singleton lang (lo == hi == v, kept == 1), a lang
    # whose p05 rank lands exactly on a tie run; prefix-40 dups within
    # one source, across two sources, and a triple spanning three
    pad = "x" * 45
    docs = [
        (1, pad + " alpha", "en", "s1"),
        (2, pad + " beta", "en", "s1"),      # same prefix as doc 1 (s1,s1)
        (3, pad + " gamma", "en", "s2"),     # and cross (s1,s2)
        (4, "y" * 50, "en", "s2"),
        (5, "z" * 44 + " one", "en", "s1"),
        (6, "z" * 44 + " two", "en", "s3"),  # (s1,s3)
        (7, "unique doc seven", "en", "s3"),
        (8, "short", "fr", "s1"),            # singleton lang
        # router/kwic probes: doc 9 matches kwic with full 2+2 context,
        # doc 10 hits the 'relational' rule, doc 11 matches BOTH spark
        # and window (first-match precedence -> spark), doc 12 has the
        # keyword at text start (0-word left context)
        (9, "aa bb window cc dd ee", "en", "s2"),
        (10, "agg join heavy lifting", "en", "s3"),
        (11, "spark and window both", "en", "s1"),
        (12, "window leads here", "fr", "s2"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array([r[2] for r in docs], pa.string()),
        "source": pa.array([r[3] for r in docs], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    # orders: 32 consecutive days with varying counts and prices so
    # rolling_corr_30d emits 3 full windows with nonzero variances
    DAY = 86_400_000_000
    base = 1_500_000_000_000_000
    rows_t, rows_p = [], []
    for day in range(32):
        for j in range((day % 5) + 1):
            rows_t.append(base + DAY * day)
            rows_p.append(100.0 + 7.0 * ((day * 3 + j) % 11))
    pq.write_table(pa.table({
        "o_orderdate": pa.array(rows_t, pa.timestamp("us")),
        "o_totalprice": pa.array(rows_p, pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    # events: two epoch-weeks; user 1 active 3 days in week A, users
    # 1+2 active same single day in week B (dau 2, days 1, wau 2)
    wk_base = (base // (7 * DAY)) * (7 * DAY)  # week-aligned
    ev_ts = [wk_base, wk_base + DAY, wk_base + 2 * DAY,
             wk_base + DAY,                       # dup (user,day) pair
             wk_base + 8 * DAY, wk_base + 8 * DAY]
    ev_u = [1, 1, 1, 1, 1, 2]
    pq.write_table(pa.table({
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(ev_u, pa.int64()),
    }), os.path.join(d, "events.parquet"))
    # baskets: order 1 spans brands B1..B4 across two line rows of the
    # same part (distinct dedup), order 2 repeats {B1,B2,B3} (the
    # winning triple, count 2), order 3 has only two brands (no triple)
    lp = [(1, 11), (1, 11), (1, 12), (1, 13), (1, 14),
          (2, 11), (2, 12), (2, 13),
          (3, 11), (3, 14)]
    # linenumbers: order 1 contiguous 1..5; order 2 has a GAP (1,2,4);
    # order 3 duplicates-with-hole (1,1) — spoof-proof exact check
    lns = [1, 2, 3, 4, 5, 1, 2, 4, 1, 1]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in lp], pa.int64()),
        "l_partkey": pa.array([r[1] for r in lp], pa.int64()),
        "l_linenumber": pa.array(lns, pa.int32()),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([11, 12, 13, 14], pa.int64()),
        "p_brand": pa.array(["B1", "B2", "B3", "B4"], pa.string()),
    }), os.path.join(d, "part.parquet"))
    # embeddings: label 0 has an EVEN count (discrete lower-median
    # selection), label 1 odd; float32 values whose double squares sum
    # non-trivially (sequential-order parity probe)
    vecs = [([0.5, 1.25, -0.75], 0), ([1.0, 0.0, 2.0], 0),
            ([0.1, 0.2, 0.3], 0), ([2.5, -1.5, 0.5], 0),
            ([1.1, 1.2, 1.3], 1), ([0.0, 0.0, 0.0], 1),
            ([3.0, 4.0, 0.0], 1)]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v for v, _ in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([l for _, l in vecs], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH9)
def test_batch9_match_oracle(ray_session, batch9_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch9_dir)
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events", "documents", "lineitem", "part",
              "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch9_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _vhash(got) == _vhash(exp), name


def test_dup_matrix_planted_pairs(ray_session, batch9_dir):
    import __ray_entry__ as e

    out = e.queries()["cross_source_dup_matrix"](batch9_dir).to_pandas()
    m = {(a, b): n for a, b, n in
         zip(out["src_a"], out["src_b"], out["n_shared"])}
    assert m == {("s1", "s1"): 1, ("s1", "s2"): 1, ("s1", "s3"): 1}


def test_stickiness_hand_check(ray_session, batch9_dir):
    import __ray_entry__ as e

    out = (e.queries()["stickiness_by_week"](batch9_dir)
           .to_pandas().sort_values("week").reset_index(drop=True))
    assert len(out) == 2
    # week A: user 1 on 3 distinct days -> dau 3, days 3, wau 1
    assert (int(out["dau_sum"][0]), int(out["days_obs"][0]),
            int(out["wau"][0])) == (3, 3, 1)
    # week B: two users one day -> dau 2, days 1, wau 2
    assert (int(out["dau_sum"][1]), int(out["days_obs"][1]),
            int(out["wau"][1])) == (2, 1, 2)
    assert out["stickiness"][1] == pytest.approx(1.0)


def test_brand_triples_hand_check(ray_session, batch9_dir):
    import __ray_entry__ as e

    out = (e.queries()["brand_triples_top"](batch9_dir)
           .to_pandas().sort_values("n", ascending=False)
           .reset_index(drop=True))
    # (B1,B2,B3) appears in orders 1 and 2; the other three triples of
    # order 1 appear once
    assert (out["b1"][0], out["b2"][0], out["b3"][0], int(out["n"][0])) \
        == ("B1", "B2", "B3", 2)
    assert len(out) == 4


def test_window_funnel_levels(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = e.queries()["window_funnel_1h"](batch8_dir).to_pandas()
    # l1: users 1,2,3,5,6,7,8,9 have a view; l2: only 7 (click at the
    # exact +1h boundary) and 8 (same-ts click excluded, +50us click
    # rescues); l3: only 8 (7's purchase is 1us past the window)
    assert int(out["n_level1"][0]) == 8
    assert int(out["n_level2"][0]) == 2
    assert int(out["n_level3"][0]) == 1


def test_hampel_flags_planted_spike(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = e.queries()["hampel_outliers"](batch8_dir).to_pandas()
    # user 9's 480.00 spike sits amid 1.00s -> flagged
    assert 9 in set(out["user_id"].tolist())


def test_rolling_distinct_range_boundary(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = e.queries()["rolling_distinct_types_7d"](batch8_dir).to_pandas()
    ev = pq.read_table(os.path.join(batch8_dir, "events.parquet")
                       ).to_pandas()
    u10 = ev[ev["user_id"] == 10].sort_values("ts")
    ids = u10["event_id"].tolist()
    got = out.set_index("event_id")["n_types_7d"]
    # error alone; scroll at exactly +7d sees error (inclusive RANGE);
    # scroll at +7d+1us no longer does
    assert [int(got[i]) for i in ids] == [1, 2, 1]


def test_consecutive_dups_hand_check(ray_session, batch8_dir):
    import __ray_entry__ as e

    out = (e.queries()["consecutive_dup_events"](batch8_dir)
           .to_pandas().set_index("user_id"))
    # user 9: five views in a row -> 4 adjacent repeats; user 8's two
    # consecutive clicks -> 1
    assert int(out.loc[9, "n_dup_adjacent"]) == 4
    assert int(out.loc[8, "n_dup_adjacent"]) == 1


def test_write_ipc_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from reddacted_ray.sources.tables import read_ipc, write_ipc

    ds = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
        "b": pa.array(["x", "y", "z"], pa.string()),
    }))
    out = str(tmp_path / "ipc")
    n = write_ipc(ds, out)
    assert n == 3
    back = read_ipc(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["b"].tolist() == ["x", "y", "z"]
    # append hazard: refuse a non-empty dir
    with pytest.raises(ValueError, match="non-empty"):
        write_ipc(ds, out)


def test_linenumber_audit_hand_check(ray_session, batch9_dir):
    import __ray_entry__ as e

    out = e.queries()["linenumber_gap_audit"](batch9_dir).to_pandas()
    # order 1 clean; order 2 gap; order 3 duplicate-with-hole
    assert int(out["n_orders"][0]) == 3
    assert int(out["n_violations"][0]) == 2


def test_durbin_watson_constant_series_raises(ray_session, tmp_path):
    import __ray_entry__ as e

    d = str(tmp_path)
    DAY = 86_400_000_000
    base = 1_600_000_000_000_000
    pq.write_table(pa.table({
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
        "o_totalprice": pa.array([1.0] * 4, pa.float64()),
        "o_orderdate": pa.array(
            [base, base, base + DAY, base + DAY], pa.timestamp("us")),
    }), os.path.join(d, "orders.parquet"))
    with pytest.raises(ValueError, match="constant daily-count"):
        e.queries()["durbin_watson_counts"](d)


def test_write_ipc_empty_dataset(ray_session, tmp_path):
    """All-empty input: the sink returns 0, creates no part files, and
    the dir stays reusable (no stale append hazard)."""
    import ray.data as rd

    from reddacted_ray.sources.tables import write_ipc

    ds = rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()),
    }))
    out = str(tmp_path / "ipc_empty")
    assert write_ipc(ds, out) == 0
    assert os.listdir(out) == []
