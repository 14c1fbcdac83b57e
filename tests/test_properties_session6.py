"""Property tests for the round-5 session-4 operators: hypothesis
generates small adversarial tables (ts ties, single-user buckets,
all-equal values, missing funnel steps, gapped linenumbers, singleton
languages) and every op must hash-match its DuckDB oracle. Two ops
additionally get independent brute-force references (window funnel
chain search, per-event distinct-type recount)."""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

BASE_US = 1_704_067_200_000_000  # 2024-01-01
DAY = 86_400_000_000
HOUR = 3_600_000_000


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(repr(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()


def _run_and_compare(name, tmp_path_factory, tables):
    import ray.data as rd

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("prop6_sf")
    for tname, t in tables.items():
        pq.write_table(t, os.path.join(str(d), f"{tname}.parquet"))
    qs, oq = e.queries(), e.oracle_sql()
    got = qs[name](str(d))
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    for tname in tables:
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM"
                f" '{d}/{tname}.parquet'")
    exp = con.sql(oq[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    if len(exp):
        assert sorted(got.columns) == sorted(exp.columns), name
        assert _value_hash(got) == _value_hash(exp), name
    return got


@st.composite
def events_tables(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    users = draw(st.lists(st.integers(1, 4), min_size=n, max_size=n))
    # coarse ts: day offsets spanning >2 calendar months plus intra-day
    # microsecond offsets that collide (ts ties with event_id tiebreak)
    days = draw(st.lists(st.integers(0, 70), min_size=n, max_size=n))
    micro = draw(st.lists(st.sampled_from([0, 1, HOUR, HOUR + 1]),
                          min_size=n, max_size=n))
    types = draw(st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=n, max_size=n))
    cents = draw(st.lists(st.integers(0, 300), min_size=n, max_size=n))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array([BASE_US + d * DAY + m
                        for d, m in zip(days, micro)],
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array([c / 100.0 for c in cents], pa.float64()),
    })


EVENT_OPS = ["session_count_sensitivity", "load_factor_by_type",
             "peak_hour_window", "velocity_flags",
             "week_overlap_matrix", "user_count_five_num",
             "friedman_event_types", "window_funnel_1h",
             "rolling_distinct_types_7d", "peer_group_window_sum",
             "consecutive_dup_events", "grouped_top3_values",
             "hampel_outliers", "stickiness_by_week",
             "dau_jaccard_adjacent"]


@pytest.mark.parametrize("name", EVENT_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=events_tables())
def test_random_events_match_oracle(ray_session, tmp_path_factory,
                                    name, t):
    _run_and_compare(name, tmp_path_factory, {"events": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=events_tables())
def test_random_wilcoxon_match_oracle(ray_session, tmp_path_factory, t):
    _run_and_compare("wilcoxon_signed_rank", tmp_path_factory,
                     {"events": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=events_tables())
def test_random_energy_match_oracle(ray_session, tmp_path_factory, t):
    et = t["event_type"].to_pylist()
    assume("view" in et and "purchase" in et)
    _run_and_compare("energy_distance_drift", tmp_path_factory,
                     {"events": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=events_tables())
def test_funnel_matches_bruteforce(ray_session, tmp_path_factory, t):
    got = _run_and_compare("window_funnel_1h", tmp_path_factory,
                           {"events": t})
    df = t.to_pandas()
    df["us"] = df["ts"].astype("datetime64[us]").astype("int64")
    l1 = l2 = l3 = 0
    for _, u in df.groupby("user_id"):
        tv = sorted(u.loc[u.event_type == "view", "us"])
        tc = sorted(u.loc[u.event_type == "click", "us"])
        tp = sorted(u.loc[u.event_type == "purchase", "us"])
        if not tv:
            continue
        l1 += 1
        ok2 = any(v < c <= v + HOUR for v in tv for c in tc)
        if not ok2:
            continue
        l2 += 1
        ok3 = any(v < c <= v + HOUR and c < p <= v + HOUR
                  for v in tv for c in tc for p in tp)
        if ok3:
            l3 += 1
    assert (int(got["n_level1"][0]), int(got["n_level2"][0]),
            int(got["n_level3"][0])) == (l1, l2, l3)


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=events_tables())
def test_rolling_distinct_matches_bruteforce(ray_session,
                                             tmp_path_factory, t):
    got = _run_and_compare("rolling_distinct_types_7d",
                           tmp_path_factory, {"events": t})
    got = got.set_index("event_id")["n_types_7d"]
    df = t.to_pandas()
    df["us"] = df["ts"].astype("datetime64[us]").astype("int64")
    W = 7 * DAY
    for row in df.itertuples(index=False):
        w = df[(df.user_id == row.user_id) & (df.us >= row.us - W)
               & (df.us <= row.us)]
        assert int(got[row.event_id]) == w["event_type"].nunique()


@st.composite
def orders_tables(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    prios = draw(st.lists(st.sampled_from(["1-U", "2-H", "3-M"]),
                          min_size=n, max_size=n))
    days = draw(st.lists(st.integers(0, 40), min_size=n, max_size=n))
    cents = draw(st.lists(st.integers(1, 400), min_size=n, max_size=n))
    cust = draw(st.lists(st.integers(1, 5), min_size=n, max_size=n))
    return pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "o_orderdate": pa.array([BASE_US + d * DAY for d in days],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([c / 100.0 for c in cents],
                                 pa.float64()),
        "o_custkey": pa.array(cust, pa.int64()),
    })


ORDER_OPS = ["seasonal_mann_kendall", "gini_by_year",
             "priority_drift_by_year",
             "kruskal_wallis_priority", "jonckheere_priority",
             "cusum_changepoint_day", "top1pct_share_by_year",
             "cvar_daily_revenue", "rrf_customers"]


@pytest.mark.parametrize("name", ORDER_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=orders_tables())
def test_random_orders_match_oracle(ray_session, tmp_path_factory,
                                    name, t):
    _run_and_compare(name, tmp_path_factory, {"orders": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=orders_tables())
def test_random_durbin_match_oracle(ray_session, tmp_path_factory, t):
    days = (np.array(t["o_orderdate"].cast(pa.int64())) // DAY)
    _, counts = np.unique(days, return_counts=True)
    assume(len(np.unique(counts)) > 1)  # constant series raises by design
    _run_and_compare("durbin_watson_counts", tmp_path_factory,
                     {"orders": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=orders_tables())
def test_random_moods_match_oracle(ray_session, tmp_path_factory, t):
    cents = np.round(np.array(t["o_totalprice"]) * 100).astype(np.int64)
    s = np.sort(cents)
    n = len(s)
    m2 = int(s[(n + 1) // 2 - 1]) + int(s[n // 2])
    assume((2 * cents > m2).any() and (2 * cents <= m2).any())
    _run_and_compare("moods_median_priority", tmp_path_factory,
                     {"orders": t})


@st.composite
def lineitem_tables(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    qty = draw(st.lists(st.integers(1, 8), min_size=n, max_size=n))
    disc = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    price = draw(st.lists(st.integers(1, 300), min_size=n, max_size=n))
    flags = draw(st.lists(st.sampled_from(["A", "R"]),
                          min_size=n, max_size=n))
    okey = draw(st.lists(st.integers(1, 5), min_size=n, max_size=n))
    # linenumbers: mostly 1..k per order but hypothesis may plant any
    # values -> gaps and duplicates occur naturally
    lns = draw(st.lists(st.integers(1, 6), min_size=n, max_size=n))
    return pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_linenumber": pa.array(lns, pa.int32()),
        "l_quantity": pa.array([float(q) for q in qty], pa.float64()),
        "l_discount": pa.array([d / 100.0 for d in disc], pa.float64()),
        "l_tax": pa.array([d / 100.0 for d in disc], pa.float64()),
        "l_linestatus": pa.array(flags, pa.string()),
        "l_extendedprice": pa.array([p / 1.0 for p in price],
                                    pa.float64()),
        "l_returnflag": pa.array(flags, pa.string()),
    })


LINE_OPS = ["qn_quantity", "spearman_footrule", "linenumber_gap_audit",
            "hodges_lehmann_quantity", "effective_tax_by_status",
            "qn_by_flag"]


@pytest.mark.parametrize("name", LINE_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_random_lineitem_match_oracle(ray_session, tmp_path_factory,
                                      name, t):
    _run_and_compare(name, tmp_path_factory, {"lineitem": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_random_spearman_by_flag_match_oracle(ray_session,
                                              tmp_path_factory, t):
    df = t.to_pandas()
    q = np.round(df["l_quantity"] * 100)
    p = np.round(df["l_extendedprice"] * 100)
    for _, sub in df.assign(q=q, p=p).groupby("l_returnflag"):
        assume(sub["q"].nunique() > 1 and sub["p"].nunique() > 1)
    _run_and_compare("spearman_by_flag", tmp_path_factory,
                     {"lineitem": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_random_gk_gamma_match_oracle(ray_session, tmp_path_factory, t):
    q = np.array(t["l_quantity"])
    d = np.round(np.array(t["l_discount"]) * 100).astype(int)
    conc = any((q[j] > q[i]) and (d[j] != d[i])
               for i in range(len(q)) for j in range(len(q)))
    assume(conc)
    _run_and_compare("gk_gamma_qty_discount", tmp_path_factory,
                     {"lineitem": t})


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_random_kendall_by_flag_match_oracle(ray_session,
                                             tmp_path_factory, t):
    df = t.to_pandas()
    for _, sub in df.groupby("l_returnflag"):
        # tau-b denominator needs variety on both axes within EVERY flag
        assume(sub["l_quantity"].round().nunique() > 1)
        assume((sub["l_discount"] * 100).round().nunique() > 1)
    _run_and_compare("kendall_by_flag", tmp_path_factory,
                     {"lineitem": t})


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_hl_matches_bruteforce(ray_session, tmp_path_factory, t):
    got = _run_and_compare("hodges_lehmann_quantity", tmp_path_factory,
                           {"lineitem": t})
    v = np.round(np.array(t["l_quantity"])).astype(np.int64)
    n = len(v)
    sums = sorted(int(v[i]) + int(v[j])
                  for i in range(n) for j in range(i + 1, n))
    kk = (len(sums) + 1) // 2
    assert int(got["hl_x2"][0]) == sums[kk - 1]


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_qn_matches_bruteforce(ray_session, tmp_path_factory, t):
    got = _run_and_compare("qn_quantity", tmp_path_factory,
                           {"lineitem": t})
    v = np.round(np.array(t["l_quantity"])).astype(np.int64)
    n = len(v)
    diffs = sorted(abs(int(v[i]) - int(v[j]))
                   for i in range(n) for j in range(i + 1, n))
    kk = (n // 2 + 1) * (n // 2) // 2
    assert int(got["qn"][0]) == diffs[kk - 1]


_DOC_ALPHABET = "ab the der le el window spark 的"


@st.composite
def documents_tables(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    langs = draw(st.lists(st.sampled_from(["en", "de", "fr"]),
                          min_size=n, max_size=n))
    srcs = draw(st.lists(st.sampled_from(["s1", "s2"]),
                         min_size=n, max_size=n))
    texts = draw(st.lists(
        st.text(alphabet=_DOC_ALPHABET, min_size=0, max_size=60),
        min_size=n, max_size=n))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })


DOC_OPS = ["length_gate_by_lang", "cross_source_dup_matrix",
           "rule_router_counts", "kwic_window", "dedup_suffix",
           "langid_margin_hist", "lang_half_consistency",
           "source_common_prefix", "dedup_normalized",
           "lang_tv_distance_pairs", "split_leakage_audit",
           "heaps_law_points"]


@pytest.mark.parametrize("name", DOC_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=documents_tables())
def test_random_documents_match_oracle(ray_session, tmp_path_factory,
                                       name, t):
    _run_and_compare(name, tmp_path_factory, {"documents": t})
