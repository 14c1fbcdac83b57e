"""Property tests for the session-5 statistics/text operators:
hypothesis generates small adversarial tables (tied medians, monotone
runs, singleton segments, negative balances, empty/unicode docs,
degenerate quartiles) and every op must hash-match its DuckDB oracle —
the driver's compare over inputs the synthetic generator never emits."""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE_DAY = 8766  # ~1994-01 in days-since-epoch


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


@st.composite
def orders_tables(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    # coarse day offsets force duplicate days (rollup ties) and tied
    # median values; years span 1993-1997 for the paired-year tests
    days = draw(st.lists(st.integers(0, 1500), min_size=n, max_size=n))
    cents = draw(st.lists(st.integers(1, 500), min_size=n, max_size=n))
    cust = draw(st.lists(st.integers(1, 6), min_size=n, max_size=n))
    return pa.table({
        "o_orderkey": pa.array(
            [3 * i + 1 for i in range(n)], pa.int64()),
        "o_orderdate": pa.array(
            np.array([(BASE_DAY + d) * 86_400_000_000 for d in days],
                     dtype="datetime64[us]").astype("datetime64[us]"),
            pa.timestamp("us")),
        "o_totalprice": pa.array([c / 100.0 for c in cents],
                                 pa.float64()),
        "o_custkey": pa.array(cust, pa.int64()),
    })


ORDER_OPS = ["runs_test_daily", "ordinal_patterns", "theil_sen_slope",
             "mcnemar_years", "cochran_q_years",
             "monetary_unit_sample", "bootstrap_means"]


@pytest.mark.parametrize("name", ORDER_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=orders_tables())
def test_random_orders_match_oracle(ray_session, tmp_path_factory,
                                    name, t):
    _run_and_compare(name, tmp_path_factory, {"orders": t})


@st.composite
def customer_tables(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    segs = draw(st.lists(st.sampled_from(["A", "B", "C"]),
                         min_size=n, max_size=n))
    # negative balances + exact ties; singleton segments happen often
    bal = draw(st.lists(st.integers(-500, 500), min_size=n,
                        max_size=n))
    return pa.table({
        "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
        "c_mktsegment": pa.array(segs, pa.string()),
        "c_acctbal": pa.array([b / 100.0 for b in bal], pa.float64()),
    })


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=customer_tables())
def test_random_gmd_match_oracle(ray_session, tmp_path_factory, t):
    _run_and_compare("gmd_by_segment", tmp_path_factory,
                     {"customer": t})


# ASCII + a couple of CJK chars (identity under lower() on BOTH
# engines; the known U+0130 simple-case divergence is out of scope)
_DOC_ALPHABET = "ab e.!?x0  的是"


@st.composite
def documents_tables(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    langs = draw(st.lists(st.sampled_from(["en", "de", "zh"]),
                          min_size=n, max_size=n))
    srcs = draw(st.lists(st.sampled_from(["web", "cc"]),
                         min_size=n, max_size=n))
    texts = draw(st.lists(
        st.text(alphabet=_DOC_ALPHABET, min_size=0, max_size=30),
        min_size=n, max_size=n))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


DOC_OPS = ["readability_by_lang", "chao1_vocab",
           "simpson_diversity_by_lang", "effective_sources_e4",
           "span_corruption_stats", "tokenizer_oov_rate",
           "dup_rate_by_source"]


@pytest.mark.parametrize("name", DOC_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=documents_tables())
def test_random_documents_match_oracle(ray_session, tmp_path_factory,
                                       name, t):
    _run_and_compare(name, tmp_path_factory, {"documents": t})


@st.composite
def lineitem_tables(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    flags = draw(st.lists(st.sampled_from(["A", "N", "R"]),
                          min_size=n, max_size=n))
    qty = draw(st.lists(st.integers(1, 50), min_size=n, max_size=n))
    price = draw(st.lists(st.integers(100, 99999), min_size=n,
                          max_size=n))
    return pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "l_quantity": pa.array([float(q) for q in qty], pa.float64()),
        "l_extendedprice": pa.array([p / 1.0 for p in price],
                                    pa.float64()),
    })


LI_OPS = ["iqr_outliers_by_flag", "grouped_regr_by_flag"]


@pytest.mark.parametrize("name", LI_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=lineitem_tables())
def test_random_lineitem_match_oracle(ray_session, tmp_path_factory,
                                      name, t):
    _run_and_compare(name, tmp_path_factory, {"lineitem": t})


def _run_and_compare(name, tmp_path_factory, tables):
    import ray.data as rd

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("prop5_sf")
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
