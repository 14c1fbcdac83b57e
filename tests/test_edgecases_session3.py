"""Adversarial edge-case lock for the session-3 operators: crafted
events (a user with EXACTLY 5 events, a constant-value user, ts ties,
an all-tied Mann-Whitney pool), crafted documents (reordered bag-of-
words copies, empty text, double spaces, docs straddling the 8-char
winnowing minimum), and crafted orders (rank ties in every RFM
dimension, a same-month repeat order, sub-dollar totals). Each query
must hash-match its DuckDB oracle on the crafted tables — the same
order-insensitive compare the driver runs."""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EVENT_QUERIES = [
    "bollinger_flags",
    "business_hours_overlap",
    "second_event_gap",
    "minmax_scale",
    "mannwhitney_u",
    "calendar_densify",
    "repeat_purchasers",
]
DOC_QUERIES = [
    "dedup_token_sorted",
    "winnowing_fingerprints",
]
ORDER_QUERIES = [
    "rfm_segments",
    "new_vs_returning",
    "comoment_matrix",  # lineitem-based; listed here for the lineitem fixture
]


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


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_s3")
    base = 1_700_000_000_000_000  # epoch us
    MIN = 60_000_000
    rows = [
        # user 1: EXACTLY 6 events — the 6th is the first with a full
        # 5-row trailing window; first five constant (sigma == 0, so any
        # deviation flags), plus ts ties inside the window
        (0, base, 1, "view", 5.0),
        (1, base, 1, "view", 5.0),
        (2, base + MIN, 1, "view", 5.0),
        (3, base + 2 * MIN, 1, "view", 5.0),
        (4, base + 3 * MIN, 1, "view", 5.0),
        (5, base + 4 * MIN, 1, "view", 5.01),  # outside 0-width band
        # user 2: singleton (no second_event_gap row, no full window)
        (6, base + 7 * MIN, 2, "purchase", 9.0),
        # user 3: two purchases the same day (repeat purchaser) plus a
        # second-day purchase; values ALL TIED with user 2's purchase
        (7, base + 8 * MIN, 3, "purchase", 9.0),
        (8, base + 9 * MIN, 3, "purchase", 9.0),
        (9, base + 1_440 * MIN * 3, 3, "purchase", 9.0),  # +3 days gap
        # user 4: one long activity stretch crossing a day boundary so
        # the business-hours measure clips on both ends
        (10, base + 100 * MIN, 4, "view", -2.5),  # negative value
        (11, base + 103 * MIN, 4, "view", 490.02),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(str(d), "events.parquet"))

    texts = [
        "b a a b",          # doc 0: bag {a, b}
        "a b b a a",        # doc 1: same bag -> same cluster as 0
        "",                 # doc 2: empty text (sig = '')
        "hello world xyz",  # doc 3: 8 grams, full windows from pos 4
        "short",            # doc 4: < 8 chars, excluded from winnowing
        "exactly8",         # doc 5: 1 gram, NO full window -> n_fp 0
        "a  b",             # doc 6: double space -> empty token in bag
        "b  a",             # doc 7: same bag as 6 incl. empty token
    ]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["web"] * len(texts), pa.string()),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))

    DAY = 86_400_000_000
    orows = [
        # cust 101: two orders in the SAME first month (both 'new'),
        # then one a month later ('returning'); identical totals make
        # rank ties in every RFM dimension
        (1, 101, "O", 100.005, base, "1-URGENT"),
        (2, 101, "O", 100.005, base + 2 * DAY, "1-URGENT"),
        (3, 101, "O", 50.0, base + 35 * DAY, "2-HIGH"),
        # cust 102: identical monetary/frequency profile to 103
        (4, 102, "O", 0.99, base + 1 * DAY, "3-MEDIUM"),  # 0 dollars
        (5, 103, "O", 0.99, base + 1 * DAY, "3-MEDIUM"),
        # cust 104: most recent, cheapest
        (6, 104, "F", 1.01, base + 40 * DAY, "5-LOW"),
    ]
    orders = pa.table({
        "o_orderkey": pa.array([r[0] for r in orows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orows], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in orows], pa.string()),
        "o_totalprice": pa.array([r[3] for r in orows], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in orows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in orows], pa.string()),
    })
    pq.write_table(orders, os.path.join(str(d), "orders.parquet"))

    lrows = [
        # one flag with a single row (covariance numerators all 0), one
        # flag with opposite-sign co-movement and a 0-discount row
        (1, 1, 1, 1, 1.0, 100.005, 0.0, 0.01, "A", "F", base),
        (1, 2, 1, 2, 5.0, 50.0, 0.05, 0.02, "R", "F", base),
        (2, 3, 2, 1, 10.0, 25.0, 0.10, 0.03, "R", "O", base + DAY),
        (2, 1, 2, 2, 1.0, 99.99, 0.0, 0.0, "R", "O", base + DAY),
    ]
    lineitem = pa.table({
        "l_orderkey": pa.array([r[0] for r in lrows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in lrows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in lrows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in lrows], pa.int64()),
        "l_quantity": pa.array([r[4] for r in lrows], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in lrows], pa.float64()),
        "l_discount": pa.array([r[6] for r in lrows], pa.float64()),
        "l_tax": pa.array([r[7] for r in lrows], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in lrows], pa.string()),
        "l_linestatus": pa.array([r[9] for r in lrows], pa.string()),
        "l_shipdate": pa.array([r[10] for r in lrows],
                               pa.timestamp("us")),
    })
    pq.write_table(lineitem, os.path.join(str(d), "lineitem.parquet"))
    return str(d)


def _check(name: str, crafted_dir: str) -> None:
    import ray.data as rd

    import __ray_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    got = qs[name](crafted_dir)
    if isinstance(got, (rd.Dataset, pa.Table)):
        got = got.to_pandas()
    con = duckdb.connect()
    for tbl in ("events", "documents", "orders", "lineitem"):
        p = os.path.join(crafted_dir, f"{tbl}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    exp = con.sql(oq[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    if len(exp):
        # Ray's to_pandas drops columns entirely on an all-empty
        # dataset; only compare shape/values when rows exist
        assert sorted(got.columns) == sorted(exp.columns), name
        assert _value_hash(got) == _value_hash(exp), name


@pytest.mark.parametrize("name",
                         EVENT_QUERIES + DOC_QUERIES + ORDER_QUERIES)
def test_adversarial_session3_match_oracle(ray_session, crafted_dir,
                                           name):
    _check(name, crafted_dir)
