"""Adversarial edge-case lock for the session-2 event operators: a
hand-crafted events table with ts TIES inside a user, singleton users,
a user with views but no purchase, equal-value runs, and a user active
on exactly one day — each query must still hash-match its DuckDB oracle
(the same order-insensitive compare the driver runs)."""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = [
    "interval_coverage",
    "gini_impurity_users",
    "grouped_outliers",
    "window_join_counts",
    "grouped_winsorize",
    "centered_median",
    "activity_bitmask",
    "gap_histogram",
    "running_distinct_types",
    "rate_limit_events",
    "running_var_num",
    "churn_flags",
    "time_to_purchase",
    "user_type_set",
    "weekday_profile",
    "ks_drift",
    "late_event_filter",
    "record_events",
    "max_drawdown",
    "longest_value_run",
    "attribution_last_touch",
    "spend_decile_flow",
    "asof_recent_error",
    "grouped_mad",
    "allocate_slots",
    "top_movers",
    "event_type_distances",
    "running_var_num",
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
    d = tmp_path_factory.mktemp("adversarial_sf")
    base = 1_700_000_000_000_000  # epoch us
    MIN = 60_000_000
    rows = [
        # user 1: ts TIES (3 events at the identical timestamp), then a
        # purchase much later (tests tie-handling in every window op)
        (0, base, 1, "view", 10.0),
        (1, base, 1, "click", 10.0),
        (2, base, 1, "view", 10.005),  # rounds to 1001 cents (tie-away)
        (3, base + 90 * MIN, 1, "purchase", 55.5),
        # user 2: singleton (one event only)
        (4, base + 5 * MIN, 2, "view", 0.0),
        # user 3: views but NO purchase; equal values throughout
        (5, base + 1 * MIN, 3, "view", 7.0),
        (6, base + 2 * MIN, 3, "view", 7.0),
        (7, base + 3 * MIN, 3, "error", 7.0),
        # user 4: burst exceeding the rate limit inside one window,
        # spanning a day boundary for the bitmask/churn ops
        (8, base + 10 * MIN, 4, "click", 1.25),
        (9, base + 11 * MIN, 4, "click", 2.25),
        (10, base + 12 * MIN, 4, "click", 3.25),
        (11, base + 13 * MIN, 4, "click", 4.25),
        (12, base + 13 * MIN, 4, "purchase", -4.25),  # negative value
        (13, base + 10 * 1_440 * MIN, 4, "view", 100.0),  # +10 days
    ]
    # user 5: a dense run of identical views + one extreme value so the
    # 3-sigma grouped-outlier path emits rows (a tiny group can never
    # exceed 2 sigma — the outlier needs mass behind it)
    rows += [(14 + i, base + (20 + i) * MIN, 5, "view", 5.0)
             for i in range(30)]
    rows.append((44, base + 51 * MIN, 5, "view", 500.0))
    # user 1 again: an error then a click 10 minutes later, so the
    # tolerance-bounded as-of has at least one in-window match
    rows.append((45, base + 10 * MIN, 1, "error", 3.0))
    rows.append((46, base + 20 * MIN, 1, "click", 4.0))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(str(d), "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_events_match_oracle(ray_session, crafted_dir, name):
    import __ray_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    got = qs[name](crafted_dir)
    import ray.data as rd

    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM"
            f" '{crafted_dir}/events.parquet'")
    exp = con.sql(oq[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    if len(exp):
        # Ray's to_pandas drops columns entirely on an all-empty
        # dataset; only compare shape/values when rows exist
        assert sorted(got.columns) == sorted(exp.columns), name
        assert _value_hash(got) == _value_hash(exp), name
