"""Property tests for the session-2 window/join kernels: hypothesis
generates small random event tables (duplicate timestamps, bursts,
negative values, singleton users) and every sampled op must hash-match
its DuckDB oracle — the same compare the driver runs, but over inputs
chosen adversarially rather than by the synthetic generator."""

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

OPS = [
    "interval_coverage",
    "time_to_purchase",
    "m4_downsample",
    "rate_limit_events",
    "running_distinct_types",
]

BASE = 1_700_000_000_000_000
TYPES = ["view", "click", "purchase", "error"]


@st.composite
def event_tables(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    users = draw(st.lists(st.integers(1, 4), min_size=n, max_size=n))
    # coarse offsets force ts collisions; spread spans minutes to days
    offs = draw(st.lists(st.integers(0, 5000), min_size=n, max_size=n))
    scale = draw(st.sampled_from([1_000_000, 60_000_000,
                                  3_600_000_000]))
    types = draw(st.lists(st.sampled_from(TYPES), min_size=n,
                          max_size=n))
    vals = draw(st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=n, max_size=n))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array([BASE + o * scale for o in offs],
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })


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


@pytest.mark.parametrize("name", OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(t=event_tables())
def test_random_events_match_oracle(ray_session, tmp_path_factory,
                                    name, t):
    import __ray_entry__ as e
    import ray.data as rd

    d = tmp_path_factory.mktemp("prop_sf")
    pq.write_table(t, os.path.join(str(d), "events.parquet"))
    qs, oq = e.queries(), e.oracle_sql()
    got = qs[name](str(d))
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM"
            f" '{d}/events.parquet'")
    exp = con.sql(oq[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    if len(exp):
        assert sorted(got.columns) == sorted(exp.columns), name
        assert _value_hash(got) == _value_hash(exp), name
