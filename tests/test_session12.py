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
