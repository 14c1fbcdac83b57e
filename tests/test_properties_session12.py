"""Hypothesis property tests for the session-12 statistical kernels:
the histogram/doubled-rank/integer-cumulative formulations used by the
queries must agree with direct per-observation brute force on random
small samples (heavy ties included by construction).

These exercise the pure math (the part the DuckDB oracle can't
independently witness — both sides could share a wrong convention);
the pipelines themselves are oracle-locked in test_session12.py."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

samples = st.lists(st.integers(min_value=1, max_value=8),
                   min_size=2, max_size=40)


def _hist(a, b):
    qs = np.unique(np.concatenate([a, b]))
    ca = np.array([int(np.sum(a == v)) for v in qs], dtype=object)
    cb = np.array([int(np.sum(b == v)) for v in qs], dtype=object)
    return qs, ca, cb


@settings(max_examples=60, deadline=None)
@given(samples, samples)
def test_wasserstein_lattice_equals_transport(xa, xb):
    """sum_v |c1*m - c2*n| over the unit lattice == n*m * the
    sorted-quantile transport integral."""
    a, b = np.array(xa), np.array(xb)
    n, m = len(a), len(b)
    qs, ca, cb = _hist(a, b)
    lo, hi = int(qs[0]), int(qs[-1])
    fa = np.zeros(hi - lo + 1, dtype=object)
    fb = np.zeros(hi - lo + 1, dtype=object)
    fa[qs - lo] = ca
    fb[qs - lo] = cb
    c1 = np.cumsum(fa)[:-1]
    c2 = np.cumsum(fb)[:-1]
    num = int(sum(abs(c1 * m - c2 * n))) if hi > lo else 0
    # brute: L1 between upsampled quantile functions on lcm grid
    aa = np.repeat(np.sort(a), m)
    bb = np.repeat(np.sort(b), n)
    brute = int(np.abs(aa - bb).sum())
    assert num == brute


@settings(max_examples=60, deadline=None)
@given(samples, samples)
def test_brunner_munzel_histogram_equals_midranks(xa, xb):
    a, b = np.array(xa, dtype=float), np.array(xb, dtype=float)
    n, m = len(a), len(b)
    if n < 2 or m < 2:
        return
    qs, ca, cb = _hist(np.array(xa), np.array(xb))
    t = ca + cb
    below_p = np.concatenate(([0], np.cumsum(t)[:-1]))
    two_rp = 2 * below_p + t + 1
    below_a = np.concatenate(([0], np.cumsum(ca)[:-1]))
    two_ra = 2 * below_a + ca + 1
    below_b = np.concatenate(([0], np.cumsum(cb)[:-1]))
    two_rb = 2 * below_b + cb + 1
    ts2 = int(sum(cb * two_rp))
    d1 = two_rp - two_ra
    d2 = two_rp - two_rb
    b1, a1s = int(sum(ca * d1)), int(sum(ca * d1 * d1))
    b2, a2s = int(sum(cb * d2)), int(sum(cb * d2 * d2))
    p_hat = (float(ts2) / float(m) - float(m + 1)) / (2.0 * float(n))
    s1sq = (float(a1s) - float(b1) * float(b1) / float(n)) / (
        4.0 * float(n - 1))
    s2sq = (float(a2s) - float(b2) * float(b2) / float(m)) / (
        4.0 * float(m - 1))

    def midranks(vals, ref):
        lo = np.searchsorted(np.sort(ref), vals, side="left")
        hi = np.searchsorted(np.sort(ref), vals, side="right")
        return (lo + hi + 1) / 2.0

    pooled = np.concatenate([a, b])
    rp = midranks(pooled, pooled)
    r2 = rp[n:]
    ref_p = (r2.mean() - (m + 1) / 2.0) / n
    ref_s1 = np.var(rp[:n] - midranks(a, a), ddof=1)
    ref_s2 = np.var(r2 - midranks(b, b), ddof=1)
    assert abs(p_hat - ref_p) < 1e-10
    assert abs(s1sq - ref_s1) < 1e-8 * max(1.0, ref_s1)
    assert abs(s2sq - ref_s2) < 1e-8 * max(1.0, ref_s2)


@settings(max_examples=60, deadline=None)
@given(samples, samples)
def test_cvm_histogram_equals_direct(xa, xb):
    a, b = np.array(xa), np.array(xb)
    n, m = len(a), len(b)
    qs, ca, cb = _hist(a, b)
    c1 = np.cumsum(ca)
    c2 = np.cumsum(cb)
    t = ca + cb
    num = int(sum(t * (c1 * m - c2 * n) ** 2))
    # direct: sum over pooled obs of (F1 - F2)^2 at each point
    vals = np.unique(np.concatenate([a, b]))
    tv = np.array([np.sum(a == v) + np.sum(b == v) for v in vals])
    f1 = np.searchsorted(np.sort(a), vals, side="right") / n
    f2 = np.searchsorted(np.sort(b), vals, side="right") / m
    direct = float(np.sum(tv * (f1 - f2) ** 2))
    assert abs(num / float(n * n * m * m) - direct) < 1e-9


@settings(max_examples=40, deadline=None)
@given(samples, samples)
def test_hoeffding_cumulative_equals_pointwise(xa, xb):
    """The 2D-cumulative c_i and doubled midranks from the grid equal
    the per-point pairwise counts (same convention: strict both)."""
    q = np.array(xa)
    d = np.array(xb[:len(q)] + xa[:max(0, len(q) - len(xb))])[:len(q)]
    n = len(q)
    qs = np.unique(q)
    ds = np.unique(d)
    qi = {int(v): i for i, v in enumerate(qs)}
    di = {int(v): i for i, v in enumerate(ds)}
    grid = np.zeros((len(qs), len(ds)), dtype=object)
    for x, y in zip(q, d):
        grid[qi[int(x)], di[int(y)]] += 1
    cum = np.zeros((len(qs) + 1, len(ds) + 1), dtype=object)
    for i in range(len(qs)):
        for j in range(len(ds)):
            cum[i + 1, j + 1] = (cum[i, j + 1] + cum[i + 1, j]
                                 - cum[i, j] + grid[i, j])
    tx = grid.sum(axis=1)
    lessx = np.concatenate(([0], np.cumsum(tx)[:-1]))
    for i in range(len(qs)):
        r2 = 2 * int(lessx[i]) + int(tx[i]) + 1
        ref_r2 = 2 * int(np.sum(q < qs[i])) + int(np.sum(q == qs[i])) + 1
        assert r2 == ref_r2
        for j in range(len(ds)):
            if grid[i, j]:
                cc = int(cum[i, j])
                ref = int(np.sum((q < qs[i]) & (d < ds[j])))
                assert cc == ref


@settings(max_examples=60, deadline=None)
@given(samples)
def test_quartile_q4_matches_percentile_cont(xs):
    """The q4(num, den) integer quarter representation equals
    4 * numpy linear interpolation at 25/50/75."""
    v = np.sort(np.array(xs, dtype=np.int64))
    n = len(v)

    def q4(num, den):
        k, rem = divmod((n - 1) * num, den)
        r4 = rem * 4 // den
        return (4 - r4) * int(v[k]) + r4 * int(v[min(k + 1, n - 1)])

    for p, num in ((25, 1), (50, 2), (75, 3)):
        ref = 4 * np.percentile(v.astype(float), p,
                                method="linear")
        assert abs(q4(num, 4) - ref) < 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=8, max_size=60))
def test_kpss_vr_integer_forms_match_float(r):
    """KPSS and VR(5) multiplied-through integer rationals equal the
    plain float formulas."""
    n = len(r)
    S = sum(r)
    u = [n * x - S for x in r]
    den = n * sum(x * x for x in u)
    run = 0
    num = 0
    for x in u:
        run += x
        num += run * run
    arr = np.array(r, dtype=float)
    e = arr - arr.mean()
    s = np.cumsum(e)
    if np.sum(e * e) > 0:
        ref = float(np.sum(s * s)) / (n * n * (np.sum(e * e) / n))
        assert abs(num / den - ref) < 1e-9
    if n >= 6:
        w = [sum(r[t:t + 5]) for t in range(n - 4)]
        np_ = n - 4
        sw, sww = sum(w), sum(x * x for x in w)
        sr, srr = sum(r), sum(x * x for x in r)
        inum = (np_ * sww - sw * sw) * n * n
        iden = np_ * np_ * 5 * (n * srr - sr * sr)
        ww = np.convolve(arr, np.ones(5), "valid")
        if np.var(arr) > 0:
            ref_vr = np.var(ww) / (5 * np.var(arr))
            assert abs(inum / iden - ref_vr) < 1e-9
