"""Planted-skew stress (round-3 VERDICT #5): a hot key owning ~10% of all
rows must not collapse the salted count, phash keep-first dedup, or the
bucketed vectorized window into a straggler. Correctness is asserted
exactly; the timing bound is generous (3.5x with a 0.5 s noise floor)
because the sandbox VM shows 2-3x run-to-run variance."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from reddacted_ray.stages.dedup import dedup_group_first
from reddacted_ray.stages.windows import grouped_vectorized

ROWS = 400_000
HOT_USER = 7
HOT_PHASH = 12345


def _tables() -> tuple[pa.Table, pa.Table, int]:
    rng = np.random.default_rng(42)
    user = rng.integers(0, ROWS // 32, size=ROWS, dtype=np.int64)
    phash = rng.integers(0, ROWS // 4, size=ROWS, dtype=np.int64)
    value = rng.integers(0, 1000, size=ROWS, dtype=np.int64)
    uniform = pa.table({"user_id": user, "phash": phash, "value": value})
    hu, hp = user.copy(), phash.copy()
    hot_mask = rng.random(ROWS) < 0.10
    hu[hot_mask] = HOT_USER
    hp[hot_mask] = HOT_PHASH
    hot = pa.table({"user_id": hu, "phash": hp, "value": value})
    return uniform, hot, int(hot_mask.sum())


def _salted_counts(t: pa.Table) -> dict:
    ds = rd.from_arrow(t).repartition(16)

    def partial(b: pa.Table) -> pa.Table:
        return b.select(["user_id"]).group_by("user_id").aggregate(
            [([], "count_all")])

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id")
           .aggregate(Sum("count_all", alias_name="n")).take_all())
    return {r["user_id"]: r["n"] for r in out}


def _dedup(t: pa.Table) -> int:
    return dedup_group_first(rd.from_arrow(t).repartition(16),
                             "phash", "user_id").count()


def _window(t: pa.Table) -> int:
    def running(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.sort_values(["user_id", "value"], kind="mergesort")
        return pd.DataFrame({
            "user_id": gg["user_id"].to_numpy(),
            "rt": gg.groupby("user_id", sort=False)["value"].cumsum(),
        })

    return grouped_vectorized(rd.from_arrow(t).repartition(16),
                              "user_id", running).count()


def test_skew_correct_and_no_straggler_collapse(ray_session):
    uniform, hot, n_hot = _tables()
    assert n_hot > 0.08 * ROWS  # the plant really is ~10% of mass

    ratios = {}
    for name, fn, check in (
        ("salted_counts", _salted_counts,
         lambda r: r[HOT_USER] >= n_hot),
        ("dedup_phash_first", _dedup, lambda r: 0 < r < ROWS),
        ("bucketed_window", _window, lambda r: r == ROWS),
    ):
        t0 = time.perf_counter()
        res_u = fn(uniform)
        t_u = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_h = fn(hot)
        t_h = time.perf_counter() - t0
        assert check(res_h), name
        if name == "bucketed_window":
            assert res_u == ROWS
        # noise floor: sub-0.5 s runs are dominated by fixed costs
        ratio = t_h / max(t_u, 0.5)
        if ratio >= 3.5:
            # one retry, best-of-2 per leg: a contended-VM spike on a
            # single run must not fail the suite (2-3x variance is real)
            t0 = time.perf_counter()
            fn(uniform)
            t_u = min(t_u, time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn(hot)
            t_h = min(t_h, time.perf_counter() - t0)
            ratio = t_h / max(t_u, 0.5)
        ratios[name] = ratio

    for name, ratio in ratios.items():
        assert ratio < 3.5, f"{name} hot-key straggler: {ratios}"
