"""grouped_vectorized + as-of join unit tests (round-3 additions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_grouped_vectorized_matches_map_groups(ray_session):
    """Bucketed kernel == per-group map_groups for a grouped cumsum,
    including the string-key hash path."""
    from reddacted_ray.stages.windows import grouped_vectorized

    rng = np.random.RandomState(5)
    n = 2000
    t = pa.table(
        {
            "k": pa.array([f"u{int(v)}" for v in rng.randint(0, 300, n)]),
            "ord": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.randint(0, 100, n).astype(np.int64)),
        }
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "ord"], kind="mergesort")
        return pd.DataFrame(
            {
                "k": g["k"],
                "ord": g["ord"],
                "cum": g.groupby("k", sort=False)["v"].cumsum(),
            }
        )

    got = (
        grouped_vectorized(rd.from_arrow(t), "k", kernel, n_buckets=16)
        .to_pandas().sort_values(["k", "ord"]).reset_index(drop=True)
    )
    ref = (
        t.to_pandas().sort_values(["k", "ord"])
        .assign(cum=lambda d: d.groupby("k")["v"].cumsum())
        [["k", "ord", "cum"]].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_asof_join_backward_basic(ray_session):
    from reddacted_ray.stages.joins import asof_join_backward

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        ["2024-01-01 10:00", "2024-01-01 12:00",
                         "2024-01-01 10:00", "2024-01-01 09:00"]
                    ),
                    pa.timestamp("us"),
                ),
                "lid": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        ["2024-01-01 09:00", "2024-01-01 11:00",
                         "2024-01-01 10:00"]
                    ),
                    pa.timestamp("us"),
                ),
                "rv": pa.array([7.0, 8.0, 9.0], pa.float64()),
            }
        )
    )
    out = (
        asof_join_backward(left, right, "k", "ts", ["rv"], n_buckets=4)
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    # k=1@10:00 -> 7 (09:00), k=1@12:00 -> 8 (11:00, latest <= 12:00),
    # k=2@10:00 -> 9 (exact match allowed), k=3 -> no right rows -> NaN
    assert out["rv"].tolist()[:3] == [7.0, 8.0, 9.0]
    assert np.isnan(out["rv"].iloc[3])
    assert out["lid"].dtype == np.int64  # left dtypes survive the union


def test_asof_join_empty_right(ray_session):
    from reddacted_ray.stages.joins import asof_join_backward

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(["2024-01-01", "2024-01-02"]),
                    pa.timestamp("us"),
                ),
                "lid": pa.array([1, 2], pa.int64()),
            }
        )
    )
    right_empty = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "rv": pa.array([], pa.float64()),
            }
        )
    )
    out = asof_join_backward(left, right_empty, "k", "ts", ["rv"]).to_pandas()
    assert len(out) == 2 and out["rv"].isna().all()
    assert out["lid"].dtype == np.int64


def test_asof_join_empty_left(ray_session):
    from reddacted_ray.stages.joins import asof_join_backward

    left_empty = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "lid": pa.array([], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "ts": pa.array(pd.to_datetime(["2024-01-01"]), pa.timestamp("us")),
                "rv": pa.array([7.0], pa.float64()),
            }
        )
    )
    out = asof_join_backward(left_empty, right, "k", "ts", ["rv"]).to_pandas()
    assert len(out) == 0


def test_grouped_vectorized_single_hot_key(ray_session):
    """A single hot key lands wholly in one bucket — result must still be
    a correct global cumsum for that key."""
    from reddacted_ray.stages.windows import grouped_vectorized

    n = 5000
    t = pa.table(
        {
            "k": pa.array(np.zeros(n, dtype=np.int64)),
            "ord": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        }
    )

    def kernel(g):
        g = g.sort_values(["k", "ord"], kind="mergesort")
        return pd.DataFrame(
            {"ord": g["ord"], "cum": g.groupby("k", sort=False)["v"].cumsum()}
        )

    out = grouped_vectorized(rd.from_arrow(t), "k", kernel).to_pandas()
    out = out.sort_values("ord").reset_index(drop=True)
    assert out["cum"].tolist() == list(range(1, n + 1))


def test_rarest_term_join_path_equals_broadcast(ray_session, monkeypatch):
    """The web-scale DF hash-join path must produce the same result as the
    bounded-vocabulary broadcast path."""
    from reddacted_ray.pipelines import queries as Q

    base = (
        Q.q_rarest_term("/root/testdata/sf0.001").to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    monkeypatch.setattr(Q, "VOCAB_BROADCAST_CAP", 0)
    forced = (
        Q.q_rarest_term("/root/testdata/sf0.001").to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, forced)


def test_asof_join_random_matches_single_frame_reference(ray_session):
    """Distributed as-of (union + bucket shuffle + per-bucket merge_asof)
    == one global pandas merge_asof, across random inputs."""
    rng = np.random.RandomState(11)
    for trial in range(4):
        nl, nr = rng.randint(1, 60), rng.randint(0, 60)
        lt = pd.DataFrame(
            {
                "k": rng.randint(0, 6, nl).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.randint(0, 10_000, nl), unit="s"
                ).astype("datetime64[us]"),
                "lid": np.arange(nl, dtype=np.int64),
            }
        )
        rt = pd.DataFrame(
            {
                "k": rng.randint(0, 6, nr).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.randint(0, 10_000, nr), unit="s"
                ).astype("datetime64[us]"),
                "rv": rng.randint(0, 1000, nr).astype(np.float64),
            }
        )
        # unique (k, ts) on the right so the asof winner's VALUE is
        # deterministic regardless of tie-order
        rt = rt.drop_duplicates(["k", "ts"])
        from reddacted_ray.stages.joins import asof_join_backward

        got = (
            asof_join_backward(
                rd.from_arrow(pa.Table.from_pandas(lt, preserve_index=False)),
                rd.from_arrow(pa.Table.from_pandas(rt, preserve_index=False)),
                "k", "ts", ["rv"], n_buckets=3,
            )
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        ref = pd.merge_asof(
            lt.sort_values("ts", kind="mergesort"),
            rt.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction="backward",
        ).sort_values("lid").reset_index(drop=True)
        pd.testing.assert_series_equal(got["rv"], ref["rv"], check_dtype=False), trial


def test_broadcast_range_join_semantics(ray_session):
    """Boundary inclusivity [lo, hi), unmatched-row drop, payload attach,
    and the sorted/non-overlapping validation."""
    import pytest

    from reddacted_ray.stages.joins import broadcast_range_join

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            # below-all, on lo, interior, on hi (next band), gap, above-all
            "v": pa.array([-5.0, 0.0, 7.5, 10.0, 25.0, 99.0]),
        }
    )
    bands = pa.table(
        {
            "lo": pa.array([0.0, 10.0, 30.0]),
            "hi": pa.array([10.0, 20.0, 40.0]),
            "name": pa.array(["a", "b", "c"]),
        }
    )
    out = (
        broadcast_range_join(rd.from_arrow(t), "v", bands)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert out["id"].tolist() == [2, 3, 4]
    assert out["name"].tolist() == ["a", "a", "b"]

    bad = pa.table(
        {"lo": pa.array([0.0, 5.0]), "hi": pa.array([6.0, 9.0]),
         "name": pa.array(["x", "y"])}
    )
    with pytest.raises(ValueError):
        broadcast_range_join(rd.from_arrow(t), "v", bad)


def test_ewma_recursion_hand_computed(ray_session):
    """EWMA (alpha=0.5, adjust=False) must follow the exact recursion
    y_t = 0.5*x_t + 0.5*y_{t-1} per user in (ts, event_id) order."""
    from reddacted_ray.pipelines.queries import q_ewma_value

    SF = "/root/testdata/sf0.001"
    import pandas as pd

    got = (q_ewma_value(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want = {}
    state = {}
    for r in ev.itertuples():
        prev = state.get(r.user_id)
        y = float(r.cents) if prev is None else 0.5 * r.cents + 0.5 * prev
        state[r.user_id] = y
        want[r.event_id] = y
    w = got["event_id"].map(want)
    assert np.allclose(got["ewma_cents"].to_numpy(), w.to_numpy(),
                       rtol=0, atol=1e-9)


def test_ordered_prefix_sum_matches_numpy(ray_session):
    """Distributed ordered prefix sum (fixed-width key-range
    partitioning, driver range scan, local cumsum + offset) must equal
    the single-threaded cumsum over the globally sorted input —
    including ranges with no rows (sparse key domains)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.stages.windows import ordered_prefix_sum

    rng = np.random.default_rng(7)
    # sparse, shuffled, non-contiguous keys
    ids = rng.permutation(200_000)[:50_000].astype(np.int64) * 3
    vals = rng.integers(1, 100, size=50_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": ids, "v": vals})).repartition(8)
    out = (ordered_prefix_sum(ds, "k", "v", range_width=1000)
           .to_pandas().sort_values("k"))
    exp = np.cumsum(vals[np.argsort(ids, kind="stable")])
    assert (out["prefix_sum"].to_numpy() == exp).all()
    assert len(out) == 50_000

def test_ordered_prefix_max_matches_numpy(ray_session):
    """Running max in global key order (the watermark primitive) must
    equal the single-threaded cummax over the sorted input, including
    NEGATIVE values (the int64-min identity must not leak) and sparse
    key ranges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from reddacted_ray.stages.windows import ordered_prefix_max

    rng = np.random.default_rng(11)
    ids = rng.permutation(120_000)[:40_000].astype(np.int64) * 5
    vals = rng.integers(-1000, 1000, size=40_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": ids, "v": vals})).repartition(8)
    out = (ordered_prefix_max(ds, "k", "v", range_width=1000)
           .to_pandas().sort_values("k"))
    exp = np.maximum.accumulate(vals[np.argsort(ids, kind="stable")])
    assert (out["prefix_max"].to_numpy() == exp).all()
    assert len(out) == 40_000


def test_cogrouped_vectorized_full_outer_and_clash(ray_session):
    """cogroup must deliver BOTH sides of every key to one bucket call:
    keys on only one side still appear (full-outer), payload-name
    clashes are rejected, and results match a hand-computed merge."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from reddacted_ray.stages.windows import cogrouped_vectorized

    a = rd.from_arrow(pa.table({
        "ka": pa.array([1, 1, 2, 5], pa.int64()),
        "av": pa.array([10, 20, 30, 40], pa.int64()),
    }))
    b = rd.from_arrow(pa.table({
        "kb": pa.array([1, 3, 3], pa.int64()),
        "bv": pa.array([7, 8, 9], pa.int64()),
    }))

    def merge(af: pd.DataFrame, bf: pd.DataFrame) -> pd.DataFrame:
        na = pd.Series(np.ones(len(af), np.int64)).groupby(
            af["_key"].to_numpy(dtype=np.int64), sort=False).sum()
        nb = pd.Series(np.ones(len(bf), np.int64)).groupby(
            bf["_key"].to_numpy(dtype=np.int64), sort=False).sum()
        keys = na.index.union(nb.index)
        return pd.DataFrame({
            "k": keys.to_numpy().astype(np.int64),
            "na": na.reindex(keys, fill_value=0).to_numpy().astype(np.int64),
            "nb": nb.reindex(keys, fill_value=0).to_numpy().astype(np.int64),
        })

    out = (cogrouped_vectorized(a, b, "ka", "kb", merge)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = pd.DataFrame({"k": [1, 2, 3, 5], "na": [2, 1, 0, 1],
                        "nb": [1, 0, 2, 0]})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    bad = rd.from_arrow(pa.table({"kb": pa.array([1], pa.int64()),
                                  "av": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="disjoint"):
        cogrouped_vectorized(a, bad, "ka", "kb", merge)
