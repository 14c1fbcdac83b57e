"""Distributed KMeans (stages/kmeans.py) + set_classify (stages/joins.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _planted(n_per: int, centers: np.ndarray, spread: float) -> pa.Table:
    """Deterministic blobs: points jitter around each center by < spread
    (hash-derived offsets, no RNG)."""
    k, d = centers.shape
    rows_id, rows_vec, truth = [], [], []
    for c in range(k):
        for i in range(n_per):
            # deterministic quasi-random offsets in (-spread, spread)
            off = np.array(
                [((i * 2654435761 + j * 40503 + c * 97) % 1000) / 1000.0
                 for j in range(d)]
            )
            rows_id.append(c * n_per + i)
            rows_vec.append((centers[c] + (off * 2 - 1) * spread).tolist())
            truth.append(c)
    return pa.table({
        "vec_id": pa.array(rows_id, pa.int64()),
        "embedding": pa.array(rows_vec, pa.list_(pa.float32())),
        "truth": pa.array(truth, pa.int64()),
    })


@pytest.fixture(scope="module")
def blob_table() -> pa.Table:
    centers = np.array([
        [0.0, 0.0, 0.0, 0.0],
        [10.0, 0.0, 0.0, 0.0],
        [0.0, 10.0, 0.0, 0.0],
        [0.0, 0.0, 10.0, 10.0],
    ])
    return _planted(50, centers, spread=0.5)


def test_kmeans_recovers_planted_clusters(ray_session, blob_table):
    import ray.data as rd

    from reddacted_ray.stages.kmeans import kmeans_assign, kmeans_fit

    ds = rd.from_arrow(blob_table).repartition(8)
    cent = kmeans_fit(ds, "embedding", "vec_id", k=4, iters=10)
    assert cent.shape == (4, 4)
    out = kmeans_assign(ds, "embedding", cent).take_all()
    # perfect partition: label <-> truth bijection
    by_truth: dict[int, set[int]] = {}
    for r in out:
        tr = r["vec_id"] // 50
        by_truth.setdefault(tr, set()).add(r["cluster"])
    labels = [next(iter(s)) for s in by_truth.values()]
    assert all(len(s) == 1 for s in by_truth.values())
    assert len(set(labels)) == 4


def test_kmeans_deterministic(ray_session, blob_table):
    import ray.data as rd

    from reddacted_ray.stages.kmeans import kmeans_fit

    ds = rd.from_arrow(blob_table).repartition(4)
    c1 = kmeans_fit(ds, "embedding", "vec_id", k=4, iters=5)
    c2 = kmeans_fit(ds, "embedding", "vec_id", k=4, iters=5)
    # same init (hash_head) + same block-count partial merge -> same model
    # up to float summation order; planted blobs make assignments stable,
    # so centroids agree to high precision.
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0), atol=1e-9)


def test_kmeans_empty_cluster_survives(ray_session):
    import ray.data as rd

    from reddacted_ray.stages.kmeans import kmeans_fit

    # 10 identical points, k=3: two clusters go empty and must keep
    # their previous centroid rather than NaN out.
    t = pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([[1.0, 2.0]] * 10, pa.list_(pa.float32())),
    })
    cent = kmeans_fit(rd.from_arrow(t), "embedding", "vec_id", k=3, iters=3)
    assert np.isfinite(cent).all()
    assert np.allclose(cent[0], [1.0, 2.0])


def test_set_classify_matches_python_sets(ray_session):
    import ray.data as rd

    from reddacted_ray.stages.joins import set_classify

    left_keys = [i for i in range(200) if i % 3 != 0]
    right_keys = [i for i in range(200) if i % 2 == 0]
    left = rd.from_arrow(pa.table({"k": pa.array(left_keys * 2)})).repartition(5)
    right = rd.from_arrow(pa.table({"k": pa.array(right_keys)})).repartition(3)
    out = {r["k"]: r["setop"] for r in set_classify(left, right, "k").take_all()}
    ls, rs = set(left_keys), set(right_keys)
    expect = {k: "both" for k in ls & rs}
    expect.update({k: "left_only" for k in ls - rs})
    expect.update({k: "right_only" for k in rs - ls})
    assert out == expect


def test_set_classify_empty_side(ray_session):
    import ray.data as rd

    from reddacted_ray.stages.joins import set_classify

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    right = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64())}))
    out = {r["k"]: r["setop"] for r in set_classify(left, right, "k").take_all()}
    assert out == {1: "left_only", 2: "left_only", 3: "left_only"}


def test_kmeans_zero_row_blocks(ray_session, blob_table):
    import pyarrow.compute as pc
    import ray.data as rd

    from reddacted_ray.stages.kmeans import kmeans_assign, kmeans_fit

    # a filter that empties some blocks entirely: kmeans must survive
    # zero-row blocks in both the partial and the assign pass
    ds = rd.from_arrow(blob_table).repartition(16).map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 100)),
        batch_format="pyarrow", zero_copy_batch=True)
    cent = kmeans_fit(ds, "embedding", "vec_id", k=2, iters=4)
    out = kmeans_assign(ds, "embedding", cent).take_all()
    assert len(out) == 100
    assert {r["vec_id"] // 50 for r in out} == {0, 1}


def test_ivf_train_distributed_recall(ray_session, tmp_path):
    import ray
    import ray.data as rd

    from reddacted_ray.stages.similarity import (
        IVFIndex, brute_force_topk, ivf_assign, ivf_topk)

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(400, 16)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })).repartition(8)
    idx = IVFIndex.train_distributed(ds, "embedding", "vec_id", n_lists=8)
    assert idx.centroids.shape == (8, 16)
    assigned = ivf_assign(ds, ray.put(idx)).materialize()
    q = vecs[:5]
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(assigned, idx, q, k=5, n_probe=4)
    hits = 0
    for qi in range(5):
        ids = {i for i, _ in approx[qi]}
        assert qi in ids  # self-vector always found
        hits += len(ids & {i for i, _ in exact[qi]})
    assert hits / 25 >= 0.6


def test_read_csv_roundtrip(ray_session, tmp_path):
    import pyarrow.csv as pacsv
    import ray.data as rd

    from reddacted_ray.sources.tables import read_csv

    t = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"w{i}" for i in range(20)]),
        "extra": pa.array([i * 2 for i in range(20)], pa.int64()),
    })
    p = str(tmp_path / "docs.csv")
    pacsv.write_csv(t, p)
    out = read_csv(p, columns=["doc_id", "text"]).take_all()
    assert len(out) == 20
    assert sorted(out[0].keys()) == ["doc_id", "text"]
    assert {r["text"] for r in out} == {f"w{i}" for i in range(20)}
