"""grouped_agg mixed-kernel combiner + pad_sentinel empty-block shield
(stages/agg.py, stages/joins.py) and the late-round-3 query shapes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from reddacted_ray.stages.agg import grouped_agg
from reddacted_ray.stages.joins import pad_sentinel

SF = "/root/testdata/sf0.001"


def test_grouped_agg_matches_single_pass(ray_session):
    t = pa.table({
        "k": pa.array([i % 7 for i in range(500)], pa.int64()),
        "v": pa.array([(i * 37) % 101 - 50 for i in range(500)], pa.int64()),
    })
    ref = (
        t.to_pandas().groupby("k")["v"].agg(["sum", "min", "max"])
        .reset_index().sort_values("k").reset_index(drop=True)
    )
    # same source column under three kernels via explicit output names
    out = (
        grouped_agg(rd.from_arrow(t).repartition(8), ["k"],
                    [("v", "sum", "s"), ("v", "min", "lo"),
                     ("v", "max", "hi")])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert (out["k"] == ref["k"]).all()
    assert (out["s"].to_numpy() == ref["sum"].to_numpy()).all()
    assert (out["lo"].to_numpy() == ref["min"].to_numpy()).all()
    assert (out["hi"].to_numpy() == ref["max"].to_numpy()).all()
    import pytest

    with pytest.raises(ValueError):
        grouped_agg(rd.from_arrow(t), ["k"], [("v", "sum"), ("v", "min")])


def test_pad_sentinel_fused_filter_survives_empty_blocks(ray_session):
    # 16 blocks; the filter empties most of them — the fused sentinel pad
    # must keep every block schema-ful so a hash join works (Ray 2.49
    # strips schemas from empty blocks).
    t = pa.table({
        "id": pa.array(list(range(160)), pa.int64()),
        "grp": pa.array([i % 40 for i in range(160)], pa.int64()),
    })
    left = rd.from_arrow(pa.table({
        "id2": pa.array([0, 1, 2, 3], pa.int64()),
        "tag": pa.array(["a", "b", "c", "d"]),
    }))

    def keep_tiny(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["id"], 4))

    right = pad_sentinel(
        rd.from_arrow(t).repartition(16), "id", {"id": -1, "grp": -1},
        transform=keep_tiny)
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("id2",), right_on=("id",))
    out = j.to_pandas().sort_values("id2")
    assert list(out["id2"]) == [0, 1, 2, 3]
    assert -1 not in set(out["id2"])  # sentinels never match


def test_bottomk_sample_deterministic_and_uniformish(ray_session):
    from reddacted_ray.pipelines.queries import q_bottomk_sample

    a = q_bottomk_sample(SF).to_pandas()
    b = q_bottomk_sample(SF).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])  # rerun-stable
    assert len(a) == 64 and a["doc_id"].is_unique
    # md5 keys are sorted ascending
    assert list(a["k"]) == sorted(a["k"])


def test_cheapest_supplier_argmin_semantics(ray_session):
    from reddacted_ray.pipelines.queries import q_cheapest_supplier

    out = q_cheapest_supplier(SF).to_pandas()
    import pyarrow.parquet as pq

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_quantity"]).to_pandas()
    x = li["l_extendedprice"] / li["l_quantity"] * 10000
    li["unit_e4"] = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64")
    ref = (
        li.sort_values(["l_partkey", "unit_e4", "l_suppkey"])
        .groupby("l_partkey").first().reset_index()
    )
    m = out.sort_values("l_partkey").reset_index(drop=True)
    assert (m["best_suppkey"].to_numpy()
            == ref["l_suppkey"].to_numpy()).all()
    assert (m["unit_e4"].to_numpy() == ref["unit_e4"].to_numpy()).all()
