"""Z-order layout: Morton code correctness + the data-skipping payoff."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from reddacted_ray.stages.layout import (
    file_ranges,
    pruned_fraction,
    zorder_write,
    zvalue,
)

SF = "/root/testdata/sf0.001"


def test_zvalue_interleaves_bits():
    x = np.array([0b1010, 0b0001, 255], np.int64)
    y = np.array([0b0101, 0b0000, 0], np.int64)
    z = zvalue([x, y], bits=4)
    # bit i of x -> 2i, bit i of y -> 2i+1
    want = []
    for a, b in zip(x.tolist(), y.tolist()):
        v = 0
        for i in range(4):
            v |= ((a >> i) & 1) << (2 * i)
            v |= ((b >> i) & 1) << (2 * i + 1)
        want.append(v)
    assert z.tolist() == want


def test_zvalue_overflow_guard():
    with pytest.raises(ValueError):
        zvalue([np.zeros(1, np.int64)] * 4, bits=16)


def test_zorder_layout_prunes_both_dims(ray_session, tmp_path):
    """Files written in z-order carry tight min/max on BOTH columns, so
    a range predicate on either prunes most files; a single-column sort
    only prunes its own column."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    n = 40_000
    t = pa.table({
        "x": pa.array(rng.randint(0, 256, n).astype(np.int64)),
        "y": pa.array(rng.randint(0, 256, n).astype(np.int64)),
    })

    zdir = str(tmp_path / "zorder")
    zorder_write(rd.from_arrow(t), ["x", "y"], zdir, bits=8,
                 rows_per_file=2500)

    ldir = str(tmp_path / "linear")
    (rd.from_arrow(t).sort("x")
     .write_parquet(ldir, min_rows_per_file=2500, max_rows_per_file=2500))

    zr = file_ranges(zdir, ["x", "y"])
    lr = file_ranges(ldir, ["x", "y"])
    assert len(zr["x"]) >= 8  # actually split into many files

    # a 32-wide range predicate on each dim (1/8 of the domain, inside
    # one z-quadrant: high-order bits 10)
    for c in ("x", "y"):
        zp = pruned_fraction(zr[c], 160, 191)
        assert zp >= 0.3, (c, zr[c])
    # the linear layout prunes x fine but cannot prune y at all —
    # z-order trades a little x-pruning for pruning on EVERY dim
    assert pruned_fraction(lr["x"], 160, 191) >= 0.5
    assert pruned_fraction(lr["y"], 160, 191) == 0.0
    assert pruned_fraction(zr["y"], 160, 191) > 0.0


def test_write_partitioned_keeps_column_and_prunes(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from reddacted_ray.stages.sampling import read_partition, write_partitioned

    t = pa.table({"lang": pa.array(["en", "de", "en", "fr", "en", "de"]),
                  "doc_id": pa.array(range(6), pa.int64())})
    out = str(tmp_path / "byval")
    rows = write_partitioned(rd.from_arrow(t).repartition(3), "lang", out)
    assert rows == {"en": 3, "de": 2, "fr": 1}
    # the partition column stays INSIDE the files (the lineage contract)
    import glob

    f = glob.glob(out + "/lang=en/*.parquet")[0]
    assert "lang" in pq.read_schema(f).names
    en = read_partition(out, "lang", "en").to_pandas()
    assert sorted(en["doc_id"]) == [0, 2, 4]
    assert set(en["lang"]) == {"en"}
    # rerun overwrites (no silent append)
    rows2 = write_partitioned(rd.from_arrow(t), "lang", out)
    assert rows2 == rows
    assert read_partition(out, "lang", "en").count() == 3
