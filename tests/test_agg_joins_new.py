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


def test_ntile_fill_rule_matches_sql_semantics():
    from reddacted_ray.stages.windows import ntile_of

    # n=10, k=4: first 2 tiles get 3 rows, last 2 get 2
    pos = np.arange(10)
    cnt = np.full(10, 10)
    assert ntile_of(pos, cnt, 4).tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # n < k: every row its own tile
    pos = np.arange(3)
    cnt = np.full(3, 3)
    assert ntile_of(pos, cnt, 4).tolist() == [1, 2, 3]
    # exact division
    pos = np.arange(8)
    cnt = np.full(8, 8)
    assert ntile_of(pos, cnt, 4).tolist() == [1, 1, 2, 2, 3, 3, 4, 4]
    # single row
    assert ntile_of(np.array([0]), np.array([1]), 4).tolist() == [1]


def test_repetition_batch_ground_truth():
    from reddacted_ray.functions.textstats import repetition_batch

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a a b",        # 3 words, 2 distinct; bigrams "a a","a b" -> top 1
            "x",            # single word: no bigrams
            "c d c d c d",  # 6 words, 2 distinct; "c d" x3, "d c" x2 -> top 3
        ]),
    })
    out = repetition_batch(t).to_pydict()
    assert out["n_words"] == [3, 1, 6]
    assert out["n_distinct"] == [2, 1, 2]
    assert out["top_bigram_n"] == [1, 0, 3]
    assert out["dup_word_frac"] == [(3 - 2) / 3.0, 0.0, (6 - 2) / 6.0]
    assert out["top_bigram_share"][0] == 1 / 2.0
    assert out["top_bigram_share"][1] is None
    assert out["top_bigram_share"][2] == 3 / 5.0
    # boundary isolation: last token of doc 0 + first of doc 2 never pair
    t2 = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["p q", "q p"]),
    })
    o2 = repetition_batch(t2).to_pydict()
    assert o2["top_bigram_n"] == [1, 1]


def test_moving_avg_and_grouped_mode_shapes(ray_session):
    import pandas as pd

    from reddacted_ray.pipelines.queries import q_grouped_mode, q_moving_avg

    mv = q_moving_avg(SF).to_pandas().sort_values("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev["cents"] = (ev["value"] * 100).round().astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ref = ev.groupby("user_id")["cents"].rolling(4, min_periods=1).sum()
    ev["want"] = ref.to_numpy().astype(np.int64)
    merged = mv.merge(ev[["event_id", "want"]], on="event_id")
    assert (merged["win_sum_cents"] == merged["want"]).all()
    assert (merged["win_n"] <= 4).all() and (merged["win_n"] >= 1).all()

    md = q_grouped_mode(SF).to_pandas()
    cnt = (ev.groupby(["user_id", "event_type"])
           if "event_type" in ev else None)
    ev2 = pd.read_parquet(f"{SF}/events.parquet",
                          columns=["user_id", "event_type"])
    c = (ev2.groupby(["user_id", "event_type"]).size()
         .rename("n").reset_index()
         .sort_values(["user_id", "n", "event_type"],
                      ascending=[True, False, True], kind="mergesort"))
    want = c.groupby("user_id").head(1).reset_index(drop=True)
    got = md.sort_values("user_id").reset_index(drop=True)
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["mode_type"].to_numpy() == want["event_type"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == want["n"].to_numpy()).all()


def test_levenshtein_batch_matches_reference_dp():
    import random

    from reddacted_ray.functions.textstats import levenshtein_batch

    def ref(a: str, b: str) -> int:
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return d[la][lb]

    rng = random.Random(7)
    al, bl = [], []
    for _ in range(300):
        al.append("".join(rng.choice("abcdé☃") for _ in range(rng.randint(0, 15))))
        bl.append("".join(rng.choice("abcdé☃") for _ in range(rng.randint(0, 15))))
    got = levenshtein_batch(al, bl)
    assert got.tolist() == [ref(x, y) for x, y in zip(al, bl)]
    assert levenshtein_batch([], []).tolist() == []


def test_shingles_respect_doc_boundaries():
    from reddacted_ray.pipelines.queries import _DECON_N, _shingles_of

    assert _DECON_N == 8
    w8 = " ".join(f"w{i}" for i in range(8))
    w9 = " ".join(f"v{i}" for i in range(9))
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([w8, "short text", w9]),
    })
    d, sh = _shingles_of(t)
    # doc0: exactly 1 window; doc1: none (2 tokens); doc2: 2 windows
    assert d.tolist() == [0, 2, 2]
    got = sh.to_pylist()
    assert got[0] == w8
    assert got[1] == " ".join(f"v{i}" for i in range(8))
    assert got[2] == " ".join(f"v{i}" for i in range(1, 9))
    # no cross-doc window leaked (every shingle's tokens share a prefix)
    assert all(len(set(s.split(" ")[0][0] for s in [g])) == 1 for g in got)


def test_mix_rates_thresholds_match_sql_rule():
    import hashlib

    from reddacted_ray.functions.hashing import md5_top32_batch
    from reddacted_ray.pipelines.queries import MIX_RATES

    ids = pa.array(list(range(1000)), pa.int64())
    h = md5_top32_batch(ids)
    for lang, rate in MIX_RATES.items():
        bound = min(int(rate * 2**32), 2**32)
        kept = int((h < bound).sum())
        # SQL-side rule: substr(md5(id),1,8) < hex bound (string compare
        # == numeric compare of the top 32 bits)
        hexbound = "gggggggg" if bound >= 2**32 else format(bound, "08x")
        kept_sql = sum(
            1 for i in range(1000)
            if hashlib.md5(str(i).encode()).hexdigest()[:8] < hexbound
        )
        assert kept == kept_sql
        assert abs(kept / 1000 - rate) < 0.06 or rate == 1.0


def test_adaptive_semi_join_paths_agree(ray_session):
    """Broadcast path (under cap) and Bloom+left_semi fallback (cap=0)
    must return identical rows — including when the dim side's blocks
    mostly empty after filtering."""
    import ray.data as rd

    from reddacted_ray.stages.joins import adaptive_semi_join

    fact = rd.from_arrow(pa.table({
        "k": pa.array([i % 50 for i in range(2000)], pa.int64()),
        "v": pa.array(range(2000), pa.int64()),
    })).repartition(8)
    dim = rd.from_arrow(pa.table({
        "dk": pa.array([3, 7, 7, 11, 42], pa.int64()),
    })).repartition(6)  # several empty blocks

    a = (adaptive_semi_join(fact, "k", dim, "dk", cap=1_000_000)
         .to_pandas().sort_values("v").reset_index(drop=True))
    b = (adaptive_semi_join(fact, "k", dim, "dk", cap=0)
         .to_pandas().sort_values("v").reset_index(drop=True))
    assert set(a["k"]) == {3, 7, 11, 42}
    assert len(a) == 4 * 40
    assert (a["k"].to_numpy() == b["k"].to_numpy()).all()
    assert (a["v"].to_numpy() == b["v"].to_numpy()).all()


def _sorted_pd(ds, by):
    return ds.to_pandas().sort_values(by).reset_index(drop=True)


def test_attach_via_lookup_paths_agree(ray_session):
    """Broadcast pc.index_in path (under cap) and the native-hash-join
    fallback (cap=0) must return identical rows for both inner and
    left_outer semantics, including unmatched and null fact keys."""
    from reddacted_ray.stages.joins import attach_via_lookup

    fact = rd.from_arrow(pa.table({
        "k": pa.array([i % 50 if i % 13 else None for i in range(2000)],
                      pa.int64()),
        "v": pa.array(range(2000), pa.int64()),
    })).repartition(8)
    dim = rd.from_arrow(pa.table({
        "dk": pa.array([3, 7, 11, 42], pa.int64()),
        "name": pa.array(["a", "b", "c", "d"]),
    })).repartition(6)  # several empty blocks

    for inner in (True, False):
        a = _sorted_pd(attach_via_lookup(
            fact, "k", dim, "dk", {"name": "nm"},
            cap=1_000_000, inner=inner), "v")
        b = _sorted_pd(attach_via_lookup(
            fact, "k", dim, "dk", {"name": "nm"},
            cap=0, inner=inner), "v")
        assert list(a.columns.sort_values()) == list(b.columns.sort_values())
        assert (a["v"].to_numpy() == b["v"].to_numpy()).all()
        assert (a["nm"].fillna("-") == b["nm"].fillna("-")).all()
        if inner:
            assert set(a["k"]) == {3, 7, 11, 42}
        else:
            assert len(a) == 2000
            assert a.loc[a["k"].isna(), "nm"].isna().all()


def test_attach_via_lookup_int32_key(ray_session):
    """Fallback path with a non-int64 key: the sentinel pad must carry
    the dim's real key type (ADVICE: pa.array inference would make an
    int64 pad meet an int32 column and crash concat)."""
    from reddacted_ray.stages.joins import attach_via_lookup

    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4] * 50, pa.int32()),
        "v": pa.array(range(200), pa.int64()),
    })).repartition(4)
    dim = rd.from_arrow(pa.table({
        "dk": pa.array([2, 4], pa.int32()),
        "tag": pa.array([20, 40], pa.int64()),
    })).repartition(3)
    out = _sorted_pd(attach_via_lookup(fact, "k", dim, "dk",
                                       {"tag": "tag"}, cap=0), "v")
    assert set(out["k"]) == {2, 4}
    assert (out["tag"].to_numpy() == out["k"].to_numpy() * 10).all()


def test_adaptive_anti_join_paths_agree(ray_session):
    """Broadcast NOT-is_in path and the Bloom-certain + left_anti split
    must return identical rows; null fact keys are KEPT in both."""
    from reddacted_ray.stages.joins import adaptive_anti_join

    fact = rd.from_arrow(pa.table({
        "k": pa.array([i % 50 if i % 17 else None for i in range(2000)],
                      pa.int64()),
        "v": pa.array(range(2000), pa.int64()),
    })).repartition(8)
    dim = rd.from_arrow(pa.table({
        "dk": pa.array([3, 7, 7, 11, 42], pa.int64()),
    })).repartition(6)

    a = _sorted_pd(adaptive_anti_join(fact, "k", dim, "dk",
                                      cap=1_000_000), "v")
    b = _sorted_pd(adaptive_anti_join(fact, "k", dim, "dk", cap=0), "v")
    assert (a["v"].to_numpy() == b["v"].to_numpy()).all()
    assert not ({3, 7, 11, 42} & set(a["k"].dropna()))
    assert a["k"].isna().any()  # null keys kept


def test_adaptive_semi_join_sentinel_fact_rows_dropped(ray_session):
    """A fact row whose key equals the sentinel must be dropped by BOTH
    paths (ADVICE: the padded dim used to leak it through left_semi)."""
    from reddacted_ray.stages.joins import adaptive_semi_join

    fact = rd.from_arrow(pa.table({
        "k": pa.array([-1, 3, 5, -1, 7], pa.int64()),
        "v": pa.array(range(5), pa.int64()),
    })).repartition(2)
    dim = rd.from_arrow(pa.table({
        "dk": pa.array([3, 7], pa.int64()),
    })).repartition(2)
    a = _sorted_pd(adaptive_semi_join(fact, "k", dim, "dk",
                                      cap=1_000_000), "v")
    b = _sorted_pd(adaptive_semi_join(fact, "k", dim, "dk", cap=0), "v")
    assert list(a["k"]) == [3, 7] == list(b["k"])


def test_adaptive_fallbacks_sparse_dim_dense_fact(ray_session):
    """Regression: a dim with FEWER distinct keys than join partitions
    left some right hash partitions with zero shards -> zero-COLUMN
    tables in finalize -> Acero 'no match for key field'. The covering
    sentinel pads must make semi/anti/attach fallbacks crash-proof when
    every left partition is populated (dense fact keys) but the right
    side is sparse."""
    from reddacted_ray.stages.joins import (
        adaptive_anti_join,
        adaptive_semi_join,
        attach_via_lookup,
    )

    # 2000 distinct keys -> every one of the 16 left partitions populated
    fact = rd.from_arrow(pa.table({
        "k": pa.array(range(2000), pa.int64()),
        "v": pa.array(range(2000), pa.int64()),
    })).repartition(8)
    dim = rd.from_arrow(pa.table({
        "dk": pa.array([42, 43], pa.int64()),
        "name": pa.array(["a", "b"]),
    }))

    semi = _sorted_pd(adaptive_semi_join(
        fact, "k", dim.select_columns(["dk"]), "dk", cap=0), "v")
    assert list(semi["k"]) == [42, 43]

    anti = adaptive_anti_join(
        fact, "k", dim.select_columns(["dk"]), "dk", cap=0)
    assert anti.count() == 1998

    att = _sorted_pd(attach_via_lookup(
        fact, "k", dim, "dk", {"name": "nm"}, cap=0), "v")
    assert list(att["nm"]) == ["a", "b"]

    outer = attach_via_lookup(fact, "k", dim, "dk", {"name": "nm"},
                              cap=0, inner=False)
    assert outer.count() == 2000


def test_rewritten_queries_fallback_paths_agree(ray_session, monkeypatch):
    """The round-4 broadcast-policy rewrites must return identical
    results on the broadcast path and the forced distributed fallback
    (REDD_BCAST_CAP=0) — the in-repo lock for what check_oracle verifies
    against DuckDB at the larger sfs."""
    import pandas as pd

    from reddacted_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"

    def run(name):
        res = Q.registry()[name](sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if isinstance(df, pa.Table):
            df = df.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name in ("promo_revenue", "supplier_variety", "small_qty_revenue",
                 "revenue_by_nation"):
        base = run(name)
        monkeypatch.setenv("REDD_BCAST_CAP", "0")
        forced = run(name)
        monkeypatch.delenv("REDD_BCAST_CAP")
        pd.testing.assert_frame_equal(base, forced, check_exact=True), name


def test_chunk_documents_reconstructs_text(ray_session):
    """Every doc must be exactly recoverable from its chunks: chunk 0 +
    the tail (beyond the 20-char overlap) of each later chunk, in
    chunk_id order — validating offsets, overlap and ragged trimming of
    the vectorized byte-matrix chunker."""
    import pyarrow.parquet as pq

    from reddacted_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    out = Q.q_chunk_documents(sf).to_pandas()
    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
    }
    rebuilt: dict[int, str] = {}
    for _, row in out.sort_values(["doc_id", "chunk_id"]).iterrows():
        d, c, s = row["doc_id"], row["chunk_id"], row["chunk"]
        assert len(s) <= 120
        if c == 0:
            rebuilt[d] = s
        else:
            assert rebuilt[d][c * 100:] == s[:20] or len(s) <= 20
            rebuilt[d] = rebuilt[d][: c * 100] + s
    assert rebuilt == texts


def test_systematic_sample_every_25th(ray_session):
    from reddacted_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    out = Q.q_systematic_sample(sf).to_pandas().sort_values("rn")
    assert (out["rn"].to_numpy() % 25 == 0).all()
    # doc_id is dense 0..n-1 in testdata, so rank == doc_id + 1
    assert (out["doc_id"].to_numpy() == out["rn"].to_numpy() - 1).all()


def test_revenue_calendar_dense_and_conserving(ray_session):
    """The spine is dense (every day between min and max exactly once)
    and total cents equals the direct sum over orders."""
    import numpy as np
    import pyarrow.parquet as pq

    from reddacted_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    out = Q.q_revenue_calendar(sf).to_pandas().sort_values("day_num")
    days = out["day_num"].to_numpy()
    assert (np.diff(days) == 1).all()
    tp = pq.read_table(f"{sf}/orders.parquet", columns=["o_totalprice"])
    x = tp["o_totalprice"].to_numpy(zero_copy_only=False)
    cents = (np.sign(x) * np.floor(np.abs(x) * 100 + 0.5)).astype("int64")
    assert out["cents"].sum() == cents.sum()


def test_inverted_index_postings_capped_and_df_exact(ray_session):
    import pyarrow.parquet as pq

    from reddacted_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    out = Q.q_inverted_index(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    want_df: dict[str, set] = {}
    for r in docs:
        for tok in set(r["text"].split()):
            want_df.setdefault(tok, set()).add(r["doc_id"])
    assert set(out["tok"]) == set(want_df)
    for _, row in out.iterrows():
        ids = sorted(want_df[row["tok"]])
        assert row["df"] == len(ids)
        assert row["postings"] == ",".join(map(str, ids[:20]))


def test_session_stats_consistent_with_sessionize(ray_session):
    from reddacted_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    sess = Q.q_sessionize(sf).to_pandas()
    stats = Q.q_session_stats(sf).to_pandas().set_index("user_id")
    per = sess.groupby("user_id").agg(
        n_sessions=("session_id", "size"),
        max_events=("n_events", "max"))
    assert (stats["n_sessions"].sort_index()
            == per["n_sessions"].sort_index()).all()
    assert (stats["max_events"].sort_index()
            == per["max_events"].sort_index()).all()
    dur = ((sess["session_end"] - sess["session_start"])
           .dt.total_seconds() * 1e6).round().astype("int64")
    assert stats["total_dur_us"].sum() == dur.sum()


def test_dp_counts_deterministic(ray_session):
    """dp_counts noise is a pure function of the group key: recompute
    the inverse-Laplace-CDF noise from md5(event_type) and require
    exact equality (no RNG state anywhere)."""
    import hashlib
    import math

    from reddacted_ray.pipelines.queries import q_dp_counts

    t = q_dp_counts("/root/testdata/sf0.001")
    got = dict(zip(t["event_type"].to_pylist(), t["n_dp"].to_pylist()))
    true = dict(zip(t["event_type"].to_pylist(), t["n_true"].to_pylist()))
    for et, n in true.items():
        h = int.from_bytes(
            hashlib.md5(et.encode()).digest()[:4], "big")
        u = h / 4294967296.0 - 0.5
        noise = (-math.copysign(1.0, u)
                 * math.log(1.0 - 2.0 * abs(u)) if abs(u) < 0.5 else 0.0)
        assert got[et] == float(n) + noise


def test_ppl_filter_matches_recomputation(ray_session):
    """ppl_filter's kept set must equal an independent single-process
    recomputation: TrigramLM ppl per doc, per-lang median at the
    ceil(n/2) rank, keep ppl <= median."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from reddacted_ray.functions.textstats import TrigramLM
    from reddacted_ray.pipelines.queries import q_ppl_filter

    got = q_ppl_filter("/root/testdata/sf0.001").to_pandas()

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang", "text"])
    lm = TrigramLM()
    ppl = lm.perplexity_batch(t["text"].to_pylist())
    ids = np.asarray(t["doc_id"])
    langs = np.asarray(t["lang"])
    keep = []
    for lg in np.unique(langs):
        m = langs == lg
        v = np.sort(ppl[m])
        cut = v[int(math.ceil(0.5 * len(v))) - 1]
        keep.extend(ids[m & (ppl <= cut)].tolist())
    assert sorted(got["doc_id"].tolist()) == sorted(keep)
    assert (got["ppl"] <= got["ppl"].max()).all()
