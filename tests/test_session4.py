"""Adversarial edge-case lock for the session-4 operators: crafted
tables with rounding-boundary prices (.5 ties), timestamp ties inside a
user, singleton runs, empty/short/duplicate documents, and a doc whose
8-gram repeats only WITHIN itself — each query must hash-match its
DuckDB oracle under the driver's order-insensitive compare."""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


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
    d = str(tmp_path_factory.mktemp("s4_sf"))
    # orders: rounding-boundary totals (.5 ties away from zero), a
    # sub-dollar total (leading digit of the CENTS amount), and
    # whole-dollar collisions for the duplicate-invoice audit
    prices = [100.4, 100.2, 100.5, 99.995, 0.04, 7250.0, 7250.0,
              7250.0, 812.13, 55.5, 55.49]
    # 4 calendar days with varying totals (autocorr needs >=2 lag
    # pairs and nonzero variance on both legs)
    days = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3]
    DAYUS = 86_400_000_000
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(prices)), pa.int64()),
        "o_custkey": pa.array([1] * len(prices), pa.int64()),
        "o_totalprice": pa.array(prices, pa.float64()),
        # midnight-aligned timestamps, matching the real table schema
        "o_orderdate": pa.array([(18000 + v) * DAYUS for v in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT" if i % 2 == 0 else "5-LOW"
             for i in range(len(prices))], pa.string()),
    }), os.path.join(d, "orders.parquet"))
    # events: ts TIES inside user 1 (order falls back to event_id),
    # singleton user 2, a user whose type never changes (one run)
    base = 1_700_000_000_000_000
    MIN = 60_000_000
    ev = [
        (0, base, 1, "view", 1.0),
        (1, base, 1, "click", 1.0),       # tie: same ts, new type
        (2, base, 1, "click", 1.0),       # tie: same ts, same type
        (3, base + 5 * MIN, 1, "view", 1.0),
        (4, base + 9 * MIN, 2, "purchase", 3.5),
        (5, base + 1 * MIN, 3, "view", 7.0),
        (6, base + 2 * MIN, 3, "view", 7.0),
        (7, base + 3 * MIN, 3, "view", 7.0),
    ]
    # user 6: 13 constant-value events then a spike — crosses the
    # 11-row window clamp AND the n>=5 mass gate for the z-score flag
    ev += [(8 + i, base + i * MIN, 6, "view", 2.0) for i in range(13)]
    ev.append((21, base + 13 * MIN, 6, "view", 99.0))
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in ev], pa.int64()),
        "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in ev], pa.int64()),
        "event_type": pa.array([r[3] for r in ev], pa.string()),
        "value": pa.array([r[4] for r in ev], pa.float64()),
    }), os.path.join(d, "events.parquet"))
    # documents: empty text, a 7-char doc (no 8-gram window), exact
    # duplicates, a doc whose gram repeats only within itself, and a
    # pair sharing one window
    texts = [
        "",
        "abcdefg",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaa",
        "zz the quick zz",
        "one two two three three three",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["a", "a", "b", "b", "b", "b", "b"],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    # lineitem: heavy ties in both rank columns + one .5 cents tie
    qty = [1.0, 1.0, 1.0, 2.0, 2.0, 3.0]
    price = [10.0, 10.0, 20.0, 20.0, 10.005, 30.0]
    # basket columns: order 1 holds part 20 TWICE (distinct dedup),
    # orders 1+2 share the (10, 20) pair, order 3 is a singleton
    okey = [1, 1, 1, 2, 2, 3]
    pkey = [10, 20, 20, 10, 20, 10]
    # ship lags: exactly 30d (within), 31d (late), same-day, late, ...
    lag = [30, 31, 0, 45, 2, 30]
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(pkey, pa.int64()),
        "l_shipdate": pa.array([(18000 + days[k] + lg) * DAYUS
                                for k, lg in zip(okey, lag)],
                               pa.timestamp("us")),
        "l_returnflag": pa.array(["R", "N", "R", "N", "N", "A"],
                                 pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    # part: size 9/10 straddles the //10 band edge; retail with .5 tie
    pq.write_table(pa.table({
        "p_partkey": pa.array([10, 20], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2"], pa.string()),
        "p_size": pa.array([9, 10], pa.int64()),
        "p_retailprice": pa.array([10.005, 99.99], pa.float64()),
    }), os.path.join(d, "part.parquet"))
    # customer: negative balances + a -0.005 rounding-boundary case
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_mktsegment": pa.array(["AUTO", "AUTO", "AUTO", "HOUSE"],
                                 pa.string()),
        "c_acctbal": pa.array([100.0, -5.25, -0.005, 0.0],
                              pa.float64()),
    }), os.path.join(d, "customer.parquet"))
    return d


QUERIES = [
    "benford_digits",
    "same_price_orders",
    "scd2_intervals",
    "word_len_hist",
    "spearman_qty_price",
    "bpe_merge_pairs",
    "dup_gram_share",
    "hist2d_qty_price",
    # crafted graph is SPARSE with an isolated node (purchase): 3 nodes
    # wired view-click only, zero triangles
    "triangle_type_graph",
    "rolling_zscore_flags",
    "langid_confusion",
    "bag_except_users",
    # doc 0 is the EMPTY doc -> empty query gram set -> zero rows on
    # both sides (locks the empty-result path)
    "doc_jaccard_topk",
    "revenue_autocorr",
    "part_pairs_top",
    "regex_match_counts",
    "cap_per_source",
    # n_chars TIES across sources exercise the (n_chars, doc_id) order
    "diverse_top_docs",
    # 30d boundary is INCLUSIVE; orderkeys here index the orders table
    "ship_sla_compliance",
    "first_touch_counts",
    # no bigram reaches cab>=5 in the crafted docs: empty both sides
    "word_bigram_lift",
    # same-ts ties fall back to event_id order in the lag partition
    "throttle_events",
    # exact-half boundary: cum*2 == tot is INCLUSIVE
    "char_budget_cut",
    "ship_lag_percentiles",
    "return_rate_by_brand",
    # -0.005 rounds to -1 cent but c_acctbal < 0 is on the RAW double
    "segment_balance_stats",
    "brand_margin",
    # dup pair: doc 2 owns every shared gram (min doc) -> novelty 1e6,
    # doc 3 -> 0; the within-doc-repeat doc stays fully novel
    "gram_novelty",
    "priority_weekday_matrix",
    # heavy value ties (3x 7250.00): Sum(i*x) is tie-invariant
    "order_gini",
    "doclen_gini_by_lang",
]


def test_read_text_docs(ray_session, tmp_path):
    from reddacted_ray.sources.tables import read_text_docs

    (tmp_path / "a.txt").write_text("hello world")
    (tmp_path / "b.txt").write_text("unicode éà")
    got = read_text_docs(str(tmp_path)).to_pandas()
    assert len(got) == 2
    by_text = {r["text"]: r for _, r in got.iterrows()}
    assert by_text["hello world"]["n_chars"] == 11
    assert by_text["unicode éà"]["n_chars"] == 10
    assert got["doc_id"].nunique() == 2
    # id-stable: re-read yields identical ids
    again = read_text_docs(str(tmp_path)).to_pandas()
    assert set(again["doc_id"]) == set(got["doc_id"])


def test_write_csv_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from reddacted_ray.sources.tables import read_csv, write_csv

    t = pa.table({
        "a": pa.array([3, 1, 2], pa.int64()),
        "s": pa.array(["x", "y,z", "w"], pa.string()),
    })
    ds = rd.from_arrow(t)
    out = str(tmp_path / "csv_out")
    assert write_csv(ds, out) == 3
    back = read_csv(out).to_pandas().sort_values("a")
    assert list(back["a"]) == [1, 2, 3]
    assert set(back["s"]) == {"x", "y,z", "w"}
    with pytest.raises(ValueError):
        write_csv(ds, out)


def test_cusum_alarms_recomputation(ray_session, crafted_dir):
    """The CUSUM summary must equal an independent driver-side replay
    of the same integer recursion over the crafted 4-day series."""
    import math

    import duckdb as ddb

    import __ray_entry__ as e

    got = e.queries()["cusum_alarms"](crafted_dir).to_pandas()
    con = ddb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM"
            f" '{crafted_dir}/orders.parquet'")
    day = con.sql(
        "SELECT o_orderdate d, CAST(sum(CAST(round(o_totalprice*100)"
        " AS BIGINT)) AS BIGINT) c FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    r = [int(x[1]) for x in day]
    n = len(r)
    s1, s2 = sum(r), sum(v * v for v in r)
    mean, sigma = s1 // n, math.isqrt(max(n * s2 - s1 * s1, 0)) // n
    k, h = mean + sigma // 2, 3 * sigma
    s = na = ms = 0
    fa = -1
    for i, v in enumerate(r):
        s = max(0, s + v - k)
        ms = max(ms, s)
        if s > h:
            na += 1
            if fa < 0:
                fa = i
            s = 0
    assert got.iloc[0].to_dict() == {
        "n_days": n, "n_alarms": na, "first_alarm_idx": fa, "max_s": ms}


def test_corpus_assembly_planted(ray_session, tmp_path):
    """Gate, dedup, cap and mix each provably fire: a repetition doc
    and a 1-word doc are gated, an exact duplicate keeps only the min
    doc_id, a 5-doc source is capped to 2, and mix_k large keeps all."""
    import pyarrow.parquet as pq2

    from reddacted_ray.pipelines.corpus import (CorpusConfig,
                                                assemble_corpus)

    texts = [
        "one two three four five six",       # 0 survives (src a)
        "one two three four five six",       # 1 exact dup -> dropped
        "rep rep rep rep rep rep",           # 2 dup_word_frac 5/6
        "tiny",                              # 3 under min_words
        "alpha beta gamma delta eps one",    # 4 src b
        "alpha beta gamma delta eps two",    # 5 src b
        "alpha beta gamma delta eps three",  # 6 src b (capped out)
        "alpha beta gamma delta eps four",   # 7 src b (capped out)
        "alpha beta gamma delta eps five",   # 8 src b (capped out)
    ]
    src = ["a", "a", "a", "a", "b", "b", "b", "b", "b"]
    d = str(tmp_path)
    pq2.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(src, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    cfg = CorpusConfig(min_words=5, max_dup_word_frac=0.5,
                       cap_per_source=2, mix_k=1000)
    out = assemble_corpus(d, cfg).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 4, 5]
    assert list(out["rn"]) == [1, 1, 2]
    # deterministic rerun, with the survivor semi-join FORCED onto its
    # distributed Bloom+left_semi plan (REDD_BCAST_CAP=0): same corpus
    os.environ["REDD_BCAST_CAP"] = "0"
    try:
        out2 = assemble_corpus(d, cfg).to_pandas().sort_values("doc_id")
    finally:
        del os.environ["REDD_BCAST_CAP"]
    assert list(out2["doc_id"]) == [0, 4, 5]


def test_embedding_dim_stats_matches_numpy(ray_session):
    import pyarrow.parquet as pq2

    import __ray_entry__ as e

    got = (e.queries()["embedding_dim_stats"]("/root/testdata/sf0.001")
           .to_pandas().sort_values("dim"))
    x = np.asarray(pq2.read_table(
        "/root/testdata/sf0.001/embeddings.parquet")
        ["embedding"].to_pylist(), np.float64)
    np.testing.assert_allclose(got["mean"], x.mean(axis=0),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got["var"], x.var(axis=0),
                               rtol=0, atol=1e-10)


def test_job_cli_corpus_mode(crafted_dir, tmp_path):
    import json
    import subprocess
    import sys

    out = str(tmp_path / "corpus_out")
    proc = subprocess.run(
        [sys.executable, "-m", "reddacted_ray.job", "--mode", "corpus",
         "--input", crafted_dir, "--output", out,
         "--cap-per-source", "2", "--mix-k", "1000",
         "--num-cpus", "4"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "corpus"
    # session crafted docs: the empty, 1-word and <5-word docs are
    # gated; the duplicated fox doc keeps its min id (2); doc 6 sits
    # exactly AT dup_word_frac 0.5 (inclusive) -> survivors {2, 6}
    assert summary["rows"] == 2
    import pyarrow.dataset as pads

    ids = sorted(pads.dataset(out, format="parquet")
                 .to_table(columns=["doc_id"])["doc_id"].to_pylist())
    assert ids == [2, 6]


def test_ann_recall_deterministic(ray_session):
    import __ray_entry__ as e

    a = e.queries()["ann_recall_at_10"](
        "/root/testdata/sf0.001").to_pandas()
    b = e.queries()["ann_recall_at_10"](
        "/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert 0 <= a["n_hits"][0] <= 10
    assert a["recall_e2"][0] == a["n_hits"][0] * 10


@pytest.mark.parametrize("name", QUERIES)
def test_session4_match_oracle(ray_session, crafted_dir, name):
    import __ray_entry__ as e
    import ray.data as rd

    qs, oq = e.queries(), e.oracle_sql()
    got = qs[name](crafted_dir)
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events", "documents", "lineitem", "part",
              "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{crafted_dir}/{t}.parquet'")
    exp = con.sql(oq[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    if len(exp):
        assert sorted(got.columns) == sorted(exp.columns), name
        assert _value_hash(got) == _value_hash(exp), name


def test_dup_gram_share_planted(ray_session, crafted_dir):
    """The exact-duplicate doc pair must score 1e6; the doc whose only
    repeated gram lives within itself must score 0."""
    import __ray_entry__ as e

    got = e.queries()["dup_gram_share"](crafted_dir).to_pandas()
    by_id = got.set_index("doc_id")
    assert by_id.loc[2, "dup_share_e6"] == 1_000_000
    assert by_id.loc[3, "dup_share_e6"] == 1_000_000
    assert by_id.loc[4, "dup_share_e6"] == 0
    assert 1 not in by_id.index  # 7-char doc has no window
    assert 0 not in by_id.index  # empty doc has no window


def test_ranges_segmented_arange():
    from reddacted_ray.pipelines.queries import _ranges

    counts = np.array([3, 1, 4, 2], np.int64)
    expect = np.concatenate([np.arange(c) for c in counts])
    assert (_ranges(counts) == expect).all()
    assert (_ranges(np.array([1], np.int64)) == np.array([0])).all()


def test_bpe_train_and_encode():
    from reddacted_ray.functions.bpe import (encode, encoded_lengths,
                                             train_merges)

    # "abab" x2: pair (a,b) occurs 4x, (b,a) 2x -> merge (a,b) first,
    # then (ab,ab)
    merges = train_merges({"abab": 2}, 3)
    assert merges[:2] == [("a", "b"), ("ab", "ab")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode("abab", ranks) == ["abab"]
    assert encode("aba", ranks) == ["ab", "a"]
    assert encode("xyz", ranks) == ["x", "y", "z"]
    # frequency ties break to the lexicographically smallest pair
    assert train_merges({"ab": 1, "cd": 1}, 2) == [("a", "b"),
                                                   ("c", "d")]
    # memoized batch kernel agrees with the scalar encoder
    lens = encoded_lengths(["abab", "aba", "xyz"], merges)
    assert lens == {"abab": 1, "aba": 2, "xyz": 3}


def test_pca_top_component_matches_eigh(ray_session):
    import __ray_entry__ as e

    got = e.queries()["pca_top_component"](
        "/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq2
    x = np.asarray(pq2.read_table(
        "/root/testdata/sf0.001/embeddings.parquet")
        ["embedding"].to_pylist(), np.float64)
    cov = np.cov(x.T, bias=True)
    w, v = np.linalg.eigh(cov)
    ref = v[:, -1]
    g = got.sort_values("dim")["loading"].to_numpy()
    cos = abs(float(ref @ g)
              / (np.linalg.norm(ref) * np.linalg.norm(g)))
    assert cos > 1 - 1e-9
    assert abs(got["eigenvalue"][0] - w[-1]) < 1e-6 * max(1.0, w[-1])


def test_bpe_encode_stats_deterministic(ray_session):
    import __ray_entry__ as e

    a = (e.queries()["bpe_encode_stats"]("/root/testdata/sf0.001")
         .to_pandas().sort_values("lang").reset_index(drop=True))
    b = (e.queries()["bpe_encode_stats"]("/root/testdata/sf0.001")
         .to_pandas().sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_tokens"] <= a["n_words"] * 64).all()
    assert (a["n_tokens"] >= a["n_docs"]).all()
    assert (a["tokens_per_word_e6"] >= 1_000_000).all()
