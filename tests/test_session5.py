"""Round-5 additions: exact big-int reductions (VERDICT #1), bounded
per-source cap shuffles (VERDICT #2), distributed dup clustering
(VERDICT #3), covering-sentinel version guard (VERDICT #5), vectorized
mix/matrix paths (VERDICT #6), utf-8 gram keys (ADVICE #1)."""

import numpy as np
import pyarrow as pa
import pytest

from reddacted_ray.functions.exactmath import (
    combine_i128,
    exact_prod_sum,
    split_i128,
)


class TestExactProdSum:
    def test_matches_python_bigints_past_int64_wrap(self):
        # centered ranks at N = 1e9: |a0| ~ 1e9, products ~ 1e18 each;
        # 32 of them already exceed 2^63 ~ 9.2e18 — naive np.sum wraps.
        rng = np.random.RandomState(7)
        a = rng.randint(-(10**9), 10**9, size=4096).astype(np.int64)
        b = rng.randint(-(10**9), 10**9, size=4096).astype(np.int64)
        want = sum(int(x) * int(y) for x, y in zip(a, b))
        assert exact_prod_sum(a, b) == want
        naive = int(np.sum(a * a))  # demonstrably wrapped
        exact = exact_prod_sum(a, a)
        assert exact == sum(int(x) * int(x) for x in a)
        assert naive != exact  # the bug this fix closes

    def test_squares_all_negative_and_edges(self):
        a = np.array([-(3 * 10**9), 3 * 10**9, 0, 1, -1], np.int64)
        assert exact_prod_sum(a, a) == sum(int(x) ** 2 for x in a)

    def test_empty(self):
        z = np.array([], np.int64)
        assert exact_prod_sum(z, z) == 0

    def test_loud_overflow_guard(self):
        a = np.array([4 * 10**9], np.int64)
        with pytest.raises(OverflowError):
            exact_prod_sum(a, a)

    def test_split_combine_roundtrip_and_linearity(self):
        vals = [0, 1, -1, 2**63, -(2**63), 123456789012345678901,
                -(10**27) // 7]
        for v in vals:
            hi, lo = split_i128(v)
            assert 0 <= lo < 2**32
            assert combine_i128(hi, lo) == v
        # linearity: summing halves separately == summing values
        his, los = zip(*(split_i128(v) for v in vals))
        assert combine_i128(sum(his), sum(los)) == sum(vals)


class TestPerGroupHeadPrune:
    def test_hot_source_cap_identical_to_unpruned(self, ray_session):
        # one source holds 90% of rows (the dominant-crawl shape the
        # prune exists for); pruned plan == full-table pandas answer
        import pandas as pd
        import ray.data as rd

        from reddacted_ray.stages.windows import (
            grouped_vectorized,
            per_group_head_prune,
        )

        rng = np.random.RandomState(3)
        n, cap = 20000, 17
        src = rng.randint(0, 20, n).astype(np.int64)
        src[rng.rand(n) < 0.9] = 5
        df = pd.DataFrame({"source": src,
                           "doc_id": rng.permutation(n).astype(np.int64)})
        ds = rd.from_pandas(df).repartition(8)

        def capfn(g: pd.DataFrame) -> pd.DataFrame:
            gg = g.sort_values(["source", "doc_id"], kind="mergesort")
            rn = gg.groupby("source", sort=False).cumcount() + 1
            out = gg[rn <= cap].copy()
            out["rn"] = rn[rn <= cap].astype(np.int64)
            return out

        got = (grouped_vectorized(
            per_group_head_prune(ds, "source", "doc_id", cap),
            "source", capfn)
            .to_pandas().sort_values(["source", "doc_id"])
            .reset_index(drop=True))

        exp = capfn(df).sort_values(["source", "doc_id"]).reset_index(
            drop=True)
        pd.testing.assert_frame_equal(got[exp.columns], exp)

    def test_prune_keeps_small_blocks_whole(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from reddacted_ray.stages.windows import per_group_head_prune

        df = pd.DataFrame({"source": [1, 1, 2], "doc_id": [3, 1, 2]})
        ds = per_group_head_prune(rd.from_pandas(df), "source", "doc_id", 5)
        assert ds.count() == 3


class TestCoveringSentinelGuard:
    @pytest.mark.parametrize("nparts", [16, 64, 256])
    def test_fallback_matches_ray_hash_partition(self, nparts):
        # the pure-pyarrow fallback must assign every probe key to the
        # SAME partition Ray's private hash_partition does, and cover
        # all partitions (r5 VERDICT #5)
        from ray.data._internal.arrow_ops.transform_pyarrow import (
            hash_partition,
        )

        from reddacted_ray.stages.joins import _fallback_first_keys

        t = pa.table({"k": pa.array(list(range(-4096, 0)), pa.int64())})
        parts = hash_partition(t, hash_cols=["k"], num_partitions=nparts)
        ray_assign = {}
        for p, tab in parts.items():
            for v in tab["k"].to_pylist():
                ray_assign.setdefault(v, p)
        fb = _fallback_first_keys(t, nparts)
        assert len(fb) == nparts  # covering
        for p, key in fb.items():
            assert ray_assign[key] == p

    def test_covering_sentinels_unchanged(self):
        # the guarded path returns the same sorted keys as before
        from reddacted_ray.stages.joins import covering_sentinels

        keys = covering_sentinels(16, pa.int64())
        assert len(keys) == 16
        assert all(k < 0 for k in keys)


class TestVectorizedMatrixPaths:
    def test_as_matrix_zero_copy_equals_pylist(self):
        from reddacted_ray.stages.similarity import _as_matrix

        rng = np.random.RandomState(5)
        m = rng.normal(size=(37, 16)).astype(np.float32)
        col = pa.chunked_array([pa.array(list(r) for r in m[:20]),
                                pa.array(list(r) for r in m[20:])])
        got = _as_matrix(col)
        assert got.shape == (37, 16)
        np.testing.assert_array_equal(got, m)

    def test_as_matrix_ragged_fallback(self):
        from reddacted_ray.stages.similarity import _as_matrix

        col = pa.array([[1.0, 2.0], [3.0, 4.0]])
        np.testing.assert_array_equal(
            _as_matrix(col), np.array([[1, 2], [3, 4]], np.float32))

    def test_pack_rows_binary_byte_identical(self):
        from reddacted_ray.stages.similarity import _pack_rows_binary

        rng = np.random.RandomState(6)
        m = rng.normal(size=(11, 8)).astype(np.float32)
        arr = _pack_rows_binary(m)
        assert arr.to_pylist() == [r.tobytes() for r in m]
        assert arr.type == pa.binary()


class TestByteGramRows:
    def _grams(self, texts):
        from reddacted_ray.pipelines.queries import _byte_gram_rows

        return _byte_gram_rows(pa.chunked_array([pa.array(texts)]))

    def test_ascii_matches_char_windows(self):
        texts = ["abcdefghij", "short", "exactly8!", ""]
        rowix, keys = self._grams(texts)
        exp = []
        for i, s in enumerate(texts):
            for j in range(max(len(s) - 7, 0)):
                exp.append((i, int.from_bytes(
                    s[j:j + 8].encode(), "little", signed=True)))
        got = sorted(zip(rowix.tolist(), keys.tolist()))
        assert got == sorted(exp)

    def test_non_ascii_no_crash_byte_windows(self):
        # r4 ADVICE #1: lang='zh' docs used to raise UnicodeEncodeError
        texts = ["中文文档内容测试字符串", "ascii doc here", "é" * 10]
        rowix, keys = self._grams(texts)
        assert len(rowix) == len(keys) > 0
        # byte-window count per doc = utf8_bytes - 7
        import numpy as np
        counts = np.bincount(rowix, minlength=3)
        for i, s in enumerate(texts):
            assert counts[i] == max(len(s.encode("utf-8")) - 7, 0)

    def test_sliced_chunk_offsets(self):
        from reddacted_ray.pipelines.queries import _byte_gram_rows

        base = pa.array(["0123456789abcdef", "xxxxxxxxyyyyyyyy", "zz"])
        sliced = base.slice(1, 2)  # non-zero array offset
        rowix, keys = _byte_gram_rows(sliced)
        exp_first = int.from_bytes(b"xxxxxxxx", "little", signed=True)
        assert keys[0] == exp_first
        assert (rowix == 0).sum() == 9  # 16 bytes -> 9 windows


class TestRunResumableTasks:
    def _read(self, out):
        import ray.data as rd

        return (rd.read_parquet(out, file_extensions=["parquet"])
                .to_pandas().sort_values("image_id").reset_index(drop=True))

    def test_byte_equality_with_dataset_build(self, ray_session, synth_dir,
                                              tmp_path):
        import pandas as pd

        from reddacted_ray.oracle import LabelerConfig
        from reddacted_ray.pipelines.quality_filter import (
            build,
            make_decide_batch_fn,
        )
        from reddacted_ray.state.manifest import run_resumable_tasks

        cfg = LabelerConfig()
        cols, chain = make_decide_batch_fn(cfg)
        out = str(tmp_path / "dec")
        s = run_resumable_tasks(synth_dir, out, chain, read_columns=cols,
                                files_per_partition=2)
        assert s["partitions_ran"] == s["partitions_total"] > 0
        got = self._read(out)
        assert "partition_id" in got.columns  # per-row lineage intact
        exp = (build(synth_dir, cfg=cfg, mode="decide").to_pandas()
               .sort_values("image_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp)

    def test_resume_skips_completed_and_finishes_interrupted(
            self, ray_session, synth_dir, tmp_path):
        from reddacted_ray.oracle import LabelerConfig
        from reddacted_ray.pipelines.quality_filter import (
            make_decide_batch_fn,
        )
        from reddacted_ray.state.manifest import run_resumable_tasks

        cols, chain = make_decide_batch_fn(LabelerConfig())
        out = str(tmp_path / "dec2")
        # interrupted run: only 1 partition completes
        s1 = run_resumable_tasks(synth_dir, out, chain, read_columns=cols,
                                 files_per_partition=2, max_partitions=1)
        assert s1["partitions_ran"] == 1
        # resume: finishes the rest, skipping the committed one
        s2 = run_resumable_tasks(synth_dir, out, chain, read_columns=cols,
                                 files_per_partition=2)
        assert s2["partitions_skipped"] == 1
        assert s2["partitions_ran"] == s2["partitions_total"] - 1
        # idempotent rerun: everything skips
        s3 = run_resumable_tasks(synth_dir, out, chain, read_columns=cols,
                                 files_per_partition=2)
        assert s3["partitions_ran"] == 0
        assert s3["partitions_skipped"] == s3["partitions_total"]
        full = self._read(out)
        fresh_out = str(tmp_path / "dec3")
        run_resumable_tasks(synth_dir, fresh_out, chain, read_columns=cols,
                            files_per_partition=2)
        import pandas as pd

        pd.testing.assert_frame_equal(full, self._read(fresh_out))


class TestTaskRunnerColocatedApply:
    def test_apply_colocated_on_task_runner_output(self, ray_session,
                                                   synth_dir, tmp_path):
        # the task runner's layout (partition dirs + manifest + per-row
        # partition_id) must keep feeding the zero-shuffle apply phase
        import ray.data as rd

        from reddacted_ray.oracle import LabelerConfig
        from reddacted_ray.pipelines.quality_filter import (
            apply_decisions,
            apply_decisions_colocated,
            make_decide_batch_fn,
        )
        from reddacted_ray.state.manifest import run_resumable_tasks

        cols, chain = make_decide_batch_fn(LabelerConfig())
        dec = str(tmp_path / "dec")
        run_resumable_tasks(synth_dir, dec, chain, read_columns=cols,
                            files_per_partition=2)
        out = str(tmp_path / "applied")
        apply_decisions_colocated(synth_dir, dec, out)
        got = (rd.read_parquet(out, file_extensions=["parquet"])
               .to_pandas().sort_values("image_id").reset_index(drop=True))
        exp = (apply_decisions(
            synth_dir, rd.read_parquet(dec, file_extensions=["parquet"]))
            .to_pandas().sort_values("image_id").reset_index(drop=True))
        import pandas as pd

        pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


class TestRound5Properties:
    def test_byte_gram_rows_fuzz_vs_python(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from reddacted_ray.pipelines.queries import _byte_gram_rows

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.text(max_size=24), max_size=12))
        def check(texts):
            rowix, keys = _byte_gram_rows(
                pa.chunked_array([pa.array(texts, pa.string())]))
            exp = []
            for i, s in enumerate(texts):
                b = s.encode("utf-8")
                for j in range(max(len(b) - 7, 0)):
                    exp.append((i, int.from_bytes(b[j:j + 8], "little",
                                                  signed=True)))
            assert sorted(zip(rowix.tolist(), keys.tolist())) == sorted(exp)

        check()

    def test_exact_prod_sum_fuzz(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from reddacted_ray.functions.exactmath import exact_prod_sum

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.tuples(
            st.integers(-(3 * 10**9), 3 * 10**9),
            st.integers(-(3 * 10**9), 3 * 10**9)), max_size=50))
        def check(pairs):
            a = np.array([p[0] for p in pairs], np.int64)
            b = np.array([p[1] for p in pairs], np.int64)
            assert exact_prod_sum(a, b) == sum(
                int(x) * int(y) for x, y in pairs)

        check()

    def test_head_prune_fuzz_vs_pandas(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from reddacted_ray.stages.windows import (
            grouped_vectorized,
            per_group_head_prune,
        )

        @settings(max_examples=12, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 4),
                                  st.integers(0, 10**6)),
                        min_size=1, max_size=120, unique_by=lambda p: p[1]),
               st.integers(1, 6))
        def check(rows, cap):
            df = pd.DataFrame(rows, columns=["g", "o"]).astype(np.int64)

            def capfn(g: pd.DataFrame) -> pd.DataFrame:
                gg = g.sort_values(["g", "o"], kind="mergesort")
                rn = gg.groupby("g", sort=False).cumcount() + 1
                return gg[rn <= cap]

            got = (grouped_vectorized(
                per_group_head_prune(
                    rd.from_pandas(df).repartition(3), "g", "o", cap),
                "g", capfn)
                .to_pandas().sort_values(["g", "o"])
                .reset_index(drop=True))
            exp = capfn(df).sort_values(["g", "o"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got[["g", "o"]], exp[["g", "o"]])

        check()


class TestSpearmanExactPartials:
    def test_partials_exact_at_wrap_scale(self, ray_session):
        # drive the EXACT code shape q_spearman uses: centered-rank
        # lookups whose per-block square-sum wraps int64, shipped as
        # hi/lo pairs and recombined on the driver.
        rng = np.random.RandomState(11)
        a = rng.randint(-(10**9), 10**9, size=20000).astype(np.int64)
        b = rng.randint(-(10**9), 10**9, size=20000).astype(np.int64)
        hi_a, lo_a = split_i128(exact_prod_sum(a[:10000], b[:10000]))
        hi_b, lo_b = split_i128(exact_prod_sum(a[10000:], b[10000:]))
        got = combine_i128(hi_a + hi_b, lo_a + lo_b)
        assert got == sum(int(x) * int(y) for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# batch-6 statistics operators: kendall tau-b, Welch t, Bowley skew,
# cluster sampling, event trigrams — crafted edge-case oracle parity
# ---------------------------------------------------------------------------

BATCH6 = ["kendall_tau", "welch_priority", "bowley_skew_by_flag",
          "cluster_sample_orders", "event_trigrams",
          "cramers_v", "gk_lambda", "hourly_profile_cosine",
          "lorenz_deciles", "l_diversity", "dup_invoices",
          "decile_ratio_by_type", "cohort_revenue_curve",
          "prop_ztest_status", "qty_price_monotonicity"]


def _b6_value_hash(df):
    import hashlib

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
def batch6_dir(tmp_path_factory):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("s5_b6"))
    DAYUS = 86_400_000_000
    # orders: URGENT/LOW with >=2 rows each (Welch needs n-1 > 0),
    # rounding .5 ties, plus custkeys 27/59 (inside the 5% md5 sample)
    # and 1/2 (outside)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(8), pa.int64()),
        "o_custkey": pa.array([27, 59, 1, 2, 27, 1, 2, 59], pa.int64()),
        "o_totalprice": pa.array(
            # orders 3 + 6: same (custkey 2, 50.25) -> dup invoice pair
            [100.5, 99.5, 200.0, 50.25, 75.0, 300.5, 50.25, 20.0],
            pa.float64()),
        "o_orderdate": pa.array([18000 * DAYUS] * 8, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "5-LOW", "1-URGENT", "5-LOW",
             "2-HIGH", "1-URGENT", "5-LOW", "3-MEDIUM"], pa.string()),
    }), os.path.join(d, "orders.parquet"))
    # lineitem: ties in BOTH kendall dims (duplicate cells), a
    # tied-on-one-axis pair (neither conc nor disc), a flag group with
    # zero quartile spread (bowley NULL branch) and one with spread
    qty = [1.0, 1.0, 2.0, 2.0, 3.0, 1.0, 3.0, 2.0]
    dsc = [0.00, 0.05, 0.05, 0.00, 0.10, 0.05, 0.00, 0.10]
    price = [10.0, 10.0, 10.0, 10.0, 10.0, 20.0, 30.0, 40.5]
    flag = ["A", "A", "A", "N", "N", "N", "N", "R"]
    status = ["O", "F", "O", "F", "O", "F", "O", "O"]
    pq.write_table(pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_discount": pa.array(dsc, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_returnflag": pa.array(flag, pa.string()),
        "l_linestatus": pa.array(status, pa.string()),
    }), os.path.join(d, "lineitem.parquet"))
    # customer: nations with modal-count ties (gk_lambda), a customer
    # with no orders (l_diversity inner-attach drops it), quasi-groups
    # below and above l = 3
    pq.write_table(pa.table({
        "c_custkey": pa.array([27, 59, 1, 2, 99], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 1, 2], pa.int64()),
        "c_mktsegment": pa.array(
            ["BUILDING", "MACHINERY", "BUILDING", "BUILDING",
             "MACHINERY"], pa.string()),
    }), os.path.join(d, "customer.parquet"))
    # events: ts ties (event_id tiebreak), a 2-event user (no triple),
    # a 3-event user (exactly one triple), a 5-event user
    base = 1_700_000_000_000_000
    MIN = 60_000_000
    ev = [
        (0, base, 1, "view"), (1, base, 1, "click"),       # tie pair
        (2, base + MIN, 1, "view"), (3, base + 2 * MIN, 1, "purchase"),
        (4, base + 3 * MIN, 1, "view"),
        (5, base, 2, "view"), (6, base + MIN, 2, "click"),
        (7, base, 3, "view"), (8, base + MIN, 3, "view"),
        (9, base + 2 * MIN, 3, "view"),
        # hour with only views (b = 0) and hour with only clicks
        # (a = 0) — zero-coordinate cosine cells
        (10, base + 120 * MIN, 1, "view"),
        (11, base + 121 * MIN, 1, "view"),
        (12, base + 180 * MIN, 2, "click"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in ev], pa.int64()),
        "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in ev], pa.int64()),
        "event_type": pa.array([r[3] for r in ev], pa.string()),
        "value": pa.array([1.0] * len(ev), pa.float64()),
    }), os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH6)
def test_batch6_match_oracle(ray_session, batch6_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch6_dir)
    if isinstance(got, rd.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events", "lineitem", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch6_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _b6_value_hash(got) == _b6_value_hash(exp), name


def test_kendall_crafted_values(ray_session, batch6_dir):
    """Hand-checkable tau pieces: the all-ties cell pair contributes
    nothing; the bowley NULL branch fires for the constant-N... (see
    fixture comments)."""
    import __ray_entry__ as e

    got = e.queries()["kendall_tau"](batch6_dir).to_pandas()
    n = int(got["n"][0])
    assert n == 8
    c, d = int(got["concordant"][0]), int(got["discordant"][0])
    n0 = n * (n - 1) // 2
    assert 0 < c <= n0 and 0 < d <= n0 and c + d <= n0
    assert -1.0 <= float(got["tau_b"][0]) <= 1.0


def test_bowley_null_spread_group(ray_session, batch6_dir):
    import __ray_entry__ as e

    got = (e.queries()["bowley_skew_by_flag"](batch6_dir)
           .to_pandas().set_index("flag"))
    # flag A: cents all 1000 -> q3 == q1 -> NULL skew
    assert got.loc["A", "q1"] == got.loc["A", "q3"] == 1000
    assert np.isnan(got.loc["A", "bowley"])
    assert not np.isnan(got.loc["N", "bowley"])


class TestSession3Kernels:
    def test_grouped_sums_max_cols(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from reddacted_ray.stages.agg import grouped_sums

        rng = np.random.RandomState(3)
        df = pd.DataFrame({
            "g": rng.randint(0, 7, 5000),
            "v": rng.randint(-1000, 1000, 5000).astype(np.int64),
        })
        got = grouped_sums(
            rd.from_pandas(df.assign(v2=df["v"])),
            ["g"], ["v"], count_alias="n", max_cols=["v2"])
        got = got.to_pandas().set_index("g").sort_index()
        exp = (df.assign(v2=df["v"]).groupby("g")
               .agg(v=("v", "sum"), v2=("v2", "max"), n=("v", "size")))
        for g in exp.index:
            assert int(got.loc[g, "v"]) == int(exp.loc[g, "v"])
            assert int(got.loc[g, "v2"]) == int(exp.loc[g, "v2"])
            assert int(got.loc[g, "n"]) == int(exp.loc[g, "n"])

    def test_gram3_keys_reference_and_order(self):
        import pyarrow as pa

        from reddacted_ray.pipelines.queries import _gram3_keys

        texts = ["hello world", "ab", "", "abcabc", "zzz", None]
        arr = pa.array([t if t is not None else "" for t in texts],
                       pa.string())
        keys = _gram3_keys(arr)
        ref = []
        for t in texts:
            t = t or ""
            b = t.encode("utf-8")
            for i in range(max(len(b) - 2, 0)):
                w = b[i:i + 3]
                ref.append((w[0] << 16) | (w[1] << 8) | w[2])
        assert list(keys) == ref
        # big-endian packing: integer order == lexicographic byte order
        grams = sorted({t[i:i + 3] for t in texts if t
                        for i in range(len(t) - 2)})
        packed = [(ord(g[0]) << 16) | (ord(g[1]) << 8) | ord(g[2])
                  for g in grams]
        assert packed == sorted(packed)

    def test_anova_f_fixed_order_tree(self):
        import pandas as pd

        from reddacted_ray.pipelines.queries import _anova_f

        g = pd.DataFrame(
            {"n": [3, 4, 5], "s": [30, 20, 100], "s2": [400, 150, 2200]},
            index=["a", "b", "c"])
        nn, ssb, ssw, f = _anova_f(g, ["a", "b", "c"])
        assert nn == 12
        # mirror by hand with explicit left-assoc order
        t = (30.0 * 30.0 / 3.0 + 20.0 * 20.0 / 4.0)
        t = t + 100.0 * 100.0 / 5.0
        exp_ssb = t - (150.0 * 150.0 / 12.0)
        exp_ssw = 2750.0 - t
        assert ssb == exp_ssb and ssw == exp_ssw
        assert f == (exp_ssb / 2.0) / (exp_ssw / 9.0)

    def test_lcm50_constant(self):
        import math

        from reddacted_ray.pipelines.queries import _LCM50

        assert _LCM50 == math.lcm(*range(1, 51))


BATCH7 = ["theil_sen_slope", "runs_test_daily", "ordinal_patterns",
          "gmd_by_segment", "mcnemar_years", "readability_by_lang",
          "chao1_vocab", "simpson_diversity_by_lang", "langid_prf",
          "monetary_unit_sample", "cochran_q_years", "langid_kappa",
          "iqr_outliers_by_flag", "effective_sources_e4",
          "span_corruption_stats", "grouped_regr_by_flag",
          "tokenizer_oov_rate", "dup_rate_by_source",
          "bootstrap_means"]


@pytest.fixture(scope="module")
def batch7_dir(tmp_path_factory):
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("b7"))
    # orders: 8 days over 3 months; one day's doubled value EQUALS the
    # doubled median (runs-test drop branch), consecutive EQUAL days
    # (ordinal code 0), a 1994-only / 1995-only / both / 1996-only
    # customer split for McNemar (zero-both is avoided; b=c exercises
    # the |b-c|-1 = -1 square)
    rows = [
        ("1994-01-03", 100.00, 1), ("1994-01-04", 100.00, 1),
        ("1994-02-05", 50.00, 2), ("1994-02-17", 150.00, 2),
        ("1994-03-02", 300.00, 3), ("1995-01-09", 40.00, 3),
        ("1995-02-11", 260.00, 4), ("1996-03-14", 120.00, 5),
    ]
    import datetime as dt

    pq.write_table(pa.table({
        "o_orderkey": pa.array(
            [7 * i + 3 for i in range(len(rows))], pa.int64()),
        "o_orderdate": pa.array(
            [dt.datetime.strptime(r[0], "%Y-%m-%d") for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_custkey": pa.array([r[2] for r in rows], pa.int64()),
    }), os.path.join(d, "orders.parquet"))
    # customer: negative balances, exact ties, a singleton segment
    # (GMD undefined -> dropped by the n>1 guard on both sides)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "c_mktsegment": pa.array(
            ["AUTO", "AUTO", "AUTO", "HOUSE", "HOUSE", "SOLO"],
            pa.string()),
        "c_acctbal": pa.array(
            [-999.99, 0.00, 0.00, 123.45, 678.90, 5.00], pa.float64()),
    }), os.path.join(d, "customer.parquet"))
    # documents: empty text, no terminators (sents = 0 branch),
    # multi-punct runs, uppercase vowels
    # lineitem: flag A rich enough for quartiles + two extreme
    # outliers; flag Z has n < 4 (dropped by the IQR n>=4 guard)
    qty_a = [10, 11, 11, 12, 12, 12, 13, 13, 14, 15, 1, 50]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A"] * len(qty_a) + ["Z"] * 3,
                                 pa.string()),
        "l_quantity": pa.array([float(q) for q in qty_a]
                               + [5.0, 6.0, 7.0], pa.float64()),
        "l_extendedprice": pa.array(
            [float(100 * q + 13 * (i % 5)) for i, q in
             enumerate(qty_a + [5, 6, 7])], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "source": pa.array(["web", "web", "web", "cc", "cc",
                            "books"], pa.string()),
        "lang": pa.array(["en", "en", "de", "xx", "en", "de"],
                         pa.string()),
        "text": pa.array([
            "One two three. Four five!! Six?",
            "no terminators here just words",
            "AEIOU aeiou bcd xyz.",
            "",
            "alpha beta alpha gamma beta alpha.",  # tf 2 hits f2
            "delta delta  doppel",  # double space: empty token kept
        ], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", BATCH7)
def test_batch7_match_oracle(ray_session, batch7_dir, name):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as e

    got = e.queries()[name](batch7_dir)
    if isinstance(got, (rd.Dataset,)):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer", "documents", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{batch7_dir}/{t}.parquet'")
    exp = con.sql(e.oracle_sql()[name]).df()
    assert len(got) == len(exp), (name, len(got), len(exp))
    assert sorted(got.columns) == sorted(exp.columns), name
    assert _b6_value_hash(got) == _b6_value_hash(exp), name


def test_gmd_matches_bruteforce_pairs(ray_session, batch7_dir):
    """Rank-sum identity == literal mean |xi - xj| over all pairs."""
    import itertools

    import __ray_entry__ as e

    got = e.queries()["gmd_by_segment"](batch7_dir).to_pandas()
    bal = {"AUTO": [-99999, 0, 0], "HOUSE": [12345, 67890]}
    for seg, xs in bal.items():
        pairs = list(itertools.combinations(xs, 2))
        want = sum(abs(a - b) for a, b in pairs) * 2 * 100 // (
            len(xs) * (len(xs) - 1))
        row = got[got["seg"] == seg]
        assert int(row["gmd_e2"].iloc[0]) == want, seg
    assert "SOLO" not in set(got["seg"])  # singleton dropped


def test_theil_sen_matches_bruteforce(ray_session, batch7_dir):
    import itertools

    import __ray_entry__ as e

    got = e.queries()["theil_sen_slope"](batch7_dir).to_pandas()
    # month cents series from the fixture
    mon = {1994 * 12 + 1: 20000, 1994 * 12 + 2: 20000,
           1994 * 12 + 3: 30000, 1995 * 12 + 1: 4000,
           1995 * 12 + 2: 26000, 1996 * 12 + 3: 12000}
    ms = sorted(mon)
    slopes = sorted(
        (mon[b] - mon[a]) / (b - a)
        for a, b in itertools.combinations(ms, 2))
    n = len(slopes)
    want = (slopes[(n - 1) // 2] + slopes[n // 2]) / 2
    assert float(got["theil_sen"].iloc[0]) == want
    assert int(got["n_pairs"].iloc[0]) == n
