"""Flagship pipeline: quality-filter + PII-scrub over the image+caption table.

Ray Data restatement of the reference's E1 analysis flow (SURVEY.md §3):

    read (pruned) -> map_batches(normalize F1-F4, stateless, fused) ->
    map_batches(Scorer actor pool: F5/F6/F8/F9/gate/F11/F13/F7 + langid/ppl)
    [-> filter(pii_only F12)] [-> write partitioned parquet]

The pipeline is lazy end-to-end: nothing materializes on the driver; consume
via ``write_output`` (partitioned, resumable) or the report aggregates
(``reddacted_ray.pipelines.report``). The wide ``bytes`` column streams
through zero-copy and is never decoded.

Scale notes (100 TB design intent):
  * normalize is a stateless task stage — elastic, fuses with the read;
  * the scorer defaults to stateless tasks with per-worker-process cached
    state (no actor-pool spin-up cliff; measured 1.7x faster end-to-end);
    pass ``concurrency=`` to run it as a bounded actor pool instead when
    per-worker state is heavyweight;
  * ``batch_size`` is row-based and modest because rows carry image bytes
    — blocks stay within ``target_max_block_size`` and the object store
    spills instead of OOMing;
  * no shuffle anywhere in this pipeline (dedup is a separate stage);
    output is one parquet file batch per block for resumability.
"""

from __future__ import annotations

from typing import Optional

import ray.data as rd
import pyarrow.compute as pc

from ..oracle import LabelerConfig
from ..sources.tables import read_table
from ..stages.normalize import make_normalize_fn
from ..stages.score import Scorer, make_scorer_fn

DEFAULT_BATCH_SIZE = 2048


DECIDE_READ_COLUMNS = ["image_id", "caption", "phash"]


def build(
    input_path: str,
    cfg: Optional[LabelerConfig] = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple[int, int] | int] = None,
    mode: str = "materialize",
    time_filter: str = "all",
    now=None,
    ts_col: str = "created_utc",
    sort: str = "new",
) -> rd.Dataset:
    """Construct the lazy quality-filter Dataset over an images table.

    ``mode="materialize"`` passes the full rows (incl. image ``bytes``)
    through to the sink — the copy-the-corpus run. ``mode="decide"`` prunes
    the binary column AT THE SCAN (only caption/id column chunks leave
    storage) and emits the decision + scrubbed-caption table; at 100 TB this
    is the standard shape — a later cheap step applies the id-keyed
    decisions (see ``q_remediate`` / reference K2-K4) instead of rewriting
    every pixel. Compute is identical in both modes.
    """
    cfg = cfg or LabelerConfig()
    columns = list(DECIDE_READ_COLUMNS) if mode == "decide" else None
    filter_expr = None
    # reference config key "sort" (cli.py:243-244, cli_config.py:19-25):
    # fetch order of the source listing. Non-"new" modes need the vote
    # columns in the input table (comment-shaped sources).
    SORT_COLS = {"top": ["upvotes"], "controversial": ["downvotes"],
                 "hot": ["upvotes", "downvotes"]}
    if sort not in ("new", *SORT_COLS):
        raise ValueError(f"sort must be one of new/{'/'.join(SORT_COLS)},"
                         f" got {sort!r}")
    if sort != "new" and columns is not None:
        columns += SORT_COLS[sort]
    if time_filter != "all":
        # reference config key "time" (cli_config.py:19-25): trailing-window
        # keep-filter, pushed to the parquet scan like the comment reader's
        from ..sources.comments import TIME_WINDOWS
        from ..sources.tables import coerce_anchor

        if time_filter not in TIME_WINDOWS:
            raise ValueError(f"unknown time_filter {time_filter!r}")
        if now is None:
            raise ValueError("time_filter requires an explicit 'now' anchor")
        import pyarrow.dataset as pads

        cutoff = coerce_anchor(now, input_path, ts_col)
        filter_expr = pads.field(ts_col) >= cutoff - TIME_WINDOWS[time_filter]
        if columns is not None:
            columns = columns + [ts_col]
    ds = read_table(input_path, columns=columns, filter_expr=filter_expr)
    if time_filter != "all":
        ds = ds.drop_columns([ts_col])
    limited = False
    if sort != "new":
        # sort+limit BEFORE the scoring stages (reference: analyze the
        # top-N of the sorted listing, not an arbitrary N)
        import pyarrow.compute as _pc

        if sort == "hot":
            ds = ds.map_batches(
                lambda t: t.append_column(
                    "_score", _pc.subtract(t["upvotes"], t["downvotes"])
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            ).sort(["_score", "image_id"], descending=[True, False]
                   ).drop_columns(["_score"])
        else:
            ds = ds.sort([SORT_COLS[sort][0], "image_id"],
                         descending=[True, False])
        if mode == "decide":
            ds = ds.drop_columns(SORT_COLS[sort])
        if cfg.limit:
            ds = ds.limit(cfg.limit)
            limited = True
    ds = ds.map_batches(
        make_normalize_fn(skip_text=cfg.skip_text, text_match=cfg.text_match),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if concurrency is not None:
        ds = ds.map_batches(
            Scorer,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        # stateless tasks + per-process cached state: no pool spin-up cliff
        ds = ds.map_batches(
            make_scorer_fn(cfg),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    # caption_clean is an inter-stage intermediate, not part of the output
    # schema (SURVEY.md §1.7) — dropping it saves ~20% of sink bytes. In
    # decide mode the original caption also stays behind (it lives in the
    # source; the decision table is id-keyed).
    ds = ds.drop_columns(
        ["caption_clean", "caption"] if mode == "decide" else ["caption_clean"]
    )
    if cfg.pii_only:
        # F12 (reference utils/report.py:50-63): keep rows with any risk signal
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.or_(pc.greater(t["pii_risk_score"], 0.0), t["gate_flag"])
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if cfg.limit and not limited:
        ds = ds.limit(cfg.limit)
    return ds


def make_decide_batch_fn(
    cfg: Optional[LabelerConfig] = None,
    qcfg=None,
    gate_drop: bool = False,
):
    """(read_columns, table->table chain) for the DECIDE pipeline — the
    pure per-batch composition ``build(mode="decide", sort="new")``
    applies (normalize -> scorer -> column drops -> optional pii_only /
    quality-gate filters), for runners that bypass the streaming
    executor (state/manifest.run_resumable_tasks, r5 VERDICT #7).
    Byte-equality with build() is test-locked. Only valid when the
    plan has no GLOBAL operator: sort="new", no limit, no time_filter
    (those need build())."""
    cfg = cfg or LabelerConfig()
    norm = make_normalize_fn(skip_text=cfg.skip_text,
                             text_match=cfg.text_match)
    score = make_scorer_fn(cfg)
    if qcfg is not None:
        from ..stages.quality_gate import quality_mask

    def chain(t):
        t = score(norm(t))
        t = t.drop_columns(["caption_clean", "caption"])
        if cfg.pii_only:
            t = t.filter(
                pc.or_(pc.greater(t["pii_risk_score"], 0.0), t["gate_flag"])
            )
        if qcfg is not None:
            mask = quality_mask(t, qcfg)
            t = t.append_column("keep_quality", mask)
            if gate_drop:
                t = t.filter(mask)
        return t

    return list(DECIDE_READ_COLUMNS), chain


def build_docs(
    sf_dir: str,
    cfg: Optional[LabelerConfig] = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[tuple[int, int] | int] = None,
) -> rd.Dataset:
    """The same flagship flow over a documents table (text plays caption)."""
    import os

    cfg = cfg or LabelerConfig()
    ds = read_table(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"])
    ds = ds.map_batches(
        make_normalize_fn(text_col="text", skip_text=cfg.skip_text,
                          text_match=cfg.text_match),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if concurrency is not None:
        return ds.map_batches(
            Scorer,
            fn_constructor_kwargs={"cfg": cfg, "id_col": "doc_id"},
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
            num_cpus=1,
        )
    return ds.map_batches(
        make_scorer_fn(cfg, id_col="doc_id"),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def apply_decisions(
    input_path: str,
    decisions: rd.Dataset,
    num_partitions: int = 16,
    keep_only: bool = True,
) -> rd.Dataset:
    """Decide-mode phase 2 (reference K2 write path, ``api/reddit.py:
    193-255``): hash-join the id-keyed decision table (keep +
    caption_scrubbed) back onto the FULL-byte table and emit the surviving
    rows with their pixels untouched and captions replaced by the scrubbed
    text. Phase 1 (``build(mode="decide")``) never reads the bytes; this
    pass reads them exactly once — together they make the 100 TB shape
    BASELINE.md describes: analyze cheap, rewrite once.

    Both sides are large → native hash-partitioned join on image_id (no
    broadcast); raise ``num_partitions`` with cluster size."""
    import pyarrow as pa

    full = read_table(input_path)
    slim = decisions.map_batches(
        lambda t: t.select(["image_id", "keep", "caption_scrubbed"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = full.join(
        slim, join_type="inner", num_partitions=num_partitions,
        on=("image_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if keep_only:
            t = t.filter(t["keep"])
        idx = t.schema.get_field_index("caption")
        t = t.set_column(idx, "caption", t["caption_scrubbed"])
        return t.drop_columns(["caption_scrubbed", "keep"])

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def apply_decisions_colocated(
    input_dir: str,
    decisions_dir: str,
    out_dir: str,
    keep_only: bool = True,
) -> dict:
    """ZERO-SHUFFLE apply (the 100 TB phase-2 shape): a decide-mode
    RESUMABLE run already wrote its decision table partitioned by
    provenance — ``decisions_dir/partition_id=K/`` plus a manifest naming
    each partition's input files. Apply therefore needs no global join at
    all: one Ray task per partition reads THAT partition's input files and
    its decision directory and joins them in memory (Acero, both sides
    partition-sized). The image bytes never enter an all-to-all exchange —
    vs ``apply_decisions``'s hash join, which shuffles the full-byte table.
    Output is written atomically per partition; a rerun skips completed
    partitions (resumable apply).

    Requires ``decisions_dir`` to hold a ``manifest.jsonl`` (i.e. decide
    ran with ``--resumable``); callers without one use ``apply_decisions``.
    """
    import os

    import pyarrow as pa
    import ray

    from ..state.manifest import Manifest, _AtomicDir

    mf = Manifest(decisions_dir)
    done = mf.completed()
    if not done:
        raise ValueError(
            f"{decisions_dir!r} has no manifest.jsonl partitions — run the"
            " decide phase with --resumable, or use apply_decisions()"
        )
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _apply(pid: str, input_files: list, dec_dir: str, final_dir: str) -> int:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        full = pa.concat_tables([pq.read_table(p) for p in input_files])
        dec = pads.dataset(dec_dir, format="parquet").to_table(
            columns=["image_id", "keep", "caption_scrubbed"]
        )
        j = full.join(dec, keys=["image_id"], join_type="inner")
        if keep_only:
            j = j.filter(j["keep"])
        idx = j.schema.get_field_index("caption")
        j = j.set_column(idx, "caption", j["caption_scrubbed"])
        j = j.drop_columns(["caption_scrubbed", "keep"])
        with _AtomicDir(final_dir) as tmp:
            pq.write_table(j, os.path.join(tmp, "part-0.parquet"))
        return j.num_rows

    refs = []
    skipped = 0
    for pid, rec in sorted(done.items()):
        final_dir = os.path.join(out_dir, f"partition_id={pid}")
        if os.path.isdir(final_dir):
            skipped += 1
            continue
        files = [os.path.join(input_dir, f) for f in rec["input_files"]]
        refs.append(
            _apply.remote(pid, files, mf.partition_dir(pid), final_dir)
        )
    rows = sum(ray.get(refs)) if refs else 0
    return {
        "partitions_ran": len(refs),
        "partitions_skipped": skipped,
        "rows_out": rows,
        "output": out_dir,
    }


def write_output(ds: rd.Dataset, out_dir: str) -> None:
    """Partitioned parquet sink (many part files -> resumable/idempotent;
    see ``reddacted_ray.state.manifest`` for the partition manifest)."""
    ds.write_parquet(out_dir)
