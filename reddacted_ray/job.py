"""Job entrypoint — the ``ray job submit`` surface of the engine.

Mirrors the reference's config surface (SURVEY.md §1.5: env vars -> config
file -> CLI flags, ``cli_config.py:82-113`` merge order) for the batch
quality-filter pipeline. Run on a cluster as:

    ray job submit -- python -m reddacted_ray.job \
        --input /data/images --output /out/run1 --resumable

or locally (the script owns its Ray session; the driver-facing
``__ray_entry__`` module never calls ray.init — only entry points like
this one do).

Env vars (lowest precedence): REDD_INPUT, REDD_OUTPUT, REDD_SKIP_TEXT,
REDD_PII_ONLY, REDD_LIMIT, REDD_TEXT_MATCH, REDD_SCRUB_MODE,
REDD_BATCH_SIZE. Then --config JSON file, then explicit flags.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ENV_VARS_MAP = {
    "REDD_INPUT": "input",
    "REDD_OUTPUT": "output",
    "REDD_SKIP_TEXT": "skip_text",
    "REDD_PII_ONLY": "pii_only",
    "REDD_LIMIT": "limit",
    "REDD_TEXT_MATCH": "text_match",
    "REDD_SCRUB_MODE": "scrub_mode",
    "REDD_BATCH_SIZE": "batch_size",
    # reference config key "time" (cli_config.py:19-25): trailing-window
    # keep-filter for timestamped sources (see sources/comments.py)
    "REDD_TIME_FILTER": "time_filter",
    # reference config key "sort" (cli.py:243-244): source listing order
    "REDD_SORT": "sort",
    # quality-gate knobs (graft: lang/ppl thresholds, Gopher repetition
    # caps, C4 blocklist — stages/quality_gate.py)
    "REDD_ALLOWED_LANGS": "allowed_langs",
    "REDD_MAX_PPL": "max_ppl",
    "REDD_MIN_LANG_CONF": "min_lang_conf",
    "REDD_MAX_DUP_FRAC": "max_dup_frac",
    "REDD_MAX_BIGRAM_SHARE": "max_bigram_share",
    "REDD_BLOCKLIST": "blocklist",
    "REDD_GATE_DROP": "gate_drop",
}

_BOOLS = {"pii_only", "resumable", "emit_errors", "gate_drop"}
_INTS = {"limit", "batch_size", "num_cpus", "files_per_partition",
         "concurrent_partitions", "min_rows_per_file", "max_rows_per_file"}
_FLOATS = {"max_ppl", "min_lang_conf", "max_dup_frac", "max_bigram_share"}


def merge_configs(env: dict, file_cfg: dict, flags: dict) -> dict:
    """env -> config file -> flags (later wins; reference cli_config.py:82-113)."""
    out: dict = {}
    for layer in (env, file_cfg, flags):
        for k, v in layer.items():
            if v is None:
                continue
            if k in _BOOLS and isinstance(v, str):
                v = v.lower() in ("1", "true", "yes")
            if k in _INTS and isinstance(v, str):
                v = int(v)
            if k in _FLOATS and isinstance(v, str):
                v = float(v)
            if k in ("allowed_langs", "blocklist") and isinstance(v, str):
                v = [s for s in v.split(",") if s]
            out[k] = v
    return out


def load_config(argv=None) -> dict:
    ap = argparse.ArgumentParser(prog="reddacted-ray")
    ap.add_argument("--input")
    ap.add_argument("--output")
    ap.add_argument("--config", help="JSON config file")
    ap.add_argument("--skip-text", dest="skip_text")
    ap.add_argument("--text-match", dest="text_match")
    ap.add_argument("--pii-only", dest="pii_only", action="store_const", const=True)
    ap.add_argument("--limit", type=int)
    ap.add_argument("--scrub-mode", dest="scrub_mode",
                    choices=["token", "reference", "uuid"])
    ap.add_argument("--sort", choices=["new", "top", "controversial", "hot"],
                    help="listing order before --limit (reference 'sort'"
                    " config); non-new modes need upvotes/downvotes columns"
                    " in the input table")
    ap.add_argument("--time-filter", dest="time_filter",
                    choices=["all", "hour", "day", "week", "month", "year"])
    ap.add_argument("--time-anchor", dest="time_anchor",
                    help="ISO timestamp anchoring --time-filter windows"
                    " (default: current UTC time; pass explicitly for"
                    " reproducible runs)")
    ap.add_argument("--batch-size", dest="batch_size", type=int)
    ap.add_argument("--mode",
                    choices=["materialize", "decide", "apply", "compact",
                             "corpus", "audit", "catalog"],
                    help="materialize: full-row copy incl. bytes (default);"
                    " decide: write the id-keyed decision+scrub table with"
                    " bytes pruned at the scan (the 100 TB analysis shape);"
                    " apply: hash-join a decision table (--decisions) back"
                    " onto the full-byte input and write the kept rows with"
                    " scrubbed captions (decide-mode phase 2);"
                    " compact: merge small parquet files of --input into"
                    " --output within row-count bounds (maintenance op);"
                    " corpus: documents-table assembly — quality gate ->"
                    " exact dedup -> per-source cap -> temperature mix"
                    " (pipelines/corpus.py), then a per-(source, lang)"
                    " manifest printed from ONE scan of the written output;"
                    " audit: read-only corpus health report over a"
                    " documents table (per-lang length gate bounds, dup"
                    " co-occurrence matrix, train/holdout leakage, top"
                    " source-pair language drift) written as ONE json"
                    " file at --output")
    ap.add_argument("--cap-per-source", dest="cap_per_source", type=int,
                    help="corpus mode: max docs kept per source")
    ap.add_argument("--mix-k", dest="mix_k", type=int,
                    help="corpus mode: temperature constant"
                    " (keep ~k*sqrt(n)/n per source)")
    ap.add_argument("--decisions", help="decision-table dir for --mode apply")
    ap.add_argument("--min-rows-per-file", dest="min_rows_per_file", type=int)
    ap.add_argument("--max-rows-per-file", dest="max_rows_per_file", type=int)
    ap.add_argument("--resumable", action="store_const", const=True)
    ap.add_argument("--emit-errors", dest="emit_errors",
                    action="store_const", const=True,
                    help="keep failing rows as error-lineage rows"
                    " (keep=false, error column set) instead of the"
                    " reference's silent row skip")
    ap.add_argument("--files-per-partition", dest="files_per_partition",
                    type=int, help="resumable mode: input files per"
                    " checkpoint partition (default: auto — sized so"
                    " ~max(8, cpus//4) partitions amortize executor"
                    " fixed latency; pass a smaller value for finer"
                    " checkpoint granularity)")
    ap.add_argument("--concurrent-partitions", dest="concurrent_partitions",
                    type=int, help="resumable mode: how many partition"
                    " pipelines execute at once (default: auto —"
                    " min(cluster CPUs, pending partitions))")
    ap.add_argument("--num-cpus", dest="num_cpus", type=int)
    ap.add_argument("--report", help="write a markdown summary report here")
    ap.add_argument("--allowed-langs", dest="allowed_langs",
                    help="quality gate: comma list of languages to keep")
    ap.add_argument("--max-ppl", dest="max_ppl", type=float,
                    help="quality gate: perplexity cap")
    ap.add_argument("--min-lang-conf", dest="min_lang_conf", type=float,
                    help="quality gate: language-ID confidence floor")
    ap.add_argument("--max-dup-frac", dest="max_dup_frac", type=float,
                    help="quality gate: Gopher duplicate-word-fraction cap")
    ap.add_argument("--max-bigram-share", dest="max_bigram_share",
                    type=float,
                    help="quality gate: Gopher top-bigram-share cap")
    ap.add_argument("--blocklist", help="quality gate: comma list of"
                    " blocked tokens (C4-style drop)")
    ap.add_argument("--gate-drop", dest="gate_drop",
                    action="store_const", const=True,
                    help="quality gate: filter to survivors instead of"
                    " only annotating keep_quality")
    args = vars(ap.parse_args(argv))
    env = {
        name: os.environ[var] for var, name in ENV_VARS_MAP.items() if var in os.environ
    }
    file_cfg = {}
    if args.get("config"):
        with open(args["config"]) as f:
            file_cfg = json.load(f)
    return merge_configs(env, file_cfg, args)


def main(argv=None) -> int:
    cfg = load_config(argv)
    if not cfg.get("input") or not cfg.get("output"):
        print("error: --input and --output are required", file=sys.stderr)
        return 2
    # Ray's write_parquet APPENDS into an existing dir; a rerun with the
    # same --output would silently duplicate rows. Refuse up front.
    # Rerun-safe paths are exempt: --resumable builds, and the colocated
    # apply (decision dir carries a manifest -> per-partition atomic
    # writes that skip completed partitions).
    colocated_apply = (
        cfg.get("mode") == "apply"
        and cfg.get("decisions")
        and os.path.exists(os.path.join(cfg["decisions"], "manifest.jsonl"))
    )
    # only decide/materialize actually implement resumable writes
    # (state/manifest.py partition skip); corpus/compact would silently
    # APPEND duplicate rows on a rerun (r4 ADVICE #3), so their
    # --resumable is rejected below and never exempts them here
    mode_arg = cfg.get("mode", "materialize")
    if cfg.get("resumable") and mode_arg in ("corpus", "compact"):
        print(
            f"error: --resumable is not implemented for --mode {mode_arg};"
            " rerunning would append duplicate rows",
            file=sys.stderr,
        )
        return 2
    if mode_arg in ("audit", "catalog") and os.path.exists(cfg["output"]):
        print(
            f"error: audit output file {cfg['output']!r} already exists",
            file=sys.stderr,
        )
        return 2
    rerun_safe = (
        colocated_apply if mode_arg == "apply"
        else (cfg.get("resumable") and mode_arg in ("decide", "materialize"))
    )
    if (
        not rerun_safe
        and os.path.isdir(cfg["output"])
        and os.listdir(cfg["output"])
    ):
        print(
            f"error: output dir {cfg['output']!r} exists and is non-empty;"
            " remove it or use --resumable",
            file=sys.stderr,
        )
        return 2
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=cfg.get("num_cpus"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .oracle import LabelerConfig
    from .pipelines.quality_filter import apply_decisions, build
    from .pipelines.report import aggregates, write_markdown_report
    from .state.manifest import run_resumable

    lcfg = LabelerConfig(
        skip_text=cfg.get("skip_text"),
        pii_only=bool(cfg.get("pii_only", False)),
        text_match=cfg.get("text_match"),
        limit=int(cfg.get("limit", 0)),
        scrub_mode=cfg.get("scrub_mode", "token"),
        emit_errors=bool(cfg.get("emit_errors", False)),
    )
    batch_size = int(cfg.get("batch_size", 2048))
    time_filter = cfg.get("time_filter", "all")
    now = None
    if time_filter != "all":
        import datetime as _dt

        # tz-aware UTC default (utcnow() is naive AND deprecated; build()
        # coerces the anchor to the stored column's tz-ness either way)
        now = (
            _dt.datetime.fromisoformat(cfg["time_anchor"])
            if cfg.get("time_anchor")
            else _dt.datetime.now(_dt.timezone.utc)
        )

    mode = cfg.get("mode", "materialize")

    gate_keys = ("allowed_langs", "max_ppl", "min_lang_conf",
                 "max_dup_frac", "max_bigram_share", "blocklist")
    qcfg = None
    if any(cfg.get(k) is not None for k in gate_keys):
        from .stages.quality_gate import QualityGateConfig

        qcfg = QualityGateConfig(
            allowed_langs=cfg.get("allowed_langs"),
            max_ppl=cfg.get("max_ppl"),
            min_lang_conf=float(cfg.get("min_lang_conf") or 0.0),
            max_dup_word_frac=cfg.get("max_dup_frac"),
            max_top_bigram_share=cfg.get("max_bigram_share"),
            blocklist=cfg.get("blocklist"),
        )

    def _build(path):
        ds = build(path, cfg=lcfg, batch_size=batch_size, mode=mode,
                   time_filter=time_filter, now=now,
                   sort=cfg.get("sort", "new"))
        if qcfg is not None:
            from .stages.quality_gate import apply_quality_gate

            ds = apply_quality_gate(ds, qcfg,
                                    drop=bool(cfg.get("gate_drop", False)))
        return ds

    if mode == "compact":
        from .sources.tables import compact_parquet

        t0 = time.perf_counter()
        summary = compact_parquet(
            cfg["input"], cfg["output"],
            min_rows_per_file=int(cfg.get("min_rows_per_file", 100_000)),
            max_rows_per_file=int(cfg.get("max_rows_per_file", 1_000_000)),
        )
        summary["mode"] = "compact"
        summary["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if mode == "corpus":
        from .pipelines.corpus import (CorpusConfig, assemble_corpus,
                                       corpus_summary)

        t0 = time.perf_counter()
        ccfg = CorpusConfig(
            cap_per_source=int(cfg.get("cap_per_source") or 100),
            mix_k=int(cfg.get("mix_k") or 20),
        )
        assemble_corpus(cfg["input"], ccfg).write_parquet(cfg["output"])
        # manifest from ONE scan of the just-written output (the
        # decide+report lesson: never rebuild the pipeline to report)
        import ray.data as rd

        out = rd.read_parquet(cfg["output"], file_extensions=["parquet"])
        manifest = corpus_summary(out).to_pandas()
        summary = {
            "output": cfg["output"],
            "mode": "corpus",
            "rows": int(manifest["n_docs"].sum()),
            "n_sources": int(manifest["source"].nunique()),
            "n_words": int(manifest["n_words"].sum()),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    if mode == "audit":
        # read-only corpus health report: the audit query family over
        # the documents table, one json file out (no data written)
        from .pipelines import queries as Q

        t0 = time.perf_counter()
        reg = Q.registry()

        def _df(name):
            res = reg[name](cfg["input"])
            return res.to_pandas() if hasattr(res, "to_pandas") else res

        gate = _df("length_gate_by_lang")
        dupmx = _df("cross_source_dup_matrix")
        leak = _df("split_leakage_audit")
        tv = (_df("lang_tv_distance_pairs")
              .sort_values(["tv", "src_a", "src_b"],
                           ascending=[False, True, True]).head(5))
        report = {
            "mode": "audit",
            "input": cfg["input"],
            "length_gate": gate.to_dict("records"),
            "dup_matrix_cells": int(len(dupmx)),
            "dup_matrix_top": (
                dupmx.sort_values(["n_shared", "src_a", "src_b"],
                                  ascending=[False, True, True])
                .head(10).to_dict("records")),
            "split_leakage": leak.to_dict("records")[0],
            "lang_drift_top_pairs": tv.to_dict("records"),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        with open(cfg["output"], "w") as f:
            json.dump(report, f, indent=1, default=str)
        print(json.dumps({"mode": "audit", "output": cfg["output"],
                          "wall_s": report["wall_s"]}))
        ray.shutdown()
        return 0

    if mode == "catalog":
        # metadata-only lakehouse catalog report: schemas, row counts,
        # footer byte accounting and key-integrity audit — no data
        # pages read beyond the candidate-key scan
        from .pipelines import queries as Q

        t0 = time.perf_counter()
        reg = Q.registry()

        def _df(name):
            res = reg[name](cfg["input"])
            return res.to_pandas() if hasattr(res, "to_pandas") else res

        cat = _df("catalog_audit")
        foot = _df("parquet_footer_audit")
        keys = _df("candidate_key_audit")
        report = {
            "mode": "catalog",
            "input": cfg["input"],
            "tables": cat.to_dict("records"),
            "footers": foot.to_dict("records"),
            "order_keys": keys.to_dict("records"),
            "total_rows": int(cat["n_rows"].sum()),
            "total_compressed_bytes": int(
                foot["compressed_bytes"].sum()),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        with open(cfg["output"], "w") as f:
            json.dump(report, f, indent=1, default=str)
        print(json.dumps({"mode": "catalog", "output": cfg["output"],
                          "wall_s": report["wall_s"]}))
        ray.shutdown()
        return 0

    if mode == "apply":
        # decide-mode phase 2: join the decision table back onto the
        # full-byte input (reference K2 write path)
        if not cfg.get("decisions"):
            print("error: --mode apply requires --decisions", file=sys.stderr)
            ray.shutdown()
            return 2
        import ray.data as rd

        t0 = time.perf_counter()
        if os.path.exists(os.path.join(cfg["decisions"], "manifest.jsonl")):
            # resumable decide output: zero-shuffle provenance-co-located
            # apply (one task per partition, bytes never shuffle)
            from .pipelines.quality_filter import apply_decisions_colocated

            summary = apply_decisions_colocated(
                cfg["input"], cfg["decisions"], cfg["output"]
            )
            summary["mode"] = "apply-colocated"
        else:
            out = apply_decisions(cfg["input"], rd.read_parquet(cfg["decisions"]))
            out.write_parquet(cfg["output"])
            summary = {"output": cfg["output"], "mode": "apply"}
        summary["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(summary))
        ray.shutdown()
        return 0

    t0 = time.perf_counter()
    if cfg.get("resumable"):
        # decide-mode plans with no global operator run on the task
        # runner: per-FILE Ray tasks, no per-partition streaming-executor
        # startup (r5 VERDICT #7 — measured within ~1.05x of the plain
        # sink vs 1.25-1.3x for the thread-pool runner). Global plans
        # (sort/limit/time_filter) keep the Dataset-per-partition path.
        fpp = (int(cfg["files_per_partition"])
               if cfg.get("files_per_partition") is not None else None)
        if (mode == "decide" and cfg.get("sort", "new") == "new"
                and time_filter == "all" and not lcfg.limit):
            from .pipelines.quality_filter import make_decide_batch_fn
            from .state.manifest import run_resumable_tasks

            cols, chain = make_decide_batch_fn(
                lcfg, qcfg=qcfg, gate_drop=bool(cfg.get("gate_drop", False)))
            summary = run_resumable_tasks(
                cfg["input"], cfg["output"], chain,
                read_columns=cols,
                files_per_partition=fpp,
                batch_size=batch_size,
            )
        else:
            summary = run_resumable(
                cfg["input"],
                cfg["output"],
                _build,
                # default: auto — target max(8, cpus // 4) partitions
                files_per_partition=fpp,
                # default: auto — min(cluster CPUs, pending partitions)
                concurrent_partitions=(
                    int(cfg["concurrent_partitions"])
                    if cfg.get("concurrent_partitions") is not None
                    else None),
            )
    else:
        ds = _build(cfg["input"])
        ds.write_parquet(cfg["output"])
        summary = {"output": cfg["output"]}
    summary["mode"] = mode
    summary["wall_s"] = round(time.perf_counter() - t0, 3)
    if cfg.get("report"):
        # ONE input scan total for decide+report (round-3 VERDICT #3):
        # the report reads the decision table just WRITTEN above instead
        # of rebuilding the scoring pipeline, so the raw input is scanned
        # once (by the decide pass) and the report passes touch only the
        # slim output parquet.
        import ray.data as rd

        scored = rd.read_parquet(cfg["output"], file_extensions=["parquet"])
        agg = aggregates(scored)

        # per-row detail for the top-5 riskiest rows (reference K1 detail
        # sections). No global sort: each block prunes to its local top-5
        # by (risk desc, id asc) first, so the sort sees <= 5 rows per
        # block instead of the corpus (the bottomk_sample shape).
        import pyarrow as pa

        def local_top(t: pa.Table, k: int = 5) -> pa.Table:
            if t.num_rows <= k:
                return t
            return t.sort_by([("risk_score", "descending"),
                              ("image_id", "ascending")]).slice(0, k)

        top = (
            scored.map_batches(local_top, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort(["risk_score", "image_id"], descending=[True, False])
            .limit(5)
            .to_pandas()
            .to_dict("records")
        )
        write_markdown_report(agg, cfg["report"], source_label=cfg["input"],
                              pii_only=lcfg.pii_only, detail_rows=top)
        summary["report"] = cfg["report"]
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
