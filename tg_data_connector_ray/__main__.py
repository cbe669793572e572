"""CLI entry — the `datax.py` analogue (core/src/main/bin/datax.py launches
the reference's Engine; here the engine is the Ray session + job runner).

    python -m tg_data_connector_ray run job.json [--dry-run]
    python -m tg_data_connector_ray cdc --events DIR --out DIR
           [--snapshot P] [--partitions N] [--detect-hot-keys]
    python -m tg_data_connector_ray compact --out DIR [--retention N]

The CLI owns the Ray session (guarded init; shutdown at exit) — library
code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tg_data_connector_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a job-JSON config")
    runp.add_argument("config")
    runp.add_argument("--dry-run", action="store_true")

    cdcp = sub.add_parser("cdc", help="apply a CDC log")
    cdcp.add_argument("--events", required=True)
    cdcp.add_argument("--out", required=True)
    cdcp.add_argument("--snapshot")
    cdcp.add_argument("--partitions", type=int, default=64)
    cdcp.add_argument("--detect-hot-keys", action="store_true")
    cdcp.add_argument("--orphan-updates", default="upsert", choices=["upsert", "drop"])
    cdcp.add_argument(
        "--merge-strategy", default="refold", choices=["refold", "delta"],
        help="delta = LSM run files, O(delta) per run (compact to fold)",
    )
    cdcp.add_argument(
        "--delta-compact-runs", type=int, default=None,
        help="delta mode: auto-compact a partition at this many run files",
    )

    comp = sub.add_parser("compact", help="compact partitions (tombstone GC)")
    comp.add_argument("--out", required=True)
    comp.add_argument("--partitions", type=int, default=64)
    comp.add_argument("--retention", type=int, default=0)

    syn = sub.add_parser(
        "sync", help="diff a full snapshot against the table and apply the delta"
    )
    syn.add_argument("--out", required=True)
    syn.add_argument("--snapshot", required=True)
    syn.add_argument("--run-id", required=True)
    syn.add_argument("--partitions", type=int, default=64)

    ver = sub.add_parser("verify", help="verify converged table vs expected parquet")
    ver.add_argument("--out", required=True)
    ver.add_argument("--expected", required=True)

    exp = sub.add_parser(
        "export",
        help="write the converged live table as parquet, optionally AS OF "
        "a past run (LSM delta tables; see runs.log)",
    )
    exp.add_argument("--out", required=True, help="CDC table dir")
    exp.add_argument("--dest", required=True, help="destination parquet dir")
    exp.add_argument("--as-of", dest="as_of", help="journaled run id to read as of")
    exp.add_argument("--partitions", type=int, default=64)
    exp.add_argument(
        "--format", dest="fmt", choices=["parquet", "jsonl"], default="parquet",
        help="jsonl writes one JSON object per line (sharded) — the "
        "hand-off format LLM training pipelines ingest",
    )
    exp.add_argument(
        "--view", choices=["table", "sft", "render"], default="table",
        help="what to export: the converged table itself, (prompt, "
        "response) SFT pairs, or one rendered document per conversation "
        "— the chat-log -> training-set hand-off in one verb",
    )

    cf = sub.add_parser(
        "changefeed",
        help="write the I/U/D change stream between two journaled runs "
        "as parquet (LSM delta tables)",
    )
    cf.add_argument("--out", required=True, help="CDC table dir")
    cf.add_argument("--dest", required=True, help="destination parquet dir")
    cf.add_argument("--from", dest="from_run", required=True)
    cf.add_argument("--to", dest="to_run", required=True)
    cf.add_argument("--partitions", type=int, default=64)
    cf.add_argument(
        "--before",
        action="store_true",
        help="include <col>_old preimage columns (incremental-view feeds)",
    )

    red = sub.add_parser(
        "redact",
        help="right-to-be-forgotten: synthesize U events replacing the "
        "target conversations' text, applied exactly-once; compact "
        "afterwards to make forgetting physical",
    )
    red.add_argument("--out", required=True, help="CDC table dir")
    red.add_argument(
        "--convs",
        required=True,
        help="comma-separated conv_ids, or @FILE with one id per line",
    )
    red.add_argument("--run-id", dest="run_id", required=True)
    red.add_argument("--replacement", default="[REDACTED]")
    red.add_argument("--partitions", type=int, default=64)

    tail = sub.add_parser(
        "tail",
        help="continuous log-tail ingestion: poll a directory for new "
        "parquet shards and apply each batch exactly-once (producers "
        "must drop shards atomically: write temp + rename)",
    )
    tail.add_argument("--events", required=True, help="log dir to watch")
    tail.add_argument("--out", required=True)
    tail.add_argument("--partitions", type=int, default=64)
    tail.add_argument("--poll-interval", type=float, default=5.0)
    tail.add_argument(
        "--idle-polls", type=int, default=None,
        help="stop after this many consecutive empty polls (default: never)",
    )
    tail.add_argument("--max-batches", type=int, default=None)
    tail.add_argument("--stop-file", default=None,
                      help="stop when this path appears")
    tail.add_argument(
        "--merge-strategy", default="refold", choices=["refold", "delta"],
    )
    tail.add_argument("--delta-compact-runs", type=int, default=None)
    tail.add_argument(
        "--format", default="parquet", choices=["parquet", "envelope"],
        help="envelope = Debezium-shaped *.jsonl shards (staged to "
        "parquet per batch before the exactly-once apply)",
    )
    tail.add_argument(
        "--multi-table", dest="multi_table", default=None, metavar="COL",
        help="interleaved multi-table stream: split each batch by this "
        "column and apply per table into <out>/<table> (parquet format "
        "only); --out becomes the tables root",
    )

    rep = sub.add_parser(
        "repair",
        help="dead-letter repair-replay: apply the standard fix rules to "
        "a run's dirty side-output and re-ingest it exactly-once as a "
        "new run (unfixable rows re-route to the new run's dirty channel)",
    )
    rep.add_argument("--out", required=True, help="CDC table dir")
    rep.add_argument("--run-id", dest="run_id", required=True,
                     help="run whose dirty side-output to repair")
    rep.add_argument("--new-run-id", dest="new_run_id", required=True)
    rep.add_argument("--partitions", type=int, default=64)
    rep.add_argument(
        "--map-op", dest="map_op", action="append", default=[],
        metavar="FROM=TO",
        help="bad_op rows: rewrite op FROM to TO (repeatable)",
    )
    rep.add_argument("--abs-turn", action="store_true",
                     help="negative_turn_idx rows: drop the sign")
    rep.add_argument("--null-bad-ts", action="store_true",
                     help="uncastable_ts rows: null the timestamp")
    rep.add_argument("--empty-text-insert", action="store_true",
                     help="null_text_insert rows: set text to ''")

    ddp = sub.add_parser(
        "dedup",
        help="streaming dedup: ingest a parquet doc batch against a "
        "persistent seen-corpus state dir; prints kept count, optionally "
        "writes kept ids; --compact folds the state's run files",
    )
    ddp.add_argument("--docs", help="parquet file/dir of (doc_id, text) to ingest")
    ddp.add_argument("--state", required=True, help="persistent state dir")
    ddp.add_argument("--mode",
                     choices=["exact", "minhash", "simhash", "embedding", "split"],
                     default="minhash",
                     help="'split' assigns SPLIT-STABLE leakage-safe "
                     "train/val/test labels instead of deduping (near-dups "
                     "of already-ingested docs inherit their rep's split)")
    ddp.add_argument("--threshold", type=float, default=None,
                     help="similarity threshold (default: 0.8 Jaccard for "
                     "minhash, 0.99 cosine for embedding)")
    ddp.add_argument("--batch-token", dest="batch_token", default=None,
                     help="stable token for exactly-once replays "
                     "(default: content-derived from the input file list)")
    ddp.add_argument("--kept-out", dest="kept_out", default=None,
                     help="write kept doc_ids as parquet here")
    ddp.add_argument("--compact", action="store_true",
                     help="fold state run files (seals ingested tokens)")

    mig = sub.add_parser(
        "migrate",
        help="re-route persisted state into a fresh out dir under the "
        "current hash provider / partition count (routing-change migration; "
        "preserves per-key LSN watermarks and tombstones)",
    )
    mig.add_argument("--from", dest="from_dir", required=True)
    mig.add_argument("--out", required=True)
    mig.add_argument("--partitions", type=int, default=64)

    lin = sub.add_parser(
        "lineage", help="per-partition watermark/state/delta-run health summary"
    )
    lin.add_argument("--out", required=True)
    lin.add_argument("--parts", action="store_true", help="include per-partition rows")

    vw = sub.add_parser(
        "view", help="persistent maintained views: bootstrap a derived "
        "table (conv_stats / tool_usage / turn_context) off the converged "
        "table, then sync folds only the change feed since the last "
        "synced run (delta-mode source required)"
    )
    vw.add_argument("action", choices=["bootstrap", "sync", "show"])
    vw.add_argument("--view-dir", required=True)
    vw.add_argument("--out", help="source table dir (bootstrap/sync)")
    vw.add_argument("--kind", help="view kind (bootstrap)")
    vw.add_argument("--partitions", type=int, default=64,
                    help="source table partition count")

    pln = sub.add_parser(
        "plan", help="capacity advisor: recommend --partitions / read "
        "blocks for a log batch from its size, and repartition advice "
        "for an existing table vs the 0.5-2 GiB state band (metadata "
        "only — never reads table data)"
    )
    pln.add_argument("--log", required=True, help="CDC log directory")
    pln.add_argument("--out", help="existing table dir for state advice")
    pln.add_argument("--cpus", type=int, default=None,
                     help="cluster CPU total (default: this node's)")

    get = sub.add_parser(
        "get", help="point lookup: the live turns of specific conv_ids "
        "(pruned partition reads, never a table scan)"
    )
    get.add_argument("--out", required=True)
    get.add_argument("--conv", action="append", required=True,
                     help="conv_id (repeatable)")
    get.add_argument("--partitions", type=int, default=64)
    get.add_argument("--hot-keys", default="",
                     help="comma-separated salted hot conv_ids of the table")

    vac = sub.add_parser(
        "vacuum", help="reclaim journaled runs' staging (correct/repair/"
        "snapsync/tail-stage/spool leftovers)"
    )
    vac.add_argument("--out", required=True)
    vac.add_argument("--prune-dirty", action="store_true",
                     help="also drop journaled runs' dead-letter channels")

    expv = sub.add_parser(
        "expire", help="retention: delete (through the log) live turns "
        "with ts older than a cutoff; compact to make it physical"
    )
    expv.add_argument("--out", required=True)
    expv.add_argument("--older-than", dest="older_than", required=True,
                      help="timestamp cutoff, e.g. 2026-01-17T00:00:00")
    expv.add_argument("--run-id", required=True)
    expv.add_argument("--partitions", type=int, default=64)

    rns = sub.add_parser(
        "runs", help="per-run ingest health from the run journal + manifests"
    )
    rns.add_argument("--out", required=True)

    sch = sub.add_parser(
        "schemas", help="input schema-evolution timeline (schema.log)"
    )
    sch.add_argument("--out", required=True)

    ixp = sub.add_parser(
        "index",
        help="CDC-maintained ANN index over the converged table "
        "(ops/index_sync): bootstrap once, then sync change-feed windows; "
        "search / compact the persistent IVF index",
    )
    ixp.add_argument("action", choices=["bootstrap", "sync", "search", "compact"])
    ixp.add_argument("--index", required=True, help="index directory")
    ixp.add_argument("--out", default=None,
                     help="CDC table out dir (bootstrap/sync)")
    ixp.add_argument("--partitions", type=int, default=64)
    ixp.add_argument("--merge-strategy", default="delta",
                     choices=["refold", "delta"],
                     help="sync needs delta history for change_feed")
    ixp.add_argument("--dim", type=int, default=64)
    ixp.add_argument("--centroids", type=int, default=64)
    ixp.add_argument("--run-id", default=None,
                     help="idempotency id (default: boot / sync-<to-run>)")
    ixp.add_argument("--from-run", dest="from_run", default=None)
    ixp.add_argument("--to-run", dest="to_run", default=None)
    ixp.add_argument("--text", action="append", default=None,
                     help="probe text (repeatable; search)")
    ixp.add_argument("--k", type=int, default=5)
    ixp.add_argument("--nprobe", type=int, default=None,
                     help="default: all centroids (exact)")

    pk = sub.add_parser(
        "pack",
        help="produce training shards: vocab build + tokenize-to-ids + "
        "fixed-budget sequence packing over a documents parquet; shards "
        "land as parquet or JSONL with vocab.parquet beside them",
    )
    pk.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    pk.add_argument("--out", required=True, help="output directory")
    pk.add_argument("--vocab-size", type=int, default=32768)
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--format", dest="fmt", default="parquet",
                    choices=["parquet", "jsonl"])
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--col", default="text")
    pk.add_argument("--shuffle-seed", default=None,
                    help="pack in reproducible seeded-shuffle document "
                    "order (epoch order = f(seed, ids)) instead of id order")

    con = sub.add_parser(
        "consistent",
        help="cross-table transactionally-consistent export of a "
        "multi-table root (tail --multi-table layout): every table as of "
        "the last tx.log-certified micro-batch — torn batches invisible",
    )
    con.add_argument("--root", required=True, help="multi-table root dir")
    con.add_argument("--partitions", type=int, default=64)
    con.add_argument("--merge-strategy", default="delta",
                     choices=["refold", "delta"])
    con.add_argument("--table-col", default="tbl")
    con.add_argument("--dest", default=None,
                     help="write the consistent union here as parquet "
                     "(default: print row counts only)")

    args = p.parse_args(argv)

    import ray

    # shut down only a session WE started: an in-process caller (tests,
    # embedding apps) keeps its own Ray alive across main() calls.
    # Address resolution: honor RAY_ADDRESS so `ray job submit` /
    # `ray start` cluster drivers connect to THE CLUSTER (hardcoding
    # "local" would silently run every multi-node job single-node);
    # with no RAY_ADDRESS set, start a local session as before.
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address=os.environ.get("RAY_ADDRESS") or "local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        if args.cmd == "run":
            from .pipelines.runner import run_job

            with open(args.config) as f:
                cfg = json.load(f)
            if args.dry_run:
                cfg.setdefault("job", {}).setdefault("setting", {})["dryRun"] = True
            out = run_job(cfg)
        elif args.cmd == "cdc":
            cdc = {
                "events": args.events,
                "out": args.out,
                "numPartitions": args.partitions,
                "orphanUpdates": args.orphan_updates,
                "mergeStrategy": args.merge_strategy,
            }
            if args.delta_compact_runs is not None:
                cdc["deltaCompactRuns"] = args.delta_compact_runs
            if args.snapshot:
                cdc["snapshot"] = args.snapshot
            if args.detect_hot_keys:
                cdc["detectHotKeys"] = True
            from .pipelines.runner import run_job

            out = run_job({"job": {"cdc": cdc}})
        elif args.cmd == "sync":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import snapshot_sync

            out = snapshot_sync(
                CdcConfig(out_dir=args.out, num_partitions=args.partitions),
                args.snapshot, run_id=args.run_id,
            )
        elif args.cmd == "compact":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import compact

            out = compact(
                CdcConfig(out_dir=args.out, num_partitions=args.partitions),
                tombstone_retention_lsn=args.retention,
            )
        elif args.cmd == "get":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import read_convs

            hot = tuple(h for h in args.hot_keys.split(",") if h)
            t = read_convs(
                CdcConfig(out_dir=args.out, num_partitions=args.partitions,
                          hot_keys=hot),
                args.conv,
            )
            out = {"rows": t.num_rows, "turns": t.to_pylist()}
        elif args.cmd == "pack":
            import pyarrow.parquet as _pq

            from .ops.corpus import build_vocab, pack_ids
            from .util import sized_read_parquet

            ds = sized_read_parquet(args.docs, columns=[args.id_col, args.col])
            vocab = build_vocab(ds, size=args.vocab_size, col=args.col)
            os.makedirs(args.out, exist_ok=True)
            _pq.write_table(vocab, os.path.join(args.out, "vocab.parquet"))
            hint = os.path.getsize(args.docs) if os.path.isfile(args.docs) else None
            if args.shuffle_seed is not None:
                from .ops.corpus import pack_ids_shuffled

                seqs = pack_ids_shuffled(ds, vocab, seed=args.shuffle_seed,
                                         budget=args.budget, id_col=args.id_col,
                                         col=args.col, size_hint_bytes=hint)
            else:
                seqs = pack_ids(ds, vocab, budget=args.budget,
                                id_col=args.id_col, col=args.col,
                                size_hint_bytes=hint)
            shards = os.path.join(args.out, "shards")
            if args.fmt == "jsonl":
                from .sinks.files import write_jsonl

                write_jsonl(seqs, shards)
                n_seq = None  # counting would re-run the pipeline
                n_shards = len(os.listdir(shards))
            else:
                seqs.write_parquet(shards)
                import pyarrow.dataset as _pads

                frags = list(_pads.dataset(shards, format="parquet").get_fragments())
                n_seq = sum(f.metadata.num_rows if f.metadata is not None
                            else f.count_rows() for f in frags)
                n_shards = len(frags)
            out = {
                "out": args.out,
                "vocab_terms": vocab.num_rows,
                "oov_id": vocab.num_rows,
                "budget": args.budget,
                "format": args.fmt,
                "shards": n_shards,
                "sequences": n_seq,
            }
        elif args.cmd == "consistent":
            from .cdc.pipeline import multi_table_tx_log, read_consistent

            t = read_consistent(
                args.root,
                table_col=args.table_col,
                cfg_kwargs={"num_partitions": args.partitions,
                            "merge_strategy": args.merge_strategy},
                sort=True,
            )
            certified = multi_table_tx_log(args.root)
            g = t.group_by(args.table_col).aggregate([([], "count_all")])
            per_table = dict(
                zip(g[args.table_col].to_pylist(), g["count_all"].to_pylist())
            )
            if args.dest:
                import pyarrow.parquet as _pq

                os.makedirs(os.path.dirname(args.dest) or ".", exist_ok=True)
                _pq.write_table(t, args.dest)
            out = {
                "rows": t.num_rows,
                "tables": per_table,
                "frontier_run": certified[-1]["run_id"] if certified else None,
                "certified_batches": len(certified),
                "dest": args.dest,
            }
        elif args.cmd == "index":
            from .ops.index_sync import bootstrap_index, embed_rows, sync_from_feed
            from .ops.similarity import PersistentIvf, hash_embed

            if args.action == "compact":
                out = PersistentIvf.load(args.index).compact()
            elif args.action == "search":
                idx = PersistentIvf.load(args.index)
                q = hash_embed(args.text or [], dim=args.dim)
                t = idx.search(
                    q, k=args.k, nprobe=args.nprobe or len(idx.centroids)
                )
                out = {"hits": t.to_pylist()}
            else:
                if not args.out:
                    p.error("index bootstrap/sync requires --out")
                from .cdc.config import CdcConfig
                from .cdc.pipeline import read_final_table

                cfg = CdcConfig(
                    out_dir=args.out,
                    num_partitions=args.partitions,
                    merge_strategy=args.merge_strategy,
                )
                cols = ["conv_id", "turn_idx", "text"]
                if args.action == "bootstrap":
                    if not os.path.exists(
                        os.path.join(args.index, "_FORMAT.json")
                    ):
                        boot = read_final_table(cfg, columns=cols).map_batches(
                            lambda t: embed_rows(t, args.dim),
                            batch_format="pyarrow",
                            zero_copy_batch=True,
                        )
                        PersistentIvf.build(
                            args.index, boot, n_centroids=args.centroids
                        )
                    idx = PersistentIvf.load(args.index)
                    out = bootstrap_index(
                        idx, read_final_table(cfg, columns=cols),
                        run_id=args.run_id or "boot", dim=args.dim,
                    )
                else:  # sync
                    if not (args.from_run and args.to_run):
                        p.error("index sync requires --from-run and --to-run")
                    from .cdc.pipeline import change_feed

                    idx = PersistentIvf.load(args.index)
                    out = sync_from_feed(
                        idx,
                        change_feed(
                            cfg, args.from_run, args.to_run, include_before=True
                        ),
                        args.run_id or f"sync-{args.to_run}",
                        dim=args.dim,
                    )
        elif args.cmd == "vacuum":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import vacuum

            out = vacuum(CdcConfig(out_dir=args.out),
                         prune_dirty=args.prune_dirty)
        elif args.cmd == "expire":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import expire_rows

            out = expire_rows(
                CdcConfig(out_dir=args.out, num_partitions=args.partitions),
                args.older_than, run_id=args.run_id,
            )
        elif args.cmd == "runs":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import runs_report

            out = {"runs": runs_report(CdcConfig(out_dir=args.out))}
        elif args.cmd == "schemas":
            from .cdc.schema import schema_history

            out = {"history": schema_history(args.out)}
        elif args.cmd == "lineage":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import lineage_summary

            out = lineage_summary(CdcConfig(out_dir=args.out))
            if not args.parts:
                out.pop("parts")
        elif args.cmd == "view":
            from .cdc.config import CdcConfig
            from .cdc.views import bootstrap_view, read_view, sync_view

            if args.action == "show":
                from .util import read_json as _rj

                out = _rj(os.path.join(args.view_dir, "view.json"))
                out["rows"] = read_view(args.view_dir).count()
            else:
                if not args.out:
                    p.error("view bootstrap/sync requires --out")
                vcfg = CdcConfig(
                    out_dir=args.out, num_partitions=args.partitions,
                    merge_strategy="delta",
                )
                if args.action == "bootstrap":
                    if not args.kind:
                        p.error("view bootstrap requires --kind")
                    out = bootstrap_view(args.view_dir, args.kind, vcfg)
                else:
                    out = sync_view(args.view_dir, vcfg)
        elif args.cmd == "plan":
            from .cdc.plan import plan_from_paths

            out = plan_from_paths(args.log, out_dir=args.out, cpus=args.cpus)
        elif args.cmd == "dedup":
            from .ops.dedup_incremental import compact_dedup_state

            out = {}
            if args.docs:
                import ray.data as _rd

                from .util import list_files

                files = sorted(list_files(args.docs, suffix=".parquet")) if os.path.isdir(
                    args.docs
                ) else [args.docs]
                token = args.batch_token
                if token is None:
                    from .cdc.pipeline import compute_run_id

                    token = compute_run_id(files, None)
                cols = ["vec_id", "embedding"] if args.mode == "embedding" else [
                    "doc_id", "text"
                ]
                ds = _rd.read_parquet(files, columns=cols)
                if args.mode == "exact":
                    from .ops.dedup import exact_dedup_incremental

                    kept = exact_dedup_incremental(ds, args.state, batch_token=token)
                elif args.mode == "simhash":
                    from .ops.dedup_incremental import simhash_dedup_incremental

                    kept = simhash_dedup_incremental(ds, args.state, batch_token=token)
                elif args.mode == "embedding":
                    from .ops.dedup_incremental import embedding_near_dup_incremental

                    kept = embedding_near_dup_incremental(
                        ds, args.state,
                        threshold=args.threshold if args.threshold is not None else 0.99,
                        batch_token=token,
                    )
                elif args.mode == "split":
                    from .ops.dedup_incremental import leakage_split_incremental

                    kept = leakage_split_incremental(
                        ds, args.state,
                        threshold=args.threshold if args.threshold is not None else 0.8,
                        batch_token=token,
                    )
                else:
                    from .ops.dedup_incremental import minhash_dedup_incremental

                    kept = minhash_dedup_incremental(
                        ds, args.state,
                        threshold=args.threshold if args.threshold is not None else 0.8,
                        batch_token=token,
                    )
                if args.kept_out:
                    kept = kept.materialize()
                    kept.write_parquet(args.kept_out)
                out.update({"batch_token": token, "kept": kept.count()})
            if args.compact:
                out["compact"] = compact_dedup_state(args.state)
            if not args.docs and not args.compact:
                raise SystemExit("dedup: pass --docs and/or --compact")
        elif args.cmd == "migrate":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import migrate_state

            out = migrate_state(
                args.from_dir,
                CdcConfig(out_dir=args.out, num_partitions=args.partitions),
            )
        elif args.cmd == "export":
            import glob as _glob

            import pyarrow.parquet as _pq

            from .cdc.config import CdcConfig
            from .cdc.pipeline import read_final_table, time_travel_runs

            cfg = CdcConfig(out_dir=args.out, num_partitions=args.partitions)
            runs = time_travel_runs(cfg, args.as_of) if args.as_of else None
            ds = read_final_table(cfg, runs=runs)
            view = getattr(args, "view", "table")
            if view == "sft":
                from .ops.transcripts import sft_pairs

                ds = sft_pairs(ds)
            elif view == "render":
                from .ops.transcripts import render_conversations

                ds = render_conversations(ds)
            if getattr(args, "fmt", "parquet") == "jsonl":
                ds.write_json(args.dest)
                rows = 0
                for f in _glob.glob(os.path.join(args.dest, "*.json")):
                    with open(f, "rb") as fh:
                        rows += sum(1 for _ in fh)
            else:
                ds.write_parquet(args.dest)
                # row count from the written footers — no second execution
                rows = sum(
                    _pq.read_metadata(f).num_rows
                    for f in _glob.glob(os.path.join(args.dest, "*.parquet"))
                )
            out = {
                "rows": rows, "dest": args.dest, "as_of": args.as_of,
                "format": getattr(args, "fmt", "parquet"), "view": view,
            }
        elif args.cmd == "changefeed":
            import glob as _glob

            import pyarrow.parquet as _pq

            from .cdc.config import CdcConfig
            from .cdc.pipeline import change_feed

            cfg = CdcConfig(out_dir=args.out, num_partitions=args.partitions)
            change_feed(
                cfg, args.from_run, args.to_run, include_before=args.before
            ).write_parquet(args.dest)
            rows = sum(
                _pq.read_metadata(f).num_rows
                for f in _glob.glob(os.path.join(args.dest, "*.parquet"))
            )
            out = {
                "rows": rows,
                "dest": args.dest,
                "from": args.from_run,
                "to": args.to_run,
            }
        elif args.cmd == "tail":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import tail_log

            kw = {}
            if args.delta_compact_runs is not None:
                kw["delta_compact_runs"] = args.delta_compact_runs
            tail_kw = {}
            if args.format == "envelope":
                from .sources.envelope import stage_envelope_events

                tail_kw = {"suffix": ".jsonl",
                           "prepare": stage_envelope_events}
            if args.multi_table:
                if args.format != "parquet":
                    raise SystemExit("--multi-table needs --format parquet")
                from .cdc.pipeline import tail_log_multi

                out = tail_log_multi(
                    args.events, args.out, table_col=args.multi_table,
                    cfg_kwargs={
                        "num_partitions": args.partitions,
                        "merge_strategy": args.merge_strategy,
                        **kw,
                    },
                    poll_interval=args.poll_interval,
                    idle_polls=args.idle_polls,
                    max_batches=args.max_batches,
                    stop_file=args.stop_file,
                    on_batch=lambda s: print(json.dumps(s, default=str),
                                             file=sys.stderr),
                )
                print(json.dumps(out, default=str))
                return 0
            out = tail_log(
                args.events,
                CdcConfig(
                    out_dir=args.out,
                    num_partitions=args.partitions,
                    merge_strategy=args.merge_strategy,
                    **kw,
                ),
                poll_interval=args.poll_interval,
                idle_polls=args.idle_polls,
                max_batches=args.max_batches,
                stop_file=args.stop_file,
                on_batch=lambda s: print(json.dumps(s, default=str),
                                         file=sys.stderr),
                **tail_kw,
            )
        elif args.cmd == "repair":
            from .cdc.config import CdcConfig
            from .cdc.normalize import build_dirty_fixer
            from .cdc.pipeline import replay_dirty

            map_op = dict(kv.split("=", 1) for kv in args.map_op)
            out = replay_dirty(
                CdcConfig(out_dir=args.out, num_partitions=args.partitions),
                args.run_id,
                build_dirty_fixer(
                    map_op=map_op or None,
                    abs_turn=args.abs_turn,
                    null_bad_ts=args.null_bad_ts,
                    empty_text_insert=args.empty_text_insert,
                ),
                args.new_run_id,
            )
        elif args.cmd == "redact":
            from .cdc.config import CdcConfig
            from .cdc.pipeline import redact_convs

            if args.convs.startswith("@"):
                with open(args.convs[1:]) as f:
                    convs = [ln.strip() for ln in f if ln.strip()]
            else:
                convs = [c for c in args.convs.split(",") if c]
            out = redact_convs(
                CdcConfig(out_dir=args.out, num_partitions=args.partitions),
                convs,
                run_id=args.run_id,
                replacement=args.replacement,
            )
        else:
            from .cdc.config import CdcConfig
            from .cdc.pipeline import verify_against

            out = verify_against(CdcConfig(out_dir=args.out), args.expected)
        print(json.dumps(out, default=str))
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
