"""CDC job orchestration: the Ray Data pipeline around normalize + merge.

Dataflow (phase A lazy/streaming/backpressured; no driver-side row loops):

    read_parquet(log files, grouped by schema fingerprint, sized blocks)
      -> map_batches(normalize)            stateless, zero-copy Arrow
      [union snapshot -> map_batches(as I-events at lsn=0)]
      -> write_parquet(partition_cols=["part"])     THE exchange (spool)
    then, per partition directory (independent, resumable):
      MergeApply: read spool + state -> fold -> atomic commit
      -> lineage rows (tiny) collected on the driver

Co-location by `part` costs one parallel partitioned write + one parallel
read — no object-store all-to-all (see _run_exchange_and_merge for the
measurements that motivated this over groupby).  Everything else is
embarrassingly parallel.  At 100 TB the same plan holds: more log files ->
more read tasks; the spool lives on shared storage; `num_partitions` sized
so each partition's state stays ~0.5-2 GB; MergeApply commits are
per-partition and independent, so a failed run resumes by re-running the
job with the same run_id (committed partitions short-circuit via lineage).
"""

from __future__ import annotations

import glob
import hashlib
import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..util import atomic_write_json
from .config import CdcConfig
from .merge import MergeApply
from .normalize import count_dirty, normalize_batch
from .schema import scan_schemas


class ErrorLimitExceeded(RuntimeError):
    pass


_LOG = __import__("logging").getLogger("tg_data_connector_ray.cdc")


def stalled_partitions(
    total_parts: int,
    committed: "dict[int, tuple[float, float]]",
    now: float,
    factor: float = 4.0,
    grace_s: float = 30.0,
    started_ts: float = 0.0,
) -> "list[int]":
    """Hang-detection rule (the reference TaskMonitor analogue,
    core/.../taskgroup/TaskMonitor.java:76-95 — there a 48h no-progress
    watchdog; here lineage-age based and proportional to observed merge
    cost): with at least half the partitions committed, the median
    committed wall time calibrates what 'normal' is; if the run has then
    gone QUIET — no new commit for more than max(grace_s, factor x median
    wall) — while partitions remain, those partitions are flagged.

    `committed` maps part -> (wall_s, commit_unix_ts).  `started_ts` is
    when THIS attempt began: a resumed run sees the prior attempt's
    lineage files (hour-old mtimes) immediately, so quietness is measured
    from the later of the last commit and the attempt start — otherwise
    the first tick of every resume would cry hung.  Returns the sorted
    uncommitted partition ids, or [] while progress looks healthy.  Pure
    function (clock injected) so the rule itself is unit-testable."""
    import statistics

    pending = sorted(set(range(total_parts)) - set(committed))
    if not pending or len(committed) < max(1, total_parts // 2):
        return []
    median_wall = statistics.median(w for w, _ in committed.values())
    quiet_s = now - max(started_ts, max(ts for _, ts in committed.values()))
    if quiet_s > max(grace_s, factor * median_wall):
        return pending
    return []


class _ProgressReporter:
    """Mid-run merge progress (reference CommunicationTool.java:16-111 /
    AbstractScheduler.java:78-87: counter tree printed every 10 s).

    A daemon thread tails the run's committed per-partition lineage
    records (tiny JSON files, written atomically at each partition commit)
    and logs the aggregate — partitions done, events applied, live rows,
    rate.  Costs one small directory scan per tick on the driver; a run
    shorter than the interval emits nothing."""

    def __init__(self, cfg: CdcConfig, run_id: str, total_parts: int, interval_s: float):
        import threading

        self.cfg, self.run_id, self.total = cfg, run_id, total_parts
        self.interval = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def __enter__(self):
        if self.interval > 0:
            self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=2)

    def _scan(self) -> "tuple[int, int, int, dict]":
        import json

        root = os.path.join(self.cfg.out_dir, "lineage")
        done = events = live = 0
        committed: dict = {}
        if not os.path.isdir(root):
            return 0, 0, 0, committed
        for d in os.listdir(root):
            p = os.path.join(root, d, f"{self.run_id}.json")
            try:
                with open(p) as f:
                    rec = json.load(f)
                mtime = os.path.getmtime(p)
            except OSError:
                continue
            except ValueError:
                done += 1  # committed but mid-rewrite; count, skip sums
                continue
            done += 1
            events += int(rec.get("events_in", 0))
            live += int(rec.get("rows_live", 0))
            try:
                part = int(d.split("=")[1])
            except (IndexError, ValueError):
                continue
            committed[part] = (float(rec.get("wall_s", 0.0)), mtime)
        return done, events, live, committed

    def _loop(self):
        import time

        t0 = time.time()
        while not self._stop.wait(self.interval):
            done, events, live, committed = self._scan()
            dt = time.time() - t0
            _LOG.info(
                "cdc run %s: %d/%d partitions committed, %s events applied "
                "(%.0f events/s), %s live rows, %.0fs elapsed",
                self.run_id, done, self.total, f"{events:,}",
                events / max(dt, 1e-9), f"{live:,}", dt,
            )
            stalled = stalled_partitions(
                self.total, committed, time.time(), started_ts=t0
            )
            if stalled:
                _LOG.warning(
                    "cdc run %s: %d partition(s) with NO commit while the run "
                    "has gone quiet well past the median merge time — likely "
                    "hung: %s",
                    self.run_id, len(stalled), stalled[:20],
                )


def _write_ipc_spool_batch(t: pa.Table, *, spool: str, compression: str) -> pa.Table:
    """Write one normalized block to the spool as per-partition Arrow IPC
    files.  Runs inside the streaming executor's map tasks, so the
    exchange stays ONE parallel write (same shape as write_parquet with
    partition_cols, minus parquet's encode cost — the spool is ephemeral).

    Crash safety: files land via temp-name + os.replace, so a half-written
    fragment is never visible; a RETRIED task re-emits whole fragments
    under new names, which the merge fold absorbs as redelivery (duplicate
    (key, lsn) events are dropped with prio=1) — same at-least-once-file /
    exactly-once-effect contract as the rest of the pipeline."""
    from pyarrow import feather

    from ..util import new_token

    comp = {"none": "uncompressed", "snappy": "lz4"}.get(compression, compression)
    n = t.num_rows
    if n == 0:
        return pa.table({"n": pa.array([0], pa.int64())})
    part = t["part"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    t = t.take(pa.array(order))
    part = part[order]
    bounds = np.flatnonzero(np.diff(part)) + 1
    starts = np.concatenate([[0], bounds])
    stops = np.concatenate([bounds, [n]])
    payload = t.drop_columns(["part"])
    token = new_token()
    for s, e in zip(starts, stops):
        pdir = os.path.join(spool, f"part={int(part[s])}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".tmp-{token}")
        feather.write_feather(payload.slice(s, e - s), tmp, compression=comp)
        os.replace(tmp, os.path.join(pdir, f"{token}.arrow"))
    return pa.table({"n": pa.array([n], pa.int64())})


def _merge_task(group, *, cfg: CdcConfig, run_id: str):
    """Task-mode wrapper: MergeApply constructed per call (stateless init)."""
    return MergeApply(cfg, run_id)(group)


def _merge_dir_task(part_dir: str, cfg: CdcConfig, run_id: str):
    return MergeApply(cfg, run_id).apply_spool_dir(part_dir)


def _run_exchange_and_merge(files, cfg: CdcConfig, run_id: str, snapshot_path):
    """The partition exchange + per-partition merge.

    Default exchange = SPOOL: the normalized event stream is written once
    as hive-partitioned Parquet (`spool/<run_id>/part=N/`) by the streaming
    executor — each write task appends only to the partitions present in
    its batch, so co-location costs ONE parallel write + ONE parallel read
    with no all-to-all through the object store.  Measured on 1.9M events
    / 774 MB single-node: spool 4.8 s at 32 CPUs vs 21-41 s for Ray's
    in-memory groupby shuffle (which also anti-scaled 8->32 CPUs here);
    on a multi-node cluster the spool lives on shared storage and doubles
    as a resume point (phase A is skipped when its _SPOOL_DONE marker
    exists).  `exchange="groupby"` keeps the in-memory path for
    comparison.

    Phase B maps MergeApply over the partition directories — actor pool
    (`merge_mode="actors"`) or plain tasks (default) — each call owning
    one partition end-to-end (read spool + state, fold, atomic commit).
    """
    import shutil

    from ray.data import DataContext

    cpus = int(ray.cluster_resources().get("CPU", 8))

    if cfg.exchange == "groupby":
        ds = build_events_dataset(files, cfg, run_id, snapshot_path)
        ctx = DataContext.get_current()
        prev = getattr(ctx, "shuffle_strategy", None)
        if cfg.shuffle_strategy:
            ctx.shuffle_strategy = cfg.shuffle_strategy
        try:
            if cfg.merge_mode == "actors":
                conc = cfg.merge_concurrency or max(1, min(cfg.num_partitions, cpus - 2))
                lineage = ds.groupby("part").map_groups(
                    MergeApply,
                    batch_format="pyarrow",
                    fn_constructor_kwargs={"cfg": cfg, "run_id": run_id},
                    concurrency=conc,
                )
            else:
                lineage = ds.groupby("part").map_groups(
                    partial(_merge_task, cfg=cfg, run_id=run_id),
                    batch_format="pyarrow",
                )
            with _ProgressReporter(
                cfg, run_id, cfg.num_partitions, cfg.progress_interval_s
            ):
                return lineage.to_pandas()
        finally:
            if cfg.shuffle_strategy and prev is not None:
                ctx.shuffle_strategy = prev

    # --- spool exchange ----------------------------------------------------
    spool = os.path.join(cfg.out_dir, "spool", run_id)
    marker = os.path.join(spool, "_SPOOL_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(spool, ignore_errors=True)
        # rebuilding the spool re-runs normalize: reset this run's dirty
        # side-output so redelivered dirty rows aren't double-counted
        shutil.rmtree(cfg.dirty_dir(run_id), ignore_errors=True)
        os.makedirs(spool, exist_ok=True)
        ds = build_events_dataset(files, cfg, run_id, snapshot_path)
        if cfg.spool_format == "ipc":
            ds.map_batches(
                partial(
                    _write_ipc_spool_batch,
                    spool=spool,
                    compression=cfg.spool_compression,
                ),
                batch_format="pyarrow",
                batch_size=None,  # whole blocks: fragments per task, not per 1k rows
                zero_copy_batch=True,
            ).sum("n")
        else:
            ds.write_parquet(
                spool, partition_cols=["part"], compression=cfg.spool_compression
            )
        with open(marker, "w") as f:
            f.write(run_id)

    part_dirs = sorted(
        os.path.join(spool, d) for d in os.listdir(spool) if d.startswith("part=")
    )
    if not part_dirs:
        from .merge import LINEAGE_SCHEMA

        return pa.table(
            {f.name: pa.array([], f.type) for f in LINEAGE_SCHEMA}
        ).to_pandas()

    with _ProgressReporter(cfg, run_id, len(part_dirs), cfg.progress_interval_s):
        if cfg.merge_mode == "actors":
            pds = ray.data.from_items([{"part_dir": d} for d in part_dirs])
            conc = cfg.merge_concurrency or max(1, min(len(part_dirs), cpus))
            lineage = pds.map_batches(
                MergeApply,
                batch_format="pyarrow",
                batch_size=1,
                fn_constructor_kwargs={"cfg": cfg, "run_id": run_id},
                concurrency=conc,
            )
            lin = lineage.to_pandas()
        else:
            # task mode as raw Ray tasks: the merge fan-out is a fixed list
            # of independent partition commits — a Dataset adds a second
            # streaming executor spin-up for no expressiveness gain (the
            # documented raw-task exception; everything upstream stays
            # Dataset-based)
            merge_remote = ray.remote(num_cpus=1)(_merge_dir_task)
            refs = [merge_remote.remote(d, cfg, run_id) for d in part_dirs]
            lin = pd.concat([t.to_pandas() for t in ray.get(refs)], ignore_index=True)
    if cfg.drop_spool_after_merge:
        shutil.rmtree(spool, ignore_errors=True)
    return lin


def _expand(paths) -> "list[str]":
    """File/dir paths or object-store URIs -> parquet file list (the
    reference's GcsReader bucket listing, generalized via pyarrow.fs)."""
    from ..util import list_files

    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        out.extend(list_files(p, suffix=".parquet"))
    return out


def compute_run_id(files: "list[str]", snapshot: "str | None" = None) -> str:
    """Deterministic run identity = the set of inputs consumed.  Re-running
    the same inputs (crash recovery) reuses the id and skips committed
    partitions; a new file batch gets a new id."""
    from ..util import file_size

    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
        h.update(str(file_size(f)).encode())
    if snapshot:
        h.update(b"snap:" + snapshot.encode())
    return h.hexdigest()[:16]


def _snapshot_to_events(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "lsn": pa.array(np.zeros(n, dtype=np.int64)),
            "op": pa.array(["I"] * n, type=pa.string()),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].cast(pa.int32()),
            "role": batch["role"],
            "text": batch["text"],
            "tool": batch["tool"],
            "ts": batch["ts"].cast(pa.timestamp("us")),
        }
    )


def build_events_dataset(
    event_paths, cfg: CdcConfig, run_id: str, snapshot_path: "str | None" = None
) -> "ray.data.Dataset":
    """Lazy Dataset of normalized, partition-tagged CDC events."""
    files = _expand(event_paths)
    datasets = []
    if files:
        from ..util import file_size

        cpus = int(ray.cluster_resources().get("CPU", 8))
        sizes = {f: file_size(f) for f in files}
        total_bytes = max(1, sum(sizes.values()))
        groups, _ = scan_schemas(files, unify=False)  # normalize targets the fixed CDC schema
        for _fp, grp_files in sorted(groups.items()):
            gb = sum(sizes[f] for f in grp_files)
            # block count: enough to keep every CPU busy, but no smaller
            # than ~target_read_block_bytes per block — too many blocks
            # multiply spool files (write tasks x partitions) and phase-B
            # fragment opens
            nb = max(
                1,
                round(cpus * gb / total_bytes),
                -(-gb // cfg.target_read_block_bytes),
            )
            ds = ray.data.read_parquet(grp_files, override_num_blocks=nb)
            datasets.append(
                ds.map_batches(
                    partial(normalize_batch, cfg=cfg, run_id=run_id),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
    if snapshot_path is not None:
        snap = ray.data.read_parquet(snapshot_path).map_batches(
            _snapshot_to_events, batch_format="pyarrow", zero_copy_batch=True
        )
        datasets.append(
            snap.map_batches(
                partial(normalize_batch, cfg=cfg, run_id=run_id),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    if not datasets:
        raise ValueError("no input files")
    ds = datasets[0]
    if len(datasets) > 1:
        ds = ds.union(*datasets[1:])
    return ds


def detect_hot_keys(event_paths, threshold_frac: float = 0.05) -> "list[str]":
    """Pre-pass: conv_ids carrying more than `threshold_frac` of all events.

    Reads ONLY the conv_id column (columnar prune), pre-aggregates counts
    per batch (combiner), then does a tiny groupby over (conv_id, partial
    count) rows — the shuffle moves one row per unique conv per batch, not
    one per event.
    """
    files = _expand(event_paths)
    ds = ray.data.read_parquet(files, columns=["conv_id"])
    total = ds.count()

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = t["conv_id"].combine_chunks().value_counts()
        return pa.table(
            {"conv_id": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    # conv_id cardinality is the conversation count (hundreds of millions
    # at target scale) — finish the counts with the coarse-bucket Arrow
    # aggregate, not Ray's per-key sort-based one
    from ..pipelines.relational import grouped_arrow_aggregate

    counts = grouped_arrow_aggregate(
        ds.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True),
        keys="conv_id",
        aggs=[("n", "sum")],
    )
    cutoff = threshold_frac * total

    def over(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["n"], cutoff))

    hot = counts.map_batches(over, batch_format="pyarrow", zero_copy_batch=True)
    return sorted(r["conv_id"] for r in hot.take_all())


def _check_state_format(cfg: CdcConfig) -> None:
    """Pin the persisted state's partition mapping.

    conv_id -> part uses `routing_hash_strings`; if the hash provider (or
    `num_partitions`) ever changed between runs over the same out_dir,
    existing per-partition state would silently stop matching new events'
    routing.  A tiny `_FORMAT.json` marker written on first use makes that
    an explicit error (rebuild or migrate the state) instead.

    State partitions WITHOUT a marker are legacy state from before the
    marker existed — their routing provenance is unknown, so adopting them
    under the current provider could silently split keys across partitions.
    That case raises too (re-bootstrap), rather than stamping the new
    provider over old state.
    """
    from ..util import HASH_PROVIDER, read_json

    marker = os.path.join(cfg.out_dir, "_FORMAT.json")
    want = {"hash_provider": HASH_PROVIDER, "num_partitions": cfg.num_partitions}
    if os.path.exists(marker):
        got = read_json(marker)
        if got != want:
            raise ValueError(
                f"CDC state at {cfg.out_dir} was written with {got}, but this "
                f"engine/config is {want}; partition routing would not match "
                "existing state. Re-bootstrap the table (fresh out_dir + "
                "snapshot replay) or migrate the state partitions."
            )
    elif glob.glob(os.path.join(cfg.out_dir, "state", "part=*")):
        raise ValueError(
            f"CDC state at {cfg.out_dir} has partitions but no _FORMAT.json "
            "marker — its partition routing provenance is unknown (written "
            "by a pre-marker engine version). Re-bootstrap the table into a "
            "fresh out_dir instead of adopting it."
        )
    else:
        atomic_write_json(marker, want)


def _replay_fast_path(cfg: CdcConfig, run_id: str, files,
                      snapshot_path) -> "dict | None":
    """Whole-run no-op replay detection: a run that is JOURNALED (appended
    to runs.log only after a complete apply, under the lease), whose
    manifest survives, and whose lineage record still exists in EVERY
    partition the manifest counted, is fully committed — return the
    persisted summary (statuses transposed to all-skipped, matching what
    the slow path reports on replay) without rebuilding the spool.

    Why this matters: the spool is dropped after merge by default, so the
    slow replay path re-reads and re-normalizes the WHOLE event log just
    to let every partition skip via lineage — O(input) for a no-op.  At
    10^10 events that is the difference between a free restart and a full
    pass over the log.

    Why it is exactly as safe as the slow path: the slow path's skip test
    is the per-partition lineage file; this fast path requires the same
    files (all of them), plus the journal entry proving the original
    apply COMPLETED (so no partition was never attempted).  A partition
    whose lineage was lost (the crash-repair scenario) fails the count
    and falls through to the slow path, which repairs it."""
    from ..util import read_json

    manifest = os.path.join(cfg.out_dir, f"_manifest-{run_id}.json")
    runs_log = os.path.join(cfg.out_dir, "runs.log")
    if not (os.path.exists(manifest) and os.path.exists(runs_log)):
        return None
    with open(runs_log) as f:
        if run_id not in f.read().split():
            return None
    try:
        summary = read_json(manifest)
    except (OSError, ValueError):
        return None
    # identity check: an EXPLICIT run_id reused with different inputs must
    # take the slow path (which applies the new events); manifests written
    # before input_token existed fall back to requiring a content-derived
    # run_id
    want = compute_run_id(files, snapshot_path)
    have = summary.get("input_token")
    if (have is not None and have != want) or (have is None and run_id != want):
        return None
    lroot = os.path.join(cfg.out_dir, "lineage")
    n_lineage = 0
    if os.path.isdir(lroot):
        for d in os.listdir(lroot):
            if d.startswith("part=") and os.path.exists(
                os.path.join(lroot, d, f"{run_id}.json")
            ):
                n_lineage += 1
    if n_lineage != summary.get("partitions"):
        return None
    summary = dict(summary)
    summary["partitions_skipped"] = summary["partitions"]
    summary["partitions_applied"] = 0
    return summary


def apply_cdc(
    event_paths,
    cfg: CdcConfig,
    snapshot_path: "str | None" = None,
    run_id: "str | None" = None,
) -> dict:
    """Run one CDC apply job; returns the run summary (also written as
    `_manifest-<run_id>.json` under out_dir).  Idempotent per run_id."""
    files = _expand(event_paths) if event_paths else []
    run_id = run_id or compute_run_id(files, snapshot_path)
    if os.sep in run_id or not run_id:
        # run ids name ledger/journal/stage paths — a separator would
        # scatter them across nested dirs and break vacuum/journal parsing
        raise ValueError(f"run_id must be a non-empty path-safe token: {run_id!r}")
    os.makedirs(cfg.out_dir, exist_ok=True)
    _check_state_format(cfg)

    fast = _replay_fast_path(cfg, run_id, files, snapshot_path)
    if fast is not None:
        # re-enforce error limits against THIS call's config (the original
        # apply may have run with different limits)
        n_dirty = fast["dirty_records"]
        if cfg.error_limit_records is not None and n_dirty > cfg.error_limit_records:
            raise ErrorLimitExceeded(
                f"dirty records {n_dirty} > limit {cfg.error_limit_records}"
            )
        if cfg.error_limit_pct is not None:
            total = fast["events_in"] + n_dirty
            if total and n_dirty / total > cfg.error_limit_pct:
                raise ErrorLimitExceeded(
                    f"dirty ratio {n_dirty / total:.4f} > limit {cfg.error_limit_pct}"
                )
        return fast

    from .lease import writer_lease

    with writer_lease(cfg):
        lin = _run_exchange_and_merge(files, cfg, run_id, snapshot_path)
        _journal_run(cfg.out_dir, run_id)
        from .schema import record_schema_history

        record_schema_history(cfg.out_dir, run_id, files)

    n_dirty = count_dirty(cfg, run_id)
    events_in = int(lin["events_in"].sum()) if len(lin) else 0
    summary = {
        "run_id": run_id,
        # input identity (content-derived even when run_id is explicit):
        # lets the replay fast path refuse when a caller reuses a run_id
        # with DIFFERENT inputs (the slow path would apply the new events)
        "input_token": compute_run_id(files, snapshot_path),
        "partitions": int(len(lin)),
        "partitions_applied": int((lin["status"] == "applied").sum()) if len(lin) else 0,
        "partitions_skipped": int((lin["status"] == "skipped").sum()) if len(lin) else 0,
        "events_in": events_in,
        "events_prefiltered": int(lin["events_prefiltered"].sum()) if len(lin) else 0,
        "dups_dropped": int(lin["dups_dropped"].sum()) if len(lin) else 0,
        "orphan_updates": int(lin["orphan_updates"].sum()) if len(lin) else 0,
        "rows_live": int(lin["rows_live"].sum()) if len(lin) else 0,
        "rows_tombstone": int(lin["rows_tombstone"].sum()) if len(lin) else 0,
        "dirty_records": n_dirty,
        "input_files": len(files),
    }
    atomic_write_json(os.path.join(cfg.out_dir, f"_manifest-{run_id}.json"), summary)

    # reference ErrorRecordChecker.java:25-81 — record limit first, then pct
    if cfg.error_limit_records is not None and n_dirty > cfg.error_limit_records:
        raise ErrorLimitExceeded(
            f"dirty records {n_dirty} > limit {cfg.error_limit_records}"
        )
    if cfg.error_limit_pct is not None:
        total = events_in + n_dirty
        if total and n_dirty / total > cfg.error_limit_pct:
            raise ErrorLimitExceeded(
                f"dirty ratio {n_dirty / total:.4f} > limit {cfg.error_limit_pct}"
            )
    return summary


USER_COLS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _empty_final_table() -> pa.Table:
    """Typed empty converged table (USER_COLS schema) — returned when no
    state partitions exist yet (fresh out_dir, or a replay where every
    event went dirty), instead of letting pyarrow raise on an empty path
    list."""
    from .merge import STATE_SCHEMA

    return pa.table(
        {c: pa.array([], type=STATE_SCHEMA.field(c).type) for c in USER_COLS}
    )


def _partition_state_dirs(cfg: CdcConfig) -> "list[str]":
    root = os.path.join(cfg.out_dir, "state")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root) if d.startswith("part=")
    )


def _state_parquet_paths(cfg: CdcConfig) -> "list[str]":
    """Base state files only — valid as THE table exactly when no
    uncompacted delta-run files exist (see _any_delta_files)."""
    return sorted(
        os.path.join(d, f)
        for d in _partition_state_dirs(cfg)
        for f in os.listdir(d)
        if f == "state.parquet"
    )


def _any_delta_files(cfg: CdcConfig) -> bool:
    from .merge import partition_state_files

    return any(partition_state_files(d)[1] for d in _partition_state_dirs(cfg))


def _folded_state_dataset(
    cfg: CdcConfig, runs: "frozenset[str] | None" = None
) -> "ray.data.Dataset":
    """Converged per-partition STATE rows (incl. tombstone flags) as a
    streaming Dataset when LSM delta-run files exist: one fold task per
    partition (read base + deltas, fold — bounded by the partition-sizing
    rule), mapped over partition-dir descriptors.  `runs` restricts the
    fold to an as-of-run allow-set (see `time_travel`)."""
    from .merge import read_partition_state

    dirs = _partition_state_dirs(cfg)
    policy = cfg.orphan_updates

    def fold_dir(t: pa.Table) -> pa.Table:
        outs = [
            read_partition_state(d, policy=policy, runs=runs)
            for d in t["part_dir"].to_pylist()
        ]
        return pa.concat_tables(outs)

    return ray.data.from_items([{"part_dir": d} for d in dirs]).map_batches(
        fold_dir, batch_format="pyarrow", batch_size=1
    )


def _journal_run(out_dir: str, run_id: str) -> None:
    """Append run_id to the table's run journal (`runs.log`, one id per
    line, apply-completion order) — the ordering an as-of-run read uses.
    Idempotent: a re-run of the same run_id appends nothing.  Driver-side
    only (one writer per table dir, same assumption as the spool)."""
    path = os.path.join(out_dir, "runs.log")
    existing: "list[str]" = []
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read().split()
    if run_id not in existing:
        with open(path, "a") as f:
            f.write(run_id + "\n")


def time_travel_runs(cfg: CdcConfig, as_of_run: str) -> "frozenset[str]":
    """The run-id allow-set for an as-of read: every journaled run up to
    and including `as_of_run` (apply order, see _journal_run)."""
    path = os.path.join(cfg.out_dir, "runs.log")
    order: "list[str]" = []
    if os.path.exists(path):
        with open(path) as f:
            order = f.read().split()
    if as_of_run not in order:
        raise ValueError(
            f"run {as_of_run!r} not in {path} (journaled runs: {order})"
        )
    return frozenset(order[: order.index(as_of_run) + 1])


def time_travel(cfg: CdcConfig, as_of_run: str, sort: bool = False) -> pa.Table:
    """The converged live table AS OF a past run: fold each partition's
    base plus only the delta-run files journaled at or before
    `as_of_run`.  LSM semantics — reaches back to the last compaction;
    beyond it (or on a refold-mode table, which compacts every run)
    raises merge.TimeTravelError.  Requires merge_strategy='delta'."""
    return final_table_arrow(cfg, sort=sort, runs=time_travel_runs(cfg, as_of_run))


def final_table_arrow(
    cfg: CdcConfig, sort: bool = False, runs: "frozenset[str] | None" = None
) -> pa.Table:
    """Driver-side converged table (small results / tests): the live view
    over per-partition state — project the user columns, filter tombstones.
    With uncompacted LSM delta-run files the per-partition base+delta fold
    runs as parallel Ray tasks first.  For large tables use
    `read_final_table` (streaming Dataset).  `runs` restricts the fold to
    an as-of-run allow-set (see `time_travel`)."""
    import pyarrow.dataset as pads

    if runs is not None or _any_delta_files(cfg):
        from .merge import read_partition_state

        fold_task = ray.remote(num_cpus=1)(read_partition_state)
        policy = cfg.orphan_updates
        dirs = _partition_state_dirs(cfg)
        if not dirs:
            return _empty_final_table()
        states = ray.get([fold_task.remote(d, policy, runs) for d in dirs])
        t = pa.concat_tables(states)
        t = t.filter(
            pa.compute.equal(pa.compute.fill_null(t["_deleted"], False), False)
        ).select(list(USER_COLS))
    else:
        paths = _state_parquet_paths(cfg)
        if not paths:
            return _empty_final_table()
        t = pads.dataset(paths).to_table(
            columns=list(USER_COLS),
            filter=pa.compute.field("_deleted") == False,  # noqa: E712
        )
    if sort:
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t


def compact(cfg: CdcConfig, tombstone_retention_lsn: int = 0) -> dict:
    """Maintenance compaction: fold any LSM delta-run files into each
    partition's base state, then rewrite it dropping tombstones older
    than (partition watermark - retention).  Independent per-partition
    Ray tasks; atomic rewrites; safe to re-run (a crash between the base
    rewrite and the delta unlink re-applies identical registers — the
    fold is idempotent)."""
    from ..util import atomic_write_parquet
    from .merge import (
        _delta_run_id,
        folded_runs_of,
        next_folded_runs,
        partition_state_files,
        read_partition_state,
        with_folded_runs,
    )

    state_root = os.path.join(cfg.out_dir, "state")
    parts = sorted(
        int(d.split("=")[1]) for d in os.listdir(state_root) if d.startswith("part=")
    ) if os.path.isdir(state_root) else []
    policy = cfg.orphan_updates

    @ray.remote(num_cpus=1)
    def _compact(part: int) -> "tuple[int, int, int]":
        sd = cfg.state_dir(part)
        base, deltas = partition_state_files(sd)
        folded = next_folded_runs(
            folded_runs_of(base) if base else None,
            base is not None,
            [_delta_run_id(f) for f in deltas],
        )
        state = read_partition_state(sd, policy=policy)
        if state.num_rows == 0 and not deltas:
            return (0, 0, 0)
        wm = int(pa.compute.max(state["_lsn"]).as_py() or 0) if state.num_rows else 0
        horizon = wm - tombstone_retention_lsn
        keep = pa.compute.or_(
            pa.compute.equal(state["_deleted"], False),
            pa.compute.greater(state["_lsn"], horizon),
        )
        new_state = state.filter(keep) if state.num_rows else state
        dropped = state.num_rows - new_state.num_rows
        if dropped or deltas:
            atomic_write_parquet(
                cfg.state_path(part), with_folded_runs(new_state, folded)
            )
            for f in deltas:  # folded into the base above
                os.unlink(f)
        n_tomb = int(
            pa.compute.sum(new_state["_deleted"].cast(pa.int8())).as_py() or 0
        )
        return (dropped, new_state.num_rows - n_tomb, len(deltas))

    from .lease import writer_lease

    with writer_lease(cfg):
        results = ray.get([_compact.remote(p) for p in parts])
    return {
        "partitions": len(parts),
        "tombstones_dropped": sum(d for d, _, _ in results),
        "rows_live": sum(l for _, l, _ in results),
        "delta_runs_folded": sum(r for _, _, r in results),
    }


def lineage_summary(cfg: CdcConfig) -> dict:
    """Operational snapshot of a CDC table dir: per-partition watermark /
    checksum / last run from `_latest.json`, state file sizes, and
    uncompacted delta-run counts — the at-a-glance health view an
    operator checks before/after runs and compactions.  Driver-side
    metadata only (tiny JSON + file stats); never reads table data."""
    from ..util import read_json
    from .merge import partition_state_files

    parts = []
    for d in _partition_state_dirs(cfg):
        part = int(os.path.basename(d).split("=")[1])
        base, deltas = partition_state_files(d)
        latest_path = os.path.join(cfg.lineage_dir(part), "_latest.json")
        latest = read_json(latest_path) if os.path.exists(latest_path) else {}
        parts.append(
            {
                "part": part,
                "watermark": latest.get("watermark", -1),
                "run_id": latest.get("run_id"),
                "checksum": latest.get("checksum"),
                "state_bytes": os.path.getsize(base) if base else 0,
                "delta_runs": len(deltas),
                "delta_bytes": sum(os.path.getsize(f) for f in deltas),
            }
        )
    return {
        "out_dir": cfg.out_dir,
        "partitions": len(parts),
        "watermark_min": min((p["watermark"] for p in parts), default=-1),
        "watermark_max": max((p["watermark"] for p in parts), default=-1),
        "state_bytes": sum(p["state_bytes"] for p in parts),
        "delta_runs_total": sum(p["delta_runs"] for p in parts),
        "delta_bytes": sum(p["delta_bytes"] for p in parts),
        "parts": parts,
    }


def _with_writer_lease(fn):
    """Hold the out_dir writer lease across a composite verb (cfg is the
    first argument): these read table state (watermarks, dirty channel)
    to synthesize the events they then apply, so the whole read-then-
    apply sequence must exclude other writers, not just the inner
    apply_cdc (which re-enters the same lease)."""
    import functools

    @functools.wraps(fn)
    def wrapper(cfg, *args, **kwargs):
        from .lease import writer_lease

        os.makedirs(cfg.out_dir, exist_ok=True)
        with writer_lease(cfg):
            return fn(cfg, *args, **kwargs)

    return wrapper


@_with_writer_lease
def redact_convs(
    cfg: CdcConfig,
    conv_ids,
    run_id: str,
    replacement: str = "[REDACTED]",
) -> dict:
    """Right-to-be-forgotten THROUGH the log: synthesize one U event per
    live turn of the target conversations — text := `replacement` — at
    LSNs strictly above the table's global watermark (deterministic:
    ranked by (conv_id, turn_idx)), stage them under the table dir and
    apply exactly-once with the given run_id.

    Redacting via ordinary change events, never by editing files, keeps
    every engine invariant intact: lineage checksums stay consistent,
    downstream changefeed consumers observe the redaction as regular U
    rows (and IVM views update themselves), delta-mode tables journal it
    as a run like any other.  Pre-redaction text remains reconstructable
    through time travel until `compact()` folds history — run compaction
    to make forgetting physical, which is the same two-step contract
    lakehouse DELETE/VACUUM pairs have.

    The synthesized event set is bounded by the REQUEST (live turns of
    the listed conversations), not the table: the scan is a streaming
    thin projection; only the matching (conv_id, turn_idx) keys land on
    the driver for deterministic LSN ranking.  Idempotent per run_id —
    a retry stages the identical events and the merge skips committed
    partitions."""
    pc_ = pa.compute
    summ = lineage_summary(cfg)
    base_lsn = max(int(summ["watermark_max"]), 0)
    targets = pa.array(sorted(set(conv_ids)), pa.string())

    def pick(t: pa.Table) -> pa.Table:
        mask = pc_.is_in(t["conv_id"], value_set=targets)
        return t.filter(mask).select(["conv_id", "turn_idx"])

    thin = read_final_table(cfg).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )
    keys = pa.concat_tables(
        [ray.get(r) for r in thin.to_arrow_refs()]
    ).combine_chunks()
    keys = keys.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    n = keys.num_rows
    if n == 0:
        return {"run_id": run_id, "events_in": 0, "turns_redacted": 0}
    corrections = keys.append_column(
        "text", pa.array([replacement] * n, pa.string())
    )
    summary = apply_corrections(cfg, corrections, run_id=run_id)
    summary["turns_redacted"] = n
    return summary


# payload columns a correction batch may set (U-merge: null = untouched)
_CORRECTION_COLS = ("role", "text", "tool", "ts")


@_with_writer_lease
def apply_corrections(cfg: CdcConfig, corrections: pa.Table, run_id: str) -> dict:
    """Data-correction batch THROUGH the log: one synthesized U event per
    correction row — key columns (conv_id, turn_idx) plus any subset of
    payload columns to set (role/text/tool/ts; a missing or null column
    stays untouched, exactly the U-merge sparse-image rule) — at LSNs
    strictly above the table's global watermark, deterministically
    ranked by (conv_id, turn_idx), applied exactly-once as `run_id`.

    This is the general backfill/fix-up primitive (`redact_convs` is the
    text := constant special case): corrections land as ordinary change
    events, so lineage, changefeed consumers, IVM views, time travel and
    delta-mode journaling all observe them like any producer batch.

    The correction table is request-bounded driver input by contract.
    Duplicate (conv_id, turn_idx) keys raise — two corrections for one
    key in a single batch have no defined order.  Idempotent per run_id
    (a retry stages identical events; committed partitions skip)."""
    names = corrections.column_names
    for k in ("conv_id", "turn_idx"):
        if k not in names:
            raise ValueError(f"corrections need a {k!r} column")
    unknown = [
        c for c in names
        if c not in ("conv_id", "turn_idx") and c not in _CORRECTION_COLS
    ]
    if unknown:
        raise ValueError(
            f"unknown correction columns {unknown}; settable: "
            f"{list(_CORRECTION_COLS)}"
        )
    keys = corrections.select(["conv_id", "turn_idx"])
    if corrections.num_rows and (
        keys.group_by(["conv_id", "turn_idx"])
        .aggregate([([], "count_all")])
        .num_rows
        != corrections.num_rows
    ):
        raise ValueError(
            "duplicate (conv_id, turn_idx) keys in one correction batch"
        )
    summ = lineage_summary(cfg)
    base_lsn = max(int(summ["watermark_max"]), 0)
    corrections = corrections.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    n = corrections.num_rows
    cols = {
        "lsn": pa.array(base_lsn + 1 + np.arange(n, dtype=np.int64)),
        "op": pa.array(["U"] * n, pa.string()),
        "conv_id": corrections["conv_id"],
        "turn_idx": corrections["turn_idx"],
    }
    for c in _CORRECTION_COLS:
        tgt = pa.timestamp("us") if c == "ts" else pa.string()
        cols[c] = (
            corrections[c].cast(tgt) if c in names else pa.nulls(n, tgt)
        )
    events = pa.table(cols)
    stage_dir = os.path.join(cfg.out_dir, f"correct-{run_id}")
    os.makedirs(stage_dir, exist_ok=True)
    path = os.path.join(stage_dir, "events.parquet")
    from ..util import atomic_write_parquet

    atomic_write_parquet(path, events)
    summary = apply_cdc([path], cfg, run_id=run_id)
    summary["corrections_in"] = n
    return summary


def _split_manifest_ok(split_dir: str, input_token: str) -> bool:
    """True iff the split dir carries a completion manifest for exactly
    this input token and every file it recorded still exists at the
    recorded size (a partially-deleted or overwritten split rebuilds)."""
    from ..util import file_size, read_json

    marker = os.path.join(split_dir, "_split_manifest.json")
    try:
        man = read_json(marker)
    except (OSError, ValueError):
        return False
    if man.get("input_token") != input_token:
        return False
    try:
        return all(
            file_size(os.path.join(split_dir, rel)) == sz
            for rel, sz in man["files"].items()
        )
    except OSError:
        return False


def route_by_table(event_paths, out_root: str, table_col: str = "tbl",
                   input_token: "str | None" = None) -> dict:
    """Multi-table log routing: a Debezium-style stream interleaves many
    tables' change events in one shard sequence; split it into
    per-table shard directories with ONE parallel hive-partitioned
    Parquet write (the spool-exchange write shape — no shuffle, each
    write task fans its rows out by table), then apply each table with
    its own `apply_cdc` (own state dir, own ledger, own lineage).

    `event_paths` may be file/dir paths, an already-built
    ``ray.data.Dataset``, or a ZERO-ARG CALLABLE returning a Dataset —
    the Dataset forms fuse the tagging transform into the one hive write
    instead of staging a full tagged copy first (the callable defers even
    the read_parquet metadata fetch to the rebuild path).

    `input_token` (e.g. ``compute_run_id(source_files)``) makes the split
    IDEMPOTENT: a completion manifest (token + every written file's size,
    written only after a successful split) lets a replay with the same
    token return the existing split with zero Ray work — and because the
    files are untouched, the downstream per-table `apply_cdc` run ids
    (path+size) are stable too, so the whole multi-table replay collapses
    to the CDC whole-run fast path.  Without a token every call rewrites
    the split (parallel write file sizes are NOT deterministic run-to-run,
    so downstream run ids change and tables re-apply).

    Returns {table_name: shard_dir}.  Rows with a null `table_col`
    raise — silently routing them to a default table would merge two
    producers' keyspaces.  Not concurrency-safe per out_root (the rebuild
    truncates the split dir); per-table applies stay exactly-once through
    their run ledgers."""
    import shutil as _shutil

    from ..util import atomic_write_json, file_size

    split_dir = os.path.join(out_root, "by_table")

    def _mapping() -> dict:
        out = {}
        for d in sorted(os.listdir(split_dir)):
            if d.startswith(f"{table_col}="):
                out[d.split("=", 1)[1]] = os.path.join(split_dir, d)
        return out

    if input_token is not None and _split_manifest_ok(split_dir, input_token):
        return _mapping()

    _shutil.rmtree(split_dir, ignore_errors=True)
    os.makedirs(split_dir, exist_ok=True)

    def check(t: pa.Table) -> pa.Table:
        if t.num_rows and pa.compute.any(
            pa.compute.is_null(t[table_col])
        ).as_py():
            raise ValueError(
                f"route_by_table: null {table_col!r} — refusing to merge "
                "unattributed events into a default table"
            )
        return t

    if callable(event_paths) and not isinstance(event_paths, ray.data.Dataset):
        event_paths = event_paths()
    ds = (
        event_paths
        if isinstance(event_paths, ray.data.Dataset)
        else ray.data.read_parquet(_expand(event_paths))
    )
    ds.map_batches(
        check, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(split_dir, partition_cols=[table_col])
    if input_token is not None:
        files = {}
        for root, _dirs, names in os.walk(split_dir):
            for n in names:
                p = os.path.join(root, n)
                files[os.path.relpath(p, split_dir)] = file_size(p)
        atomic_write_json(
            os.path.join(split_dir, "_split_manifest.json"),
            {"input_token": input_token, "files": files},
        )
    return _mapping()


def tail_log(
    log_dir,
    cfg: CdcConfig,
    *,
    poll_interval: float = 5.0,
    idle_polls: "int | None" = None,
    max_batches: "int | None" = None,
    stop_file: "str | None" = None,
    on_batch=None,
    suffix: str = ".parquet",
    prepare=None,
) -> dict:
    """Continuous binlog/WAL-tail ingestion: poll `log_dir` for shards not
    yet consumed and apply each new batch exactly-once as its own run —
    the streaming half of the log -> lake-upsert contract (the reference
    is batch-only; its users run the mover on a cron.  Here the merge's
    run ledger makes the loop safe to leave running).

    Producer contract: shards must APPEAR atomically (write to a temp
    name, then rename — `util.atomic_write_parquet`'s behavior); the
    poll consumes any `*{suffix}` it can list.

    Non-Parquet wire formats plug in via `prepare(new_files, stage_dir)
    -> parquet shard paths` — e.g. `suffix=".jsonl",
    prepare=sources.envelope.stage_envelope_events` tails a raw
    Debezium-envelope JSON stream.  The run identity stays the ORIGINAL
    file batch; staging is idempotent per (batch, stage dir), so a crash
    between stage and apply re-stages into the same dir and the ledger
    still skips committed partitions.  Stage dirs live under
    out_dir/tail-stage/<run_id> (they are the run's resumable inputs;
    safe to delete once the run is fully applied).

    Restart story, two layers:
    - `tail.log` under out_dir journals consumed shard paths — an
      optimization so a restarted tail skips them without re-reading;
    - correctness never depends on it: a same-batch retry reuses its
      content-derived run_id (`compute_run_id`) and the ledger skips
      committed partitions, and even a re-delivery under a DIFFERENT
      batching converges identically because the per-key LSN-register
      fold structurally dedups re-applied events.

    Stops after `idle_polls` consecutive empty polls, after
    `max_batches` applied batches, or when `stop_file` appears (None
    everywhere = tail forever).  `on_batch(summary)` is the monitoring
    hook.  One tail per table dir (same single-writer assumption as the
    run journal).  Returns totals across the session.
    """
    def apply_batch(new, run_id):
        if prepare is not None:
            stage_dir = os.path.join(cfg.out_dir, "tail-stage", run_id)
            inputs = prepare(new, stage_dir)
        else:
            inputs = new
        return apply_cdc(inputs, cfg, run_id=run_id)

    return _tail_loop(
        log_dir, os.path.join(cfg.out_dir, "tail.log"), apply_batch,
        poll_interval=poll_interval, idle_polls=idle_polls,
        max_batches=max_batches, stop_file=stop_file, on_batch=on_batch,
        suffix=suffix,
    )


def _tail_loop(log_dir, journal, apply_batch, *, poll_interval, idle_polls,
               max_batches, stop_file, on_batch, suffix) -> dict:
    """The shared poll-consume-journal loop behind tail_log (one table)
    and tail_log_multi (interleaved stream).  `apply_batch(new_files,
    run_id) -> summary` owns the actual apply; the loop owns discovery,
    content-hash run identity, and the (optimization-only) consumed-file
    journal."""
    import time as _time

    consumed: "set[str]" = set()
    if os.path.exists(journal):
        with open(journal) as f:
            consumed = {ln.strip() for ln in f if ln.strip()}

    totals = {"batches": 0, "events_in": 0, "rows_live": 0, "files": 0,
              "runs": []}
    idle = 0
    while True:
        if stop_file and os.path.exists(stop_file):
            break
        from ..util import list_files

        try:
            files = sorted(list_files(log_dir, suffix=suffix))
        except FileNotFoundError:
            files = []  # log dir not created yet: keep polling
        new = [f for f in files if f not in consumed]
        if new:
            idle = 0
            run_id = compute_run_id(new)
            s = apply_batch(new, run_id)
            consumed.update(new)
            os.makedirs(os.path.dirname(journal), exist_ok=True)
            with open(journal, "a") as f:
                f.write("".join(p + "\n" for p in new))
            totals["batches"] += 1
            totals["events_in"] += s["events_in"]
            totals["rows_live"] = s["rows_live"]
            totals["files"] += len(new)
            totals["runs"].append(run_id)
            if on_batch is not None:
                on_batch(s)
            if max_batches is not None and totals["batches"] >= max_batches:
                break
            continue  # a batch may already be waiting: poll again now
        idle += 1
        if idle_polls is not None and idle >= idle_polls:
            break
        _time.sleep(poll_interval)
    return totals


def tail_log_multi(
    log_dir,
    out_root: str,
    *,
    table_col: str = "tbl",
    cfg_kwargs: "dict | None" = None,
    poll_interval: float = 5.0,
    idle_polls: "int | None" = None,
    max_batches: "int | None" = None,
    stop_file: "str | None" = None,
    on_batch=None,
    suffix: str = ".parquet",
) -> dict:
    """Continuous tailing of an INTERLEAVED multi-table change stream
    (the Debezium topic shape): each new micro-batch is split by
    `table_col` with one hive-partitioned write, then applied to each
    table's own out_dir (`out_root/<table>` — own state, ledger,
    lineage, journals) under the batch's content-hash run id.  A table
    appearing mid-stream simply materializes on its first event.

    Exactly-once per (table, batch): ledgers are per-table, the split
    stage is rebuilt deterministically per run id (rmtree + rewrite), so
    a crash anywhere re-splits and the committed partitions skip.
    Summaries aggregate events across tables; rows_live is per-table."""
    import shutil as _shutil

    cfg_kwargs = dict(cfg_kwargs or {})

    def apply_batch(new, run_id):
        split_dir = os.path.join(out_root, "tail-split", run_id)
        _shutil.rmtree(split_dir, ignore_errors=True)
        os.makedirs(split_dir, exist_ok=True)

        def check(t: pa.Table) -> pa.Table:
            if t.num_rows and pa.compute.any(
                pa.compute.is_null(t[table_col])
            ).as_py():
                raise ValueError(
                    f"tail_log_multi: null {table_col!r} — refusing to "
                    "merge unattributed events into a default table"
                )
            return t

        ray.data.read_parquet(list(new)).map_batches(
            check, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(split_dir, partition_cols=[table_col])
        summary = {"run_id": run_id, "events_in": 0, "rows_live": {},
                   "tables": []}
        for d in sorted(os.listdir(split_dir)):
            if not d.startswith(f"{table_col}="):
                continue
            table = d.split("=", 1)[1]
            cfg = CdcConfig(out_dir=os.path.join(out_root, table), **cfg_kwargs)
            s = apply_cdc([os.path.join(split_dir, d)], cfg, run_id=run_id)
            summary["events_in"] += s["events_in"]
            summary["rows_live"][table] = s["rows_live"]
            summary["tables"].append(table)
        # every table committed: certify the batch in the cross-table
        # transaction log (read_consistent's visibility frontier), THEN
        # spend the split stage.  A crash before this append leaves the
        # batch uncertified — applied-so-far tables are ahead of the
        # frontier until redelivery completes the batch, and consistent
        # readers never see the torn state.
        _append_tx_manifest(out_root, run_id, summary["tables"])
        _shutil.rmtree(split_dir, ignore_errors=True)
        return summary

    return _tail_loop(
        log_dir, os.path.join(out_root, "tail.log"), apply_batch,
        poll_interval=poll_interval, idle_polls=idle_polls,
        max_batches=max_batches, stop_file=stop_file, on_batch=on_batch,
        suffix=suffix,
    )


def _append_tx_manifest(out_root: str, run_id: str, tables: "list[str]") -> None:
    """Certify one fully-applied multi-table micro-batch in the
    cross-table transaction log (`tx.log`, one JSON object per line,
    batch-completion order).  Called only AFTER every per-table apply of
    the batch returned, so a line's presence == every (table, run) pair
    it names is committed.  Redelivery of a crashed batch re-appends;
    readers dedupe by run_id keeping the first occurrence."""
    import json as _json

    path = os.path.join(out_root, "tx.log")
    os.makedirs(out_root, exist_ok=True)
    with open(path, "a") as f:
        f.write(_json.dumps({"run_id": run_id, "tables": sorted(tables)}) + "\n")


def multi_table_tx_log(out_root: str) -> "list[dict]":
    """The certified batch sequence: tx.log manifests in completion
    order, deduped by run_id (redelivery re-appends; first wins)."""
    import json as _json

    path = os.path.join(out_root, "tx.log")
    if not os.path.exists(path):
        return []
    seen, out = set(), []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            m = _json.loads(ln)
            if m["run_id"] in seen:
                continue
            seen.add(m["run_id"])
            out.append(m)
    return out


def read_consistent(
    out_root: str,
    table_col: str = "tbl",
    cfg_kwargs: "dict | None" = None,
    sort: bool = False,
) -> pa.Table:
    """Cross-table TRANSACTIONALLY-CONSISTENT read of a multi-table CDC
    root (`tail_log_multi` layout): every table as of the last batch the
    tx.log certifies — one atomic point in the global micro-batch
    sequence.  A reader never observes a TORN batch (a crash or a
    concurrent tailer that has applied batch N to table alpha but not
    yet to table beta): uncertified runs are excluded via an as-of-run
    read of the affected table.

    Per table: its visibility frontier is the last certified manifest
    naming it.  If the table's own run journal has moved PAST that
    frontier (it holds torn-batch runs), the read time-travels to the
    frontier run — which requires merge_strategy='delta' history (the
    time_travel contract); a refold-mode table in that state raises
    TimeTravelError with the torn run named, rather than silently
    returning the torn state.  Tables exactly AT their frontier read the
    live table directly (any merge strategy).  Tables named by no
    certified manifest contribute nothing.

    Scale note: consistency is decided from DRIVER-SIDE metadata only
    (tx.log + per-table runs.log, bytes per batch); the data path is the
    ordinary per-table partitioned read.  Returns the union of the
    per-table tables with a `table_col` tag column."""
    certified = multi_table_tx_log(out_root)
    frontier: "dict[str, str]" = {}
    for m in certified:
        for t in m["tables"]:
            frontier[t] = m["run_id"]
    outs = []
    for table in sorted(frontier):
        cfg = CdcConfig(
            out_dir=os.path.join(out_root, table), **dict(cfg_kwargs or {})
        )
        runs_path = os.path.join(cfg.out_dir, "runs.log")
        applied: "list[str]" = []
        if os.path.exists(runs_path):
            with open(runs_path) as f:
                applied = f.read().split()
        want = frontier[table]
        if applied and applied[-1] == want:
            t = final_table_arrow(cfg, sort=sort)  # live == frontier
        else:
            t = time_travel(cfg, want, sort=sort)  # torn runs excluded
        outs.append(
            t.append_column(table_col, pa.array([table] * t.num_rows))
        )
    if not outs:
        raise ValueError(
            f"read_consistent: no certified batches in {out_root}/tx.log — "
            "nothing is consistently visible yet"
        )
    return pa.concat_tables(outs)


@_with_writer_lease
def replay_dirty(cfg: CdcConfig, run_id: str, fixer, new_run_id: str) -> dict:
    """Dead-letter repair-replay: read a run's dirty side-output
    (all-string rows + `_reason`, see normalize._write_dirty), apply
    `fixer(table) -> table` (e.g. `normalize.build_dirty_fixer(...)`),
    and re-apply the repaired rows exactly-once as `new_run_id`.

    Repaired rows go through the SAME normalize/validity gate as any
    ingest — the fixer cannot force a row past validation; whatever it
    leaves broken re-routes to the NEW run's dirty channel (visible in
    the returned summary's `dirty_records`), so repair loops converge
    instead of silently swallowing bad data.  The reference connector
    only RECORDS dirty rows (StdoutPluginCollector); replaying them is
    the recovery half real operators script by hand.

    The dirty set is read on the driver: it is bounded by the run's
    error limits (`CdcConfig.error_limit_records` / pct — a run that
    exceeds them fails instead of accumulating), so this is a small-side
    materialization by contract, not by luck.  Idempotent per
    `new_run_id`: the staged parquet is rewritten atomically and the
    merge skips committed partitions."""
    import pyarrow.parquet as _pq

    from ..util import atomic_write_parquet, list_files

    d = cfg.dirty_dir(run_id)
    files = sorted(list_files(d, suffix=".parquet")) if os.path.isdir(d) else []
    if not files:
        return {"run_id": new_run_id, "repaired_in": 0, "events_in": 0,
                "dirty_records": 0}
    dirty = pa.concat_tables(
        [_pq.read_table(f) for f in files], promote_options="default"
    )
    fixed = fixer(dirty)
    if "_reason" in fixed.column_names:
        fixed = fixed.drop_columns(["_reason"])
    stage_dir = os.path.join(cfg.out_dir, f"repair-{new_run_id}")
    os.makedirs(stage_dir, exist_ok=True)
    path = os.path.join(stage_dir, "events.parquet")
    atomic_write_parquet(path, fixed)
    summary = apply_cdc([path], cfg, run_id=new_run_id)
    summary["repaired_in"] = dirty.num_rows
    return summary


def migrate_state(old_out_dir: str, cfg: CdcConfig) -> dict:
    """Explicit migration for PERSISTED-ROUTING changes (hash provider or
    `num_partitions`, see _check_state_format / README "State
    compatibility"): re-route the old table's per-key LSN REGISTERS into
    a fresh out_dir under the current provider.  Unlike a snapshot
    re-bootstrap, this preserves per-key watermarks, per-column setter
    LSNs and tombstones exactly — a late redelivery of an already-applied
    event is still structurally ignored after migration.

    Shape: one Ray task per OLD partition reads its converged state
    (folding any LSM delta runs) and tags rows with their NEW partition
    (the same `assign_parts` normalize uses); a groupby exchange lands
    each new partition in one task that sorts by key and atomically
    commits state + lineage.  The old dir is never written."""
    import pyarrow.compute as _pc

    from ..util import atomic_write_parquet
    from .merge import LINEAGE_SCHEMA, read_partition_state, state_checksum
    from .normalize import assign_parts

    old_root = os.path.join(old_out_dir, "state")
    old_dirs = sorted(
        os.path.join(old_root, d) for d in os.listdir(old_root) if d.startswith("part=")
    ) if os.path.isdir(old_root) else []
    if not old_dirs:
        raise ValueError(f"no state partitions under {old_out_dir}")
    if os.path.abspath(old_out_dir) == os.path.abspath(cfg.out_dir):
        raise ValueError("migrate_state needs a FRESH out_dir (old dir is read-only)")
    if glob.glob(os.path.join(cfg.out_dir, "state", "part=*")):
        raise ValueError(f"target {cfg.out_dir} already has state partitions")
    os.makedirs(cfg.out_dir, exist_ok=True)
    _check_state_format(cfg)  # stamps the CURRENT provider marker

    policy = cfg.orphan_updates

    def reroute(t: pa.Table) -> pa.Table:
        outs = []
        for d in t["part_dir"].to_pylist():
            st = read_partition_state(d, policy=policy)
            if st.num_rows:
                part = assign_parts(st["conv_id"], st["turn_idx"], cfg)
                outs.append(st.append_column("part", pa.array(part, type=pa.int32())))
        if not outs:
            from .merge import STATE_SCHEMA

            empty = pa.table({f.name: pa.array([], f.type) for f in STATE_SCHEMA})
            return empty.append_column("part", pa.array([], pa.int32()))
        return pa.concat_tables(outs)

    run_id = "migrate-" + hashlib.sha256(
        os.path.abspath(old_out_dir).encode()
    ).hexdigest()[:12]

    def commit_part(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        state = g.drop_columns(["part"]).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        os.makedirs(cfg.state_dir(part), exist_ok=True)
        ldir = cfg.lineage_dir(part)
        os.makedirs(ldir, exist_ok=True)
        atomic_write_parquet(cfg.state_path(part), state)
        n_tomb = int(_pc.sum(state["_deleted"].cast(pa.int8())).as_py() or 0)
        # explicit None check: `or -1` would map a legitimate max LSN of 0
        # (snapshot-bootstrapped, never-updated keys) to -1 via falsiness
        wm_v = _pc.max(state["_lsn"]).as_py() if state.num_rows else None
        wm = int(wm_v) if wm_v is not None else -1
        rec = {
            "part": part,
            "run_id": run_id,
            "status": "migrated",
            "events_in": 0,
            "events_prefiltered": 0,
            "dups_dropped": 0,
            "orphan_updates": 0,
            "rows_live": state.num_rows - n_tomb,
            "rows_tombstone": n_tomb,
            "min_lsn": -1,
            "max_lsn": wm,
            "watermark": wm,
            "checksum": state_checksum(state),
            "wall_s": 0.0,
        }
        atomic_write_json(os.path.join(ldir, f"{run_id}.json"), rec)
        atomic_write_json(
            os.path.join(ldir, "_latest.json"),
            {"run_id": run_id, "watermark": wm, "checksum": rec["checksum"]},
        )
        return pa.table(
            {f.name: pa.array([rec.get(f.name)], type=f.type) for f in LINEAGE_SCHEMA}
        )

    lin = (
        ray.data.from_items([{"part_dir": d} for d in old_dirs])
        .map_batches(reroute, batch_format="pyarrow", batch_size=1)
        .groupby("part")
        .map_groups(commit_part, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "run_id": run_id,
        "partitions": int(len(lin)),
        "rows_live": int(lin["rows_live"].sum()) if len(lin) else 0,
        "rows_tombstone": int(lin["rows_tombstone"].sum()) if len(lin) else 0,
    }


def _table_digest(paths, cols, filter=None) -> dict:
    """Streaming order-insensitive table digest: per batch, two independent
    64-bit row hashes (polars hash_rows, fixed seeds) XOR-reduced, plus a
    per-turn TEXT digest keyed by (conv_id, turn_idx, text).  Rows are
    key-unique, so XOR aggregation is a sound multiset equality check; no
    sort, no driver materialization — works at any table size (the
    previous full to_table().sort_by() overflowed Arrow's int32 string
    offsets past ~2 GB of text)."""

    def d(t: pa.Table) -> pa.Table:
        import polars as pl

        tt = t.select(cols)
        if "ts" in cols:  # hash_rows wants plain physical types
            tt = tt.set_column(
                cols.index("ts"), "ts", tt["ts"].cast(pa.int64())
            )
        df = pl.from_arrow(tt)
        full1 = int(np.bitwise_xor.reduce(df.hash_rows(seed=0xA5).to_numpy())) if t.num_rows else 0
        full2 = int(np.bitwise_xor.reduce(df.hash_rows(seed=0x5A).to_numpy())) if t.num_rows else 0
        tx = pl.from_arrow(t.select(["conv_id", "turn_idx", "text"]))
        text1 = int(np.bitwise_xor.reduce(tx.hash_rows(seed=0xC3).to_numpy())) if t.num_rows else 0
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "full1": pa.array([full1], pa.uint64()),
                "full2": pa.array([full2], pa.uint64()),
                "text1": pa.array([text1], pa.uint64()),
            }
        )

    if isinstance(paths, (list, tuple)) and not paths:
        return {"rows": 0, "full": (0, 0), "text": 0}
    src = (
        paths
        if isinstance(paths, ray.data.Dataset)
        else ray.data.read_parquet(paths, columns=cols, filter=filter)
    )
    parts = src.map_batches(d, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return {
        "rows": int(parts["n"].sum()),
        "full": (
            int(np.bitwise_xor.reduce(parts["full1"].to_numpy().astype(np.uint64))),
            int(np.bitwise_xor.reduce(parts["full2"].to_numpy().astype(np.uint64))),
        ),
        "text": int(np.bitwise_xor.reduce(parts["text1"].to_numpy().astype(np.uint64))),
    }


def change_feed(
    cfg: CdcConfig, from_run: str, to_run: str, include_before: bool = False
) -> "ray.data.Dataset":
    """The CHANGE DATA FEED between two journaled runs: one I/U/D row per
    key whose state changed in the (from_run, to_run] window — the
    downstream-consumer stream a lakehouse CDF emits, derived here from
    the LSM run files with no extra bookkeeping:

    - per partition, fold the state as of each run (time-travel folds;
      `from_run`'s allow-set must be a subset of `to_run`'s — both come
      from the run journal, so this holds whenever from precedes to);
    - registers never disappear between compactions, so every change is
      decidable from the two folds: I = live now but not before (covers
      resurrections), D = live before but not now, U = live in both with
      a bumped per-key LSN watermark OR any visible-value change
      (at-least-once CDF semantics: a bump with unchanged values still
      emits U).  The value comparison is required for correctness, not
      just completeness — with out-of-order delivery ACROSS runs, a full
      I event can land in the window at an LSN below an already-applied
      orphan-U watermark: the fold is order-insensitive so the visible
      payload changes while max-LSN stays put.  Keys created AND deleted
      inside the window emit nothing.
    - the before-lookup is an exact Arrow index_in on the composite
      (conv_id \\x00 turn_idx) key string — no hash-collision exposure.

    I/U rows carry the new payload; D rows carry null payload.  With
    `include_before=True` the feed also carries the pre-image payload in
    `<col>_old` columns (null on I rows; on D rows the old payload is
    the only payload) — the Delta-CDF-style preimage that makes the feed
    sufficient for downstream incremental view maintenance (subtract the
    old contribution, add the new: see ops.transcripts.apply_stats_feed).
    Requires merge_strategy='delta' history reaching back to `from_run`
    (else merge.TimeTravelError, never a wrong feed).

    Partitions untouched in the window are PRUNED before any fold: a
    partition's state can only differ between the two as-of reads if it
    holds a delta-run file named by a window run, so the feed costs
    O(touched partitions), not O(all partitions) — the property that
    makes small-delta syncs cheap on a wide table.  Pruning is
    conservative at the compaction horizon: a partition whose base
    already folds past `from_run` is kept so the fold raises
    TimeTravelError exactly as before (never a silently-shorter feed);
    see `_window_touched_dirs`."""
    runs_a = time_travel_runs(cfg, from_run)
    runs_b = time_travel_runs(cfg, to_run)
    if not runs_a <= runs_b:
        raise ValueError(
            f"from_run {from_run!r} does not precede to_run {to_run!r} "
            "in the run journal"
        )
    from .merge import read_partition_state

    policy = cfg.orphan_updates
    window = frozenset(runs_b) - frozenset(runs_a)

    def _state_plus_window(d: str, a: pa.Table) -> pa.Table:
        """As-of-to_run state from the already-folded as-of-from state
        plus ONLY the window delta files — one fold over O(a + window)
        events instead of refolding base + every pre-window delta from
        scratch (sound by the fold's associativity, property-tested).
        Only the upsert orphan policy composes prefix-wise (a drop fold
        may discard an orphan U whose I lands inside the window); drop
        tables take the two-fold path."""
        if policy != "upsert":
            return read_partition_state(d, policy=policy, runs=runs_b)
        import pyarrow.parquet as pq

        from .merge import (
            _delta_run_id,
            fold,
            partition_state_files,
            state_to_events,
        )

        _, deltas = partition_state_files(d)
        win = [f for f in deltas if _delta_run_id(f) in window]
        if not win:
            return a
        pieces = ([state_to_events(a)] if a.num_rows else []) + [
            state_to_events(pq.read_table(f)) for f in win
        ]
        state, _ = fold(
            pa.concat_tables(pieces, promote_options="default"), policy="upsert"
        )
        return state

    def _empty_feed() -> pa.Table:
        payload = [c for c in USER_COLS if c not in ("conv_id", "turn_idx")]
        sch = _empty_final_table().schema
        cols = {"op": pa.array([], pa.string())}
        for c in USER_COLS:
            cols[c] = pa.array([], sch.field(c).type)
        if include_before:
            for c in payload:
                cols[f"{c}_old"] = pa.array([], sch.field(c).type)
        return pa.table(cols)

    def _keystr(t: pa.Table) -> pa.Array:
        return pa.compute.binary_join_element_wise(
            t["conv_id"].combine_chunks().cast(pa.string()),
            t["turn_idx"].combine_chunks().cast(pa.string()),
            "\x00",
        )

    def feed_dir(t: pa.Table) -> pa.Table:
        import numpy as np

        pc_ = pa.compute
        outs = []
        payload_cols = [c for c in USER_COLS if c not in ("conv_id", "turn_idx")]
        empty = _empty_feed()
        for d in t["part_dir"].to_pylist():
            a = read_partition_state(d, policy=policy, runs=runs_a)
            b = _state_plus_window(d, a)
            if b.num_rows == 0:
                continue
            live_b = pc_.invert(
                pc_.fill_null(b["_deleted"].combine_chunks(), False)
            ).to_numpy(zero_copy_only=False).astype(bool)
            lsn_b = b["_lsn"].combine_chunks().to_numpy(zero_copy_only=False)
            if a.num_rows:
                idx = pc_.index_in(_keystr(b), value_set=_keystr(a))
                in_a = pc_.is_valid(idx).to_numpy(zero_copy_only=False).astype(bool)
                dead_a = (
                    pc_.fill_null(
                        a["_deleted"].combine_chunks().take(idx), True
                    ).to_numpy(zero_copy_only=False).astype(bool)
                )
                lsn_a = (
                    pc_.fill_null(a["_lsn"].combine_chunks().take(idx), -1)
                    .to_numpy(zero_copy_only=False)
                )
            else:
                in_a = np.zeros(b.num_rows, bool)
                dead_a = np.ones(b.num_rows, bool)
                lsn_a = np.full(b.num_rows, -1, np.int64)
            live_a = in_a & ~dead_a
            is_i = live_b & ~live_a
            is_d = ~live_b & live_a
            val_change = np.zeros(b.num_rows, bool)
            if a.num_rows:
                for c in USER_COLS:
                    if c in ("conv_id", "turn_idx"):
                        continue
                    vb = b[c].combine_chunks()
                    va = a[c].combine_chunks().take(idx)
                    nb = pc_.is_null(vb).to_numpy(zero_copy_only=False)
                    na = pc_.is_null(va).to_numpy(zero_copy_only=False)
                    neq = pc_.fill_null(pc_.not_equal(vb, va), False).to_numpy(
                        zero_copy_only=False
                    ).astype(bool)
                    val_change |= (nb != na) | neq
            is_u = live_b & live_a & ((lsn_b != lsn_a) | val_change)
            sel = is_i | is_d | is_u
            if not sel.any():
                continue
            rows = b.filter(pa.array(sel))
            op = np.where(
                is_i[sel], "I", np.where(is_d[sel], "D", "U")
            )
            d_mask = pa.array(is_d[sel])
            cols = {"op": pa.array(op)}
            for c in USER_COLS:
                col = rows[c].combine_chunks()
                if c not in ("conv_id", "turn_idx"):
                    # D rows carry null payload (the value is gone)
                    col = pc_.if_else(d_mask, pa.nulls(rows.num_rows, col.type), col)
                cols[c] = col
            if include_before:
                # pre-image payload: the as-of-from_run values — null on I
                # rows (no prior live version; a tombstone's stale payload
                # must NOT leak into preimages, so mask on live_a, not in_a)
                old_valid = pa.array(live_a[sel])
                sel_arr = pa.array(sel)
                idx_sel = idx.filter(sel_arr) if a.num_rows else None
                for c in payload_cols:
                    typ = rows[c].type
                    if idx_sel is not None:
                        old = a[c].combine_chunks().take(idx_sel)
                        old = pc_.if_else(
                            old_valid, old, pa.nulls(rows.num_rows, typ)
                        )
                    else:
                        old = pa.nulls(rows.num_rows, typ)
                    cols[f"{c}_old"] = old
            outs.append(pa.table(cols))
        return pa.concat_tables(outs) if outs else empty

    dirs = _window_touched_dirs(cfg, runs_a, runs_b)
    if not dirs:
        return ray.data.from_arrow(_empty_feed())
    return ray.data.from_items([{"part_dir": d} for d in dirs]).map_batches(
        feed_dir, batch_format="pyarrow", batch_size=1
    )


def _window_touched_dirs(
    cfg: CdcConfig, runs_a: "frozenset[str]", runs_b: "frozenset[str]"
) -> "list[str]":
    """Partition dirs that can contribute change-feed rows for the window
    runs_b - runs_a.  A partition's two as-of folds can only differ if a
    window run landed a delta file there (delta filenames carry the run
    id), so dirs without one are pruned.  A base state folding runs
    outside runs_a (compaction past from_run, refold-mode bases,
    pre-run-tracking state) cannot serve the from_run fold at all —
    raise TimeTravelError here, driver-side and unwrapped, instead of
    letting the task fold hit it: pruning must never turn the horizon
    error into a silently shorter feed.  Driver-side metadata only
    (dir listings + parquet footers of suspect bases)."""
    from .merge import (
        TimeTravelError,
        _delta_run_id,
        folded_runs_of,
        partition_state_files,
    )

    window = set(runs_b) - set(runs_a)
    allowed = set(runs_a)
    out = []
    for d in _partition_state_dirs(cfg):
        base, deltas = partition_state_files(d)
        if base is not None:
            folded = folded_runs_of(base)
            if folded is None or not set(folded) <= allowed:
                raise TimeTravelError(
                    f"{base} folds runs {sorted(folded) if folded else '<unrecorded>'} "
                    "beyond the feed window's from_run — compaction moved the "
                    "horizon past it; the change feed reaches back only to the "
                    "last compacted base"
                )
        if any(_delta_run_id(f) in window for f in deltas):
            out.append(d)
    return out


def verify_against(cfg: CdcConfig, expected_path: str) -> dict:
    """The north-rule invariant as an engine operation: compare the
    converged table against an expected transcripts Parquet — per-turn
    text equality (keyed by the stable (conv_id, turn_idx) identity) plus
    full-row equality and row counts, via streaming multiset digests."""
    cols = list(USER_COLS)
    if _any_delta_files(cfg):
        got = _table_digest(read_final_table(cfg), cols)
    else:
        got = _table_digest(
            _state_parquet_paths(cfg),
            cols,
            filter=pa.compute.field("_deleted") == False,  # noqa: E712
        )
    exp = _table_digest(expected_path, cols)
    res = {
        "rows": got["rows"],
        "rows_expected": exp["rows"],
        "rows_equal": got["rows"] == exp["rows"],
        "text_equal": got["rows"] == exp["rows"] and got["text"] == exp["text"],
        "full_equal": got["rows"] == exp["rows"] and got["full"] == exp["full"],
    }
    res["ok"] = res["rows_equal"] and res["text_equal"] and res["full_equal"]
    return res


def read_final_table(
    cfg: CdcConfig,
    sort: bool = False,
    runs: "frozenset[str] | None" = None,
    columns: "list[str] | None" = None,
) -> "ray.data.Dataset":
    """The converged user-facing table as a streaming Dataset: the live
    view over per-partition state (tombstones filtered at the read, pushed
    down to the parquet scan).  With uncompacted LSM delta-run files each
    partition folds base+deltas inside its read task instead.  `runs`
    restricts the fold to an as-of-run allow-set (see `time_travel`).
    `columns` prunes the read to a USER_COLS subset — downstream
    analytics that touch two columns must not lift full transcripts off
    storage (the repo-wide prune-at-the-read rule)."""
    cols = list(USER_COLS) if columns is None else list(columns)
    unknown = [c for c in cols if c not in USER_COLS]
    if unknown:
        raise ValueError(f"unknown columns {unknown}; available: {list(USER_COLS)}")
    if runs is not None or _any_delta_files(cfg):
        def live_view(t: pa.Table) -> pa.Table:
            keep = pa.compute.equal(
                pa.compute.fill_null(t["_deleted"], False), False
            )
            return t.filter(keep).select(cols)

        # the fold needs full registers (per-column setter LSNs), so the
        # delta path prunes after the in-task fold, not at the scan
        ds = _folded_state_dataset(cfg, runs=runs).map_batches(
            live_view, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        paths = _state_parquet_paths(cfg)
        if not paths:
            return ray.data.from_arrow(_empty_final_table().select(cols))
        ds = ray.data.read_parquet(
            paths,
            columns=cols,
            filter=pa.compute.field("_deleted") == False,  # noqa: E712
        )
    if sort:
        ds = ds.sort(["conv_id", "turn_idx"])
    return ds


def read_convs(
    cfg: CdcConfig, conv_ids: "list[str]", policy: "str | None" = None
) -> pa.Table:
    """Pruned point lookup: the live turns of `conv_ids` without scanning
    the table.  Each non-hot key routes to exactly one partition under the
    persisted routing (`normalize.assign_parts` sans salt), so the read
    touches O(distinct partitions of the requested keys) state files; a
    `conv_id IN (...)` predicate is pushed into every parquet scan, and
    state files are sorted by (conv_id, turn_idx), so row-group min/max
    stats prune within each file too.  Keys in `cfg.hot_keys` are SALTED
    across partitions by turn_idx — those widen the read to all partitions
    (still predicate-pushed, fanned out as Ray tasks).

    At 100 TB / 64k partitions a cold lookup of k keys costs k pruned
    row-group reads — the operational "show me this conversation" path
    that previously required `read_final_table().filter(...)` over
    everything.  Uncompacted LSM delta runs fold per partition inside the
    same pruned read (`merge.read_partition_state(conv_filter=...)`)."""
    from .merge import read_partition_state
    from ..util import routing_hash_strings

    _check_state_format(cfg)
    ids = sorted(set(conv_ids))
    if not ids:
        return _empty_final_table()
    hot = set(cfg.hot_keys)
    cold = [c for c in ids if c not in hot]
    if any(c in hot for c in ids):
        parts = range(cfg.num_partitions)  # salted keys may live anywhere
    else:
        h = routing_hash_strings(pa.array(cold, type=pa.string()))
        parts = sorted(set((h % np.uint64(cfg.num_partitions)).astype(int).tolist()))
    dirs = [cfg.state_dir(p) for p in parts]
    policy = policy or cfg.orphan_updates

    if len(dirs) <= 8:  # few partitions: driver-side, lowest latency
        pieces = [read_partition_state(d, policy=policy, conv_filter=ids) for d in dirs]
    else:  # hot-key widening: fan the pruned reads out as tasks
        task = ray.remote(num_cpus=1)(read_partition_state)
        pieces = ray.get([task.remote(d, policy=policy, conv_filter=ids) for d in dirs])
    state = pa.concat_tables(pieces, promote_options="default")
    live = state.filter(
        pa.compute.equal(pa.compute.fill_null(state["_deleted"], False), False)
    )
    return live.select(list(USER_COLS)).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


@_with_writer_lease
def snapshot_sync(cfg: CdcConfig, snapshot_path: str, run_id: str) -> dict:
    """Periodic-full-snapshot ingest for sources that cannot produce a
    binlog (the reference's ONLY mode — its Snowflake reader re-dumps the
    table; tigergraphwriter upserts blind, reference GcsReader.java /
    readers generally): diff the new snapshot against the converged table
    and apply the difference as ORDINARY change events, so the table
    converges to exactly the snapshot while lineage, watermarks,
    changefeed consumers, IVM views, time travel and delta-mode
    journaling all observe a normal run.

    Diff rule (per (conv_id, turn_idx) key):
      - in snapshot, absent/changed in table -> full I with the snapshot
        row.  I, not U: a full I resets EVERY payload column, including
        ones the snapshot NULLED — a sparse U (null = untouched) could
        never clear them;
      - live in table, absent from snapshot -> D.
    Every diff event carries lsn = watermark_max + 1: one event per key,
    so per-key (key, lsn) uniqueness holds, and any later producer event
    outranks the sync exactly as it would a normal batch.

    Scale shape: the snapshot routes through ONE hive-partitioned write
    under the PERSISTED partitioning (normalize.assign_parts — identical
    salting to the state), then one Ray task per partition full-outer
    Acero-joins its state slice against its snapshot slice and emits
    only the diff — O(state_partition + snapshot_partition) memory per
    task, no global materialization, diff volume proportional to actual
    drift.  The diff then applies through the standard exactly-once
    pipeline (idempotent per run_id)."""
    from ..util import atomic_write_parquet
    from .merge import read_partition_state
    from .normalize import assign_parts

    summ = lineage_summary(cfg)
    base_lsn = max(int(summ["watermark_max"]), 0)
    stage_root = os.path.join(cfg.out_dir, f"snapsync-{run_id}")
    snap_dir = os.path.join(stage_root, "snap")
    import shutil as _shutil

    _shutil.rmtree(stage_root, ignore_errors=True)  # deterministic rebuild
    os.makedirs(snap_dir, exist_ok=True)

    def route(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "conv_id": t["conv_id"].cast(pa.string()),
                "turn_idx": t["turn_idx"].cast(pa.int32()),
                "role": t["role"].cast(pa.string()),
                "text": t["text"].cast(pa.string()),
                "tool": t["tool"].cast(pa.string()),
                "ts": t["ts"].cast(pa.timestamp("us")),
            }
        )
        part = assign_parts(t["conv_id"], t["turn_idx"], cfg)
        return t.append_column("part", pa.array(part))

    ray.data.read_parquet(snapshot_path).map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(snap_dir, partition_cols=["part"])

    snap_parts = {
        int(d.split("=")[1])
        for d in os.listdir(snap_dir)
        if d.startswith("part=")
    }
    state_root = os.path.join(cfg.out_dir, "state")
    state_parts = (
        {
            int(d.split("=")[1])
            for d in os.listdir(state_root)
            if d.startswith("part=")
        }
        if os.path.isdir(state_root)
        else set()
    )
    payload = ["role", "text", "tool", "ts"]
    pc_ = pa.compute

    @ray.remote(num_cpus=1)
    def diff_part(part: int) -> "tuple[str | None, int, int]":
        state = read_partition_state(cfg.state_dir(part), policy=cfg.orphan_updates)
        live = state.filter(
            pc_.equal(pc_.fill_null(state["_deleted"], False), False)
        ).select(list(USER_COLS))
        sd = os.path.join(snap_dir, f"part={part}")
        if os.path.isdir(sd):
            import pyarrow.dataset as pads

            snap = pads.dataset(sd, format="parquet").to_table(
                columns=list(USER_COLS)
            )
        else:
            snap = live.slice(0, 0)
        l = live.append_column("_l", pa.array(np.ones(live.num_rows, np.int8)))
        r = snap.rename_columns(
            ["conv_id", "turn_idx"] + [f"{c}_s" for c in payload]
        ).append_column("_r", pa.array(np.ones(snap.num_rows, np.int8)))
        j = l.join(r, keys=["conv_id", "turn_idx"], join_type="full outer")
        in_l = pc_.is_valid(j["_l"])
        in_r = pc_.is_valid(j["_r"])
        changed = pa.array(np.zeros(j.num_rows, bool))
        for c in payload:
            a, b = j[c], j[f"{c}_s"]
            eq = pc_.or_(
                pc_.fill_null(pc_.equal(a, b), False),
                pc_.and_(pc_.is_null(a), pc_.is_null(b)),
            )
            changed = pc_.or_(changed, pc_.invert(eq))
        ins = j.filter(pc_.and_(in_r, pc_.or_(pc_.invert(in_l), changed)))
        dels = j.filter(pc_.and_(in_l, pc_.invert(in_r)))
        n_i, n_d = ins.num_rows, dels.num_rows
        if n_i + n_d == 0:
            return None, 0, 0
        ev = pa.table(
            {
                "lsn": pa.array(
                    np.full(n_i + n_d, base_lsn + 1, np.int64)
                ),
                "op": pa.array(["I"] * n_i + ["D"] * n_d, pa.string()),
                "conv_id": pa.concat_arrays(
                    [ins["conv_id"].combine_chunks(),
                     dels["conv_id"].combine_chunks()]
                ),
                "turn_idx": pa.concat_arrays(
                    [ins["turn_idx"].combine_chunks(),
                     dels["turn_idx"].combine_chunks()]
                ),
                **{
                    c: pa.concat_arrays(
                        [ins[f"{c}_s"].combine_chunks(),
                         pa.nulls(n_d, ins[f"{c}_s"].type)]
                    )
                    for c in payload
                },
            }
        )
        path = os.path.join(stage_root, f"events-{part:05d}.parquet")
        atomic_write_parquet(path, ev)
        return path, n_i, n_d

    results = ray.get([diff_part.remote(p) for p in sorted(snap_parts | state_parts)])
    files = [p for p, _, _ in results if p]
    n_ins = sum(i for _, i, _ in results)
    n_del = sum(d for _, _, d in results)
    if files:
        summary = apply_cdc(files, cfg, run_id=run_id)
    else:
        _journal_run(cfg.out_dir, run_id)
        summary = {"run_id": run_id, "events_in": 0, "rows_live": None}
    summary["sync_inserts"] = n_ins
    summary["sync_deletes"] = n_del
    return summary


def vacuum(cfg: CdcConfig, prune_dirty: bool = False) -> dict:
    """Reclaim the staging a long-lived table accumulates: the
    `correct-*` / `repair-*` / `snapsync-*` / `tail-stage/*` event
    stages and any leftover `spool/*` whose run is JOURNALED (committed
    end-to-end, runs.log) — staged events exist only so a crashed run
    can retry with the same run_id, so a journaled run's stage is dead
    weight.  Unjournaled stages are resume material and are kept.

    `prune_dirty=True` also drops journaled runs' dirty channels — do
    this only after `replay_dirty` triage; the dead-letter rows are the
    only copy of rejected input.  Never touches state/, lineage/,
    journals, or the format marker.  Returns dirs removed + bytes
    reclaimed.  Holds the writer lease (a concurrent apply could be
    mid-retry on a stage this would sweep)."""
    import shutil as _shutil

    from .lease import writer_lease

    path = os.path.join(cfg.out_dir, "runs.log")
    journaled: "set[str]" = set()
    if os.path.exists(path):
        with open(path) as f:
            journaled = set(f.read().split())

    def _size(d: str) -> int:
        total = 0
        for root, _dirs, fs in os.walk(d):
            for f in fs:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    removed: "list[str]" = []
    reclaimed = 0
    with writer_lease(cfg):
        candidates: "list[tuple[str, str]]" = []  # (run_id, dir)
        for name in os.listdir(cfg.out_dir) if os.path.isdir(cfg.out_dir) else []:
            full = os.path.join(cfg.out_dir, name)
            if not os.path.isdir(full):
                continue
            for prefix in ("correct-", "repair-", "snapsync-", "expire-"):
                if name.startswith(prefix):
                    candidates.append((name[len(prefix):], full))
        for sub in ("spool", "tail-stage"):
            d = os.path.join(cfg.out_dir, sub)
            if os.path.isdir(d):
                candidates.extend(
                    (run, os.path.join(d, run)) for run in os.listdir(d)
                )
        if prune_dirty:
            d = os.path.join(cfg.out_dir, "dirty")
            if os.path.isdir(d):
                candidates.extend(
                    (run, os.path.join(d, run)) for run in os.listdir(d)
                )
        for run, full in candidates:
            if run not in journaled:
                continue  # retry/resume material for an uncommitted run
            reclaimed += _size(full)
            _shutil.rmtree(full, ignore_errors=True)
            removed.append(os.path.relpath(full, cfg.out_dir))
    return {
        "dirs_removed": sorted(removed),
        "bytes_reclaimed": reclaimed,
        "journaled_runs": len(journaled),
    }


def runs_report(cfg: CdcConfig) -> "list[dict]":
    """Per-run ingest health, apply order: each journaled run's manifest
    (events in/prefiltered, dup drops, orphan updates, dirty count, rows
    live/tombstoned, partitions applied vs skipped) as one row — the
    "did last night's runs look normal" view operators diff against the
    day before.  Pure metadata reads (runs.log + _manifest-*.json);
    a journaled run missing its manifest (pre-manifest version, or a
    snapshot_sync no-op) reports {"run_id": ..., "manifest": None}."""
    import json

    path = os.path.join(cfg.out_dir, "runs.log")
    order: "list[str]" = []
    if os.path.exists(path):
        with open(path) as f:
            order = f.read().split()
    out = []
    for i, run in enumerate(order):
        mp = os.path.join(cfg.out_dir, f"_manifest-{run}.json")
        try:
            with open(mp) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            rec = None
        out.append({"order": i, "run_id": run, "manifest": rec})
    return out


@_with_writer_lease
def expire_rows(cfg: CdcConfig, older_than_ts, run_id: str) -> dict:
    """Retention enforcement THROUGH the log: synthesize one D event per
    live turn whose `ts` is strictly older than `older_than_ts`, at LSNs
    above the table watermark (deterministically ranked by (conv_id,
    turn_idx)), and apply exactly-once as `run_id` — the time-based
    sibling of `redact_convs`.  Expiry lands as ordinary change events,
    so changefeed consumers see the D rows, IVM views shrink themselves,
    and delta-mode tables journal it as a run; the bytes become physical
    only at `compact()` (tombstone GC), the same two-step contract as
    lakehouse DELETE/VACUUM.

    The matching key set is a streaming thin projection of the live
    view ((conv_id, turn_idx, ts) only — predicate applied per batch at
    the scan); only matching keys land on the driver for deterministic
    ranking, bounded by the expiring span, not the table."""
    cutoff = pa.scalar(
        np.datetime64(older_than_ts, "us").astype("datetime64[us]"),
        pa.timestamp("us"),
    )
    pc_ = pa.compute
    summ = lineage_summary(cfg)
    base_lsn = max(int(summ["watermark_max"]), 0)

    def pick(t: pa.Table) -> pa.Table:
        mask = pc_.fill_null(pc_.less(t["ts"], cutoff), False)
        return t.filter(mask).select(["conv_id", "turn_idx"])

    thin = read_final_table(cfg, columns=["conv_id", "turn_idx", "ts"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )
    keys = pa.concat_tables(
        [ray.get(r) for r in thin.to_arrow_refs()]
    ).combine_chunks()
    keys = keys.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    n = keys.num_rows
    if n == 0:
        _journal_run(cfg.out_dir, run_id)
        return {"run_id": run_id, "events_in": 0, "turns_expired": 0}
    events = pa.table(
        {
            "lsn": pa.array(base_lsn + 1 + np.arange(n, dtype=np.int64)),
            "op": pa.array(["D"] * n, pa.string()),
            "conv_id": keys["conv_id"],
            "turn_idx": keys["turn_idx"],
            "role": pa.nulls(n, pa.string()),
            "text": pa.nulls(n, pa.string()),
            "tool": pa.nulls(n, pa.string()),
            "ts": pa.nulls(n, pa.timestamp("us")),
        }
    )
    stage_dir = os.path.join(cfg.out_dir, f"expire-{run_id}")
    os.makedirs(stage_dir, exist_ok=True)
    path = os.path.join(stage_dir, "events.parquet")
    from ..util import atomic_write_parquet

    atomic_write_parquet(path, events)
    summary = apply_cdc([path], cfg, run_id=run_id)
    summary["turns_expired"] = n
    return summary


def mirror_to_sql(
    cfg: CdcConfig,
    connection_factory,
    table: str,
    *,
    mode: str = "replace",
    dialect: str = "sqlite",
    exactly_once: bool = True,
    concurrency: int = 1,
) -> int:
    """Mirror the converged live table into an RDBMS — the reference's
    ONLY delivery mode (tigergraphwriter / CommonRdbmsWriter push rows at
    a database), recreated as a downstream of the lake table: streaming
    `read_final_table` -> the exactly-once SQL Datasink (per-batch ledger
    committed atomically with the data, so Ray task retries never
    double-insert).  mode "replace" upserts by (conv_id, turn_idx);
    "insert" appends (for an empty destination).  Returns rows committed.

    Keyed on the CURRENT table state: run it after each apply (or from
    `tail_log`'s on_batch) for a continuously-refreshed mirror; the
    upsert makes re-mirroring idempotent."""
    from ..sinks.sql import SqlSinkConfig, write_sql

    sink = SqlSinkConfig(
        table=table,
        columns=tuple(USER_COLS),
        write_mode=mode,
        conflict_keys=("conv_id", "turn_idx"),
        dialect=dialect,
        exactly_once=exactly_once,
        concurrency=concurrency,
        pre_sql=(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            "conv_id TEXT NOT NULL, turn_idx INTEGER NOT NULL, "
            "role TEXT, text TEXT, tool TEXT, ts TIMESTAMP, "
            "PRIMARY KEY (conv_id, turn_idx))",
        ),
    )
    return write_sql(read_final_table(cfg), connection_factory, sink)
