"""CDC job configuration.

The analogue of the reference's job-JSON `Configuration` tree
(common/.../util/Configuration.java) — but typed, flat, and small.  Also
carries the error-limit semantics of ErrorRecordChecker.java:25-81
(record-count limit takes priority over percentage).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class CdcConfig:
    out_dir: str
    # hash-partition count for the merge shuffle.  At 100 TB this is the
    # only knob that must grow (keep partitions ~0.5-2 GB of state each);
    # everything else streams.
    num_partitions: int = 64
    # "upsert": a U for an absent/deleted key creates a partial row.
    # "drop": U requires a live key; orphan updates are counted + dropped,
    #         and a U after an un-reinserted D stays deleted.
    orphan_updates: str = "upsert"
    # CSV-style null sentinel applied to string payload columns BEFORE
    # validation (reference: UnstructuredStorageReaderUtil.java:352-353 —
    # exact equality, not case-insensitive).  None = off (parquet default).
    null_format: "str | None" = None
    # reference ErrorRecordChecker semantics: fail the job when dirty
    # records exceed `error_limit_records` (priority) else when the dirty
    # ratio exceeds `error_limit_pct`.
    error_limit_records: "int | None" = None
    error_limit_pct: "float | None" = None
    # skew mitigation: conv_ids in `hot_keys` are salted — partitioned by
    # (conv_id, turn_idx) instead of conv_id, spreading a hot conversation's
    # turns across partitions while keeping each merge key co-located.
    hot_keys: tuple = ()
    # single-writer guard (cdc/lease.py): mutating verbs (apply/compact/
    # redact/corrections) take a heartbeat lease on out_dir and fail fast
    # with LeaseHeld if another live writer owns it; a crashed writer's
    # lease is taken over after `lease_ttl_s` (immediately when its pid is
    # provably dead on this host).  Disable when an external scheduler
    # already serializes writers.
    writer_lease: bool = True
    lease_ttl_s: float = 120.0
    # skip events at/below the partition's committed watermark before the
    # fold.  ONLY safe when every run consumes a strictly LSN-contiguous
    # slice of the log (no straggler events below the previous run's max
    # LSN) — real WAL tails reorder slightly, so this defaults OFF; per-key
    # idempotency comes from the fold against the state's per-key `_lsn`
    # watermarks, which is always correct.
    prefilter_watermark: bool = False
    # multi-format timestamp parse fallback for string ts columns
    # (reference ColumnCast.java:87-117 datetime->date->time->extra).
    ts_formats: tuple = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%H:%M:%S")
    # target bytes per read block: 64 MB keeps the per-task critical path
    # short and (crucially for scaling measurements) makes the block layout
    # a function of DATA SIZE only — the same job at 8 and 32 CPUs runs the
    # identical task DAG, differing only in concurrency.  CPUs only floor
    # the count on small inputs.
    target_read_block_bytes: int = 32 << 20
    # Partition exchange: "spool" (default) writes the normalized stream
    # once as hive-partitioned Parquet and merges each partition from its
    # directory — one parallel write + one parallel read, no object-store
    # all-to-all, doubles as a resume point.  "groupby" uses Ray's
    # in-memory shuffle (kept for comparison; measured slower and
    # anti-scaling on one node at the 774 MB tier).
    exchange: str = "spool"
    # delete the per-run spool after a successful merge (it is re-derivable
    # from the input log; lineage still guards exactly-once on re-runs)
    drop_spool_after_merge: bool = True
    # spool parquet compression: "none" halves the exchange's encode CPU
    # (measured: phase A 1.8s -> 0.8s) at 2.2x the transient bytes — right
    # for local disks/tmpfs; set "snappy"/"zstd" when the spool crosses a
    # network to shared storage.
    spool_compression: str = "none"
    # spool file format: "ipc" (Arrow IPC/feather — near-memcpy encode,
    # mmap decode; the spool is ephemeral so parquet's encoding buys
    # nothing) or "parquet" (smaller at rest; use for spools that live on
    # slow shared storage).  Measured on the 5.9M-event bench: ipc cuts
    # phase A 2.1s -> 1.2s and phase B fragment decode to near zero.
    # For ipc, spool_compression maps none->uncompressed, snappy->lz4.
    spool_format: str = "ipc"
    # MergeApply execution mode.  "tasks" (default): one stateless task per
    # partition group — MergeApply's per-call state is the on-disk partition
    # (read inside the call), so actors buy nothing and a 30-actor pool
    # costs ~10 s of spin-up per cold session.  "actors": a fixed actor
    # pool (merge_concurrency workers) — the right shape once per-actor
    # state is worth caching (hot watermark maps, remote index clients).
    merge_mode: str = "tasks"
    # actor pool size for merge_mode="actors"; None = CPUs-2 capped by
    # partition count.
    merge_concurrency: "int | None" = None
    # tombstone GC: during a flush, tombstones whose `_lsn` is at or below
    # (partition watermark - retention) are dropped from the state — safe
    # once no event older than the retention window can still arrive (the
    # source's max replay lag).  None = keep all tombstones (bounded by
    # deleted-key count).
    tombstone_retention_lsn: "int | None" = None
    # Merge strategy per run.  "refold" (default): read the partition's
    # full state, decompose it to pseudo-events and fold with the run's
    # events — one converged state file per partition, cost O(state) per
    # run.  "delta" (LSM-style): fold ONLY the run's events into a sorted
    # delta-run file written NEXT TO the base state — cost O(delta) per
    # run, regardless of state size; readers and compact() fold
    # base+deltas on demand (the LSN-register fold is associative, so any
    # grouping converges identically — the same invariant incremental
    # refold already relies on).  Right for steady small-delta ingest
    # over huge state; call compact() periodically to fold runs back into
    # the base and cap read amplification.  Lineage rows in delta mode
    # report DELTA-scoped counts (rows_live/checksum of the run file, not
    # the converged table).
    merge_strategy: str = "refold"
    # delta mode only: when a partition's delta-run count would reach this
    # many files, the merge task folds base+runs into a fresh base INLINE
    # (classic LSM auto-compaction) — read amplification is bounded by
    # (delta_compact_runs - 1) run files per partition, and the O(state)
    # fold cost is amortized to 1/threshold of runs.  None = never
    # auto-compact (call compact() explicitly).
    delta_compact_runs: "int | None" = None
    # Mid-run progress: log the aggregated per-partition lineage counters
    # every N seconds during the merge phase (the reference prints its
    # counter tree every 10 s — AbstractScheduler.java:78-87,
    # CommunicationTool.java:16-111).  0 disables; runs shorter than the
    # interval emit nothing.
    progress_interval_s: float = 10.0
    # Ray Data shuffle strategy override for the partition groupby.
    # Measured (1.9M events / 774 MB, 32 CPUs): sort-based pull shuffle 9s
    # vs HASH_SHUFFLE 26s — the hash-shuffle aggregator parallelism loses
    # at this block count, so None (session default, sort-based) is right;
    # the knob stays for larger topologies.
    shuffle_strategy: "str | None" = None

    # --- derived paths ---
    def state_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, "state", f"part={part:05d}")

    def state_path(self, part: int) -> str:
        return os.path.join(self.state_dir(part), "state.parquet")

    def lineage_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, "lineage", f"part={part:05d}")

    def dirty_dir(self, run_id: str) -> str:
        return os.path.join(self.out_dir, "dirty", run_id)
