"""CDC job configuration.

The analogue of the reference's job-JSON `Configuration` tree
(common/.../util/Configuration.java) — but typed, flat, and small.  Also
carries the error-limit semantics of ErrorRecordChecker.java:25-81
(record-count limit takes priority over percentage).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


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
    # actor pool size for the MergeApply stage; None = one task per group.
    merge_concurrency: "int | None" = None

    # --- derived paths ---
    def state_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, "state", f"part={part:05d}")

    def state_path(self, part: int) -> str:
        return os.path.join(self.state_dir(part), "state.parquet")

    def table_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, "table", f"part={part:05d}")

    def table_path(self, part: int) -> str:
        return os.path.join(self.table_dir(part), "data.parquet")

    def lineage_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, "lineage", f"part={part:05d}")

    def dirty_dir(self, run_id: str) -> str:
        return os.path.join(self.out_dir, "dirty", run_id)
