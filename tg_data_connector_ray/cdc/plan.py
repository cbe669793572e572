"""Capacity planning: the documented sizing rules as an executable verb.

The reference connector computes its channel/task split from config
numbers (core/.../JobAssignUtil.java splits channel counts across task
groups); this engine's analogue knob is `num_partitions`, and its sizing
rules live in prose (docs/SCALE.md: state 0.5-2 GB per partition;
BASELINE.md tier sweep: 24 partitions catastrophic, 96 right, 384 ~2x
overhead at the 19 GB / 32-CPU tier).  `plan_ingest` turns those rules
into numbers an operator can pass straight to `cdc --partitions` /
`migrate --to-partitions`, and `plan_from_paths` derives the inputs from
a log directory + existing table dir (footer-only metadata + file
stats — never reads table data).

All pure arithmetic on the driver; deterministic and unit-tested.
"""

from __future__ import annotations

import os

MiB = 1 << 20
GiB = 1 << 30

# measured sweet spot: 2.3 GB run / 96 partitions (BASELINE.md tier
# sweep) -> ~24 MiB of incoming run volume per partition-merge task
RUN_BYTES_PER_PARTITION = 24 * MiB
# docs/SCALE.md: keep per-partition converged state in the 0.5-2 GiB band
STATE_BYTES_LO = 512 * MiB
STATE_BYTES_HI = 2 * GiB
# read side: one block per ~64 MiB of log, never fewer than the CPUs
READ_BLOCK_BYTES = 64 * MiB
# beyond ~16 merge waves per CPU the per-partition overhead dominates
# (measured ~2x at 384 parts / 32 CPUs on a 19 GB run)
MAX_WAVES = 16


def _round_up_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def plan_ingest(
    log_bytes: int,
    *,
    cpus: int,
    events: "int | None" = None,
    existing_partitions: "int | None" = None,
    state_bytes: "int | None" = None,
) -> dict:
    """Recommend run knobs for a log batch of `log_bytes` on `cpus`
    cores, plus (when an existing table's partition count and total
    state bytes are given) a repartition recommendation against the
    0.5-2 GiB state band.  Returns a dict of recommendations + plain-
    English warnings; raises on nonsensical inputs."""
    if log_bytes < 0 or cpus <= 0:
        raise ValueError(f"log_bytes={log_bytes} and cpus={cpus} must be positive")

    read_blocks = max(cpus, -(-log_bytes // READ_BLOCK_BYTES))
    raw = max(2 * cpus, -(-log_bytes // RUN_BYTES_PER_PARTITION))
    partitions = _round_up_multiple(raw, cpus)
    warnings = []
    if partitions > MAX_WAVES * cpus:
        partitions = MAX_WAVES * cpus
        warnings.append(
            f"run volume would want >{MAX_WAVES} merge waves per CPU; "
            f"capped at {partitions} — split the ingest into smaller runs "
            "(the bounded-run model) instead of adding partitions"
        )

    out = {
        "log_bytes": log_bytes,
        "cpus": cpus,
        "events": events,
        "recommended": {
            "num_partitions": partitions,
            "override_num_blocks": read_blocks,
            "merge_waves": -(-partitions // cpus),
            "run_bytes_per_partition": log_bytes // partitions if partitions else 0,
        },
        "warnings": warnings,
    }

    if existing_partitions and state_bytes is not None:
        avg = state_bytes // existing_partitions
        state = {
            "partitions": existing_partitions,
            "state_bytes": state_bytes,
            "avg_state_bytes": avg,
            "band": [STATE_BYTES_LO, STATE_BYTES_HI],
        }
        if avg > STATE_BYTES_HI:
            grow = existing_partitions
            while state_bytes // grow > STATE_BYTES_HI:
                grow *= 2
            state["recommend_migrate_to"] = grow
            warnings.append(
                f"avg partition state {avg / GiB:.2f} GiB exceeds the 2 GiB "
                f"band — `migrate --to-partitions {grow}` before it hits "
                "single-task memory"
            )
        elif (
            avg < STATE_BYTES_LO // 4
            and existing_partitions > 2 * cpus
            and state_bytes > 0
        ):
            shrink = existing_partitions
            while (
                shrink > 2 * cpus
                and shrink % 2 == 0
                and state_bytes // (shrink // 2) <= STATE_BYTES_HI
            ):
                shrink //= 2
            if shrink < existing_partitions:
                state["recommend_migrate_to"] = shrink
                warnings.append(
                    f"avg partition state {avg / MiB:.0f} MiB is far below "
                    f"the band with {existing_partitions} partitions — "
                    f"per-partition overhead dominates; consider "
                    f"`migrate --to-partitions {shrink}`"
                )
        out["state"] = state
    return out


def plan_from_paths(
    log_dir: str,
    out_dir: "str | None" = None,
    cpus: "int | None" = None,
    sample_footers: int = 64,
) -> dict:
    """Derive `plan_ingest` inputs from a log directory (file sizes +
    up to `sample_footers` parquet footers, row count extrapolated by
    byte ratio beyond that) and, optionally, an existing table dir
    (partition count + state bytes via `lineage_summary` — metadata
    only).  `cpus` defaults to this node's count; on a cluster pass the
    fleet's total."""
    import pyarrow.parquet as pq

    from ..util import list_files

    files = sorted(list_files(log_dir, suffix=".parquet"))
    if not files:
        raise ValueError(f"no .parquet files under {log_dir}")
    sizes = [os.path.getsize(f) for f in files]
    total = sum(sizes)
    sampled = files[:sample_footers]
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in sampled)
    sampled_bytes = sum(sizes[: len(sampled)])
    events = (
        rows if len(sampled) == len(files)
        else int(rows * (total / max(1, sampled_bytes)))
    )

    if cpus is None:
        cpus = os.cpu_count() or 1
    kw = {}
    if out_dir:
        from .config import CdcConfig
        from .pipeline import lineage_summary

        lin = lineage_summary(CdcConfig(out_dir=out_dir))
        if lin["partitions"]:
            kw = {
                "existing_partitions": lin["partitions"],
                "state_bytes": lin["state_bytes"] + lin["delta_bytes"],
            }
    plan = plan_ingest(total, cpus=cpus, events=events, **kw)
    plan["log_dir"] = log_dir
    plan["n_files"] = len(files)
    plan["events_estimated"] = len(sampled) < len(files)
    return plan
