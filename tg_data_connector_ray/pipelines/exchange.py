"""Generic spooled key exchange for whole-partition operators.

`spooled_grouped_map(ds, kernel, part_fn, n_parts)` hash-partitions a
Dataset, co-locates each partition on disk, and maps `kernel` over whole
partitions — the same exchange shape the CDC merge uses
(`cdc/pipeline._run_exchange_and_merge`), generalized for read-side
operators (SCD2 history, SFT pairs, conversation rendering, any
partition-and-window kernel).

Why not `groupby(...).map_groups(...)`: Ray's sort-based shuffle moves
every payload byte through the object store twice and sorts it.  Measured
on this box (5.9M transcript events, ~1.7 GB, 32 CPUs): the groupby
exchange alone costs ~12-15 s; the spool exchange (ONE parallel
hive-partitioned Parquet write + ONE parallel read) ~4-6 s end-to-end.
The CDC pipeline measured the same gap at the 1.9M tier (4.8 s vs
21-41 s, pipeline.py:214).  On a multi-node cluster the spool lives on
shared storage, doubles as a resume point, and its write fan-out never
holds more than one block per task in memory.

Exactly-once: phase A goes through `Dataset.write_parquet`, whose
filenames are deterministic per (write uuid, task index, block index) —
a retried write task overwrites its own files instead of duplicating
rows (the IPC spool in the CDC path tolerates duplicates only because
the merge fold dedups redeliveries; generic kernels can't, so parquet's
idempotent naming is the contract here).

The spool is reclaimed when the returned Dataset is garbage-collected
(weakref lease, same pattern as util.spool_checkpoint), with interpreter
exit as the backstop.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa

from ..util import _SPOOL_PATHS, new_token


def spooled_grouped_map(
    ds,
    kernel,
    part_fn,
    n_parts: int,
    *,
    name: str = "exch",
    root: "str | None" = None,
    compression: str = "snappy",
):
    """Partition `ds` by `part_fn` and map `kernel` over whole partitions.

    - `part_fn(table) -> integer ndarray` of partition ids in [0, n_parts)
      (every row of one key MUST map to one partition);
    - `kernel(table) -> table` runs once per non-empty partition with all
      of its rows co-located;
    - returns a streaming Dataset of the kernel outputs.

    `n_parts` bounds per-task memory at ~input/n_parts rows; size it to
    ~4x the CPU count (or more on skewed keys).
    """
    import ray
    import weakref

    path = os.path.join(
        root or os.path.join(tempfile.gettempdir(), "graft_spools"),
        f"{name}-{new_token()}",
    )
    os.makedirs(path, exist_ok=True)
    _SPOOL_PATHS.append(path)

    def tag(t: pa.Table) -> pa.Table:
        p = np.asarray(part_fn(t)).astype(np.int32)
        return t.append_column("_part", pa.array(p))

    # phase A: ONE parallel partitioned write (executes the upstream graph)
    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        path, partition_cols=["_part"], compression=compression
    )

    part_dirs = sorted(
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("_part=")
    )

    def run_part(dirs: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for d in dirs["dir"].to_pylist():
            # the fragment files carry payload only (_part is hive-encoded
            # in the directory name and never reaches the kernel)
            outs.append(kernel(pq.read_table(d)))
        return pa.concat_tables(outs, promote_options="default")

    out = ray.data.from_items([{"dir": d} for d in part_dirs]).map_batches(
        run_part, batch_size=1, batch_format="pyarrow"
    )

    lease = _ExchangeLease()

    def _reclaim():
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        try:
            _SPOOL_PATHS.remove(path)
        except ValueError:
            pass

    weakref.finalize(lease, _reclaim)
    out._spool_keepalive = lease  # reclaimed when the Dataset is collected
    return out


def carry_spool_lease(src, out):
    """Propagate a spooled dataset's reclaim lease onto a derived Dataset.

    The lease rides the Dataset OBJECT (`_spool_keepalive`), not the
    lazy plan — so `spooled.map_batches(...)` returns a new object
    WITHOUT it, and once the intermediate is collected the spool dir is
    reclaimed before the derived dataset executes (FileNotFoundError in
    run_part).  Every caller that wraps a spooled dataset in further
    transforms must call this (or keep the source object alive)."""
    if hasattr(src, "_spool_keepalive"):
        out._spool_keepalive = src._spool_keepalive
    return out


class _ExchangeLease:
    """Identity object whose collection triggers spool reclaim."""
