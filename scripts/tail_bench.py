"""Streaming-tail throughput bench: the headline fixture's 64 shards
arrive as G micro-batches in a watched directory; `tail_log` applies
each batch exactly-once in LSM delta mode (auto-compacting), and the
number to watch is end-to-end events/s across the whole tail session
vs the one-shot refold of the same log (bench.py's headline).

The gap between them is the price of micro-batching: per-run fixed
orchestration (read + normalize + spool + merge dispatch per batch)
amortized over batch size.  At real binlog rates the batch size is a
latency/throughput knob; this prints both so BASELINE.md can record the
curve.

Usage: python scripts/tail_bench.py   [env: GRAFT_TAIL_CONVS=360000,
GRAFT_TAIL_BATCHES=8, RAY_GRAFT_CPUS=32, GRAFT_BENCH_OUT=/dev/shm/graft_tail_bench]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    from tg_data_connector_ray import __version__
    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, tail_log
    from tg_data_connector_ray.fixtures import FixtureSpec, write_fixture

    convs = int(os.environ.get("GRAFT_TAIL_CONVS", "360000"))
    n_batches = int(os.environ.get("GRAFT_TAIL_BATCHES", "8"))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    parts = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "96"))
    root = os.environ.get("GRAFT_BENCH_OUT", "/dev/shm/graft_tail_bench")
    cache = os.environ.get(
        "GRAFT_FIXTURE_CACHE", f"/tmp/graft_fixture_cache_v{__version__}"
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    tier = f"bench{convs}"
    fx = write_fixture(cache, tier, FixtureSpec(n_convs=convs, n_files=64))
    shards = sorted(
        os.path.join(fx["cdc_log"], f)
        for f in os.listdir(fx["cdc_log"])
        if f.endswith(".parquet")
    )
    import pyarrow.parquet as pq

    n_events = sum(pq.read_metadata(s).num_rows for s in shards)

    shutil.rmtree(root, ignore_errors=True)
    watch = os.path.join(root, "watch")
    os.makedirs(watch)

    # shard groups land between polls: symlinks appear atomically
    groups = [shards[i::n_batches] for i in range(n_batches)]
    gi = iter(groups)

    def drop_next(_summary=None) -> None:
        batch = next(gi, None)
        if batch:
            for f in batch:
                os.symlink(f, os.path.join(watch, os.path.basename(f)))

    drop_next()
    cfg = CdcConfig(
        out_dir=os.path.join(root, "table"),
        num_partitions=parts,
        merge_strategy="delta",
        delta_compact_runs=max(4, n_batches // 2),
    )
    t0 = time.monotonic()
    totals = tail_log(
        watch, cfg, poll_interval=0.05, idle_polls=10, on_batch=drop_next
    )
    tail_sec = time.monotonic() - t0
    assert totals["events_in"] == n_events, (totals, n_events)

    one_cfg = CdcConfig(out_dir=os.path.join(root, "oneshot"), num_partitions=parts)
    t0 = time.monotonic()
    one_summary = apply_cdc(fx["cdc_log"], one_cfg)
    one_sec = time.monotonic() - t0

    print(json.dumps({
        "metric": "tail_ingest_bench", "unit": "sec",
        "convs": convs, "num_cpus": cpus, "num_partitions": parts,
        "events": n_events, "batches": totals["batches"],
        "tail_sec": round(tail_sec, 3),
        "tail_events_per_sec": round(n_events / tail_sec, 0),
        "oneshot_sec": round(one_sec, 3),
        "oneshot_events_per_sec": round(n_events / one_sec, 0),
        "micro_batch_overhead_x": round(tail_sec / one_sec, 2),
        # delta-mode per-run summaries report the RUN's fold, not the
        # table total — the one-shot refold is the authoritative count
        "rows_live": one_summary["rows_live"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
