"""Maintained-view amortization bench: for each persistent view kind,
after a small incremental run lands on the source table, time
`sync_view` (fold only the change feed since the cursor) against a full
re-bootstrap (recompute the view over the whole converged table) — both
ending in a committed snapshot, so the comparison is like-for-like.

Usage: python scripts/view_bench.py  [env: GRAFT_VIEW_CONVS=360000,
RAY_GRAFT_CPUS=32, GRAFT_BENCH_PARTITIONS=96,
GRAFT_BENCH_OUT=/dev/shm/graft_view_bench]
Prints one JSON line; record results in BASELINE.md.
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
    from tg_data_connector_ray.cdc.pipeline import apply_cdc
    from tg_data_connector_ray.cdc.views import (
        VIEW_KINDS,
        bootstrap_view,
        sync_view,
    )
    from tg_data_connector_ray.fixtures import FixtureSpec, write_fixture

    convs = int(os.environ.get("GRAFT_VIEW_CONVS", "360000"))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    parts = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "96"))
    root = os.environ.get("GRAFT_BENCH_OUT", "/dev/shm/graft_view_bench")
    cache = os.environ.get(
        "GRAFT_FIXTURE_CACHE", f"/tmp/graft_fixture_cache_v{__version__}"
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    fx = write_fixture(cache, f"bench{convs}", FixtureSpec(n_convs=convs, n_files=64))
    log = fx["cdc_log"]
    files = sorted(
        os.path.join(log, f) for f in os.listdir(log) if f.endswith(".parquet")
    )
    boot, tail, tail2 = files[:-4], files[-4:-2], files[-2:]
    for p in files:  # page-cache warm
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass

    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    cfg = CdcConfig(out_dir=src, num_partitions=parts, merge_strategy="delta")
    s1 = apply_cdc(boot, cfg, run_id="boot")
    results: dict = {
        "metric": "view_sync_bench", "unit": "sec", "convs": convs,
        "num_cpus": cpus, "num_partitions": parts,
        "boot_events": s1["events_in"],
    }

    views = {}
    for kind in VIEW_KINDS:
        t0 = time.monotonic()
        bootstrap_view(os.path.join(root, f"v_{kind}"), kind, cfg)
        views[kind] = {"bootstrap_sec": round(time.monotonic() - t0, 3)}

    s2 = apply_cdc(tail, cfg, run_id="tail")
    results["tail_events"] = s2["events_in"]

    for kind in VIEW_KINDS:
        t0 = time.monotonic()
        sync_view(os.path.join(root, f"v_{kind}"), cfg)
        views[kind]["sync_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        bootstrap_view(os.path.join(root, f"vfull_{kind}"), kind, cfg)
        views[kind]["rebootstrap_sec"] = round(time.monotonic() - t0, 3)
        views[kind]["speedup"] = round(
            views[kind]["rebootstrap_sec"] / max(views[kind]["sync_sec"], 1e-9), 2
        )
    results["views"] = views

    # batched mode: one more tail run, then sync ALL views off ONE
    # derived+pinned feed (sync_views) vs re-bootstrapping all of them
    from tg_data_connector_ray.cdc.views import sync_views

    s3 = apply_cdc(tail2, cfg, run_id="tail2")
    results["tail2_events"] = s3["events_in"]
    dirs = [os.path.join(root, f"v_{k}") for k in VIEW_KINDS]
    t0 = time.monotonic()
    sync_views(dirs, cfg)
    t_all = time.monotonic() - t0
    t0 = time.monotonic()
    for kind in VIEW_KINDS:
        bootstrap_view(os.path.join(root, f"vfull2_{kind}"), kind, cfg)
    t_reboot_all = time.monotonic() - t0
    results["batched"] = {
        "sync_all_sec": round(t_all, 3),
        "rebootstrap_all_sec": round(t_reboot_all, 3),
        "speedup": round(t_reboot_all / max(t_all, 1e-9), 2),
    }

    # narrow-delta leg: a 10-conversation run — the change feed's
    # partition pruning folds only the touched partitions, so the sync
    # cost decouples from the table's partition count
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tg_data_connector_ray.cdc.pipeline import (
        _partition_state_dirs,
        _window_touched_dirs,
        time_travel_runs,
    )

    touched_convs = [f"conv{i:08d}" for i in range(10)]
    n = len(touched_convs)
    narrow = pa.table(
        {
            "lsn": pa.array(range(10**12, 10**12 + n), pa.int64()),
            "op": pa.array(["U"] * n, pa.string()),
            "conv_id": pa.array(touched_convs, pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array([None] * n, pa.string()),
            "text": pa.array(["narrow-update"] * n, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([None] * n, pa.timestamp("us")),
        }
    )
    nfile = os.path.join(root, "narrow.parquet")
    pq.write_table(narrow, nfile)
    apply_cdc([nfile], cfg, run_id="tail3")
    ra = time_travel_runs(cfg, "tail2")
    rb = time_travel_runs(cfg, "tail3")
    t0 = time.monotonic()
    sync_views(dirs, cfg)
    t_narrow = time.monotonic() - t0
    results["narrow"] = {
        "delta_convs": n,
        "touched_partitions": len(_window_touched_dirs(cfg, ra, rb)),
        "total_partitions": len(_partition_state_dirs(cfg)),
        "sync_all_sec": round(t_narrow, 3),
    }
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
