"""Scale-tier evidence for the transcript/history operators: run
scd2_history over the bench-tier CDC log (~5.9M events) and
sft_pairs / render_conversations over its converged table (~3.1M rows),
timing each leg end-to-end (read -> shuffle -> kernel -> consume).

Every leg streams: consumption is a thin count over the output blocks,
no driver materialization of version/pair/document rows.

Usage: python scripts/transcript_bench.py  [env: GRAFT_TR_CONVS=360000,
RAY_GRAFT_CPUS=32, GRAFT_BENCH_OUT=/dev/shm/graft_tr_bench]
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
    from tg_data_connector_ray.cdc.history import scd2_history
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, read_final_table
    from tg_data_connector_ray.fixtures import FixtureSpec, write_fixture
    from tg_data_connector_ray.ops.transcripts import render_conversations, sft_pairs
    from tg_data_connector_ray.util import list_files

    convs = int(os.environ.get("GRAFT_TR_CONVS", "360000"))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    parts = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "96"))
    root = os.environ.get("GRAFT_BENCH_OUT", "/dev/shm/graft_tr_bench")
    cache = os.environ.get(
        "GRAFT_FIXTURE_CACHE", f"/tmp/graft_fixture_cache_v{__version__}"
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # same tier (and fixture cache key) as bench.py / delta_bench.py
    fx = write_fixture(cache, f"bench{convs}", FixtureSpec(n_convs=convs, n_files=64))
    files = sorted(list_files(fx["cdc_log"], suffix=".parquet"))
    for p in files:  # page-cache warm: measure the engine, not cold disk
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass

    n_coarse = 4 * cpus  # keep every CPU busy; ~events/n_coarse rows/task

    results: dict = {"convs": convs, "num_cpus": cpus}

    t0 = time.monotonic()
    hist = scd2_history(ray.data.read_parquet(files), n_coarse=n_coarse)
    results["scd2_versions"] = hist.count()
    results["scd2_sec"] = round(time.monotonic() - t0, 3)
    results["scd2_versions_per_sec"] = round(
        results["scd2_versions"] / results["scd2_sec"]
    )

    out = os.path.join(root, "state")
    shutil.rmtree(out, ignore_errors=True)
    cfg = CdcConfig(out_dir=out, num_partitions=parts)
    t0 = time.monotonic()
    apply_cdc(files, cfg)
    results["replay_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pairs = sft_pairs(read_final_table(cfg), n_coarse=n_coarse)
    results["sft_pairs"] = pairs.count()
    results["sft_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    docs = render_conversations(read_final_table(cfg), n_coarse=n_coarse)
    results["rendered_docs"] = docs.count()
    results["render_sec"] = round(time.monotonic() - t0, 3)

    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
