"""Envelope-ingestion throughput bench: Debezium-shaped JSON change
stream -> flatten -> staged Parquet -> exactly-once merge, at the
headline fixture tier (~5.9M events / 64 shards).

The JSON parse is the classic CDC-ingest bottleneck; here it is
pyarrow.json C++ (one read task per shard) with the vectorized
struct-field flatten behind it, so the leg to watch is stage_sec
(read+flatten+parquet write) vs the Parquet-native replay of the SAME
events (apply_sec vs bench.py's headline).

Usage: python scripts/envelope_bench.py   [env: GRAFT_ENV_CONVS=360000,
RAY_GRAFT_CPUS=32, GRAFT_BENCH_OUT=/dev/shm/graft_env_bench]
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
    from tg_data_connector_ray.fixtures import (
        FixtureSpec,
        write_envelope_log,
        write_fixture,
    )
    from tg_data_connector_ray.sources.envelope import stage_envelope_events

    convs = int(os.environ.get("GRAFT_ENV_CONVS", "360000"))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    parts = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "96"))
    root = os.environ.get("GRAFT_BENCH_OUT", "/dev/shm/graft_env_bench")
    cache = os.environ.get(
        "GRAFT_FIXTURE_CACHE", f"/tmp/graft_fixture_cache_v{__version__}"
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    tier = f"bench{convs}"
    spec = FixtureSpec(n_convs=convs, n_files=64)
    write_fixture(cache, tier, spec)
    t0 = time.monotonic()
    env_dir = write_envelope_log(cache, tier, spec)
    t_render = time.monotonic() - t0  # ~0 when cached

    jsonl = sorted(
        os.path.join(env_dir, f) for f in os.listdir(env_dir) if f.endswith(".jsonl")
    )
    env_bytes = sum(os.path.getsize(f) for f in jsonl)
    for f in jsonl:  # page-cache warm: measure the engine, not cold disk
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    shutil.rmtree(root, ignore_errors=True)
    stage_dir = os.path.join(root, "stage")
    t0 = time.monotonic()
    shards = stage_envelope_events(jsonl, stage_dir)
    t_stage = time.monotonic() - t0

    import pyarrow.parquet as pq

    n_events = sum(pq.read_metadata(s).num_rows for s in shards)

    cfg = CdcConfig(out_dir=os.path.join(root, "table"), num_partitions=parts)
    t0 = time.monotonic()
    summary = apply_cdc(shards, cfg)
    t_apply = time.monotonic() - t0

    print(json.dumps({
        "metric": "envelope_ingest_bench", "unit": "sec",
        "convs": convs, "num_cpus": cpus, "num_partitions": parts,
        "envelope_bytes": env_bytes, "events": n_events,
        "render_sec": round(t_render, 3),
        "stage_sec": round(t_stage, 3),
        "stage_mb_per_sec": round(env_bytes / t_stage / 1e6, 1),
        "stage_events_per_sec": round(n_events / t_stage, 0),
        "apply_sec": round(t_apply, 3),
        "end_to_end_events_per_sec": round(n_events / (t_stage + t_apply), 0),
        "rows_live": summary["rows_live"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
