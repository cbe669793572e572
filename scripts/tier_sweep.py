"""Partition-count sensitivity sweep at a given fixture tier.

Round-3 verdict ask: the 24/96/384 sweep existed only at sf0.1-scale
(5.9M events); re-run it at the 3M-conversation tier (48.9M events)
where spool fragments = write-tasks x partitions actually bites.

Usage: python scripts/tier_sweep.py /tmp/graft_tier3m/t3m [24 96 384]
Prints one JSON line per partition count (2 trials, lower median).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    fx_dir = sys.argv[1]
    parts_list = [int(x) for x in (sys.argv[2:] or ["24", "96", "384"])]
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc

    log_dir = os.path.join(fx_dir, "cdc_log")
    files = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))]
    for p in files:  # warm page cache
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    out_root = "/dev/shm/graft_tier_sweep"
    for parts in parts_list:
        walls, events = [], 0
        for _ in range(2):
            out = f"{out_root}/p{parts}"
            shutil.rmtree(out, ignore_errors=True)
            cfg = CdcConfig(out_dir=out, num_partitions=parts, spool_compression="none")
            t0 = time.monotonic()
            s = apply_cdc(files, cfg)
            walls.append(time.monotonic() - t0)
            events = s["events_in"]
        wall = sorted(walls)[0 if len(walls) < 2 else (len(walls) - 1) // 2]
        print(json.dumps({
            "num_partitions": parts, "wall_sec": round(wall, 2),
            "events": events, "events_per_sec": round(events / wall, 1),
            "trials": len(walls),
        }), flush=True)
        shutil.rmtree(out_root, ignore_errors=True)
    ray.shutdown()

if __name__ == "__main__":
    main()
