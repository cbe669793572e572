"""Per-operator wall/CPU audit for queries() pipelines.

Runs the named queries (default: a representative mix) over a scale dir
and prints each Ray Data operator's wall time and task breakdown from
``ds.stats()`` — the feedback loop for 'wall-time dominated by useful
compute, not orchestration'.

Usage: python scripts/stats_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["q1_pricing_summary", "dedup_minhash", "text_tfidf", "docs_pack_sequences"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    qs = E.queries()
    for name in names:
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        is_ds = type(res).__module__.startswith("ray.data")
        if is_ds:
            res = res.materialize()
        wall = time.monotonic() - t0
        print(f"\n=== {name}: {wall:.2f}s total ===")
        if not is_ds:
            print("  (driver-side result — composite pipeline; rerun inner stages for detail)")
            continue
        stats = res.stats()
        # compact per-operator lines: name, blocks-produced wall, tasks,
        # total remote wall and UDF time (useful-compute share)
        for block in re.split(r"\n(?=Operator )", stats):
            m = re.match(
                r"Operator (\d+) (.+?): (?:(\d+) tasks executed, \d+ blocks "
                r"produced in ([\d.]+)s|executed in ([\d.]+)s)",
                block,
            )
            if not m:
                continue
            wall_s = m.group(4) or m.group(5) or "?"
            rw = re.search(r"Remote wall time: .*?, ([\d.]+)(us|ms|s) total", block)
            udf = re.search(r"UDF time: .*?, ([\d.]+)(us|ms|s) total", block)

            def to_s(g):
                if not g:
                    return None
                v = float(g.group(1))
                return v / 1e6 if g.group(2) == "us" else v / 1e3 if g.group(2) == "ms" else v

            rws, udfs = to_s(rw), to_s(udf)
            extra = ""
            if rws is not None:
                extra = f"  remote={rws:.3f}s"
                if udfs is not None:
                    extra += f" udf={udfs:.3f}s"
            print(
                f"  op{m.group(1)} {m.group(2)[:58]:58s} wall={wall_s:>6}s"
                f"  tasks={m.group(3) or '-':>4}{extra}"
            )
    ray.shutdown()


if __name__ == "__main__":
    main()
