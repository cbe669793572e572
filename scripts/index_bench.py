"""O(delta) evidence for the persistent ANN index (ops/similarity.PersistentIvf):

per index size N, measure (a) bootstrap append of N vectors — expected
O(N); (b) a FIXED-size delta append; (c) a fixed-size upsert
(tombstone + re-append); (d) an nprobe-pruned search — (b)-(d) expected
~flat in N, because append touches only the delta's files, tombstones are
a driver-side parquet, and search opens only probed centroid dirs of
committed runs.

Usage: python scripts/index_bench.py [sizes ...]   (default 100k 400k 1.6M)
Prints one JSON line per size; record the table in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray

DIM = 64
DELTA = 10_000
CENTROIDS = 64


def _vec_block(ids: np.ndarray) -> pa.Table:
    """Deterministic pseudo-embeddings: per (id, j) splitmix64 sign bits —
    reproducible across runs/partitionings, no RNG state."""
    from tg_data_connector_ray.ops.dedup import _mix64

    n = len(ids)
    grid = (
        ids.astype(np.uint64)[:, None] * np.uint64(DIM)
        + np.arange(DIM, dtype=np.uint64)[None, :]
    )
    bits = (_mix64(grid.reshape(-1)) >> np.uint64(63)).astype(np.float64)
    emb = (bits * 2.0 - 1.0).reshape(n, DIM)
    return pa.table(
        {
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), DIM
            ),
        }
    )


def _vecs(n: int, start: int = 0):
    return ray.data.range(n).map_batches(
        lambda b: _vec_block(b["id"].to_numpy() + start),
        batch_format="pyarrow",
    )


def bench_size(n: int, scratch: str) -> dict:
    from tg_data_connector_ray.ops.similarity import PersistentIvf

    d = os.path.join(scratch, f"ivf-{n}")
    shutil.rmtree(d, ignore_errors=True)

    t0 = time.time()
    idx = PersistentIvf.build(d, _vecs(n), n_centroids=CENTROIDS, iters=4, n_rows=n)
    idx.append(_vecs(n), run_id="base")
    boot = time.time() - t0

    t0 = time.time()
    idx.append(_vecs(DELTA, start=n), run_id="delta")
    append_s = time.time() - t0

    victims = list(range(0, DELTA))
    t0 = time.time()
    idx.delete(victims, run_id="up.del")
    idx.append(_vecs(DELTA, start=n + DELTA), run_id="up.add")
    upsert_s = time.time() - t0

    q = _vec_block(np.arange(8, dtype=np.uint64) + np.uint64(7_000_000))
    qm = np.stack(
        [np.asarray(v, np.float64) for v in q["embedding"].to_pylist()]
    )
    t0 = time.time()
    idx.search(qm, k=10, nprobe=4)
    search_s = time.time() - t0

    return {
        "n": n,
        "bootstrap_sec": round(boot, 3),
        "delta_append_sec": round(append_s, 3),
        "upsert_sec": round(upsert_s, 3),
        "search_sec": round(search_s, 3),
        "delta": DELTA,
    }


def main():
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    scratch = os.path.join(tempfile.gettempdir(), "graft_index_bench")
    os.makedirs(scratch, exist_ok=True)
    try:
        for n in sizes:
            print(json.dumps(bench_size(n, scratch)), flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
