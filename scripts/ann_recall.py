"""IVF recall/cost curve: recall@k of the probed IVF search vs exact
brute force as nprobe sweeps 1..n_centroids, on the sf0.1 embeddings
with a held-out query set.  The number to watch is where the curve
saturates — that nprobe is the latency/recall operating point, and the
fraction nprobe/n_centroids is the share of the index actually read
(the pruning win at 100 TB: partitions not probed are parquet files
never opened).

Usage: python scripts/ann_recall.py   [env: GRAFT_SF_DIR, RAY_GRAFT_CPUS,
GRAFT_ANN_QUERIES=32, GRAFT_ANN_K=10, GRAFT_ANN_CENTROIDS=32]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import ray


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_q = int(os.environ.get("GRAFT_ANN_QUERIES", "32"))
    k = int(os.environ.get("GRAFT_ANN_K", "10"))
    n_c = int(os.environ.get("GRAFT_ANN_CENTROIDS", "32"))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from tg_data_connector_ray.ops.similarity import IvfIndex, brute_force_topk
    from tg_data_connector_ray.util import sized_read_parquet

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["embedding"]).slice(0, n_q)
    queries = np.stack(
        [np.asarray(v, dtype=np.float64) for v in head["embedding"].to_pylist()]
    )
    n_vecs = pq.read_metadata(path).num_rows

    embs = sized_read_parquet(path)
    t0 = time.monotonic()
    truth_t = brute_force_topk(embs, queries, k=k)
    brute_s = time.monotonic() - t0
    truth = {}
    for r in truth_t.to_pylist():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    t0 = time.monotonic()
    idx = IvfIndex(n_centroids=n_c, iters=8).fit(sized_read_parquet(path))
    assigned = idx.assign(sized_read_parquet(path)).materialize()
    build_s = time.monotonic() - t0

    curve = []
    for nprobe in sorted({1, 2, 4, 8, n_c // 2, n_c}):
        t0 = time.monotonic()
        got_t = idx.search(assigned, queries, k=k, nprobe=nprobe)
        s = time.monotonic() - t0
        got = {}
        for r in got_t.to_pylist():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        curve.append({
            "nprobe": int(nprobe),
            "recall_at_k": round(hits / (len(truth) * k), 4),
            "search_sec": round(s, 3),
            "index_frac_read": round(nprobe / n_c, 3),
        })

    print(json.dumps({
        "metric": "ivf_recall_curve", "sf": sf_dir, "num_cpus": cpus,
        "n_vectors": n_vecs, "n_queries": n_q, "k": k, "n_centroids": n_c,
        "brute_force_sec": round(brute_s, 3), "index_build_sec": round(build_s, 3),
        "curve": curve,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
