"""Similarity search over an embedding column (`list<float>`).

- ``brute_force_topk``: the exactness baseline — per-batch numpy matmul of
  the (broadcast, ray.put once) query matrix against each embedding batch,
  emitting per-batch top-k partials; a tiny driver-side reduce merges the
  partials.  Shuffle volume: O(n_blocks * n_queries * k), never the vectors.
- ``IvfIndex``: the scale path — k-means coarse quantizer trained on a
  sample, vectors partitioned by nearest centroid; queries probe only
  `nprobe` partitions.  Recall/latency knob documented; brute force remains
  the correctness oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


class TopKScorer:
    """Actor stage: queries normalized ONCE per actor.  The query matrix is
    passed by value in the constructor kwargs (it is q x dim floats — tiny
    next to the data), so actor restarts never depend on a borrowed
    object-store ref (ray issue #53727)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = emb @ self.q.T  # (n, q)
        k = min(self.k, len(ids))
        qn, out_q, out_id, out_sim = self.q.shape[0], [], [], []
        for qi in range(qn):
            # deterministic per-batch selection: (sim desc, vec_id asc), so
            # duplicate embeddings tied at the k-th boundary keep the lower
            # vec_id — same order the driver reduce and the oracle apply
            rows = np.lexsort((ids, -sims[:, qi]))[:k]
            out_q.extend([qi] * len(rows))
            out_id.extend(ids[rows].tolist())
            out_sim.extend(sims[rows, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10) -> pa.Table:
    """Exact cosine top-k for each query row; returns (query_id, vec_id,
    sim) sorted by (query_id, -sim, vec_id)."""
    # pre-built instance -> plain tasks: the normalized query matrix
    # (q x dim floats) pickles into the task closure once, so there is no
    # actor spin-up and tasks scale elastically with blocks (the closure
    # is object-store-cached — broadcast, not re-shipped per batch)
    partials = ds.map_batches(
        TopKScorer(queries_ref=np.asarray(queries, dtype=np.float64), k=k),
        batch_format="pyarrow",
    )
    # driver-side final reduce over n_blocks*k*q partial rows (tiny)
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


class IvfIndex:
    """IVF (inverted-file) index: k-means centroids on a driver-side sample,
    assignment as a vectorized map_batches, probed search.

    At 100 TB the assignment pass streams; only centroid ids shuffle.  The
    index itself persists as a partitioned dataset (`centroid` column) that
    `write_parquet(partition_cols=["centroid"])` lays out for pruned reads.
    """

    def __init__(self, n_centroids: int = 16, iters: int = 10, seed: int = 3):
        self.n_centroids = n_centroids
        self.iters = iters
        self.seed = seed
        self.centroids: "np.ndarray | None" = None

    def fit(self, ds, sample_limit: int = 20_000) -> "IvfIndex":
        sample = ds.limit(sample_limit).to_pandas()
        x = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(self.seed)
        c = x[rng.choice(len(x), size=min(self.n_centroids, len(x)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                m = assign == j
                if m.any():
                    c[j] = x[m].mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def assign(self, ds):
        """Adds a `centroid` column (nearest-centroid id) to the dataset."""
        c = self.centroids  # small (n_centroids x dim): ships with the fn

        def _assign(batch: pa.Table) -> pa.Table:
            emb = _normalize(_emb_matrix(batch))
            a = np.argmax(emb @ c.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(a))

        return ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)

    def search(self, assigned_ds, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
        """Probe the nprobe nearest centroid partitions per query."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        probe_set = sorted({int(c) for row in probes for c in row})
        import pyarrow.compute as pc

        def _probe_filter(b: pa.Table) -> pa.Table:
            cen = b["centroid"]
            if not pa.types.is_integer(cen.type):
                # hive-partitioned reads surface the partition column as
                # string ("centroid=3" directories) — normalize back
                cen = pc.cast(cen, pa.int32())
            return b.filter(pc.is_in(cen, value_set=pa.array(probe_set, pa.int32())))

        sub = assigned_ds.map_batches(
            _probe_filter, batch_format="pyarrow", zero_copy_batch=True
        )
        return brute_force_topk(sub, q, k)
