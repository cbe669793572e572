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


def hash_embed(texts, dim: int = 64) -> np.ndarray:
    """Deterministic sign-snapped feature-hash text embedding — the
    oracle-exact stand-in for a neural encoder (swap in a real model and
    nothing else in the index/sync dataflow changes).

    Per text: tokens via the engine-wide shared tokenizer
    (dedup._split_tokens_arrow, == the SQL oracles'
    ``regexp_extract_all(lower(text), '[a-z0-9_]+')``), token hash h =
    md5-u64 (little-endian first 8 bytes), bucket ``h % dim``, sign ``+1
    if (h // dim) % 2 == 0 else -1``; the signed counts are then snapped
    to {-1.0, +1.0} per bucket (empty/negative-free buckets -> +1).  Sign
    snapping makes every vector's norm exactly sqrt(dim), so cosine order
    == integer-dot order, and with dim a power of two every intermediate
    float is a dyadic rational — search results replay BIT-EXACTLY in
    DuckDB (the `_snapped_embeddings` fixture trick, applied to text).
    Null text embeds as the empty string (zero tokens -> all +1).

    Fully vectorized: one tokenizer pass, md5 once per unique token, one
    bincount; no per-row Python in the hot path."""
    from .dedup import _token_hashes_flat

    h, offs = _token_hashes_flat(texts)
    n = len(offs) - 1
    d = np.uint64(dim)
    bucket = (h % d).astype(np.int64)
    sign = np.where(((h // d) % np.uint64(2)) == 0, 1.0, -1.0)
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    sums = np.bincount(row * dim + bucket, weights=sign, minlength=n * dim)
    return np.where(sums.reshape(n, dim) >= 0, 1.0, -1.0)


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


def _topk_reduce(partials, k: int) -> pa.Table:
    """Shared driver-side final reduce over (query_id, vec_id, sim)
    partials, with the typed-empty guard: an all-empty partials dataset
    (empty/fully-pruned input — Ray emits zero-schema empty blocks, see
    ops/dedup._nonempty) yields a zero-column DataFrame where sort_values
    would KeyError."""
    df = partials.to_pandas()
    if df.empty:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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
    return _topk_reduce(partials, k)


def _fit_sample(ds, limit: int, id_col: str = "vec_id", salt: str = "fit",
                n_rows: "int | None" = None):
    """Deterministic UNBIASED k-means training sample as a DataFrame.

    ``ds.limit(n)`` takes the first blocks only — on a sorted/clustered
    input the codebook would train on a biased slice of the space.  Here
    membership is a pure hash of the id (ops.sampling), so the sample is
    uniform over the whole dataset, reproducible across runs and
    partitionings, and the scan streams (no materialization beyond the
    ~`limit` sampled rows).  Pass `n_rows` when the caller already knows
    the count (parquet metadata) — ds.count() on a mapped pipeline
    executes the whole upstream graph just to size the sample."""
    n = ds.count() if n_rows is None else n_rows
    if n <= limit:
        return ds.to_pandas()
    from .sampling import hash_sample_batch

    frac = min(1.0, 1.05 * limit / n)  # small overshoot; bounds still ~limit
    return ds.map_batches(
        lambda t: hash_sample_batch(t, col=id_col, fraction=frac, salt=salt),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()


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

    def fit(self, ds, sample_limit: int = 20_000, n_rows: "int | None" = None) -> "IvfIndex":
        sample = _fit_sample(ds, sample_limit, n_rows=n_rows)
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


class PqIndex:
    """Product quantization (ADC search): the memory-bound scale path.

    Vectors are L2-normalized, split into `m` subspaces, and each subspace
    is vector-quantized against its own k-means codebook (<=256 codes ->
    one uint8 per subspace).  A 768-dim float32 vector compresses 3072 ->
    `m` bytes, so at 100 TB the code table is small enough to stream
    through map_batches on every node while the raw embeddings stay in
    cold storage.  Search is asymmetric distance computation: per query,
    one (m x n_codes) lookup table of exact subvector inner products; a
    vector's approximate cosine is the sum of `m` LUT gathers — pure numpy
    fancy-indexing per batch, no per-row Python.  Training samples once on
    the driver (same bounded pattern as IvfIndex.fit); codebooks ship in
    the task closure (object-store-cached broadcast).  Composes with
    IvfIndex for IVF-PQ: assign() first, encode the residual partitions.
    """

    def __init__(self, m: int = 8, n_codes: int = 256, iters: int = 12, seed: int = 5):
        if not 1 <= n_codes <= 256:
            raise ValueError(
                f"n_codes must be in [1, 256] (codes are stored as uint8; "
                f"larger would silently wrap), got {n_codes}"
            )
        self.m = m
        self.n_codes = n_codes
        self.iters = iters
        self.seed = seed
        self.codebooks: "np.ndarray | None" = None  # (m, n_codes, dsub)

    def _split(self, x: np.ndarray) -> np.ndarray:
        n, d = x.shape
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m} subspaces")
        return x.reshape(n, self.m, d // self.m)

    def fit(self, ds, sample_limit: int = 20_000, n_rows: "int | None" = None) -> "PqIndex":
        sample = _fit_sample(ds, sample_limit, n_rows=n_rows)
        x = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
        sub = self._split(x)
        rng = np.random.default_rng(self.seed)
        n_codes = min(self.n_codes, len(x))
        books = np.empty((self.m, n_codes, sub.shape[2]), dtype=np.float64)
        for mi in range(self.m):
            xs = sub[:, mi, :]
            # init from UNIQUE subvectors (no duplicate centroids): when a
            # subspace has <= n_codes distinct values, every one becomes
            # its own centroid, Lloyd converges immediately, and coding is
            # LOSSLESS — the property the pq_ann oracle-exact fixture
            # (sign-snapped vectors: two values per 1-d subspace) relies
            # on; on rich data it is simply a better spread than sampling
            # rows with repetition
            uniq = np.unique(xs, axis=0)
            if len(uniq) <= n_codes:
                pad = xs[rng.choice(len(xs), size=n_codes - len(uniq))] if len(uniq) < n_codes else np.empty((0, xs.shape[1]))
                c = np.concatenate([uniq, pad])
            else:
                c = uniq[rng.choice(len(uniq), size=n_codes, replace=False)]
            for _ in range(self.iters):
                # nearest by L2 = max (c.x - |c|^2/2) on the subvectors
                score = xs @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
                assign = np.argmax(score, axis=1)
                for j in range(n_codes):
                    msk = assign == j
                    if msk.any():
                        c[j] = xs[msk].mean(axis=0)
            books[mi] = c
        self.codebooks = books
        return self

    def encode(self, ds):
        """(vec_id, code) Dataset; code = fixed_size_list<uint8>[m]."""
        books = self.codebooks  # (m, n_codes, dsub): ships with the fn
        half_norms = 0.5 * (books * books).sum(axis=2)  # (m, n_codes)
        m = self.m

        def _encode(batch: pa.Table) -> pa.Table:
            # reshape inline (not self._split): capturing self would ship
            # the codebooks TWICE per task closure alongside `books`
            xm = _normalize(_emb_matrix(batch))
            x = xm.reshape(xm.shape[0], m, xm.shape[1] // m)
            codes = np.empty((x.shape[0], m), dtype=np.uint8)
            for mi in range(m):
                score = x[:, mi, :] @ books[mi].T - half_norms[mi][None, :]
                codes[:, mi] = np.argmax(score, axis=1)
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "code": pa.FixedSizeListArray.from_arrays(
                        pa.array(codes.reshape(-1), pa.uint8()), m
                    ),
                }
            )

        return ds.map_batches(_encode, batch_format="pyarrow", zero_copy_batch=True)

    def search(self, encoded_ds, queries: np.ndarray, k: int = 10) -> pa.Table:
        """ADC top-k over the code table: (query_id, vec_id, sim) with sim =
        the PQ-approximate cosine, sorted (query_id, -sim, vec_id)."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        qsub = self._split(q)  # (nq, m, dsub)
        # exact q-subvector x codebook inner products: (nq, m, n_codes)
        luts = np.einsum("qmd,mcd->qmc", qsub, self.codebooks)
        m, nq = self.m, q.shape[0]

        def _score(batch: pa.Table) -> pa.Table:
            col = batch["code"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes = (
                col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), m)
            ).astype(np.int64)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            out_q, out_id, out_sim = [], [], []
            kk = min(k, len(ids))
            for qi in range(nq):
                sims = luts[qi, np.arange(m)[None, :], codes].sum(axis=1)
                rows = np.lexsort((ids, -sims))[:kk]
                out_q.extend([qi] * len(rows))
                out_id.extend(ids[rows].tolist())
                out_sim.extend(sims[rows].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "sim": pa.array(out_sim, pa.float64()),
                }
            )

        partials = encoded_ds.map_batches(_score, batch_format="pyarrow")
        return _topk_reduce(partials, k)


# --- Lloyd's k-means clustering (semantic grouping / dedup-prep) --------

def _u6(x: np.ndarray) -> np.ndarray:
    """Micro-unit integerization (x1e6, round-half-even — np.round ==
    DuckDB round_even; float32 -> float64 is exact first)."""
    return np.round(x.astype(np.float64) * 1e6).astype(np.int64)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB's // semantics;
    numpy's // floors, which differs on negative sums) — pure int64 ops,
    no float round-trip anywhere."""
    q = s // n
    return q + ((s % n != 0) & (s < 0)).astype(np.int64)


def _kmeans_partials(t: pa.Table, cent_u: np.ndarray) -> pa.Table:
    """Per-batch k-means partials against broadcast integer centroids:
    EXACT integer squared distances (no float tie ambiguity — argmin
    ties break to the lowest cluster, matching the oracle's ORDER BY
    d2, cluster), then per-cluster component sums / counts / inertia as
    a long (cluster, dim, s) table.  dim -1 carries counts, dim -2
    assigned-distance sums; k*(d+2) rows per batch regardless of batch
    size — the shuffle-free partial the driver folds."""
    k, d = cent_u.shape
    empty = pa.table(
        {
            "cluster": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    xu = _u6(_emb_matrix(t))
    n = xu.shape[0]
    d2 = np.empty((n, k), np.int64)
    for j in range(k):
        diff = xu - cent_u[j]
        d2[:, j] = np.einsum("nd,nd->n", diff, diff)
    a = d2.argmin(axis=1)
    chosen = d2[np.arange(n), a]
    sums = np.zeros((k, d), np.int64)
    ns = np.zeros(k, np.int64)
    inert = np.zeros(k, np.int64)
    for j in range(k):
        m = a == j
        if m.any():
            sums[j] = xu[m].sum(axis=0)
            ns[j] = int(m.sum())
            inert[j] = int(chosen[m].sum())
    cl = np.repeat(np.arange(k, dtype=np.int64), d)
    dim = np.tile(np.arange(d, dtype=np.int64), k)
    return pa.table(
        {
            "cluster": pa.array(np.concatenate([cl, np.arange(k), np.arange(k)])),
            "dim": pa.array(
                np.concatenate([dim, np.full(k, -1, np.int64), np.full(k, -2, np.int64)])
            ),
            "s": pa.array(np.concatenate([sums.ravel(), ns, inert])),
        }
    )


def _kmeans_pass(ds, c_u: np.ndarray):
    """One streaming assignment pass: fold the k*(d+2)-row per-batch
    partials into (component sums, counts, inertia) per cluster."""
    from functools import partial as _partial

    kk, d = c_u.shape
    pf = (
        ds.map_batches(
            _partial(_kmeans_partials, cent_u=c_u),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .groupby(["cluster", "dim"], as_index=False)["s"]
        .sum()
    )
    sums = np.zeros((kk, d), np.int64)
    ns = np.zeros(kk, np.int64)
    inert = np.zeros(kk, np.int64)
    comp = pf[pf["dim"] >= 0]
    sums[comp["cluster"].to_numpy(), comp["dim"].to_numpy()] = comp["s"].to_numpy()
    cnt = pf[pf["dim"] == -1]
    ns[cnt["cluster"].to_numpy()] = cnt["s"].to_numpy()
    ine = pf[pf["dim"] == -2]
    inert[ine["cluster"].to_numpy()] = ine["s"].to_numpy()
    return sums, ns, inert


def kmeans_fit(ds, k: int = 4, iters: int = 2) -> np.ndarray:
    """Fit integer-exact Lloyd's k-means centroids (micro-units, int64).

    - init: the k lowest-vec_id vectors (micro-unit integerized);
    - each iteration: ONE streaming pass emitting k*(d+2)-row partials
      per batch (centroids ride the task closure — k*d int64, a few KB);
      the driver fold is a tiny pandas groupby (k*d rows), new centroid
      = trunc(sum/n) in pure int64 (empty clusters keep their centroid).

    Scale shape: pass count = iters over the input with nothing but
    partials shuffled; at 100 TB feed a spooled/checkpointed dataset so
    re-execution does not re-read the source, and sample-fit the init
    (as IvfIndex does) if vec_ids are not cheap to min-k.
    """
    init = ds.sort("vec_id").limit(k).take_all()
    rows = sorted(init, key=lambda r: r["vec_id"])
    if len(rows) < k:
        raise ValueError(f"need >= {k} vectors, got {len(rows)}")
    cent_u = np.stack([_u6(np.asarray(r["embedding"], np.float64)) for r in rows])
    for _ in range(iters):
        sums, ns, _ = _kmeans_pass(ds, cent_u)
        nz = ns > 0
        upd = _trunc_div(sums[nz], ns[nz][:, None])
        cent_u = cent_u.copy()
        cent_u[nz] = upd
    return cent_u


def kmeans_clusters(ds, k: int = 4, iters: int = 2) -> pa.Table:
    """Lloyd's k-means over an embedding Dataset (see `kmeans_fit`), plus
    a final pass yielding per-cluster size / inertia / |centroid| l1 —
    fully deterministic and integer-exact so a SQL oracle reproduces it
    bit-for-bit."""
    cent_u = kmeans_fit(ds, k=k, iters=iters)
    kk = cent_u.shape[0]
    _, ns, inert = _kmeans_pass(ds, cent_u)
    return pa.table(
        {
            "cluster": pa.array(np.arange(kk, dtype=np.int64)),
            "n_vecs": pa.array(ns),
            "inertia_u": pa.array(inert),
            "cent_l1_u": pa.array(np.abs(cent_u).sum(axis=1)),
        }
    )


# --- persistent IVF index with O(delta) streaming append ----------------

class PersistentIvf:
    """On-disk IVF index with O(delta) streaming APPEND — the ANN sibling
    of the CDC delta table (cdc/merge.py): new vectors land as immutable
    per-run files inside the inverted-list layout; nothing existing is
    ever rewritten, so a 100 TB index absorbs a 100 GB ingest batch at
    the cost of the batch, not the index.

    Layout under ``index_dir`` (one filesystem):

        _FORMAT.json                 {kind, version, n_centroids, dim}
        centroids.parquet            frozen coarse quantizer, written ONCE
        runs/<run_id>/centroid=<c>/*.parquet   one ingest run (hive layout)
        runs/<run_id>/_COMMITTED     atomic publish marker

    Contracts:

    - **Frozen quantizer.** ``build`` fits centroids once (hash-sampled,
      unbiased — `_fit_sample`); every later ``append`` assigns against
      the SAME centroids, so a vector's inverted list never depends on
      when it arrived and probe pruning stays correct across runs.  The
      reference point for refreshing a drifted quantizer is a REBUILD
      into a fresh index_dir, never an in-place refit (which would
      silently orphan already-routed vectors).
    - **Exactly-once append.** A run is visible iff its `_COMMITTED`
      marker exists.  Data is staged under ``runs/.staging-*`` and
      published by one atomic ``os.replace`` + marker write, so a crashed
      or re-executed append never yields duplicates: a re-run with the
      same ``run_id`` sees the marker and becomes a no-op (the CDC run
      ledger's idempotency contract, cdc/pipeline.py).
    - **Pruned probe reads.** ``search`` lists committed runs on the
      driver (cheap: one dir listing) and reads ONLY the probed
      ``centroid=<c>`` subdirectories across runs — directory-level
      pruning, unprobed lists are never opened.  With ``nprobe ==
      n_centroids`` the search is exact (the oracle path); below it the
      recall/latency knob is covered by pytest, like IvfIndex.
    - **Epoch-ordered visibility (LSM sequence numbers).** Every publish
      (append / delete / compact) takes the next integer epoch; run rows
      carry their run's epoch as a column, tombstones carry theirs.  A
      row is visible iff its epoch is GREATER than the newest tombstone
      epoch for its vec_id — so delete-then-append is a correct UPSERT
      (the re-appended vector lands at a higher epoch and wins), and a
      revert to a previously-tombstoned version resurfaces correctly.
      Epochs are assigned by the single maintenance writer (the CDC-sync
      convention); concurrent APPENDS of distinct runs are safe, but
      deletes must not race appends they are meant to order against.

    Scale shape: append streams (assign is a stateless vectorized
    map_batches; the write is Ray's partitioned parquet sink), search
    volume is O(probed lists), and many small runs are compacted by
    ``compact()`` — read-merge-rewrite per inverted list into one new
    run, published with the same atomic marker before old runs retire.
    """

    FORMAT = {"kind": "ivf-append", "version": 2}

    def __init__(self, index_dir: str, centroids: np.ndarray):
        self.index_dir = index_dir
        self.centroids = np.asarray(centroids, dtype=np.float64)

    # -- construction ----------------------------------------------------

    @classmethod
    def build(cls, index_dir: str, ds=None, *, n_centroids: int = 16,
              iters: int = 10, seed: int = 3, sample_limit: int = 20_000,
              n_rows: "int | None" = None) -> "PersistentIvf":
        """Create the index (fit + persist centroids) or LOAD it if
        ``index_dir`` already holds one — idempotent across re-runs, like
        every bootstrap in this engine.  ``ds`` may be None when loading."""
        import os

        from ..util import atomic_write_json, read_json

        marker = os.path.join(index_dir, "_FORMAT.json")
        if os.path.exists(marker):
            got = read_json(marker)
            # pure load (no dataset): the persisted parameters are the
            # truth; with a dataset (build intent) a parameter mismatch
            # is an explicit error, never a silent re-route (the CDC
            # state-marker convention, cdc/pipeline.py)
            want = dict(cls.FORMAT)
            if ds is not None:
                want["n_centroids"] = n_centroids
            mismatch = {
                k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]
            }
            if mismatch:
                raise ValueError(
                    f"ivf index at {index_dir} was written with different "
                    f"parameters {mismatch}; rebuild into a fresh index_dir"
                )
            return cls.load(index_dir)
        if ds is None:
            raise ValueError(f"no index at {index_dir} and no dataset to build from")
        core = IvfIndex(n_centroids=n_centroids, iters=iters, seed=seed).fit(
            ds, sample_limit=sample_limit, n_rows=n_rows
        )
        os.makedirs(os.path.join(index_dir, "runs"), exist_ok=True)
        c = core.centroids
        from ..util import atomic_write_parquet

        atomic_write_parquet(
            os.path.join(index_dir, "centroids.parquet"),
            pa.table(
                {
                    "centroid": pa.array(np.arange(len(c), dtype=np.int32)),
                    "vector": pa.FixedSizeListArray.from_arrays(
                        pa.array(c.reshape(-1), pa.float64()), c.shape[1]
                    ),
                }
            ),
        )
        atomic_write_json(
            marker, dict(cls.FORMAT, n_centroids=len(c), dim=int(c.shape[1]))
        )
        return cls(index_dir, c)

    @classmethod
    def load(cls, index_dir: str) -> "PersistentIvf":
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        order = np.argsort(t["centroid"].to_numpy())
        c = np.stack(
            [np.asarray(v, np.float64) for v in t["vector"].to_pylist()]
        )[order]
        return cls(index_dir, c)

    # -- run bookkeeping ---------------------------------------------------

    def _runs_dir(self) -> str:
        import os

        return os.path.join(self.index_dir, "runs")

    def committed_runs(self) -> "list[str]":
        import os

        rd = self._runs_dir()
        if not os.path.isdir(rd):
            return []
        return sorted(
            r
            for r in os.listdir(rd)
            if not r.startswith(".")
            and os.path.exists(os.path.join(rd, r, "_COMMITTED"))
        )

    def _next_epoch(self) -> int:
        """1 + the max epoch across committed run markers and live
        tombstones — the LSM sequence counter.  O(committed publishes)
        tiny reads, all driver-side."""
        import json
        import os

        hi = 0
        rd = self._runs_dir()
        for r in self.committed_runs():
            try:
                with open(os.path.join(rd, r, "_COMMITTED")) as f:
                    hi = max(hi, int(json.loads(f.read()).get("epoch", 0)))
            except (ValueError, OSError):
                pass  # legacy plain-text marker: epoch 0
        tomb = self._tombstones()
        if tomb.num_rows:
            import pyarrow.compute as pc

            hi = max(hi, pc.max(tomb["epoch"]).as_py())
        return hi + 1

    @staticmethod
    def _write_marker(run_dir: str, run_id: str, epoch: int) -> None:
        import json
        import os

        with open(os.path.join(run_dir, "_COMMITTED"), "w") as f:
            f.write(json.dumps({"run_id": run_id, "epoch": int(epoch)}))

    # -- ingest ------------------------------------------------------------

    def append(self, ds, run_id: str) -> dict:
        """Route ``ds`` (vec_id, embedding) into the inverted lists as run
        ``run_id`` — O(delta): one streaming assign pass over the new
        vectors, one partitioned write, zero touches of existing runs.
        Idempotent on ``run_id`` (see class contract).  The run's epoch
        rides every row as a constant int64 column (RLE — bytes on disk),
        ordering it against tombstones."""
        import os

        from ..util import new_token

        run_dir = os.path.join(self._runs_dir(), run_id)
        if os.path.exists(os.path.join(run_dir, "_COMMITTED")):
            return {"run_id": run_id, "skipped": True}
        epoch = self._next_epoch()
        core = IvfIndex(n_centroids=len(self.centroids))
        core.centroids = self.centroids

        def _stamp(t: pa.Table) -> pa.Table:
            return t.append_column(
                "epoch", pa.array(np.full(t.num_rows, epoch, np.int64))
            )

        staging = os.path.join(self._runs_dir(), f".staging-{run_id}-{new_token()}")
        core.assign(ds).map_batches(
            _stamp, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(staging, partition_cols=["centroid"])
        try:
            os.replace(staging, run_dir)
        except OSError:
            # run_dir already exists: either a concurrent/earlier append
            # published it (theirs wins — same content by the run_id
            # contract), or a prior attempt crashed BETWEEN os.replace and
            # the marker write.  The torn dir is complete data (os.replace
            # is atomic), so publishing it now is sound; its rows carry the
            # earlier attempt's epoch, which is <= ours and orders the same
            # against every tombstone that existed before either attempt.
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            if os.path.exists(os.path.join(run_dir, "_COMMITTED")):
                return {"run_id": run_id, "skipped": True}
            self._write_marker(run_dir, run_id, epoch)
            return {"run_id": run_id, "skipped": False, "recovered": True}
        self._write_marker(run_dir, run_id, epoch)
        return {"run_id": run_id, "skipped": False, "epoch": epoch}

    # -- deletes (CDC tombstones) -------------------------------------------

    def delete(self, vec_ids, run_id: str) -> dict:
        """Tombstone ``vec_ids`` at the next epoch: rows of those ids in
        every run committed SO FAR vanish from search immediately and are
        physically removed at the next ``compact()`` — the LSM delete,
        same shape as the CDC table's tombstone-then-compact
        (cdc/merge.py).  One atomically-published parquet per delete run;
        idempotent on ``run_id``.

        A later ``append`` of the same vec_id lands at a HIGHER epoch and
        is visible — so delete-then-append is the index's upsert (the
        CDC-sync move, ops/index_sync.py).  ``vec_ids`` is a driver-side
        id list: deletes are retractions/redactions/update-preimages,
        O(delta) next to ingest — a delete feed that no longer fits the
        driver should arrive batched."""
        import os

        from ..util import atomic_write_parquet

        td = os.path.join(self.index_dir, "tombstones")
        path = os.path.join(td, f"{run_id}.parquet")
        if os.path.exists(path):
            return {"run_id": run_id, "skipped": True}
        os.makedirs(td, exist_ok=True)
        epoch = self._next_epoch()
        ids = np.unique(np.asarray(list(vec_ids), dtype=np.int64))
        atomic_write_parquet(
            path,
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "epoch": pa.array(np.full(len(ids), epoch, np.int64)),
                }
            ),
        )
        return {
            "run_id": run_id, "skipped": False,
            "tombstoned": int(len(ids)), "epoch": epoch,
        }

    def _tombstones(self) -> pa.Table:
        """Live tombstones as (vec_id, epoch) with the NEWEST epoch per
        vec_id (driver-side, see delete())."""
        import os

        import pyarrow.parquet as pq

        td = os.path.join(self.index_dir, "tombstones")
        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()), "epoch": pa.array([], pa.int64())}
        )
        if not os.path.isdir(td):
            return empty
        files = [
            os.path.join(td, f) for f in sorted(os.listdir(td)) if f.endswith(".parquet")
        ]
        if not files:
            return empty
        t = pa.concat_tables([pq.read_table(f) for f in files])
        return (
            t.group_by("vec_id").aggregate([("epoch", "max")])
            .rename_columns(["vec_id", "epoch"]).combine_chunks()
        )

    @staticmethod
    def _tomb_filter(tomb: pa.Table):
        """Batch filter applying the epoch rule: keep a row iff its vec_id
        has no tombstone OR the row's epoch is newer than the newest
        tombstone for that id.  The tombstone table ships in the task
        closure (object-store cached broadcast); live tombstones are
        O(deletes since last compact)."""
        import pyarrow.compute as pc

        ids = tomb["vec_id"].combine_chunks()
        eps = tomb["epoch"].to_numpy()

        def _f(t: pa.Table) -> pa.Table:
            pos = pc.index_in(t["vec_id"], value_set=ids)
            posn = pos.to_numpy(zero_copy_only=False)
            hit = posn == posn  # non-null -> tombstoned id
            keep = np.ones(t.num_rows, bool)
            if hit.any():
                row_ep = t["epoch"].to_numpy()
                keep[hit] = row_ep[hit] > eps[posn[hit].astype(np.int64)]
            return t.filter(pa.array(keep))

        return _f

    # -- search ------------------------------------------------------------

    @staticmethod
    def _parquet_files(*dirs: str) -> "list[str]":
        # expanded to FILES (multi-path read_parquet treats list entries
        # as files, and run dirs also hold the non-parquet _COMMITTED
        # marker); listing cost is O(listed dirs)
        import os

        out = []
        for d in dirs:
            for root, _subdirs, files in os.walk(d):
                out.extend(
                    os.path.join(root, f)
                    for f in sorted(files)
                    if f.endswith(".parquet")
                )
        return out

    def _probe_paths(self, probe_set: "list[int]") -> "list[str]":
        # only the probed centroid=<c> subdirectories are ever listed or
        # opened — unprobed inverted lists cost nothing
        import os

        rd = self._runs_dir()
        return self._parquet_files(
            *(
                p
                for r in self.committed_runs()
                for c in probe_set
                if os.path.isdir(p := os.path.join(rd, r, f"centroid={c}"))
            )
        )

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
        """Probed cosine top-k over every committed run; reads ONLY the
        probed inverted-list directories."""
        import ray.data

        q = _normalize(np.asarray(queries, dtype=np.float64))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        paths = self._probe_paths(sorted({int(c) for row in probes for c in row}))
        if not paths:
            return _topk_reduce(ray.data.from_arrow(pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())})), k)
        tomb = self._tombstones()
        cols = ["vec_id", "embedding"] + (["epoch"] if tomb.num_rows else [])
        sub = ray.data.read_parquet(paths, columns=cols)
        if tomb.num_rows:
            sub = sub.map_batches(
                self._tomb_filter(tomb),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        return brute_force_topk(sub, q, k)

    def compact(self) -> dict:
        """Fold all committed runs into ONE new run (read-merge-rewrite per
        inverted list — the LSM compaction move), applying and reclaiming
        live tombstones, publish it atomically, then retire the old runs.
        Safe against crashes at any point: the compacted run only becomes
        visible with its marker, and a reader that raced the retirement
        still sees a complete (if duplicated) view only BETWEEN
        marker-write and retire — callers needing strict isolation compact
        in a maintenance window, as with cdc compact."""
        import os
        import shutil

        import ray.data

        from ..util import new_token

        old = self.committed_runs()
        tomb = self._tombstones()
        n_tomb = tomb.num_rows
        if len(old) <= 1 and not n_tomb:
            return {"compacted": 0, "run_id": None}
        if not old:
            # tombstones over an empty index reference nothing — reclaim
            shutil.rmtree(os.path.join(self.index_dir, "tombstones"), ignore_errors=True)
            return {"compacted": 0, "run_id": None, "tombstones_applied": n_tomb}
        rd = self._runs_dir()
        epoch = self._next_epoch()
        token = f"compact-{new_token()[:12]}"
        staging = os.path.join(rd, f".staging-{token}")
        cols = ["vec_id", "embedding"] + (["epoch"] if n_tomb else [])
        ds = ray.data.read_parquet(
            self._parquet_files(*(os.path.join(rd, r) for r in old)),
            columns=cols,
        )
        if n_tomb:
            flt = self._tomb_filter(tomb)
            ds = ds.map_batches(
                lambda t: flt(t).drop_columns(["epoch"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

        def _stamp(t: pa.Table) -> pa.Table:
            return t.append_column(
                "epoch", pa.array(np.full(t.num_rows, epoch, np.int64))
            )

        core = IvfIndex(n_centroids=len(self.centroids))
        core.centroids = self.centroids
        core.assign(ds).map_batches(
            _stamp, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(staging, partition_cols=["centroid"])
        run_dir = os.path.join(rd, token)
        os.replace(staging, run_dir)
        self._write_marker(run_dir, token, epoch)
        for r in old:
            shutil.rmtree(os.path.join(rd, r), ignore_errors=True)
        # tombstones are folded into the compacted run — reclaim them
        # AFTER the old runs retire (a crash in between leaves surplus
        # tombstones over already-deleted ids: harmless, re-applied)
        shutil.rmtree(os.path.join(self.index_dir, "tombstones"), ignore_errors=True)
        return {"compacted": len(old), "run_id": token, "tombstones_applied": n_tomb}
