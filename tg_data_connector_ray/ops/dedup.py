"""Deduplication operators over a documents table: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design notes (100 TB):
- Exact dedup NEVER shuffles document bodies: a map_batches stage reduces
  each row to (content_hash, doc_id) — two thin columns — and only those
  shuffle through the groupby.  Representatives are min(doc_id) per hash.
- MinHash/SimHash emit fixed-size signature rows (bands), so the LSH
  shuffle volume is O(n_docs * n_bands), independent of document length.
- Candidate-pair verification is bounded: bucket membership is capped
  (`max_bucket`) and logged when clipped, so a degenerate bucket (e.g. the
  empty document) cannot go quadratic.
- Union-find over verified pairs runs on the driver ONLY because the pair
  set is provably small (candidates after banding + verification); the
  cluster count, not the corpus size, bounds it.  For corpora where that
  fails, the same pairs feed a few rounds of min-label propagation via
  groupby — noted where relevant.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")

_MERSENNE = (1 << 61) - 1


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping arithmetic)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def content_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """(doc_id, h) rows: md5 of the exact text — the exact-dedup reduction."""
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
        for t in batch[col].to_pylist()
    ]
    return pa.table({"doc_id": batch["doc_id"], "h": pa.array(fps, type=pa.string())})


def exact_dedup_ids(ds, col: str = "text"):
    """Representative doc_ids (min per identical text). Returns a Dataset
    with a single `doc_id` column."""
    thin = ds.map_batches(
        lambda b: content_hash_batch(b, col), batch_format="pyarrow", zero_copy_batch=True
    )
    reps = thin.groupby("h").min("doc_id")
    return reps.select_columns(["min(doc_id)"]).rename_columns(["doc_id"])


# ---------------------------------------------------------------------------
# shingles + MinHash

def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of word k-grams (md5-based: process-stable)."""
    toks = _TOKEN_RE.findall(text.lower()) if text else []
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([_md5_u64(g) for g in grams], dtype=np.uint64))


class MinHasher:
    """Stateful minhash stage: permutation parameters built once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        # xor-mix minhash family: sig_i = min_x mix64(x ^ c_i) — all-uint64
        # vectorized (no Python bigints); standard LSH practice
        self.c = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.k)
        vals = _mix64(x[None, :] ^ self.c[:, None])
        return np.min(vals, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc rows -> (band, band_hash, doc_id) LSH bucket rows."""
        ids, bands_out, hashes_out = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.signature(text or "")
            for bi in range(self.bands):
                chunk = sig[bi * self.rows : (bi + 1) * self.rows]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                ids.append(doc_id)
                bands_out.append(bi)
                hashes_out.append(bh)
        return pa.table(
            {
                "band": pa.array(bands_out, type=pa.int32()),
                "bh": pa.array(hashes_out, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )


def _bucket_pairs_table(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    ids = sorted(group["doc_id"].to_pylist())[:max_bucket]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def lsh_candidate_pairs(ds, hasher_kwargs: "dict | None" = None, max_bucket: int = 64):
    """documents -> distinct candidate (a, b) pairs via MinHash banding."""
    import ray.data  # noqa: F401

    from ..util import default_pool_size

    buckets = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        concurrency=default_pool_size(),
        fn_constructor_kwargs=hasher_kwargs or {},
    )
    pairs = buckets.groupby(["band", "bh"]).map_groups(
        lambda g: _bucket_pairs_table(g, max_bucket), batch_format="pyarrow"
    )
    # pairs is small (post-banding); pin it so the dedup below doesn't
    # re-execute the signature pipeline
    pairs = pairs.materialize()
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _clusters_from_pairs(pairs: "list[tuple[int, int]]") -> dict:
    """Union-find -> {doc_id: representative}. Driver-side: pair count is
    bounded by LSH banding + verification, not corpus size."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def minhash_dedup_ids(ds, threshold: float = 0.8, shingle_k: int = 3, max_bucket: int = 64):
    """Near-dup dedup: returns the kept doc_ids (cluster representatives =
    min doc_id; non-candidates keep themselves) as a Dataset."""
    cand = lsh_candidate_pairs(ds, {"shingle_k": shingle_k}, max_bucket)
    pair_rows = cand.take_all()  # bounded: post-banding candidates only
    if pair_rows:
        need = sorted({r["a"] for r in pair_rows} | {r["b"] for r in pair_rows})
        texts = _gather_texts(ds, need)
        verified = [
            (r["a"], r["b"])
            for r in pair_rows
            if jaccard(texts.get(r["a"], ""), texts.get(r["b"], ""), shingle_k) >= threshold
        ]
    else:
        verified = []
    rep = _clusters_from_pairs(verified)
    dropped = {d for d, r in rep.items() if r != d}
    return _keep_ids(ds, dropped)


def _keep_ids(ds, dropped: set):
    """doc_id Dataset minus a (small, broadcast) dropped-id set — vectorized."""
    drop_arr = pa.array(sorted(dropped), type=pa.int64())

    def _f(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.fill_null(pc.is_in(b["doc_id"], value_set=drop_arr), False))
        return b.filter(keep)

    return ds.select_columns(["doc_id"]).map_batches(
        _f, batch_format="pyarrow", zero_copy_batch=True
    )


def _gather_texts(ds, ids: "list[int]") -> dict:
    """Fetch texts for a bounded id set (broadcast filter, no shuffle)."""
    idset = set(ids)
    sub = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"], value_set=pa.array(list(idset), pa.int64()))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return {r["doc_id"]: r["text"] for r in sub.select_columns(["doc_id", "text"]).take_all()}


# ---------------------------------------------------------------------------
# SimHash

class SimHashStage:
    """(doc_id, simhash, band buckets) — 64-bit simhash, 4 x 16-bit bands
    (pigeonhole: hamming<=3 implies one identical band)."""

    def __init__(self, seed: int = 11):
        self.shift = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = _TOKEN_RE.findall((text or "").lower())
        if not toks:
            return 0
        hs = np.array([_md5_u64(t) for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> self.shift[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << self.shift).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sh = [self.simhash(t) for t in batch["text"].to_pylist()]
        out_id, out_band, out_key, out_sim = [], [], [], []
        for d, h in zip(ids, sh):
            for b in range(4):
                out_id.append(d)
                out_band.append(b)
                out_key.append((h >> (16 * b)) & 0xFFFF)
                out_sim.append(h)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bkey": pa.array(out_key, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_sim, pa.uint64()),
            }
        )


def _sim_pairs(group: pa.Table, max_hamming: int, max_bucket: int = 256) -> pa.Table:
    rows = sorted(
        zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist())
    )[:max_bucket]
    a, b = [], []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if bin(rows[i][1] ^ rows[j][1]).count("1") <= max_hamming:
                a.append(rows[i][0])
                b.append(rows[j][0])
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def simhash_dedup_ids(ds, max_hamming: int = 3):
    """Near-dup dedup by SimHash banding; returns kept doc_ids Dataset."""
    from ..util import default_pool_size

    buckets = ds.map_batches(
        SimHashStage, batch_format="pyarrow", concurrency=default_pool_size()
    )
    pairs = buckets.groupby(["band", "bkey"]).map_groups(
        lambda g: _sim_pairs(g, max_hamming), batch_format="pyarrow"
    )
    pair_rows = {(r["a"], r["b"]) for r in pairs.take_all()}
    rep = _clusters_from_pairs(sorted(pair_rows))
    dropped = {d for d, r in rep.items() if r != d}
    return _keep_ids(ds, dropped)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via shingle inverted index blocking)

def ngram_jaccard_pairs(ds, threshold: float = 0.8, shingle_k: int = 3, max_posting: int = 64):
    """Exact-threshold Jaccard duplicate pairs.  Blocking: inverted index on
    shingle hashes (posting lists capped + logged), candidate pairs must
    share >=1 shingle — exact for threshold > 0.  Returns (a, b, jac)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, sh = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for h in _shingle_hashes(text or "", shingle_k):
                ids.append(doc_id)
                sh.append(int(h))
        return pa.table({"sh": pa.array(sh, pa.uint64()), "doc_id": pa.array(ids, pa.int64())})

    inv = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    pairs = inv.groupby("sh").map_groups(
        lambda g: _bucket_pairs_table(g, max_posting), batch_format="pyarrow"
    )
    uniq = pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
    rows = uniq.take_all()
    if not rows:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "jac": pa.array([], pa.float64())})
    texts = _gather_texts(ds, sorted({r["a"] for r in rows} | {r["b"] for r in rows}))
    out_a, out_b, out_j = [], [], []
    for r in rows:
        j = jaccard(texts.get(r["a"], ""), texts.get(r["b"], ""), shingle_k)
        if j >= threshold:
            out_a.append(r["a"])
            out_b.append(r["b"])
            out_j.append(j)
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()), "jac": pa.array(out_j, pa.float64())}
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def embedding_near_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 12, seed: int = 5):
    """Near-dup (vec_id, vec_id) pairs with cosine >= threshold.

    Scale path: random-hyperplane LSH buckets (sign bits) keep comparisons
    within buckets; two extra rotated bucketings catch near-boundary pairs.
    """
    schema_dim = len(ds.take(1)[0]["embedding"])
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((schema_dim, n_planes)) for _ in range(2)]

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norms, 1e-12)
        ids, rots, keys, vecs = [], [], [], []
        for rot, P in enumerate(planes):
            bits = (emb @ P) > 0
            key = bits @ (1 << np.arange(n_planes))
            ids.extend(batch["vec_id"].to_pylist())
            rots.extend([rot] * batch.num_rows)
            keys.extend(key.tolist())
            vecs.extend(emb.tolist())
        return pa.table(
            {
                "rot": pa.array(rots, pa.int32()),
                "bkey": pa.array(keys, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "vec": pa.array(vecs, pa.list_(pa.float64())),
            }
        )

    def bucket_cosine_pairs(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_pylist()
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        order = np.argsort(ids)
        emb = np.stack(group["vec"].to_pylist())[order]
        ids = np.array(ids)[order]
        sims = emb @ emb.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table({"a": pa.array(ids[ai], pa.int64()), "b": pa.array(ids[bi], pa.int64())})

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = buckets.groupby(["rot", "bkey"]).map_groups(
        bucket_cosine_pairs, batch_format="pyarrow"
    )
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
