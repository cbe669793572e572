"""Deduplication operators over a documents table: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design notes (100 TB):
- Exact dedup NEVER shuffles document bodies: a map_batches stage reduces
  each row to (hash128, doc_id) — thin columns — and only those shuffle
  through the groupby.  Representatives are min(doc_id) per hash.
- MinHash/SimHash signatures are fully vectorized: tokens are hashed once
  per UNIQUE token per batch (md5 for process stability), k-gram shingles
  combine token hashes with positional splitmix64 mixing, and per-doc
  minima run as one `np.minimum.reduceat` — no per-row/per-shingle Python.
- LSH buckets emit fixed-size rows, so the shuffle volume is
  O(n_docs * n_bands), independent of document length; bucket membership
  is capped (`max_bucket`) so a degenerate bucket cannot go quadratic.
- Candidate-pair VERIFICATION is distributed: texts attach to pairs via
  two hash joins (`Dataset.join`), exact Jaccard runs inside map_batches —
  candidate pairs never funnel through the driver.
- Clustering is distributed min-label propagation (`min_label_clusters`):
  edges + labels datasets, one join + groupby-min per round, O(component
  diameter) rounds — no driver union-find.  Kept ids are an anti-join.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping arithmetic)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 lacks bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _segmented_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _i64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _nonempty(ds):
    """Materialize and drop empty blocks.

    Ray Data's map stages emit ZERO-SCHEMA blocks for empty inputs, and the
    hash-join aggregator then fails with "no match for key field" when such
    a block reaches either join side.  Every dataset this module feeds into
    `Dataset.join` is a thin pair/label set (already bounded by banding),
    so the materialize here is cheap and usually already done.
    """
    import ray
    import ray.data

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        schema = mat.schema()
        if schema is None:  # zero-schema empty (no group task ever ran):
            return mat  # nothing to rebuild; callers count()==0-guard
        empty = pa.table(
            {name: pa.array([], type=t) for name, t in zip(schema.names, schema.types)}
        )
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# vectorized token + shingle hashing (shared by minhash / ngram-jaccard)

def _split_tokens_arrow(texts) -> "tuple[pa.Array, np.ndarray]":
    """Vectorized shared tokenizer for every dedup/corpus text stage:
    ONE `pc.split_pattern_regex` over the lowered column (the LangId
    idiom) — (flat nonempty token StringArray grouped by doc, per-doc
    int64 offsets).  No per-doc Python loop; the empty-string entries
    split produces at delimiter boundaries are dropped with one
    vectorized mask.

    Lowering semantics: Arrow's utf8_lower SIMPLE-maps (U+0130 'İ' ->
    'i'), exactly like DuckDB's lower() — i.e. identical to the SQL
    oracles' `regexp_extract_all(lower(text), '[a-z0-9_]+')` on ANY
    input.  Python's str.lower() FULL-case-folds ('İ' -> 'i'+U+0307,
    changing token boundaries), so this deliberately diverges from the
    old per-doc `_TOKEN_RE.findall(t.lower())` on such characters — the
    oracle contract, not Python, is canonical (verified empirically:
    DuckDB lower('AİB')='aib')."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(list(texts), type=pa.string())
    n = len(texts)
    if n == 0:
        return pa.array([], type=pa.string()), np.zeros(1, dtype=np.int64)
    s = pc.fill_null(texts, "")
    # lowered text contains no [A-Z], so splitting on [^a-z0-9_]+ equals
    # findall([A-Za-z0-9_]+) over the lowered text
    words = pc.split_pattern_regex(pc.utf8_lower(s), "[^a-z0-9_]+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs_raw = words.offsets.to_numpy().astype(np.int64)
    offs_raw = offs_raw - offs_raw[0]
    flat = words.flatten()
    lens = np.diff(offs_raw)
    row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    counts = np.bincount(row_id[nonempty], minlength=n).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return flat.filter(pa.array(nonempty)), offsets


def _token_hashes_flat(texts) -> "tuple[np.ndarray, np.ndarray]":
    """All docs' token hashes as one flat uint64 array + doc offsets.

    md5 runs once per UNIQUE token in the batch (process-stable identity,
    the oracle contract); tokenization and the unique/gather are fully
    vectorized (`_split_tokens_arrow` + pc.unique/index_in).  Tokens keep
    duplicates and order.  Accepts a list of strings or an Arrow string
    column.
    """
    flat, offsets = _split_tokens_arrow(texts)
    if len(flat):
        uniq = flat.unique()
        inv = (
            pc.index_in(flat, value_set=uniq)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        uhash = np.array([_md5_u64(u) for u in uniq.to_pylist()], dtype=np.uint64)
        h = uhash[inv]
    else:
        h = np.empty(0, dtype=np.uint64)
    return h, offsets


_EMPTY_SENTINEL = np.uint64(0xE111_7E57_0000_0001)


def _pos_consts(k: int) -> np.ndarray:
    """Odd positional mixing constants so k-grams are order-sensitive."""
    return _mix64(
        np.arange(1, k + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ) | np.uint64(1)


def _shingle_hashes_flat(
    h: np.ndarray, offsets: np.ndarray, k: int = 3
) -> "tuple[np.ndarray, np.ndarray]":
    """Flat word-k-gram shingle hashes + per-doc offsets (with duplicates).

    Docs with >=k tokens emit one shingle per window; docs with 1..k-1
    tokens emit ONE shingle combining all their tokens; empty docs emit
    the sentinel — mirroring the per-doc reference semantics exactly.
    """
    counts = np.diff(offsets).astype(np.int64)
    D = len(counts)
    n_sh = np.where(counts >= k, counts - k + 1, 1)
    sh_off = np.concatenate([[0], np.cumsum(n_sh)])
    out = np.full(int(sh_off[-1]), _EMPTY_SENTINEL, dtype=np.uint64)
    P = _pos_consts(k)
    n = len(h)

    if n >= k:  # all full windows in one vectorized pass (cross-doc
        # windows computed then discarded — cheaper than masking first)
        acc = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            acc += h[j : n - k + 1 + j] * P[j]
        acc = _mix64(acc)
        big = counts >= k
        if big.any():
            nwin = n_sh[big]
            win_start = np.repeat(offsets[:-1][big], nwin) + _segmented_arange(nwin)
            dst = np.repeat(sh_off[:-1][big], nwin) + _segmented_arange(nwin)
            out[dst] = acc[win_start]

    for L in range(1, k):  # short docs: one shingle over all L tokens
        sel = counts == L
        if not sel.any():
            continue
        starts = offsets[:-1][sel]
        acc = np.zeros(int(sel.sum()), dtype=np.uint64)
        for j in range(L):
            acc += h[starts + j] * P[j]
        out[sh_off[:-1][sel]] = _mix64(acc)

    return out, sh_off


def _shingle_hashes(text: "str | None", k: int = 3) -> np.ndarray:
    """Per-doc unique shingle hash set (the verification-side identity)."""
    h, offs = _token_hashes_flat([text])
    sh, _ = _shingle_hashes_flat(h, offs, k)
    return np.unique(sh)


def _jaccard_sorted(sa: np.ndarray, sb: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 shingle arrays (empty docs carry
    the sentinel shingle, so the arrays are never empty)."""
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / max(1, sa.size + sb.size - inter)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    return _jaccard_sorted(_shingle_hashes(text_a, k), _shingle_hashes(text_b, k))


# ---------------------------------------------------------------------------
# exact dedup

def content_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """(doc_id, h1, h2) rows: 128 bits of vectorized content hash — the
    exact-dedup reduction.  Two independent 64-bit hashes (polars/aHash,
    fixed seeds: process-stable) make collisions negligible at 10^10 docs
    where a single 64-bit key would already expect birthday collisions."""
    import polars as pl

    s = pl.from_arrow(
        batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray) else batch[col]
    )
    # int64 view of the uint64 hashes: bit-identical, and int64 keys stay
    # native through Ray's groupby/join (uint64 can fall back to pickled
    # object columns in the shuffle)
    h1 = s.hash(seed=0x51AB).to_numpy().view(np.int64)
    h2 = s.hash(seed=0xD00D).to_numpy().view(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "h1": pa.array(h1, type=pa.int64()),
            "h2": pa.array(h2, type=pa.int64()),
        }
    )


def exact_dedup_ids(ds, col: str = "text"):
    """Representative doc_ids (min per identical text). Returns a Dataset
    with a single `doc_id` column.

    The finishing group-by is every-unique-doc cardinality, so it goes
    through the coarse-bucket Arrow aggregate (relational.grouped_arrow_
    aggregate) instead of Ray's sort-based per-key aggregate — hash
    buckets on h1, one vectorized group_by per bucket."""
    from ..pipelines.relational import grouped_arrow_aggregate

    thin = ds.map_batches(
        lambda b: content_hash_batch(b, col), batch_format="pyarrow", zero_copy_batch=True
    )
    reps = grouped_arrow_aggregate(
        thin, keys=["h1", "h2"], aggs=[("doc_id", "min")], out_names=["doc_id"]
    )
    return reps.select_columns(["doc_id"])


def exact_dedup_dropped_ids(thin, n_coarse: int = 64):
    """doc_ids that are NOT their content-hash group's minimum — the
    dropped side of exact dedup, computed INSIDE the coarse-bucket pass
    (per bucket: one lexsort over (h1, h2, doc_id) + a first-row mask) —
    no reps join.  `thin` is a (doc_id, h1, h2) Dataset."""

    def tag(t: pa.Table) -> pa.Table:
        # h1 is already a uniform hash: mask directly
        cg = pc.cast(pc.bit_wise_and(t["h1"], n_coarse - 1), pa.int32())
        return t.append_column("_cg", cg)

    def drop_bucket(g: pa.Table) -> pa.Table:
        h1, h2, d = _i64(g["h1"]), _i64(g["h2"]), _i64(g["doc_id"])
        order = np.lexsort((d, h2, h1))
        h1, h2, d = h1[order], h2[order], d[order]
        first = np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
        return pa.table({"doc_id": pa.array(d[~first], pa.int64())})

    return (
        thin.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cg")
        .map_groups(drop_bucket, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

class MinHasher:
    """Stateful minhash stage: permutation parameters built once per actor.

    __call__ is one vectorized pass: flat token hashes -> flat shingles ->
    (num_perm x n_shingles) xor-mix matrix -> per-doc np.minimum.reduceat
    -> positional band fold.  No Python loop over rows or shingles.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.c = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.band_consts = _pos_consts(self.rows)

    def signatures(self, texts: "list[str | None]") -> np.ndarray:
        """(num_perm, n_docs) minhash signature matrix."""
        h, offs = _token_hashes_flat(texts)
        sh, sh_off = _shingle_hashes_flat(h, offs, self.k)
        vals = _mix64(sh[None, :] ^ self.c[:, None])  # (P, S)
        return np.minimum.reduceat(vals, sh_off[:-1], axis=1)  # (P, D)

    def signature(self, text: "str | None") -> np.ndarray:
        return self.signatures([text])[:, 0]

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(bands, n_docs) positional fold of each band's signature rows."""
        s = sig.reshape(self.bands, self.rows, -1)
        acc = np.zeros((self.bands, s.shape[2]), dtype=np.uint64)
        for r in range(self.rows):
            acc += s[:, r, :] * self.band_consts[r]
        return _mix64(acc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc rows -> (band, bh, doc_id) LSH bucket rows."""
        ids = _i64(batch["doc_id"])
        bh = self.band_hashes(self.signatures(batch["text"].to_pylist()))
        D = len(ids)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), D)),
                "bh": pa.array(bh.reshape(-1), type=pa.uint64()),
                "doc_id": pa.array(np.tile(ids, self.bands), type=pa.int64()),
            }
        )


def _bucket_pairs_table(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    ids = np.sort(_i64(group["doc_id"]))[:max_bucket]
    ai, bi = np.triu_indices(len(ids), k=1)
    return pa.table(
        {"a": pa.array(ids[ai], pa.int64()), "b": pa.array(ids[bi], pa.int64())}
    )


_NUM_COARSE = np.uint64(512)


def _run_pair_indices(keys: "list[np.ndarray]", max_run: int) -> "tuple[np.ndarray, np.ndarray]":
    """(i, j) index pairs within each run of equal `keys` rows (arrays must
    already be run-sorted), i < j, runs capped at `max_run` rows.

    Fully vectorized: one pass for run boundaries, then one
    np.triu_indices broadcast per DISTINCT run length (<= max_run
    iterations) — no Python loop over runs.  This is what lets thousands
    of tiny LSH buckets be processed per coarse group in one call.
    """
    n = len(keys[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        change |= k[1:] != k[:-1]
    new_run = np.concatenate([[True], change])
    starts = np.nonzero(new_run)[0]
    run_len = np.diff(np.append(starts, n))
    run_id = np.cumsum(new_run) - 1
    pos = np.arange(n, dtype=np.int64) - starts[run_id]
    keep = pos < max_run  # cap: first max_run rows of each run
    idx = np.nonzero(keep)[0]
    l = np.minimum(run_len, max_run)
    offs = np.concatenate([[0], np.cumsum(l)])
    ai_all, bi_all = [], []
    for L in np.unique(l):
        if L < 2:
            continue
        runs_L = np.nonzero(l == L)[0]
        ta, tb = np.triu_indices(int(L), k=1)
        base = offs[runs_L]
        ai_all.append(idx[(base[:, None] + ta[None, :]).ravel()])
        bi_all.append(idx[(base[:, None] + tb[None, :]).ravel()])
    if not ai_all:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ai_all), np.concatenate(bi_all)


def _bucket_pairs_block(group: pa.Table, key_cols: "list[str]", max_bucket: int) -> pa.Table:
    """All within-bucket (a, b) pairs for EVERY bucket in a coarse group,
    vectorized (buckets keyed by `key_cols`; ids sorted within bucket, so
    a < b and the cap keeps the lowest ids — identical semantics to the
    per-bucket path)."""
    doc = _i64(group["doc_id"])
    keys = [
        group[c].combine_chunks().to_numpy(zero_copy_only=False) for c in key_cols
    ]
    order = np.lexsort((doc, *reversed(keys)))
    doc = doc[order]
    keys = [k[order] for k in keys]
    ai, bi = _run_pair_indices(keys, max_bucket)
    return pa.table(
        {"a": pa.array(doc[ai], pa.int64()), "b": pa.array(doc[bi], pa.int64())}
    )


def lsh_candidate_pairs(ds, hasher_kwargs: "dict | None" = None, max_bucket: int = 64):
    """documents -> distinct candidate (a, b) pairs via MinHash banding.

    The signature stage ships a PRE-BUILT MinHasher instance to plain
    tasks instead of an actor pool: its only state is 64 rng ints, so the
    instance pickles into the (object-store-cached) task closure once and
    tasks scale elastically with blocks — measured 0.5 s vs the actor
    pool's 1.7 s at sf0.1, where pool spin-up dominated the tiny input.
    Actor pools stay reserved for constructors that do real work
    (dimension reads, index builds)."""
    import ray.data  # noqa: F401

    buckets = ds.map_batches(
        MinHasher(**(hasher_kwargs or {})),
        batch_format="pyarrow",
    )
    # coarse-grouped pair generation: one shuffle co-locates ~(buckets /
    # _NUM_COARSE) LSH buckets per group, and the group call vectorizes
    # across ALL of them — no Python call per tiny bucket
    coarse = buckets.map_batches(
        lambda t: t.append_column(
            "cb", pa.array((_i64(t["bh"]).astype(np.uint64) % _NUM_COARSE).astype(np.int32))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = coarse.groupby("cb").map_groups(
        lambda g: _bucket_pairs_block(g, ["band", "bh"], max_bucket),
        batch_format="pyarrow",
    )
    # pairs is small (post-banding); pin it so the dedup below doesn't
    # re-execute the signature pipeline
    pairs = pairs.materialize()
    from ..pipelines.relational import distinct_rows

    return distinct_rows(pairs, ["a", "b"])


# ---------------------------------------------------------------------------
# distributed verification + clustering (shared by all near-dup families)

def _join_ready(ds, cols: "list[str]"):
    """Explicit map_batches projection to `cols` + empty-block drop — the
    required hygiene for anything entering Dataset.join (select_columns
    fused across shuffle boundaries can be dropped per-block by the plan
    optimizer, leaving blocks whose schema the join aggregator rejects)."""

    def _p(t: pa.Table) -> pa.Table:
        return pa.table({c: t[c] for c in cols})

    return _nonempty(ds.map_batches(_p, batch_format="pyarrow"))


def attach_pair_texts(pairs, docs, num_partitions: int = 8):
    """(a, b) pairs + documents -> (a, b, text_a, text_b) via two hash
    joins — candidate texts co-locate with their pairs without ever
    funneling through the driver."""
    def _as_side(key: str, text: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({key: t["doc_id"], text: t["text"]})

        return _f

    da = _nonempty(docs.map_batches(_as_side("a", "text_a"), batch_format="pyarrow"))
    db = _nonempty(docs.map_batches(_as_side("b", "text_b"), batch_format="pyarrow"))
    pairs = _join_ready(pairs, ["a", "b"])
    j = pairs.join(da, join_type="inner", num_partitions=num_partitions, on=("a",))
    j = _join_ready(j, ["a", "b", "text_a"])
    return j.join(db, join_type="inner", num_partitions=num_partitions, on=("b",))


# Below this many candidate pairs, the driver may take_all the THIN
# (a, b) int64 pairs to find the unique doc ids (<= ~8 MB at the bound)...
SMALL_VERIFY_PAIRS = 500_000
# ...and if the unique-doc count is also under this bound, their texts
# are gathered once (broadcast filter, no shuffle) and shipped to verify
# tasks via the object-store-cached task closure — zero shuffles, vs the
# two hash-joins' ~1 s-per-shuffle fixed cost.  Above either bound, the
# distributed join path runs (its fixed cost amortizes at that scale).
SMALL_VERIFY_DOCS = 100_000
# Target pair rows per verify task: the exact-intersection loop is
# ~5-10 us/pair, so ~4k pairs ≈ 30 ms of compute per task — enough to
# amortize dispatch while letting a 200k-pair candidate set use every core.
_VERIFY_ROWS_PER_TASK = 4096


def _gather_texts(ds, ids: "list[int]") -> dict:
    """Texts for a BOUNDED id set (broadcast filter, no shuffle)."""
    idset = pa.array(sorted(set(ids)), pa.int64())
    sub = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["doc_id"], value_set=idset)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return {r["doc_id"]: r["text"] for r in sub.select_columns(["doc_id", "text"]).take_all()}


def verified_jaccard_pairs(
    ds, cand, threshold: float, shingle_k: int = 3, num_partitions: int = 8
):
    """Exact-Jaccard verification of candidate pairs, distributed (two hash
    joins attach texts; exact Jaccard in map_batches), with a bounded
    broadcast fast path for small candidate sets.
    Returns a Dataset (a, b, jac) with jac >= threshold."""
    import ray.data

    def _verify(t: pa.Table) -> pa.Table:
        # shingle each UNIQUE text once per batch (the md5 + tokenize cost
        # dominates; a doc in P pairs must not pay it P times), then each
        # pair is one sorted-array intersection
        ta, tb = t["text_a"].to_pylist(), t["text_b"].to_pylist()
        uniq, inv = np.unique(np.array(ta + tb, dtype=object), return_inverse=True)
        h, offs = _token_hashes_flat([x if isinstance(x, str) else None for x in uniq])
        sh, sh_off = _shingle_hashes_flat(h, offs, shingle_k)
        sets = [np.unique(sh[sh_off[i] : sh_off[i + 1]]) for i in range(len(uniq))]
        n = len(ta)
        jac = np.array(
            [
                _jaccard_sorted(sets[x], sets[y])
                for x, y in zip(inv[:n], inv[n:])
            ],
            dtype=np.float64,
        )
        keep = jac >= threshold
        out = t.select(["a", "b"]).filter(pa.array(keep))
        return out.append_column("jac", pa.array(jac[keep], pa.float64()))

    cand = cand.materialize()
    n_cand = cand.count()
    # the per-pair intersection loop is the verify budget: spread it over
    # ~_VERIFY_ROWS_PER_TASK-row blocks (groupby/distinct upstream emits a
    # handful of fat blocks, which would serialize the whole loop on a
    # couple of cores)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    want = max(1, min(cpus, -(-n_cand // _VERIFY_ROWS_PER_TASK)))
    if cand.num_blocks() < want:
        cand = cand.repartition(want).materialize()
    if n_cand <= SMALL_VERIFY_PAIRS:
        # thin int64 columns via Arrow, not take_all's per-row dicts
        pdf = cand.to_pandas()
        need = np.unique(
            np.concatenate([pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)])
        ) if len(pdf) else np.empty(0, np.int64)
        if need.size <= SMALL_VERIFY_DOCS:
            texts = _gather_texts(ds, need.tolist()) if len(pdf) else {}

            def _attach_bcast(t: pa.Table) -> pa.Table:
                # `texts` rides in the task closure (object-store-cached:
                # broadcast once, not re-shipped per batch)
                a, b = _i64(t["a"]), _i64(t["b"])
                return pa.table(
                    {
                        "a": t["a"],
                        "b": t["b"],
                        "text_a": pa.array([texts.get(x) for x in a], pa.string()),
                        "text_b": pa.array([texts.get(y) for y in b], pa.string()),
                    }
                )

            return cand.map_batches(_attach_bcast, batch_format="pyarrow").map_batches(
                _verify, batch_format="pyarrow"
            )
    return attach_pair_texts(cand, ds, num_partitions).map_batches(
        _verify, batch_format="pyarrow"
    )


def min_label_clusters(
    pairs, num_partitions: int = 8, max_rounds: int = 50, doubling_after: int = 8
):
    """Connected components by distributed min-label propagation.

    pairs: Dataset (a, b).  Returns a Dataset (node, lab) covering every
    endpoint; lab = component minimum after convergence.  Each round is
    one hash join + one groupby-min over label rows (thin int64 pairs);
    rounds = O(component diameter).  Convergence check: sum(lab) is
    strictly decreasing until fixed point, so an unchanged sum terminates.

    Long duplicate CHAINS (diameter >> rounds) are common in near-dup
    corpora, so after `doubling_after` plain rounds each round also adds
    the label-of-label hop (pointer doubling: lab <- lab[lab]), making the
    remaining rounds O(log diameter) at the price of one extra thin join —
    paid only by inputs that actually have deep components.  If the loop
    still exhausts `max_rounds` without the sum fixpoint, it RAISES rather
    than silently returning wrong labels (and with doubling that needs
    diameter > 2^(max_rounds - doubling_after), i.e. never)."""

    def _ends(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([_i64(t["a"]), _i64(t["b"])]))
        return pa.table({"node": pa.array(ids, pa.int64())})

    def _sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(np.concatenate([_i64(t["a"]), _i64(t["b"])]), pa.int64()),
                "dst": pa.array(np.concatenate([_i64(t["b"]), _i64(t["a"])]), pa.int64()),
            }
        )

    edges = _nonempty(pairs.map_batches(_sym, batch_format="pyarrow"))
    from ..pipelines.relational import distinct_rows

    labels = _nonempty(
        distinct_rows(pairs.map_batches(_ends, batch_format="pyarrow"), "node")
        .map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["node"]}),
            batch_format="pyarrow",
        )
    )
    # projections are explicit map_batches stages: Ray's plan optimizer can
    # drop a select/rename fused across a join+union boundary (observed as
    # "RefBundle with a different schema" warnings + failed round-2 joins)
    def _as_node_lab(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "lab": t["lab"]})

    from ..pipelines.relational import grouped_arrow_aggregate

    prev_sum = None
    for rnd in range(max_rounds):
        nb = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        )
        prop = nb.map_batches(_as_node_lab, batch_format="pyarrow").union(labels)
        if rnd >= doubling_after:
            # pointer doubling: also propose each node's label's label
            right = labels.map_batches(
                lambda t: pa.table({"jkey": t["node"], "lab2": t["lab"]}),
                batch_format="pyarrow",
            )
            ll = labels.join(
                right, join_type="inner", num_partitions=num_partitions,
                on=("lab",), right_on=("jkey",),
            )
            hop = ll.map_batches(
                lambda t: pa.table({"node": t["node"], "lab": t["lab2"]}),
                batch_format="pyarrow",
            )
            prop = prop.union(hop)
        # coarse-bucket Arrow min: node cardinality = every endpoint, so
        # Ray's sort-based per-key aggregate would pay Python cost per
        # node PER ROUND
        labels = _nonempty(
            grouped_arrow_aggregate(
                prop, keys="node", aggs=[("lab", "min")], out_names=["lab"]
            )
        )
        s = labels.sum("lab")
        if s == prev_sum:
            return labels
        prev_sum = s
    raise RuntimeError(
        f"min_label_clusters did not converge in {max_rounds} rounds "
        "(component deeper than 2^(max_rounds - doubling_after)?); "
        "raise max_rounds or lower doubling_after"
    )


def dropped_ids(labels):
    """Labelled nodes that are NOT their component representative."""

    def _f(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["lab"])
        return pa.table({"doc_id": t.filter(keep)["node"]})

    return labels.map_batches(_f, batch_format="pyarrow")


def _keep_ids_anti(ds, dropped, num_partitions: int = 8):
    """doc_id Dataset minus dropped ids — distributed anti-join."""
    left = ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"]}), batch_format="pyarrow"
    )
    return left.join(
        _nonempty(dropped), join_type="left_anti", num_partitions=num_partitions,
        on=("doc_id",),
    )


def _clusters_from_pairs(pairs: "list[tuple[int, int]]") -> dict:
    """Union-find -> {doc_id: representative}.  ONLY for the small-pairs
    fast path (count checked by the caller); the general path is
    min_label_clusters."""
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


def _keep_ids_broadcast(ds, dropped: set):
    """doc_id Dataset minus a small dropped-id set — broadcast filter, no
    shuffle (the anti-join without its fixed aggregator cost)."""
    drop_arr = pa.array(sorted(dropped), type=pa.int64())

    def _f(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.fill_null(pc.is_in(b["doc_id"], value_set=drop_arr), False))
        return b.filter(keep)

    return ds.select_columns(["doc_id"]).map_batches(
        _f, batch_format="pyarrow", zero_copy_batch=True
    )


# Below this many verified pairs, clustering runs on the driver (union-find
# over thin int64 pairs — a few hundred MB at the threshold) and kept ids
# are a broadcast filter; above it, everything stays distributed
# (min-label propagation + anti-join).  The threshold bounds driver memory
# EXPLICITLY — the structural scale-killer was unbounded take_all, not the
# existence of a small-case fast path.
SMALL_PAIRS_THRESHOLD = 2_000_000


def _dedup_via_pairs(ds, verified_pairs, num_partitions: int = 8):
    """verified (a,b) pairs -> kept doc_ids Dataset (cluster reps = min id;
    non-candidates keep themselves)."""
    verified_pairs = verified_pairs.materialize()
    n_pairs = verified_pairs.count()
    if n_pairs == 0:
        return ds.select_columns(["doc_id"])
    if n_pairs <= SMALL_PAIRS_THRESHOLD:
        rows = verified_pairs.select_columns(["a", "b"]).take_all()
        rep = _clusters_from_pairs([(r["a"], r["b"]) for r in rows])
        dropped = {d for d, r in rep.items() if r != d}
        return _keep_ids_broadcast(ds, dropped)
    labels = min_label_clusters(verified_pairs, num_partitions)
    return _keep_ids_anti(ds, dropped_ids(labels), num_partitions)


def filter_out_ids(
    ds,
    dropped,
    id_col: str = "doc_id",
    num_partitions: int = 8,
    broadcast_limit: int = SMALL_PAIRS_THRESHOLD,
):
    """Rows of `ds` whose `id_col` is NOT in the thin `dropped` Dataset,
    keeping every column.  Dual path, bounded like `_dedup_via_pairs`: a
    dropped set under `broadcast_limit` collects once and broadcasts (no
    shuffle); a larger one stays a distributed left_anti join — no
    unbounded driver `take_all` on either path."""
    dropped = _nonempty(dropped)
    n = dropped.count()
    if n == 0:
        return ds
    if n <= broadcast_limit:
        drop_arr = pa.array(sorted(r[id_col] for r in dropped.take_all()), pa.int64())

        def _f(b: pa.Table) -> pa.Table:
            keep = pc.invert(pc.fill_null(pc.is_in(b[id_col], value_set=drop_arr), False))
            return b.filter(keep)

        return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
    cols = list(ds.schema().names)
    return _join_ready(ds, cols).join(
        _join_ready(dropped, [id_col]),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(id_col,),
    )


def minhash_dedup_ids(
    ds,
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_bucket: int = 64,
    num_partitions: int = 8,
):
    """Near-dup dedup: returns the kept doc_ids (cluster representatives =
    min doc_id; non-candidates keep themselves) as a Dataset."""
    cand = lsh_candidate_pairs(ds, {"shingle_k": shingle_k}, max_bucket)
    ver = verified_jaccard_pairs(ds, cand, threshold, shingle_k, num_partitions)
    return _dedup_via_pairs(ds, ver, num_partitions)


# ---------------------------------------------------------------------------
# SimHash

class SimHashStage:
    """(doc_id, simhash, band buckets) — 64-bit simhash, 4 x 16-bit bands
    (pigeonhole: hamming<=3 implies one identical band).

    Vectorized: md5 once per unique token, bit expansion + per-doc
    np.add.reduceat over the flat token-hash array.
    """

    def __init__(self, seed: int = 11):
        self.shift = np.arange(64, dtype=np.uint64)

    def simhashes(self, texts: "list[str | None]") -> np.ndarray:
        h, offs = _token_hashes_flat(texts)
        counts = np.diff(offs)
        out = np.zeros(len(texts), dtype=np.uint64)
        nz = np.nonzero(counts > 0)[0]
        if len(nz) == 0:
            return out
        bits = ((h[:, None] >> self.shift[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = 2 * bits - 1  # (T, 64)
        sums = np.add.reduceat(contrib, offs[:-1][nz], axis=0)  # (DZ, 64)
        out[nz] = ((sums > 0).astype(np.uint64) << self.shift[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return out

    def simhash(self, text: "str | None") -> int:
        return int(self.simhashes([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _i64(batch["doc_id"])
        sh = self.simhashes(batch["text"].to_pylist())
        D = len(ids)
        bands = np.repeat(np.arange(4, dtype=np.int32), D)
        keys = np.concatenate(
            [(sh >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)]
        )
        return pa.table(
            {
                "band": pa.array(bands),
                "bkey": pa.array(keys.astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "simhash": pa.array(np.tile(sh, 4), pa.uint64()),
            }
        )


def _sim_pairs_block(group: pa.Table, max_hamming: int, max_bucket: int = 256) -> pa.Table:
    """Hamming-verified pairs for every (band, bkey) bucket in a coarse
    group, vectorized (SWAR popcount over all candidate pairs at once)."""
    doc = _i64(group["doc_id"])
    sims = group["simhash"].combine_chunks().to_numpy(zero_copy_only=False)
    band = group["band"].combine_chunks().to_numpy(zero_copy_only=False)
    bkey = group["bkey"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, bkey, band))
    doc, sims, band, bkey = doc[order], sims[order], band[order], bkey[order]
    ai, bi = _run_pair_indices([band, bkey], max_bucket)
    if len(ai) == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    keep = _popcount64(sims[ai] ^ sims[bi]) <= max_hamming
    return pa.table(
        {"a": pa.array(doc[ai[keep]], pa.int64()), "b": pa.array(doc[bi[keep]], pa.int64())}
    )


def simhash_dedup_ids(ds, max_hamming: int = 3, num_partitions: int = 8):
    """Near-dup dedup by SimHash banding; returns kept doc_ids Dataset.
    Hamming verification is exact inside the bucket stage (pigeonhole
    banding has perfect recall at <=3 bits), so pairs go straight to the
    distributed clustering."""
    # pre-built instance -> plain tasks (state = one np.arange(64); see
    # lsh_candidate_pairs for the actor-vs-task rationale)
    buckets = ds.map_batches(SimHashStage(), batch_format="pyarrow")
    coarse = buckets.map_batches(
        lambda t: t.append_column(
            "cb",
            pa.array(
                (
                    (_i64(t["bkey"]).astype(np.uint64) * np.uint64(4) + _i64(t["band"]).astype(np.uint64))
                    % _NUM_COARSE
                ).astype(np.int32)
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from ..pipelines.relational import distinct_rows

    pairs = distinct_rows(
        coarse.groupby("cb").map_groups(
            lambda g: _sim_pairs_block(g, max_hamming), batch_format="pyarrow"
        ),
        ["a", "b"],
    )
    return _dedup_via_pairs(ds, pairs, num_partitions)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via shingle inverted index blocking)

def ngram_jaccard_pairs(
    ds,
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_posting: int = 64,
    num_partitions: int = 8,
):
    """Exact-threshold Jaccard duplicate pairs.  Blocking: PREFIX-FILTERED
    inverted index on shingle hashes (posting lists capped).

    Prefix filter (PPJoin / Bayardo et al., public literature): under any
    global total order on shingles — here ascending hash value — two sets
    with Jaccard >= t must share an element among each one's first
    ``n - ceil(t*n) + 1`` elements (J >= t implies overlap >= ceil(t*n)
    for both sides, and an overlap of that size cannot avoid both
    prefixes).  Indexing ONLY the prefixes keeps recall exact while
    cutting candidates ~(1-t)^2-fold: measured 1.13M -> ~45k pairs at
    sf0.1/t=0.8.  Verification and output are distributed; returns a
    Dataset (a, b, jac)."""

    def explode(batch: pa.Table) -> pa.Table:
        h, offs = _token_hashes_flat(batch["text"].to_pylist())
        sh, sh_off = _shingle_hashes_flat(h, offs, shingle_k)
        doc_of = np.repeat(_i64(batch["doc_id"]), np.diff(sh_off))
        # per-doc shingle dedup, vectorized: sort (doc, shingle), keep firsts
        order = np.lexsort((sh, doc_of))
        d, s = doc_of[order], sh[order]
        first = np.concatenate([[True], (d[1:] != d[:-1]) | (s[1:] != s[:-1])])
        d, s = d[first], s[first]
        # prefix filter: keep the first (n - ceil(t*n) + 1) shingles per
        # doc in ascending-hash order (d,s is already doc-major sorted).
        # The 1e-9 nudge guards the float product from rounding UP past
        # an exact integer (a too-large alpha would shrink the prefix and
        # cost recall; too-small only costs extra candidates).
        boundaries = np.concatenate([[True], d[1:] != d[:-1]])
        starts = np.nonzero(boundaries)[0]
        counts = np.diff(np.concatenate([starts, [len(d)]]))
        alpha = np.ceil(threshold * counts - 1e-9).astype(np.int64)
        plen = counts - alpha + 1
        pos = np.arange(len(d), dtype=np.int64) - np.repeat(starts, counts)
        keep = pos < np.repeat(plen, counts)
        return pa.table(
            {
                "sh": pa.array(s[keep], pa.uint64()),
                "doc_id": pa.array(d[keep], pa.int64()),
            }
        )

    inv = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    coarse = inv.map_batches(
        lambda t: t.append_column(
            "cb", pa.array((_i64(t["sh"]).astype(np.uint64) % _NUM_COARSE).astype(np.int32))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from ..pipelines.relational import distinct_rows

    pairs = distinct_rows(
        coarse.groupby("cb").map_groups(
            lambda g: _bucket_pairs_block(g, ["sh"], max_posting), batch_format="pyarrow"
        ),
        ["a", "b"],
    )
    return verified_jaccard_pairs(ds, pairs, threshold, shingle_k, num_partitions)


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def embedding_near_dup_pairs(
    ds, threshold: float = 0.95, n_planes: int = 12, seed: int = 5, max_bucket: int = 64
):
    """Near-dup (vec_id, vec_id) pairs with cosine >= threshold.

    Scale path: random-hyperplane LSH buckets (sign bits) keep comparisons
    within buckets; a second rotated bucketing catches near-boundary
    pairs.  Planes are derived deterministically from (seed, dim) INSIDE
    each task — no driver-side `take(1)` schema sniff, no broadcast.
    Vectors shuffle as their ORIGINAL float32 bytes (exact — f32 -> f64
    widening is lossless), normalized in float64 only inside the bucket
    stage: half the exchange volume of shipping normalized doubles.

    Buckets are COARSE-GROUPED (one shuffle co-locates ~buckets/512 per
    group like minhash/simhash) and CAPPED at `max_bucket` rows (lowest
    ids kept, same rule as `_bucket_pairs_block`): a degenerate bucket —
    thousands of near-identical embeddings — costs O(max_bucket^2) pairs,
    not O(b^2), and tiny buckets never pay a per-group Python dispatch.
    Pair cosines are one einsum over the coarse group's candidate pairs,
    not a matmul per bucket."""
    from .similarity import _emb_matrix

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch)  # float64 for the plane projections
        dim = emb.shape[1]
        rng = np.random.default_rng(seed)  # same (seed, dim) in every task
        planes = [rng.standard_normal((dim, n_planes)) for _ in range(2)]
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        nemb = emb / np.maximum(norms, 1e-12)
        ids = _i64(batch["vec_id"])
        n = len(ids)
        keys = np.concatenate(
            [((nemb @ P) > 0) @ (1 << np.arange(n_planes)) for P in planes]
        )
        flat = np.tile(emb.astype(np.float32).reshape(-1), 2)
        vec = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), dim)
        rot = np.repeat(np.arange(2, dtype=np.int32), n)
        cb = (
            (keys.astype(np.uint64) + rot.astype(np.uint64) * np.uint64(0x9E3779B9))
            % _NUM_COARSE
        ).astype(np.int32)
        return pa.table(
            {
                "rot": pa.array(rot),
                "bkey": pa.array(keys, pa.int64()),
                "cb": pa.array(cb),
                "vec_id": pa.array(np.tile(ids, 2), pa.int64()),
                "vec": vec,
            }
        )

    def coarse_cosine_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = _i64(group["vec_id"])
        if len(ids) < 2:
            return empty
        rot = group["rot"].combine_chunks().to_numpy(zero_copy_only=False)
        bkey = _i64(group["bkey"])
        col = group["vec"].combine_chunks()
        dim = col.type.list_size
        emb = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(ids), dim)
        )
        order = np.lexsort((ids, bkey, rot))
        ids, rot, bkey, emb = ids[order], rot[order], bkey[order], emb[order]
        ai, bi = _run_pair_indices([rot, bkey], max_bucket)
        if len(ai) == 0:
            return empty
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = np.einsum("ij,ij->i", emb[ai], emb[bi])
        keep = sims >= threshold
        return pa.table(
            {
                "a": pa.array(ids[ai[keep]], pa.int64()),
                "b": pa.array(ids[bi[keep]], pa.int64()),
            }
        )

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = buckets.groupby("cb").map_groups(coarse_cosine_pairs, batch_format="pyarrow")
    from ..pipelines.relational import distinct_rows

    return distinct_rows(pairs, ["a", "b"])


# ---------------------------------------------------------------------------
# incremental exact dedup against persistent seen-corpus state


def _incremental_dedup_part(g: pa.Table, *, state_dir: str, batch_token: str) -> pa.Table:
    """Per-partition step of exact_dedup_incremental (map_groups body):
    owns ONE hash partition end-to-end — read its seen-state slice, drop
    batch rows whose content hash was ever seen, commit the new uniques.

    State layout is LSM-ish: `part=NNN/seen-<batch_token>.parquet` run
    files of (h1, h2, doc_id) rows; a commit APPENDS one file (O(new
    uniques), temp + os.replace — crash-safe), so per-batch write cost
    never grows with corpus history; reads merge the runs (bounded by
    batches-per-partition).  The run-file name carries the BATCH token
    and the anti-join EXCLUDES this batch's own file, so a Ray task
    retry (or a re-consumed/lineage-reconstructed Dataset) recomputes
    the identical kept set and rewrites the same file — idempotent,
    never self-shadowing."""
    import os

    import pyarrow.parquet as pq

    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, f"part={part:05d}")
    os.makedirs(pdir, exist_ok=True)
    # within-batch first-seen: min doc_id per (h1, h2)
    cand = (
        g.select(["h1", "h2", "doc_id"])
        .group_by(["h1", "h2"])
        .aggregate([("doc_id", "min")])
        .rename_columns(["h1", "h2", "doc_id"])
    )
    own = f"seen-{batch_token}.parquet"
    files = sorted(
        os.path.join(pdir, f)
        for f in os.listdir(pdir)
        if f.endswith(".parquet") and f != own
    )
    if files:
        seen = pa.concat_tables(pq.read_table(f, columns=["h1", "h2"]) for f in files)
        cand = cand.join(seen, keys=["h1", "h2"], join_type="left anti")
    if cand.num_rows:
        tmp = os.path.join(pdir, f".tmp-{batch_token}")
        pq.write_table(cand, tmp)
        os.replace(tmp, os.path.join(pdir, own))
    return pa.table({"doc_id": cand["doc_id"].combine_chunks().cast(pa.int64())})


def _check_dedup_state_format(state_dir: str, num_parts: int) -> None:
    """Pin the persisted hash-partition layout (the CDC _FORMAT.json rule
    applied here): a changed num_parts would route a seen hash to a
    different partition and silently keep its duplicates."""
    import json
    import os

    marker = os.path.join(state_dir, "_FORMAT.json")
    want = {"hash": "polars-ahash:51AB/D00D", "num_parts": num_parts}
    if os.path.exists(marker):
        with open(marker) as f:
            got = json.load(f)
        if got != want:
            raise ValueError(
                f"dedup state at {state_dir} was written with {got}, this call "
                f"uses {want}; partition routing would not match existing "
                "state — re-bootstrap into a fresh state_dir"
            )
    else:
        os.makedirs(state_dir, exist_ok=True)
        from ..util import atomic_write_json

        atomic_write_json(marker, want)


def exact_dedup_incremental(ds_new, state_dir: str, col: str = "text",
                            num_parts: int = 16, batch_token: "str | None" = None):
    """Exact-dedup a NEW batch against the ENTIRE seen corpus without
    re-reading it: 128-bit content hashes route to hash partitions (thin
    shuffle — bodies never move), each partition task anti-joins its
    bounded state slice and appends the new uniques.  First-seen wins
    across batches; returns the batch's KEPT doc_ids.  The streaming-
    ingest sibling of exact_dedup_ids (which is one-shot over a full
    corpus); at 10^10 docs the state is just the hash triples, hash-
    partitioned, with O(new) writes per batch.

    `batch_token` names this batch's state commit (default: a fresh
    token per call): per-partition tasks exclude their OWN run file from
    the anti-join, so retries and re-consumption of the returned Dataset
    are idempotent.  Pass a stable token (e.g. derived from the input
    file list, like cdc.compute_run_id) to make whole-batch REPLAYS
    no-ops that return the same kept set."""
    from ..util import new_token

    if num_parts & (num_parts - 1):
        raise ValueError("num_parts must be a power of two")
    _check_dedup_state_format(state_dir, num_parts)
    batch_token = batch_token or new_token()
    # runtime import: dedup_incremental imports this module (no cycle at load)
    from .dedup_incremental import check_token_not_folded

    check_token_not_folded(state_dir, batch_token)
    thin = ds_new.map_batches(
        lambda b: content_hash_batch(b, col), batch_format="pyarrow", zero_copy_batch=True
    )

    def tag(t: pa.Table) -> pa.Table:
        # h1 is already a uniform hash: mask directly for the partition id
        p = pc.cast(pc.bit_wise_and(t["h1"], num_parts - 1), pa.int32())
        return t.append_column("_part", p)

    from functools import partial

    return (
        thin.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(
            partial(
                _incremental_dedup_part, state_dir=state_dir, batch_token=batch_token
            ),
            batch_format="pyarrow",
        )
    )


def _semantic_block(g: pa.Table, thr_u2: int) -> pa.Table:
    """Within-cluster L2 near-dup components over one kmeans cluster:
    exact int64 micro-unit distances (d2 = |a|^2 + |b|^2 - 2ab via one
    matmul), then min-label propagation to a fixpoint.  Quadratic in the
    CLUSTER, not the corpus — k is the knob that bounds it (SemDeDup
    runs k ~ n/target_cluster_size)."""
    from .similarity import _emb_matrix, _u6

    if "cluster" in g.column_names and g.num_rows:
        cl = int(g["cluster"][0].as_py())
    else:
        cl = -1
    if g.num_rows == 0:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "rep": pa.array([], pa.int64()),
            }
        )
    ids = _i64(g["vec_id"])
    xu = _u6(_emb_matrix(g))
    n = len(ids)
    sq = np.einsum("nd,nd->n", xu, xu)
    d2 = sq[:, None] + sq[None, :] - 2 * (xu @ xu.T)
    adj = d2 <= thr_u2
    np.fill_diagonal(adj, False)
    labels = ids.copy()
    # min-label propagation: dup components are tiny (near-identical
    # vectors), so this converges in O(component diameter) rounds
    big = np.iinfo(np.int64).max
    while True:
        nb = np.where(adj, labels[None, :], big).min(axis=1)
        new = np.minimum(labels, nb)
        if np.array_equal(new, labels):
            break
        labels = new
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "cluster": pa.array(np.full(n, cl, np.int64)),
            "rep": pa.array(labels),
        }
    )


def semantic_dedup(ds, k: int = 4, iters: int = 2, thr_u2: int = 10**11):
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means-cluster the
    embeddings, then find near-duplicate components WITHIN each cluster
    and assign every vector its component's min-id representative
    (rep == vec_id -> the copy to keep).

    Determinism/exactness: the integer-exact `kmeans_fit` centroids
    (micro-unit int64, trunc-div updates, ties to the lowest cluster)
    and integer squared L2 against `thr_u2` (micro-units^2) make the
    whole pipeline bit-reproducible in SQL.

    Scale shape: kmeans partials stream (k*(d+2) rows/batch); the only
    shuffle is the cluster groupby, and the within-cluster quadratic is
    bounded by cluster size — scale k with corpus size to keep clusters
    at the target (the published recipe: ~50k clusters for LAION-scale).
    Output is O(n) thin rows (vec_id, cluster, rep).
    """
    from .similarity import _emb_matrix, _u6, kmeans_fit

    cent_u = kmeans_fit(ds, k=k, iters=iters)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("cluster", pa.array([], pa.int64()))
        xu = _u6(_emb_matrix(t))
        n = xu.shape[0]
        d2 = np.empty((n, cent_u.shape[0]), np.int64)
        for j in range(cent_u.shape[0]):
            diff = xu - cent_u[j]
            d2[:, j] = np.einsum("nd,nd->n", diff, diff)
        # argmin ties break to the lowest cluster (oracle: ORDER BY d2, cluster)
        a = d2.argmin(axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(a))

    from functools import partial

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(partial(_semantic_block, thr_u2=thr_u2), batch_format="pyarrow")
    )
