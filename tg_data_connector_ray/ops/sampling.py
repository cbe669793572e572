"""Deterministic sampling / dataset-split operators.

A 100 TB training-data pipeline needs reproducible, data-independent
splits and samples: membership must be a pure function of the row key (so
re-runs, backfills and incremental arrivals land in the same split), never
of arrival order or RNG state.  Both operators key off md5 (process- and
engine-stable) so a DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_DENOM = 10_000


def _key_buckets(ids, salt: str) -> np.ndarray:
    """Bucket in [0, 10000) per id: big-endian uint32 of md5(f"{salt}:{id}")
    's first 4 bytes, mod 10000.  Per-row C hashing (hashlib) — the cost
    is ~0.5 us/row, far below the read that feeds it."""
    out = np.empty(len(ids), dtype=np.int64)
    pre = f"{salt}:".encode()
    for i, v in enumerate(ids):
        d = hashlib.md5(pre + str(v).encode()).digest()
        out[i] = int.from_bytes(d[:4], "big") % _DENOM
    return out


def hash_split_batch(
    batch: pa.Table,
    col: str = "doc_id",
    splits: "tuple[tuple[str, float], ...]" = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> pa.Table:
    """Adds a `split` column: deterministic assignment by hashed key
    against cumulative ratio thresholds (in 1/10000ths)."""
    b = _key_buckets(batch[col].to_pylist(), salt)
    names = [s[0] for s in splits]
    bounds = np.cumsum([round(s[1] * _DENOM) for s in splits])
    idx = np.searchsorted(bounds, b, side="right")
    idx = np.minimum(idx, len(names) - 1)  # rounding guard
    lab = np.array(names, dtype=object)[idx]
    return batch.append_column("split", pa.array(lab, pa.string()))


def hash_sample_batch(
    batch: pa.Table, col: str = "doc_id", fraction: float = 0.1, salt: str = "sample"
) -> pa.Table:
    """Deterministic ~`fraction` sample: keep rows whose hashed key falls
    below fraction * 10000."""
    b = _key_buckets(batch[col].to_pylist(), salt)
    keep = b < round(fraction * _DENOM)
    return batch.filter(pa.array(keep))


def mix_to_budget(ds_docs, budget_chars: int, source_col: str = "source",
                  size_col: str = "n_chars", id_col: str = "doc_id",
                  salt: str = "mix"):
    """Balanced multi-source corpus mixing at a size budget — the
    "sample each source at a rate that hits the target mix" step every
    training-data pipeline runs before tokenization.

    Pass 1 aggregates per-source totals (sources are low-cardinality:
    per-batch partials, tiny driver merge); each source's keep threshold
    is then PURE INTEGER math — ``thr = min(10000, (budget //
    n_sources) * 10000 // source_total)`` — so a SQL oracle reproduces
    the exact kept set.  Pass 2 streams, keeping rows whose deterministic
    md5 bucket falls under their source's threshold: expected kept chars
    per source ~= min(budget / n_sources, available), membership is a
    pure key function (stable across re-runs/backfills), and no shuffle
    happens anywhere."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([source_col, size_col])
            .group_by(source_col)
            .aggregate([(size_col, "sum")])
        )
        return g.rename_columns([source_col, "total"])

    parts = ds_docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).to_pandas()
    totals = parts.groupby(source_col)["total"].sum()
    target = int(budget_chars) // max(1, len(totals))
    thr = {
        s: min(_DENOM, (target * _DENOM) // int(tot)) if int(tot) > 0 else _DENOM
        for s, tot in totals.items()
    }

    def keep(t: pa.Table) -> pa.Table:
        b = _key_buckets(t[id_col].to_pylist(), salt)
        th = np.array([thr.get(s, _DENOM) for s in t[source_col].to_pylist()])
        out = t.filter(pa.array(b < th))
        return pa.table(
            {
                id_col: out[id_col],
                source_col: out[source_col],
                size_col: pc.cast(out[size_col], pa.int64()),
            }
        )

    return ds_docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def leakage_safe_split(
    docs,
    threshold: float = 0.8,
    shingle_k: int = 3,
    splits: "tuple[tuple[str, float], ...]" = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split",
    num_partitions: int = 8,
    broadcast_limit: "int | None" = None,
):
    """Cluster-coherent train/val/test split — the leakage-safe variant of
    `hash_split_batch`: near-duplicate documents always land in the SAME
    split, because the split key is the near-dup component REPRESENTATIVE
    (min doc_id), not the doc itself.  Plain per-doc hash splitting leaks
    near-copies of held-out documents into train on any corpus with
    duplication — the train/eval-overlap effect Lee et al. 2022
    (arXiv:2107.06499, §6) measure; keying the split by the component
    closes it while keeping membership a pure key function (re-runs and
    backfills land identically).

    Pipeline: MinHash-LSH candidates -> exact shingle-Jaccard verify at
    `threshold` -> distributed min-label connected components — exactly
    `minhash_dedup_ids`'s machinery (thin int64 edges, bounded buckets,
    no driver union-find); then rep = coalesce(component label, doc_id)
    and the standard md5 split bucket on `rep`.

    100-TB shape: the label map covers only docs that sit in some
    component (the duplicated subset, corpus-dependent); it broadcasts as
    sorted arrays inside an instance-shipped stage when under
    `broadcast_limit` rows and falls back to a distributed left hash_join
    otherwise — the `filter_out_ids` dual-path bound.  Output:
    (doc_id, rep, split).
    """
    from .dedup import (
        SMALL_PAIRS_THRESHOLD,
        _clusters_from_pairs,
        _i64,
        _nonempty,
        lsh_candidate_pairs,
        min_label_clusters,
        verified_jaccard_pairs,
    )

    if broadcast_limit is None:
        broadcast_limit = SMALL_PAIRS_THRESHOLD

    cand = lsh_candidate_pairs(docs, {"shingle_k": shingle_k})
    ver = verified_jaccard_pairs(docs, cand, threshold, shingle_k, num_partitions)
    thin = docs.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True
    )

    def _split_by_rep(ids: np.ndarray, rep: np.ndarray) -> pa.Table:
        out = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "rep": pa.array(rep, pa.int64())}
        )
        return hash_split_batch(out, col="rep", splits=splits, salt=salt)

    ver = _nonempty(ver).materialize()
    n_pairs = ver.count()
    if n_pairs == 0:
        return thin.map_batches(
            lambda t: _split_by_rep(_i64(t["doc_id"]), _i64(t["doc_id"])),
            batch_format="pyarrow",
        )
    if n_pairs <= broadcast_limit:
        # small verified-pair set: driver union-find (the _dedup_via_pairs
        # fast path) — skips the iterative label-propagation rounds
        rows = ver.select_columns(["a", "b"]).take_all()
        rep_map = _clusters_from_pairs([(r["a"], r["b"]) for r in rows])
        nodes = np.fromiter(rep_map.keys(), np.int64, count=len(rep_map))
        labs = np.fromiter(rep_map.values(), np.int64, count=len(rep_map))
        order = np.argsort(nodes)
        stage = _RepSplit(nodes[order], labs[order], _split_by_rep)
        return thin.map_batches(stage, batch_format="pyarrow")
    labels = _nonempty(min_label_clusters(ver, num_partitions))

    if labels.count() <= broadcast_limit:
        rows = labels.take_all()
        nodes = np.fromiter((r["node"] for r in rows), np.int64, count=len(rows))
        labs = np.fromiter((r["lab"] for r in rows), np.int64, count=len(rows))
        order = np.argsort(nodes)
        stage = _RepSplit(nodes[order], labs[order], _split_by_rep)
        return thin.map_batches(stage, batch_format="pyarrow")

    from ..pipelines.relational import hash_join

    lab2 = labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "lab": t["lab"]}),
        batch_format="pyarrow",
    )
    joined = hash_join(thin, lab2, on="doc_id", how="left", right_unique=True)

    def _fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = _i64(t["doc_id"])
        rep = _i64(pc.coalesce(t["lab"], t["doc_id"]))
        return _split_by_rep(ids, rep)

    return joined.map_batches(_fin, batch_format="pyarrow")


class _RepSplit:
    """Instance-shipped rep-lookup split stage: the sorted (node -> lab)
    map rides the closure (object-store cached once per node); per batch
    one searchsorted gather, unmatched docs key by themselves."""

    def __init__(self, nodes: np.ndarray, labs: np.ndarray, finish):
        self.nodes = nodes
        self.labs = labs
        self.finish = finish

    def __call__(self, t: pa.Table) -> pa.Table:
        from .dedup import _i64

        ids = _i64(t["doc_id"])
        if len(self.nodes):
            pos = np.minimum(
                np.searchsorted(self.nodes, ids), len(self.nodes) - 1
            )
            rep = np.where(self.nodes[pos] == ids, self.labs[pos], ids)
        else:
            rep = ids
        return self.finish(ids, rep)
