"""Streaming near-dup dedup: MinHash+LSH against a PERSISTENT seen-corpus
index — the incremental sibling of `dedup.minhash_dedup_ids` (one-shot),
and the near-dup sibling of `dedup.exact_dedup_incremental`.

A continuous-ingest pipeline (the engine's core regime) cannot re-run
batch dedup over 10^10 documents per micro-batch.  This operator makes
each batch pay O(batch + candidates): the seen corpus lives on disk as
two hash-partitioned LSM-ish run-file tables, and a new batch touches
only the partitions its own hashes route to.

State layout under `state_dir` (both tables append one run file per
batch — O(new docs) write cost regardless of corpus history; reads merge
the runs, bounded by batches-per-partition; `_FORMAT.json` pins the
signature/partition parameters exactly like the CDC state marker):

    bands/part=NNN/run-<token>.parquet   (band:int32, bh:uint64, doc_id)
        partitioned by bh & (num_parts-1) — an LSH bucket (band, bh)
        lives wholly in one partition, so candidate generation is a
        per-partition merge of state rows + the batch's rows.
    grams/part=NNN/run-<token>.parquet   (doc_id, grams:binary)
        partitioned by mix64(doc_id) & (num_parts-1) — the sorted-unique
        shingle sets exact verification needs (little-endian uint64
        bytes: Arrow hash joins carry binary payloads but not list
        columns), fetched only for the bounded candidate ids.

Per-batch semantics (two-phase == the oracle's two CC passes):
connected components over VERIFIED pairs that involve >= 1 new doc;
a component containing ANY seen doc drops all its new members (the
canonical copy already lives in the corpus); a new-only component keeps
its min doc_id.  State accumulates EVERY new doc — kept and dropped —
because a future doc near-duplicate of a dropped doc is still a
duplicate (matching global-CC behavior through dropped bridges).

Exactly-once: run files are named by `batch_token` and excluded from
their own batch's reads, so Ray task retries and whole-call replays with
the same token recompute the identical kept set (the
`exact_dedup_incremental` protocol).

Scale notes: only thin band rows and bounded candidate gram sets move;
document text never enters this pipeline after signature prep.  The
`max_bucket` cap bounds quadratic bucket blowup exactly as in the batch
operator.  Reference near-dup context: SURVEY.md LLM-ops table; the
batch operator's design notes in ops/dedup.py:1-30.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import (
    SMALL_PAIRS_THRESHOLD,
    SMALL_VERIFY_DOCS,
    SMALL_VERIFY_PAIRS,
    MinHasher,
    _clusters_from_pairs,
    _join_ready,
    _i64,
    _jaccard_sorted,
    _mix64,
    _nonempty,
    _run_pair_indices,
    _shingle_hashes_flat,
    _token_hashes_flat,
    dropped_ids,
    min_label_clusters,
)

SEEN_LABEL = -1  # all seen endpoints collapse to one node: components are
# only ever merged ACROSS seen docs by this, and every such component's
# decision ("contains a seen doc -> drop all new members") is identical
# for the merged and unmerged graphs, so the collapse is loss-free and
# keeps the label graph bounded by the batch's candidates.


def _check_state_format(state_dir: str, params: dict) -> None:
    """Pin signature + partition parameters per state_dir (the CDC
    _FORMAT.json rule): a changed shingle_k/num_perm/seed would make old
    signatures incomparable; a changed num_parts would mis-route."""
    import json

    from ..util import atomic_write_json

    marker = os.path.join(state_dir, "_FORMAT.json")
    if os.path.exists(marker):
        with open(marker) as f:
            got = json.load(f)
        if got != params:
            raise ValueError(
                f"minhash state at {state_dir} was written with {got}, this "
                f"call uses {params}; signatures/routing would not match — "
                "re-bootstrap into a fresh state_dir"
            )
    else:
        os.makedirs(state_dir, exist_ok=True)
        atomic_write_json(marker, params)


def _unique_gram_bins(sh: np.ndarray, sh_off: np.ndarray) -> pa.Array:
    """Flat shingle hashes + offsets -> per-doc SORTED-UNIQUE gram sets as
    a BINARY array (little-endian uint64 bytes), fully vectorized (one
    lexsort + adjacent-dup mask, no per-doc loop).  Binary, not
    list<uint64>: Arrow hash joins refuse list payload columns."""
    D = len(sh_off) - 1
    doc = np.repeat(np.arange(D, dtype=np.int64), np.diff(sh_off))
    order = np.lexsort((sh, doc))
    d, g = doc[order], sh[order]
    keep = np.ones(len(g), dtype=bool)
    if len(g):
        keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
    d, g = d[keep], g[keep]
    g = np.ascontiguousarray(g.astype("<u8"))
    counts = np.bincount(d, minlength=D)
    byte_offsets = np.concatenate([[0], np.cumsum(counts) * 8]).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        D,
        [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(g.tobytes())],
    )


class _PrepStage:
    """One vectorized pass per batch: (doc_id, grams, band rows).

    Emits the per-doc EXPLODED band rows (band, bh, doc_id) alongside a
    parallel grams list column replicated per band row?  No — two
    consumers need different shapes, so this emits the compact per-doc
    table (doc_id, grams, bands:list<uint64>); cheap downstream maps
    explode bands and project grams."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int, seed: int = 7):
        self.h = MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _i64(batch["doc_id"])
        texts = batch["text"].to_pylist()
        th, offs = _token_hashes_flat(texts)
        sh, sh_off = _shingle_hashes_flat(th, offs, self.h.k)
        grams = _unique_gram_bins(sh, sh_off)
        vals = _mix64(sh[None, :] ^ self.h.c[:, None])  # (P, S)
        sig = np.minimum.reduceat(vals, sh_off[:-1], axis=1)  # (P, D)
        bh = self.h.band_hashes(sig)  # (bands, D)
        D = len(ids)
        boff = np.arange(0, (D + 1) * self.h.bands, self.h.bands)
        bands_col = pa.ListArray.from_arrays(
            pa.array(boff, pa.int32()),
            pa.array(np.ascontiguousarray(bh.T).reshape(-1), pa.uint64()),
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "grams": grams, "bands": bands_col}
        )


def _explode_bands(t: pa.Table, num_parts: int) -> pa.Table:
    ids = _i64(t["doc_id"])
    lst = t["bands"].combine_chunks()
    bands_per_doc = np.diff(lst.offsets.to_numpy())
    bh = lst.values.to_numpy(zero_copy_only=False).astype(np.uint64)
    band_idx = np.concatenate(
        [np.arange(n, dtype=np.int32) for n in bands_per_doc]
    ) if len(ids) else np.empty(0, np.int32)
    return pa.table(
        {
            "band": pa.array(band_idx, pa.int32()),
            "bh": pa.array(bh, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, bands_per_doc), pa.int64()),
            "_part": pa.array(
                (bh & np.uint64(num_parts - 1)).astype(np.int32), pa.int32()
            ),
        }
    )


def _read_runs(pdir: str, exclude_token: str) -> "pa.Table | None":
    import pyarrow.parquet as pq

    if not os.path.isdir(pdir):
        return None
    own = f"run-{exclude_token}.parquet"
    files = sorted(
        os.path.join(pdir, f)
        for f in os.listdir(pdir)
        if f.startswith("run-") and f.endswith(".parquet") and f != own
    )
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def _commit_run(pdir: str, token: str, table: pa.Table) -> None:
    """Idempotent append: temp + os.replace keyed by the batch token —
    a retry rewrites the same file with the same content."""
    import pyarrow.parquet as pq

    os.makedirs(pdir, exist_ok=True)
    final = os.path.join(pdir, f"run-{token}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)


def _band_part(
    g: pa.Table, *, state_dir: str, token: str, max_bucket: int
) -> pa.Table:
    """Per-partition candidate step: merge this partition's seen band
    rows with the batch's, emit bucket pairs involving >= 1 new doc, and
    commit the batch's rows as this partition's next run file."""
    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "bands", f"part={part:05d}")
    new = g.select(["band", "bh", "doc_id"])
    seen = _read_runs(pdir, token)
    _commit_run(pdir, token, new)

    n_new, n_seen = new.num_rows, (seen.num_rows if seen is not None else 0)
    band = np.concatenate(
        [
            _i64(new["band"]),
            _i64(seen["band"]) if n_seen else np.empty(0, np.int64),
        ]
    )
    bh = np.concatenate(
        [
            new["bh"].combine_chunks().to_numpy(zero_copy_only=False),
            seen["bh"].combine_chunks().to_numpy(zero_copy_only=False)
            if n_seen
            else np.empty(0, np.uint64),
        ]
    )
    doc = np.concatenate(
        [_i64(new["doc_id"]), _i64(seen["doc_id"]) if n_seen else np.empty(0, np.int64)]
    )
    is_new = np.zeros(n_new + n_seen, dtype=bool)
    is_new[:n_new] = True

    # NEW rows sort FIRST within each bucket: the max_bucket cap keeps a
    # run's leading rows, and a cap that filled up with history would
    # otherwise starve every future doc routed to a hot bucket (its
    # duplicates would be kept forever) — new-first guarantees this
    # batch's rows always participate, and seen rows fill the remainder
    order = np.lexsort((doc, (~is_new).astype(np.int8), bh, band))
    band, bh, doc, is_new = band[order], bh[order], doc[order], is_new[order]
    ai, bi = _run_pair_indices([band, bh], max_bucket)
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            # int32 1/0, not bool: these ride through distinct/groupby key
            # hashing, which is integer-typed
            "a_new": pa.array([], pa.int32()),
            "b_new": pa.array([], pa.int32()),
        }
    )
    if len(ai) == 0:
        return empty
    keep = is_new[ai] | is_new[bi]  # seen-seen pairs are not this batch's business
    ai, bi = ai[keep], bi[keep]
    if len(ai) == 0:
        return empty
    a, b = doc[ai], doc[bi]
    an, bn = is_new[ai], is_new[bi]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    an2 = np.where(swap, bn, an)
    bn2 = np.where(swap, an, bn)
    keep2 = a2 != b2  # same doc sharing a bucket with itself via two batches
    return pa.table(
        {
            "a": pa.array(a2[keep2], pa.int64()),
            "b": pa.array(b2[keep2], pa.int64()),
            "a_new": pa.array(an2[keep2].astype(np.int32), pa.int32()),
            "b_new": pa.array(bn2[keep2].astype(np.int32), pa.int32()),
        }
    )


def _grams_part(g: pa.Table, *, state_dir: str, token: str) -> pa.Table:
    """Fetch the grams of this partition's requested SEEN ids."""
    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "grams", f"part={part:05d}")
    seen = _read_runs(pdir, token)
    if seen is None:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "grams": pa.array([], pa.binary()),
            }
        )
    return seen.filter(pc.is_in(seen["doc_id"], value_set=g["doc_id"].combine_chunks()))


def _grams_commit_part(g: pa.Table, *, state_dir: str, token: str) -> pa.Table:
    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "grams", f"part={part:05d}")
    _commit_run(pdir, token, g.select(["doc_id", "grams"]))
    return pa.table({"n": pa.array([g.num_rows], pa.int64())})


def _verify_grams(t: pa.Table, threshold: float) -> pa.Table:
    """Exact Jaccard over attached sorted-unique gram sets (binary-coded
    uint64; np.frombuffer is zero-copy per row)."""
    ga = t["grams_a"].to_pylist()
    gb = t["grams_b"].to_pylist()
    n = t.num_rows
    jac = np.fromiter(
        (
            _jaccard_sorted(
                np.frombuffer(ga[i], dtype="<u8"), np.frombuffer(gb[i], dtype="<u8")
            )
            for i in range(n)
        ),
        dtype=np.float64,
        count=n,
    )
    keep = jac >= threshold
    return t.select(["a", "b", "a_new", "b_new"]).filter(pa.array(keep))


def _broadcast_keep(ids_ds, dropped: set, id_col: str):
    """ids minus a SMALL driver-side dropped set — broadcast filter."""
    if not dropped:
        return ids_ds
    drop_arr = pa.array(sorted(dropped), pa.int64())

    def _f(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.fill_null(pc.is_in(b[id_col], value_set=drop_arr), False))
        return b.filter(keep)

    return ids_ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def _edges_collapsed(rows) -> list:
    """Verified pair rows -> union-find edges with seen endpoints
    collapsed to SEEN_LABEL."""
    return [
        (r["a"] if r["a_new"] else SEEN_LABEL, r["b"] if r["b_new"] else SEEN_LABEL)
        for r in rows
    ]


def _finish_from_edges(edges, ids_ds, id_col: str):
    rep = _clusters_from_pairs(edges)
    dropped = {d for d, rp in rep.items() if rp != d and d != SEEN_LABEL}
    return _broadcast_keep(ids_ds, dropped, id_col)


def _decide_kept(ver, ids_ds, id_col: str = "doc_id", num_partitions: int = 8):
    """The ONE two-phase decision endgame shared by every streaming-dedup
    mode: over VERIFIED (a, b, a_new, b_new) pairs, collapse seen
    endpoints to SEEN_LABEL, take connected components, drop every new id
    that is not its component representative (a seen-containing component
    has rep SEEN_LABEL < 0, so all its new members drop).  Driver
    union-find + broadcast filter under SMALL_PAIRS_THRESHOLD; min-label
    propagation + the shared bounded anti-join above it."""
    n_ver = ver.count()
    if n_ver == 0:
        return ids_ds
    if n_ver <= SMALL_PAIRS_THRESHOLD:
        rows = ver.select_columns(["a", "b", "a_new", "b_new"]).take_all()
        return _finish_from_edges(_edges_collapsed(rows), ids_ds, id_col)

    def _collapse(t: pa.Table) -> pa.Table:
        a = np.where(_i64(t["a_new"]) != 0, _i64(t["a"]), SEEN_LABEL)
        b = np.where(_i64(t["b_new"]) != 0, _i64(t["b"]), SEEN_LABEL)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    labels = min_label_clusters(
        _nonempty(ver.map_batches(_collapse, batch_format="pyarrow")),
        num_partitions=num_partitions,
    )
    from .dedup import filter_out_ids

    dropped = dropped_ids(labels).map_batches(
        lambda t: pa.table({id_col: t["doc_id"]}), batch_format="pyarrow"
    )
    return filter_out_ids(ids_ds, dropped, id_col=id_col, num_partitions=num_partitions)


def _tag_part_by_doc(t: pa.Table, num_parts: int) -> pa.Table:
    p = (_mix64(_i64(t["doc_id"]).view(np.uint64)) & np.uint64(num_parts - 1)).astype(
        np.int32
    )
    return t.append_column("_part", pa.array(p, pa.int32()))


def _ingest_candidates(
    ds_new,
    state_dir: str,
    token: str,
    *,
    num_perm: int,
    bands: int,
    shingle_k: int,
    num_parts: int,
    max_bucket: int,
):
    """Shared ingest front half of the streaming minhash modes (dedup and
    leakage split): signature prep, gram-state then band-state commits,
    distinct candidate pairs involving >= 1 new doc.  Returns
    (prep, cand) — prep is materialized thin rows (doc_id, grams, band
    hashes), cand is a materialized (a, b, a_new, b_new) Dataset."""
    from functools import partial

    prep = ds_new.map_batches(
        _PrepStage(num_perm, bands, shingle_k), batch_format="pyarrow"
    ).materialize()  # bounded: ONE ingest micro-batch (thin: ids + hashes)

    _tag_gram_part = partial(_tag_part_by_doc, num_parts=num_parts)

    # --- gram-state commit FIRST (every new doc, kept or dropped) -------
    # Commit ORDER is a crash-safety invariant: grams land before band
    # rows.  Grams without bands are unreferenced orphans (harmless;
    # overwritten on the token's retry), but bands without grams would
    # make a LATER batch generate candidates whose verification grams
    # don't exist.
    prep.select_columns(["doc_id", "grams"]).map_batches(
        _tag_gram_part, batch_format="pyarrow"
    ).groupby("_part").map_groups(
        partial(_grams_commit_part, state_dir=state_dir, token=token),
        batch_format="pyarrow",
    ).count()  # eager: the commit must happen even when cand is empty

    # --- candidates + band-state commit (one partition exchange) --------
    cand = (
        prep.map_batches(
            partial(_explode_bands, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(
            partial(_band_part, state_dir=state_dir, token=token, max_bucket=max_bucket),
            batch_format="pyarrow",
        )
    )
    from ..pipelines.relational import distinct_rows

    cand = distinct_rows(_nonempty(cand), ["a", "b", "a_new", "b_new"]).materialize()
    return prep, cand


def _verified_pairs(
    prep,
    cand,
    state_dir: str,
    token: str,
    *,
    threshold: float,
    num_parts: int,
    num_partitions: int,
):
    """Exact-Jaccard verification of candidate pairs, IDENTITY-PRESERVING
    (seen endpoints keep their real doc ids — the caller decides whether
    to collapse them).  Returns ("rows", [row dicts]) on the bounded
    driver fast path, ("ds", Dataset[a, b, a_new, b_new]) otherwise."""
    from functools import partial

    from ..pipelines.relational import distinct_rows

    _tag_gram_part = partial(_tag_part_by_doc, num_parts=num_parts)
    n_cand = cand.count()
    if n_cand <= SMALL_VERIFY_PAIRS:
        # bounded driver fast path (the verified_jaccard_pairs SMALL
        # protocol): thin pairs fit the driver; candidate gram sets are
        # gathered once (new side: broadcast filter on prep, no shuffle;
        # seen side: the partition-pruned state fetch, one exchange) and
        # exact verify + union-find run driver-side.  Saves the two hash
        # joins' and the label-propagation rounds' fixed costs — which
        # dominate wall time for micro-batches.
        rows = cand.take_all()
        new_need = {r["a"] for r in rows if r["a_new"]} | {
            r["b"] for r in rows if r["b_new"]
        }
        seen_need_ids = {r["a"] for r in rows if not r["a_new"]} | {
            r["b"] for r in rows if not r["b_new"]
        }
        if len(new_need) + len(seen_need_ids) <= SMALL_VERIFY_DOCS:
            need_arr = pa.array(sorted(new_need), pa.int64())
            newg = {
                r["doc_id"]: r["grams"]
                for r in prep.select_columns(["doc_id", "grams"]).map_batches(
                    lambda b: b.filter(pc.is_in(b["doc_id"], value_set=need_arr)),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ).take_all()
            }
            grams = dict(newg)
            if seen_need_ids:
                import ray.data

                seen_need = ray.data.from_arrow(
                    pa.table({"doc_id": pa.array(sorted(seen_need_ids), pa.int64())})
                )
                for r in (
                    seen_need.map_batches(_tag_gram_part, batch_format="pyarrow")
                    .groupby("_part")
                    .map_groups(
                        partial(_grams_part, state_dir=state_dir, token=token),
                        batch_format="pyarrow",
                    )
                    .take_all()
                ):
                    grams[r["doc_id"]] = r["grams"]
            verified = []
            for r in rows:
                ga_, gb_ = grams.get(r["a"]), grams.get(r["b"])
                if ga_ is None or gb_ is None:
                    raise ValueError(
                        f"gram state missing for candidate doc "
                        f"{r['a'] if ga_ is None else r['b']} in {state_dir} — "
                        "band rows exist without grams (corrupted/partial "
                        "state; re-ingest that batch's token)"
                    )
                ja = _jaccard_sorted(
                    np.frombuffer(ga_, dtype="<u8"), np.frombuffer(gb_, dtype="<u8")
                )
                if ja >= threshold:
                    verified.append(r)
            return "rows", verified

    # --- exact verification over gram sets -------------------------------
    # seen members' grams come from state (partition-pruned reads); new
    # members' grams ride in `prep`
    def _seen_ids(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                _i64(t["a"])[_i64(t["a_new"]) == 0],
                _i64(t["b"])[_i64(t["b_new"]) == 0],
            ]
        )
        return pa.table({"doc_id": pa.array(np.unique(ids), pa.int64())})

    seen_need = distinct_rows(_nonempty(cand.map_batches(_seen_ids, batch_format="pyarrow")), "doc_id")
    seen_grams = _nonempty(
        seen_need.map_batches(_tag_gram_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            partial(_grams_part, state_dir=state_dir, token=token),
            batch_format="pyarrow",
        )
    )
    grams_all = prep.select_columns(["doc_id", "grams"]).union(seen_grams)

    def _as_side(key: str, out: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({key: t["doc_id"], out: t["grams"]})

        return _f

    ga = _nonempty(grams_all.map_batches(_as_side("a", "grams_a"), batch_format="pyarrow"))
    gb = _nonempty(grams_all.map_batches(_as_side("b", "grams_b"), batch_format="pyarrow"))
    # _join_ready on every join input: zero-schema empty blocks entering
    # Dataset.join fail with "No match for key field" (see dedup._join_ready)
    cand = _join_ready(cand, ["a", "b", "a_new", "b_new"])
    j = cand.join(ga, join_type="inner", num_partitions=num_partitions, on=("a",))
    j = _join_ready(j, ["a", "b", "a_new", "b_new", "grams_a"])
    j = j.join(gb, join_type="inner", num_partitions=num_partitions, on=("b",))
    ver = _nonempty(
        j.map_batches(partial(_verify_grams, threshold=threshold), batch_format="pyarrow")
    ).materialize()
    return "ds", ver


def minhash_dedup_incremental(
    ds_new,
    state_dir: str,
    threshold: float = 0.8,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    num_parts: int = 16,
    max_bucket: int = 64,
    num_partitions: int = 8,
    batch_token: "str | None" = None,
):
    """Near-dup dedup one NEW batch against the persistent seen corpus;
    returns the batch's KEPT doc_ids as a Dataset ({doc_id}) and commits
    every new doc's signature/gram state.  See module docstring."""
    from ..util import new_token

    if num_parts & (num_parts - 1):
        raise ValueError("num_parts must be a power of two")
    _check_state_format(
        state_dir,
        {
            "sig": "md5-shingle-minhash:1",
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
            "num_parts": num_parts,
        },
    )
    token = batch_token or new_token()
    check_token_not_folded(state_dir, token)
    prep, cand = _ingest_candidates(
        ds_new, state_dir, token,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        num_parts=num_parts, max_bucket=max_bucket,
    )
    ids = prep.select_columns(["doc_id"])
    if cand.count() == 0:
        return ids
    mode, ver = _verified_pairs(
        prep, cand, state_dir, token,
        threshold=threshold, num_parts=num_parts, num_partitions=num_partitions,
    )
    if mode == "rows":
        return _finish_from_edges(_edges_collapsed(ver), ids, "doc_id")
    return _decide_kept(ver, ids, "doc_id", num_partitions)


# ---------------------------------------------------------------------------
# streaming leakage-safe split (split-stable assignment under continuous
# ingest) — the incremental sibling of ops/sampling.leakage_safe_split


def _reps_part(g: pa.Table, *, state_dir: str, token: str) -> pa.Table:
    """Fetch the persisted reps of this partition's requested SEEN ids."""
    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "reps", f"part={part:05d}")
    seen = _read_runs(pdir, token)
    if seen is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())}
        )
    return seen.filter(pc.is_in(seen["doc_id"], value_set=g["doc_id"].combine_chunks()))


def _reps_commit_part(g: pa.Table, *, state_dir: str, token: str) -> pa.Table:
    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "reps", f"part={part:05d}")
    _commit_run(pdir, token, g.select(["doc_id", "rep"]))
    return pa.table({"n": pa.array([g.num_rows], pa.int64())})


def _fetch_reps(state_dir: str, token: str, ids, num_parts: int) -> dict:
    """doc_id -> rep for the given SEEN ids (partition-pruned state read).
    Raises loudly on a missing rep: band rows exist without reps only in
    the crash window between a batch's band commit and its rep commit —
    re-ingest that batch's token to repair."""
    from functools import partial

    import ray.data

    ids = sorted(ids)
    if not ids:
        return {}
    need = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    )
    out = {}
    for r in (
        need.map_batches(
            partial(_tag_part_by_doc, num_parts=num_parts), batch_format="pyarrow"
        )
        .groupby("_part")
        .map_groups(
            partial(_reps_part, state_dir=state_dir, token=token),
            batch_format="pyarrow",
        )
        .take_all()
    ):
        out[r["doc_id"]] = r["rep"]
    missing = [i for i in ids if i not in out]
    if missing:
        raise ValueError(
            f"rep state missing for seen docs {missing[:5]}... in {state_dir} — "
            "band rows exist without reps (crash between band and rep "
            "commits; re-ingest that batch's token)"
        )
    return out


def leakage_split_incremental(
    ds_new,
    state_dir: str,
    threshold: float = 0.8,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    num_parts: int = 16,
    max_bucket: int = 64,
    num_partitions: int = 8,
    batch_token: "str | None" = None,
    splits: "tuple[tuple[str, float], ...]" = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split",
):
    """SPLIT-STABLE leakage-safe train/val/test assignment for ONE new
    batch against the persistent seen corpus — the streaming sibling of
    `ops.sampling.leakage_safe_split` and the split-assignment answer to
    "the corpus grows continuously but shipped train/val membership must
    never flip" (re-running the batch split over a grown corpus can merge
    components and MOVE old docs across splits — exactly the train/eval
    leak it was built to prevent).

    Contract (first-assignment-wins):
    - Previously ingested docs NEVER change rep or split.
    - A new doc's rep = min over {ids of its new-new verified component}
      ∪ {persisted reps of all matched seen docs}: near-dups of an
      already-shipped doc inherit its rep (hence its split) forever.
    - Two old components bridged by a new doc do NOT merge retroactively
      (their docs are shipped); the new doc takes the smaller rep.
    - Batch-boundary dependence is inherent to streaming assignment; the
      oracle replays it with the same two-batch construction as
      `dedup_minhash_incremental`.

    Mechanics: the shared minhash ingest (signatures, gram+band LSM
    commits, candidate pairs vs state) and exact-Jaccard verification,
    then connected components over (new-new edges) ∪ (new -> seen-rep
    attachment edges) — seen reps participate as plain nodes, so two new
    components matching the same old cluster merge THROUGH its rep, which
    is the correct semantics.  Driver union-find under the small-pairs
    bound, distributed min-label propagation above it.  Each new doc's
    (doc_id, rep) commits to a `reps/part=NNN` LSM table (idempotent by
    batch token) AFTER assignment; rep reads for later batches are
    partition-pruned.  Returns (doc_id, rep, split) for the batch.

    100-TB shape: identical to the streaming dedup family — per-batch
    cost O(batch + candidates), never O(corpus); the reps table adds 16 B
    per ingested doc, read only for matched seen docs.
    """
    from functools import partial

    from ..util import new_token
    from .sampling import hash_split_batch

    if num_parts & (num_parts - 1):
        raise ValueError("num_parts must be a power of two")
    _check_state_format(
        state_dir,
        {
            "sig": "md5-shingle-minhash-split:1",
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
            "num_parts": num_parts,
        },
    )
    token = batch_token or new_token()
    check_token_not_folded(state_dir, token)
    prep, cand = _ingest_candidates(
        ds_new, state_dir, token,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        num_parts=num_parts, max_bucket=max_bucket,
    )
    ids = prep.select_columns(["doc_id"])

    def _commit_and_split(reps_ds):
        """(doc_id, rep) Dataset -> commit to the reps LSM table, then
        attach the md5 split column."""
        reps_ds = reps_ds.materialize()
        reps_ds.map_batches(
            partial(_tag_part_by_doc, num_parts=num_parts), batch_format="pyarrow"
        ).groupby("_part").map_groups(
            partial(_reps_commit_part, state_dir=state_dir, token=token),
            batch_format="pyarrow",
        ).count()  # eager: later batches' attachments need these rows
        return reps_ds.map_batches(
            lambda t: hash_split_batch(t, col="rep", splits=splits, salt=salt),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _self_reps(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "rep": t["doc_id"]})

    if cand.count() == 0:
        return _commit_and_split(ids.map_batches(_self_reps, batch_format="pyarrow"))

    mode, ver = _verified_pairs(
        prep, cand, state_dir, token,
        threshold=threshold, num_parts=num_parts, num_partitions=num_partitions,
    )
    if mode == "rows":
        seen_ids = {r["a"] for r in ver if not r["a_new"]} | {
            r["b"] for r in ver if not r["b_new"]
        }
        rep_of = _fetch_reps(state_dir, token, seen_ids, num_parts)
        pairs = [
            (
                r["a"] if r["a_new"] else rep_of[r["a"]],
                r["b"] if r["b_new"] else rep_of[r["b"]],
            )
            for r in ver
        ]
        rep_map = _clusters_from_pairs(pairs)

        def _assign(t: pa.Table) -> pa.Table:
            d = _i64(t["doc_id"])
            rep = np.fromiter(
                (rep_map.get(int(x), int(x)) for x in d), np.int64, count=len(d)
            )
            return pa.table(
                {"doc_id": pa.array(d, pa.int64()), "rep": pa.array(rep, pa.int64())}
            )

        return _commit_and_split(ids.map_batches(_assign, batch_format="pyarrow"))

    # distributed path: resolve matched seen ids to reps, rewrite every
    # verified pair's seen endpoints to their reps (reps join the CC as
    # plain nodes), min-label propagate, left-join labels back onto ids
    def _seen_side(t: pa.Table) -> pa.Table:
        ids_ = np.concatenate(
            [
                _i64(t["a"])[_i64(t["a_new"]) == 0],
                _i64(t["b"])[_i64(t["b_new"]) == 0],
            ]
        )
        return pa.table({"doc_id": pa.array(np.unique(ids_), pa.int64())})

    from ..pipelines.relational import distinct_rows

    seen_need = distinct_rows(
        _nonempty(ver.map_batches(_seen_side, batch_format="pyarrow")), "doc_id"
    )
    n_seen_need = seen_need.count()
    if n_seen_need == 0:
        # all-new batch: edges are the verified pairs verbatim (no rep
        # joins — an empty join side would hit Ray's zero-schema blocks)
        edges_ds = ver.map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        )
        labels = _nonempty(
            min_label_clusters(_nonempty(edges_ds), num_partitions=num_partitions)
        )
        lab2 = labels.map_batches(
            lambda t: pa.table({"doc_id": t["node"], "lab": t["lab"]}),
            batch_format="pyarrow",
        )
        from ..pipelines.relational import hash_join

        joined = hash_join(ids, lab2, on="doc_id", how="left", right_unique=True)

        def _coalesce0(t: pa.Table) -> pa.Table:
            d = _i64(t["doc_id"])
            rep = _i64(pc.coalesce(t["lab"], t["doc_id"]))
            return pa.table(
                {"doc_id": pa.array(d, pa.int64()), "rep": pa.array(rep, pa.int64())}
            )

        return _commit_and_split(joined.map_batches(_coalesce0, batch_format="pyarrow"))
    seen_reps = _nonempty(
        seen_need.map_batches(
            partial(_tag_part_by_doc, num_parts=num_parts), batch_format="pyarrow"
        )
        .groupby("_part")
        .map_groups(
            partial(_reps_part, state_dir=state_dir, token=token),
            batch_format="pyarrow",
        )
    ).materialize()
    if seen_reps.count() < n_seen_need:
        raise ValueError(
            f"rep state missing for matched seen docs in {state_dir} — "
            "band rows exist without reps (crash between band and rep "
            "commits; re-ingest that batch's token)"
        )

    def _as_lookup(key: str, out: str):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({key: t["doc_id"], out: t["rep"]})

        return _f

    ver = _join_ready(ver, ["a", "b", "a_new", "b_new"])
    ra = _nonempty(seen_reps.map_batches(_as_lookup("a", "rep_a"), batch_format="pyarrow"))
    rb = _nonempty(seen_reps.map_batches(_as_lookup("b", "rep_b"), batch_format="pyarrow"))
    j = ver.join(ra, join_type="left_outer", num_partitions=num_partitions, on=("a",))
    j = _join_ready(j, ["a", "b", "a_new", "b_new", "rep_a"])
    j = j.join(rb, join_type="left_outer", num_partitions=num_partitions, on=("b",))

    def _edge_rows(t: pa.Table) -> pa.Table:
        a = _i64(t["a"])
        b = _i64(t["b"])
        a_new = _i64(t["a_new"]) != 0
        b_new = _i64(t["b_new"]) != 0
        # seen side with a null rep = the crash window; refuse loudly
        null_a = pc.is_null(t["rep_a"]).to_numpy(zero_copy_only=False)
        null_b = pc.is_null(t["rep_b"]).to_numpy(zero_copy_only=False)
        if ((~a_new) & null_a).any() or ((~b_new) & null_b).any():
            raise ValueError(
                f"rep state missing for matched seen docs in {state_dir} — "
                "re-ingest that batch's token"
            )
        rep_a = _i64(pc.fill_null(t["rep_a"], 0))
        rep_b = _i64(pc.fill_null(t["rep_b"], 0))
        ea = np.where(a_new, a, rep_a)
        eb = np.where(b_new, b, rep_b)
        return pa.table({"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64())})

    labels = _nonempty(
        min_label_clusters(
            _nonempty(j.map_batches(_edge_rows, batch_format="pyarrow")),
            num_partitions=num_partitions,
        )
    )
    lab2 = labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "lab": t["lab"]}),
        batch_format="pyarrow",
    )
    from ..pipelines.relational import hash_join

    joined = hash_join(ids, lab2, on="doc_id", how="left", right_unique=True)

    def _coalesce(t: pa.Table) -> pa.Table:
        d = _i64(t["doc_id"])
        rep = _i64(pc.coalesce(t["lab"], t["doc_id"]))
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()), "rep": pa.array(rep, pa.int64())}
        )

    return _commit_and_split(joined.map_batches(_coalesce, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# LSM-state compaction (shared by exact_dedup_incremental's layout and the
# minhash band/gram tables)

_COMPACTED_MANIFEST = "_COMPACTED.json"


def folded_tokens(state_dir: str) -> set:
    import json

    p = os.path.join(state_dir, _COMPACTED_MANIFEST)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["tokens"])


def check_token_not_folded(state_dir: str, token: str) -> None:
    """Compaction trades replay depth for read cost (the CDC tombstone-
    retention rule applied here): a batch token folded into a base file
    can no longer be excluded from its own reads, so replaying it would
    see its own rows as 'seen' and return an empty kept set.  Refuse
    LOUDLY instead of silently returning wrong results."""
    if token.startswith("_base"):
        raise ValueError("batch_token must not start with '_base' (reserved)")
    if token in folded_tokens(state_dir):
        raise ValueError(
            f"batch token {token!r} was already ingested AND compacted into "
            f"{state_dir}; replaying it is no longer idempotent — use a new "
            "token (the batch's rows are already in the seen state)"
        )


def compact_dedup_state(state_dir: str) -> dict:
    """Fold every partition's run files into ONE base file per partition.

    Reads merge run files per partition, so a long-running stream's read
    cost grows with batches-per-partition until compacted.  Works on both
    persisted-dedup layouts (exact: `part=NNN/seen-<token>.parquet`;
    minhash: `{bands,grams}/part=NNN/run-<token>.parquet`).  Crash-safe:
    the merged base lands via temp + os.replace BEFORE the old files are
    unlinked — a crash in between leaves duplicate seen rows, which are
    harmless to both consumers (membership anti-join / distinct pairs)
    and are deduplicated by the next compaction (drop_duplicates below).
    Folded batch tokens are recorded in `_COMPACTED.json`; replaying a
    folded token refuses (see check_token_not_folded)."""
    import json

    import pyarrow.parquet as pq

    from ..util import atomic_write_json

    parts = 0
    files_folded = 0
    tokens: set = folded_tokens(state_dir)

    # Phase 0: SEAL first.  The manifest (replay-refusal source of truth)
    # must cover every token about to be folded BEFORE any run file is
    # rewritten or unlinked — a crash mid-fold then leaves tokens sealed
    # with their files intact (replays refuse: conservative and correct),
    # never tokens folded but unsealed (replays would silently see their
    # own rows as seen and return wrong kept sets).
    to_fold: "list[tuple[str, list[str], str]]" = []
    for root, dirs, files in os.walk(state_dir):
        runs = sorted(
            f
            for f in files
            if f.endswith(".parquet")
            and (f.startswith("run-") or f.startswith("seen-"))
        )
        prefix = "run-" if runs and runs[0].startswith("run-") else "seen-"
        non_base = [f for f in runs if not f.startswith(prefix + "_base-")]
        # fold even a single run file: compaction SEALS every ingested
        # token (the manifest must cover all of them for the replay-refusal
        # contract to be uniform across partitions — a token folded in one
        # partition but excludable in another would half-replay)
        if not non_base and len(runs) <= 1:
            continue
        to_fold.append((root, runs, prefix))
        tokens.update(
            f[len(prefix) : -8] for f in runs if not f.startswith(prefix + "_base-")
        )
    atomic_write_json(
        os.path.join(state_dir, _COMPACTED_MANIFEST), {"tokens": sorted(tokens)}
    )
    for root, runs, prefix in to_fold:
        merged = pa.concat_tables(pq.read_table(os.path.join(root, f)) for f in runs)
        if not any(pa.types.is_nested(f.type) for f in merged.schema):
            # self-heal duplicate rows left by a crash between base-write
            # and old-file unlink; nested payload columns (the embedding
            # table's vectors) skip this — their duplicates are equally
            # harmless and pandas cannot hash them
            df = merged.to_pandas()
            merged = pa.Table.from_pandas(
                df.drop_duplicates(ignore_index=True), schema=merged.schema
            )
        gen = 1 + max(
            (
                int(f[len(prefix) + 6 : -8])
                for f in runs
                if f.startswith(prefix + "_base-")
            ),
            default=0,
        )
        base = os.path.join(root, f"{prefix}_base-{gen}.parquet")
        tmp = base + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, base)
        for f in runs:
            os.unlink(os.path.join(root, f))
        parts += 1
        files_folded += len(runs)
    return {"parts_compacted": parts, "files_folded": files_folded,
            "tokens_folded": len(tokens)}


# ---------------------------------------------------------------------------
# streaming SimHash near-dup (the zero-join sibling: the 64-bit simhash
# rides in each band row, so hamming verification happens inside the
# partition task — no gram table, no joins)

def _sim_tag_part(t: pa.Table, num_parts: int) -> pa.Table:
    key = _i64(t["bkey"]).astype(np.uint64) * np.uint64(4) + _i64(t["band"]).astype(
        np.uint64
    )
    p = (_mix64(key) & np.uint64(num_parts - 1)).astype(np.int32)
    return t.append_column("_part", pa.array(p, pa.int32()))


def _sim_band_part(
    g: pa.Table, *, state_dir: str, token: str, max_hamming: int, max_bucket: int
) -> pa.Table:
    """Merge this partition's seen band rows with the batch's, emit
    HAMMING-VERIFIED pairs involving >= 1 new doc (pigeonhole banding has
    perfect recall at <= 3 bits, so these pairs are final — no second
    verification stage), and commit the batch's rows."""
    from .dedup import _popcount64

    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "simbands", f"part={part:05d}")
    new = g.select(["band", "bkey", "doc_id", "simhash"])
    seen = _read_runs(pdir, token)
    _commit_run(pdir, token, new)

    n_new = new.num_rows
    tabs = [new] + ([seen] if seen is not None else [])
    band = np.concatenate([_i64(t["band"]) for t in tabs])
    bkey = np.concatenate([_i64(t["bkey"]) for t in tabs])
    doc = np.concatenate([_i64(t["doc_id"]) for t in tabs])
    sims = np.concatenate(
        [t["simhash"].combine_chunks().to_numpy(zero_copy_only=False) for t in tabs]
    ).astype(np.uint64)
    is_new = np.zeros(len(doc), dtype=bool)
    is_new[:n_new] = True

    # new-first within buckets: see _band_part's cap-starvation note
    order = np.lexsort((doc, (~is_new).astype(np.int8), bkey, band))
    band, bkey, doc, sims, is_new = (
        band[order], bkey[order], doc[order], sims[order], is_new[order]
    )
    ai, bi = _run_pair_indices([band, bkey], max_bucket)
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "a_new": pa.array([], pa.int32()),
            "b_new": pa.array([], pa.int32()),
        }
    )
    if len(ai) == 0:
        return empty
    keep = (is_new[ai] | is_new[bi]) & (
        _popcount64(sims[ai] ^ sims[bi]) <= max_hamming
    )
    ai, bi = ai[keep], bi[keep]
    if len(ai) == 0:
        return empty
    a, b, an, bn = doc[ai], doc[bi], is_new[ai], is_new[bi]
    swap = a > b
    a2, b2 = np.where(swap, b, a), np.where(swap, a, b)
    an2, bn2 = np.where(swap, bn, an), np.where(swap, an, bn)
    keep2 = a2 != b2
    return pa.table(
        {
            "a": pa.array(a2[keep2], pa.int64()),
            "b": pa.array(b2[keep2], pa.int64()),
            "a_new": pa.array(an2[keep2].astype(np.int32), pa.int32()),
            "b_new": pa.array(bn2[keep2].astype(np.int32), pa.int32()),
        }
    )


def simhash_dedup_incremental(
    ds_new,
    state_dir: str,
    max_hamming: int = 3,
    num_parts: int = 16,
    max_bucket: int = 256,
    num_partitions: int = 8,
    batch_token: "str | None" = None,
):
    """SimHash near-dup dedup of one NEW batch against persistent state;
    same two-phase semantics, exactly-once protocol, and compaction rules
    as minhash_dedup_incremental (module docstring), with one table
    (`simbands/`) and no verification joins."""
    from functools import partial

    from .dedup import SimHashStage
    from ..pipelines.relational import distinct_rows
    from ..util import new_token

    if num_parts & (num_parts - 1):
        raise ValueError("num_parts must be a power of two")
    _check_state_format(
        state_dir,
        {"sig": "md5-token-simhash:1", "bands": 4, "bits": 16, "num_parts": num_parts},
    )
    token = batch_token or new_token()
    check_token_not_folded(state_dir, token)

    rows = (
        ds_new.map_batches(SimHashStage(), batch_format="pyarrow")
        .map_batches(
            partial(_sim_tag_part, num_parts=num_parts),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # thin (4 band rows/doc); reused for ids below
    )
    ids_ds = distinct_rows(
        rows.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"]}), batch_format="pyarrow"
        ),
        "doc_id",
    )
    ver = (
        rows.groupby("_part")
        .map_groups(
            partial(
                _sim_band_part,
                state_dir=state_dir,
                token=token,
                max_hamming=max_hamming,
                max_bucket=max_bucket,
            ),
            batch_format="pyarrow",
        )
    )
    ver = distinct_rows(_nonempty(ver), ["a", "b", "a_new", "b_new"]).materialize()
    return _decide_kept(ver, ids_ds, "doc_id", num_partitions)


# ---------------------------------------------------------------------------
# streaming embedding near-dup (vectors ride in the band rows like the
# simhash word — exact-cosine verification inside the partition task)

def _emb_bucket_rows(batch: pa.Table, n_planes: int, seed: int,
                     num_parts: int) -> pa.Table:
    """(vec_id, embedding) -> 2 rotated random-hyperplane bucket rows per
    vector, original float32 payload attached (the batch op's bucketing,
    dedup.embedding_near_dup_pairs, re-emitted with a partition tag)."""
    from .similarity import _emb_matrix

    emb = _emb_matrix(batch)
    dim = emb.shape[1]
    rng = np.random.default_rng(seed)  # same (seed, dim) in every task
    planes = [rng.standard_normal((dim, n_planes)) for _ in range(2)]
    nemb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    ids = _i64(batch["vec_id"])
    n = len(ids)
    keys = np.concatenate(
        [((nemb @ P) > 0) @ (1 << np.arange(n_planes)) for P in planes]
    ).astype(np.int64)
    rot = np.repeat(np.arange(2, dtype=np.int32), n)
    flat = np.tile(emb.astype(np.float32).reshape(-1), 2)
    vec = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), dim)
    part = (
        _mix64(keys.view(np.uint64) * np.uint64(2) + rot.astype(np.uint64))
        & np.uint64(num_parts - 1)
    ).astype(np.int32)
    return pa.table(
        {
            "rot": pa.array(rot),
            "bkey": pa.array(keys, pa.int64()),
            "vec_id": pa.array(np.tile(ids, 2), pa.int64()),
            "vec": vec,
            "_part": pa.array(part, pa.int32()),
        }
    )


def _emb_band_part(
    g: pa.Table, *, state_dir: str, token: str, threshold: float, max_bucket: int
) -> pa.Table:
    """Per-partition: merge seen bucket rows with the batch's, emit
    EXACT-COSINE-verified pairs involving >= 1 new vector (float64
    normalize + one einsum over the candidate pairs), commit the batch's
    rows."""
    part = int(g["_part"][0].as_py())
    pdir = os.path.join(state_dir, "embands", f"part={part:05d}")
    new = g.select(["rot", "bkey", "vec_id", "vec"])
    seen = _read_runs(pdir, token)
    if seen is not None and seen.schema.field("vec").type != new.schema.field("vec").type:
        # the vector DIMENSION is part of the state identity (hyperplanes
        # are per-(seed, dim)); committing a mismatched batch would brick
        # the partition with unreadable mixed schemas
        raise ValueError(
            f"embedding state at {pdir} holds {seen.schema.field('vec').type}, "
            f"this batch is {new.schema.field('vec').type} — re-bootstrap "
            "into a fresh state_dir"
        )
    _commit_run(pdir, token, new)

    n_new = new.num_rows
    tabs = [new] + ([seen] if seen is not None else [])

    def _vecs(t: pa.Table) -> np.ndarray:
        col = t["vec"].combine_chunks()
        return (
            col.flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(col), -1)
        )

    rot = np.concatenate([_i64(t["rot"]) for t in tabs])
    bkey = np.concatenate([_i64(t["bkey"]) for t in tabs])
    vid = np.concatenate([_i64(t["vec_id"]) for t in tabs])
    emb = np.concatenate([_vecs(t) for t in tabs], axis=0)
    is_new = np.zeros(len(vid), dtype=bool)
    is_new[:n_new] = True

    # new-first within buckets: see _band_part's cap-starvation note
    order = np.lexsort((vid, (~is_new).astype(np.int8), bkey, rot))
    rot, bkey, vid, emb, is_new = (
        rot[order], bkey[order], vid[order], emb[order], is_new[order]
    )
    ai, bi = _run_pair_indices([rot, bkey], max_bucket)
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "a_new": pa.array([], pa.int32()),
            "b_new": pa.array([], pa.int32()),
        }
    )
    if len(ai) == 0:
        return empty
    keep = is_new[ai] | is_new[bi]
    ai, bi = ai[keep], bi[keep]
    if len(ai) == 0:
        return empty
    nemb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    cos = np.einsum("ij,ij->i", nemb[ai], nemb[bi])
    keep2 = cos >= threshold
    ai, bi = ai[keep2], bi[keep2]
    if len(ai) == 0:
        return empty
    a, b, an, bn = vid[ai], vid[bi], is_new[ai], is_new[bi]
    swap = a > b
    a2, b2 = np.where(swap, b, a), np.where(swap, a, b)
    an2, bn2 = np.where(swap, bn, an), np.where(swap, an, bn)
    keep3 = a2 != b2
    return pa.table(
        {
            "a": pa.array(a2[keep3], pa.int64()),
            "b": pa.array(b2[keep3], pa.int64()),
            "a_new": pa.array(an2[keep3].astype(np.int32), pa.int32()),
            "b_new": pa.array(bn2[keep3].astype(np.int32), pa.int32()),
        }
    )


def embedding_near_dup_incremental(
    ds_new,
    state_dir: str,
    threshold: float = 0.99,
    n_planes: int = 12,
    seed: int = 5,
    num_parts: int = 16,
    max_bucket: int = 64,
    num_partitions: int = 8,
    batch_token: "str | None" = None,
):
    """Embedding-cosine near-dup dedup of one NEW vector batch against
    persistent state (id column `vec_id`); same two-phase semantics,
    exactly-once protocol, and compaction rules as the minhash/simhash
    siblings.  Candidate recall is the batch op's 2-rotation hyperplane
    LSH (deterministic per (seed, dim), so cross-batch pairs collide
    exactly as in-batch pairs do); verification is exact cosine in
    float64 inside the partition task."""
    from functools import partial

    from ..pipelines.relational import distinct_rows
    from ..util import new_token

    if num_parts & (num_parts - 1):
        raise ValueError("num_parts must be a power of two")
    _check_state_format(
        state_dir,
        {
            "sig": "hyperplane-lsh:1",
            "n_planes": n_planes,
            "seed": seed,
            "rotations": 2,
            "num_parts": num_parts,
        },
    )
    token = batch_token or new_token()
    check_token_not_folded(state_dir, token)

    rows = ds_new.map_batches(
        partial(_emb_bucket_rows, n_planes=n_planes, seed=seed, num_parts=num_parts),
        batch_format="pyarrow",
    ).materialize()
    # pin the vector DIMENSION driver-side BEFORE any state commit (the
    # input schema is variable list<float>, so dim is only knowable from
    # data; hyperplanes are per-(seed, dim), and a mixed-dim state dir
    # would brick _read_runs with unreadable schemas).  Single-writer per
    # state_dir, like every dedup state op.
    vec_type = rows.schema().base_schema.field("vec").type
    dim_marker = os.path.join(state_dir, "_DIM.json")
    import json as _json

    if os.path.exists(dim_marker):
        with open(dim_marker) as f:
            have_dim = _json.load(f)["dim"]
        if have_dim != vec_type.list_size:
            raise ValueError(
                f"embedding state at {state_dir} holds dim {have_dim}, this "
                f"batch is dim {vec_type.list_size} — re-bootstrap into a "
                "fresh state_dir"
            )
    else:
        from ..util import atomic_write_json

        atomic_write_json(dim_marker, {"dim": vec_type.list_size})
    ids_ds = distinct_rows(
        rows.map_batches(
            lambda t: pa.table({"vec_id": t["vec_id"]}), batch_format="pyarrow"
        ),
        "vec_id",
    )
    ver = rows.groupby("_part").map_groups(
        partial(
            _emb_band_part,
            state_dir=state_dir,
            token=token,
            threshold=threshold,
            max_bucket=max_bucket,
        ),
        batch_format="pyarrow",
    )
    ver = distinct_rows(_nonempty(ver), ["a", "b", "a_new", "b_new"]).materialize()
    return _decide_kept(ver, ids_ds, "vec_id", num_partitions)
