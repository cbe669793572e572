"""CDC -> ANN index maintenance: keep a PersistentIvf embedding index in
exact sync with the converged transcript table, driven by the table's own
change-data feed — the "derived vector store" every retrieval / dedup /
RAG consumer of a CDC lake needs, expressed with the engine's existing
primitives end-to-end:

- **Bootstrap** (`bootstrap_index`): one streaming pass over the converged
  table (``cdc.pipeline.read_final_table`` — column-pruned to the key +
  text), embedding each turn (``ops.similarity.hash_embed`` — swap in a
  real encoder, nothing else changes) and appending as one index run.
- **Incremental sync** (`sync_from_feed`): consume the I/U/D stream
  between two applied runs (``cdc.pipeline.change_feed`` with pre-images)
  and translate it to index operations — O(changed keys), never O(table):

  =====  ============================  =================================
  feed   condition                     index operation
  =====  ============================  =================================
  I      new key live                  append embed(text)
  U      text changed (null-aware)     tombstone old, append embed(text)
  U      text unchanged                nothing (no re-embed)
  D      key gone                      tombstone
  =====  ============================  =================================

  Updates are delete-then-append: PersistentIvf's epoch-ordered
  tombstones make that an exact upsert (the new vector lands at a higher
  epoch than the tombstone hiding its predecessor), including the
  A -> B -> A revert case.  Both halves are idempotent on the sync run id
  (`<run>.del` / `<run>.add`), so a crashed or re-executed sync converges:
  replaying re-derives the SAME operations from the same feed window and
  the index's run/tombstone ledgers skip them.

**Identity.** ``vec_id`` is the int64 (two's-complement) view of
md5-u64("<conv_id>:<turn_idx>") — stable per key across updates, exactly
reconstructable in SQL (the engine-wide md5 identity, ops/dedup._md5_u64),
and collision-safe at transcript scale (64-bit birthday bound ~5e9 keys;
the CDC table itself keys on the composite, so an index collision degrades
one neighbor list, never the table).

**Scale shape.** Bootstrap streams (map_batches embed + partitioned
write); each sync moves O(delta) rows — the feed itself is derived from
per-partition state folds (change_feed), embeddings ride the add-run's
parquet, and tombstone ids are a driver-side list exactly like the CDC
hot-key list (bounded by the delete/update count of the window; batch the
window if a single feed outgrows the driver).  Nothing re-reads the
corpus; nothing re-embeds unchanged text.

Reference parity note: the reference connector (TG-Data-Connector) has no
derived-index story at all — this is a beyond-reference component in the
LLM-pipeline layer, but it reuses its exactly-once run-ledger discipline
(reference: tigergraphwriter's idempotent loading-job semantics,
tigergraphwriter/README.md) on both the feed side and the index side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _md5_u64
from .similarity import PersistentIvf, hash_embed

# feed columns consumed (change_feed include_before=True emits these)
_KEY_SEP = ":"


def key_vec_ids(conv_id, turn_idx) -> np.ndarray:
    """int64 vec_id per (conv_id, turn_idx) — md5-u64 of the composite
    "<conv>:<turn>" string, two's-complement into int64.  md5 runs once
    per row (keys are unique per row by construction — there is no
    unique/gather win to take), the engine-wide oracle identity."""
    if isinstance(conv_id, pa.ChunkedArray):
        conv_id = conv_id.combine_chunks()
    if isinstance(turn_idx, pa.ChunkedArray):
        turn_idx = turn_idx.combine_chunks()
    keys = pc.binary_join_element_wise(
        pc.cast(conv_id, pa.string()), pc.cast(turn_idx, pa.string()), _KEY_SEP
    )
    return np.array(
        [_md5_u64(k) for k in keys.to_pylist()], dtype=np.uint64
    ).astype(np.int64)


def embed_rows(t: pa.Table, dim: int, text_col: str = "text") -> pa.Table:
    """(vec_id, embedding) for every row of a (conv_id, turn_idx, text)
    batch — the shared embed stage of bootstrap and sync.  Null text
    embeds as empty (hash_embed's contract)."""
    ids = key_vec_ids(t["conv_id"], t["turn_idx"])
    emb = hash_embed(t[text_col], dim=dim)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), dim
            ),
        }
    )


def bootstrap_index(index: PersistentIvf, table_ds, run_id: str,
                    dim: int = 64, text_col: str = "text") -> dict:
    """Load the index from a converged-table Dataset (pass
    ``read_final_table(cfg, columns=["conv_id","turn_idx","text"])`` or a
    time-travel-restricted read) as ONE append run — idempotent on
    ``run_id``; O(table) exactly once, at bootstrap."""
    ds = table_ds.map_batches(
        lambda t: embed_rows(t, dim, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return index.append(ds, run_id=run_id)


def _text_changed(t: pa.Table, text_col: str) -> pa.Array:
    """Null-aware "text changed" over (text, text_old): changed iff
    nullity flips or both present and unequal."""
    new, old = t[text_col], t[f"{text_col}_old"]
    eq = pc.equal(new, old)  # null if either side null
    both_null = pc.and_(pc.is_null(new), pc.is_null(old))
    same = pc.or_(pc.fill_null(eq, False), both_null)
    return pc.invert(same)


def sync_from_feed(index: PersistentIvf, feed_ds, run_id: str,
                   dim: int = 64, text_col: str = "text") -> dict:
    """Apply one change-feed window (``change_feed(cfg, from_run, to_run,
    include_before=True)``) to the index.  Tombstones publish BEFORE the
    append so the new versions' epoch exceeds them (the upsert ordering);
    both publishes are idempotent on ``run_id`` so replays converge.

    The feed is materialized once (it is the WINDOW'S DELTA — O(changed
    keys), the same driver-adjacent bound as the tombstone id list) and
    consumed twice: a thin pass for delete ids, an embed pass for adds.
    """
    feed = feed_ds.materialize()

    def _classify(t: pa.Table) -> pa.Table:
        op = t["op"]
        changed = _text_changed(t, text_col)
        upd = pc.and_(pc.equal(op, "U"), changed)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                text_col: t[text_col],
                "is_del": pc.or_(pc.equal(op, "D"), upd),
                "is_add": pc.or_(pc.equal(op, "I"), upd),
            }
        )

    tagged = feed.map_batches(
        _classify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # thin driver-side tombstone id list: O(deletes + changed updates)
    del_rows = tagged.filter(expr="is_del == True")
    del_ids = [
        int(v)
        for b in del_rows.select_columns(
            ["conv_id", "turn_idx"]
        ).iter_batches(batch_format="pyarrow")
        for v in key_vec_ids(b["conv_id"], b["turn_idx"])
    ]
    deleted = 0
    if del_ids:
        res = index.delete(del_ids, run_id=f"{run_id}.del")
        deleted = res.get("tombstoned", 0)

    add_rows = tagged.filter(expr="is_add == True")
    n_adds = add_rows.count()
    appended = 0
    if n_adds:
        ds = add_rows.map_batches(
            lambda t: embed_rows(t, dim, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        index.append(ds, run_id=f"{run_id}.add")
        appended = n_adds
    return {"run_id": run_id, "deleted": deleted, "appended": appended}
