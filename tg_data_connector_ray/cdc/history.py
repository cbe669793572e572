"""SCD Type-2 version history from a CDC event log.

Builds the full slowly-changing-dimension history of every ``(conv_id,
turn_idx)`` key: one version row per applied change event, carrying the
complete visible state *after* that event plus its validity interval
``[valid_from, valid_to)`` in LSN space (``valid_to`` null = current
version).  The same merge contract as ``merge.fold`` (FIXTURES.md F2)
governs visibility:

- duplicate ``(key, lsn)`` redeliveries apply once;
- ``I``/``D`` are full events — every payload column resets to the event's
  carried value (all-null for a ``D``);
- ``U`` sets only its non-null columns; an orphan ``U`` opens a partial row
  (policy "upsert");
- ``deleted`` is true exactly on versions created by a ``D`` (a later ``U``
  resurrects a partial row, which is why tombstone versions matter).

Consistency invariant (pinned by tests): the ``is_current AND NOT deleted``
slice of the history projected to payload columns equals the converged
table ``merge.fold`` produces over the same log.

The reference connector is a bulk loader with no history surface
(SURVEY.md §2.2, ``tigergraphwriter``); SCD2 materialization is defined by
BASELINE.json's lake-upsert north star, not ported code.

Scale design: one coarse hash shuffle on ``conv_id`` (whole conversations
co-locate, ``n_coarse`` bounds per-task rows at ~events/n_coarse), then a
single vectorized pass per bucket — numpy lexsort + the same grouped-
last-setter running-max used by the fold kernel, evaluated at every row
instead of only each key's last.  Output is O(events) rows and streams out
of ``map_groups`` as Arrow blocks; nothing materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .merge import PAYLOAD_COLS, _col_np, _grouped_last_setter

HISTORY_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("valid_from", pa.int64()),
        ("valid_to", pa.int64()),
        ("is_current", pa.bool_()),
        ("deleted", pa.bool_()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _empty_history() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in HISTORY_SCHEMA})


def history_block(g: pa.Table) -> pa.Table:
    """Vectorized SCD2 kernel over one co-located bucket of events.

    Requires every event of a key to be present in ``g`` (the caller's
    conv_id hash shuffle guarantees it).  Pure function of the bucket —
    safe under Ray task retry.
    """
    if "_cg" in g.column_names:
        g = g.drop_columns(["_cg"])
    if g.num_rows == 0:
        return _empty_history()

    conv_dict = _col_np(g, "conv_id").dictionary_encode()
    conv_codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = _col_np(g, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    lsn = _col_np(g, "lsn").to_numpy(zero_copy_only=False).astype(np.int64)
    op = _col_np(g, "op").to_numpy(zero_copy_only=False)  # object array

    # stable sort: redelivered (key, lsn) duplicates stay in arrival order,
    # so "first arrival wins" below is deterministic
    order = np.lexsort((lsn, turn, conv_codes))
    conv_codes, turn, lsn, op = conv_codes[order], turn[order], lsn[order], op[order]

    same_key = (conv_codes[1:] == conv_codes[:-1]) & (turn[1:] == turn[:-1])
    dup = np.concatenate([[False], same_key & (lsn[1:] == lsn[:-1])])
    if dup.any():
        keep = ~dup
        order, conv_codes, turn, lsn, op = (
            order[keep], conv_codes[keep], turn[keep], lsn[keep], op[keep]
        )
        same_key = (conv_codes[1:] == conv_codes[:-1]) & (turn[1:] == turn[:-1])
    n = len(order)

    new_key = np.concatenate([[True], ~same_key])
    idx = np.arange(n, dtype=np.int64)
    key_start = np.maximum.accumulate(np.where(new_key, idx, -1))
    last_of_key = np.concatenate([new_key[1:], [True]])
    full = (op == "I") | (op == "D")

    # visible state after every event: per column, value of the latest
    # setter at-or-before the row.  A full event sets every column, so the
    # running max can never reach past the segment boundary the fold kernel
    # tracks explicitly — key_start suffices here.
    out_cols: dict = {}
    for name in PAYLOAD_COLS:
        col = _col_np(g, name)
        valid_sorted = ~np.asarray(col.is_null()).astype(bool)[order]
        set_mask = full | valid_sorted
        src = _grouped_last_setter(set_mask, key_start)
        ok = src >= 0
        gather = np.where(ok, src, 0)
        vals = col.take(pa.array(order[gather]))
        null_mask = ~(ok & valid_sorted[gather])
        if null_mask.any():
            vals = pc.if_else(pa.array(null_mask), pa.scalar(None, type=vals.type), vals)
        out_cols[name] = vals

    valid_to = pa.array(np.roll(lsn, -1), type=pa.int64(), mask=last_of_key)
    return pa.table(
        {
            "conv_id": conv_dict.take(pa.array(order)).cast(pa.string()),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "valid_from": pa.array(lsn, type=pa.int64()),
            "valid_to": valid_to,
            "is_current": pa.array(last_of_key),
            "deleted": pa.array(op == "D"),
            "role": out_cols["role"],
            "text": out_cols["text"],
            "tool": out_cols["tool"],
            "ts": out_cols["ts"],
        },
        schema=HISTORY_SCHEMA,
    )


def scd2_history(events, n_coarse: int = 64, exchange: str = "spool"):
    """SCD Type-2 history Dataset from a CDC-schema events Dataset.

    ``events`` must carry the normalized CDC columns (lsn, op, conv_id,
    turn_idx, role, text, tool, ts) — e.g. ``ray.data.read_parquet`` over a
    clean log, or ``build_events_dataset`` when the log needs the dirty
    channel / schema reconciliation first.

    ``n_coarse`` is the exchange fan-out: per-task memory is
    ~total_events/n_coarse rows.  Raise it on a cluster (power of two not
    required — it feeds a modulo, not a mask).

    ``exchange="spool"`` (default) co-locates conversations via the
    hive-partitioned spool write+read — measured ~3x faster than Ray's
    sort-based groupby shuffle on multi-GB text payloads (see
    pipelines/exchange.py); ``"groupby"`` keeps the in-memory path.
    """
    from ..util import stable_hash_strings

    def part_of(t: pa.Table):
        return stable_hash_strings(t["conv_id"]) % np.uint64(n_coarse)

    if exchange == "spool":
        from ..pipelines.exchange import spooled_grouped_map

        return spooled_grouped_map(
            events, history_block, part_of, n_coarse, name="scd2"
        )

    def add_cg(t: pa.Table) -> pa.Table:
        return t.append_column("_cg", pa.array(part_of(t).astype(np.int32)))

    return (
        events.map_batches(add_cg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cg")
        .map_groups(history_block, batch_format="pyarrow")
    )
