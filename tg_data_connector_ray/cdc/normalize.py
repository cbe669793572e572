"""Normalize stage: cast every CDC batch to the target schema, validate,
route dirty rows to a side-output, and assign merge partitions.

Runs as a stateless ``map_batches`` stage over zero-copy Arrow batches.
Vectorized throughout (pyarrow.compute + numpy); the only per-row work is
the multi-format timestamp fallback for *string* ts columns, which touches
only rows the primary format failed to parse (mirrors the reference's
config-driven fallback parse, ColumnCast.java:87-117).

Dirty semantics mirror the reference's transformer-chain dirty collection
(TransformerExchanger.java:85-95, StdoutPluginCollector): a bad row is
dropped from the main stream and recorded with a reason.  Dirty rows are
written directly from the stage task (all columns stringified + `_reason`),
one uniquely-named file per flushing task, so the side-output streams at
scale instead of funneling through the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import atomic_write_parquet, mix_hash, new_token, routing_hash_strings
from .config import CdcConfig

CDC_COLUMNS = ("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
_TARGET_TYPES = {
    "lsn": pa.int64(),
    "op": pa.string(),
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


def _parse_ts_multi(arr: pa.ChunkedArray, formats) -> "tuple[pa.Array, np.ndarray]":
    """String -> timestamp[us] with multi-format fallback.

    Returns (values, bad_mask); bad = non-null input that no format parsed.
    pandas (ns precision) is the vectorized fast path; values OUTSIDE the
    datetime64[ns] range (years < 1678 or > 2262) that a format otherwise
    matches are retried through pyarrow strptime at us precision — the
    target schema is timestamp[us], so they are valid, not dirty.
    """
    s = arr.to_pandas()
    out = pd.to_datetime(s, format=formats[0], errors="coerce")
    for fmt in formats[1:]:
        miss = out.isna() & s.notna()
        if not miss.any():
            break
        out[miss] = pd.to_datetime(s[miss], format=fmt, errors="coerce")
    bad = (out.isna() & s.notna()).to_numpy()
    vals = pa.Array.from_pandas(out, type=pa.timestamp("us"))
    if bad.any():
        import pyarrow.compute as pc

        ca = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        idx = np.flatnonzero(bad)
        sub = ca.take(pa.array(idx))
        best = pa.nulls(len(idx), pa.timestamp("us"))
        for fmt in formats:
            try:
                parsed = pc.strptime(sub, format=fmt, unit="us", error_is_null=True)
            except pa.ArrowInvalid:
                continue
            best = pc.if_else(pc.is_valid(best), best, parsed)
        ok = np.asarray(pc.is_valid(best))
        if ok.any():
            # int64 merge via fill_null (a nullable->numpy round-trip goes
            # through float64, which loses exactness past 2^53 us ~ 2255 CE)
            us = np.zeros(len(vals), np.int64)
            valid0 = np.asarray(pc.is_valid(vals))
            v0 = pc.fill_null(vals.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
            us[valid0] = v0[valid0]
            b0 = pc.fill_null(best.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
            us[idx[ok]] = b0[ok]
            bad = bad.copy()
            bad[idx[ok]] = False
            null_mask = ~(valid0 | np.isin(np.arange(len(vals)), idx[ok]))
            vals = pa.array(us, type=pa.timestamp("us"), mask=null_mask)
    return vals, bad


def normalize_batch(batch: pa.Table, *, cfg: CdcConfig, run_id: str) -> pa.Table:
    """Cast to the CDC schema, validate, split dirty, add `part`."""
    n = batch.num_rows
    if n == 0:
        return _empty_clean()

    cols: dict = {}
    bad_ts = np.zeros(n, dtype=bool)
    bad_casts: list = []  # (mask, reason) per uncastable string column
    for name in CDC_COLUMNS:
        tgt = _TARGET_TYPES[name]
        if name not in batch.column_names:
            cols[name] = pa.nulls(n, type=tgt)  # schema evolution: null backfill
            continue
        col = batch[name]
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        is_str_col = pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
        if col.type.equals(tgt):
            cols[name] = col
        elif name == "ts" and is_str_col:
            vals, bad = _parse_ts_multi(col, cfg.ts_formats)
            cols[name] = vals
            bad_ts |= bad
        elif is_str_col and pa.types.is_integer(tgt):
            # schema-evolution promotion rule (schema.py): string -> typed
            # uses the exact BigDecimal-parity parse (no float64 round-trip,
            # so lsn strings > 2^53 stay bit-perfect); uncastable and
            # out-of-range rows route to the dirty side-output instead of
            # failing the whole batch
            from ..stages.casts import cast_string_to_long

            vals64, bad = cast_string_to_long(col)
            isnull = np.asarray(pc.is_null(vals64))
            v = np.asarray(pc.fill_null(vals64, 0))
            if not tgt.equals(pa.int64()):
                lo = -(1 << (tgt.bit_width - 1))
                hi = (1 << (tgt.bit_width - 1)) - 1
                oor = (~isnull) & ((v < lo) | (v > hi))
                bad = bad | oor
                isnull = isnull | oor
                v = np.where(oor, 0, v)
            cols[name] = pa.array(v, type=tgt, mask=isnull)
            bad_casts.append((bad, f"uncastable_{name}"))
        elif pa.types.is_integer(tgt) and (
            pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
        ):
            # numeric NARROWING (int64 turn_idx from pandas-default parquet,
            # float lsn from a lax producer): range/integrality failures
            # must dirty-route the ROW, not ArrowInvalid-kill the task —
            # same contract as the string-cast branch above
            if pa.types.is_floating(col.type):
                fv = col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                isnull = np.isnan(fv)
                frac = ~isnull & (np.floor(fv) != fv)
                v = np.where(isnull | frac, 0, fv)
            else:
                iv = col.cast(pa.int64(), safe=False)
                isnull = np.asarray(pc.is_null(iv))
                frac = np.zeros(n, dtype=bool)
                v = np.asarray(pc.fill_null(iv, 0)).astype(np.float64)
            lo = float(-(1 << (tgt.bit_width - 1)))
            hi = float((1 << (tgt.bit_width - 1)) - 1)
            oor = (~isnull) & ((v < lo) | (v > hi))
            bad = frac | oor
            v64 = np.where(bad | isnull, 0, v).astype(np.int64)
            cols[name] = pa.array(v64, type=tgt, mask=isnull | bad)
            if bad.any():
                bad_casts.append((bad, f"uncastable_{name}"))
        else:
            cols[name] = col.cast(tgt)  # string widening, same-family casts

    # nullFormat: exact string equality -> null (reference
    # UnstructuredStorageReaderUtil.java:352-353, equals not ignore-case).
    if cfg.null_format is not None:
        for name in ("role", "text", "tool"):
            m = pc.fill_null(pc.equal(cols[name], cfg.null_format), False)
            cols[name] = pc.if_else(m, pa.scalar(None, type=pa.string()), cols[name])

    op = cols["op"]
    # first-reason-wins, tracked as small-int codes (an object-dtype string
    # array here cost ~8 full PyObject scans per batch)
    reason_codes = np.zeros(n, dtype=np.int16)
    reason_names: list = [None]

    def _np(b) -> np.ndarray:
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return b.to_numpy(zero_copy_only=False).astype(bool)

    def flag(mask: np.ndarray, reason: str):
        reason_names.append(reason)
        np.copyto(
            reason_codes,
            np.int16(len(reason_names) - 1),
            where=(reason_codes == 0) & mask,
        )

    # cast failures first, so an uncastable lsn/turn_idx reads as
    # "uncastable_*", not as the null_* its masked value would imply
    for mask, reason in bad_casts:
        flag(mask, reason)
    flag(~_np(pc.fill_null(pc.is_in(op, value_set=pa.array(["I", "U", "D"])), False)), "bad_op")
    flag(_np(pc.is_null(cols["conv_id"])), "null_conv_id")
    flag(_np(pc.is_null(cols["turn_idx"])), "null_turn_idx")
    flag(_np(pc.fill_null(pc.less(cols["turn_idx"], 0), False)), "negative_turn_idx")
    flag(_np(pc.is_null(cols["lsn"])), "null_lsn")
    flag(bad_ts, "uncastable_ts")
    # an insert whose text is null (e.g. after nullFormat) carries no payload
    flag(
        _np(pc.fill_null(pc.equal(op, "I"), False)) & _np(pc.is_null(cols["text"])),
        "null_text_insert",
    )

    dirty_mask = reason_codes != 0
    if dirty_mask.any():
        reasons = np.array(reason_names, dtype=object)[reason_codes]
        _write_dirty(batch, reasons, dirty_mask, cfg, run_id)
        keep = pa.array(~dirty_mask)
        clean = pa.table({k: v.filter(keep) for k, v in cols.items()})
    else:  # all-clean batch (the common case): no copy
        clean = pa.table(cols)

    # partition assignment — the one hash whose mapping is PERSISTED (state
    # partitions on disk), so it must be library-version-independent
    # (`routing_hash_strings`, provider pinned in the _FORMAT.json marker);
    # salted for hot keys
    part = assign_parts(clean["conv_id"], clean["turn_idx"], cfg)
    return clean.append_column("part", pa.array(part, type=pa.int32()))


def assign_parts(conv_id, turn_idx, cfg: CdcConfig) -> np.ndarray:
    """conv_id -> partition id under the CURRENT provider/config (hot keys
    salted by turn_idx).  The single definition of the persisted routing —
    shared by normalize and by pipeline.migrate_state so a migration lands
    every key exactly where a fresh replay would."""
    h = routing_hash_strings(conv_id)
    if cfg.hot_keys:
        hot = np.asarray(
            pc.fill_null(pc.is_in(conv_id, value_set=pa.array(list(cfg.hot_keys))), False)
        )
        if isinstance(turn_idx, pa.ChunkedArray):
            turn_idx = turn_idx.combine_chunks()
        turn = turn_idx.to_numpy(zero_copy_only=False)
        salted = mix_hash(h, turn.astype(np.int64))
        h = np.where(hot, salted, h)
    return (h % np.uint64(cfg.num_partitions)).astype(np.int32)


def _empty_clean() -> pa.Table:
    cols = {k: pa.array([], type=t) for k, t in _TARGET_TYPES.items()}
    cols["part"] = pa.array([], type=pa.int32())
    return pa.table(cols)


def _write_dirty(batch: pa.Table, reasons, mask, cfg: CdcConfig, run_id: str) -> None:
    idx = pa.array(mask)
    cols = {}
    for name in batch.column_names:
        c = batch[name]
        if pa.types.is_dictionary(c.type):
            c = c.cast(c.type.value_type)
        sub = c.filter(idx)
        try:
            cols[name] = sub.cast(pa.string())
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            # nested extra columns (list/struct) have no Arrow string cast;
            # the dirty channel must never fail the batch it exists to save,
            # so fall back to Python repr for just these rows
            cols[name] = pa.array(
                [None if v is None else str(v) for v in sub.to_pylist()],
                type=pa.string(),
            )
    cols["_reason"] = pa.array(reasons[mask], type=pa.string())
    d = cfg.dirty_dir(run_id)
    os.makedirs(d, exist_ok=True)
    atomic_write_parquet(os.path.join(d, f"dirty-{new_token()}.parquet"), pa.table(cols))


def count_dirty(cfg: CdcConfig, run_id: str) -> int:
    """Row count of the run's dirty side-output (footer metadata only)."""
    import pyarrow.parquet as pq

    d = cfg.dirty_dir(run_id)
    if not os.path.isdir(d):
        return 0
    return sum(
        pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def build_dirty_fixer(
    map_op: "dict[str, str] | None" = None,
    abs_turn: bool = False,
    null_bad_ts: bool = False,
    empty_text_insert: bool = False,
):
    """Compose the standard per-reason dead-letter repair rules into a
    vectorized fixer over dirty-channel batches (all-string columns +
    `_reason` as written by `_write_dirty`).

    Each rule touches ONLY rows flagged with its reason, and only the
    offending column — repaired rows re-enter `normalize_batch` through
    `pipeline.replay_dirty`, so nothing is ever force-inserted past
    validation (a row the rules don't cover simply re-routes to the new
    run's dirty channel with its original reason):

    - ``map_op``:        rows flagged ``bad_op`` with op in the mapping
                         get the mapped op (e.g. ``{"X": "U"}`` for a
                         producer that mislabels updates);
    - ``abs_turn``:      ``negative_turn_idx`` rows drop the sign;
    - ``null_bad_ts``:   ``uncastable_ts`` rows null the timestamp
                         (keep the row, lose the unparseable field);
    - ``empty_text_insert``: ``null_text_insert`` rows (e.g. a
                         nullFormat sentinel on an I) get text '' —
                         an explicit empty payload, which the sentinel
                         no longer erases on re-ingest.
    """

    def fixer(t: pa.Table) -> pa.Table:
        r = t["_reason"]

        def set_col(name: str, arr) -> pa.Table:
            return t.set_column(t.column_names.index(name), name, arr)

        if map_op:
            m = pc.equal(r, "bad_op")
            op = t["op"]
            for frm, to in sorted(map_op.items()):
                hit = pc.and_kleene(m, pc.equal(op, frm))
                op = pc.if_else(
                    pc.fill_null(hit, False), pa.scalar(to, pa.string()), op
                )
            t = set_col("op", op)
        if abs_turn:
            m = pc.fill_null(pc.equal(r, "negative_turn_idx"), False)
            t = set_col(
                "turn_idx",
                pc.if_else(m, pc.utf8_ltrim(t["turn_idx"], "-"), t["turn_idx"]),
            )
        if null_bad_ts:
            m = pc.fill_null(pc.equal(r, "uncastable_ts"), False)
            t = set_col(
                "ts", pc.if_else(m, pa.scalar(None, pa.string()), t["ts"])
            )
        if empty_text_insert:
            m = pc.fill_null(pc.equal(r, "null_text_insert"), False)
            t = set_col(
                "text", pc.if_else(m, pa.scalar("", pa.string()), t["text"])
            )
        return t

    return fixer
