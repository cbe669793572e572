"""Reference transformer-chain parity, vectorized over Arrow batches.

Re-implements the exact semantics of the reference's built-in ``dx_*``
transformers (studied, not copied, from
core/src/main/java/com/alibaba/datax/core/transport/transformer/):

- ``dx_substr(col, start, len)``   — SubstrTransformer.java:21-64:
  null passes through untouched; ``start > len(s)`` => dirty record;
  else ``s[start : min(start+len, len(s))]``.
- ``dx_pad(col, 'l'|'r', len, pad)`` — PadTransformer.java:21-88:
  null treated as ""; value longer than len => truncated to first len
  chars; else padded with `pad` repeated and truncated to fit.
- ``dx_replace(col, start, len, repl)`` — ReplaceTransformer.java:21-65:
  null passes through; ``start > len(s)`` => dirty;
  else ``s[:start] + repl + s[start+len:]`` (tail clamps to "").
- ``dx_filter(col, op, val)``      — FilterTransformer.java: DROPS the row
  when the predicate matches (an *inverted* filter):
    * ``like`` / ``not like``: full-regex match (Java ``String.matches``);
      ``like`` drops on match; ``not like`` drops when the value is null OR
      does not match.
    * ``> >= < <=``: typed compare — float for floating columns, int for
      integer/timestamp columns, lexicographic for string/bool/binary.
      Null never participates: the row is KEPT.
    * ``=``/``==``: null column drops only when val is the literal string
      "null" (case-insensitive); else drops on typed equality.
    * ``!=``: null column is KEPT only when val is "null", else dropped;
      non-null drops on inequality.
- ``dx_udf(fn)`` — the dx_groovy analogue (GroovyTransformer.java:25-88):
  an arbitrary user Python callable ``pa.Table -> pa.Table`` registered by
  name; our user-extension surface (SURVEY.md §2.7).

The chain runs record-parallel but batch-vectorized: each step computes a
keep/dirty mask or a new column with pyarrow.compute kernels; dirty rows
short-circuit the rest of the chain for that row (reference
TransformerExchanger.java:85-95 aborts the chain per record) and are
reported through a pluggable collector.  Transform metrics mirror
TRANSFORMER_{SUCCEED,FAILED,FILTER}_RECORDS (CommunicationTool.java:46-50).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class TransformError(ValueError):
    pass


def _resolve_col(batch: pa.Table, col) -> str:
    """Accept a column name or (reference-style) positional index."""
    if isinstance(col, int):
        return batch.column_names[col]
    return col


def _as_string(arr):
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return arr.cast(pa.string())


@dataclass
class ChainResult:
    table: pa.Table
    filtered: int = 0  # rows dropped by dx_filter (TRANSFORMER_FILTER_RECORDS)
    dirty: int = 0  # rows errored out of the chain (TRANSFORMER_FAILED_RECORDS)
    dirty_rows: "pa.Table | None" = None  # stringified rows + _reason


def dx_substr(batch: pa.Table, col, start: int, length: int):
    """Returns (new_column_values, dirty_mask)."""
    name = _resolve_col(batch, col)
    s = _as_string(batch[name].combine_chunks() if isinstance(batch[name], pa.ChunkedArray) else batch[name])
    n_chars = pc.utf8_length(s)
    dirty = pc.fill_null(pc.greater(pa.scalar(start), n_chars), False)
    out = pc.utf8_slice_codeunits(s, start=start, stop=start + length)
    # nulls pass through untouched (slice keeps null), dirty rows handled by caller
    return name, out, np.asarray(dirty.to_numpy(zero_copy_only=False), dtype=bool)


def dx_pad(batch: pa.Table, col, pad_type: str, length: int, pad_string: str):
    if pad_type.lower() not in ("l", "r"):
        raise TransformError(f"dx_pad pad type must be l or r, got {pad_type!r}")
    if not pad_string:
        raise TransformError("dx_pad padString must be non-empty")
    name = _resolve_col(batch, col)
    s = _as_string(batch[name])
    s = pc.fill_null(s, "")  # null treated as empty string
    # too-long values truncate to the first `length` chars
    truncated = pc.utf8_slice_codeunits(s, start=0, stop=length)
    # pyarrow pads with a single char only; replicate multi-char pad by
    # padding with a placeholder then building the pad prefix/suffix in
    # numpy for rows that need it (rare path kept vectorized via ~uniques).
    if len(pad_string) == 1:
        padded = (
            pc.utf8_lpad(truncated, width=length, padding=pad_string)
            if pad_type.lower() == "l"
            else pc.utf8_rpad(truncated, width=length, padding=pad_string)
        )
        return name, padded, np.zeros(batch.num_rows, dtype=bool)
    vals = truncated.to_pylist()
    out = []
    for v in vals:
        need = length - len(v)
        if need <= 0:
            out.append(v)
            continue
        fill = (pad_string * (need // len(pad_string) + 1))[:need]
        out.append(fill + v if pad_type.lower() == "l" else v + fill)
    return name, pa.array(out, type=pa.string()), np.zeros(batch.num_rows, dtype=bool)


def dx_replace(batch: pa.Table, col, start: int, length: int, repl: str):
    name = _resolve_col(batch, col)
    s = _as_string(batch[name].combine_chunks() if isinstance(batch[name], pa.ChunkedArray) else batch[name])
    n_chars = pc.utf8_length(s)
    dirty = pc.fill_null(pc.greater(pa.scalar(start), n_chars), False)
    head = pc.utf8_slice_codeunits(s, start=0, stop=start)
    tail = pc.utf8_slice_codeunits(s, start=start + length, stop=2**31 - 1)
    out = pc.binary_join_element_wise(head, pa.scalar(repl), tail, "")
    # nulls pass through
    out = pc.if_else(pc.is_null(s), s, out)
    return name, out, np.asarray(dirty.to_numpy(zero_copy_only=False), dtype=bool)


def dx_filter_mask(batch: pa.Table, col, code: str, value: str) -> np.ndarray:
    """Boolean DROP mask per the reference's inverted-filter semantics."""
    name = _resolve_col(batch, col)
    arr = batch[name]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    null = np.asarray(pc.is_null(arr).to_numpy(zero_copy_only=False), dtype=bool)
    code = code.lower()

    if code in ("like", "not like"):
        s = _as_string(arr)
        m = pc.fill_null(pc.match_substring_regex(s, f"^(?:{value})$"), False)
        m = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
        # like: drop on (non-null and match); not like: drop on (null or no match)
        return (m & ~null) if code == "like" else (null | ~m)

    t = arr.type
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        cmp_arr, cmp_val = arr.cast(pa.float64()), pa.scalar(float(value))
    elif pa.types.is_integer(t):
        cmp_arr, cmp_val = arr.cast(pa.int64()), pa.scalar(int(value))
    elif pa.types.is_timestamp(t):
        # reference DateColumn compares epoch-millis as long
        cmp_arr = arr.cast(pa.timestamp("ms"), safe=False).cast(pa.int64())
        cmp_val = pa.scalar(int(value))
    else:
        cmp_arr, cmp_val = _as_string(arr), pa.scalar(str(value))

    if code in (">", ">=", "<", "<="):
        kernel = {">": pc.greater, ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}[code]
        m = pc.fill_null(kernel(cmp_arr, cmp_val), False)
        return np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool) & ~null
    if code in ("=", "=="):
        m = pc.fill_null(pc.equal(cmp_arr, cmp_val), False)
        m = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool) & ~null
        if value.lower() == "null":
            m |= null
        return m
    if code == "!=":
        m = pc.fill_null(pc.not_equal(cmp_arr, cmp_val), False)
        m = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool) & ~null
        if value.lower() != "null":
            m |= null
        return m
    raise TransformError(f"dx_filter unsupported op: {code}")


# ---------------------------------------------------------------------------
# chain driver

_UDF_REGISTRY: dict = {}


def register_udf(name: str, fn) -> None:
    """Register a user transform (the dx_groovy / jar-drop-in analogue).

    ``fn(table: pa.Table) -> pa.Table`` may alter columns or drop rows.
    """
    _UDF_REGISTRY[name] = fn


def get_udf(name: str):
    return _UDF_REGISTRY[name]


_DX_PY_DROP = object()  # row-mode sentinel: drop this row (dx_groovy's null)


def compile_py_transformer(code: str, col: "str | int | None" = None,
                           mode: str = "vector"):
    """The dx_groovy analogue: an INLINE-CONFIG code string compiled once
    into a chain UDF (reference GroovyTransformer.java:25-88 compiles the
    config's groovy source per chain; here the config carries a Python
    expression — same trust model, the job config is code).

    mode="vector" (the idiomatic path): `code` is an expression evaluated
    once per BATCH with `col` bound to the selected column (pyarrow
    Array) and pa/pc/np in scope; it returns the replacement column.
    mode="row": `code` is evaluated once per ROW with `value` bound to
    the cell (the reference's record-at-a-time groovy shape — slow,
    compatibility escape hatch); returning DROP drops the row.

    Returns a table->table callable for the dx_udf chain step; row drops
    are counted as FILTERED by the chain driver, like any UDF."""
    if mode not in ("vector", "row"):
        raise TransformError(f"dx_py mode must be vector|row, got {mode!r}")
    if mode == "vector" and col is None:
        raise TransformError(
            "dx_py vector mode needs a column (columnIndex/column) — the "
            "expression's `col` binding has nothing to point at"
        )
    compiled = compile(code, "<dx_py>", "eval")
    base_env = {
        "pa": pa, "pc": pc, "np": np, "DROP": _DX_PY_DROP,
        "__builtins__": {
            "len": len, "str": str, "int": int, "float": float, "bool": bool,
            "min": min, "max": max, "abs": abs, "round": round, "None": None,
            "True": True, "False": False,
        },
    }

    def _fn(table: pa.Table) -> pa.Table:
        name = _resolve_col(table, col) if col is not None else None
        arr = table[name].combine_chunks() if name is not None else None
        if mode == "vector":
            out = eval(compiled, dict(base_env), {"col": arr, "table": table})
            if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                out = pa.array(out)
            i = table.column_names.index(name)
            return table.set_column(i, name, out)
        # row mode: value-at-a-time, DROP sentinel removes the row
        vals, keep = [], []
        for v in (arr.to_pylist() if arr is not None else [None] * table.num_rows):
            r = eval(compiled, dict(base_env), {"value": v})
            keep.append(r is not _DX_PY_DROP)
            vals.append(None if r is _DX_PY_DROP else r)
        if name is not None:
            i = table.column_names.index(name)
            table = table.set_column(
                i, name, pa.array(vals, type=arr.type if arr is not None else None)
            )
        mask = pa.array(keep)
        return table.filter(mask)

    return _fn


@dataclass
class TransformSpec:
    """One step of a transformer chain (the job-JSON `transformer[]` item)."""

    name: str  # dx_substr | dx_pad | dx_replace | dx_filter | dx_udf
    col: "str | int | None" = None
    params: dict = field(default_factory=dict)


def apply_chain(batch: pa.Table, specs: "list[TransformSpec]") -> ChainResult:
    """Apply a transformer chain to one Arrow batch.

    Dirty rows (per-row errors like substr start-out-of-range) abort the
    remainder of the chain for that row and are returned stringified with a
    `_reason` column; filter drops are counted separately — mirroring the
    reference's TRANSFORMER_FAILED vs TRANSFORMER_FILTER metrics.
    """
    n = batch.num_rows
    alive = np.ones(n, dtype=bool)
    dirty_reason = np.full(n, None, dtype=object)
    filtered = 0
    tracking = True  # row-identity tracking (lost after a row-dropping UDF)
    work = batch

    for spec in specs:
        if work.num_rows == 0:
            break
        if spec.name == "dx_filter":
            drop = dx_filter_mask(work, spec.col, spec.params["op"], str(spec.params["value"]))
            filtered += int(drop.sum())
            work = work.filter(pa.array(~drop))
            if tracking:
                alive_idx = np.nonzero(alive)[0]
                alive[alive_idx[drop]] = False
        elif spec.name in ("dx_substr", "dx_pad", "dx_replace"):
            if spec.name == "dx_substr":
                name, vals, dirty = dx_substr(work, spec.col, int(spec.params["start"]), int(spec.params["length"]))
            elif spec.name == "dx_pad":
                name, vals, dirty = dx_pad(work, spec.col, spec.params["pad_type"], int(spec.params["length"]), spec.params["pad_string"])
            else:
                name, vals, dirty = dx_replace(work, spec.col, int(spec.params["start"]), int(spec.params["length"]), spec.params["replace"])
            i = work.column_names.index(name)
            work = work.set_column(i, name, vals)
            if dirty.any():
                if tracking:
                    alive_idx = np.nonzero(alive)[0]
                    sub = alive_idx[dirty]
                    dirty_reason[sub] = f"{spec.name}_out_of_range"
                    alive[sub] = False
                work = work.filter(pa.array(~dirty))
        elif spec.name == "dx_udf":
            fn = spec.params.get("fn") or get_udf(spec.params["udf"])
            before = work.num_rows
            work = fn(work)
            if work.num_rows != before:
                # UDFs may drop rows (dx_groovy returning null); counted as
                # filtered; per-row identity is no longer tracked after this
                filtered += before - work.num_rows
                tracking = False
        else:
            raise TransformError(f"unknown transformer {spec.name}")

    dirty_mask = dirty_reason != None  # noqa: E711
    dirty_rows = None
    n_dirty = int(dirty_mask.sum())
    if n_dirty:
        sel = pa.array(dirty_mask)
        cols = {c: _as_string(batch[c].combine_chunks()).filter(sel) for c in batch.column_names}
        cols["_reason"] = pa.array(dirty_reason[dirty_mask], type=pa.string())
        dirty_rows = pa.table(cols)
    return ChainResult(table=work, filtered=filtered, dirty=n_dirty, dirty_rows=dirty_rows)


def chain_stage(specs: "list[TransformSpec]"):
    """A map_batches-ready function applying the chain (clean rows only)."""

    def _fn(batch: pa.Table) -> pa.Table:
        return apply_chain(batch, specs).table

    return _fn
