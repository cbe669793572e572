"""The reference's Column cast matrix, vectorized (study citations:
StringColumn.java:34-140, ColumnCast.java:42-117, DateColumn.java:105-121).

Semantics preserved:
- string -> LONG: numeric parse with truncation toward zero (BigDecimal ->
  BigInteger); NaN/Infinity rejected (dirty); overflow rejected.
- string -> DOUBLE: accepts "NaN", "Infinity", "-Infinity".
- string -> BOOLEAN: case-insensitive "true"/"false" ONLY; anything else
  is dirty (StringColumn.java:124-140).
- string -> DATE: multi-format fallback — datetime, date, time, then
  extra formats (ColumnCast.java:87-117); unparseable -> dirty.
- nullFormat: EXACT string equality (not case-insensitive) -> null.

Each caster returns (values: pa.Array, bad: np.ndarray bool) — dirty
routing is the caller's job (mirrors dirty-record collection rather than
the reference's per-row exceptions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_DATE_FORMATS = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%H:%M:%S")

_I64_MAX = np.float64(2**63 - 1)
_I64_MIN = np.float64(-(2**63))


def apply_null_format(arr: pa.Array, null_format: "str | None") -> pa.Array:
    if null_format is None:
        return arr
    m = pc.fill_null(pc.equal(arr, null_format), False)
    return pc.if_else(m, pa.scalar(None, type=arr.type), arr)


def cast_string_to_long(arr) -> "tuple[pa.Array, np.ndarray]":
    """Exact numeric parse, mirroring the reference's BigDecimal ->
    BigInteger path (StringColumn.java:34-140): integral strings parse
    exactly (no float64 round-trip, so 64-bit IDs survive bit-perfect);
    decimal/scientific forms truncate toward zero via Decimal; overflow,
    NaN/Infinity and garbage are dirty.

    Fast path: the whole integral subset casts via Arrow's exact
    string->int64 kernel in one shot; only batches containing an
    overflowing integral value fall back to per-row Python ints, and only
    non-integral forms (rare in LONG columns) go through per-row Decimal.
    """
    s = arr.to_pandas() if not isinstance(arr, pd.Series) else arr
    st = s.str.strip()
    nn = st.notna().to_numpy()
    n = len(st)
    vals = np.zeros(n, dtype=np.int64)
    bad = np.zeros(n, dtype=bool)

    int_form = st.str.fullmatch(r"[+-]?[0-9]+").fillna(False).to_numpy()
    int_idx = np.nonzero(int_form)[0]
    if len(int_idx):
        sub = pa.array(st.to_numpy(dtype=object)[int_idx], type=pa.string())
        try:
            vals[int_idx] = sub.cast(pa.int64()).to_numpy(zero_copy_only=False)
        except pa.ArrowInvalid:
            # at least one integral value overflows int64: exact per-row
            for i in int_idx:
                v = int(st.iloc[i])
                if -(2**63) <= v < 2**63:
                    vals[i] = v
                else:
                    bad[i] = True
    other_idx = np.nonzero(nn & ~int_form)[0]
    if len(other_idx):
        from decimal import Decimal, InvalidOperation

        for i in other_idx:
            try:
                v = int(Decimal(st.iloc[i]))  # truncates toward zero
            except (InvalidOperation, OverflowError, ValueError):
                bad[i] = True
                continue
            if -(2**63) <= v < 2**63:
                vals[i] = v
            else:
                bad[i] = True

    mask = ~nn | bad
    return pa.array(vals, type=pa.int64(), mask=mask), bad


def cast_string_to_double(arr) -> "tuple[pa.Array, np.ndarray]":
    s = arr.to_pandas() if not isinstance(arr, pd.Series) else arr
    # pandas to_numeric accepts NaN/Infinity/-Infinity spellings like Java
    num = pd.to_numeric(s.str.strip(), errors="coerce")
    explicit_nan = s.str.strip().str.lower().isin(["nan"]).fillna(False)
    bad = (num.isna() & s.notna() & ~explicit_nan).to_numpy()
    mask = s.isna().to_numpy() | bad
    return pa.array(num.to_numpy(dtype=np.float64, na_value=np.nan), mask=mask), bad


def cast_string_to_bool(arr) -> "tuple[pa.Array, np.ndarray]":
    s = arr.to_pandas() if not isinstance(arr, pd.Series) else arr
    low = s.str.strip().str.lower()
    is_true = (low == "true").to_numpy()
    is_false = (low == "false").to_numpy()
    nn = s.notna().to_numpy()
    bad = nn & ~(is_true | is_false)
    return pa.array(is_true, type=pa.bool_(), mask=~nn | bad), bad


def cast_string_to_date(arr, formats=DEFAULT_DATE_FORMATS) -> "tuple[pa.Array, np.ndarray]":
    s = arr.to_pandas() if not isinstance(arr, pd.Series) else arr
    s = s.str.strip()  # symmetric with the long/double/bool casters
    out = pd.to_datetime(s, format=formats[0], errors="coerce")
    for fmt in formats[1:]:
        miss = out.isna() & s.notna()
        if not miss.any():
            break
        out[miss] = pd.to_datetime(s[miss], format=fmt, errors="coerce")
    bad = (out.isna() & s.notna()).to_numpy()
    return pa.Array.from_pandas(out, type=pa.timestamp("us")), bad


CASTERS = {
    "long": cast_string_to_long,
    "double": cast_string_to_double,
    "boolean": cast_string_to_bool,
    "bool": cast_string_to_bool,
    "date": cast_string_to_date,
}


def cast_string_column(arr, type_name: str, date_format: "str | None" = None):
    """Dispatch; returns (values, bad_mask). 'string' passes through."""
    t = type_name.lower()
    if t == "string":
        a = arr if isinstance(arr, pa.Array) else arr.combine_chunks()
        return a, np.zeros(len(a), dtype=bool)
    if t == "date" and date_format:
        return cast_string_to_date(arr, (date_format, *DEFAULT_DATE_FORMATS))
    if t not in CASTERS:
        raise ValueError(f"unsupported column type {type_name!r}")
    return CASTERS[t](arr)
