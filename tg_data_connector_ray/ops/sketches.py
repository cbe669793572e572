"""Mergeable sketches for large-scale profiling: HyperLogLog register
tables (approximate count-distinct) and the exact distinct-count
companion.

The HLL register table is itself the operator output — registers are pure
integers derived from md5, so a DuckDB oracle reconstructs them
bit-exactly (the ESTIMATE involves a float harmonic sum whose value
depends on summation order, so it stays a driver-side helper verified by
a tolerance test, not a hash oracle).  Registers merge by max — the
per-batch partial is a tiny (group, bucket, rho) table and the only
shuffle is the coarse-bucket max-merge, so the sketch costs O(groups x m)
exchange no matter how many rows stream through.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .dedup import _i64

HLL_M = 256  # 2^8 buckets; ~6.5% relative error, 14 leftover hex chars
_HLL_SALT = b"hll:"


def _bitlen_u64(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (float log2 is off-by-one near powers
    of two above 2^53, so no floats here)."""
    v = v.astype(np.uint64).copy()
    out = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        out[m] += s
        v[m] >>= np.uint64(s)
    return out + (v > 0)


def hll_partial_batch(batch: pa.Table, group_col: str, value_col: str) -> pa.Table:
    """(group, bucket, rho) partial registers for one batch: md5 once per
    UNIQUE value, bucket = first digest byte, rho = 1 + leading zeros of
    the next 56 bits (57 when all-zero), reduced to per-(group, bucket)
    max within the batch."""
    g = batch[group_col].combine_chunks().to_numpy(zero_copy_only=False)
    v = _i64(batch[value_col])
    uniq, inv = np.unique(v, return_inverse=True)
    buckets = np.empty(len(uniq), dtype=np.int64)
    v56 = np.empty(len(uniq), dtype=np.uint64)
    for i, u in enumerate(uniq):
        d = hashlib.md5(_HLL_SALT + str(u).encode()).digest()
        buckets[i] = d[0]
        v56[i] = int.from_bytes(d[1:8], "big")
    rho_u = np.where(v56 == 0, 57, 57 - _bitlen_u64(v56)).astype(np.int64)
    b, rho = buckets[inv], rho_u[inv]

    order = np.lexsort((rho, b, g))
    g, b, rho = g[order], b[order], rho[order]
    # last row of each (g, b) run holds the max rho (rho is the innermost
    # sort key)
    last = np.concatenate([(g[1:] != g[:-1]) | (b[1:] != b[:-1]), [True]])
    return pa.table(
        {
            group_col: pa.array(g[last]),
            "bucket": pa.array(b[last], pa.int64()),
            "rho": pa.array(rho[last], pa.int64()),
        }
    )


def hll_registers(ds, group_col: str, value_col: str):
    """Per-group HLL register table (group, bucket, reg) — the mergeable
    sketch state.  Absent buckets (no value hashed into them) are simply
    absent rows; `hll_estimate` treats them as zero registers."""
    from ..pipelines.relational import grouped_arrow_aggregate

    partial = ds.map_batches(
        lambda t: hll_partial_batch(t, group_col, value_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = grouped_arrow_aggregate(
        partial, [group_col, "bucket"], [("rho", "max")], ["reg"]
    )
    return merged


def hll_estimate(reg_table: pa.Table, group_col: str) -> dict:
    """Standard HLL estimate per group from a register table (driver-side
    helper over the tiny sketch; small-range correction included)."""
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    df = reg_table.to_pandas()
    out = {}
    for grp, sub in df.groupby(group_col):
        regs = np.zeros(m, dtype=np.int64)
        regs[sub["bucket"].to_numpy(np.int64)] = sub["reg"].to_numpy(np.int64)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out[grp] = float(est)
    return out


def grouped_distinct_count(ds, group_col: str, value_col: str, out_name: str = "n_distinct"):
    """Exact count-distinct per group: coarse-bucket distinct (group,
    value) pairs (hash of the group column keeps each group whole per
    bucket), then a coarse-bucket count — shuffle volume is the distinct
    pairs, never the raw rows."""
    from ..pipelines.relational import distinct_rows, grouped_arrow_aggregate

    pairs = distinct_rows(
        ds.map_batches(
            lambda t: pa.table({group_col: t[group_col], value_col: t[value_col]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        [group_col, value_col],
    )
    return grouped_arrow_aggregate(pairs, group_col, [(value_col, "count")], [out_name])
