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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequent-items summary)


def _mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Reduce a (key, count) summary to at most k counters: subtract the
    (k+1)-th largest count from all and drop the non-positive — the
    classic Misra-Gries decrement, vectorized.  Each key's surviving
    count underestimates its true count by at most the subtracted value,
    and the subtracted values across all compressions sum to at most
    N/(k+1) (mergeable-summaries bound), so every key with true frequency
    above N/(k+1) is guaranteed to survive."""
    if len(keys) <= k:
        return keys, counts
    dec = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > dec
    return keys[keep], counts[keep] - dec


def mg_partial_batch(batch: pa.Table, key_col: str, k: int) -> pa.Table:
    """One block's Misra-Gries summary: exact in-block counts (np.unique)
    compressed to <= k counters.  Emitting the summary instead of raw
    counts bounds the shuffle at k rows per block no matter how many
    distinct keys the block holds.

    The block's ROW COUNT rides along on the first summary row
    (`block_rows`; 0 elsewhere), so the driver derives N = sum(block_rows)
    from this same pass — no separate ds.count() execution.  A non-empty
    block whose compress drops every counter (all counts equal, > k keys)
    emits one zero-count counter to carry it; an extra candidate never
    breaks the MG superset guarantee."""
    ids = _i64(batch[key_col])
    keys, counts = np.unique(ids, return_counts=True)
    keys, counts = _mg_compress(keys, counts.astype(np.int64), k)
    if batch.num_rows and not len(keys):
        keys = ids[:1]
        counts = np.zeros(1, np.int64)
    block_rows = np.zeros(len(keys), np.int64)
    if len(keys):
        block_rows[0] = batch.num_rows
    return pa.table(
        {
            key_col: pa.array(keys, pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "block_rows": pa.array(block_rows, pa.int64()),
        }
    )


def heavy_hitters(ds, key_col: str, phi: float = 0.001, k: int = 4096,
                  materialize_input: bool = False) -> pa.Table:
    """EXACT heavy hitters: every key whose count >= ceil(phi * N), with
    its exact count — sketch-guided, exactness restored by a verification
    pass (the same oracle-able pattern as ivf_ann's nprobe=K).

    Shape: (1) per-block Misra-Gries summaries (<= k rows each, carrying
    the block row count) merge on the driver (sum by key, one final
    compress; N = sum of block_rows — no separate ds.count() execution) —
    candidate keys are a guaranteed SUPERSET of the true heavy hitters
    when phi > 1/(k+1), asserted; (2) one streaming pass counts ONLY the
    <= k candidate keys exactly (broadcast is_in filter + per-block
    partial counts, driver reduce); (3) keep candidates whose exact count
    clears the threshold.  The raw keys never shuffle; driver state is
    O(k x blocks) partials.

    Two executions of `ds` total (the exact-verify minimum).  When `ds`
    is a mapped PIPELINE rather than a bare read, each execution re-runs
    its upstream graph — pass `materialize_input=True` to pin the (thin)
    input once in the object store instead."""
    import pandas as pd
    import pyarrow.compute as pc

    if phi <= 1.0 / (k + 1):
        raise ValueError(f"phi={phi} must exceed 1/(k+1)={1/(k+1):.2e} for the MG guarantee")
    if materialize_input:
        ds = ds.materialize()
    parts = ds.map_batches(
        lambda t: mg_partial_batch(t, key_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    if not len(parts):
        return pa.table({key_col: pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    n_total = int(parts["block_rows"].sum())
    thresh = int(np.ceil(phi * n_total)) if n_total else 0
    merged = parts.groupby(key_col, as_index=False)["n"].sum()
    keys, counts = _mg_compress(
        merged[key_col].to_numpy(np.int64), merged["n"].to_numpy(np.int64), k
    )
    cand = pa.array(np.sort(keys), pa.int64())

    def exact_counts(t: pa.Table) -> pa.Table:
        kc = t[key_col]
        hit = pc.fill_null(pc.is_in(kc, value_set=cand), False)
        ids = _i64(t.filter(hit)[key_col])
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {key_col: pa.array(u, pa.int64()), "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    ex = ds.map_batches(
        exact_counts, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    ex = ex.groupby(key_col, as_index=False)["n"].sum() if len(ex) else ex
    out = ex[ex["n"] >= max(thresh, 1)].sort_values(key_col) if len(ex) else ex
    if not len(out):
        return pa.table({key_col: pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    return pa.table(
        {
            key_col: pa.array(out[key_col].to_numpy(np.int64), pa.int64()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
        }
    )


def value_histogram(
    ds, value_col: str, lo: float, hi: float, n_buckets: int
) -> pa.Table:
    """Equal-width histogram over [lo, hi) with underflow (-1) and
    overflow (n_buckets) buckets — exact and oracle-reproducible because
    bucketing happens in u6 INTEGER space: vu = round_even(value·10⁶),
    bucket = (vu − lo_u)·n // (hi_u − lo_u) with a non-negative numerator
    by construction (under/overflow split off first), so numpy floor
    division and SQL's truncating // agree.

    The cheapest possible distributed shape: one bincount partial per
    block (n_buckets+2 ints — never the rows), a driver group_by fold.
    Nulls are not counted (SQL count(*) over a CASE of a NULL input
    would; callers drop nulls first if they carry any)."""
    lo_u = int(round(lo * 1e6))
    hi_u = int(round(hi * 1e6))
    if hi_u <= lo_u or n_buckets < 1:
        raise ValueError("need hi > lo and n_buckets >= 1")
    width = hi_u - lo_u

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks()
        v = v.drop_null()
        if len(v) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vu = np.round(
            v.cast(pa.float64()).to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        b = np.empty(len(vu), np.int64)
        under = vu < lo_u
        over = vu >= hi_u
        mid = ~(under | over)
        b[under] = -1
        b[over] = n_buckets
        b[mid] = (vu[mid] - lo_u) * n_buckets // width
        counts = np.bincount(b + 1, minlength=n_buckets + 2)
        nz = np.nonzero(counts)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64) - 1),
                         "n": pa.array(counts[nz].astype(np.int64))})

    parts = pa.Table.from_pylist(
        ds.map_batches(partial, batch_format="pyarrow").take_all()
    )
    if parts.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    agg = parts.group_by("bucket").aggregate([("n", "sum")])
    return pa.table(
        {"bucket": agg["bucket"], "n": agg["n_sum"].cast(pa.int64())}
    ).sort_by([("bucket", "ascending")])
