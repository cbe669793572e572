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
