"""Shared utilities: deterministic hashing, atomic file commits, small I/O.

Design notes (scale):
- ``stable_hash_*`` must be deterministic ACROSS PROCESSES AND NODES — Python's
  builtin ``hash`` is salted per process and must never be used for
  partitioning.  We use pandas' ``hash_pandas_object`` (SipHash with a fixed
  key, vectorized in C, stable across processes/versions in practice) applied
  to the *dictionary* of a string column, so the per-batch cost is
  O(uniques + rows) rather than O(total string bytes).
- Atomic commits are plain ``write tmp -> os.replace``: POSIX rename is atomic
  on one filesystem, which is the exactly-once building block for partition
  flushes and lineage records (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# Mixing constant for combining a string-key hash with an int key
# (splitmix64 / golden-ratio constant, public domain).
_MIX = np.uint64(0x9E3779B97F4A7C15)


def stable_hash_strings(arr: "pa.Array | pa.ChunkedArray | np.ndarray | list") -> np.ndarray:
    """Deterministic uint64 hash of a string column, vectorized.

    Hashes only the unique values (via Arrow dictionary-encode) then gathers,
    so repeated keys (the common case for CDC logs: many events per conv_id)
    cost one lookup each.
    """
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        dict_arr = arr
    else:
        dict_arr = arr.dictionary_encode()
    uniq = dict_arr.dictionary.to_pandas()
    uniq_h = pd.util.hash_pandas_object(uniq, index=False).to_numpy(dtype=np.uint64)
    indices = dict_arr.indices.to_numpy(zero_copy_only=False)
    # Null keys hash to 0 (callers route null keys to dirty before hashing).
    out = np.zeros(len(arr), dtype=np.uint64)
    valid = indices >= 0 if indices.dtype.kind == "i" else np.ones(len(arr), bool)
    if dict_arr.indices.null_count:
        valid = ~np.asarray(dict_arr.indices.is_null())
    out[valid] = uniq_h[indices[valid]]
    return out


def mix_hash(h: np.ndarray, ints: np.ndarray) -> np.ndarray:
    """Combine a uint64 hash with an integer column (e.g. turn_idx) -> uint64."""
    x = (h ^ (ints.astype(np.uint64) + _MIX)) * _MIX
    return x ^ (x >> np.uint64(29))


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj, sort_keys=True, default=str).encode())


def atomic_write_parquet(path: str, table: pa.Table, **kwargs) -> None:
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, path)


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def new_token() -> str:
    return uuid.uuid4().hex


def resolve_fs(path: str):
    """(pyarrow.fs.FileSystem, fs_path) for a local path or any fsspec-style
    URI (file://, s3://, gs://, ...) — the reference's GcsReader listing
    generalized to every pyarrow-supported object store."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _reprefix(original: str, fs_path: str) -> str:
    """Re-attach the URI scheme so Ray's readers get full URIs back;
    file:// collapses to a plain local path (same filesystem)."""
    if "://" not in original:
        return fs_path
    scheme = original.split("://", 1)[0]
    if scheme == "file":
        return fs_path
    return f"{scheme}://{fs_path}"


def list_files(path: str, suffix: "str | None" = None) -> "list[str]":
    """Expand a file/dir path or URI into a sorted list of file paths
    (scheme preserved for remote stores)."""
    from pyarrow import fs as pafs

    fs, p = resolve_fs(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.File:
        return [_reprefix(path, p)]
    if info.type != pafs.FileType.Directory:
        raise FileNotFoundError(path)
    sel = pafs.FileSelector(p, recursive=False)
    out = [
        f.path
        for f in fs.get_file_info(sel)
        if f.type == pafs.FileType.File and (suffix is None or f.path.endswith(suffix))
    ]
    return [_reprefix(path, f) for f in sorted(out)]


def file_size(path: str) -> int:
    fs, p = resolve_fs(path)
    return fs.get_file_info(p).size or 0


def sized_read_parquet(path, columns=None, small_block_bytes: int = 1 << 20,
                       big_block_bytes: int = 32 << 20):
    """read_parquet with block count sized by DATA BYTES: small tables get
    ~small_block_bytes per block capped at CPU count (instead of Ray's
    default cpus*2 micro-split — pure task dispatch overhead on a 2 MB
    file), big inputs get ceil(bytes / big_block_bytes) blocks.  The block
    layout is a function of data size, so parallelism survives at 100 TB
    while tiny test tables don't pay 64 tasks of overhead."""
    import ray
    import ray.data

    sz = file_size(path)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb = max(-(-sz // big_block_bytes), min(-(-sz // small_block_bytes), cpus), 1)
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=nb)


def open_input(path: str):
    """Readable binary stream for a local path or URI.  pyarrow's
    open_input_stream auto-detects gz/bz2 by extension and decompresses."""
    fs, p = resolve_fs(path)
    return fs.open_input_stream(p)


def retry_call(fn, *, tries: int = 5, base_delay_s: float = 0.2, retriable=Exception):
    """Exponential-backoff retry for transient I/O (the reference's
    RetryUtil.executeWithRetry, common/.../util/RetryUtil.java:25-76 — it
    uses 9 tries around DB connects; Ray task retries cover task death,
    this covers in-task transient errors like DB reconnects)."""
    import time as _time

    last = None
    for attempt in range(tries):
        try:
            return fn()
        except retriable as e:  # noqa: PERF203
            last = e
            if attempt == tries - 1:
                break
            _time.sleep(base_delay_s * (2**attempt))
    raise last


def default_pool_size(cap: int = 16) -> int:
    """Actor-pool size that leaves CPUs for upstream read/shuffle stages —
    a pool reserving every CPU starves its own input and deadlocks the
    streaming executor."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus - 2))
