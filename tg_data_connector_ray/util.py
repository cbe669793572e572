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
import pyarrow as pa

# Mixing constant for combining a string-key hash with an int key
# (splitmix64 / golden-ratio constant, public domain).
_MIX = np.uint64(0x9E3779B97F4A7C15)


# Odd (hence invertible mod 2^64) multiplier for the polynomial string
# hash below: the 64-bit FNV prime.  PINV is its modular inverse.
_POLY_P = np.uint64(0x00000100000001B3)
_POLY_PINV = np.uint64(pow(0x00000100000001B3, -1, 1 << 64))

# Strings at or below this length take the padded-Horner fast path in
# `_hash_string_values`; longer batches use the prefix-sum path.  Both
# compute the identical polynomial, so mixed batches route identically.
_PADDED_MAX_LEN = 64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Finalizing avalanche (splitmix64, public domain)."""
    z = (x + _MIX).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_string_values(sa: "pa.Array") -> np.ndarray:
    """uint64 hash of a (Large)String array via its raw Arrow buffers.

    Pure-numpy polynomial hash, O(total bytes), no per-row Python:
    h_i = (S[end_i] - S[start_i]) * P^-start_i where S is the prefix sum of
    byte_j * P^j over the shared data buffer (uint64 wraparound arithmetic,
    P odd so P^-1 exists mod 2^64), finalized with splitmix64 mixed with
    the length.  Deterministic across processes/versions — partition
    assignment of persisted CDC state depends on that.  Nulls hash to 0.
    """
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(sa.type) else np.int32
    off = np.frombuffer(sa.buffers()[1], dtype=off_dtype)[
        sa.offset : sa.offset + n + 1
    ].astype(np.int64)
    start, stop = off[:-1], off[1:]
    lo = int(start[0])
    hi = int(stop[-1]) if n else lo  # offsets are monotonic
    buf = sa.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)[lo:hi]
        if buf is not None and hi > lo
        else np.empty(0, dtype=np.uint8)
    )
    m = data.size
    lengths = stop - start
    max_len = int(lengths.max()) if n else 0
    if max_len <= _PADDED_MAX_LEN:
        # Short-key fast path (partition-routing keys like conv_id): group
        # rows by exact byte length; per group accumulate
        # sum_t (byte_t + 1) * P^t — the identical polynomial the
        # prefix-sum path computes — one position at a time through four
        # PREALLOCATED flat buffers (index, uint8 gather, uint64 term,
        # accumulator).  Flat-buffer reuse is the point: the (rows x len)
        # matrix formulations measured 10-15x slower here because every
        # 2-D intermediate is a fresh hundreds-of-MB allocation
        # (page-fault bound), while these per-position passes stream
        # through warm cache.  ~0.24 us/key at 2M 17-byte keys; routing
        # sits on the CDC phase-A hot path.
        pw = np.empty(max(max_len, 1), dtype=np.uint64)
        pw[0] = 1
        if max_len > 1:
            np.multiply.accumulate(
                np.full(max_len - 1, _POLY_P, dtype=np.uint64), out=pw[1:]
            )
        h = np.zeros(n, dtype=np.uint64)
        starts0 = start - lo
        ibuf = np.empty(n, dtype=np.int64)
        g8 = np.empty(n, dtype=np.uint8)
        g64 = np.empty(n, dtype=np.uint64)
        for length in np.unique(lengths):
            length = int(length)
            if not length:
                continue  # empty strings keep h=0 (matches prefix path)
            rows = np.nonzero(lengths == length)[0]
            nb = len(rows)
            base = starts0[rows]
            acc = np.zeros(nb, dtype=np.uint64)
            for t in range(length):
                np.add(base, t, out=ibuf[:nb])
                np.take(data, ibuf[:nb], out=g8[:nb])
                np.add(g8[:nb], np.uint64(1), out=g64[:nb], casting="unsafe")
                np.multiply(g64[:nb], pw[t], out=g64[:nb])
                np.add(acc, g64[:nb], out=acc)
            h[rows] = acc
        out = _splitmix64(h ^ (lengths.astype(np.uint64) * _MIX))
        if sa.null_count:
            out[np.asarray(sa.is_null())] = 0
        return out
    # P^0..P^m and P^-0..P^-m by accumulate (wraparound uint64)
    pw = np.empty(m + 1, dtype=np.uint64)
    pw[0] = 1
    np.multiply.accumulate(np.full(m, _POLY_P, dtype=np.uint64), out=pw[1:])
    ipw = np.empty(m + 1, dtype=np.uint64)
    ipw[0] = 1
    np.multiply.accumulate(np.full(m, _POLY_PINV, dtype=np.uint64), out=ipw[1:])
    terms = (data.astype(np.uint64) + np.uint64(1)) * pw[:m]
    s = np.empty(m + 1, dtype=np.uint64)
    s[0] = 0
    np.cumsum(terms, out=s[1:])
    a = start - lo
    b = stop - lo
    raw = (s[b] - s[a]) * ipw[a]
    out = _splitmix64(raw ^ ((b - a).astype(np.uint64) * _MIX))
    if sa.null_count:
        out[np.asarray(sa.is_null())] = 0
    return out


try:  # native xxhash via polars: ~20x faster than any numpy byte loop
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked into the target env
    _pl = None

# Which provider produced the persisted partition mapping.  Recorded in the
# CDC state-format marker (cdc/pipeline.py) so a provider/version change is
# an explicit error on resume, never a silent key->partition remap.
# Routing uses ONLY the library-independent numpy polynomial hash: polars
# does not document xxhash stability across its own releases, and a worker
# missing polars must never route a key differently mid-run.
HASH_PROVIDER = "numpy-poly:1"


def _hash_with_coercion(arr, leaf_hash, self_fn) -> np.ndarray:
    """Shared preamble for the string-hash entry points: coerce
    list/numpy/ChunkedArray input to one pa.Array, and for dictionary
    input hash only the dictionary then gather (null indices -> 0).
    `leaf_hash` handles the flat string array; `self_fn` recurses on the
    dictionary values so each entry point keeps its own provider."""
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        uniq_h = self_fn(arr.dictionary)
        indices = arr.indices.to_numpy(zero_copy_only=False)
        out = np.zeros(len(arr), dtype=np.uint64)
        valid = np.ones(len(arr), dtype=bool)
        if arr.indices.null_count:
            valid = ~np.asarray(arr.indices.is_null())
        out[valid] = uniq_h[indices[valid].astype(np.int64)]
        return out
    return leaf_hash(arr)


def routing_hash_strings(arr: "pa.Array | pa.ChunkedArray | np.ndarray | list") -> np.ndarray:
    """Version-independent uint64 hash for PERSISTED partition routing.

    Always the pure-numpy polynomial hash (`_hash_string_values`, provider
    `numpy-poly:1`) — its mapping depends on nothing but this repo's own
    arithmetic, so state written today routes identically under any future
    polars/pandas/pyarrow.  Use `stable_hash_strings` for hashes that never
    outlive a run (coarse buckets, salting, checksums); use this for any
    key -> partition mapping that is written to disk.
    """
    return _hash_with_coercion(arr, _hash_string_values, routing_hash_strings)


def stable_hash_strings(arr: "pa.Array | pa.ChunkedArray | np.ndarray | list") -> np.ndarray:
    """Deterministic uint64 hash of a string column, vectorized.

    Hot path: polars ``Series.hash`` (native xxhash, fixed seed —
    deterministic across processes but NOT guaranteed across polars
    versions, which is why persisted routing uses `routing_hash_strings`
    instead).  Fallback: the pure-numpy polynomial hash.  Nulls hash to 0
    on both paths.  Dictionary input hashes only the dictionary then
    gathers.
    """

    def leaf(arr: pa.Array) -> np.ndarray:
        if _pl is None:
            return _hash_string_values(arr)
        out = _pl.from_arrow(arr).hash(seed=0).to_numpy()
        if arr.null_count:
            out = out.copy()  # polars to_numpy may be zero-copy read-only
            out[np.asarray(arr.is_null())] = 0
        return out

    return _hash_with_coercion(arr, leaf, stable_hash_strings)


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


# Spool dirs created by spool_checkpoint this process, removed at exit —
# each holds a full parquet copy of its dataset, so leaking them across
# repeated runs would fill the scratch volume.
_SPOOL_PATHS: "list[str]" = []


def _cleanup_spools() -> None:  # pragma: no cover - exercised at exit
    import shutil

    for p in _SPOOL_PATHS:
        shutil.rmtree(p, ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_spools)


# spool_checkpoint keeps the checkpoint pinned in the object store only
# below this on-disk size — a BOUNDED cache (compressed parquet bytes, so
# the in-memory pin is a small multiple); larger checkpoints stream from
# the spool per consumer.
SPOOL_CACHE_BYTES = 1 << 30


def spool_checkpoint(ds, name: str = "ds", root: "str | None" = None,
                     cache_bytes: int = SPOOL_CACHE_BYTES,
                     size_hint_bytes: "int | None" = None):
    """Checkpoint a Dataset to a Parquet spool; returns `read(columns=None)`
    giving a reader per consumer.

    The multi-consumer alternative to ``Dataset.materialize()``:
    materialize pins EVERY block in the object store for the life of the
    handle — an UNBOUNDED whole-dataset memory pin when the Dataset
    carries text — while a spool is ONE parallel partitioned write plus
    per-consumer column-pruned streaming reads, and on a cluster it lives
    on shared storage instead of object-store memory (the CDC
    spool-exchange idiom, cdc/pipeline.py).  Checkpoints at or under
    `cache_bytes` on disk additionally pin ONE shared read in the object
    store (explicitly bounded, unlike materialize), so small/mid inputs
    don't pay per-consumer re-reads; pass cache_bytes=0 to always
    stream.

    `size_hint_bytes` (typically the SOURCE parquet size, known before
    execution) short-circuits the disk round-trip entirely for inputs the
    bound already admits: the checkpoint is a plain materialize whose pin
    is bounded by `cache_bytes` via the hint — the dual-path constant
    idiom (SMALL_VOCAB / SMALL_USER_SET) applied to checkpointing.

    Reclamation: the spool directory is removed when the returned reader
    AND every Dataset it produced are garbage-collected (each returned
    Dataset holds a keepalive to the spool lease, so dropping the reader
    while a lazily-streaming Dataset is still unconsumed cannot delete
    the files under it), or eagerly via ``read.cleanup()`` after the last
    consumer finishes.  Interpreter exit remains the backstop — a
    long-lived driver checkpointing per request no longer accumulates
    corpus copies until then."""
    import tempfile
    import weakref

    import ray.data

    if size_hint_bytes is not None and size_hint_bytes <= cache_bytes:
        mat = ds.materialize()

        def read_cached(columns: "list[str] | None" = None):
            return mat.select_columns(columns) if columns else mat

        read_cached.cleanup = lambda: None  # no spool to reclaim
        return read_cached

    path = os.path.join(
        root or os.path.join(tempfile.gettempdir(), "graft_spools"),
        f"{name}-{new_token()}",
    )
    os.makedirs(path, exist_ok=True)
    _SPOOL_PATHS.append(path)  # reclaimed at interpreter exit (backstop)
    ds.write_parquet(path)
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    cached = ray.data.read_parquet(path).materialize() if size <= cache_bytes else None

    lease = _SpoolLease()  # finalized only when reader AND datasets are gone

    def read(columns: "list[str] | None" = None):
        if cached is not None:
            ds = cached.select_columns(columns) if columns else cached
        else:
            ds = ray.data.read_parquet(path, columns=columns)
        # the Dataset reads the spool lazily: pin the lease to it so the
        # reclaim can't fire while any produced Dataset is still alive
        ds._spool_keepalive = lease
        return ds

    def _reclaim():
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        try:
            _SPOOL_PATHS.remove(path)
        except ValueError:
            pass

    weakref.finalize(lease, _reclaim)
    read._spool_keepalive = lease
    read.cleanup = _reclaim
    return read


class _SpoolLease:
    """Weakref-able token tying a spool directory's lifetime to its reader
    and every Dataset the reader produced (see spool_checkpoint)."""


# scheme -> (factory | None, kwargs): object-store credentials/options
# registered via set_fs_options and consulted by resolve_fs.
_FS_FACTORIES: "dict[str, tuple]" = {}


def set_fs_options(scheme: str, factory=None, **options) -> None:
    """Register credentials/options for a URI scheme — the reference
    GcsReader's service-account JSON config (gcsreader/.../GcsReader.java:
    56-134 builds a Storage client from an inline key) generalized to any
    pyarrow filesystem: `options` are the constructor kwargs of the
    scheme's pyarrow.fs class (GcsFileSystem: access_token,
    target_service_account, anonymous...; S3FileSystem: access_key,
    secret_key, session_token, region...), or of an explicit `factory`
    callable.  Every listing/open/size helper in this module routes
    through resolve_fs and therefore picks these up.

    Scope note: the registry is per-process.  Driver-side path expansion
    (list_files, file_size, spool scans) is covered automatically; for
    the READ TASKS of a Ray Dataset pass `filesystem=filesystem_for(uri)`
    to read_parquet/read_csv — the constructed filesystem object is
    serialized into the tasks, so credentials never need to exist on
    worker disks."""
    _FS_FACTORIES[scheme.lower()] = (factory, options)


def clear_fs_options(scheme: "str | None" = None) -> None:
    if scheme is None:
        _FS_FACTORIES.clear()
    else:
        _FS_FACTORIES.pop(scheme.lower(), None)


def _fs_from_registry(scheme: str):
    entry = _FS_FACTORIES.get(scheme)
    if entry is None:
        return None
    factory, options = entry
    if factory is None:
        from pyarrow import fs as pafs

        classes = {
            "s3": pafs.S3FileSystem,
            "gs": pafs.GcsFileSystem,
            "gcs": pafs.GcsFileSystem,
            "hdfs": pafs.HadoopFileSystem,
            "file": pafs.LocalFileSystem,
        }
        if scheme not in classes:
            raise ValueError(
                f"no pyarrow filesystem class known for scheme {scheme!r}; "
                "register with an explicit factory"
            )
        factory = classes[scheme]
    return factory(**options)


def filesystem_for(path: str):
    """The pyarrow filesystem resolve_fs would use for `path` — pass this
    as `filesystem=` to ray.data.read_parquet/read_csv so read TASKS use
    the registered credentials too (Ray serializes the object into the
    tasks)."""
    return resolve_fs(path)[0]


# schemes whose URI authority names the SERVER (a filesystem-constructor
# concern, e.g. the HDFS namenode), not part of the filesystem path —
# bucket-style stores (s3/gs) keep the authority as the path's first
# segment, matching pyarrow's own from_uri conventions.
_AUTHORITY_IS_SERVER = {"hdfs", "viewfs", "file"}


def resolve_fs(path: str):
    """(pyarrow.fs.FileSystem, fs_path) for a local path or any fsspec-style
    URI (file://, s3://, gs://, ...) — the reference's GcsReader listing
    generalized to every pyarrow-supported object store.  URIs whose scheme
    has registered credentials (set_fs_options) construct that filesystem;
    everything else uses pyarrow's ambient-credential from_uri."""
    from pyarrow import fs as pafs

    if "://" in path:
        scheme, rest = path.split("://", 1)
        fs = _fs_from_registry(scheme.lower())
        if fs is not None:
            if scheme.lower() in _AUTHORITY_IS_SERVER and not rest.startswith("/"):
                # hdfs://host:port/a/b -> path /a/b (host is a constructor
                # kwarg of the registered filesystem, not a path segment)
                rest = rest.split("/", 1)
                rest = "/" + (rest[1] if len(rest) > 1 else "")
            return fs, rest
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
                       big_block_bytes: int = 32 << 20, filter=None):
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
    kw = {} if filter is None else {"filter": filter}
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=nb, **kw
    )


def parquet_bytes_hint(paths, columns=None) -> int:
    """Estimated in-memory bytes of (a projection of) parquet inputs, from
    footer metadata only — sums the column chunks' total_uncompressed_size
    for the selected columns.  Used to size shuffle fan-out (hash_join's
    num_buckets) from INPUT BYTES without executing anything; an upper
    bound for filtered/pre-aggregated pipelines, which errs toward more
    (cheap) buckets rather than fewer (memory-blowing) ones."""
    import pyarrow.parquet as pq

    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for path in paths:
        fs, p = resolve_fs(path)
        infos = [p]
        if fs.get_file_info(p).type.name == "Directory":
            infos = [
                f for f in list_files(path, suffix=".parquet")
            ]
        for f in infos:
            _, fp = resolve_fs(f)
            md = pq.ParquetFile(fp, filesystem=fs).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if columns is None or col.path_in_schema.split(".")[0] in columns:
                        total += col.total_uncompressed_size
    return total


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
