"""Arrow-schema reconciliation for heterogeneous CDC log files (M3).

The reference establishes schema per-source at the edges and carries none
with the data (SURVEY.md §1.3); schema *evolution* has no reference
implementation.  Here evolution is handled in two layers:

1. ``scan_schemas`` — a footer-metadata-only pass over the log files that
   groups them by exact schema fingerprint, so each ``read_parquet`` call
   sees a homogeneous file set (heterogeneous sets break block concat).
   Footer reads are O(KB) per file regardless of file size, so this scales
   to 100 TB logs; for very large file counts the loop can be sharded into
   Ray tasks, but even 100k footers read in seconds.
2. ``unify_schemas`` — deterministic promotion rules producing the target
   schema every batch is normalized to:
   missing column -> nullable + null backfill; integer widening
   (int8<int16<int32<int64); int+float -> float64; dictionary<V> -> V;
   string -> large_string when mixed; timestamps unify to microseconds;
   a string column vs a non-string column -> the non-string type (the
   normalize stage performs the per-row cast and routes uncastable rows to
   the dirty side-output, mirroring the reference's cast-matrix dirty
   semantics, StringColumn.java:34-96 / ColumnCast.java:87-117).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

_INT_ORDER = {
    pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3,
    pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3,
}


def _strip(t: pa.DataType) -> pa.DataType:
    if pa.types.is_dictionary(t):
        return t.value_type
    return t


def promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Deterministic pairwise type promotion (commutative)."""
    a, b = _strip(a), _strip(b)
    if a.equals(b):
        return a
    if pa.types.is_integer(a) and pa.types.is_integer(b):
        sa, sb = pa.types.is_signed_integer(a), pa.types.is_signed_integer(b)
        ra, rb = _INT_ORDER[a], _INT_ORDER[b]
        if sa == sb:
            return a if ra >= rb else b
        # mixed signedness: widen to the signed type ONE RANK above the
        # larger unsigned operand so its full range fits — commutative and
        # lossless (int32+uint32 -> int64), unlike picking either side
        urank = max(r for r, signed in ((ra, sa), (rb, sb)) if not signed)
        srank = max((r for r, signed in ((ra, sa), (rb, sb)) if signed), default=-1)
        need = max(srank, urank + 1)
        if need > 3:
            raise TypeError(
                f"no lossless promotion for {a} vs {b} (uint64 exceeds int64)"
            )
        return (pa.int8(), pa.int16(), pa.int32(), pa.int64())[need]
    if (pa.types.is_integer(a) or pa.types.is_floating(a)) and (
        pa.types.is_integer(b) or pa.types.is_floating(b)
    ):
        return pa.float64()
    if {a, b} == {pa.string(), pa.large_string()}:
        return pa.large_string()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        # tz is SEMANTICS, not precision: silently dropping it would
        # reinterpret instants as wall times
        if a.tz != b.tz:
            raise TypeError(f"timestamp tz mismatch: {a.tz!r} vs {b.tz!r}")
        return pa.timestamp("us", tz=a.tz)
    # string vs anything castable: the typed side wins; normalize() casts
    # per-row with dirty routing for failures.
    if pa.types.is_string(a) or pa.types.is_large_string(a):
        return b
    if pa.types.is_string(b) or pa.types.is_large_string(b):
        return a
    raise TypeError(f"no promotion rule for {a} vs {b}")


def unify_schemas(schemas: "list[pa.Schema]") -> pa.Schema:
    """Union of fields across schemas with promotion; field order = first
    appearance. All fields become nullable (null backfill for adds)."""
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = _strip(f.type)
            else:
                types[f.name] = promote(types[f.name], f.type)
    return pa.schema([pa.field(n, types[n], nullable=True) for n in order])


def scan_schemas(
    paths: "list[str]", unify: bool = True
) -> "tuple[dict[str, list[str]], pa.Schema | None]":
    """Group files by schema fingerprint (footer metadata only) and return
    (groups, unified_schema).  `unify=False` skips the unification (and
    its potential TypeError on un-promotable EXTRA columns) for callers
    that only need the groups — the CDC read path normalizes to the fixed
    CDC schema and never consumes the unified one."""
    groups: dict[str, list[str]] = defaultdict(list)
    reps: dict[str, pa.Schema] = {}
    from ..util import resolve_fs

    for p in paths:
        fs, fp = resolve_fs(p)
        s = pq.read_schema(fp, filesystem=fs)
        key = str(s.remove_metadata())
        groups[key].append(p)
        reps.setdefault(key, s)
    unified = unify_schemas(list(reps.values())) if unify else None
    return dict(groups), unified


# --- schema-history journal ------------------------------------------------

SCHEMA_LOG = "schema.log"


def _field_specs(paths: "list[str]") -> "list[list[str]]":
    """Sorted distinct (field, type) specs across the files' footers —
    the run's observed input surface.  Footer-only, O(KB)/file."""
    groups, _ = scan_schemas(paths, unify=False)
    fields = set()
    reps = {}
    for key, fps in groups.items():
        from ..util import resolve_fs

        fs, fp = resolve_fs(fps[0])
        reps[key] = pq.read_schema(fp, filesystem=fs)
    for s in reps.values():
        for f in s:
            fields.add((f.name, str(f.type)))
    return [list(x) for x in sorted(fields)]


def record_schema_history(out_dir: str, run_id: str, files: "list[str]") -> bool:
    """Append this run's observed input field set to `out_dir/schema.log`
    (jsonl) WHEN it differs from the journal's last entry — the
    "when did column X appear / widen" answer a CDC operator needs that
    per-run manifests don't give (they record counts, not shapes).
    Diffs are precomputed (`added` / `removed` vs the previous entry) so
    the log reads as a timeline.  Returns True when an entry was written.

    Called under the writer lease after a successful apply, so entries
    are totally ordered with runs; re-applying an identical run appends
    nothing (same field set)."""
    import json
    import os
    import time

    if not files:
        return False
    specs = _field_specs(files)
    path = os.path.join(out_dir, SCHEMA_LOG)
    prev: "list[list[str]]" = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    prev = json.loads(line)["fields"]
    if specs == prev:
        return False
    pv, cu = {tuple(x) for x in prev}, {tuple(x) for x in specs}
    entry = {
        "run_id": run_id,
        "ts": time.time(),
        "fields": specs,
        "added": [list(x) for x in sorted(cu - pv)],
        "removed": [list(x) for x in sorted(pv - cu)],
    }
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")
    return True


def schema_history(out_dir: str) -> "list[dict]":
    """The schema.log timeline (oldest first); [] when never recorded."""
    import json
    import os

    path = os.path.join(out_dir, SCHEMA_LOG)
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
    return out
