"""The CDC merge: per-partition, LSN-ordered, idempotent fold + MergeApply.

Semantics (contract shared with cdc/golden.py, defined by BASELINE.json's
north star — the reference has no aggregation/merge operator to mimic,
SURVEY.md §2.5):

- events applied per (conv_id, turn_idx) in increasing lsn;
- duplicate (key, lsn) applied once (redelivery);
- I = full-row replace, U = set non-null payload columns, D = tombstone;
- existing state participates as pseudo-events at its stored `_lsn`
  (priority 0, so a redelivered event at the watermark LSN loses the tie)
  — the state's `_lsn` column IS the per-key LSN high-watermark: any
  replayed event at or below it is structurally ignored by the fold, which
  is what makes re-execution (Ray task retries, job re-runs) exactly-once.

The fold is fully vectorized: one lexsort + segment-boundary scans +
per-column "grouped forward fill" implemented with cumulative maxima over
setter indices — no Python loop over rows or keys.  A hot key costs the
same per-row work as a cold one; hot-key *partition* skew is handled
upstream by salting (normalize.py).

MergeApply is the stateful stage: executed via
``groupby("part").map_groups(MergeApply, ...)`` as an actor pool; each call
owns one partition end-to-end — read partition state, fold, atomically
commit state/table/lineage (temp file + os.replace), per SURVEY.md §7.4.1.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..util import atomic_write_json, atomic_write_parquet, mix_hash, read_json, stable_hash_strings
from .config import CdcConfig

PAYLOAD_COLS = ("role", "text", "tool", "ts")

# State = one row per surviving key.  `_lsn_full` is the LSN of the key's
# last full-row event (I/D, -1 if none); `_lsn_<col>` is the LSN of each
# column's last setter (-1 if never set).  Together they are a column-wise
# last-writer-wins register with full-row reset ordering: the state can be
# losslessly decomposed back into pseudo-events (state_to_events), which
# makes incremental replay equivalent to a single global LSN-ordered fold
# for ANY batching/arrival order of the log — late events below the key
# watermark still land correctly.  `_lsn` = max contributing LSN (the
# per-key high-watermark, used for reporting/checksums).
STATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("_lsn", pa.int64()),
        ("_deleted", pa.bool_()),
        ("_lsn_full", pa.int64()),
        ("_lsn_role", pa.int64()),
        ("_lsn_text", pa.int64()),
        ("_lsn_tool", pa.int64()),
        ("_lsn_ts", pa.int64()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("run_id", pa.string()),
        ("status", pa.string()),
        ("events_in", pa.int64()),
        ("events_prefiltered", pa.int64()),
        ("dups_dropped", pa.int64()),
        ("orphan_updates", pa.int64()),
        ("rows_live", pa.int64()),
        ("rows_tombstone", pa.int64()),
        ("min_lsn", pa.int64()),
        ("max_lsn", pa.int64()),
        ("watermark", pa.int64()),
        ("checksum", pa.string()),
        ("wall_s", pa.float64()),
    ]
)


def _col_np(t: pa.Table, name: str):
    c = t[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c


def _grouped_last_setter(set_mask: np.ndarray, seg_start_idx: np.ndarray) -> np.ndarray:
    """For each row, index of the latest setter row within its segment, or -1.

    Segments are contiguous; ``seg_start_idx[i]`` is the first row index of
    row i's segment.  A running max over setter indices that is >= the
    segment start necessarily came from inside the segment.
    """
    n = len(set_mask)
    cand = np.where(set_mask, np.arange(n, dtype=np.int64), -1)
    runmax = np.maximum.accumulate(cand)
    return np.where(runmax >= seg_start_idx, runmax, -1)


def fold(table: pa.Table, policy: str = "upsert") -> "tuple[pa.Table, dict]":
    """Fold a (state-pseudo-events + events) table into converged state.

    Input columns: lsn,op,conv_id,turn_idx,role,text,tool,ts,_prio.
    Output: STATE_SCHEMA rows (one per surviving key incl. tombstones),
    sorted by (conv_id, turn_idx); plus fold statistics.
    """
    n = table.num_rows
    stats = {"dups_dropped": 0, "orphan_updates": 0}
    if n == 0:
        return pa.table({f.name: pa.array([], f.type) for f in STATE_SCHEMA}), stats

    conv_dict = _col_np(table, "conv_id").dictionary_encode()
    conv_codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = _col_np(table, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    lsn = _col_np(table, "lsn").to_numpy(zero_copy_only=False).astype(np.int64)
    prio = _col_np(table, "_prio").to_numpy(zero_copy_only=False).astype(np.int8)
    op = _col_np(table, "op").to_numpy(zero_copy_only=False)  # object array

    order = np.lexsort((prio, lsn, turn, conv_codes))
    conv_codes, turn, lsn, prio, op = (
        conv_codes[order], turn[order], lsn[order], prio[order], op[order]
    )

    # exact-duplicate (key, lsn) drop: a *real* event (prio 1) colliding
    # with any earlier row at the same (key, lsn) is a redelivery.  State
    # pseudo-events (prio 0) at equal LSNs are column fragments of one
    # historical event and must all survive.
    same_key = (conv_codes[1:] == conv_codes[:-1]) & (turn[1:] == turn[:-1])
    dup = np.concatenate([[False], same_key & (lsn[1:] == lsn[:-1])]) & (prio == 1)
    if dup.any():
        stats["dups_dropped"] = int(dup.sum())
        keep = ~dup
        order = order[keep]
        conv_codes, turn, lsn, prio, op = (
            conv_codes[keep], turn[keep], lsn[keep], prio[keep], op[keep]
        )
        same_key = (conv_codes[1:] == conv_codes[:-1]) & (turn[1:] == turn[:-1])
    n = len(order)

    new_key = np.concatenate([[True], ~same_key])
    full = (op == "I") | (op == "D")
    new_seg = new_key | full
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(new_seg, idx, -1))
    key_start = np.maximum.accumulate(np.where(new_key, idx, -1))
    last_of_key = np.concatenate([new_key[1:], [True]])

    # payload resolution: per column, value + LSN of the latest setter in
    # the final segment of each key (the "grouped ffill", evaluated only at
    # the last row of each key).  Only BOOLEAN null-masks are reordered to
    # sorted space (numpy gather); the payload values themselves are
    # gathered once, directly from the ORIGINAL arrays at the winning
    # per-key indices — large text columns are never rewritten wholesale.
    out_cols: dict = {}
    col_lsns: dict = {}
    last_idx = idx[last_of_key]
    for name in PAYLOAD_COLS:
        col = _col_np(table, name)
        valid_sorted = ~np.asarray(col.is_null()).astype(bool)[order]
        set_mask = full | valid_sorted
        src = _grouped_last_setter(set_mask, seg_start)[last_idx]
        ok = src >= 0
        gather = np.where(ok, src, 0)
        vals = col.take(pa.array(order[gather]))
        # null out rows with no setter, or whose setter stored a null
        null_mask = ~(ok & valid_sorted[gather])
        if null_mask.any():
            vals = pa.compute.if_else(
                pa.array(null_mask), pa.scalar(None, type=vals.type), vals
            )
        out_cols[name] = vals
        col_lsns[name] = np.where(ok, lsn[gather], -1)

    final_op = op[last_of_key]
    deleted = final_op == "D"
    last_full = _grouped_last_setter(full, key_start)[last_idx]
    lsn_full = np.where(last_full >= 0, lsn[np.maximum(last_full, 0)], -1)

    if policy == "drop":
        # a key is live only if its last FULL event is an I; no full event
        # at all -> orphan (dropped)
        orphan = last_full < 0
        deleted = deleted | (~orphan & (op[np.maximum(last_full, 0)] == "D"))
        stats["orphan_updates"] = int(orphan.sum())
    else:
        orphan = np.zeros(len(last_idx), dtype=bool)

    # per-key high-watermark = max contributing LSN
    wm = lsn_full
    for name in PAYLOAD_COLS:
        wm = np.maximum(wm, col_lsns[name])
    wm = np.maximum(wm, lsn[last_idx])

    keep_rows = ~orphan
    kr = pa.array(keep_rows)
    conv_out = conv_dict.take(pa.array(order[last_idx[keep_rows]])).cast(pa.string())
    out = pa.table(
        {
            "conv_id": conv_out,
            "turn_idx": pa.array(turn[last_idx][keep_rows], type=pa.int32()),
            "role": out_cols["role"].filter(kr),
            "text": out_cols["text"].filter(kr),
            "tool": out_cols["tool"].filter(kr),
            "ts": out_cols["ts"].filter(kr),
            "_lsn": pa.array(wm[keep_rows], type=pa.int64()),
            "_deleted": pa.array(deleted[keep_rows], type=pa.bool_()),
            "_lsn_full": pa.array(lsn_full[keep_rows], type=pa.int64()),
            "_lsn_role": pa.array(col_lsns["role"][keep_rows], type=pa.int64()),
            "_lsn_text": pa.array(col_lsns["text"][keep_rows], type=pa.int64()),
            "_lsn_tool": pa.array(col_lsns["tool"][keep_rows], type=pa.int64()),
            "_lsn_ts": pa.array(col_lsns["ts"][keep_rows], type=pa.int64()),
        },
        schema=STATE_SCHEMA,
    )
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]), stats


def state_to_events(state: pa.Table) -> pa.Table:
    """Losslessly decompose partition state back into pseudo-events.

    Per state row:
      deleted            -> one D at `_lsn_full`;
      live, `_lsn_full`>=0 -> one I at `_lsn_full` carrying the columns whose
                            setter WAS that full event, plus one U fragment
                            per column set later (at its `_lsn_<col>`);
      live orphan (upsert) -> U fragments only.

    Folding these with any set of new events reproduces exactly the global
    LSN-ordered fold over the full history.
    """
    import pyarrow.compute as pc

    n = state.num_rows
    if n == 0:
        return _empty_events()

    pieces = []
    deleted = pc.fill_null(state["_deleted"], False)
    dead = state.filter(deleted)
    if dead.num_rows:
        pieces.append(
            _mk_events(dead, lsn=dead["_lsn_full"], op="D", cols={})
        )
    live = state.filter(pc.invert(deleted))
    if live.num_rows:
        has_full = pc.greater_equal(live["_lsn_full"], 0)
        base = live.filter(has_full)
        if base.num_rows:
            cols = {}
            for name in PAYLOAD_COLS:
                at_full = pc.equal(base[f"_lsn_{name}"], base["_lsn_full"])
                cols[name] = pc.if_else(
                    at_full, base[name], pa.scalar(None, type=base[name].type)
                )
            pieces.append(_mk_events(base, lsn=base["_lsn_full"], op="I", cols=cols))
        for name in PAYLOAD_COLS:
            late = pc.and_(
                pc.greater(live[f"_lsn_{name}"], live["_lsn_full"]),
                pc.greater_equal(live[f"_lsn_{name}"], 0),
            )
            frag = live.filter(late)
            if frag.num_rows:
                pieces.append(
                    _mk_events(
                        frag, lsn=frag[f"_lsn_{name}"], op="U", cols={name: frag[name]}
                    )
                )
    if not pieces:
        return _empty_events()
    return pa.concat_tables(pieces, promote_options="default")


_EVENT_TYPES = {
    "lsn": pa.int64(),
    "op": pa.string(),
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
    "_prio": pa.int8(),
}


def _empty_events() -> pa.Table:
    return pa.table({k: pa.array([], type=t) for k, t in _EVENT_TYPES.items()})


def _mk_events(rows: pa.Table, lsn, op: str, cols: dict) -> pa.Table:
    n = rows.num_rows
    data = {
        "lsn": lsn.cast(pa.int64()),
        "op": pa.array([op] * n, type=pa.string()),
        "conv_id": rows["conv_id"],
        "turn_idx": rows["turn_idx"],
        "_prio": pa.array(np.zeros(n, dtype=np.int8)),
    }
    for name in PAYLOAD_COLS:
        data[name] = cols.get(name, pa.nulls(n, type=_EVENT_TYPES[name]))
    return pa.table({k: data[k] for k in _EVENT_TYPES})


def partition_state_files(state_dir: str) -> "tuple[str | None, list[str]]":
    """(base state.parquet or None, sorted delta-run files) of one
    partition directory.  Delta files exist only under
    merge_strategy="delta" between compactions."""
    base = os.path.join(state_dir, "state.parquet")
    if not os.path.isdir(state_dir):
        return None, []
    deltas = sorted(
        os.path.join(state_dir, f)
        for f in os.listdir(state_dir)
        if f.startswith("delta-") and f.endswith(".parquet")
    )
    return (base if os.path.exists(base) else None), deltas


# --- as-of-run (time-travel) support ------------------------------------
# Base state files record WHICH runs they fold in parquet schema metadata;
# delta-run files carry their run in the filename.  Together an as-of read
# is decidable per partition: serve it iff the base folds only allowed
# runs, then filter the delta files.  Reaches back exactly to the last
# compaction (LSM semantics) — refold mode compacts every run, so only
# merge_strategy="delta" tables can travel.

_FOLDED_RUNS_KEY = b"tg.folded_runs"


class TimeTravelError(RuntimeError):
    """An as-of-run read cannot be served: the base state already folds
    runs past the requested point (compaction horizon), or predates run
    tracking (written by an older version or by migrate_state)."""


def _delta_run_id(path: str) -> str:
    return os.path.basename(path)[len("delta-"):-len(".parquet")]


def folded_runs_of(base_path: str) -> "list[str] | None":
    """Runs folded into a base state file, or None if unrecorded."""
    meta = pq.read_schema(base_path).metadata or {}
    raw = meta.get(_FOLDED_RUNS_KEY)
    return None if raw is None else json.loads(raw.decode())


def with_folded_runs(state: pa.Table, runs: "list[str] | None") -> pa.Table:
    """Attach (or, with runs=None, leave absent) the folded-runs record."""
    if runs is None:
        return state
    meta = dict(state.schema.metadata or {})
    meta[_FOLDED_RUNS_KEY] = json.dumps(sorted(set(runs))).encode()
    return state.replace_schema_metadata(meta)


def next_folded_runs(
    prior: "list[str] | None", base_exists: bool, new_runs: "list[str]"
) -> "list[str] | None":
    """Folded-runs record for a base about to be (re)written.  Unknown
    stays unknown: a legacy base without the record poisons the rewrite
    (None), so a later as-of read fails loudly instead of lying."""
    if base_exists and prior is None:
        return None
    return sorted(set(prior or []) | set(new_runs))


def read_partition_state(
    state_dir: str,
    policy: str = "upsert",
    runs: "frozenset[str] | None" = None,
    conv_filter: "list[str] | None" = None,
) -> pa.Table:
    """Converged state of ONE partition: the base state folded with any
    LSM delta-run files (read amplification bounded by runs since the
    last compact).  With no deltas this is a plain parquet read — the
    refold-mode fast path.  `policy` is the orphan-update policy applied
    at this (final) fold; delta-run files were folded with "upsert" so no
    orphan is dropped before its I may arrive from another file.

    `runs` (an allow-set of run ids) serves an AS-OF read: delta files
    outside the set are skipped, and the base must fold only allowed runs
    — else TimeTravelError (the requested point predates the compaction
    horizon or run tracking).  Sound because the fold is associative:
    base + any delta subset = the one-shot fold of exactly those runs.

    `conv_filter` pushes a `conv_id IN (...)` predicate into every parquet
    scan (point-lookup path): state files are written sorted by
    (conv_id, turn_idx), so row-group min/max stats prune the scan to the
    matching key ranges.  Sound under the fold because the predicate is
    per-key complete — filtering each piece by conv_id keeps ALL of a
    kept key's register rows, so fold(filter(x)) == filter(fold(x))."""
    kw = {}
    if conv_filter is not None:
        kw["filters"] = pc.field("conv_id").isin(conv_filter)
    base, deltas = partition_state_files(state_dir)
    if runs is not None:
        runs = frozenset(runs)
        if base is not None:
            folded = folded_runs_of(base)
            if folded is None:
                raise TimeTravelError(
                    f"{base} has no folded-runs record (written before run "
                    "tracking, or by migrate_state) — as-of reads need a "
                    "base whose folded runs are known"
                )
            beyond = sorted(set(folded) - runs)
            if beyond:
                raise TimeTravelError(
                    f"{base} already folds runs {beyond[:5]} beyond the "
                    "requested as-of point — compaction moved the horizon "
                    "past it; time travel reaches back only to the last "
                    "compacted base"
                )
        deltas = [f for f in deltas if _delta_run_id(f) in runs]
    if base is None and not deltas:
        return pa.table({f.name: pa.array([], f.type) for f in STATE_SCHEMA})
    if not deltas:
        return pq.read_table(base, **kw)
    pieces = [state_to_events(pq.read_table(f, **kw)) for f in ([base] if base else []) + deltas]
    state, _ = fold(pa.concat_tables(pieces, promote_options="default"), policy=policy)
    return state


def state_checksum(state: pa.Table) -> str:
    """Order-insensitive content checksum over (conv_id, turn_idx, _lsn,
    _deleted) — cheap, deterministic, and sufficient to detect divergent
    replays (text divergence implies lsn divergence by construction)."""
    if state.num_rows == 0:
        return "0"
    h = stable_hash_strings(state["conv_id"])
    t = _col_np(state, "turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    l = _col_np(state, "_lsn").to_numpy(zero_copy_only=False).astype(np.int64)
    d = _col_np(state, "_deleted").to_numpy(zero_copy_only=False).astype(np.int64)
    mixed = mix_hash(mix_hash(h, t), l * 2 + d)
    return f"{int(np.bitwise_xor.reduce(mixed)) ^ len(mixed):016x}"


class MergeApply:
    """Actor-pool merge stage: one call folds one partition and commits it.

    Constructed once per actor (``map_groups(MergeApply, fn_constructor_kwargs=...)``);
    each ``__call__`` receives every event routed to one `part` value.
    Returns a one-row lineage table (LINEAGE_SCHEMA).
    """

    def __init__(self, cfg: CdcConfig, run_id: str, policy: str = None):
        self.cfg = cfg
        self.run_id = run_id
        self.policy = policy or cfg.orphan_updates

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Two input shapes:
        - spool descriptors (column `part_dir`): read each partition's
          spooled events and merge it — the default exchange path;
        - an event group (column `part`): direct groupby path.
        """
        if "part_dir" in batch.column_names:
            outs = [self.apply_spool_dir(d) for d in batch["part_dir"].to_pylist()]
            return pa.concat_tables(outs)
        return self.apply_events(int(batch["part"][0].as_py()), batch.drop_columns(["part"]))

    def apply_spool_dir(self, part_dir: str) -> pa.Table:
        # hive dir name: .../part=NNNNN
        part = int(os.path.basename(part_dir.rstrip("/")).split("=")[1])
        skipped = self._skipped_lineage(part)
        if skipped is not None:  # committed in a prior attempt of this run
            return skipped
        cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        arrow = sorted(f for f in os.listdir(part_dir) if f.endswith(".arrow"))
        if arrow:  # IPC spool: mmap decode, near-zero cost
            from pyarrow import feather

            events = pa.concat_tables(
                feather.read_table(
                    os.path.join(part_dir, f), columns=cols, memory_map=True
                )
                for f in arrow
            )
        else:
            import pyarrow.dataset as pads

            events = pads.dataset(part_dir).to_table(columns=cols)
        return self.apply_events(part, events)

    def _skipped_lineage(self, part: int) -> "pa.Table | None":
        run_path = os.path.join(self.cfg.lineage_dir(part), f"{self.run_id}.json")
        if not os.path.exists(run_path):
            return None
        rec = read_json(run_path)
        rec["status"] = "skipped"
        return _lineage_table(rec)

    def apply_events(self, part: int, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        cfg = self.cfg
        events_in = group.num_rows

        ldir = cfg.lineage_dir(part)
        run_path = os.path.join(ldir, f"{self.run_id}.json")
        skipped = self._skipped_lineage(part)
        if skipped is not None:
            # resume: this (partition, run) already committed — exactly-once
            return skipped

        latest_path = os.path.join(ldir, "_latest.json")
        watermark = -1
        if os.path.exists(latest_path):
            watermark = read_json(latest_path).get("watermark", -1)

        events = group
        prefiltered = 0
        if cfg.prefilter_watermark and watermark >= 0 and events.num_rows:
            m = pa.compute.greater(events["lsn"], watermark)
            prefiltered = events.num_rows - int(
                pa.compute.sum(m.cast(pa.int64())).as_py() or 0
            )
            events = events.filter(m)
        events = events.append_column(
            "_prio", pa.array(np.ones(events.num_rows, dtype=np.int8))
        )

        state_path = cfg.state_path(part)
        delta_mode = cfg.merge_strategy == "delta"
        _, prior_deltas = partition_state_files(cfg.state_dir(part))
        if not delta_mode and prior_deltas:
            raise ValueError(
                f"partition {part} has {len(prior_deltas)} uncompacted delta-run "
                "files but this run uses merge_strategy='refold', which would "
                "silently ignore them — run compact() first or keep "
                "merge_strategy='delta'"
            )
        parts = [events]
        base_exists = os.path.exists(state_path)
        prior_folded: "list[str] | None" = None
        if not delta_mode and base_exists:
            base_tbl = pq.read_table(state_path)
            raw = (base_tbl.schema.metadata or {}).get(_FOLDED_RUNS_KEY)
            prior_folded = None if raw is None else json.loads(raw.decode())
            parts.append(state_to_events(base_tbl))
        combined = pa.concat_tables(parts, promote_options="default")

        # Delta mode folds the run's events ALONE (O(delta), never touching
        # the base state) and always with policy "upsert": an orphan U in
        # this run may pair with an I living in the base or another run, so
        # the real orphan policy applies only at the final read/compact
        # fold.  The LSN-register fold is associative (state decomposes
        # losslessly into pseudo-events), so base + delta-runs folded later
        # converge to exactly the one-shot global fold.
        state, stats = fold(combined, policy="upsert" if delta_mode else self.policy)
        if delta_mode:
            stats["orphan_updates"] = 0  # decidable only at the final fold

        # tombstone GC: drop tombstones older than the retention horizon
        # (watermark - retention); a late event below the horizon can no
        # longer arrive by the operator's contract, so the guard they
        # provide is no longer needed and the state stays bounded.
        # Delta mode defers GC to compact() — a delta tombstone must
        # survive to kill its base row.
        if not delta_mode and cfg.tombstone_retention_lsn is not None and state.num_rows:
            wm_max = int(
                pa.compute.max(state["_lsn"]).as_py() or 0
            )
            horizon = wm_max - cfg.tombstone_retention_lsn
            keep = pa.compute.or_(
                pa.compute.equal(state["_deleted"], False),
                pa.compute.greater(state["_lsn"], horizon),
            )
            state = state.filter(keep)

        # the user-facing table is a LIVE VIEW over state (filter _deleted
        # at read, see pipeline.final_table_*): one parquet write per
        # partition per run, not two — at 100 TB the second copy of the
        # text payload was pure write amplification
        n_tomb = (
            int(pa.compute.sum(state["_deleted"].cast(pa.int8())).as_py() or 0)
            if state.num_rows
            else 0
        )
        live_rows = state.num_rows - n_tomb

        os.makedirs(cfg.state_dir(part), exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        if delta_mode:
            # one sorted run file per (run, partition); the deterministic
            # name makes a crash-retry rewrite the same file with the same
            # content (fold is deterministic) — idempotent
            if state.num_rows:
                atomic_write_parquet(
                    os.path.join(cfg.state_dir(part), f"delta-{self.run_id}.parquet"),
                    state,
                )
                if (
                    cfg.delta_compact_runs is not None
                    and len(prior_deltas) + 1 >= cfg.delta_compact_runs
                ):
                    # inline LSM auto-compaction: fold base + all runs
                    # (including this one) into a fresh base, then drop the
                    # run files.  Crash between the base write and the
                    # unlinks just re-applies identical registers on the
                    # next read — idempotent.
                    sd = cfg.state_dir(part)
                    delta_ids = [
                        _delta_run_id(f) for f in partition_state_files(sd)[1]
                    ]
                    folded = next_folded_runs(
                        folded_runs_of(state_path) if base_exists else None,
                        base_exists,
                        delta_ids,
                    )
                    full = read_partition_state(sd, policy=self.policy)
                    if cfg.tombstone_retention_lsn is not None and full.num_rows:
                        wm_max = int(pa.compute.max(full["_lsn"]).as_py() or 0)
                        horizon = wm_max - cfg.tombstone_retention_lsn
                        full = full.filter(
                            pa.compute.or_(
                                pa.compute.equal(full["_deleted"], False),
                                pa.compute.greater(full["_lsn"], horizon),
                            )
                        )
                    atomic_write_parquet(state_path, with_folded_runs(full, folded))
                    for f in partition_state_files(sd)[1]:
                        os.unlink(f)
        else:
            atomic_write_parquet(
                state_path,
                with_folded_runs(
                    state,
                    next_folded_runs(prior_folded, base_exists, [self.run_id]),
                ),
            )

        lsn_np = _col_np(events, "lsn")
        new_wm = int(state["_lsn"].combine_chunks().to_numpy(zero_copy_only=False).max()) if state.num_rows else watermark
        rec = {
            "part": int(part),
            "run_id": self.run_id,
            "status": "applied",
            "events_in": int(events_in),
            "events_prefiltered": int(prefiltered),
            "dups_dropped": stats["dups_dropped"],
            "orphan_updates": stats["orphan_updates"],
            "rows_live": live_rows,
            "rows_tombstone": n_tomb,
            # explicit emptiness check, not `or -1`: lsn 0 is legitimate
            # (snapshot pseudo-events) and must not falsiness-map to -1
            "min_lsn": int(pa.compute.min(lsn_np).as_py()) if events.num_rows else -1,
            "max_lsn": int(pa.compute.max(lsn_np).as_py()) if events.num_rows else -1,
            "watermark": max(new_wm, watermark),
            "checksum": state_checksum(state),
            "wall_s": time.monotonic() - t0,
        }
        atomic_write_json(run_path, rec)
        atomic_write_json(latest_path, {"run_id": self.run_id, "watermark": rec["watermark"], "checksum": rec["checksum"]})
        return _lineage_table(rec)


def _lineage_table(rec: dict) -> pa.Table:
    return pa.table(
        {f.name: pa.array([rec.get(f.name)], type=f.type) for f in LINEAGE_SCHEMA}
    )
