"""Persistent maintained views: the IVM appliers as a durable, resumable
derived table — bootstrap once, then each `sync_view` folds only the
change feed since the last synced run into a new snapshot, exactly like
`ops/index_sync.py` keeps the ANN index current.

Layout under `view_dir`:

    view.json          {"kind", "source", "synced_run", "snapshot", "seq"}
    snapshot-<seq>/    parquet snapshot of the view at `synced_run`

Commit protocol (single writer per view dir, same assumption as the
table's spool): write the new snapshot into a staging dir, `os.replace`
it to `snapshot-<seq+1>`, then atomically rewrite `view.json`.  A crash
between the two leaves an orphan snapshot dir that the next sync
overwrites (it re-derives the same window from the immutable run files),
so re-running a crashed sync converges — the run journal is the ledger,
`view.json.synced_run` is the cursor.

Requires the source table in `merge_strategy="delta"` (the change feed
folds as-of states from the LSM run files; compaction bounds how far
back a cursor can lag — sync at least once per compaction cycle).

Views (see ops/transcripts.py for each kernel's scale shape):

=============  ============================  ==============================
kind           snapshot rows                 maintenance cost per sync
=============  ============================  ==============================
conv_stats     O(conversations)              O(snapshot + feed) ± fold
tool_usage     O(tools)                      O(snapshot + feed) ± fold
turn_context   O(turns)                      O(snapshot + changed convs)
                                             per-key re-derivation
=============  ============================  ==============================

The reference connector has no derived-table story; this reuses its
exactly-once run-ledger discipline (tigergraphwriter's idempotent
loading-job semantics) on the view cursor.
"""

from __future__ import annotations

import os
import shutil

from ..util import atomic_write_json, new_token, read_json
from .config import CdcConfig


def _builders():
    from ..ops import transcripts as T

    return {
        "conv_stats": (
            lambda ds, cfg: T.conv_stats(ds),
            lambda prior, feed, cfg: T.apply_stats_feed(prior, feed),
        ),
        "tool_usage": (
            lambda ds, cfg: T.tool_usage(ds),
            lambda prior, feed, cfg: T.apply_tool_usage_feed(prior, feed),
        ),
        "turn_context": (
            lambda ds, cfg: T.turn_context(ds),
            lambda prior, feed, cfg: T.apply_turn_context_feed(prior, feed, cfg),
        ),
    }


VIEW_KINDS = tuple(sorted(_builders()))


def _journaled_runs(cfg: CdcConfig) -> "list[str]":
    path = os.path.join(cfg.out_dir, "runs.log")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return f.read().split()


def _meta_path(view_dir: str) -> str:
    return os.path.join(view_dir, "view.json")


def _commit_snapshot(view_dir: str, ds, meta: dict) -> dict:
    """Write `ds` as the next snapshot and advance the cursor: staging
    dir -> os.replace -> atomic view.json rewrite; old snapshots beyond
    the previous one are reclaimed (kept once for readers mid-swap)."""
    seq = int(meta.get("seq", 0)) + 1
    name = f"snapshot-{seq:06d}"
    final = os.path.join(view_dir, name)
    staging = os.path.join(view_dir, f".stage-{new_token()}")
    ds.write_parquet(staging)
    if os.path.exists(final):  # orphan of a crashed prior attempt
        shutil.rmtree(final)
    os.replace(staging, final)
    meta = {**meta, "snapshot": name, "seq": seq}
    atomic_write_json(_meta_path(view_dir), meta)
    for old in sorted(os.listdir(view_dir)):
        if old.startswith("snapshot-") and old != name:
            if int(old.split("-")[1]) < seq - 1:
                shutil.rmtree(os.path.join(view_dir, old))
        elif old.startswith(".stage-"):
            # a crashed prior attempt's staging (ours was consumed by the
            # os.replace above) — view_dir is single-writer, same premise
            # as the orphaned-`final` rmtree, so any survivor is garbage
            shutil.rmtree(os.path.join(view_dir, old), ignore_errors=True)
    return meta


def bootstrap_view(view_dir: str, kind: str, cfg: CdcConfig) -> dict:
    """Materialize `kind` over the source table's current head and pin
    the cursor to the head's journaled run id."""
    builders = _builders()
    if kind not in builders:
        raise ValueError(f"unknown view kind {kind!r}; one of {VIEW_KINDS}")
    runs = _journaled_runs(cfg)
    if not runs:
        raise ValueError(f"{cfg.out_dir} has no journaled runs to view")
    if os.path.exists(_meta_path(view_dir)):
        raise ValueError(
            f"{view_dir} already holds a view — use sync_view to advance it"
        )
    from .pipeline import read_final_table

    os.makedirs(view_dir, exist_ok=True)
    build, _ = builders[kind]
    ds = build(read_final_table(cfg), cfg)
    meta = {
        "kind": kind,
        "source": os.path.abspath(cfg.out_dir),
        "synced_run": runs[-1],
        "seq": 0,
    }
    meta = _commit_snapshot(view_dir, ds, meta)
    meta["rows"] = read_view(view_dir).count()
    return meta


def sync_view(view_dir: str, cfg: CdcConfig) -> dict:
    """Fold the change feed (synced_run, head] into the snapshot.  A
    no-op when the cursor is already at head; idempotent on re-run after
    a crash (same window -> same fold).  The view must be synced TO THE
    CURRENT head (turn_context's point-reads see live state), which is
    what this does — lag only accrues between calls."""
    meta = read_json(_meta_path(view_dir))
    builders = _builders()
    _, apply_feed = builders[meta["kind"]]
    runs = _journaled_runs(cfg)
    if not runs or meta["synced_run"] not in runs:
        raise ValueError(
            f"view cursor {meta.get('synced_run')!r} is not journaled in "
            f"{cfg.out_dir} — wrong source table?"
        )
    head = runs[-1]
    if head == meta["synced_run"]:
        return {**meta, "synced": False, "head": head}
    from .pipeline import change_feed

    feed = change_feed(cfg, meta["synced_run"], head, include_before=True)
    updated = apply_feed(read_view(view_dir), feed, cfg)
    meta = _commit_snapshot(view_dir, updated, {**meta, "synced_run": head})
    return {**meta, "synced": True, "head": head}


def sync_views(view_dirs: "list[str]", cfg: CdcConfig) -> "list[dict]":
    """Sync several views of ONE source table in one pass: the change
    feed — the expensive half of a sync (two as-of state folds across
    every partition) — is derived ONCE and pinned in the object store,
    then each view folds it.  This is the amortization that makes
    maintained views pay at cheap-aggregate tiers (measured: a single
    conv_stats sync costs ~2x its recompute because the feed derivation
    is O(state folds); three views off one feed flip it — see
    BASELINE.md view_sync_bench).  Views whose cursor is already at head
    are skipped; all views must share the source and, for a shared feed,
    the same cursor (differing cursors fall back to per-view syncs)."""
    metas = [read_json(_meta_path(d)) for d in view_dirs]
    runs = _journaled_runs(cfg)
    head = runs[-1] if runs else None
    pending = [
        (d, m) for d, m in zip(view_dirs, metas) if m["synced_run"] != head
    ]
    if not pending:
        return [{**m, "synced": False, "head": head} for m in metas]
    cursors = {m["synced_run"] for _, m in pending}
    if len(cursors) > 1:  # mixed lag: no shared window to amortize
        return [sync_view(d, cfg) for d in view_dirs]
    (cursor,) = cursors
    if cursor not in runs:
        raise ValueError(
            f"view cursor {cursor!r} is not journaled in {cfg.out_dir}"
        )
    from .pipeline import change_feed

    feed = change_feed(cfg, cursor, head, include_before=True).materialize()
    out = []
    for d, m in zip(view_dirs, metas):
        if m["synced_run"] == head:
            out.append({**m, "synced": False, "head": head})
            continue
        _, apply_feed = _builders()[m["kind"]]
        updated = apply_feed(read_view(d), feed, cfg)
        m2 = _commit_snapshot(d, updated, {**m, "synced_run": head})
        out.append({**m2, "synced": True, "head": head})
    return out


def read_view(view_dir: str):
    """The view's current snapshot as a streaming Dataset."""
    import ray

    meta = read_json(_meta_path(view_dir))
    return ray.data.read_parquet(os.path.join(view_dir, meta["snapshot"]))
