"""Single-threaded oracle reducer for CDC replay (FIXTURES.md F2 semantics).

Deliberately the dumbest possible implementation — a Python dict fold over
rows sorted by LSN — so it shares no code with the distributed engine and
can arbitrate its correctness.  Semantics (documented contract, also encoded
in tests):

- events applied per ``(conv_id, turn_idx)`` key in increasing ``lsn``;
- duplicate LSNs for a key are applied once (first arrival wins; payloads of
  redelivered events are identical by definition);
- ``I``: full-row replace — every payload column takes the event's value,
  including nulls;
- ``U``: partial update — non-null payload columns overwrite, null payload
  columns mean "unchanged".  A ``U`` for an absent key upserts a partial row
  (policy "upsert", the default) or is dropped (policy "drop");
- ``D``: delete (tombstone).  A later ``I`` resurrects; a later ``U``
  resurrects a partial row under policy "upsert".

The reference has no comparable operator (SURVEY.md §2.5) — these semantics
are defined by BASELINE.json's north star, not ported code.
"""

from __future__ import annotations

import pyarrow as pa

from ..fixtures import TRANSCRIPT_SCHEMA

PAYLOAD_COLS = ("role", "text", "tool", "ts")


def golden_apply(
    event_tables: "list[pa.Table]",
    snapshot: "pa.Table | None" = None,
    policy: str = "upsert",
) -> pa.Table:
    """Replay event tables (any order) over an optional snapshot; return the
    converged table sorted by (conv_id, turn_idx)."""
    rows: dict = {}
    seen: set = set()
    if snapshot is not None:
        for r in snapshot.to_pylist():
            rows[(r["conv_id"], r["turn_idx"])] = {
                c: r[c] for c in PAYLOAD_COLS
            }

    events = []
    for t in event_tables:
        events.extend(t.to_pylist())
    events.sort(key=lambda r: r["lsn"])

    for e in events:
        k = (e["conv_id"], e["turn_idx"])
        sk = (k, e["lsn"])
        if sk in seen:
            continue
        seen.add(sk)
        op = e["op"]
        if op == "I":
            rows[k] = {c: e.get(c) for c in PAYLOAD_COLS}
        elif op == "U":
            if k in rows:
                for c in PAYLOAD_COLS:
                    if e.get(c) is not None:
                        rows[k][c] = e[c]
            elif policy == "upsert":
                rows[k] = {c: e.get(c) for c in PAYLOAD_COLS}
        elif op == "D":
            rows.pop(k, None)

    keys = sorted(rows)
    out = {
        "conv_id": [k[0] for k in keys],
        "turn_idx": [k[1] for k in keys],
    }
    for c in PAYLOAD_COLS:
        out[c] = [rows[k][c] for k in keys]
    return pa.table(out).cast(TRANSCRIPT_SCHEMA)
