"""Binlog/WAL envelope ingestion: Debezium-style JSON change events.

The reference connector tails a staged export; real CDC deployments tail
a binlog via a Debezium-shaped envelope stream instead — one JSON object
per change with an op code (``c``/``r`` create+snapshot-read, ``u``
update, ``d`` delete), a sparse ``after`` row image (``null`` column =
untouched, matching the engine's U-merge semantics), a ``before`` image
on deletes (the last-known row, Debezium-faithful — the delete's payload
columns, e.g. its event time, live here), and the log position under
``source.lsn``.

This module is the envelope → internal-event bridge, all streaming and
all Arrow:

- ``read_envelope_log``: ``ray.data.read_json`` with an explicit Arrow
  schema (the connector's registry schema — inference across files can
  drift when e.g. one shard is all-deletes and ``after`` would infer as
  null type), then one vectorized ``map_batches`` flatten: per payload
  column a ``struct_field`` gather picked from ``before`` on deletes and
  ``after`` otherwise, op codes mapped by ``case_when``.  Unknown op
  codes pass through verbatim so the normalize layer routes the full
  original row to the dirty channel (reason ``bad_op``) instead of this
  reader guessing.
- ``stage_envelope_events``: spill the normalized event stream to
  Parquet shards so ``apply_cdc`` gets its resumable file-list input
  (run identity = staged file set, same as any other log).

Scale notes: JSON parse is pyarrow C++ (one read task per shard file),
the flatten is zero-copy struct-field projection, and staging is a
streamed ``write_parquet`` — nothing materializes on the driver.  The
envelope is lossless w.r.t. the internal event schema, so a staged
replay converges to the identical final table as a direct Parquet-log
replay (pinned by test + the shared merge-contract oracle).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import json as pajson

import ray
import ray.data

# payload image fields (ts travels as epoch microseconds, Debezium-style)
PAYLOAD_FIELDS = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts_us", pa.int64()),
]

ENVELOPE_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("ts_ms", pa.int64()),
        ("before", pa.struct(PAYLOAD_FIELDS)),
        ("after", pa.struct(PAYLOAD_FIELDS)),
        ("source", pa.struct([("lsn", pa.int64())])),
    ]
)

# envelope op code -> internal event op
_OP_MAP = (("c", "I"), ("r", "I"), ("u", "U"), ("d", "D"))


def envelopes_to_events(t: pa.Table) -> pa.Table:
    """Flatten one batch of envelope rows to the internal event schema
    (lsn, op, conv_id, turn_idx, role, text, tool, ts) — vectorized,
    no per-row Python."""
    op = t["op"].combine_chunks()
    is_d = pc.equal(op, "d")
    before = t["before"].combine_chunks()
    after = t["after"].combine_chunks()

    cols: "dict[str, pa.Array]" = {}
    for name, _typ in PAYLOAD_FIELDS:
        cols[name] = pc.if_else(
            is_d, pc.struct_field(before, name), pc.struct_field(after, name)
        )

    conds = pa.StructArray.from_arrays(
        [pc.fill_null(pc.equal(op, code), False) for code, _ in _OP_MAP],
        names=[code for code, _ in _OP_MAP],
    )
    # default = the RAW op string: unknown codes reach normalize intact
    # and dirty-route with their original value in the record
    op_out = pc.case_when(conds, *[out for _, out in _OP_MAP], op)

    return pa.table(
        {
            "lsn": pc.struct_field(t["source"].combine_chunks(), "lsn"),
            "op": op_out,
            "conv_id": cols["conv_id"],
            "turn_idx": cols["turn_idx"],
            "role": cols["role"],
            "text": cols["text"],
            "tool": cols["tool"],
            "ts": cols["ts_us"].cast(pa.timestamp("us")),
        }
    )


def read_envelope_log(paths, **read_json_kwargs) -> "ray.data.Dataset":
    """Envelope ndjson shards -> internal-event Dataset (streaming)."""
    # the default jsonl/json extension filter stays on: log directories
    # carry markers/manifests beside the shards
    ds = ray.data.read_json(
        paths,
        parse_options=pajson.ParseOptions(explicit_schema=ENVELOPE_SCHEMA),
        **read_json_kwargs,
    )
    return ds.map_batches(
        envelopes_to_events, batch_format="pyarrow", zero_copy_batch=True
    )


def stage_envelope_events(paths, stage_dir: str, **read_json_kwargs) -> "list[str]":
    """Normalize an envelope log to Parquet event shards under
    `stage_dir` and return the sorted shard paths — `apply_cdc`'s
    resumable file-list input.  Idempotent per (input set, stage_dir):
    an existing `_STAGED` marker short-circuits (the staged set IS the
    run identity downstream)."""
    marker = os.path.join(stage_dir, "_STAGED")

    def _shards() -> "list[str]":
        return sorted(
            os.path.join(stage_dir, f)
            for f in os.listdir(stage_dir)
            if f.endswith(".parquet")
        )

    if os.path.exists(marker):
        return _shards()
    os.makedirs(stage_dir, exist_ok=True)
    for f in _shards():  # stale partial staging: restart clean
        os.remove(f)
    read_envelope_log(paths, **read_json_kwargs).write_parquet(stage_dir)
    with open(marker, "w") as f:
        f.write("ok\n")
    return _shards()
