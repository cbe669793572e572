"""Binlog-envelope ingestion: Debezium-shaped JSON change stream ->
internal events -> exactly-once merge, losslessly equal to a direct
Parquet-log replay."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow
from tg_data_connector_ray.fixtures import write_envelope_log
from tg_data_connector_ray.sources.envelope import (
    envelopes_to_events,
    read_envelope_log,
    stage_envelope_events,
)


def _env_table(rows):
    """Envelope rows (python dicts) -> Arrow table via a jsonl tempfile-free
    path: build directly with the flatten kernel's input schema."""
    from tg_data_connector_ray.sources.envelope import ENVELOPE_SCHEMA

    return pa.Table.from_pylist(rows, schema=ENVELOPE_SCHEMA)


def _img(conv="c1", turn=0, role=None, text=None, tool=None, ts_us=None):
    return {
        "conv_id": conv,
        "turn_idx": turn,
        "role": role,
        "text": text,
        "tool": tool,
        "ts_us": ts_us,
    }


def test_flatten_ops_and_images():
    t = _env_table(
        [
            # create: full after image
            {
                "op": "c",
                "ts_ms": 1,
                "before": None,
                "after": _img(role="user", text="hi", ts_us=100),
                "source": {"lsn": 10},
            },
            # snapshot read maps to I too
            {
                "op": "r",
                "ts_ms": 1,
                "before": None,
                "after": _img(turn=1, role="assistant", text="yo", ts_us=101),
                "source": {"lsn": 11},
            },
            # sparse update: only text set
            {
                "op": "u",
                "ts_ms": 2,
                "before": None,
                "after": _img(text="edited"),
                "source": {"lsn": 12},
            },
            # delete: payload (incl. event time) rides BEFORE, after is null
            {
                "op": "d",
                "ts_ms": 3,
                "before": _img(turn=1, ts_us=999),
                "after": None,
                "source": {"lsn": 13},
            },
            # unknown op passes through raw for the dirty channel
            {
                "op": "x",
                "ts_ms": 4,
                "before": None,
                "after": _img(text="junk"),
                "source": {"lsn": 14},
            },
        ]
    )
    ev = envelopes_to_events(t)
    assert ev["op"].to_pylist() == ["I", "I", "U", "D", "x"]
    assert ev["lsn"].to_pylist() == [10, 11, 12, 13, 14]
    assert ev["text"].to_pylist() == ["hi", "yo", "edited", None, "junk"]
    # the delete's payload came from the before image
    d = ev.slice(3, 1)
    assert d["conv_id"].to_pylist() == ["c1"]
    assert d["turn_idx"].to_pylist() == [1]
    assert d["ts"].cast(pa.int64()).to_pylist() == [999]
    assert ev.schema.field("ts").type == pa.timestamp("us")
    assert ev.schema.field("turn_idx").type == pa.int32()


def test_all_deletes_shard_reads_with_explicit_schema(tmp_path):
    """A shard where every row is a delete: without the explicit registry
    schema, `after` would infer as null type and the flatten would die."""
    p = tmp_path / "dels.jsonl"
    rows = [
        {
            "op": "d",
            "ts_ms": i,
            "before": _img(turn=i, ts_us=i * 10),
            "after": None,
            "source": {"lsn": i},
        }
        for i in range(5)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ev = read_envelope_log([str(p)]).take_all()
    assert [r["op"] for r in ev] == ["D"] * 5
    assert sorted(r["turn_idx"] for r in ev) == list(range(5))


def test_envelope_replay_converges_to_direct_replay(t1, fixture_root, tmp_path):
    env_dir = write_envelope_log(fixture_root, "t1")
    shards = stage_envelope_events(
        [os.path.join(env_dir, f) for f in sorted(os.listdir(env_dir)) if f.endswith(".jsonl")],
        str(tmp_path / "stage"),
    )
    assert shards, "staging produced no event shards"
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=8)
    summary = apply_cdc(shards, cfg)
    # redeliveries survive the envelope rendering (lossless duplicates)
    assert summary["dups_dropped"] > 0
    got = final_table_arrow(cfg, sort=True)
    exp = pq.read_table(t1["transcripts"])
    assert got.num_rows == exp.num_rows
    assert got["text"].equals(exp["text"])
    assert got.equals(exp)

    # staging is idempotent: a second call returns the same shard set
    # without rewriting (the marker short-circuits)
    mtimes = {s: os.path.getmtime(s) for s in shards}
    again = stage_envelope_events([env_dir], str(tmp_path / "stage"))
    assert again == shards
    assert {s: os.path.getmtime(s) for s in again} == mtimes


def test_tail_envelope_stream(t1, tmp_path):
    """Tail a raw Debezium-envelope JSON stream: jsonl shards dropped
    while polling stage to parquet per batch and apply exactly-once; the
    converged table equals the direct Parquet-log replay."""
    import shutil
    import threading
    import time

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import (
        apply_cdc,
        final_table_arrow,
        tail_log,
    )
    from tg_data_connector_ray.fixtures import write_envelope_log
    from tg_data_connector_ray.sources.envelope import stage_envelope_events

    env_dir = write_envelope_log(os.path.dirname(t1["dir"]), "t1")
    shards = sorted(
        os.path.join(env_dir, f) for f in os.listdir(env_dir)
        if f.endswith(".jsonl")
    )
    assert len(shards) >= 4
    watch = tmp_path / "watch"
    os.makedirs(watch)

    def drop(batch):
        for f in batch:
            tmp = str(watch / ("." + os.path.basename(f) + ".tmp"))
            shutil.copyfile(f, tmp)
            os.replace(tmp, str(watch / os.path.basename(f)))

    drop(shards[:2])
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)

    def producer():
        time.sleep(0.3)
        drop(shards[2:])

    th = threading.Thread(target=producer)
    th.start()
    totals = tail_log(
        str(watch), cfg, poll_interval=0.05, idle_polls=40,
        suffix=".jsonl", prepare=stage_envelope_events,
    )
    th.join()
    assert totals["files"] == len(shards) and totals["batches"] >= 2

    direct = CdcConfig(out_dir=str(tmp_path / "direct"), num_partitions=4)
    apply_cdc(t1["cdc_log"], direct)
    assert final_table_arrow(cfg, sort=True).equals(
        final_table_arrow(direct, sort=True)
    )
