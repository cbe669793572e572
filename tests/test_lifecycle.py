"""End-to-end table lifecycle: every operational verb composed on ONE
table — apply, corrections, redaction, retention expiry, snapshot sync,
compaction, vacuum, point lookup — each step checked against an
independently maintained golden copy (plain pyarrow edits, no engine
code).  This is the composition guarantee the per-verb oracles can't
give: verbs observe each other's effects through ordinary change events
and shared watermarks."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import (
    apply_cdc,
    apply_corrections,
    compact,
    expire_rows,
    final_table_arrow,
    read_convs,
    redact_convs,
    snapshot_sync,
    vacuum,
)


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _check(cfg, golden: pa.Table):
    got = final_table_arrow(cfg, sort=True)
    golden = _sorted(golden)
    assert got.num_rows == golden.num_rows
    assert got["text"].equals(golden["text"])
    assert got.equals(golden.select(got.column_names))


def test_full_table_lifecycle(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "life"), num_partitions=4)

    # 1. replay the log; golden = the fixture's final transcripts
    apply_cdc(t1["cdc_log"], cfg)
    golden = _sorted(pq.read_table(t1["transcripts"]))
    _check(cfg, golden)

    # 2. correction batch: edit two turns' text
    k0 = {"conv_id": golden["conv_id"][0].as_py(),
          "turn_idx": golden["turn_idx"][0].as_py()}
    k1 = {"conv_id": golden["conv_id"][-1].as_py(),
          "turn_idx": golden["turn_idx"][-1].as_py()}
    apply_corrections(cfg, pa.table({
        "conv_id": pa.array([k0["conv_id"], k1["conv_id"]]),
        "turn_idx": pa.array([k0["turn_idx"], k1["turn_idx"]], pa.int32()),
        "text": pa.array(["fixed-first", "fixed-last"]),
    }), run_id="life-fix")

    def set_text(g, key, new):
        m = pc.and_(pc.equal(g["conv_id"], key["conv_id"]),
                    pc.equal(g["turn_idx"], key["turn_idx"]))
        return g.set_column(
            g.schema.get_field_index("text"), "text",
            pc.if_else(m, pa.scalar(new), g["text"]),
        )

    golden = set_text(set_text(golden, k0, "fixed-first"), k1, "fixed-last")
    _check(cfg, golden)

    # 3. redaction: forget one conversation's text
    target = golden["conv_id"][len(golden) // 2].as_py()
    redact_convs(cfg, [target], run_id="life-redact")
    m = pc.equal(golden["conv_id"], target)
    golden = golden.set_column(
        golden.schema.get_field_index("text"), "text",
        pc.if_else(m, pa.scalar("[REDACTED]"), golden["text"]),
    )
    _check(cfg, golden)

    # 4. retention expiry: drop everything older than the median ts
    cutoff = golden["ts"][len(golden) // 2].as_py()
    expire_rows(cfg, cutoff, run_id="life-expire")
    golden = golden.filter(
        pc.fill_null(pc.greater_equal(golden["ts"], pa.scalar(cutoff)), True)
    )
    _check(cfg, golden)

    # 5. snapshot sync: upstream hands us a full dump that adds a conv,
    #    rewrites one text, and drops one turn
    snap = golden.slice(1)  # drop the first remaining turn
    snap = snap.set_column(
        snap.schema.get_field_index("text"), "text",
        pc.if_else(
            pc.equal(snap["conv_id"], snap["conv_id"][0]),
            pa.scalar("from-snapshot"), snap["text"],
        ),
    )
    extra = pa.table({
        "conv_id": pa.array(["conv_zz_new"] * 2),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "assistant"]),
        "text": pa.array(["hello", "world"]),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([cutoff, cutoff], pa.timestamp("us")),
    })
    snap = pa.concat_tables([snap, extra], promote_options="default")
    snap_path = str(tmp_path / "snap.parquet")
    pq.write_table(snap, snap_path)
    s = snapshot_sync(cfg, snap_path, run_id="life-sync")
    assert s["sync_inserts"] > 0 and s["sync_deletes"] >= 1
    golden = _sorted(snap)
    _check(cfg, golden)

    # 6. compact (physical forgetting) and vacuum (staging GC): view
    #    unchanged, staging gone
    compact(cfg)
    _check(cfg, golden)
    rep = vacuum(cfg)
    assert any(d.startswith("snapsync-") for d in rep["dirs_removed"])
    assert any(d.startswith("expire-") for d in rep["dirs_removed"])
    _check(cfg, golden)

    # 7. point lookup sees the post-everything state
    got = read_convs(cfg, ["conv_zz_new", target])
    want = golden.filter(
        pc.is_in(golden["conv_id"],
                 value_set=pa.array(["conv_zz_new", target]))
    )
    assert got.equals(_sorted(want).select(got.column_names))
