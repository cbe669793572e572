"""Alternate execution modes converge identically: groupby exchange vs
spool, actor-pool merge vs tasks, and compaction invariants."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import apply_cdc


def final_table(cfg):
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow

    return final_table_arrow(cfg, sort=True)


def test_groupby_exchange_and_actor_merge_converge(t1, tmp_path):
    exp = pq.read_table(t1["transcripts"])
    outs = []
    for name, kw in [
        ("spool_tasks", dict(exchange="spool", merge_mode="tasks")),
        ("spool_actors", dict(exchange="spool", merge_mode="actors", merge_concurrency=2)),
        ("spool_parquet", dict(exchange="spool", spool_format="parquet")),
        # snappy maps to lz4 on the ipc spool (scaling-bench configuration)
        ("spool_ipc_snappy", dict(exchange="spool", spool_compression="snappy")),
        ("groupby_tasks", dict(exchange="groupby", merge_mode="tasks")),
        ("groupby_actors", dict(exchange="groupby", merge_mode="actors", merge_concurrency=2)),
    ]:
        cfg = CdcConfig(out_dir=str(tmp_path / name), num_partitions=4, **kw)
        s = apply_cdc(t1["cdc_log"], cfg)
        assert s["rows_live"] == exp.num_rows, name
        got = final_table(cfg)
        assert got.equals(exp), name
        outs.append(got)


def test_state_keeps_tombstones_table_compacted(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "o"), num_partitions=4)
    s = apply_cdc(t1["cdc_log"], cfg)
    assert s["rows_tombstone"] > 0
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow

    state = pads.dataset(os.path.join(cfg.out_dir, "state")).to_table()
    table = final_table_arrow(cfg)
    n_tomb = state.filter(pa.compute.equal(state["_deleted"], True)).num_rows
    assert n_tomb == s["rows_tombstone"]
    assert table.num_rows == state.num_rows - n_tomb
    # the live view carries no internal columns
    assert set(table.column_names) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    # per-key watermarks present in state
    assert {"_lsn", "_lsn_full", "_lsn_role", "_lsn_text", "_lsn_tool", "_lsn_ts"} <= set(
        state.column_names
    )


def test_spool_cleanup_and_marker(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "o"), num_partitions=4, drop_spool_after_merge=True)
    apply_cdc(t1["cdc_log"], cfg)
    assert not os.path.exists(os.path.join(cfg.out_dir, "spool")) or not os.listdir(
        os.path.join(cfg.out_dir, "spool")
    )
    cfg2 = CdcConfig(out_dir=str(tmp_path / "o2"), num_partitions=4, drop_spool_after_merge=False)
    s = apply_cdc(t1["cdc_log"], cfg2)
    spool = os.path.join(cfg2.out_dir, "spool", s["run_id"])
    assert os.path.exists(os.path.join(spool, "_SPOOL_DONE"))


def test_resume_after_phase_a_crash(t1, tmp_path):
    """Crash between spool write and merge: the _SPOOL_DONE marker is
    absent, so a re-run rebuilds the spool and applies; a crash AFTER the
    marker re-uses the spool and lineage-skips committed partitions."""
    import shutil

    from tg_data_connector_ray.cdc.pipeline import _expand, build_events_dataset, compute_run_id

    cfg = CdcConfig(
        out_dir=str(tmp_path / "o"), num_partitions=4, drop_spool_after_merge=False
    )
    files = _expand(t1["cdc_log"])
    run_id = compute_run_id(files)
    # simulate a phase-A-only crash: write a PARTIAL spool without marker
    spool = os.path.join(cfg.out_dir, "spool", run_id)
    os.makedirs(spool, exist_ok=True)
    ds = build_events_dataset(files[:2], cfg, run_id)
    ds.write_parquet(spool, partition_cols=["part"])  # partial! no marker
    # full run with the same run_id must rebuild the spool from ALL files
    s = apply_cdc(t1["cdc_log"], cfg, run_id=run_id)
    exp = pq.read_table(t1["transcripts"])
    assert s["rows_live"] == exp.num_rows
    assert final_table(cfg).equals(exp)
