"""End-to-end CDC pipeline tests through Ray Data (the north-rule gate:
golden end-state equality under stable (conv_id, turn_idx) ordering)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import (
    ErrorLimitExceeded,
    apply_cdc,
    compute_run_id,
    detect_hot_keys,
    read_final_table,
)
from tg_data_connector_ray.fixtures import (
    TIERS,
    make_dirty_log,
    write_fixture,
)


def final_table_sorted(cfg) -> pa.Table:
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow

    return final_table_arrow(cfg, sort=True)


def assert_converged(cfg, expected: pa.Table):
    got = final_table_sorted(cfg)
    assert got.num_rows == expected.num_rows
    # the north-rule invariant: per-turn text equality under stable ordering
    assert got["text"].equals(expected["text"])
    assert got.equals(expected)


def test_replay_t1_converges(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=8)
    summary = apply_cdc(t1["cdc_log"], cfg)
    exp = pq.read_table(t1["transcripts"])
    assert summary["rows_live"] == exp.num_rows
    assert summary["dups_dropped"] > 0  # fixture bakes in redeliveries
    assert_converged(cfg, exp)


def test_progress_reporter_emits_mid_run(t1, tmp_path, caplog):
    """With a sub-run-length interval the merge phase logs the aggregated
    lineage counters at least once (the reference's 10s counter-tree
    ticks); interval 0 stays silent."""
    import logging

    cfg = CdcConfig(
        out_dir=str(tmp_path / "out"), num_partitions=8, progress_interval_s=0.001
    )
    with caplog.at_level(logging.INFO, logger="tg_data_connector_ray.cdc"):
        apply_cdc(t1["cdc_log"], cfg)
    assert any("partitions committed" in r.message for r in caplog.records)
    # the scan aggregates the committed lineage exactly
    from tg_data_connector_ray.cdc.pipeline import _ProgressReporter, compute_run_id
    from tg_data_connector_ray.cdc.pipeline import _expand

    run_id = compute_run_id(_expand(t1["cdc_log"]), None)
    rep = _ProgressReporter(cfg, run_id, 8, 0)
    done, events, live, committed = rep._scan()
    assert done == 8 and events > 0 and live > 0
    # watchdog inputs: every committed part reports (wall_s, commit mtime)
    assert sorted(committed) == list(range(8))
    assert all(w >= 0 and ts > 0 for w, ts in committed.values())


def test_replay_from_file_uri(t1, tmp_path):
    """Object-store-style URI input (file://) through the whole CDC path:
    listing, sizing, schema scan and read all resolve via pyarrow.fs."""
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)
    summary = apply_cdc(f"file://{t1['cdc_log']}", cfg)
    exp = pq.read_table(t1["transcripts"])
    assert summary["rows_live"] == exp.num_rows
    assert_converged(cfg, exp)


def test_replay_is_idempotent_rerun(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)
    s1 = apply_cdc(t1["cdc_log"], cfg)
    # same inputs, same run_id -> every partition short-circuits via lineage
    s2 = apply_cdc(t1["cdc_log"], cfg)
    assert s2["run_id"] == s1["run_id"]
    assert s2["partitions_skipped"] == s2["partitions"]
    # forced re-apply under a NEW run id must also be a no-op state change
    s3 = apply_cdc(t1["cdc_log"], cfg, run_id="forced-replay")
    assert s3["partitions_applied"] == s3["partitions"]
    assert_converged(cfg, pq.read_table(t1["transcripts"]))


def test_snapshot_bootstrap_then_incremental(t1, tmp_path):
    """Bootstrap from the snapshot (lsn=0 inserts), then replay the full
    log incrementally — converges to the same state as log-only replay."""
    cfg = CdcConfig(out_dir=str(tmp_path / "boot"), num_partitions=4)
    apply_cdc(None, cfg, snapshot_path=t1["transcripts"])
    exp = pq.read_table(t1["transcripts"])
    assert_converged(cfg, exp)  # snapshot alone == final table
    # now replay the whole log on top; all events have lsn >= 1 > 0
    apply_cdc(t1["cdc_log"], cfg)
    assert_converged(cfg, exp)


def test_drifted_snapshot_loses_to_log_and_extra_keys_survive(
    fixture_root, t1, tmp_path
):
    """Snapshot with drifted payloads + snapshot-only keys: every logged
    key converges to the LOG's final value (log lsn > 0 outranks the
    snapshot's lsn-0 insert per column), while keys only in the snapshot
    survive verbatim."""
    import pyarrow.compute as pc

    from tg_data_connector_ray.fixtures import write_snapshot

    snap_path = write_snapshot(fixture_root, "t1")
    cfg = CdcConfig(out_dir=str(tmp_path / "o"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg, snapshot_path=snap_path)
    got = final_table_sorted(cfg)
    exp = pq.read_table(t1["transcripts"])

    snap_only = got.filter(pc.greater_equal(got["turn_idx"], 100000))
    snap_tbl = pq.read_table(snap_path)
    exp_only = snap_tbl.filter(
        pc.greater_equal(snap_tbl["turn_idx"], 100000)
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert snap_only.num_rows == exp_only.num_rows > 0
    assert snap_only.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    ).equals(exp_only.select(snap_only.column_names).cast(snap_only.schema))

    # logged keys: identical to the log-only converged table (no drift leaks)
    logged = got.filter(pc.less(got["turn_idx"], 100000))
    assert logged.equals(
        exp.select(logged.column_names)
        .cast(logged.schema)
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    # non-vacuity: the snapshot really did drift those keys
    assert snap_tbl.filter(
        pc.match_substring(snap_tbl["text"], "snap-drift: ")
    ).num_rows > 0


def test_resume_after_partial_crash(t1, tmp_path):
    """Simulate a crash after some partitions committed: pre-commit a few
    partitions by running the job, then delete OTHER partitions' lineage +
    state and re-run with the same run_id.  Converges identically and the
    pre-committed partitions are skipped."""
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=8)
    files = sorted(
        os.path.join(t1["cdc_log"], f) for f in os.listdir(t1["cdc_log"])
    )
    run_id = compute_run_id(files)
    apply_cdc(files, cfg)
    # "crash": nuke half the partitions' outputs entirely
    import shutil

    for p in range(4, 8):
        for d in (cfg.state_dir(p), cfg.lineage_dir(p)):
            shutil.rmtree(d, ignore_errors=True)
    s = apply_cdc(files, cfg, run_id=run_id)
    assert s["partitions_skipped"] == 4
    assert s["partitions_applied"] == 4
    assert_converged(cfg, pq.read_table(t1["transcripts"]))
    # lineage checksums stable across the two attempts
    for p in range(8):
        lat = json.load(open(os.path.join(cfg.lineage_dir(p), "_latest.json")))
        assert lat["run_id"] == run_id


def test_incremental_file_batches(t2, tmp_path):
    """Consume the log as three successive file batches (the streaming-tail
    model) — converges to the same final state as one-shot replay."""
    cfg = CdcConfig(out_dir=str(tmp_path / "inc"), num_partitions=8)
    files = sorted(
        os.path.join(t2["cdc_log"], f) for f in os.listdir(t2["cdc_log"])
    )
    k = len(files) // 3
    for batch in (files[:k], files[k : 2 * k], files[2 * k :]):
        apply_cdc(batch, cfg)
    assert_converged(cfg, pq.read_table(t2["transcripts"]))


def test_schema_evolution_through_read_path(fixture_root, tmp_path):
    """F3: early files lack `tool` and use int16/dictionary — the real
    read path (schema-group scan + normalize) must reconcile."""
    fx = write_fixture(fixture_root, "t2evo")
    cfg = CdcConfig(out_dir=str(tmp_path / "evo"), num_partitions=8)
    apply_cdc(fx["cdc_log"], cfg)
    exp = pq.read_table(fx["transcripts"])
    assert_converged(cfg, exp)
    got = final_table_sorted(cfg)
    assert got.schema.field("turn_idx").type == pa.int32()
    assert got.schema.field("tool").type == pa.string()


def test_skew_salting_converges(fixture_root, tmp_path):
    fx = write_fixture(fixture_root, "t2skew")
    hot = detect_hot_keys(fx["cdc_log"], threshold_frac=0.05)
    assert hot == ["conv_hot00000000"]
    cfg = CdcConfig(
        out_dir=str(tmp_path / "skew"), num_partitions=8, hot_keys=tuple(hot)
    )
    s = apply_cdc(fx["cdc_log"], cfg)
    assert_converged(cfg, pq.read_table(fx["transcripts"]))
    # the hot conversation's events really did spread across partitions
    lin = [
        json.load(open(os.path.join(cfg.lineage_dir(p), "_latest.json")))
        for p in range(8)
        if os.path.isdir(cfg.lineage_dir(p))
    ]
    assert len(lin) == 8


def test_dirty_routing_and_error_limits(tmp_path):
    d = tmp_path / "dirtylog"
    os.makedirs(d)
    t = make_dirty_log()
    pq.write_table(t, str(d / "evt-0000.parquet"))
    cfg = CdcConfig(
        out_dir=str(tmp_path / "out"),
        num_partitions=2,
        null_format="\\N",
        error_limit_records=100,
    )
    s = apply_cdc(str(d), cfg)
    assert s["dirty_records"] == 6
    # reasons recorded
    import pyarrow.dataset as pads

    dirty = pads.dataset(cfg.dirty_dir(s["run_id"])).to_table()
    reasons = set(dirty["_reason"].to_pylist())
    assert reasons == {
        "bad_op",
        "negative_turn_idx",
        "null_conv_id",
        "null_text_insert",
        "uncastable_ts",
        "null_turn_idx",
    }
    # record limit takes priority (reference ErrorRecordChecker semantics)
    cfg2 = CdcConfig(
        out_dir=str(tmp_path / "out2"),
        num_partitions=2,
        null_format="\\N",
        error_limit_records=3,
        error_limit_pct=0.99,
    )
    with pytest.raises(ErrorLimitExceeded, match="dirty records"):
        apply_cdc(str(d), cfg2)
    cfg3 = CdcConfig(
        out_dir=str(tmp_path / "out3"),
        num_partitions=2,
        null_format="\\N",
        error_limit_pct=0.01,
    )
    with pytest.raises(ErrorLimitExceeded, match="dirty ratio"):
        apply_cdc(str(d), cfg3)


def test_string_lsn_turn_idx_cast_per_row_dirty(tmp_path):
    """Schema-evolution promotion: a STRING lsn/turn_idx column is cast
    per-row; uncastable rows go to the dirty side-output instead of
    failing the batch (ArrowInvalid)."""
    d = tmp_path / "strlog"
    os.makedirs(d)
    t = pa.table(
        {
            "lsn": pa.array(["1", "2", "oops", "4"], pa.string()),
            "op": pa.array(["I"] * 4),
            "conv_id": pa.array(["c1", "c2", "c3", "c4"]),
            "turn_idx": pa.array(["0", "bad", "0", "0"], pa.string()),
            "role": pa.array(["user"] * 4),
            "text": pa.array(["a", "b", "c", "d"]),
            "tool": pa.array([None] * 4, pa.string()),
            "ts": pa.array([1] * 4, pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(d / "evt-0000.parquet"))
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=2)
    s = apply_cdc(str(d), cfg)
    assert s["dirty_records"] == 2
    import pyarrow.dataset as pads

    dirty = pads.dataset(cfg.dirty_dir(s["run_id"])).to_table()
    assert set(dirty["_reason"].to_pylist()) == {"uncastable_lsn", "uncastable_turn_idx"}
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow

    table = final_table_arrow(cfg)
    assert sorted(table["conv_id"].to_pylist()) == ["c1", "c4"]


def test_read_final_table_dataset(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    ds = read_final_table(cfg, sort=True)
    exp = pq.read_table(t1["transcripts"])
    got = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert got.num_rows == exp.num_rows
    assert got.column("text").to_pylist() == exp.column("text").to_pylist()


def test_chunked_fixture_converges(tmp_path, ray_session):
    """write_fixture_chunked: disjoint conv/LSN chunks, one transcripts
    file — a full replay of the chunked log must converge to the
    concatenated transcripts exactly (same contract as the monolithic
    generator)."""
    import pyarrow.parquet as pq

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow
    from tg_data_connector_ray.fixtures import FixtureSpec, write_fixture_chunked

    spec = FixtureSpec(n_convs=600, n_files=6, seed=11)
    fx = write_fixture_chunked(str(tmp_path / "fx"), "chunky", spec, chunk_convs=200)
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)
    apply_cdc(fx["cdc_log"], cfg)
    got = final_table_arrow(cfg, sort=True)
    exp = (
        pq.read_table(fx["transcripts"])
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert got.num_rows == exp.num_rows
    assert got.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]).equals(
        exp.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    )
    # chunk LSN ranges are disjoint ascending and conv ids are unique
    import duckdb

    n_conv = duckdb.sql(
        f"SELECT count(DISTINCT conv_id) FROM '{fx['transcripts']}'"
    ).fetchone()[0]
    assert n_conv >= 600  # 600 convs (+ none lost to chunk collisions)


def test_legacy_state_without_marker_raises(tmp_path):
    """State partitions with no _FORMAT.json are pre-marker state of
    unknown routing provenance — adopting them could silently split keys
    across partitions, so apply_cdc must refuse (re-bootstrap)."""
    from tg_data_connector_ray.cdc.pipeline import _check_state_format

    out = tmp_path / "out"
    (out / "state" / "part=0").mkdir(parents=True)
    cfg = CdcConfig(out_dir=str(out), num_partitions=4)
    with pytest.raises(ValueError, match="no _FORMAT.json"):
        _check_state_format(cfg)
    # a fresh out_dir (no state) stamps the marker and proceeds
    cfg2 = CdcConfig(out_dir=str(tmp_path / "fresh"), num_partitions=4)
    os.makedirs(cfg2.out_dir)
    _check_state_format(cfg2)
    assert os.path.exists(os.path.join(cfg2.out_dir, "_FORMAT.json"))


def test_empty_state_reads_typed_empty(tmp_path):
    """Fresh out_dir with no state partitions: the read/verify surface
    returns typed empties instead of pyarrow raising on an empty path
    list."""
    from tg_data_connector_ray.cdc.pipeline import (
        USER_COLS,
        final_table_arrow,
        verify_against,
    )

    cfg = CdcConfig(out_dir=str(tmp_path / "none"), num_partitions=4)
    t = final_table_arrow(cfg)
    assert t.num_rows == 0 and t.column_names == list(USER_COLS)
    ds = read_final_table(cfg)
    assert ds.count() == 0 and set(ds.schema().names) == set(USER_COLS)
    exp = pa.table(
        {
            "conv_id": pa.array(["c"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["x"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    p = str(tmp_path / "exp.parquet")
    pq.write_table(exp, p)
    res = verify_against(cfg, p)
    assert res["ok"] is False and res["rows"] == 0 and res["rows_expected"] == 1


def test_spool_checkpoint_both_paths(tmp_path, ray_session):
    """spool_checkpoint: the bounded-materialize path (size hint under the
    cache bound) and the disk-spool path (cache_bytes=0) must serve every
    consumer the same rows, with column pruning."""
    import ray.data

    from tg_data_connector_ray.util import spool_checkpoint

    t = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(100)]),
        }
    )
    ds = ray.data.from_arrow(t)
    hinted = spool_checkpoint(ds, "t_hint", root=str(tmp_path), size_hint_bytes=10)
    spooled = spool_checkpoint(ds, "t_spool", root=str(tmp_path), cache_bytes=0)
    for rd in (hinted, spooled):
        full = rd().to_pandas().sort_values("doc_id")
        assert len(full) == 100 and list(full.columns) == ["doc_id", "text"]
        pruned = rd(columns=["doc_id"]).to_pandas()
        assert list(pruned.columns) == ["doc_id"] and len(pruned) == 100
    # the spool path wrote parquet; the hinted path did not
    import os as _os

    dirs = _os.listdir(tmp_path)
    assert any(d.startswith("t_spool-") for d in dirs)


def test_delta_merge_strategy_converges(t2, tmp_path):
    """LSM delta mode: per-run cost is O(delta) — each run writes only a
    delta-run file, never touching base state; the read path folds
    base+deltas and must converge to the one-shot refold result.
    compact() then folds the runs into the base and the fast read path
    takes over, still converged."""
    from tg_data_connector_ray.cdc.merge import partition_state_files
    from tg_data_connector_ray.cdc.pipeline import (
        _any_delta_files,
        compact,
        final_table_arrow,
        verify_against,
    )

    exp = pq.read_table(t2["transcripts"])
    cfg = CdcConfig(
        out_dir=str(tmp_path / "delta"), num_partitions=8, merge_strategy="delta"
    )
    files = sorted(
        os.path.join(t2["cdc_log"], f) for f in os.listdir(t2["cdc_log"])
    )
    k = len(files) // 3
    for batch in (files[:k], files[k : 2 * k], files[2 * k :]):
        apply_cdc(batch, cfg)

    # no base state yet — only delta-run files, up to one per (run, part)
    assert _any_delta_files(cfg)
    some_dir = os.path.dirname(cfg.state_path(0))
    base, deltas = partition_state_files(some_dir)
    assert base is None and 1 <= len(deltas) <= 3

    # delta-aware read paths: driver table, streaming dataset, verify
    assert_converged(cfg, exp)
    got_ds = read_final_table(cfg, sort=True).to_pandas()
    assert len(got_ds) == exp.num_rows
    assert verify_against(cfg, t2["transcripts"])["ok"]

    # compaction folds runs into the base; results identical after
    res = compact(cfg, tombstone_retention_lsn=0)
    assert res["delta_runs_folded"] >= 8  # runs x partitions with rows
    assert not _any_delta_files(cfg)
    assert_converged(cfg, exp)
    assert verify_against(cfg, t2["transcripts"])["ok"]


def test_delta_redelivery_and_refold_guard(t1, tmp_path):
    """Re-running the same batch in delta mode is exactly-once (lineage
    skip), and a full re-delivery under a NEW run_id converges identically
    (cross-run register merge is idempotent).  Switching back to refold
    with uncompacted deltas must raise instead of silently ignoring them."""
    cfg = CdcConfig(
        out_dir=str(tmp_path / "d"), num_partitions=4, merge_strategy="delta"
    )
    s1 = apply_cdc(t1["cdc_log"], cfg)
    s2 = apply_cdc(t1["cdc_log"], cfg)  # same run_id -> all skipped
    assert s2["partitions_skipped"] == s2["partitions"]
    # redelivery under a forced new run_id: new delta files, same table
    apply_cdc(t1["cdc_log"], cfg, run_id="redelivery-run")
    assert_converged(cfg, pq.read_table(t1["transcripts"]))

    cfg_refold = CdcConfig(out_dir=cfg.out_dir, num_partitions=4)
    with pytest.raises(Exception, match="uncompacted delta-run"):
        apply_cdc(t1["cdc_log"], cfg_refold, run_id="refold-over-deltas")
    assert s1["partitions"] == 4


def test_stalled_partition_watchdog_rule():
    """TaskMonitor-analogue hang rule (pure, clock injected): flags the
    uncommitted partitions only once the run is quiet for longer than
    max(grace, factor x median committed wall)."""
    from tg_data_connector_ray.cdc.pipeline import stalled_partitions

    committed = {p: (2.0, 1000.0 + p) for p in range(7)}  # last commit t=1006

    # healthy: quiet for 8s < grace 30s
    assert stalled_partitions(8, committed, now=1014.0) == []
    # stalled: quiet 40s > max(30, 4 x 2.0) with partition 7 missing
    assert stalled_partitions(8, committed, now=1046.0) == [7]
    # too little signal: under half committed -> never flags
    assert stalled_partitions(8, {0: (2.0, 1000.0)}, now=2000.0) == []
    # all committed -> nothing to flag
    assert stalled_partitions(7, committed, now=9999.0) == []
    # slow-but-normal partitions: median wall 60s -> quiet 100s < 4x60
    slow = {p: (60.0, 1000.0 + p) for p in range(6)}
    assert stalled_partitions(8, slow, now=1105.0) == []
    assert stalled_partitions(8, slow, now=1300.0) == [6, 7]
    # resumed run: prior-attempt lineage has hour-old mtimes, but this
    # attempt just started — quietness measures from started_ts, so the
    # first ticks stay silent and only a genuinely quiet resume flags
    assert stalled_partitions(8, committed, now=5006.0, started_ts=5000.0) == []
    assert stalled_partitions(8, committed, now=5046.0, started_ts=5000.0) == [7]


def test_spool_checkpoint_reclaim(tmp_path, ray_session):
    """The spool directory is reclaimed by read.cleanup() and by reader
    garbage collection — not only at interpreter exit."""
    import gc
    import os as _os

    import pyarrow as pa
    import ray

    from tg_data_connector_ray.util import spool_checkpoint

    ds = ray.data.from_arrow(pa.table({"x": pa.array(range(100))}))

    # explicit cleanup handle
    read = spool_checkpoint(ds, name="reclaim1", root=str(tmp_path), cache_bytes=0)
    spools = _os.listdir(tmp_path)
    assert len(spools) == 1
    assert read().count() == 100
    read.cleanup()
    assert not _os.path.exists(_os.path.join(tmp_path, spools[0]))

    # GC-driven reclaim — but a live Dataset produced by the reader pins
    # the spool even after the reader itself is dropped (lazy reads must
    # not lose their files mid-pipeline)
    read2 = spool_checkpoint(ds, name="reclaim2", root=str(tmp_path), cache_bytes=0)
    spool2 = [d for d in _os.listdir(tmp_path) if d.startswith("reclaim2")]
    assert len(spool2) == 1
    pinned = read2()
    del read2
    gc.collect()
    assert _os.path.exists(_os.path.join(tmp_path, spool2[0]))
    assert pinned.count() == 100  # still readable
    del pinned
    gc.collect()
    assert not _os.path.exists(_os.path.join(tmp_path, spool2[0]))

    # bounded-materialize path exposes a no-op cleanup for API symmetry
    read3 = spool_checkpoint(ds, name="r3", root=str(tmp_path), size_hint_bytes=1)
    read3.cleanup()
    assert read3().count() == 100


def test_migrate_state_reroutes_and_preserves_watermarks(t1, tmp_path):
    """Routing migration: state replayed at 8 partitions re-routes into a
    fresh 4-partition out_dir with per-key LSN registers intact — the
    table is identical, verify passes, and a full redelivery of the log
    on the MIGRATED dir is a structural no-op (watermarks survived, so
    every event folds as a redelivery, unlike a snapshot re-bootstrap)."""
    from tg_data_connector_ray.cdc.pipeline import migrate_state, verify_against

    exp = pq.read_table(t1["transcripts"])
    old_cfg = CdcConfig(out_dir=str(tmp_path / "old"), num_partitions=8)
    apply_cdc(t1["cdc_log"], old_cfg)

    new_cfg = CdcConfig(out_dir=str(tmp_path / "new"), num_partitions=4)
    res = migrate_state(old_cfg.out_dir, new_cfg)
    assert res["partitions"] == 4
    assert res["rows_live"] == exp.num_rows
    assert_converged(new_cfg, exp)
    assert verify_against(new_cfg, t1["transcripts"])["ok"]
    assert os.path.exists(os.path.join(new_cfg.out_dir, "_FORMAT.json"))

    # the migrated dir keeps absorbing the tail: full redelivery is a no-op
    apply_cdc(t1["cdc_log"], new_cfg, run_id="post-migrate-redelivery")
    assert_converged(new_cfg, exp)

    # target-not-fresh and same-dir misuse are loud errors
    with pytest.raises(ValueError, match="already has state"):
        migrate_state(old_cfg.out_dir, new_cfg)
    with pytest.raises(ValueError, match="FRESH out_dir"):
        migrate_state(old_cfg.out_dir, old_cfg)


def test_delta_auto_compaction_threshold(t2, tmp_path):
    """delta_compact_runs=2: the second delta run per partition folds
    base+runs into a fresh base inline, so run files never accumulate past
    the threshold and the converged table is unchanged."""
    from tg_data_connector_ray.cdc.merge import partition_state_files
    from tg_data_connector_ray.cdc.pipeline import _partition_state_dirs

    cfg = CdcConfig(
        out_dir=str(tmp_path / "ac"), num_partitions=4,
        merge_strategy="delta", delta_compact_runs=2,
    )
    files = sorted(
        os.path.join(t2["cdc_log"], f) for f in os.listdir(t2["cdc_log"])
    )
    k = len(files) // 3
    for batch in (files[:k], files[k : 2 * k], files[2 * k :]):
        apply_cdc(batch, cfg)
    # every partition stays under the threshold; a base exists after the
    # first inline compaction
    for d in _partition_state_dirs(cfg):
        base, deltas = partition_state_files(d)
        assert len(deltas) < 2
        assert base is not None
    assert_converged(cfg, pq.read_table(t2["transcripts"]))


def test_delta_mode_with_schema_evolution(fixture_root, tmp_path):
    """F3 evolution fixture under merge_strategy='delta': the normalize
    reconciliation happens before the merge, so delta runs compose with
    schema evolution exactly as refold does."""
    fx = write_fixture(fixture_root, "t2evo")
    cfg = CdcConfig(
        out_dir=str(tmp_path / "evod"), num_partitions=8, merge_strategy="delta"
    )
    apply_cdc(fx["cdc_log"], cfg)
    exp = pq.read_table(fx["transcripts"])
    assert_converged(cfg, exp)
    got = final_table_sorted(cfg)
    assert got.schema.field("tool").type == pa.string()


def test_dead_letter_retry_after_config_fix(tmp_path):
    """Dead-letter replay workflow: rows dirtied by an unparseable ts
    format re-ingest through the NORMAL apply path once the operator adds
    the format to the config (the dirty side-output carries every column
    stringified; normalize ignores the extra _reason column).  Rows that
    remain invalid (bad op) route to the new run's dirty output again."""
    import glob as _glob

    cfg = CdcConfig(out_dir=str(tmp_path / "dl"), num_partitions=4)
    log = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["I", "I", "X"], pa.string()),  # X = invalid op
            "conv_id": pa.array(["c1", "c2", "c3"], pa.string()),
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": pa.array(["user"] * 3, pa.string()),
            "text": pa.array(["ok", "euro ts", "bad op"], pa.string()),
            "tool": pa.array([None, None, None], pa.string()),
            # row 2 uses a format outside the default ts_formats
            "ts": pa.array(
                ["2026-01-01 00:00:01", "01/02/2026 10:00:00", "2026-01-01 00:00:03"],
                pa.string(),
            ),
        }
    )
    src = str(tmp_path / "log")
    os.makedirs(src)
    pq.write_table(log, os.path.join(src, "events.parquet"))

    s1 = apply_cdc(src, cfg)
    assert s1["rows_live"] == 1 and s1["dirty_records"] == 2

    dirty_files = _glob.glob(os.path.join(cfg.out_dir, "dirty", "*", "*.parquet"))
    assert dirty_files
    # operator fix: accept the European format, then replay the dead letters
    cfg2 = CdcConfig(
        out_dir=cfg.out_dir, num_partitions=4,
        ts_formats=("%Y-%m-%d %H:%M:%S", "%d/%m/%Y %H:%M:%S"),
    )
    s2 = apply_cdc(dirty_files, cfg2)
    assert s2["rows_live"] >= 1 and s2["dirty_records"] == 1  # bad op stays dirty

    got = final_table_sorted(cfg2)
    assert got.num_rows == 2
    assert got["conv_id"].to_pylist() == ["c1", "c2"]
    assert str(got["ts"][1]) == "2026-02-01 10:00:00"


def test_delta_mode_with_hot_key_salting(fixture_root, tmp_path):
    """Hot-key salting composes with delta mode: routing (assign_parts)
    is identical in both strategies, so a salted skewed log under delta
    runs converges to the one-shot golden table."""
    from tg_data_connector_ray.cdc.pipeline import detect_hot_keys

    fx = write_fixture(fixture_root, "t2skew")
    hot = detect_hot_keys(fx["cdc_log"], threshold_frac=0.05)
    assert hot  # the fixture really has hot conversations
    cfg = CdcConfig(
        out_dir=str(tmp_path / "dsk"), num_partitions=8,
        hot_keys=tuple(hot), merge_strategy="delta",
    )
    files = sorted(
        os.path.join(fx["cdc_log"], f) for f in os.listdir(fx["cdc_log"])
    )
    k = len(files) // 2
    apply_cdc(files[:k], cfg)
    apply_cdc(files[k:], cfg)
    assert_converged(cfg, pq.read_table(fx["transcripts"]))


def test_normalize_numeric_narrowing_and_extreme_ts(tmp_path):
    """Review-pass regressions: (1) an out-of-int32-range int64 turn_idx
    and a fractional float lsn dirty-route their ROWS instead of
    ArrowInvalid-killing the task; (2) a timestamp outside pandas'
    datetime64[ns] range (year 3000) is VALID for the timestamp[us]
    schema; (3) a dirty row alongside a nested (list) extra column still
    writes to the dirty channel."""
    cfg = CdcConfig(out_dir=str(tmp_path / "nn"), num_partitions=2)
    log = pa.table(
        {
            "lsn": pa.array([1.0, 2.5, 3.0, 4.0], pa.float64()),  # 2.5 dirty
            "op": pa.array(["I", "I", "I", "X"], pa.string()),  # X dirty
            "conv_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "turn_idx": pa.array([0, 0, 2**40, 0], pa.int64()),  # 2^40 dirty
            "role": pa.array(["user"] * 4, pa.string()),
            "text": pa.array(["t1", "t2", "t3", "t4"], pa.string()),
            "tool": pa.array([None] * 4, pa.string()),
            "ts": pa.array(
                ["3000-01-01 00:00:00"] * 4, pa.string()
            ),  # beyond ns range, within us range
            "tags": pa.array([["x"], [], None, ["y", "z"]], pa.list_(pa.string())),
        }
    )
    src = str(tmp_path / "log")
    os.makedirs(src)
    pq.write_table(log, os.path.join(src, "events.parquet"))
    s = apply_cdc(src, cfg)
    assert s["rows_live"] == 1  # only row a survives
    assert s["dirty_records"] == 3
    got = final_table_sorted(cfg)
    assert got["conv_id"].to_pylist() == ["a"]
    assert str(got["ts"][0]) == "3000-01-01 00:00:00"


def test_time_travel_as_of_run(t2, tmp_path):
    """As-of-run reads over the LSM delta state: folding base + only the
    delta files journaled at or before run R must equal a fresh replay of
    exactly R's prefix of the log (the fold is associative, so a delta
    subset IS the one-shot fold of those runs).  Compaction moves the
    horizon: earlier as-of points raise TimeTravelError afterwards."""
    from tg_data_connector_ray.cdc.merge import TimeTravelError
    from tg_data_connector_ray.cdc.pipeline import compact, time_travel

    files = sorted(
        os.path.join(t2["cdc_log"], f) for f in os.listdir(t2["cdc_log"])
    )
    k = max(1, len(files) // 3)
    prefixes = [files[:k], files[: 2 * k], files]
    cfg = CdcConfig(
        out_dir=str(tmp_path / "tt"), num_partitions=8, merge_strategy="delta"
    )
    for i, batch in enumerate(
        (files[:k], files[k : 2 * k], files[2 * k :]), start=1
    ):
        apply_cdc(batch, cfg, run_id=f"r{i}")

    truth = []
    for i, prefix in enumerate(prefixes, start=1):
        tcfg = CdcConfig(out_dir=str(tmp_path / f"truth{i}"), num_partitions=8)
        apply_cdc(prefix, tcfg)
        truth.append(final_table_sorted(tcfg))

    for i in (1, 2, 3):
        got = time_travel(cfg, f"r{i}", sort=True)
        assert got.equals(truth[i - 1]), f"as-of r{i} diverged"

    with pytest.raises(ValueError, match="not in"):
        time_travel(cfg, "never-ran")

    # compaction folds every journaled run into the base: later as-of
    # points still serve (base folds exactly an allowed set), earlier
    # ones are past the horizon and must refuse loudly
    compact(cfg, tombstone_retention_lsn=0)
    assert time_travel(cfg, "r3", sort=True).equals(truth[2])
    with pytest.raises(TimeTravelError, match="horizon|folds runs"):
        time_travel(cfg, "r1")

    # inline auto-compaction (delta_compact_runs) writes the same
    # folded-runs record: as-of the compaction point works, before it not
    acfg = CdcConfig(
        out_dir=str(tmp_path / "auto"),
        num_partitions=8,
        merge_strategy="delta",
        delta_compact_runs=2,
    )
    for i, batch in enumerate(
        (files[:k], files[k : 2 * k], files[2 * k :]), start=1
    ):
        apply_cdc(batch, acfg, run_id=f"r{i}")
    assert time_travel(acfg, "r3", sort=True).equals(truth[2])
    try:
        assert time_travel(acfg, "r2", sort=True).equals(truth[1])
    except TimeTravelError:
        pass  # legal: a partition first touched by (r1, r3) compacts past r2
    with pytest.raises(TimeTravelError):
        time_travel(acfg, "r1")

    # refold mode compacts every run: only the latest journaled run is
    # reachable (its base folds all prior runs)
    rcfg = CdcConfig(out_dir=str(tmp_path / "refold"), num_partitions=8)
    apply_cdc(files[:k], rcfg, run_id="r1")
    apply_cdc(files[k:], rcfg, run_id="r2")
    assert time_travel(rcfg, "r2", sort=True).equals(
        final_table_sorted(rcfg)
    )
    with pytest.raises(TimeTravelError):
        time_travel(rcfg, "r1")


def test_change_feed_edge_semantics(tmp_path):
    """Change-feed classification on a handcrafted window: update -> U
    with the NEW payload, delete -> D with null payload, brand-new key ->
    I, resurrection (dead before, re-inserted inside the window) -> I,
    create+delete inside the window -> NOTHING, untouched keys -> nothing.
    A from/to pair out of journal order must raise."""
    from tg_data_connector_ray.cdc.pipeline import change_feed

    def log(path, rows):
        t = pa.table(
            {
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "op": pa.array([r[1] for r in rows], pa.string()),
                "conv_id": pa.array([r[2] for r in rows], pa.string()),
                "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
                "role": pa.array(["user"] * len(rows), pa.string()),
                "text": pa.array([r[4] for r in rows], pa.string()),
                "tool": pa.array([None] * len(rows), pa.string()),
                "ts": pa.array(["2026-01-01 00:00:01"] * len(rows), pa.string()),
            }
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(t, path)
        return path

    cfg = CdcConfig(
        out_dir=str(tmp_path / "cf"), num_partitions=4, merge_strategy="delta"
    )
    # run 1: five keys; "gone" dies inside run 1 (dead at the boundary)
    f1 = log(
        str(tmp_path / "l1" / "b.parquet"),
        [
            (1, "I", "upd", 0, "v1"),
            (2, "I", "del", 0, "v1"),
            (3, "I", "same", 0, "v1"),
            (4, "I", "gone", 0, "v1"),
            (5, "D", "gone", 0, None),
        ],
    )
    # run 2: update upd, delete del, new key, resurrect gone,
    # create+delete flash inside the window
    f2 = log(
        str(tmp_path / "l2" / "b.parquet"),
        [
            (6, "U", "upd", 0, "v2"),
            (7, "D", "del", 0, None),
            (8, "I", "new", 0, "v1"),
            (9, "I", "gone", 0, "back"),
            (10, "I", "flash", 0, "v1"),
            (11, "D", "flash", 0, None),
        ],
    )
    apply_cdc([f1], cfg, run_id="r1")
    apply_cdc([f2], cfg, run_id="r2")

    feed = change_feed(cfg, "r1", "r2").to_pandas()
    got = {(r.conv_id, r.op): r for r in feed.itertuples()}
    assert set(got) == {("upd", "U"), ("del", "D"), ("new", "I"), ("gone", "I")}
    assert got[("upd", "U")].text == "v2"
    assert got[("gone", "I")].text == "back"
    assert got[("del", "D")].text is None or got[("del", "D")].text != got[("del", "D")].text  # null
    # self-window: empty feed with the feed schema intact
    assert len(change_feed(cfg, "r2", "r2").to_pandas()) == 0
    with pytest.raises(ValueError, match="does not precede"):
        change_feed(cfg, "r2", "r1")


def test_compact_crash_between_base_write_and_unlink_is_idempotent(t1, tmp_path):
    """The documented compaction crash window: base rewritten but delta
    run files not yet unlinked.  Simulated by restoring the delta files
    after a full compact — every read path must fold base+deltas to the
    IDENTICAL state (same-LSN registers re-apply as no-ops), and a
    re-run of compact() converges and cleans up."""
    import shutil

    from tg_data_connector_ray.cdc.merge import partition_state_files
    from tg_data_connector_ray.cdc.pipeline import compact, final_table_arrow

    cfg = CdcConfig(
        out_dir=str(tmp_path / "cc"), num_partitions=4, merge_strategy="delta"
    )
    files = sorted(
        os.path.join(t1["cdc_log"], f) for f in os.listdir(t1["cdc_log"])
    )
    k = max(1, len(files) // 2)
    apply_cdc(files[:k], cfg, run_id="c1")
    apply_cdc(files[k:], cfg, run_id="c2")

    # stash the delta files, compact, then restore them = the crash state
    stash = tmp_path / "stash"
    os.makedirs(stash)
    saved = []
    state_root = os.path.join(cfg.out_dir, "state")
    for d in sorted(os.listdir(state_root)):
        for _, deltas in [partition_state_files(os.path.join(state_root, d))]:
            for f in deltas:
                dst = stash / f"{d}__{os.path.basename(f)}"
                shutil.copy(f, dst)
                saved.append((f, dst))
    before = final_table_arrow(cfg, sort=True)
    compact(cfg, tombstone_retention_lsn=0)
    clean = final_table_arrow(cfg, sort=True)
    assert clean.equals(before.filter(  # live view unchanged by compaction
        pa.compute.is_valid(before["conv_id"])
    ))
    for orig, dst in saved:
        shutil.copy(dst, orig)  # "crash": base new, deltas resurrected

    crashed = final_table_arrow(cfg, sort=True)
    assert crashed.equals(clean), "re-applied registers must be no-ops"
    res = compact(cfg, tombstone_retention_lsn=0)
    assert res["delta_runs_folded"] == len(saved)
    assert final_table_arrow(cfg, sort=True).equals(clean)
    exp = pq.read_table(t1["transcripts"])
    assert_converged(cfg, exp)


def test_change_feed_preimages_and_out_of_order_update(tmp_path):
    """include_before=True carries the as-of-from payload in <col>_old
    (null on I; a tombstoned prior version must NOT leak a preimage into
    a resurrection's I row), and a full I delivered in the window at an
    LSN BELOW the already-applied orphan-U watermark still emits U (the
    visible payload changes while max-LSN stays put — the value-compare
    clause, not the watermark, catches it)."""
    from tg_data_connector_ray.cdc.pipeline import change_feed

    def log(path, rows):
        t = pa.table(
            {
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "op": pa.array([r[1] for r in rows], pa.string()),
                "conv_id": pa.array([r[2] for r in rows], pa.string()),
                "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
                "role": pa.array([r[5] for r in rows], pa.string()),
                "text": pa.array([r[4] for r in rows], pa.string()),
                "tool": pa.array([r[6] for r in rows], pa.string()),
                "ts": pa.array(["2026-01-01 00:00:01"] * len(rows), pa.string()),
            }
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(t, path)
        return path

    cfg = CdcConfig(
        out_dir=str(tmp_path / "cf"), num_partitions=4, merge_strategy="delta"
    )
    # run 1: upd + del live; ooo exists only as an orphan U at lsn 99;
    # rez is created then deleted (tombstone with payload "stale")
    f1 = log(
        str(tmp_path / "l1" / "b.parquet"),
        [
            (1, "I", "upd", 0, "v1", "user", "grep"),
            (2, "I", "del", 0, "v1", "user", None),
            (99, "U", "ooo", 0, None, None, "late-tool"),
            (4, "I", "rez", 0, "stale", "user", None),
            (5, "D", "rez", 0, None, None, None),
        ],
    )
    # run 2: update upd (drops tool via new full I), delete del,
    # out-of-order full I for ooo BELOW the watermark, resurrect rez
    f2 = log(
        str(tmp_path / "l2" / "b.parquet"),
        [
            (6, "I", "upd", 0, "v2", "assistant", None),
            (7, "D", "del", 0, None, None, None),
            (50, "I", "ooo", 0, "body", "tool", None),
            (8, "I", "rez", 0, "back", "user", None),
        ],
    )
    apply_cdc([f1], cfg, run_id="r1")
    apply_cdc([f2], cfg, run_id="r2")

    feed = change_feed(cfg, "r1", "r2", include_before=True).to_pandas()
    got = {(r.conv_id, r.op): r for r in feed.itertuples()}
    assert set(got) == {("upd", "U"), ("del", "D"), ("ooo", "U"), ("rez", "I")}

    def isnull(v):
        import pandas as pd

        return v is None or (isinstance(v, float) and pd.isna(v))

    # U: preimage = run-1 state, postimage = run-2 state
    u = got[("upd", "U")]
    assert (u.text_old, u.text) == ("v1", "v2")
    assert (u.role_old, u.role) == ("user", "assistant")
    assert u.tool_old == "grep" and isnull(u.tool)
    # D: postimage null, preimage carries the deleted payload
    d = got[("del", "D")]
    assert isnull(d.text) and d.text_old == "v1"
    # out-of-order I below the watermark: U with the merged postimage
    # (text/role from the I, tool from the higher-LSN orphan U register)
    o = got[("ooo", "U")]
    assert o.text == "body" and o.role == "tool" and o.tool == "late-tool"
    assert isnull(o.text_old) and o.tool_old == "late-tool"
    # resurrection: I with NO preimage (the tombstone's stale payload
    # must not leak)
    r = got[("rez", "I")]
    assert r.text == "back" and isnull(r.text_old) and isnull(r.role_old)


def test_incremental_stats_maintenance_equals_recompute(t2, tmp_path):
    """IVM end-to-end on the t2 fixture: conv_stats as of run 2, change
    feed folded in, equals a full recompute on the final table — incl.
    fully-deleted conversations dropping out of the snapshot."""
    from tg_data_connector_ray.cdc.pipeline import (
        change_feed,
        read_final_table,
        time_travel_runs,
    )
    from tg_data_connector_ray.ops.transcripts import apply_stats_feed, conv_stats
    from tg_data_connector_ray.util import list_files

    cfg = CdcConfig(
        out_dir=str(tmp_path / "ivm"), num_partitions=8, merge_strategy="delta"
    )
    files = sorted(list_files(t2["cdc_log"], suffix=".parquet"))
    k = max(1, len(files) // 3)
    apply_cdc(files[: 2 * k], cfg, run_id="r1")
    apply_cdc(files[2 * k :], cfg, run_id="r2")

    prior = conv_stats(read_final_table(cfg, runs=time_travel_runs(cfg, "r1")))
    feed = change_feed(cfg, "r1", "r2", include_before=True)
    got = apply_stats_feed(prior, feed).to_pandas()
    exp = conv_stats(read_final_table(cfg)).to_pandas()
    got = got.sort_values("conv_id").reset_index(drop=True)
    exp = exp.sort_values("conv_id").reset_index(drop=True)
    assert got.equals(exp)


def test_turn_context_maintenance_equals_recompute(t2, tmp_path):
    """JOIN-shaped IVM on the t2 fixture: the per-turn view (turns ⋈
    conv aggregates) as of run 1, maintained by per-key re-derivation
    from the change feed, equals a full recompute on the final table —
    on three paths: the pruned point-read path, the forced full-recompute
    fallback (max_changed_convs=0), and the empty-feed no-op."""
    from tg_data_connector_ray.cdc.pipeline import (
        change_feed,
        read_final_table,
        time_travel_runs,
    )
    from tg_data_connector_ray.ops.transcripts import (
        apply_turn_context_feed,
        turn_context,
    )
    from tg_data_connector_ray.util import list_files

    def norm(df):
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    cfg = CdcConfig(
        out_dir=str(tmp_path / "ivmj"), num_partitions=8, merge_strategy="delta"
    )
    files = sorted(list_files(t2["cdc_log"], suffix=".parquet"))
    k = max(1, len(files) // 3)
    apply_cdc(files[: 2 * k], cfg, run_id="r1")
    apply_cdc(files[2 * k :], cfg, run_id="r2")

    prior = turn_context(read_final_table(cfg, runs=time_travel_runs(cfg, "r1")))
    feed = change_feed(cfg, "r1", "r2", include_before=True)
    exp = norm(turn_context(read_final_table(cfg)).to_pandas())

    got = norm(apply_turn_context_feed(prior, feed, cfg).to_pandas())
    assert got.equals(exp)

    # forced fallback: every changed set exceeds the bound -> full recompute
    prior2 = turn_context(read_final_table(cfg, runs=time_travel_runs(cfg, "r1")))
    fb = norm(
        apply_turn_context_feed(
            prior2, feed, cfg, max_changed_convs=0
        ).to_pandas()
    )
    assert fb.equals(exp)

    # empty feed is a no-op (the prior snapshot comes back unchanged)
    empty_feed = change_feed(cfg, "r2", "r2", include_before=True)
    head_view = turn_context(read_final_table(cfg))
    same = norm(apply_turn_context_feed(head_view, empty_feed, cfg).to_pandas())
    assert same.equals(exp)


def test_redact_convs_through_the_log(t1, tmp_path):
    """Right-to-be-forgotten via synthesized U events: target convs'
    live turns get text := [REDACTED] (roles/ts untouched), other convs
    are byte-identical, lineage watermark advances, and a re-run with
    the same run_id is a no-op (exactly-once)."""
    import pyarrow.compute as pc

    from tg_data_connector_ray.cdc.pipeline import (
        final_table_arrow,
        lineage_summary,
        redact_convs,
    )

    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=8)
    apply_cdc(t1["cdc_log"], cfg)
    before = final_table_arrow(cfg, sort=True)
    wm0 = lineage_summary(cfg)["watermark_max"]
    targets = sorted(set(before["conv_id"].to_pylist()))[:3]

    s = redact_convs(cfg, targets, run_id="rr-1")
    after = final_table_arrow(cfg, sort=True)
    tgt_mask = pc.is_in(after["conv_id"], value_set=pa.array(targets))
    tgt = after.filter(tgt_mask)
    assert s["turns_redacted"] == tgt.num_rows > 0
    assert set(tgt["text"].to_pylist()) == {"[REDACTED]"}
    # structure preserved: same keys and roles as before, only text changed
    b_tgt = before.filter(pc.is_in(before["conv_id"], value_set=pa.array(targets)))
    assert tgt.select(["conv_id", "turn_idx", "role"]).equals(
        b_tgt.select(["conv_id", "turn_idx", "role"])
    )
    # untouched conversations byte-identical
    assert after.filter(pc.invert(tgt_mask)).equals(
        before.filter(
            pc.invert(pc.is_in(before["conv_id"], value_set=pa.array(targets)))
        )
    )
    assert lineage_summary(cfg)["watermark_max"] == wm0 + tgt.num_rows

    # idempotent: same run_id -> merge skips every partition
    s2 = redact_convs(cfg, targets, run_id="rr-1")
    assert s2["partitions_applied"] == 0
    assert final_table_arrow(cfg, sort=True).equals(after)

    # unknown conversations: nothing to redact, no run applied
    s3 = redact_convs(cfg, ["conv_nonexistent"], run_id="rr-2")
    assert s3["events_in"] == 0 and s3["turns_redacted"] == 0


def test_grouped_arrow_aggregate_spool_exchange_matches_sort(t1, tmp_path):
    """The spooled-exchange aggregate path returns exactly the sort
    path's groups (many-small-block input: a union of two datasets)."""
    import ray

    from tg_data_connector_ray.pipelines.relational import grouped_arrow_aggregate

    t = pq.read_table(t1["transcripts"])
    half = t.num_rows // 2
    ds = ray.data.from_arrow(t.slice(0, half)).union(
        ray.data.from_arrow(t.slice(half))
    )

    def thin(b):
        import pyarrow.compute as pc

        return pa.table(
            {
                "conv_id": b["conv_id"],
                "n": pa.array([1] * b.num_rows, pa.int64()),
                "chars": pc.fill_null(pc.utf8_length(b["text"]), 0).cast(pa.int64()),
            }
        )

    outs = {}
    for ex in ("sort", "spool"):
        g = grouped_arrow_aggregate(
            ds.map_batches(thin, batch_format="pyarrow"),
            "conv_id",
            [("n", "sum"), ("chars", "sum")],
            ["n", "chars"],
            exchange=ex,
        )
        outs[ex] = (
            g.to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
    assert outs["sort"].equals(outs["spool"])


def test_replay_dirty_repairs_fixable_rows_and_requeues_the_rest(tmp_path):
    """Dead-letter repair-replay: the standard fix rules recover the four
    repairable F5 rows (op X->U, abs turn, null bad ts, '' for the
    nullFormat insert); the two structurally broken rows (null conv_id /
    turn_idx) re-route to the NEW run's dirty channel; the whole flow is
    idempotent per new_run_id."""
    from tg_data_connector_ray.cdc.normalize import build_dirty_fixer
    from tg_data_connector_ray.cdc.pipeline import replay_dirty

    d = tmp_path / "dirtylog"
    os.makedirs(d)
    pq.write_table(make_dirty_log(), str(d / "evt-0000.parquet"))
    cfg = CdcConfig(
        out_dir=str(tmp_path / "out"), num_partitions=2, null_format="\\N"
    )
    s1 = apply_cdc(str(d), cfg, run_id="ingest-1")
    assert s1["dirty_records"] == 6

    fixer = build_dirty_fixer(
        map_op={"X": "U"}, abs_turn=True, null_bad_ts=True,
        empty_text_insert=True,
    )
    s2 = replay_dirty(cfg, "ingest-1", fixer, "repair-1")
    assert s2["repaired_in"] == 6
    assert s2["events_in"] == 4          # four rows pass revalidation
    assert s2["dirty_records"] == 2      # null conv_id + null turn_idx

    final = final_table_sorted(cfg)
    by_key = {
        (r["conv_id"], r["turn_idx"]): r for r in final.to_pylist()
    }
    # op X -> U lands as an (upsert) update on a previously absent key
    assert by_key[("conv00000001", 1)]["text"] == "bad op"
    # negative turn -5 -> 5
    assert by_key[("conv00000002", 5)]["text"] == "neg turn"
    # unparseable ts nulled, row kept
    assert by_key[("conv00000004", 1)]["ts"] is None
    # nullFormat insert repaired to an explicit empty payload
    assert by_key[("conv00000003", 1)]["text"] == ""

    # idempotent: re-running the same repair changes nothing
    s3 = replay_dirty(cfg, "ingest-1", fixer, "repair-1")
    assert s3["partitions_applied"] == 0
    assert final_table_sorted(cfg).equals(final)

    # a run with no dirty output is a no-op
    s4 = replay_dirty(cfg, "no-such-run", fixer, "repair-2")
    assert s4["events_in"] == 0 and s4["repaired_in"] == 0


def test_tail_log_consumes_shards_as_they_appear(t1, tmp_path):
    """Log-tail ingestion: shards dropped (atomically) while the tail is
    polling are consumed in micro-batches; the converged table equals a
    one-shot replay; a restart skips the journaled shards; and losing
    the journal is harmless (re-applied events dedup structurally)."""
    import shutil
    import threading
    import time

    from tg_data_connector_ray.cdc.pipeline import tail_log
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    assert len(files) >= 6
    watch = tmp_path / "watch"
    os.makedirs(watch)

    def drop(batch):
        for f in batch:
            tmp = str(watch / ("." + os.path.basename(f) + ".tmp"))
            shutil.copyfile(f, tmp)
            os.replace(tmp, str(watch / os.path.basename(f)))

    drop(files[:2])
    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)

    # producer thread drops two more groups while the tail runs
    def producer():
        time.sleep(0.3)
        drop(files[2:4])
        time.sleep(0.3)
        drop(files[4:])

    th = threading.Thread(target=producer)
    th.start()
    totals = tail_log(
        str(watch), cfg, poll_interval=0.05, idle_polls=40
    )
    th.join()
    assert totals["files"] == len(files)
    assert totals["batches"] >= 2  # first group + at least one live drop
    assert len(set(totals["runs"])) == totals["batches"]

    # converged state == one-shot replay of the same log
    expect_cfg = CdcConfig(out_dir=str(tmp_path / "oneshot"), num_partitions=4)
    apply_cdc(t1["cdc_log"], expect_cfg)
    assert final_table_sorted(cfg).equals(final_table_sorted(expect_cfg))

    # restart: everything journaled, nothing new -> no batches
    again = tail_log(str(watch), cfg, poll_interval=0.01, idle_polls=2)
    assert again["batches"] == 0

    # journal loss: full redelivery under a DIFFERENT batching is a
    # no-op on state (LSN-register fold dedups re-applied events)
    os.remove(os.path.join(cfg.out_dir, "tail.log"))
    before = final_table_sorted(cfg)
    redo = tail_log(str(watch), cfg, poll_interval=0.01, idle_polls=2)
    assert redo["batches"] == 1 and redo["files"] == len(files)
    assert final_table_sorted(cfg).equals(before)


def test_route_by_table_splits_and_applies_per_table(t1, tmp_path):
    """Multi-table stream routing: a tagged interleaved log splits into
    per-table shard dirs; each table's independent exactly-once apply
    equals a filtered single-table replay; a null table tag refuses."""
    import pyarrow.compute as pc
    import ray

    from tg_data_connector_ray.cdc.pipeline import route_by_table
    from tg_data_connector_ray.util import list_files

    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))

    def tag(t):
        par = pc.bit_wise_and(
            pc.cast(pc.utf8_slice_codeunits(t["conv_id"], 4, 99), pa.int64()),
            pa.scalar(1, pa.int64()),
        )
        return t.append_column(
            "tbl", pc.if_else(pc.equal(par, 0), pa.scalar("a"), pa.scalar("b"))
        )

    tagged = tmp_path / "tagged"
    ray.data.read_parquet(files).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(str(tagged))

    routed = route_by_table(str(tagged), str(tmp_path / "routed"))
    assert sorted(routed) == ["a", "b"]

    for name, shard_dir in routed.items():
        cfg = CdcConfig(out_dir=str(tmp_path / f"t-{name}"), num_partitions=4)
        apply_cdc(shard_dir, cfg)
        got = final_table_sorted(cfg)
        # reference: full replay filtered to this table's conversations
        full_cfg = CdcConfig(out_dir=str(tmp_path / f"full-{name}"), num_partitions=4)
        apply_cdc(t1["cdc_log"], full_cfg)
        full = final_table_sorted(full_cfg)
        par = pc.bit_wise_and(
            pc.cast(pc.utf8_slice_codeunits(full["conv_id"], 4, 99), pa.int64()),
            pa.scalar(1, pa.int64()),
        )
        want = full.filter(pc.equal(par, 0 if name == "a" else 1))
        assert got.num_rows == want.num_rows > 0 and got.equals(want)

    # a row with a null tag must refuse, not silently merge keyspaces
    import pyarrow.parquet as pq

    bad = tmp_path / "bad"
    os.makedirs(bad)
    t = pa.parquet.read_table(files[0])
    pq.write_table(
        t.append_column("tbl", pa.nulls(t.num_rows, pa.string())),
        str(bad / "evt.parquet"),
    )
    with pytest.raises(ray.exceptions.RayTaskError, match="null 'tbl'"):
        route_by_table(str(bad), str(tmp_path / "badrouted"))

    # Dataset input: tagging fused into the hive split (no staged tagged
    # copy) must produce byte-identical per-table shards
    fused = route_by_table(
        ray.data.read_parquet(files).map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        ),
        str(tmp_path / "routed_fused"),
    )
    assert sorted(fused) == ["a", "b"]
    for name, shard_dir in fused.items():
        got = (
            pa.parquet.ParquetDataset(shard_dir).read()
            .sort_by([("conv_id", "ascending"), ("lsn", "ascending")])
        )
        want = (
            pa.parquet.ParquetDataset(routed[name]).read()
            .sort_by([("conv_id", "ascending"), ("lsn", "ascending")])
        )
        assert got.equals(want)

    # input_token idempotence: same token -> the split is NOT rebuilt
    # (file mtimes+sizes untouched, the Dataset thunk never runs); a
    # different token -> rebuilt; a truncated shard -> rebuilt (manifest
    # size check fails)
    from tg_data_connector_ray.util import list_files as _lf

    tok_root = tmp_path / "routed_tok"
    r1 = route_by_table(str(tagged), str(tok_root), input_token="tok-1")
    sig1 = {
        f: (os.stat(f).st_size, os.stat(f).st_mtime_ns)
        for d in r1.values() for f in _lf(d, suffix=".parquet")
    }

    def boom():
        raise AssertionError("thunk must not run on a manifest hit")

    r2 = route_by_table(boom, str(tok_root), input_token="tok-1")
    assert r2 == r1
    sig2 = {
        f: (os.stat(f).st_size, os.stat(f).st_mtime_ns)
        for d in r2.values() for f in _lf(d, suffix=".parquet")
    }
    assert sig2 == sig1

    r3 = route_by_table(str(tagged), str(tok_root), input_token="tok-2")
    assert sorted(r3) == ["a", "b"]

    victim = _lf(r3["a"], suffix=".parquet")[0]
    with open(victim, "ab") as fh:
        fh.write(b"x")
    r4 = route_by_table(str(tagged), str(tok_root), input_token="tok-2")
    assert sorted(r4) == ["a", "b"]
    tot = sum(
        pa.parquet.ParquetDataset(d).read().num_rows for d in r4.values()
    )
    want_tot = sum(
        pa.parquet.ParquetDataset(d).read().num_rows for d in routed.values()
    )
    assert tot == want_tot


def test_apply_corrections_sparse_images_and_validation(t1, tmp_path):
    """Correction batches: only the provided columns change (U-merge
    sparse images), untouched rows stay byte-identical, duplicate keys
    and unknown columns refuse, idempotent per run_id."""
    import pyarrow.compute as pc

    from tg_data_connector_ray.cdc.pipeline import apply_corrections

    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    before = final_table_sorted(cfg)
    k = before.slice(0, 3).select(["conv_id", "turn_idx"])

    corrections = k.append_column(
        "text", pa.array(["fix0", "fix1", "fix2"], pa.string())
    )
    s = apply_corrections(cfg, corrections, run_id="c1")
    assert s["corrections_in"] == 3 and s["events_in"] == 3
    after = final_table_sorted(cfg)
    assert after.num_rows == before.num_rows
    assert after.slice(0, 3)["text"].to_pylist() == ["fix0", "fix1", "fix2"]
    # sparse image: every OTHER column of the corrected rows unchanged
    assert after.slice(0, 3).drop_columns(["text"]).equals(
        before.slice(0, 3).drop_columns(["text"])
    )
    assert after.slice(3).equals(before.slice(3))

    # idempotent per run_id
    s2 = apply_corrections(cfg, corrections, run_id="c1")
    assert s2["partitions_applied"] == 0
    assert final_table_sorted(cfg).equals(after)

    with pytest.raises(ValueError, match="duplicate"):
        apply_corrections(
            cfg, pa.concat_tables([corrections, corrections]), run_id="c2"
        )
    with pytest.raises(ValueError, match="unknown correction columns"):
        apply_corrections(
            cfg,
            k.append_column("lsn", pa.array([1, 2, 3], pa.int64())),
            run_id="c3",
        )
    with pytest.raises(ValueError, match="conv_id"):
        apply_corrections(cfg, pa.table({"turn_idx": pa.array([1])}), run_id="c4")


def test_read_convs_point_lookup(t1, tmp_path):
    """Pruned point lookup == the golden table filtered to the requested
    keys; unknown and deleted keys contribute nothing; the conv_id
    predicate is pushed into the parquet scan (only the routed partitions
    are touched)."""
    from tg_data_connector_ray.cdc.pipeline import read_convs

    cfg = CdcConfig(out_dir=str(tmp_path / "pl"), num_partitions=8)
    apply_cdc(t1["cdc_log"], cfg)
    exp = pq.read_table(t1["transcripts"])
    convs = exp["conv_id"].to_pylist()
    pick = sorted({convs[0], convs[len(convs) // 2], convs[-1]})
    # deleted (conv, turn) keys are covered implicitly: the golden
    # transcripts table already excludes them, so equality below proves
    # the lookup filters tombstones
    got = read_convs(cfg, pick + ["conv_never_existed"])
    want = exp.filter(
        pa.compute.is_in(exp["conv_id"], value_set=pa.array(pick))
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(want.select(got.column_names))
    assert read_convs(cfg, []).num_rows == 0


def test_read_convs_hot_key_and_delta_fold(fixture_root, tmp_path):
    """The lookup widens to all partitions for salted hot keys and folds
    uncompacted LSM delta runs inside the pruned read."""
    from tg_data_connector_ray.cdc.pipeline import read_convs

    fx = write_fixture(fixture_root, "t2skew")
    hot = detect_hot_keys(fx["cdc_log"], threshold_frac=0.05)
    assert hot
    cfg = CdcConfig(
        out_dir=str(tmp_path / "plhot"), num_partitions=8,
        hot_keys=tuple(hot), merge_strategy="delta",
        delta_compact_runs=100,  # keep deltas uncompacted
    )
    files = sorted(
        os.path.join(fx["cdc_log"], f) for f in os.listdir(fx["cdc_log"])
    )
    k = len(files) // 2
    apply_cdc(files[:k], cfg)
    apply_cdc(files[k:], cfg)
    # deltas really are uncompacted: the fold path is exercised
    from tg_data_connector_ray.cdc.merge import partition_state_files
    assert any(
        partition_state_files(cfg.state_dir(p))[1] for p in range(8)
    )
    exp = pq.read_table(fx["transcripts"])
    pick = sorted([hot[0], exp["conv_id"][0].as_py()])
    got = read_convs(cfg, pick)
    want = exp.filter(
        pa.compute.is_in(exp["conv_id"], value_set=pa.array(pick))
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(want.select(got.column_names))


def test_snapshot_sync_converges_to_snapshot(t2, fixture_root, tmp_path):
    """snapshot_sync diffs the converged table against a full snapshot
    and applies I (new/changed keys, incl. columns the snapshot NULLed)
    and D (missing keys) so the table equals the snapshot exactly;
    idempotent per run_id; later producer events outrank the sync."""
    from tg_data_connector_ray.cdc.pipeline import (
        apply_corrections,
        final_table_arrow,
        snapshot_sync,
    )
    from tg_data_connector_ray.fixtures import write_snapshot

    cfg = CdcConfig(out_dir=str(tmp_path / "ss"), num_partitions=8)
    apply_cdc(t2["cdc_log"], cfg)
    snap_path = write_snapshot(fixture_root, "t2")
    s1 = snapshot_sync(cfg, snap_path, run_id="sync-1")
    assert s1["sync_inserts"] > 0 and s1["sync_deletes"] > 0

    got = final_table_arrow(cfg, sort=True)
    exp = pq.read_table(snap_path).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert got.num_rows == exp.num_rows
    assert got["text"].equals(exp["text"])
    # the snapshot NULLs `tool` on every drifted key — a sparse U could
    # not clear those; the full-I diff must have (exact equality below
    # covers it, this pins the clear happened at all)
    assert got["tool"].null_count == exp["tool"].null_count > 0
    assert got.equals(exp.select(got.column_names))

    # idempotent: same run_id skips committed partitions, table unchanged
    snapshot_sync(cfg, snap_path, run_id="sync-1")
    assert final_table_arrow(cfg, sort=True).equals(got)
    # a fresh sync against the now-identical table is a no-op run
    s3 = snapshot_sync(cfg, snap_path, run_id="sync-2")
    assert s3["sync_inserts"] == 0 and s3["sync_deletes"] == 0

    # later producer events land ABOVE the sync watermark and win
    key = got.slice(0, 1)
    fix = pa.table({
        "conv_id": key["conv_id"],
        "turn_idx": key["turn_idx"],
        "text": pa.array(["post-sync-edit"]),
    })
    apply_corrections(cfg, fix, run_id="post-sync")
    after = final_table_arrow(cfg, sort=True)
    assert after["text"][0].as_py() == "post-sync-edit"
    assert after.num_rows == got.num_rows


def test_snapshot_sync_bootstraps_fresh_table(t1, fixture_root, tmp_path):
    """Syncing into an empty out_dir is a pure bootstrap: every snapshot
    row inserts; the table equals the snapshot."""
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow, snapshot_sync
    from tg_data_connector_ray.fixtures import write_snapshot

    cfg = CdcConfig(out_dir=str(tmp_path / "boot"), num_partitions=4)
    snap_path = write_snapshot(fixture_root, "t1")
    s = snapshot_sync(cfg, snap_path, run_id="boot-1")
    exp = pq.read_table(snap_path)
    assert s["sync_inserts"] == exp.num_rows and s["sync_deletes"] == 0
    got = final_table_arrow(cfg, sort=True)
    assert got.num_rows == exp.num_rows
    exp = exp.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(exp.select(got.column_names))


def test_read_final_table_column_pruning(t1, tmp_path):
    """read_final_table(columns=...) prunes the scan to a USER_COLS
    subset (both the plain-parquet path and the delta fold path) and
    rejects unknown columns."""
    from tg_data_connector_ray.cdc.pipeline import read_final_table

    cfg = CdcConfig(out_dir=str(tmp_path / "prune"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    thin = read_final_table(cfg, columns=["conv_id", "text"])
    assert set(thin.schema().names) == {"conv_id", "text"}
    assert thin.count() == pq.read_table(t1["transcripts"]).num_rows

    dcfg = CdcConfig(out_dir=str(tmp_path / "prune_d"), num_partitions=4,
                     merge_strategy="delta", delta_compact_runs=100)
    apply_cdc(t1["cdc_log"], dcfg)
    thin_d = read_final_table(dcfg, columns=["conv_id", "text"])
    assert set(thin_d.schema().names) == {"conv_id", "text"}
    assert thin_d.count() == thin.count()

    with pytest.raises(ValueError, match="unknown columns"):
        read_final_table(cfg, columns=["nope"])


def test_expire_rows_retention(t1, tmp_path):
    """expire_rows deletes exactly the ts < cutoff live turns through
    the log; re-running is a no-op; compact() makes the forgetting
    physical (tombstones dropped)."""
    from tg_data_connector_ray.cdc.pipeline import (
        compact,
        expire_rows,
        final_table_arrow,
    )

    cfg = CdcConfig(out_dir=str(tmp_path / "exp"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    full = final_table_arrow(cfg, sort=True)
    cutoff = full["ts"][len(full) // 2].as_py()  # mid-range timestamp

    s = expire_rows(cfg, cutoff, run_id="exp-1")
    assert s["turns_expired"] > 0
    got = final_table_arrow(cfg, sort=True)
    keep = pa.compute.fill_null(
        pa.compute.greater_equal(full["ts"], pa.scalar(cutoff)), True
    )
    want = full.filter(keep)
    assert got.equals(want)
    # idempotent: nothing left to expire
    s2 = expire_rows(cfg, cutoff, run_id="exp-2")
    assert s2["turns_expired"] == 0
    assert final_table_arrow(cfg, sort=True).equals(want)
    # physical forgetting: compaction drops the tombstones
    rep = compact(cfg)
    assert rep["tombstones_dropped"] >= s["turns_expired"]
    assert final_table_arrow(cfg, sort=True).equals(want)


def test_tail_log_multi_interleaved_stream(t1, tmp_path):
    """Multi-table tailing: interleaved waves split per table and apply
    exactly-once into per-table dirs; a table appearing mid-stream
    materializes on its first event; losing tail.log and re-delivering
    everything changes nothing (ledgers + LSN fold dedup)."""
    import numpy as np

    from tg_data_connector_ray.cdc.pipeline import (
        final_table_arrow,
        tail_log_multi,
    )

    log = pa.concat_tables(
        [pq.read_table(os.path.join(t1["cdc_log"], f))
         for f in sorted(os.listdir(t1["cdc_log"]))],
        promote_options="default",
    )
    # deterministic table tag by conv parity; a small 'gamma' slice only
    # in the SECOND half of the stream (mid-stream table appearance)
    num = pa.compute.cast(
        pa.compute.utf8_slice_codeunits(log["conv_id"], 4, 99), pa.int64()
    ).to_numpy(zero_copy_only=False)
    tbl = np.where(num % 2 == 0, "alpha", "beta").astype(object)
    half = log.num_rows // 2
    gamma = (num % 17 == 0) & (np.arange(log.num_rows) >= half)
    tbl[gamma] = "gamma"
    tagged = log.append_column("tbl", pa.array(tbl.tolist(), pa.string()))

    src = str(tmp_path / "shards")
    os.makedirs(src)
    n_shards = 6
    k = log.num_rows // n_shards
    for i in range(n_shards):
        ln = k + (log.num_rows % n_shards if i == n_shards - 1 else 0)
        pq.write_table(tagged.slice(i * k, ln),
                       os.path.join(src, f"s-{i:02d}.parquet"))
    shards = sorted(os.path.join(src, f) for f in os.listdir(src))

    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    waves = [shards[:2], shards[2:4], shards[4:]]
    wi = iter(waves)

    def drop(_s=None):
        for f in next(wi, []):
            os.symlink(f, os.path.join(watch, os.path.basename(f)))

    drop()
    root = str(tmp_path / "tables")
    totals = tail_log_multi(watch, root, table_col="tbl",
                            cfg_kwargs={"num_partitions": 4},
                            poll_interval=0.05, idle_polls=5, on_batch=drop)
    assert totals["batches"] == 3
    assert totals["events_in"] == log.num_rows
    assert set(totals["rows_live"]) == {"alpha", "beta", "gamma"}

    # per-table convergence vs one-shot per-table applies
    for name in ("alpha", "beta", "gamma"):
        cfg = CdcConfig(out_dir=os.path.join(root, name), num_partitions=4)
        got = final_table_arrow(cfg, sort=True)
        ev = tagged.filter(pa.compute.equal(tagged["tbl"], name))
        one = CdcConfig(out_dir=str(tmp_path / f"one-{name}"), num_partitions=4)
        p = str(tmp_path / f"ev-{name}.parquet")
        pq.write_table(ev.drop_columns(["tbl"]), p)
        apply_cdc([p], one)
        assert got.equals(final_table_arrow(one, sort=True))

    # journal loss: full redelivery is a no-op
    os.unlink(os.path.join(root, "tail.log"))
    before = final_table_arrow(
        CdcConfig(out_dir=os.path.join(root, "alpha"), num_partitions=4),
        sort=True,
    )
    t2 = tail_log_multi(watch, root, table_col="tbl",
                        cfg_kwargs={"num_partitions": 4},
                        poll_interval=0.05, idle_polls=3)
    assert t2["batches"] == 1  # everything redelivered as one batch
    after = final_table_arrow(
        CdcConfig(out_dir=os.path.join(root, "alpha"), num_partitions=4),
        sort=True,
    )
    assert after.equals(before)


def test_mirror_to_sql_roundtrip(t1, tmp_path):
    """The converged table mirrors into an RDBMS through the
    exactly-once SQL sink; re-mirroring after an edit upserts (no dupes,
    new values visible)."""
    import sqlite3

    from tg_data_connector_ray.cdc.pipeline import (
        apply_corrections,
        final_table_arrow,
        mirror_to_sql,
    )

    cfg = CdcConfig(out_dir=str(tmp_path / "mir"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    db = str(tmp_path / "mirror.db")
    factory = lambda: sqlite3.connect(db)  # noqa: E731

    n = mirror_to_sql(cfg, factory, "transcripts")
    exp = final_table_arrow(cfg, sort=True)
    assert n == exp.num_rows
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM transcripts").fetchone()[0] == n

    fix = pa.table({
        "conv_id": exp["conv_id"].slice(0, 1),
        "turn_idx": exp["turn_idx"].slice(0, 1),
        "text": pa.array(["mirrored-edit"]),
    })
    apply_corrections(cfg, fix, run_id="mir-fix")
    mirror_to_sql(cfg, factory, "transcripts")
    got = con.execute(
        "SELECT count(*), sum(text = 'mirrored-edit') FROM transcripts"
    ).fetchone()
    assert got == (n, 1)
    row = con.execute(
        "SELECT text FROM transcripts WHERE conv_id = ? AND turn_idx = ?",
        (exp["conv_id"][0].as_py(), exp["turn_idx"][0].as_py()),
    ).fetchone()
    assert row == ("mirrored-edit",)
    con.close()


def test_run_id_path_safety(t1, tmp_path):
    """run ids name ledger/journal/stage paths: separators are refused."""
    cfg = CdcConfig(out_dir=str(tmp_path / "rid"), num_partitions=2)
    with pytest.raises(ValueError, match="path-safe"):
        apply_cdc(t1["cdc_log"], cfg, run_id="bad/run")
    # an empty run_id falls back to the content-derived id (falsy arg)
    assert apply_cdc(t1["cdc_log"], cfg, run_id="")["rows_live"] > 0


def test_journaled_replay_skips_exchange_entirely(t1, tmp_path, monkeypatch):
    """A journaled, manifest-intact, lineage-complete run replays as a
    pure metadata read — the event log is never re-read.  Losing any
    partition's lineage falls back to the repairing slow path."""
    import os
    import shutil

    import tg_data_connector_ray.cdc.pipeline as P

    cfg = CdcConfig(out_dir=str(tmp_path / "out"), num_partitions=4)
    s1 = apply_cdc(t1["cdc_log"], cfg)

    def boom(*a, **k):
        raise AssertionError("exchange ran on a fully-committed replay")

    monkeypatch.setattr(P, "_run_exchange_and_merge", boom)
    s2 = apply_cdc(t1["cdc_log"], cfg)  # fast path: boom not reached
    assert s2["run_id"] == s1["run_id"]
    assert s2["partitions_skipped"] == s2["partitions"] == s1["partitions"]
    assert s2["partitions_applied"] == 0
    assert s2["rows_live"] == s1["rows_live"]
    monkeypatch.undo()

    # lose one partition's lineage record -> slow path repairs
    lroot = os.path.join(cfg.out_dir, "lineage")
    victim = sorted(os.listdir(lroot))[0]
    os.unlink(os.path.join(lroot, victim, f"{s1['run_id']}.json"))
    shutil.rmtree(cfg.state_dir(int(victim.split("=")[1])), ignore_errors=True)
    s3 = apply_cdc(t1["cdc_log"], cfg)
    assert s3["partitions_applied"] == 1
    assert s3["partitions_skipped"] == s3["partitions"] - 1
    assert_converged(cfg, pq.read_table(t1["transcripts"]))


def test_change_feed_prunes_untouched_partitions(tmp_path):
    """A window that touches one conversation folds only that key's
    partition: _window_touched_dirs keeps a strict subset, the pruned
    feed equals the brute diff of the two as-of tables, an empty window
    yields a typed empty feed, and compaction past from_run still raises
    TimeTravelError (pruning must never turn the horizon error into a
    silently short feed)."""
    import pyarrow.compute as pc

    from tg_data_connector_ray.cdc.merge import TimeTravelError
    from tg_data_connector_ray.cdc.pipeline import (
        _partition_state_dirs,
        _window_touched_dirs,
        change_feed,
        compact,
        time_travel,
        time_travel_runs,
    )

    def log(path, rows):
        t = pa.table(
            {
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "op": pa.array([r[1] for r in rows], pa.string()),
                "conv_id": pa.array([r[2] for r in rows], pa.string()),
                "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
                "role": pa.array(["user"] * len(rows), pa.string()),
                "text": pa.array([r[4] for r in rows], pa.string()),
                "tool": pa.array([None] * len(rows), pa.string()),
                "ts": pa.array(["2026-01-01 00:00:01"] * len(rows), pa.string()),
            }
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(t, path)
        return path

    cfg = CdcConfig(
        out_dir=str(tmp_path / "pr"), num_partitions=16, merge_strategy="delta"
    )
    # run 1 spreads 64 keys over all partitions; run 2 touches ONE conv
    f1 = log(
        str(tmp_path / "l1" / "b.parquet"),
        [(i + 1, "I", f"conv{i:03d}", 0, "v1") for i in range(64)],
    )
    f2 = log(
        str(tmp_path / "l2" / "b.parquet"),
        [(100, "U", "conv007", 0, "v2")],
    )
    apply_cdc([f1], cfg, run_id="r1")
    apply_cdc([f2], cfg, run_id="r2")

    ra, rb = time_travel_runs(cfg, "r1"), time_travel_runs(cfg, "r2")
    touched = _window_touched_dirs(cfg, ra, rb)
    assert 0 < len(touched) < len(_partition_state_dirs(cfg))

    feed = change_feed(cfg, "r1", "r2").to_pandas()
    assert list(feed["conv_id"]) == ["conv007"] and list(feed["op"]) == ["U"]
    # brute diff agrees: exactly the rows whose text changed between folds
    before = time_travel(cfg, "r1", sort=True)
    after = time_travel(cfg, "r2", sort=True)
    diff = after.filter(pc.equal(after["conv_id"], "conv007"))
    assert diff["text"].to_pylist() == ["v2"]
    assert before.num_rows == after.num_rows == 64

    # empty window -> typed empty feed (no partition folds at all); the
    # Dataset-level schema keeps the preimage columns (to_pandas drops
    # columns on any empty Ray dataset — pre-existing Ray quirk, same as
    # the unpruned path)
    empty = change_feed(cfg, "r2", "r2", include_before=True)
    assert empty.count() == 0 and "text_old" in empty.schema().names

    # compaction folds the window into every base: the horizon error
    # must still surface (kept-dir path), not a silent empty feed
    compact(cfg)
    import pytest as _pt

    with _pt.raises(TimeTravelError):
        change_feed(cfg, "r1", "r2").to_pandas()


def test_change_feed_incremental_fold_and_drop_fallback(tmp_path):
    """The upsert-policy incremental as-of-to fold (from-state + window
    deltas only, change_feed._state_plus_window) must agree with the
    from-scratch refold, and the drop policy must take the two-fold path.

    The fixture is the one history where the two compositions diverge if
    mishandled: an orphan U (key c, lsn 6) lands in run 2, and its
    matching I arrives LATER (run 3) at a LOWER lsn (4) — cross-run
    out-of-order delivery.

    - upsert: c becomes visible in run 2 (orphan upserted, text "cu");
      run 3's I is fully shadowed per-column (setter lsn 6 > 4) and the
      watermark stays 6, so the (r2, r3] feed must emit NOTHING for c —
      a broken incremental fold (lost from-state, or treating the
      synthesized state event as partial) emits a spurious U/I here.
    - drop: as of r2 the orphan U is invisible, but the r3 refold sees
      I+U together so c surfaces with text "cu" (setter lsn 6).  A
      prefix-composed fold would have discarded the U with the r2 state
      and emit text "c1" — the exact unsoundness that forces the
      two-fold fallback.
    """
    import pandas as pd

    from tg_data_connector_ray.cdc.pipeline import change_feed

    def log(path, rows):
        t = pa.table(
            {
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "op": pa.array([r[1] for r in rows], pa.string()),
                "conv_id": pa.array([r[2] for r in rows], pa.string()),
                "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
                "role": pa.array(["user"] * len(rows), pa.string()),
                "text": pa.array([r[4] for r in rows], pa.string()),
                "tool": pa.array([None] * len(rows), pa.string()),
                "ts": pa.array(["2026-01-01 00:00:01"] * len(rows), pa.string()),
            }
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(t, path)
        return path

    f1 = log(
        str(tmp_path / "l1" / "b.parquet"),
        [(1, "I", "a", 0, "a1"), (2, "I", "b", 0, "b1")],
    )
    f2 = log(
        str(tmp_path / "l2" / "b.parquet"),
        [(5, "U", "a", 0, "a2"), (6, "U", "c", 0, "cu")],
    )
    f3 = log(
        str(tmp_path / "l3" / "b.parquet"),
        [(4, "I", "c", 0, "c1"), (7, "D", "b", 0, None)],
    )

    def feed_ops(cfg, a, b) -> dict:
        df = change_feed(cfg, a, b).to_pandas()
        return {
            (r.conv_id, r.op): (None if pd.isna(r.text) else r.text)
            for r in df.itertuples()
        }

    for policy, c_text in (("upsert", "cu"), ("drop", "cu")):
        cfg = CdcConfig(
            out_dir=str(tmp_path / f"cf_{policy}"),
            num_partitions=4,
            merge_strategy="delta",
            orphan_updates=policy,
        )
        apply_cdc([f1], cfg, run_id="r1")
        apply_cdc([f2], cfg, run_id="r2")
        apply_cdc([f3], cfg, run_id="r3")

        if policy == "upsert":
            # c fully shadowed in (r2, r3]; only b's delete shows
            assert feed_ops(cfg, "r2", "r3") == {("b", "D"): None}
        else:
            # c INVISIBLE as of r2 (orphan dropped), surfaces in the r3
            # refold with the U applied on top of the late I
            assert feed_ops(cfg, "r2", "r3") == {
                ("b", "D"): None,
                ("c", "I"): "cu",
            }
        # wide window agrees with the composed narrow windows under both
        # policies, and with the time-travel folds themselves
        assert feed_ops(cfg, "r1", "r3") == {
            ("a", "U"): "a2",
            ("b", "D"): None,
            ("c", "I"): c_text,
        }
        from tg_data_connector_ray.cdc.pipeline import time_travel

        live3 = time_travel(cfg, "r3", sort=True)
        assert live3["conv_id"].to_pylist() == ["a", "c"]
        assert live3["text"].to_pylist() == ["a2", "cu"]
