"""Persistent maintained views (cdc/views.py): bootstrap / sync / read."""

import json
import os

import pyarrow as pa
import pytest

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import apply_cdc, read_final_table
from tg_data_connector_ray.cdc.views import (
    VIEW_KINDS,
    bootstrap_view,
    read_view,
    sync_view,
)
from tg_data_connector_ray.util import list_files


def _two_run_table(t2, tmp_path) -> CdcConfig:
    cfg = CdcConfig(
        out_dir=str(tmp_path / "src"), num_partitions=8, merge_strategy="delta"
    )
    files = sorted(list_files(t2["cdc_log"], suffix=".parquet"))
    k = max(1, len(files) // 3)
    apply_cdc(files[: 2 * k], cfg, run_id="r1")
    return cfg, files[2 * k :]


def _norm(ds, keys):
    df = ds.to_pandas()
    return df.sort_values(keys).reset_index(drop=True)


@pytest.mark.parametrize("kind", VIEW_KINDS)
def test_bootstrap_then_sync_equals_recompute(kind, t2, tmp_path):
    """For every view kind: bootstrap at run 1, apply run 2 to the source,
    sync — the snapshot equals a fresh recompute at head; a second sync
    is a no-op that leaves the snapshot untouched."""
    from tg_data_connector_ray.cdc.views import _builders

    cfg, rest = _two_run_table(t2, tmp_path)
    vdir = str(tmp_path / f"v_{kind}")
    meta = bootstrap_view(vdir, kind, cfg)
    assert meta["synced_run"] == "r1" and meta["rows"] > 0

    apply_cdc(rest, cfg, run_id="r2")
    s = sync_view(vdir, cfg)
    assert s["synced"] is True and s["synced_run"] == "r2"

    build, _ = _builders()[kind]
    keys = ["conv_id", "turn_idx"] if kind == "turn_context" else (
        ["tool"] if kind == "tool_usage" else ["conv_id"]
    )
    got = _norm(read_view(vdir), keys)
    want = _norm(build(read_final_table(cfg), cfg), keys)
    assert got.equals(want)

    again = sync_view(vdir, cfg)
    assert again["synced"] is False and again["seq"] == s["seq"]
    assert _norm(read_view(vdir), keys).equals(want)


def test_sync_recovers_from_crashed_attempt(t2, tmp_path):
    """A crash AFTER the snapshot rename but BEFORE the view.json rewrite
    leaves an orphan snapshot-<seq+1> dir; the re-run sync overwrites it
    and converges (the window re-derives from the immutable run files)."""
    cfg, rest = _two_run_table(t2, tmp_path)
    vdir = str(tmp_path / "v")
    bootstrap_view(vdir, "conv_stats", cfg)
    apply_cdc(rest, cfg, run_id="r2")

    # simulate the torn commit: an orphan next-seq snapshot with garbage
    orphan = os.path.join(vdir, "snapshot-000002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("not parquet")
    # ... and a crash BEFORE the rename: an abandoned staging dir
    stale = os.path.join(vdir, ".stage-deadbeef")
    os.makedirs(stale)

    s = sync_view(vdir, cfg)
    assert s["synced"] is True and s["snapshot"] == "snapshot-000002"
    assert not os.path.exists(stale)  # orphan staging reclaimed at commit
    assert not [d for d in os.listdir(vdir) if d.startswith(".stage-")]
    from tg_data_connector_ray.ops.transcripts import conv_stats

    got = _norm(read_view(vdir), ["conv_id"])
    want = _norm(conv_stats(read_final_table(cfg)), ["conv_id"])
    assert got.equals(want)


def test_view_guards(t2, tmp_path):
    """Bootstrap refuses an occupied view dir and an empty source; sync
    refuses a cursor the source never journaled (wrong table)."""
    cfg, rest = _two_run_table(t2, tmp_path)
    vdir = str(tmp_path / "v")
    with pytest.raises(ValueError, match="unknown view kind"):
        bootstrap_view(vdir, "nope", cfg)
    empty = CdcConfig(out_dir=str(tmp_path / "none"), num_partitions=4)
    with pytest.raises(ValueError, match="no journaled runs"):
        bootstrap_view(vdir, "conv_stats", empty)
    bootstrap_view(vdir, "conv_stats", cfg)
    with pytest.raises(ValueError, match="already holds a view"):
        bootstrap_view(vdir, "conv_stats", cfg)

    other = CdcConfig(
        out_dir=str(tmp_path / "other"), num_partitions=4,
        merge_strategy="delta",
    )
    apply_cdc(rest, other, run_id="rX")
    with pytest.raises(ValueError, match="not journaled"):
        sync_view(vdir, other)


def test_cli_view_verbs(t2, tmp_path):
    """CLI bootstrap -> source advances -> sync -> show round trip."""
    import contextlib
    import io

    from tg_data_connector_ray.__main__ import main

    cfg, rest = _two_run_table(t2, tmp_path)
    vdir = str(tmp_path / "vcli")

    def run(*argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(list(argv))
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    b = run("view", "bootstrap", "--view-dir", vdir, "--out", cfg.out_dir,
            "--kind", "tool_usage", "--partitions", "8")
    assert b["synced_run"] == "r1"
    apply_cdc(rest, cfg, run_id="r2")
    s = run("view", "sync", "--view-dir", vdir, "--out", cfg.out_dir,
            "--partitions", "8")
    assert s["synced"] is True and s["synced_run"] == "r2"
    sh = run("view", "show", "--view-dir", vdir)
    assert sh["kind"] == "tool_usage" and sh["rows"] > 0


def test_sync_views_shared_feed_equals_per_view(t2, tmp_path):
    """Batched sync (one derived feed for all views) lands every view on
    the same snapshot content as per-view syncs; a second batched call
    is a no-op for all of them."""
    cfg, rest = _two_run_table(t2, tmp_path)
    from tg_data_connector_ray.cdc.views import _builders, sync_views

    dirs = {}
    for kind in VIEW_KINDS:
        dirs[kind] = str(tmp_path / f"b_{kind}")
        bootstrap_view(dirs[kind], kind, cfg)
    apply_cdc(rest, cfg, run_id="r2")

    res = sync_views(list(dirs.values()), cfg)
    assert all(r["synced"] and r["synced_run"] == "r2" for r in res)
    for kind in VIEW_KINDS:
        build, _ = _builders()[kind]
        keys = ["conv_id", "turn_idx"] if kind == "turn_context" else (
            ["tool"] if kind == "tool_usage" else ["conv_id"]
        )
        got = _norm(read_view(dirs[kind]), keys)
        want = _norm(build(read_final_table(cfg), cfg), keys)
        assert got.equals(want)

    res2 = sync_views(list(dirs.values()), cfg)
    assert all(r["synced"] is False for r in res2)


def test_sync_views_mixed_cursors_fall_back(t2, tmp_path):
    """Views lagging at different cursors have no shared feed window —
    the batched call degrades to per-view syncs and still converges."""
    cfg, rest = _two_run_table(t2, tmp_path)
    a = str(tmp_path / "ma")
    bootstrap_view(a, "conv_stats", cfg)
    apply_cdc(rest[: len(rest) // 2 or 1], cfg, run_id="r2")
    b = str(tmp_path / "mb")
    bootstrap_view(b, "tool_usage", cfg)  # cursor r2; a lags at r1
    apply_cdc(rest[len(rest) // 2 or 1 :], cfg, run_id="r3")

    from tg_data_connector_ray.cdc.views import _builders, sync_views

    res = sync_views([a, b], cfg)
    assert all(r["synced_run"] == "r3" for r in res)
    for d, kind, keys in ((a, "conv_stats", ["conv_id"]), (b, "tool_usage", ["tool"])):
        build, _ = _builders()[kind]
        assert _norm(read_view(d), keys).equals(
            _norm(build(read_final_table(cfg), cfg), keys)
        )
