"""CLI (python -m tg_data_connector_ray), CDC job form, compaction GC."""

import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import apply_cdc, compact
from tg_data_connector_ray.pipelines.runner import run_job


def test_cdc_job_form(t1, tmp_path):
    out = str(tmp_path / "cdcjob")
    summary = run_job(
        {
            "job": {
                "cdc": {
                    "events": t1["cdc_log"],
                    "out": out,
                    "numPartitions": 4,
                    "errorLimit": {"record": 10},
                }
            }
        }
    )
    exp = pq.read_table(t1["transcripts"])
    assert summary["rows_live"] == exp.num_rows
    from tg_data_connector_ray.cdc.config import CdcConfig as _C
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow

    got = final_table_arrow(_C(out_dir=out))
    assert got.num_rows == exp.num_rows


def test_compact_drops_old_tombstones(t1, tmp_path):
    cfg = CdcConfig(out_dir=str(tmp_path / "o"), num_partitions=4)
    s = apply_cdc(t1["cdc_log"], cfg)
    assert s["rows_tombstone"] > 0
    # retention 0: every tombstone at/below its partition watermark goes
    res = compact(cfg, tombstone_retention_lsn=0)
    assert res["tombstones_dropped"] == s["rows_tombstone"]
    assert res["rows_live"] == s["rows_live"]
    state = pads.dataset(os.path.join(cfg.out_dir, "state")).to_table()
    assert state.num_rows == s["rows_live"]
    # idempotent
    res2 = compact(cfg, tombstone_retention_lsn=0)
    assert res2["tombstones_dropped"] == 0


def test_inline_tombstone_gc_during_flush(t1, tmp_path):
    cfg = CdcConfig(
        out_dir=str(tmp_path / "gc"), num_partitions=4, tombstone_retention_lsn=0
    )
    s = apply_cdc(t1["cdc_log"], cfg)
    # flush-time GC: tombstones at the watermark survive (strictly-older only)
    state = pads.dataset(os.path.join(cfg.out_dir, "state")).to_table()
    assert state.num_rows <= s["rows_live"] + s["rows_tombstone"]
    exp = pq.read_table(t1["transcripts"])
    from tg_data_connector_ray.cdc.pipeline import final_table_arrow

    table = final_table_arrow(cfg)
    assert table.num_rows == exp.num_rows


def test_cli_cdc_and_compact(t1, tmp_path):
    import subprocess
    import sys

    out = str(tmp_path / "cliout")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "cdc",
            "--events", t1["cdc_log"], "--out", out, "--partitions", "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows_live"] == pq.read_table(t1["transcripts"]).num_rows

    r2 = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "compact",
            "--out", out, "--retention", "0",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    res = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res["tombstones_dropped"] == summary["rows_tombstone"]


def test_cli_run_job_dry_run(tmp_path):
    import subprocess
    import sys

    cfgp = tmp_path / "job.json"
    cfgp.write_text(
        json.dumps(
            {
                "job": {
                    "content": [
                        {
                            "reader": {"name": "parquet", "parameter": {"path": "/root/testdata/sf0.001/documents.parquet"}},
                            "writer": {"name": "stream", "parameter": {}},
                        }
                    ]
                }
            }
        )
    )
    r = subprocess.run(
        [sys.executable, "-m", "tg_data_connector_ray", "run", str(cfgp), "--dry-run"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["dry_run"] is True


def test_verify_against(t1, tmp_path):
    from tg_data_connector_ray.cdc.pipeline import verify_against

    cfg = CdcConfig(out_dir=str(tmp_path / "v"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    res = verify_against(cfg, t1["transcripts"])
    assert res["ok"] and res["text_equal"] and res["full_equal"]
    # a truncated expected table mismatches cleanly
    import pyarrow.parquet as pq2

    trunc = str(tmp_path / "trunc.parquet")
    pq2.write_table(pq2.read_table(t1["transcripts"]).slice(0, 10), trunc)
    res2 = verify_against(cfg, trunc)
    assert not res2["ok"] and not res2["rows_equal"]
    # same row count, ONE divergent character: digests must catch it
    import pyarrow as pa2

    t = pq2.read_table(t1["transcripts"])
    texts = t["text"].to_pylist()
    texts[7] = (texts[7] or "") + "!"
    mut = t.set_column(t.schema.get_field_index("text"), "text", pa2.array(texts, pa2.string()))
    mutp = str(tmp_path / "mut.parquet")
    pq2.write_table(mut, mutp)
    res3 = verify_against(cfg, mutp)
    assert res3["rows_equal"] and not res3["text_equal"] and not res3["ok"]


def test_cli_migrate_verb(t1, tmp_path):
    """`migrate` CLI: routing-change migration end-to-end in a subprocess
    (old 4-partition dir -> fresh 2-partition dir), row counts preserved."""
    import subprocess
    import sys

    old = str(tmp_path / "mold")
    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc

    apply_cdc(t1["cdc_log"], CdcConfig(out_dir=old, num_partitions=4))
    new = str(tmp_path / "mnew")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "migrate",
            "--from", old, "--out", new, "--partitions", "2",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["partitions"] == 2
    assert res["rows_live"] == pq.read_table(t1["transcripts"]).num_rows


def test_lineage_summary_and_cli(t1, tmp_path):
    """lineage verb: metadata-only health snapshot — watermarks, state
    sizes, delta-run counts (non-zero in delta mode, zero after compact)."""
    import subprocess
    import sys

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, compact, lineage_summary

    out = str(tmp_path / "lh")
    cfg = CdcConfig(out_dir=out, num_partitions=4, merge_strategy="delta")
    apply_cdc(t1["cdc_log"], cfg)
    s = lineage_summary(cfg)
    assert s["partitions"] == 4
    assert s["delta_runs_total"] == 4  # one run file per partition
    assert s["watermark_max"] > 0 and s["state_bytes"] == 0  # no base yet

    compact(cfg)
    s2 = lineage_summary(cfg)
    assert s2["delta_runs_total"] == 0 and s2["state_bytes"] > 0
    assert s2["watermark_max"] == s["watermark_max"]

    r = subprocess.run(
        [sys.executable, "-m", "tg_data_connector_ray", "lineage", "--out", out],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["partitions"] == 4 and "parts" not in res


def test_cli_cdc_delta_mode(t1, tmp_path):
    """The cdc verb reaches delta mode + inline auto-compaction from the
    command line; verify confirms convergence against the golden table."""
    import subprocess
    import sys

    out = str(tmp_path / "clid")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "cdc",
            "--events", t1["cdc_log"], "--out", out, "--partitions", "4",
            "--merge-strategy", "delta", "--delta-compact-runs", "1",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rv = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "verify",
            "--out", out, "--expected", t1["transcripts"],
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert rv.returncode == 0, rv.stderr[-2000:]
    assert json.loads(rv.stdout.strip().splitlines()[-1])["ok"]
    # auto-compaction at threshold 1 folded the single run into the base
    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import lineage_summary

    s = lineage_summary(CdcConfig(out_dir=out))
    assert s["delta_runs_total"] == 0 and s["state_bytes"] > 0


def test_cli_export_as_of(t1, tmp_path):
    """The export verb writes the live table as parquet, and --as-of
    serves the time-travel view: exporting as of run 1 of a two-run
    delta-mode table must equal a fresh replay of batch 1 alone."""
    import subprocess
    import sys

    import pyarrow.dataset as pads

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow

    files = sorted(
        os.path.join(t1["cdc_log"], f) for f in os.listdir(t1["cdc_log"])
    )
    k = max(1, len(files) // 2)
    out = str(tmp_path / "exp")
    cfg = CdcConfig(out_dir=out, num_partitions=4, merge_strategy="delta")
    apply_cdc(files[:k], cfg, run_id="e1")
    apply_cdc(files[k:], cfg, run_id="e2")

    tcfg = CdcConfig(out_dir=str(tmp_path / "truth"), num_partitions=4)
    apply_cdc(files[:k], tcfg)
    truth = final_table_arrow(tcfg, sort=True)

    dest = str(tmp_path / "dest")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "export",
            "--out", out, "--dest", dest, "--as-of", "e1", "--partitions", "4",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] == truth.num_rows and rep["as_of"] == "e1"
    got = (
        pads.dataset(dest)
        .to_table(columns=list(truth.column_names))
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    assert got.equals(truth)


def test_cli_redact_verb(t1, tmp_path):
    """`redact` CLI: right-to-be-forgotten in a subprocess — target
    conversations' text replaced, JSON summary reports the turn count."""
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.compute as pc

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow

    out = str(tmp_path / "red")
    cfg = CdcConfig(out_dir=out, num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    before = final_table_arrow(cfg, sort=True)
    targets = sorted(set(before["conv_id"].to_pylist()))[:2]

    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "redact",
            "--out", out, "--convs", ",".join(targets),
            "--run-id", "cli-rr1", "--partitions", "4",
            "--replacement", "[GONE]",
        ],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summ = json.loads(r.stdout.strip().splitlines()[-1])
    after = final_table_arrow(cfg, sort=True)
    tgt = after.filter(pc.is_in(after["conv_id"], value_set=pa.array(targets)))
    assert summ["turns_redacted"] == tgt.num_rows > 0
    assert set(tgt["text"].to_pylist()) == {"[GONE]"}


def test_cli_repair_verb(tmp_path):
    """`repair` CLI: dead-letter repair-replay in a subprocess — the F5
    dirty rows covered by the flagged rules re-ingest; the summary JSON
    reports repaired_in / events_in / dirty_records."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow
    from tg_data_connector_ray.fixtures import make_dirty_log

    d = tmp_path / "dirtylog"
    os.makedirs(d)
    pq.write_table(make_dirty_log(), str(d / "evt-0000.parquet"))
    out = str(tmp_path / "rep")
    cfg = CdcConfig(out_dir=out, num_partitions=4, null_format="\\N")
    apply_cdc(str(d), cfg, run_id="ingest-1")

    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "repair",
            "--out", out, "--run-id", "ingest-1", "--new-run-id", "fix-1",
            "--partitions", "4", "--map-op", "X=U", "--abs-turn",
            "--null-bad-ts", "--empty-text-insert",
        ],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summ = json.loads(r.stdout.strip().splitlines()[-1])
    assert summ["repaired_in"] == 6
    assert summ["events_in"] == 4
    assert summ["dirty_records"] == 2
    final = final_table_arrow(cfg, sort=True)
    keys = set(zip(final["conv_id"].to_pylist(), final["turn_idx"].to_pylist()))
    assert ("conv00000002", 5) in keys      # abs-turn repair landed


def test_cli_tail_verb(t1, tmp_path):
    """`tail` CLI: bounded poll loop in a subprocess consumes the whole
    log dir as one batch and reports session totals."""
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "tail",
            "--events", t1["cdc_log"], "--out", str(tmp_path / "tailout"),
            "--partitions", "4", "--poll-interval", "0.05",
            "--idle-polls", "2", "--merge-strategy", "delta",
            "--delta-compact-runs", "4",
        ],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    totals = json.loads(r.stdout.strip().splitlines()[-1])
    assert totals["batches"] == 1 and totals["rows_live"] > 0


def test_cli_export_jsonl(t1, tmp_path):
    """`export --format jsonl` writes sharded one-object-per-line files
    whose parsed rows equal the converged table."""
    import subprocess
    import sys

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow

    out = str(tmp_path / "t")
    cfg = CdcConfig(out_dir=out, num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    truth = final_table_arrow(cfg, sort=True)

    dest = str(tmp_path / "jl")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "export",
            "--out", out, "--dest", dest, "--partitions", "4",
            "--format", "jsonl",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] == truth.num_rows and rep["format"] == "jsonl"
    rows = []
    for f in sorted(os.listdir(dest)):
        with open(os.path.join(dest, f)) as fh:
            rows.extend(json.loads(line) for line in fh)
    assert len(rows) == truth.num_rows
    rows.sort(key=lambda d: (d["conv_id"], d["turn_idx"]))
    assert [d["text"] for d in rows] == truth["text"].to_pylist()


def test_vacuum_reclaims_journaled_staging(t1, tmp_path):
    """vacuum removes committed runs' staging (corrections, snapshot
    sync) but keeps unjournaled stages (resume material) and the dirty
    channel unless asked; the table stays readable."""
    import pyarrow as pa

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import (
        apply_cdc,
        apply_corrections,
        final_table_arrow,
        vacuum,
    )

    cfg = CdcConfig(out_dir=str(tmp_path / "v"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    before = final_table_arrow(cfg, sort=True)
    fix = pa.table({
        "conv_id": before["conv_id"].slice(0, 1),
        "turn_idx": before["turn_idx"].slice(0, 1),
        "text": pa.array(["vac-edit"]),
    })
    apply_corrections(cfg, fix, run_id="vacfix")
    assert os.path.isdir(os.path.join(cfg.out_dir, "correct-vacfix"))
    # an unjournaled (crashed-run) stage must survive
    os.makedirs(os.path.join(cfg.out_dir, "correct-crashed"))

    rep = vacuum(cfg)
    assert "correct-vacfix" in rep["dirs_removed"]
    assert not os.path.isdir(os.path.join(cfg.out_dir, "correct-vacfix"))
    assert os.path.isdir(os.path.join(cfg.out_dir, "correct-crashed"))

    after = final_table_arrow(cfg, sort=True)
    assert after.num_rows == before.num_rows
    assert after["text"][0].as_py() == "vac-edit"

    from tg_data_connector_ray.__main__ import main
    assert main(["vacuum", "--out", cfg.out_dir]) == 0


def test_cli_get_point_lookup(t1, tmp_path):
    """`get` CLI: pruned point lookup returns the requested convs' live
    turns as JSON."""
    import pyarrow as pa

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, final_table_arrow
    from tg_data_connector_ray.__main__ import main

    cfg = CdcConfig(out_dir=str(tmp_path / "g"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)
    tbl = final_table_arrow(cfg, sort=True)
    conv = tbl["conv_id"][0].as_py()
    n_turns = tbl.filter(
        pa.compute.equal(tbl["conv_id"], conv)
    ).num_rows

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["get", "--out", cfg.out_dir, "--conv", conv,
                   "--conv", "conv_missing", "--partitions", "4"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["rows"] == n_turns
    assert all(r["conv_id"] == conv for r in rep["turns"])


def test_runs_report_orders_manifests(t1, tmp_path):
    """runs_report lists journaled runs in apply order with their
    manifest counters."""
    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, runs_report

    files = sorted(
        os.path.join(t1["cdc_log"], f) for f in os.listdir(t1["cdc_log"])
    )
    k = max(1, len(files) // 2)
    cfg = CdcConfig(out_dir=str(tmp_path / "rr"), num_partitions=4)
    apply_cdc(files[:k], cfg, run_id="r-a")
    apply_cdc(files[k:], cfg, run_id="r-b")
    rep = runs_report(cfg)
    assert [r["run_id"] for r in rep] == ["r-a", "r-b"]
    assert all(r["manifest"]["events_in"] > 0 for r in rep)
    assert rep[0]["order"] == 0 and rep[1]["order"] == 1
    from tg_data_connector_ray.__main__ import main
    assert main(["runs", "--out", cfg.out_dir]) == 0


def test_cli_export_sft_view_jsonl(t1, tmp_path):
    """export --view sft --format jsonl: the converged table renders to
    (prompt, response) pairs matching the in-process sft_pairs over the
    same state, shipped as JSONL shards."""
    import subprocess
    import sys

    import ray.data

    from tg_data_connector_ray.cdc.config import CdcConfig
    from tg_data_connector_ray.cdc.pipeline import apply_cdc, read_final_table
    from tg_data_connector_ray.ops.transcripts import sft_pairs

    files = sorted(
        os.path.join(t1["cdc_log"], f) for f in os.listdir(t1["cdc_log"])
    )
    out = str(tmp_path / "sftexp")
    cfg = CdcConfig(out_dir=out, num_partitions=4)
    apply_cdc(files, cfg)
    want = (
        sft_pairs(read_final_table(cfg))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    dest = str(tmp_path / "sft_dest")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "export",
            "--out", out, "--dest", dest, "--partitions", "4",
            "--view", "sft", "--format", "jsonl",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["view"] == "sft" and rep["format"] == "jsonl"
    got = (
        ray.data.read_json(dest)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert rep["rows"] == len(want)
    # JSON carries no int32: widen before the exact compare
    want = want.astype({"turn_idx": "int64"})
    got = got.astype({"turn_idx": "int64"})
    assert got[["conv_id", "turn_idx", "prompt", "response"]].equals(
        want[["conv_id", "turn_idx", "prompt", "response"]]
    )


def test_cli_index_verb(t1, tmp_path):
    """index bootstrap -> sync -> search -> compact from the command line:
    the searched hits equal brute-force over embeddings of the live table,
    before and after compaction."""
    import numpy as np

    from tg_data_connector_ray.__main__ import main
    from tg_data_connector_ray.cdc.pipeline import read_final_table
    from tg_data_connector_ray.ops.index_sync import embed_rows
    from tg_data_connector_ray.ops.similarity import brute_force_topk, hash_embed
    from tg_data_connector_ray.util import list_files

    out = str(tmp_path / "cdc")
    ix = str(tmp_path / "ivf")
    files = sorted(list_files(t1["cdc_log"], suffix=".parquet"))
    k = max(1, len(files) // 2)
    cfg = CdcConfig(out_dir=out, num_partitions=4, merge_strategy="delta")
    apply_cdc(files[:k], cfg, run_id="r1")
    base = ["--index", ix, "--out", out, "--partitions", "4", "--dim", "16",
            "--centroids", "2"]
    assert main(["index", "bootstrap", *base]) == 0
    apply_cdc(files[k:], cfg, run_id="r2")
    assert main(["index", "sync", *base, "--from-run", "r1",
                 "--to-run", "r2"]) == 0

    from tg_data_connector_ray.ops.similarity import PersistentIvf

    idx = PersistentIvf.load(ix)
    probe = "lorem ipsum dolor sit amet"
    q = hash_embed([probe], dim=16)
    got = idx.search(q, k=3, nprobe=2).select(["query_id", "vec_id"])
    exp = brute_force_topk(
        read_final_table(cfg, columns=["conv_id", "turn_idx", "text"]).map_batches(
            lambda t: embed_rows(t, 16), batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        q, k=3,
    ).select(["query_id", "vec_id"])
    assert got.to_pylist() == exp.to_pylist()

    assert main(["index", "search", "--index", ix, "--dim", "16",
                 "--text", probe, "--k", "3"]) == 0
    assert main(["index", "compact", "--index", ix]) == 0
    assert idx.search(q, k=3, nprobe=2).select(
        ["query_id", "vec_id"]).to_pylist() == exp.to_pylist()


def test_plan_ingest_rules():
    """The sizing arithmetic: partitions from run volume rounded up to a
    CPU multiple, the merge-wave cap, and state-band repartition advice
    in both directions."""
    from tg_data_connector_ray.cdc.plan import (
        GiB,
        MiB,
        plan_ingest,
    )

    # the measured sweet spot reproduces: 2.3 GB / 32 CPUs -> 96 parts
    p = plan_ingest(2_300_000_000, cpus=32)
    assert p["recommended"]["num_partitions"] == 96
    assert p["recommended"]["override_num_blocks"] == 35  # ceil(2.3e9/64MiB)
    assert not p["warnings"]

    # tiny run floors at 2x CPUs
    assert plan_ingest(1 * MiB, cpus=8)["recommended"]["num_partitions"] == 16

    # huge single run hits the wave cap and warns to split the run
    big = plan_ingest(1000 * GiB, cpus=32)
    assert big["recommended"]["num_partitions"] == 16 * 32
    assert any("smaller runs" in w for w in big["warnings"])

    # oversized state -> migrate up (doubling until inside the band)
    s = plan_ingest(1 * GiB, cpus=8, existing_partitions=8,
                    state_bytes=40 * GiB)
    assert s["state"]["recommend_migrate_to"] == 32
    assert any("migrate --to-partitions 32" in w for w in s["warnings"])

    # dust-sized state across many partitions -> migrate down
    s2 = plan_ingest(1 * GiB, cpus=4, existing_partitions=256,
                     state_bytes=256 * MiB)
    assert s2["state"]["recommend_migrate_to"] == 8
    # healthy state: no advice
    s3 = plan_ingest(1 * GiB, cpus=8, existing_partitions=8,
                     state_bytes=8 * GiB)
    assert "recommend_migrate_to" not in s3["state"]


def test_cli_plan_verb(t1, tmp_path):
    """`plan` CLI: derives log size/events from footers and state advice
    from an applied table, metadata-only."""
    from tg_data_connector_ray.__main__ import main

    cfg = CdcConfig(out_dir=str(tmp_path / "pl"), num_partitions=4)
    apply_cdc(t1["cdc_log"], cfg)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["plan", "--log", t1["cdc_log"], "--out", cfg.out_dir,
                   "--cpus", "4"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["cpus"] == 4
    assert rep["n_files"] > 0
    assert rep["events"] > 0 and rep["events_estimated"] is False
    assert rep["recommended"]["num_partitions"] % 4 == 0
    assert rep["state"]["partitions"] == 4


def test_cli_pack_verb(tmp_path):
    """`pack` CLI: vocab.parquet + sequence shards (parquet and jsonl),
    sequences exactly cover the token stream, ids bounded by oov_id."""
    import contextlib
    import io

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from tg_data_connector_ray.__main__ import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "packed")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["pack", "--docs", docs, "--out", out,
                   "--vocab-size", "16", "--budget", "256"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["vocab_terms"] <= 16 and rep["oov_id"] == rep["vocab_terms"]

    vocab = pq.read_table(os.path.join(out, "vocab.parquet"))
    assert vocab["id"].to_pylist() == list(range(vocab.num_rows))
    seqs = pads.dataset(os.path.join(out, "shards"), format="parquet").to_table()
    assert seqs.num_rows == rep["sequences"]
    n = seqs["n"].to_pylist()
    ids = seqs["ids"].to_pylist()
    assert all(len(i) == k for i, k in zip(ids, n))
    # every sequence except (at most) the last is exactly budget tokens
    assert sorted(n, reverse=True)[: max(len(n) - 1, 0)] == [256] * max(len(n) - 1, 0)
    flat = [x for l in ids for x in l]
    assert max(flat) <= rep["oov_id"] and min(flat) >= 0

    # jsonl flavor: same sequence count by line total
    out2 = str(tmp_path / "packed_j")
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = main(["pack", "--docs", docs, "--out", out2,
                   "--vocab-size", "16", "--budget", "256",
                   "--format", "jsonl"])
    assert rc == 0
    shard_dir = os.path.join(out2, "shards")
    lines = 0
    for f in os.listdir(shard_dir):
        with open(os.path.join(shard_dir, f)) as fh:
            lines += sum(1 for _ in fh)
    assert lines == seqs.num_rows
