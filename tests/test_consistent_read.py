"""Cross-table transactional visibility (cdc/pipeline.py: tx.log +
read_consistent): a multi-table micro-batch is certified only after every
per-table apply commits; consistent readers never observe a torn batch.
The driver surface is the cdc_consistent_read oracle; here the primitive
is pinned directly — torn-batch exclusion, frontier advance on batch
completion, manifest redelivery dedup, and the refold-mode refusal."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.merge import TimeTravelError
from tg_data_connector_ray.cdc.pipeline import (
    _append_tx_manifest,
    apply_cdc,
    multi_table_tx_log,
    read_consistent,
)


def _events(lsn0, rows):
    """rows: (conv_id, turn_idx, text).  All-I events with increasing lsn."""
    n = len(rows)
    return pa.table(
        {
            "lsn": pa.array(range(lsn0, lsn0 + n), pa.int64()),
            "op": pa.array(["I"] * n),
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                           pa.timestamp("us")),
        }
    )


def _apply(root, table, tbl_events, run_id, tmp_path, strategy="delta"):
    """One table's half of a multi-table batch, under the BATCH's shared
    run id — exactly tail_log_multi's per-table apply shape."""
    shard = str(tmp_path / f"{table}-{run_id}.parquet")
    pq.write_table(tbl_events, shard)
    cfg = CdcConfig(
        out_dir=os.path.join(root, table), num_partitions=2,
        merge_strategy=strategy,
    )
    apply_cdc([shard], cfg, run_id=run_id)


def test_torn_batch_invisible_then_visible_on_completion(tmp_path):
    root = str(tmp_path / "tx")
    kw = {"num_partitions": 2, "merge_strategy": "delta"}

    # batch 1: both tables apply under the batch id, then certification
    _apply(root, "alpha", _events(1, [("c1", 0, "a1")]), "batch1", tmp_path)
    _apply(root, "beta", _events(1, [("d1", 0, "b1")]), "batch1", tmp_path)
    _append_tx_manifest(root, "batch1", ["alpha", "beta"])
    got = read_consistent(root, cfg_kwargs=kw)
    assert got.num_rows == 2

    # batch 2 TORN: alpha applied, beta not, nothing certified
    _apply(root, "alpha", _events(10, [("c2", 0, "a2")]), "batch2", tmp_path)
    got = read_consistent(root, cfg_kwargs=kw)
    assert got.num_rows == 2  # torn run invisible
    assert "c2" not in got["conv_id"].to_pylist()

    # completion: beta's half applies, batch certified -> frontier advances
    _apply(root, "beta", _events(10, [("d2", 0, "b2")]), "batch2", tmp_path)
    _append_tx_manifest(root, "batch2", ["alpha", "beta"])
    got = read_consistent(root, cfg_kwargs=kw)
    assert got.num_rows == 4
    assert sorted(set(got["tbl"].to_pylist())) == ["alpha", "beta"]


def test_manifest_redelivery_dedupes(tmp_path):
    root = str(tmp_path / "tx")
    os.makedirs(root)
    _append_tx_manifest(root, "r1", ["alpha"])
    _append_tx_manifest(root, "r1", ["alpha"])  # crash-redelivery re-append
    _append_tx_manifest(root, "r2", ["alpha", "beta"])
    log = multi_table_tx_log(root)
    assert [m["run_id"] for m in log] == ["r1", "r2"]


def test_no_certified_batches_raises(tmp_path):
    with pytest.raises(ValueError, match="nothing is consistently visible"):
        read_consistent(str(tmp_path / "empty"))


def test_refold_table_with_torn_run_refuses(tmp_path):
    root = str(tmp_path / "tx")
    _apply(root, "alpha", _events(1, [("c1", 0, "a1")]), "b1", tmp_path,
           strategy="refold")
    _append_tx_manifest(root, "b1", ["alpha"])
    # torn second run on a refold table: as-of read is impossible (every
    # run compacts), so the consistent read must refuse loudly
    _apply(root, "alpha", _events(10, [("c2", 0, "a2")]), "b2", tmp_path,
           strategy="refold")
    with pytest.raises((TimeTravelError, ValueError)):
        read_consistent(root, cfg_kwargs={"num_partitions": 2,
                                          "merge_strategy": "refold"})


def test_cli_consistent_verb(tmp_path):
    import json
    import subprocess
    import sys

    root = str(tmp_path / "tx")
    _apply(root, "alpha", _events(1, [("c1", 0, "a1")]), "batch1", tmp_path)
    _apply(root, "beta", _events(1, [("d1", 0, "b1")]), "batch1", tmp_path)
    _append_tx_manifest(root, "batch1", ["alpha", "beta"])
    # torn second batch: must stay invisible through the CLI too
    _apply(root, "alpha", _events(10, [("c2", 0, "a2")]), "batch2", tmp_path)

    dest = str(tmp_path / "snap.parquet")
    r = subprocess.run(
        [
            sys.executable, "-m", "tg_data_connector_ray", "consistent",
            "--root", root, "--partitions", "2", "--merge-strategy", "delta",
            "--dest", dest,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 2
    assert summary["tables"] == {"alpha": 1, "beta": 1}
    assert summary["certified_batches"] == 1
    t = pq.read_table(dest)
    assert "c2" not in t["conv_id"].to_pylist()
