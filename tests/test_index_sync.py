"""CDC -> ANN index sync (ops/index_sync.py): bootstrap + change-feed
windows keep a PersistentIvf exactly equal to "embed every live turn of
the converged table" — updates re-embed via delete-then-append (epoch
upsert), deletes vanish, unchanged text is never touched, replays and
compaction change nothing."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from tg_data_connector_ray.cdc.config import CdcConfig
from tg_data_connector_ray.cdc.pipeline import (
    apply_cdc,
    change_feed,
    read_final_table,
)
from tg_data_connector_ray.ops.index_sync import (
    bootstrap_index,
    embed_rows,
    key_vec_ids,
    sync_from_feed,
)
from tg_data_connector_ray.ops.similarity import (
    PersistentIvf,
    brute_force_topk,
    hash_embed,
)

DIM = 16


def _log(path, rows):
    t = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "conv_id": pa.array([r[2] for r in rows], pa.string()),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": pa.array([r[5] if len(r) > 5 else "user" for r in rows],
                             pa.string()),
            "text": pa.array([r[4] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array(["2026-01-01 00:00:01"] * len(rows), pa.string()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path)
    return path


def _expected_search(cfg, queries, k):
    """Ground truth: embed every live turn of the CURRENT converged table,
    brute-force top-k."""
    ds = read_final_table(cfg, columns=["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: embed_rows(t, DIM), batch_format="pyarrow", zero_copy_batch=True
    )
    return brute_force_topk(ds, queries, k=k).select(["query_id", "vec_id"])


def test_index_sync_end_to_end(tmp_path):
    cfg = CdcConfig(
        out_dir=str(tmp_path / "cdc"), num_partitions=4, merge_strategy="delta"
    )
    f1 = _log(
        str(tmp_path / "l1" / "b.parquet"),
        [
            (1, "I", "a", 0, "hello world of transcripts"),
            (2, "I", "b", 0, "foo bar baz tool call"),
            (3, "I", "c", 0, "alpha beta gamma delta"),
            (4, "I", "d", 0, "soon to be deleted forever"),
        ],
    )
    apply_cdc([f1], cfg, run_id="r1")

    index_dir = str(tmp_path / "ivf")
    boot = read_final_table(cfg, columns=["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: embed_rows(t, DIM), batch_format="pyarrow", zero_copy_batch=True
    )
    idx = PersistentIvf.build(index_dir, boot, n_centroids=2, iters=2, n_rows=4)
    res = bootstrap_index(idx, read_final_table(
        cfg, columns=["conv_id", "turn_idx", "text"]), run_id="boot", dim=DIM)
    assert res["skipped"] is False

    q = hash_embed(
        ["hello world of transcripts", "alpha beta gamma delta"], dim=DIM
    )
    got = idx.search(q, k=2, nprobe=2).select(["query_id", "vec_id"])
    assert got.to_pylist() == _expected_search(cfg, q, 2).to_pylist()
    a_id = int(key_vec_ids(pa.array(["a"]), pa.array([0], pa.int32()))[0])
    assert got.to_pylist()[0]["vec_id"] == a_id  # exact self-match first

    # window 2: update a's text, role-only touch on b (text unchanged),
    # delete d, insert e
    f2 = _log(
        str(tmp_path / "l2" / "b.parquet"),
        [
            (5, "U", "a", 0, "hello world rewritten entirely"),
            (6, "U", "b", 0, None, "assistant"),
            (7, "D", "d", 0, None),
            (8, "I", "e", 0, "epsilon zeta eta theta"),
        ],
    )
    apply_cdc([f2], cfg, run_id="r2")
    stats = sync_from_feed(
        idx, change_feed(cfg, "r1", "r2", include_before=True), "sync-r2", dim=DIM
    )
    # U with null text = text cleared?  upsert semantics: U sets only
    # non-null columns, so b's text is UNCHANGED -> no index touch; a is
    # changed, d deleted -> 2 tombstones (a old + d), 2 adds (a new + e)
    assert stats == {"run_id": "sync-r2", "deleted": 2, "appended": 2}
    for probe, label in ((q, "old-a"), (hash_embed(
            ["hello world rewritten entirely", "epsilon zeta eta theta"],
            dim=DIM), "new")):
        assert (
            idx.search(probe, k=2, nprobe=2).select(["query_id", "vec_id"]).to_pylist()
            == _expected_search(cfg, probe, 2).to_pylist()
        ), label
    # d is gone from search entirely
    d_id = int(key_vec_ids(pa.array(["d"]), pa.array([0], pa.int32()))[0])
    full = idx.search(q, k=10, nprobe=2).to_pandas()
    assert d_id not in set(full["vec_id"])

    # window 3: revert a to its ORIGINAL text (the A->B->A epoch case),
    # resurrect d
    f3 = _log(
        str(tmp_path / "l3" / "b.parquet"),
        [
            (9, "U", "a", 0, "hello world of transcripts"),
            (10, "I", "d", 0, "soon to be deleted forever"),
        ],
    )
    apply_cdc([f3], cfg, run_id="r3")
    feed3 = change_feed(cfg, "r2", "r3", include_before=True)
    stats3 = sync_from_feed(idx, feed3, "sync-r3", dim=DIM)
    assert stats3 == {"run_id": "sync-r3", "deleted": 1, "appended": 2}
    got3 = idx.search(q, k=3, nprobe=2).select(["query_id", "vec_id"])
    exp3 = _expected_search(cfg, q, 3)
    assert got3.to_pylist() == exp3.to_pylist()
    assert d_id in {r["vec_id"] for r in got3.to_pylist()} or d_id in set(
        idx.search(hash_embed(["soon to be deleted forever"], dim=DIM),
                   k=1, nprobe=2).to_pandas()["vec_id"]
    )

    # replaying a window is a no-op (run-ledger idempotency end-to-end)
    before = idx.search(q, k=5, nprobe=2).to_pylist()
    replay = sync_from_feed(
        idx, change_feed(cfg, "r2", "r3", include_before=True), "sync-r3", dim=DIM
    )
    assert replay["deleted"] == 0  # tombstone run already committed
    assert idx.search(q, k=5, nprobe=2).to_pylist() == before

    # compaction folds runs + tombstones, answers unchanged
    idx.compact()
    assert idx.search(q, k=5, nprobe=2).to_pylist() == before
    assert not os.path.isdir(os.path.join(index_dir, "tombstones"))


def test_key_vec_ids_matches_sql_identity():
    """vec_id == two's-complement int64 of md5-u64('<conv>:<turn>') — the
    exact expression the SQL oracles replay."""
    import hashlib

    ids = key_vec_ids(pa.array(["conv_x", "c"]), pa.array([3, 11], pa.int32()))
    for got, key in zip(ids, ["conv_x:3", "c:11"]):
        u = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little")
        assert int(got) == (u - (1 << 64) if u >= (1 << 63) else u)


def test_hash_embed_properties():
    """Sign-snap contract: values in {-1,+1}, null == empty == all +1,
    deterministic, and the bucket/sign formula matches a per-token
    reference."""
    import hashlib

    emb = hash_embed(["abc def abc", "", None], dim=8)
    assert emb.shape == (3, 8)
    assert set(np.unique(emb)) <= {-1.0, 1.0}
    assert (emb[1] == 1.0).all() and (emb[2] == emb[1]).all()

    sums = np.zeros(8)
    for tok in ["abc", "def", "abc"]:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        sums[h % 8] += 1.0 if (h // 8) % 2 == 0 else -1.0
    assert (emb[0] == np.where(sums >= 0, 1.0, -1.0)).all()
