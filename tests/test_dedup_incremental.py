"""Streaming MinHash near-dup dedup against persistent state
(ops/dedup_incremental.py) — two-phase semantics, state through dropped
docs, exactly-once replay, parameter pinning."""

import pyarrow as pa
import pytest

import ray.data

from tg_data_connector_ray.ops.dedup_incremental import minhash_dedup_incremental


def _docs(rows) -> "ray.data.Dataset":
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(2)


BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE + " ok"  # high-Jaccard variant of BASE
OTHER = "completely different content about distributed arrow compute engines"


def _kept(ds) -> list:
    return sorted(r["doc_id"] for r in ds.take_all())


def test_new_doc_drops_against_seen_corpus(ray_session, tmp_path):
    state = str(tmp_path / "st")
    k1 = _kept(minhash_dedup_incremental(_docs([(1, BASE), (2, OTHER)]), state))
    assert k1 == [1, 2]
    # batch 2: near-dup of seen doc 1 drops; fresh content keeps
    k2 = _kept(minhash_dedup_incremental(_docs([(10, NEAR), (11, "unrelated words entirely novel")]), state))
    assert k2 == [11]


def test_within_batch_component_keeps_min_id(ray_session, tmp_path):
    state = str(tmp_path / "st")
    k = _kept(minhash_dedup_incremental(_docs([(5, BASE), (3, BASE + " !"), (9, OTHER)]), state))
    assert k == [3, 9]


def test_state_includes_dropped_docs(ray_session, tmp_path):
    """A doc near-duplicate of a DROPPED earlier doc still drops: seen
    state accumulates every ingested doc, kept or not."""
    state = str(tmp_path / "st")
    _kept(minhash_dedup_incremental(_docs([(1, BASE), (2, NEAR)]), state))  # 2 drops
    k2 = _kept(minhash_dedup_incremental(_docs([(20, NEAR)]), state))
    assert k2 == []


def test_replay_same_token_is_idempotent(ray_session, tmp_path):
    state = str(tmp_path / "st")
    _kept(minhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1"))
    k2a = _kept(
        minhash_dedup_incremental(_docs([(30, NEAR), (31, OTHER)]), state, batch_token="t2")
    )
    # whole-batch replay with the SAME token: identical result, state not
    # double-counted (the batch's own run files are excluded from reads)
    k2b = _kept(
        minhash_dedup_incremental(_docs([(30, NEAR), (31, OTHER)]), state, batch_token="t2")
    )
    assert k2a == k2b == [31]


def test_empty_and_short_docs(ray_session, tmp_path):
    state = str(tmp_path / "st")
    # two empty docs are exact near-dups (sentinel shingle); short docs
    # shingle as one combined gram
    k = _kept(minhash_dedup_incremental(_docs([(1, ""), (2, ""), (3, "one two")]), state))
    assert k == [1, 3]
    k2 = _kept(minhash_dedup_incremental(_docs([(9, "")]), state))
    assert k2 == []


def test_format_marker_pins_parameters(ray_session, tmp_path):
    state = str(tmp_path / "st")
    _kept(minhash_dedup_incremental(_docs([(1, BASE)]), state))
    with pytest.raises(ValueError, match="re-bootstrap"):
        minhash_dedup_incremental(_docs([(2, OTHER)]), state, shingle_k=5)


def test_two_phase_matches_bruteforce_reference(ray_session, tmp_path):
    """Property-style check on fixture docs: both phases equal a driver
    union-find reference computing the documented two-phase semantics
    with exact Jaccard over ALL pairs."""
    import itertools

    import pyarrow.parquet as pq

    from tg_data_connector_ray.ops.dedup import jaccard

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    # 200-doc subset: the driver-side all-pairs jaccard reference is
    # quadratic (the FULL corpus comparison lives in the
    # dedup_minhash_incremental oracle at sf0.001 and sf0.01)
    import pyarrow.compute as pc

    docs = docs.filter(pc.less(docs["doc_id"], 200))
    ids = docs["doc_id"].to_pylist()
    texts = dict(zip(ids, docs["text"].to_pylist()))
    X = 100
    state = str(tmp_path / "st")
    d_all = ray.data.from_arrow(docs).repartition(4)
    k1 = _kept(minhash_dedup_incremental(d_all.filter(expr="doc_id < 100"), state))
    k2 = _kept(minhash_dedup_incremental(d_all.filter(expr="doc_id >= 100"), state))

    pairs = [
        (a, b)
        for a, b in itertools.combinations(sorted(ids), 2)
        if jaccard(texts[a], texts[b]) >= 0.8
    ]

    def cc(edges, nodes):
        par = {n: n for n in nodes}

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                par[max(ra, rb)] = min(ra, rb)

        return {n: find(n) for n in nodes}

    b1 = [i for i in ids if i < X]
    b2 = [i for i in ids if i >= X]
    r1 = cc([(a, b) for a, b in pairs if b < X], b1)
    r2 = cc([(a, b) for a, b in pairs if b >= X], ids)
    assert k1 == sorted(n for n in b1 if r1[n] == n)
    assert k2 == sorted(n for n in b2 if r2[n] == n)


def test_distributed_path_matches_fast_path(ray_session, tmp_path, monkeypatch):
    """Force the above-threshold path (joins + label propagation) and
    check it makes the same decisions as the driver fast path."""
    import tg_data_connector_ray.ops.dedup_incremental as M

    monkeypatch.setattr(M, "SMALL_VERIFY_PAIRS", -1)
    monkeypatch.setattr(M, "SMALL_PAIRS_THRESHOLD", -1)
    state = str(tmp_path / "st")
    k1 = _kept(minhash_dedup_incremental(_docs([(1, BASE), (2, NEAR), (3, OTHER)]), state))
    assert k1 == [1, 3]
    k2 = _kept(
        minhash_dedup_incremental(
            _docs([(10, NEAR), (11, OTHER + " v2"), (12, "fresh unmatched words")]), state
        )
    )
    assert k2 == [12] or k2 == [11, 12]  # 11 near-dups 3 only if jaccard >= 0.8
    # pin exactly: compute expectation
    from tg_data_connector_ray.ops.dedup import jaccard

    expect = [12] if jaccard(OTHER, OTHER + " v2") >= 0.8 else [11, 12]
    assert k2 == expect


def test_compaction_preserves_decisions_and_folds_runs(ray_session, tmp_path):
    """Ingest two batches, compact, ingest a third: same decisions as the
    uncompacted timeline; each partition holds exactly one file after."""
    from tg_data_connector_ray.ops.dedup_incremental import compact_dedup_state

    s_a = str(tmp_path / "compacted")
    s_b = str(tmp_path / "plain")
    b1 = _docs([(1, BASE), (2, OTHER)])
    b2 = _docs([(10, OTHER + " x")])
    b3 = _docs([(20, NEAR), (21, OTHER + " x y"), (22, "novel standalone words")])
    for st in (s_a, s_b):
        _kept(minhash_dedup_incremental(b1, st, batch_token="t1"))
        _kept(minhash_dedup_incremental(b2, st, batch_token="t2"))
    out = compact_dedup_state(s_a)
    assert out["parts_compacted"] >= 1 and out["files_folded"] >= 2
    k_a = _kept(minhash_dedup_incremental(b3, s_a, batch_token="t3"))
    k_b = _kept(minhash_dedup_incremental(b3, s_b, batch_token="t3"))
    assert k_a == k_b
    # every compacted partition dir holds at most one base + t3's run
    import os

    for root, dirs, files in os.walk(s_a):
        runs = [f for f in files if f.endswith(".parquet")]
        if runs:
            bases = [f for f in runs if "_base-" in f]
            others = [f for f in runs if "_base-" not in f]
            assert len(bases) <= 1
            assert all("t3" in f for f in others)


def test_replaying_folded_token_refuses(ray_session, tmp_path):
    from tg_data_connector_ray.ops.dedup_incremental import compact_dedup_state

    state = str(tmp_path / "st")
    _kept(minhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1"))
    _kept(minhash_dedup_incremental(_docs([(2, OTHER)]), state, batch_token="t2"))
    compact_dedup_state(state)
    with pytest.raises(ValueError, match="compacted"):
        minhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1")
    # fresh tokens keep working
    k = _kept(minhash_dedup_incremental(_docs([(3, "new words here")]), state, batch_token="t9"))
    assert k == [3]


def test_compaction_exact_dedup_layout(ray_session, tmp_path):
    from tg_data_connector_ray.ops.dedup import exact_dedup_incremental
    from tg_data_connector_ray.ops.dedup_incremental import compact_dedup_state

    state = str(tmp_path / "st")
    d1 = _docs([(1, "aaa"), (2, "bbb")])
    d2 = _docs([(10, "aaa"), (11, "ccc")])
    assert sorted(
        r["doc_id"] for r in exact_dedup_incremental(d1, state, batch_token="t1").take_all()
    ) == [1, 2]
    assert sorted(
        r["doc_id"] for r in exact_dedup_incremental(d2, state, batch_token="t2").take_all()
    ) == [11]
    compact_dedup_state(state)
    with pytest.raises(ValueError, match="compacted"):
        exact_dedup_incremental(d1, state, batch_token="t1").take_all()
    d3 = _docs([(20, "ccc"), (21, "ddd")])
    assert sorted(
        r["doc_id"] for r in exact_dedup_incremental(d3, state, batch_token="t3").take_all()
    ) == [21]


def test_cli_dedup_verb(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src1 = tmp_path / "b1"
    src2 = tmp_path / "b2"
    src1.mkdir(), src2.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([BASE, OTHER], pa.string())}),
        src1 / "d.parquet",
    )
    pq.write_table(
        pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                  "text": pa.array([NEAR, "brand new words"], pa.string())}),
        src2 / "d.parquet",
    )
    state = str(tmp_path / "st")
    kept_out = str(tmp_path / "kept")
    env_repo = "/root/repo"

    def run(*extra):
        r = subprocess.run(
            [sys.executable, "-m", "tg_data_connector_ray", "dedup", "--state", state, *extra],
            capture_output=True, text=True, cwd=env_repo,
            env={**__import__("os").environ, "RAY_ADDRESS": ""},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out1 = run("--docs", str(src1))
    assert out1["kept"] == 2
    out2 = run("--docs", str(src2), "--kept-out", kept_out)
    assert out2["kept"] == 1  # NEAR drops against seen BASE
    got = pq.read_table(kept_out)
    assert got["doc_id"].to_pylist() == [11]
    out3 = run("--compact")
    assert out3["compact"]["tokens_folded"] >= 2


# --- streaming SimHash ------------------------------------------------------

from tg_data_connector_ray.ops.dedup_incremental import simhash_dedup_incremental


def test_simhash_incremental_drops_against_seen(ray_session, tmp_path):
    state = str(tmp_path / "st")
    k1 = _kept(simhash_dedup_incremental(_docs([(1, BASE), (2, OTHER)]), state))
    assert k1 == [1, 2]
    # identical text = hamming 0 against seen doc 1; fresh text keeps
    k2 = _kept(simhash_dedup_incremental(_docs([(10, BASE), (11, "fresh unrelated words")]), state))
    assert k2 == [11]


def test_simhash_incremental_within_batch_and_idempotent(ray_session, tmp_path):
    state = str(tmp_path / "st")
    k = _kept(
        simhash_dedup_incremental(
            _docs([(7, BASE), (4, BASE), (9, OTHER)]), state, batch_token="t1"
        )
    )
    assert k == [4, 9]
    k_replay = _kept(
        simhash_dedup_incremental(
            _docs([(7, BASE), (4, BASE), (9, OTHER)]), state, batch_token="t1"
        )
    )
    assert k_replay == [4, 9]


def test_simhash_incremental_compaction_seals(ray_session, tmp_path):
    from tg_data_connector_ray.ops.dedup_incremental import compact_dedup_state

    state = str(tmp_path / "st")
    _kept(simhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1"))
    out = compact_dedup_state(state)
    assert out["tokens_folded"] >= 1
    with pytest.raises(ValueError, match="compacted"):
        simhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1")
    k = _kept(simhash_dedup_incremental(_docs([(5, BASE), (6, "other words")]), state, batch_token="t2"))
    assert k == [6]


# --- streaming embedding near-dup --------------------------------------------

from tg_data_connector_ray.ops.dedup_incremental import embedding_near_dup_incremental


def _vecs(rows) -> "ray.data.Dataset":
    dim = len(rows[0][1])
    flat = [x for _, v in rows for x in v]
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float32()), dim
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(2)


V1 = [1.0, 0.0, 0.0, 0.5]
V2 = [0.0, 1.0, 0.0, 0.0]


def test_embedding_incremental_cross_batch_and_new_only(ray_session, tmp_path):
    state = str(tmp_path / "st")
    k1 = sorted(
        r["vec_id"]
        for r in embedding_near_dup_incremental(_vecs([(1, V1), (2, V2)]), state).take_all()
    )
    assert k1 == [1, 2]
    # 10 == seen 1 (drops); 20/21 identical new-only pair (keep 20)
    V3 = [0.3, 0.3, 0.9, 0.1]
    k2 = sorted(
        r["vec_id"]
        for r in embedding_near_dup_incremental(
            _vecs([(10, V1), (20, V3), (21, V3)]), state
        ).take_all()
    )
    assert k2 == [20]


def test_embedding_incremental_idempotent_and_sealed(ray_session, tmp_path):
    from tg_data_connector_ray.ops.dedup_incremental import compact_dedup_state

    state = str(tmp_path / "st")
    embedding_near_dup_incremental(_vecs([(1, V1)]), state, batch_token="t1").take_all()
    k = lambda tok: sorted(
        r["vec_id"]
        for r in embedding_near_dup_incremental(
            _vecs([(5, V1), (6, V2)]), state, batch_token=tok
        ).take_all()
    )
    assert k("t2") == [6] == k("t2")  # replay idempotent
    compact_dedup_state(state)
    with pytest.raises(ValueError, match="compacted"):
        embedding_near_dup_incremental(_vecs([(1, V1)]), state, batch_token="t1").take_all()


# --- review-pass regression tests ---------------------------------------


def test_saturated_bucket_still_catches_new_duplicates(ray_session, tmp_path):
    """max_bucket cap must never starve the CURRENT batch: with the cap
    at 4 and 6 identical seen docs, a 7th identical (higher-id) doc must
    still drop — new rows sort first within each bucket."""
    state = str(tmp_path / "st")
    # batch 1 at the default cap: all 6 identical docs pair, 1 kept
    seen = _docs([(i, BASE) for i in range(1, 7)])
    k1 = _kept(minhash_dedup_incremental(seen, state))
    assert k1 == [1]
    # batch 2 with cap 4 < 6 seen rows per bucket: the new doc must still
    # participate (new-first ordering) and drop against the seen corpus
    k2 = _kept(minhash_dedup_incremental(_docs([(100, BASE)]), state, max_bucket=4))
    assert k2 == []


def test_compaction_seals_before_unlinking(ray_session, tmp_path, monkeypatch):
    """A crash between base-write and old-file unlink must leave the
    folded tokens SEALED (replays refuse) — the manifest is written
    before any file is touched."""
    import os as _os

    from tg_data_connector_ray.ops.dedup_incremental import (
        compact_dedup_state,
        folded_tokens,
    )

    state = str(tmp_path / "st")
    _kept(minhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1"))

    real_unlink = _os.unlink

    def boom(path):
        raise OSError("simulated crash during unlink")

    monkeypatch.setattr(_os, "unlink", boom)
    with pytest.raises(OSError):
        compact_dedup_state(state)
    monkeypatch.setattr(_os, "unlink", real_unlink)
    assert "t1" in folded_tokens(state)
    with pytest.raises(ValueError, match="compacted"):
        minhash_dedup_incremental(_docs([(1, BASE)]), state, batch_token="t1")


def test_embedding_dim_change_refuses_before_commit(ray_session, tmp_path):
    state = str(tmp_path / "st")
    embedding_near_dup_incremental(_vecs([(1, V1)]), state, batch_token="t1").take_all()
    bad = _vecs([(2, [1.0, 0.0])])  # dim 2 vs dim 4
    with pytest.raises(Exception, match="re-bootstrap"):
        embedding_near_dup_incremental(bad, state, batch_token="t2").take_all()
    # state still serves the original dimension
    k = sorted(
        r["vec_id"]
        for r in embedding_near_dup_incremental(
            _vecs([(3, V1), (4, V2)]), state, batch_token="t3"
        ).take_all()
    )
    assert k == [4]


def _split_docs_tbl(rows):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
        }
    )


_SPLIT_BASE = "the quick brown fox jumps over the lazy dog by the river bank today"


def _split_fixture_batches():
    """batch 1: component {0,1} + isolated 5, 6; batch 2: 100 (near-dup of
    1 -> inherits rep 0), 200+201 (new-only pair -> rep 200), 300
    (isolated -> rep 300)."""
    b1 = _split_docs_tbl(
        [
            (0, _SPLIT_BASE),
            (1, _SPLIT_BASE + " again"),
            (5, "completely different words about cooking pasta with garlic"),
            (6, "another unrelated text concerning winter mountain hiking gear"),
        ]
    )
    b2 = _split_docs_tbl(
        [
            (100, _SPLIT_BASE + " soon"),
            (200, "rare purple elephants dance quietly under neon city lights"),
            (201, "rare purple elephants dance quietly under neon city lights yes"),
            (300, "isolated second batch document with its own vocabulary entirely"),
        ]
    )
    return b1, b2


def test_leakage_split_incremental_first_assignment_wins(ray_session, tmp_path):
    import ray.data

    from tg_data_connector_ray.ops.dedup_incremental import (
        leakage_split_incremental,
    )
    from tg_data_connector_ray.ops.sampling import hash_split_batch

    b1, b2 = _split_fixture_batches()
    state = str(tmp_path / "split_state")
    out1 = {
        r["doc_id"]: (r["rep"], r["split"])
        for r in leakage_split_incremental(
            ray.data.from_arrow(b1), state, batch_token="s1"
        ).take_all()
    }
    assert out1[0][0] == 0 and out1[1][0] == 0  # component rep = min id
    assert out1[0][1] == out1[1][1]  # same split
    assert out1[5][0] == 5 and out1[6][0] == 6

    out2 = {
        r["doc_id"]: (r["rep"], r["split"])
        for r in leakage_split_incremental(
            ray.data.from_arrow(b2), state, batch_token="s2"
        ).take_all()
    }
    # near-dup of batch-1 doc 1 inherits the PERSISTED rep 0 -> same split
    assert out2[100][0] == 0 and out2[100][1] == out1[0][1]
    # new-only component keeps its own min id
    assert out2[200] == out2[201] and out2[200][0] == 200
    assert out2[300][0] == 300
    # split values equal plain hash_split of the rep
    import pyarrow as pa

    reps = pa.table({"rep": pa.array([v[0] for v in out2.values()], pa.int64())})
    expect = hash_split_batch(reps, col="rep")["split"].to_pylist()
    assert [v[1] for v in out2.values()] == expect

    # idempotent by token: same batch, same token -> identical output,
    # no double-counted state
    again = {
        r["doc_id"]: (r["rep"], r["split"])
        for r in leakage_split_incremental(
            ray.data.from_arrow(b2), state, batch_token="s2"
        ).take_all()
    }
    assert again == out2


def test_leakage_split_incremental_distributed_path_matches(
    ray_session, tmp_path, monkeypatch
):
    import ray.data

    import tg_data_connector_ray.ops.dedup_incremental as M

    b1, b2 = _split_fixture_batches()

    def run(root):
        o1 = {
            r["doc_id"]: (r["rep"], r["split"])
            for r in M.leakage_split_incremental(
                ray.data.from_arrow(b1), root, batch_token="s1"
            ).take_all()
        }
        o2 = {
            r["doc_id"]: (r["rep"], r["split"])
            for r in M.leakage_split_incremental(
                ray.data.from_arrow(b2), root, batch_token="s2"
            ).take_all()
        }
        return o1, o2

    fast = run(str(tmp_path / "fast"))
    monkeypatch.setattr(M, "SMALL_VERIFY_PAIRS", -1)
    slow = run(str(tmp_path / "slow"))
    assert fast == slow


def test_cli_dedup_split_mode(ray_session, tmp_path):
    import subprocess
    import sys

    import pyarrow.parquet as pq

    b1, b2 = _split_fixture_batches()
    p1, p2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
    pq.write_table(b1, p1)
    pq.write_table(b2, p2)
    state = str(tmp_path / "cli_split_state")
    env = {**__import__("os").environ, "RAY_ADDRESS": "local"}
    for p, tok in ((p1, "c1"), (p2, "c2")):
        r = subprocess.run(
            [
                sys.executable, "-m", "tg_data_connector_ray", "dedup",
                "--mode", "split", "--docs", p, "--state", state,
                "--batch-token", tok,
                "--kept-out", str(tmp_path / f"out_{tok}"),
            ],
            capture_output=True, text=True, cwd="/root/repo", env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.dataset as pads

    o2 = {
        r["doc_id"]: r["rep"]
        for r in pads.dataset(str(tmp_path / "out_c2")).to_table().to_pylist()
    }
    assert o2[100] == 0  # inherited batch-1 rep through the CLI
    assert o2[200] == 200 and o2[201] == 200 and o2[300] == 300


def test_leakage_split_incremental_survives_compaction(ray_session, tmp_path):
    """Compaction folds the reps run files too: attachments after a
    compact still resolve, and a folded token refuses replay."""
    import ray.data

    from tg_data_connector_ray.ops.dedup_incremental import (
        compact_dedup_state,
        leakage_split_incremental,
    )

    b1, b2 = _split_fixture_batches()
    state = str(tmp_path / "split_compact_state")
    leakage_split_incremental(
        ray.data.from_arrow(b1), state, batch_token="s1"
    ).take_all()
    compact_dedup_state(state)
    out2 = {
        r["doc_id"]: r["rep"]
        for r in leakage_split_incremental(
            ray.data.from_arrow(b2), state, batch_token="s2"
        ).take_all()
    }
    assert out2[100] == 0 and out2[200] == 200  # reps read from the base
    with pytest.raises(ValueError, match="compacted"):
        leakage_split_incremental(
            ray.data.from_arrow(b1), state, batch_token="s1"
        )
