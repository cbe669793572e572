"""Property tests for the round-3 corpus/sketch/window batch kernels —
pure-function kernels checked against brute-force Python references
(no Ray session needed)."""

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

_word = st.sampled_from(["a", "bb", "ccc", "dog", "cat", "x1", "_z"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=150, deadline=None)
@given(st.lists(_text, min_size=1, max_size=8))
def test_bigram_counts_equal_bruteforce(texts):
    from tg_data_connector_ray.ops.corpus import bigram_counts_batch

    t = pa.table({"text": pa.array(texts, pa.string())})
    out = bigram_counts_batch(t)
    got = dict(zip(out["ngram"].to_pylist(), out["n"].to_pylist()))
    exp: dict = {}
    for txt in texts:
        toks = txt.lower().split()
        for i in range(len(toks) - 1):
            g = toks[i] + " " + toks[i + 1]
            exp[g] = exp.get(g, 0) + 1
    assert got == exp


@settings(max_examples=150, deadline=None)
@given(st.lists(_text, min_size=1, max_size=8))
def test_repetition_equal_bruteforce(texts):
    from tg_data_connector_ray.ops.text import repetition_batch

    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = repetition_batch(t).to_pandas()
    for i, txt in enumerate(texts):
        toks = txt.lower().split()
        b: dict = {}
        for j in range(len(toks) - 1):
            g = (toks[j], toks[j + 1])
            b[g] = b.get(g, 0) + 1
        tr: dict = {}
        for j in range(len(toks) - 2):
            g = (toks[j], toks[j + 1], toks[j + 2])
            tr[g] = tr.get(g, 0) + 1
        top2 = max(b.values()) if b else 0
        dup3 = sum(c for c in tr.values() if c > 1)
        n2 = max(len(toks) - 1, 1)
        n3 = max(len(toks) - 2, 1)
        assert out.loc[i, "top2_frac_u6"] == int(np.round(1e6 * top2 / n2))
        assert out.loc[i, "dup3_frac_u6"] == int(np.round(1e6 * dup3 / n3))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 300)), min_size=1, max_size=60
    ),
    st.integers(1, 5),
)
def test_rolling_sum_kernel_equals_pandas(rows, window):
    """The prefix-sum + clamped-lower-bound rolling kernel vs pandas
    groupby().rolling() on already-sorted input."""
    import pandas as pd

    from tg_data_connector_ray.pipelines.relational import rolling_sum_kernel

    user = np.array([u for u, _ in rows], dtype=np.int64)
    val = np.array([v for _, v in rows], dtype=np.int64)
    order = np.argsort(user, kind="stable")
    user, val = user[order], val[order]
    roll = rolling_sum_kernel(user, val, window)

    exp = (
        pd.Series(val)
        .groupby(pd.Series(user))
        .rolling(window, min_periods=1)
        .sum()
        .to_numpy()
        .astype(np.int64)
    )
    assert roll.tolist() == exp.tolist()


@settings(max_examples=8, deadline=None)  # full Ray pipeline per example
@given(st.lists(st.integers(0, 40), min_size=1, max_size=40), st.integers(1, 64))
def test_pack_offsets_are_serial_cumsum(ids_raw, budget):
    """Serial invariant of the distributed prefix sum: offsets in id order
    are the exclusive cumsum of token counts, seq ids derive from them."""
    import ray  # noqa: F401  (session provided by conftest for ray tests)

    ids = sorted(set(ids_raw))
    texts = ["w " * (i % 7) for i in ids]
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
    ).repartition(3)
    from tg_data_connector_ray.ops.corpus import pack_sequences

    out = (
        pack_sequences(ds, budget=budget, num_ranges=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_tok = [i % 7 for i in ids]
    starts = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
    assert out["n_tok"].tolist() == n_tok
    assert out["tok_start"].tolist() == starts.tolist()
    assert out["seq_first"].tolist() == (starts // budget).tolist()
    assert (
        out["off_in_seq"].tolist() == (starts % budget).tolist()
    )


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=50))
def test_hll_partial_equals_bruteforce(vals):
    from tg_data_connector_ray.ops.sketches import hll_partial_batch

    t = pa.table(
        {
            "g": pa.array(["k"] * len(vals), pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    out = hll_partial_batch(t, "g", "v").to_pandas()
    regs: dict = {}
    for v in set(vals):
        d = hashlib.md5(b"hll:" + str(v).encode()).digest()
        bucket = d[0]
        v56 = int.from_bytes(d[1:8], "big")
        rho = 57 if v56 == 0 else 57 - v56.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    got = dict(zip(out["bucket"], out["rho"]))
    assert got == regs


@settings(max_examples=8, deadline=None)  # full Ray pipeline per example
@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 99)), min_size=1, max_size=25),
    st.lists(st.integers(0, 6), min_size=0, max_size=10),
    st.sampled_from(["inner", "left", "anti"]),
)
def test_hash_join_equals_pandas_reference(left_rows, right_keys, how):
    import pandas as pd
    import ray.data

    from tg_data_connector_ray.pipelines.relational import hash_join

    right_keys = sorted(set(right_keys))
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([k for k, _ in left_rows], pa.int64()),
                "x": pa.array([x for _, x in left_rows], pa.int64()),
            }
        )
    ).repartition(2)
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(right_keys, pa.int64()),
                "y": pa.array([k * 10 for k in right_keys], pa.int64()),
            }
        )
    )
    got = hash_join(left, right, on="k", how=how, right_unique=(how == "inner"))
    gdf = got.to_pandas()
    ldf = pd.DataFrame({"k": [k for k, _ in left_rows], "x": [x for _, x in left_rows]})
    rdf = pd.DataFrame({"k": right_keys, "y": [k * 10 for k in right_keys]})
    if how == "anti":
        exp = ldf[~ldf["k"].isin(rdf["k"])]
        cols = ["k", "x"]
    else:
        exp = ldf.merge(rdf, on="k", how=how)
        cols = ["k", "x", "y"]
    if len(gdf.columns) == 0:
        # Ray's documented empty-output behavior: when every per-bucket
        # table is empty the dataset is zero-schema — valid iff the
        # reference result is empty too
        assert exp.empty, (how, exp)
        return
    g = gdf[cols].sort_values(cols).reset_index(drop=True).astype("float64")
    e = exp[cols].sort_values(cols).reset_index(drop=True).astype("float64")
    assert g.equals(e), (how, g, e)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),            # user
            st.integers(0, 6),            # ts (small domain: collisions)
            st.sampled_from(["A", "B", "C", "x"]),
        ),
        min_size=0,
        max_size=24,
    )
)
def test_funnel_chain_counts_equal_exhaustive_subsequence(events):
    """Greedy chained minima == exhaustive strictly-increasing
    subsequence existence, on adversarial tiny streams (ts collisions,
    missing steps, noise types)."""
    from itertools import product

    from tg_data_connector_ray.pipelines.relational import funnel_chain_counts

    steps = ["A", "B", "C"]
    user = np.array([e[0] for e in events], dtype=np.int64)
    ts = np.array([e[1] for e in events], dtype=np.int64)
    typ = np.array([e[2] for e in events], dtype=object)
    got = funnel_chain_counts(user, ts, typ, steps)

    exp = [0] * len(steps)
    for u in set(user.tolist()):
        evs = [(t, y) for uu, t, y in events if uu == u]
        for k in range(1, len(steps) + 1):
            # exhaustive: any selection of one event per step with
            # strictly increasing timestamps
            cands = [
                [t for t, y in evs if y == s] for s in steps[:k]
            ]
            found = any(
                all(sel[i] < sel[i + 1] for i in range(len(sel) - 1))
                for sel in product(*cands)
            ) if all(cands) else False
            if found:
                exp[k - 1] += 1
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)
        .map(" ".join),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_dup_span_batch_kernels_equal_bruteforce(texts, k):
    """The span-dedup batch kernels (window hashing + cross-doc dup set +
    gaps-and-islands merge) against a brute-force reference: enumerate
    every k-token window as a STRING, find windows appearing in >= 2
    distinct docs, merge per doc with the gap > k rule."""
    from tg_data_connector_ray.ops.spans import (
        DupSpanStats,
        _merge_spans,
        _window_hashes,
    )

    # brute force over window strings (no hashing at all)
    toks = [t.lower().split() for t in texts]
    wins = {}  # gram -> set(doc)
    per_doc = []  # (doc, pos) of every window
    for d, tk in enumerate(toks):
        for p in range(max(len(tk) - k + 1, 0)):
            g = " ".join(tk[p : p + k])
            wins.setdefault(g, set()).add(d)
            per_doc.append((d, p, g))
    dup_pos = [(d, p) for d, p, g in per_doc if len(wins[g]) >= 2]
    exp_spans: dict = {}
    for d in sorted({x for x, _ in dup_pos}):
        ps = sorted(p for x, p in dup_pos if x == d)
        spans = []
        for p in ps:
            if spans and p - spans[-1][1] <= k:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        exp_spans[d] = spans

    # engine kernels on the same batch
    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    h, counts, _, _ = _window_hashes(batch["text"], k)
    # dup set from hashes: >=2 distinct docs
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    by_hash: dict = {}
    for hv, d in zip(h.tolist(), doc_of.tolist()):
        by_hash.setdefault(hv, set()).add(d)
    dup_sorted = np.sort(
        np.array([hv for hv, ds_ in by_hash.items() if len(ds_) >= 2],
                 dtype=np.uint64)
    )
    out = DupSpanStats(dup_sorted, k)(batch)
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"], r["max_span_tokens"])
        for r in out.to_pylist()
    }
    exp = {
        d: (
            len(sp),
            sum(b - a + k for a, b in sp),
            max(b - a + k for a, b in sp),
        )
        for d, sp in exp_spans.items()
        if sp
    }
    assert got == exp
