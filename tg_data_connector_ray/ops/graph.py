"""Iterative graph algorithms over sequence-derived graphs.

The missing class in the reference (and in plain SQL engines without
recursion): extract a weighted transition graph from ordered per-key
event sequences DISTRIBUTED, then iterate a fixpoint over it.  The
extraction is the 100-TB-shaped part — whole keys co-locate per coarse
bucket and each bucket emits at most |types|² counted edges no matter how
many rows it saw; the iteration runs wherever the aggregated edge list
fits (driver for type-level graphs of ≤10⁴ nodes; the same recurrence
maps onto grouped joins when nodes outgrow one heap).

All arithmetic is INTEGER (scaled ranks, floor division) so the result
is bit-exact against an independent SQL reconstruction — the repo-wide
oracle convention for anything iterative (cf. embedding_kmeans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EDGES_SCHEMA = pa.schema(
    [("src", pa.string()), ("dst", pa.string()), ("w", pa.int64())]
)


def _empty_edges() -> pa.Table:
    return pa.table(
        {f.name: pa.array([], f.type) for f in EDGES_SCHEMA}, schema=EDGES_SCHEMA
    )


def sequence_edges(
    ds,
    key_col: str,
    type_col: str,
    order_cols: "list[str]",
    n_coarse: int = 64,
) -> pa.Table:
    """Weighted transition-edge list from per-key ordered sequences:
    for each key's rows ordered by `order_cols`, count consecutive
    (type -> next type) pairs globally.

    Shape: ONE coarse co-location shuffle (hash(key) & (n_coarse-1) —
    whole keys per bucket, so no cross-bucket pair is ever missed), a
    vectorized per-bucket lexsort + shift-compare partial of at most
    |types|² rows, and a bounded driver fold of n_coarse × |types|²
    partials.  Raw rows shuffle once; nothing key-ordered ever
    materializes globally."""

    def add_cg(t: pa.Table) -> pa.Table:
        cg = pc.cast(
            pc.bit_wise_and(pc.cast(t[key_col], pa.int64()), n_coarse - 1),
            pa.int32(),
        )
        return t.append_column("_cg", cg)

    def edges_block(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty_edges()
        key = g[key_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sort_keys = [
            g[c].combine_chunks().cast(pa.int64(), safe=False).to_numpy(zero_copy_only=False)
            for c in reversed(order_cols)
        ]
        order = np.lexsort((*sort_keys, key))
        key = key[order]
        same = key[1:] == key[:-1]
        if not same.any():
            return _empty_edges()
        typ = g[type_col].combine_chunks().take(pa.array(order))
        n = g.num_rows
        m = pa.array(same)
        pairs = pa.table(
            {"src": typ.slice(0, n - 1).filter(m), "dst": typ.slice(1, n - 1).filter(m)}
        )
        agg = pairs.group_by(["src", "dst"]).aggregate([([], "count_all")])
        return pa.table(
            {"src": agg["src"], "dst": agg["dst"],
             "w": agg["count_all"].cast(pa.int64())},
            schema=EDGES_SCHEMA,
        )

    import ray

    partials = (
        ds.map_batches(add_cg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cg")
        .map_groups(edges_block, batch_format="pyarrow")
    )
    blocks = [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return _empty_edges()
    t = pa.concat_tables(blocks, promote_options="default")
    agg = t.group_by(["src", "dst"]).aggregate([("w", "sum")])
    return pa.table(
        {"src": agg["src"], "dst": agg["dst"], "w": agg["w_sum"].cast(pa.int64())},
        schema=EDGES_SCHEMA,
    ).sort_by([("src", "ascending"), ("dst", "ascending")])


def integer_pagerank(
    edges: pa.Table, iters: int = 3, scale: int = 1_000_000
) -> pa.Table:
    """Exact integer PageRank over a counted edge list, damping 85/100:

        r0(v)    = scale
        r_{k+1}(v) = (15·scale)//100
                   + Σ_{u→v} (85·r_k(u)·w(u,v)) // (100·W(u))

    with W(u) the total out-weight of u and // floor division (non-
    negative operands, so DuckDB's truncating // agrees — the recurrence
    is reproducible verbatim in SQL, which is the oracle).  Dangling
    nodes contribute nothing (their mass decays to the base term), the
    standard strict-sink variant.

    The node table here is event/tool TYPES (tiny), so the fixpoint runs
    as numpy on the driver; overflow bound: 85·r·w needs r·w < 10¹⁷ —
    holds for scale 10⁶ and edge weights to 10¹⁰.  For node sets beyond
    one heap use `integer_pagerank_ds` — the identical recurrence as two
    grouped joins per iteration, pinned bit-equal to this fixpoint by
    test."""
    if edges.num_rows == 0:
        return pa.table(
            {"node": pa.array([], pa.string()), "rank_u": pa.array([], pa.int64())}
        )
    src = np.asarray(edges["src"].to_pylist(), dtype=object)
    dst = np.asarray(edges["dst"].to_pylist(), dtype=object)
    w = edges["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.array([idx[v] for v in src], dtype=np.int64)
    di = np.array([idx[v] for v in dst], dtype=np.int64)
    wout = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(wout, si, w)
    base = (15 * scale) // 100
    r = np.full(len(nodes), scale, dtype=np.int64)
    for _ in range(iters):
        contrib = (85 * r[si] * w) // (100 * wout[si])
        r_new = np.full(len(nodes), base, dtype=np.int64)
        np.add.at(r_new, di, contrib)
        r = r_new
    return pa.table(
        {"node": pa.array(nodes.tolist(), pa.string()),
         "rank_u": pa.array(r)}
    )


def sequence_ngrams(
    ds,
    key_col: str,
    type_col: str,
    order_cols: "list[str]",
    n: int = 3,
    k: int = 20,
    n_coarse: int = 64,
) -> pa.Table:
    """Top-k length-n paths (type n-grams) over per-key ordered
    sequences: the "what do users actually do" path-mining view of the
    same transition structure sequence_edges counts pairwise.

    Same scale shape as sequence_edges — whole keys per coarse bucket,
    one vectorized partial per bucket (≤ |types|ⁿ rows, in practice the
    paths the bucket saw), bounded driver fold + top-k.  Ties broken by
    path string ascending (deterministic, matches ORDER BY cnt DESC,
    path)."""

    def add_cg(t: pa.Table) -> pa.Table:
        cg = pc.cast(
            pc.bit_wise_and(pc.cast(t[key_col], pa.int64()), n_coarse - 1),
            pa.int32(),
        )
        return t.append_column("_cg", cg)

    def grams_block(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"path": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        if g.num_rows < n:
            return empty
        key = g[key_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sort_keys = [
            g[c].combine_chunks().cast(pa.int64(), safe=False).to_numpy(zero_copy_only=False)
            for c in reversed(order_cols)
        ]
        order = np.lexsort((*sort_keys, key))
        key = key[order]
        typ = g[type_col].combine_chunks().take(pa.array(order))
        rows = g.num_rows
        # an n-gram starting at i is valid iff rows i..i+n-1 share the key
        ok = key[: rows - n + 1] == key[n - 1 :]
        if not ok.any():
            return empty
        parts = [typ.slice(j, rows - n + 1).filter(pa.array(ok)) for j in range(n)]
        path = parts[0]
        for p in parts[1:]:
            path = pc.binary_join_element_wise(path, p, ">")
        agg = pa.table({"path": path}).group_by("path").aggregate([([], "count_all")])
        return pa.table(
            {"path": agg["path"], "cnt": agg["count_all"].cast(pa.int64())}
        )

    import ray

    partials = (
        ds.map_batches(add_cg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_cg")
        .map_groups(grams_block, batch_format="pyarrow")
    )
    blocks = [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return pa.table(
            {"path": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(blocks, promote_options="default")
    agg = t.group_by("path").aggregate([("cnt", "sum")])
    out = pa.table({"path": agg["path"], "cnt": agg["cnt_sum"].cast(pa.int64())})
    out = out.sort_by([("cnt", "descending"), ("path", "ascending")])
    return out.slice(0, k)


def integer_pagerank_ds(edges_ds, iters: int = 3, scale: int = 1_000_000):
    """The beyond-one-heap form of `integer_pagerank`: node set and edge
    list stay distributed Datasets, and each iteration is exactly the
    two grouped exchanges the driver fixpoint's docstring promises —
    rank ⋈ edges on src (right-unique gather join), then a coarse-bucket
    sum per dst.  Same integer recurrence, so the two implementations
    are bit-equal (pinned by test) and share the SQL oracle.

    Per iteration the only materialization is the RANK table (O(nodes) —
    the iteration frontier every distributed PageRank carries); edges
    re-read lazily from their source.  With 10⁹ nodes at 16 B/row the
    frontier is ~16 GB across the cluster — object-store resident, never
    driver-side."""
    import ray

    from ..pipelines.relational import (
        distinct_rows,
        grouped_arrow_aggregate,
        hash_join,
    )

    base = (15 * scale) // 100

    # out-weight per src, attached to every edge once (reused all iters)
    outw = grouped_arrow_aggregate(edges_ds, "src", [("w", "sum")], ["wout"])
    edges_w = hash_join(edges_ds, outw, on="src", right_unique=True).materialize()

    nodes = distinct_rows(
        edges_ds.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays(
                [t["src"].combine_chunks(), t["dst"].combine_chunks()]
            )}),
            batch_format="pyarrow",
        ),
        "node",
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(t.num_rows, scale, np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        srcr = ranks.map_batches(
            lambda t: pa.table({"src": t["node"], "r": t["r"]}),
            batch_format="pyarrow",
        )
        contrib = hash_join(edges_w, srcr, on="src", right_unique=True).map_batches(
            lambda t: pa.table(
                {
                    "dst": t["dst"],
                    "c": pa.array(
                        (
                            85
                            * t["r"].combine_chunks().to_numpy(zero_copy_only=False)
                            * t["w"].combine_chunks().to_numpy(zero_copy_only=False)
                        )
                        // (
                            100
                            * t["wout"].combine_chunks().to_numpy(zero_copy_only=False)
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = grouped_arrow_aggregate(contrib, "dst", [("c", "sum")], ["c"])
        joined = hash_join(nodes, sums.map_batches(
            lambda t: pa.table({"node": t["dst"], "c": t["c"]}),
            batch_format="pyarrow",
        ), on="node", how="left", right_unique=True)
        ranks = joined.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "r": pa.array(
                        base
                        + pa.compute.fill_null(t["c"], 0)
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_u": t["r"]}),
        batch_format="pyarrow",
    )
