"""Corpus-level statistics for training-data pipelines: global n-gram
counts, TF-IDF term ranking, stratified sampling, and exact distributed
quantiles.

Everything here follows the repo's two scale rules: per-batch work is
vectorized (numpy / pyarrow kernels over flat arrays, no per-row Python in
hot paths), and the only wide operations are coarse-bucket exchanges
(`grouped_arrow_aggregate`: hash(key) % n_coarse shuffle + ONE Arrow
group_by per bucket) whose shuffle volume is partial aggregates, never the
corpus.  The reference connector has no corpus analytics at all — these
are the operations a 100 TB pretraining-data pipeline runs on day one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _i64

_U6 = 1_000_000.0


def _round_even_u6(x: np.ndarray) -> np.ndarray:
    """np.round is half-to-even — the same tie rule as DuckDB round_even,
    the repo-wide float<->oracle integerization convention."""
    return np.round(x * _U6).astype(np.int64)


def _tokens_flat(texts) -> "tuple[np.ndarray, np.ndarray]":
    """All docs' lowercased tokens as one flat object array + doc offsets
    (split rule [A-Za-z0-9_]+, identical to ops.dedup and the SQL oracles'
    regexp_extract_all).  Tokenization is the shared vectorized
    `_split_tokens_arrow` (one split_pattern_regex, no per-doc loop);
    accepts a list or an Arrow string column."""
    from .dedup import _split_tokens_arrow

    flat, offs = _split_tokens_arrow(texts)
    return flat.to_numpy(zero_copy_only=False), offs




def _kgram_window(values: np.ndarray, offs: np.ndarray, k: int,
                  keys: "np.ndarray | None" = None):
    """Within-doc k-gram windows over a flat token array: returns
    (key_per_window, [col0..col(k-1)]) where col_i is the i-th token of
    each window and windows never cross the doc boundaries encoded in
    `offs`.  `keys` defaults to the doc ordinal.  The shared machinery
    behind bigram counting, repetition metrics, and contamination gram
    hashing (one masked shift per gram position, no per-doc loop)."""
    counts = np.diff(offs)
    n = len(values)
    n_docs = len(counts)
    if keys is None:
        keys = np.arange(n_docs, dtype=np.int64)
    if n < k:
        return np.zeros(0, np.int64), [np.zeros(0, values.dtype) for _ in range(k)]
    pos = np.arange(n, dtype=np.int64) - np.repeat(offs[:-1], counts)
    valid = (pos < np.repeat(counts - (k - 1), counts))[: n - (k - 1)]
    cols = [values[i : n - (k - 1) + i][valid] for i in range(k)]
    key_of = np.repeat(keys, counts)[: n - (k - 1)][valid]
    return key_of, cols


def _kgram_runs(key_of: np.ndarray, cols: "list[np.ndarray]"):
    """Run-length counting of (key, gram-tuple) windows: lexsort, mark
    firsts, return (first_mask_indices_sorted_view) as
    (keys_first, cols_first, run_counts)."""
    order = np.lexsort(tuple(reversed(cols)) + (key_of,))
    d = key_of[order]
    cols = [c[order] for c in cols]
    if not len(d):
        return d, cols, np.zeros(0, np.int64)
    diff = d[1:] != d[:-1]
    for c in cols:
        diff |= c[1:] != c[:-1]
    first = np.concatenate([[True], diff])
    starts = np.nonzero(first)[0]
    cnt = np.diff(np.append(starts, len(d)))
    return d[first], [c[first] for c in cols], cnt


# ---------------------------------------------------------------------------
# global n-gram counts

def bigram_counts_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Partial (ngram, n) counts for one batch — the combiner half of the
    global count.  Bigrams never cross document boundaries."""
    flat, offs = _tokens_flat(batch[col])
    if len(flat) < 2:
        return pa.table({"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    # int-code tokens once; count (a, b) id pairs with one lexsort +
    # run-length pass and materialize strings only for the UNIQUE pairs
    # that survive counting (counts are global, so all windows share key 0)
    vocab, tid = np.unique(flat, return_inverse=True)
    _, cols = _kgram_window(tid, offs, 2)
    if not len(cols[0]):
        return pa.table({"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    _, (a, b), cnt = _kgram_runs(np.zeros(len(cols[0]), np.int64), cols)
    grams = np.array(
        [x + " " + y for x, y in zip(vocab[a], vocab[b])], dtype=object
    )
    return pa.table(
        {"ngram": pa.array(grams, pa.string()), "n": pa.array(cnt, pa.int64())}
    )


def top_ngrams(ds, k: int = 50, col: str = "text"):
    """Global top-k bigrams by (count desc, ngram asc).

    Shape: per-batch partial counts (the flat-token bigram pass above) ->
    coarse-bucket SUM by ngram (`grouped_arrow_aggregate`: the shuffle
    carries only per-batch partials, ~unique-bigrams-per-batch rows) ->
    per-bucket top-k -> driver merge of n_coarse * k rows.  Returns a
    pyarrow Table (ngram, n) sorted (n desc, ngram asc)."""
    from ..pipelines.relational import grouped_arrow_aggregate

    partial = ds.map_batches(
        lambda t: bigram_counts_batch(t, col), batch_format="pyarrow", zero_copy_batch=True
    )
    total = grouped_arrow_aggregate(partial, "ngram", [("n", "sum")], ["n"])

    def bucket_topk(g: pa.Table) -> pa.Table:
        cnt = _i64(g["n"])
        ng = g["ngram"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ng, -cnt))[:k]
        return pa.table(
            {"ngram": pa.array(ng[order], pa.string()), "n": pa.array(cnt[order], pa.int64())}
        )

    head = total.map_batches(bucket_topk, batch_format="pyarrow").to_pandas()
    if head.empty:  # degenerate corpus: no bigram anywhere (zero-schema guard)
        return pa.table({"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    head = head.sort_values(["n", "ngram"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(head.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# TF-IDF

def term_freq_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """(doc_id, term, tf) rows for one batch of documents, vectorized:
    terms int-coded per batch via np.unique, (doc, term_id) pairs counted
    with one lexsort + run-length pass."""
    ids = _i64(batch["doc_id"])
    flat, offs = _tokens_flat(batch[col])
    if not len(flat):
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    vocab, tid = np.unique(flat, return_inverse=True)
    doc_of = np.repeat(ids, np.diff(offs))
    order = np.lexsort((tid, doc_of))
    d, t = doc_of[order], tid[order]
    first = np.concatenate([[True], (d[1:] != d[:-1]) | (t[1:] != t[:-1])])
    starts = np.nonzero(first)[0]
    tf = np.diff(np.append(starts, len(d)))
    return pa.table(
        {
            "doc_id": pa.array(d[first], pa.int64()),
            "term": pa.array(vocab[t[first]], pa.string()),
            "tf": pa.array(tf, pa.int64()),
        }
    )


# Below this many distinct terms the DF table is gathered once and rides
# to scoring tasks in the (object-store-cached) task closure; above it the
# join + coarse-grouped ranking path runs.  The broadcast rides as TWO
# Arrow arrays (terms + counts, ~30-40 B/term with string payload: ~70 MB
# at the bound), and natural-language vocabularies grow ~O(sqrt(corpus))
# (Heaps' law), so the broadcast path covers most real corpora; the join
# path exists for adversarial/id-like vocabularies.
SMALL_VOCAB = 2_000_000


def _rank_topk_scored(t: pa.Table, k: int) -> pa.Table:
    """Per-doc top-k by (score_u desc, term asc) over rows already
    co-located by doc (one lexsort, run-length ranked)."""
    d = _i64(t["doc_id"])
    term = t["term"].combine_chunks().to_numpy(zero_copy_only=False)
    tf = _i64(t["tf"])
    df = _i64(t["df"])
    su = _i64(t["score_u"])
    order = np.lexsort((term, -su, d))
    d, term, tf, df, su = d[order], term[order], tf[order], df[order], su[order]
    new_d = np.concatenate([[True], d[1:] != d[:-1]])
    starts = np.nonzero(new_d)[0]
    pos = np.arange(len(d)) - starts[np.cumsum(new_d) - 1]
    keep = pos < k
    return pa.table(
        {
            "doc_id": pa.array(d[keep], pa.int64()),
            "rn": pa.array((pos[keep] + 1).astype(np.int64)),
            "term": pa.array(term[keep], pa.string()),
            "tf": pa.array(tf[keep], pa.int64()),
            "df": pa.array(df[keep], pa.int64()),
            "score_u": pa.array(su[keep], pa.int64()),
        }
    )


def tfidf_topk(ds, k: int = 3, col: str = "text", small_vocab: int = SMALL_VOCAB):
    """Per-document top-k TF-IDF terms: (doc_id, rn, term, tf, df, score_u)
    with score_u = round_even(tf * ln(N/df) * 1e6) as int64 (the repo's
    u6 float convention — ranking compares the INTEGER score, so engine
    and oracle order identically).

    Scale shape: one pass builds (doc_id, term, tf) partials; DF is a
    coarse-bucket COUNT over those rows (each (doc, term) appears exactly
    once, so row-count per term IS the document frequency); N is the doc
    count (parquet metadata).  Small vocabularies broadcast the DF table
    to scoring tasks (no join); big ones hash-join DF onto the tf rows.
    BOTH paths rank per-doc in a coarse-grouped pass (groupby on
    hash(doc_id) & 63): ranking inside a map_batches block would silently
    produce two rank sequences for one doc whenever Ray's dynamic block
    splitting cuts a tf block mid-doc, so per-doc ranking must never
    depend on block boundaries."""
    from ..pipelines.relational import grouped_arrow_aggregate

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score_u": pa.array([], pa.int64()),
        }
    )
    n_docs = ds.count()
    tf_rows = ds.map_batches(
        lambda t: term_freq_batch(t, col), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    df_tbl = grouped_arrow_aggregate(
        tf_rows, "term", [("doc_id", "count")], ["df"]
    ).materialize()

    n_terms = df_tbl.count()
    if n_terms == 0:
        # degenerate corpus: no token anywhere.  Return the typed Arrow
        # table itself — wrapping an empty table in a Dataset loses the
        # schema again on to_pandas (Ray's empty-block conversion)
        return _EMPTY
    if n_terms <= small_vocab:
        # DF rides in the task closure as TWO Arrow arrays (broadcast once
        # via the object store, never re-shipped per batch); the per-batch
        # lookup is one vectorized pc.index_in + take — no Python dict,
        # no per-row loop (the BroadcastLookup idiom)
        df_pdf = df_tbl.to_pandas()
        df_terms = pa.array(df_pdf["term"], pa.string())
        df_counts = pa.array(df_pdf["df"].to_numpy(np.int64), pa.int64())

        def score_bcast(t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["term"], value_set=df_terms)
            df = df_counts.take(idx).to_numpy(zero_copy_only=False).astype(np.int64)
            tf = _i64(t["tf"])
            su = _round_even_u6(tf * np.log(float(n_docs) / df))
            d = _i64(t["doc_id"])
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "term": t["term"],
                    "tf": t["tf"],
                    "df": pa.array(df, pa.int64()),
                    "score_u": pa.array(su, pa.int64()),
                    "_cg": pa.array((d & 63).astype(np.int32)),
                }
            )

        scored = tf_rows.map_batches(score_bcast, batch_format="pyarrow")
        return scored.groupby("_cg").map_groups(
            lambda g: _rank_topk_scored(g.drop_columns(["_cg"]), k),
            batch_format="pyarrow",
        )

    # big-vocabulary path: DF joins onto the tf rows (both sides thin),
    # then a coarse-grouped per-doc ranking (doc rows scatter in the join)
    from .dedup import _join_ready, _nonempty

    joined = _join_ready(tf_rows, ["doc_id", "term", "tf"]).join(
        _join_ready(df_tbl, ["term", "df"]), join_type="inner", num_partitions=16, on=("term",)
    )

    def score(t: pa.Table) -> pa.Table:
        tf = _i64(t["tf"])
        df = _i64(t["df"])
        su = _round_even_u6(tf * np.log(float(n_docs) / df))
        d = _i64(t["doc_id"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": t["tf"],
                "df": t["df"],
                "score_u": pa.array(su, pa.int64()),
                "_cg": pa.array((d & 63).astype(np.int32)),
            }
        )

    scored = _nonempty(joined).map_batches(score, batch_format="pyarrow")
    return (
        scored.groupby("_cg")
        .map_groups(lambda g: _rank_topk_scored(g.drop_columns(["_cg"]), k), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# stratified sampling

def stratified_sample(ds, strata_col: str, key_col: str = "doc_id", k: int = 100,
                      salt: str = "strat"):
    """Exactly k rows per stratum, chosen by hashed key order — the
    deterministic analogue of per-stratum random sampling (membership is a
    pure function of the key: re-runs and backfills pick the same rows).

    Order within a stratum is (md5 bucket, key) — the same md5 rule as
    `ops.sampling` so a DuckDB oracle reproduces it bit-for-bit.  Shape is
    per-key top-N: each block keeps its k best rows per stratum, the final
    pass merges block partials per stratum (strata counts are small by
    definition — a stratification with millions of strata is a group-by,
    not a sample).  Returns (stratum, key) rows."""
    from .sampling import _key_buckets

    def _head(s: np.ndarray, b: np.ndarray, key: np.ndarray, with_b: bool) -> pa.Table:
        """Shared (stratum, bucket, key)-ordered per-stratum head.  A null
        stratum is its own group (SQL GROUP BY semantics): the sort key
        maps None to a NUL sentinel (object arrays with None are not
        lexsortable), while the OUTPUT keeps the real null."""
        s_key = np.where(s == None, "\x00<null>", s).astype(object)  # noqa: E711
        order = np.lexsort((key, b, s_key))
        s, s_key, b, key = s[order], s_key[order], b[order], key[order]
        new_s = np.concatenate([[True], s_key[1:] != s_key[:-1]])
        starts = np.nonzero(new_s)[0]
        pos = np.arange(len(s)) - starts[np.cumsum(new_s) - 1]
        keep = pos < k
        cols = {
            strata_col: pa.array(s[keep], pa.string()),
            key_col: pa.array(key[keep], pa.int64()),
        }
        if with_b:
            cols["_b"] = pa.array(b[keep], pa.int64())
        return pa.table(cols)

    def block_head(t: pa.Table) -> pa.Table:
        key = _i64(t[key_col])
        b = _key_buckets(key.tolist(), salt)
        s = t[strata_col].combine_chunks().to_numpy(zero_copy_only=False)
        return _head(s, b, key, with_b=True)

    def final_head(g: pa.Table) -> pa.Table:
        return _head(
            g[strata_col].combine_chunks().to_numpy(zero_copy_only=False),
            _i64(g["_b"]),
            _i64(g[key_col]),
            with_b=False,
        )

    return (
        ds.map_batches(block_head, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(strata_col)
        .map_groups(final_head, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)

def pack_sequences(ds, budget: int = 2048, id_col: str = "doc_id",
                   col: str = "text", num_ranges: int = 64):
    """Concat-and-chunk sequence packing — the document->training-sequence
    layout GPT-style pretraining uses: documents are concatenated in
    `id_col` order and the token stream is cut into fixed `budget`-token
    sequences (docs may span a boundary).  Emits per doc: n_tok,
    tok_start (global token offset), seq_first / seq_last (sequence ids
    covering the doc; empty docs get seq_first), off_in_seq.

    The global offset is a distributed ordered prefix sum: one pass
    computes thin (id, n_tok) rows (Arrow regex count, column-pruned),
    ids are range-partitioned by value, per-range token sums (one tiny
    row per range) prefix-sum on the driver, and a coarse per-range pass
    assigns offsets with a local cumsum.  Shuffle volume is the thin
    pairs; driver state is O(num_ranges) — at 10^10 docs the exchange is
    two int64 columns and the driver holds 64 numbers."""
    def tok_counts(t: pa.Table) -> pa.Table:
        # null text counts as 0 tokens (a null count would NaN-poison the
        # prefix sums).  Counting runs on the RAW text deliberately:
        # packing budgets tokens as written, and the paired SQL oracle
        # counts the same raw-text regex — the lowered tokenization is a
        # dedup/shingling convention, not a packing one.
        n_tok = pc.count_substring_regex(
            pc.fill_null(t[col], ""), "[A-Za-z0-9_]+"
        ).cast(pa.int64())
        return pa.table({id_col: t[id_col], "n_tok": n_tok})

    thin = ds.map_batches(tok_counts, batch_format="pyarrow", zero_copy_batch=True)
    return pack_sequences_thin(thin, budget=budget, id_col=id_col, num_ranges=num_ranges)


def pack_sequences_thin(thin, budget: int = 2048, id_col: str = "doc_id",
                        num_ranges: int = 64, extra_cols: "tuple[str, ...]" = ()):
    """Packing from already-computed thin (id, n_tok[, extras]) rows — the
    composition entry point: a capstone that filters or semi-joins the
    corpus decides membership on THIN rows and never re-ships text into
    the packing exchange.  `extra_cols` ride through to the output
    unchanged (reordered with their doc).  Same prefix-sum machinery and
    output contract as `pack_sequences`."""
    thin = thin.materialize()
    # id min+max in ONE pass (per-block partials + driver reduce) instead
    # of two Dataset executions — fixed orchestration cost matters in
    # composite pipelines
    mm = thin.map_batches(
        lambda t: pa.table(
            {
                "lo": pa.array([pc.min(t[id_col]).as_py()], pa.int64()),
                "hi": pa.array([pc.max(t[id_col]).as_py()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas().dropna()
    if len(mm) == 0:  # empty corpus
        return pa.table(
            {c: pa.array([], type=pa.int64())
             for c in (id_col, "n_tok", "tok_start", "seq_first", "seq_last",
                       "off_in_seq", *extra_cols)}
        )
    lo = int(mm["lo"].min())
    span = max(int(mm["hi"].max()) - lo + 1, 1)

    def tag_range(t: pa.Table) -> pa.Table:
        ids = _i64(t[id_col])
        part = ((ids - lo) * num_ranges) // span
        return t.append_column("_rg", pa.array(part.astype(np.int64)))

    tagged = thin.map_batches(tag_range, batch_format="pyarrow").materialize()

    # per-range token sums: <= num_ranges partial rows per block, reduced
    # on the driver — no groupby shuffle for a 64-row aggregate
    def range_sums(t: pa.Table) -> pa.Table:
        g = t.select(["_rg", "n_tok"]).group_by("_rg").aggregate([("n_tok", "sum")])
        return g.rename_columns(["_rg", "s"])

    sums = (
        tagged.map_batches(range_sums, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("_rg", as_index=False)["s"]
        .sum()
    )
    sums = sums.sort_values("_rg")
    starts = np.concatenate([[0], np.cumsum(sums["s"].to_numpy(np.int64))])[:-1]
    range_off = dict(zip(sums["_rg"].astype(np.int64), starts))

    def assign(g: pa.Table) -> pa.Table:
        ids = _i64(g[id_col])
        n_tok = _i64(g["n_tok"])
        rg = int(g["_rg"][0].as_py())
        order = np.argsort(ids, kind="stable")
        ids, n_tok = ids[order], n_tok[order]
        tok_start = range_off[rg] + np.concatenate([[0], np.cumsum(n_tok)])[:-1]
        seq_first = tok_start // budget
        seq_last = (tok_start + np.maximum(n_tok, 1) - 1) // budget
        out = pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "tok_start": pa.array(tok_start, pa.int64()),
                "seq_first": pa.array(seq_first, pa.int64()),
                "seq_last": pa.array(seq_last, pa.int64()),
                "off_in_seq": pa.array(tok_start % budget, pa.int64()),
            }
        )
        take = pa.array(order)
        for c in extra_cols:
            out = out.append_column(c, g[c].take(take))
        return out

    return tagged.groupby("_rg").map_groups(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact distributed quantiles (value-histogram method)

def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
                      scale: int = 100):
    """Exact per-group quantiles with linear interpolation (SQL
    percentile_cont / numpy 'linear'), computed WITHOUT sorting the data:
    values are discretized to an exact integer grid (`scale`=100 -> cents;
    the input invariant is that v*scale is integral, asserted per batch),
    per-batch partial histograms (group, grid_value, n) shuffle instead of
    rows, a coarse-bucket SUM merges them, and quantiles come from the
    merged counts by cumulative-count search.  Shuffle volume is bounded
    by groups x distinct grid values regardless of row count — at 10^10
    rows the exchange is still tiny, where a sort-based percentile ships
    the whole table.  Returns (group, q50_u, q90_u, ...) with the u6
    integer convention."""

    def hist(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        # null group = its own group; the sentinel is the SORT key only
        # (object arrays with None are not lexsortable) — output keeps
        # the real null (see stratified_sample._head)
        g_key = np.where(g == None, "\x00<null>", g).astype(object)  # noqa: E711
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        cent = np.round(v * scale)
        if not np.allclose(cent / scale, v, rtol=0, atol=1e-9):
            raise ValueError(
                f"{value_col} not on the 1/{scale} grid; raise `scale` or use a sort-based path"
            )
        cent = cent.astype(np.int64)
        order = np.lexsort((cent, g_key))
        g, g_key, cent = g[order], g_key[order], cent[order]
        first = np.concatenate(
            [[True], (g_key[1:] != g_key[:-1]) | (cent[1:] != cent[:-1])]
        )
        starts = np.nonzero(first)[0]
        n = np.diff(np.append(starts, len(g)))
        return pa.table(
            {
                group_col: pa.array(g[first], pa.string()),
                "cent": pa.array(cent[first], pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    from ..pipelines.relational import grouped_arrow_aggregate

    merged = grouped_arrow_aggregate(
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "cent"],
        [("n", "sum")],
        ["n"],
    )
    # the merged histogram is groups x grid values — small by construction;
    # the finishing interpolation is a driver-side pass over it
    pdf = merged.to_pandas()
    if pdf.empty:  # empty input: zero-schema guard, return typed empty
        cols = {group_col: pa.array([], pa.string())}
        for q in qs:
            cols[f"p{int(q * 100)}_u"] = pa.array([], pa.int64())
        return pa.table(cols)
    pdf = pdf.sort_values([group_col, "cent"])
    out_groups, out_cols = [], {f"p{int(q * 100)}_u": [] for q in qs}
    for grp, sub in pdf.groupby(group_col, sort=True):
        cents = sub["cent"].to_numpy(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        out_groups.append(grp)
        for q in qs:
            h = (total - 1) * q
            lo_i = int(np.searchsorted(cum, np.floor(h) + 1, side="left"))
            hi_i = int(np.searchsorted(cum, np.floor(h) + 2, side="left"))
            lo = cents[lo_i] / scale
            hi = cents[min(hi_i, len(cents) - 1)] / scale
            val = lo + (h - np.floor(h)) * (hi - lo)
            out_cols[f"p{int(q * 100)}_u"].append(int(np.round(val * _U6)))
    cols = {group_col: pa.array(out_groups, pa.string())}
    for name, vals in out_cols.items():
        cols[name] = pa.array(vals, pa.int64())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# benchmark contamination (train/test k-gram overlap)

def _doc_gram_hashes(t: pa.Table, k: int, col: str = "text"):
    """Distinct (doc_id, gram-u64) pairs per batch: tokens int-coded, k-gram
    id tuples deduped via lexsort run-lengths, gram STRINGS materialized and
    md5-hashed only for the unique survivors (md5 once per unique gram —
    the repo's gram-string<->u64 bijection convention, same as the minhash
    oracle).  Docs with < k tokens emit no grams (matching the SQL side's
    empty range)."""
    from .dedup import _md5_u64

    ids = _i64(t["doc_id"])
    flat, offs = _tokens_flat(t[col])
    if len(flat) < k:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    vocab, tid = np.unique(flat, return_inverse=True)
    key_of, cols = _kgram_window(tid, offs, k, keys=ids)
    if not len(key_of):
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    d, cols_f, _ = _kgram_runs(key_of, cols)
    gram_strs = np.array(
        [" ".join(vocab[c[i]] for c in cols_f) for i in range(len(d))],
        dtype=object,
    )
    # md5 once per unique gram string in the batch
    uniq, inv = np.unique(gram_strs, return_inverse=True)
    h = np.array([_md5_u64(u) for u in uniq], dtype=np.uint64)[inv]
    return d, h


def bench_gram_set(bench_ds, k: int = 5, col: str = "text") -> np.ndarray:
    """The benchmark side reduced to a sorted distinct gram-u64 array —
    small by definition (test sets), broadcast via task closures."""

    def bench_grams(t: pa.Table) -> pa.Table:
        _, h = _doc_gram_hashes(t, k, col)
        return pa.table({"g": pa.array(np.unique(h).view(np.int64), pa.int64())})

    bench_pdf = bench_ds.map_batches(
        bench_grams, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # bounded: the benchmark set is small by definition
    if len(bench_pdf):
        return np.unique(bench_pdf["g"].to_numpy(np.int64).view(np.uint64))
    return np.zeros(0, np.uint64)


def contamination_counts_batch(
    t: pa.Table, bench_set: np.ndarray, k: int = 5, col: str = "text"
) -> "tuple[np.ndarray, np.ndarray]":
    """(hit doc_ids, distinct-shared-gram counts) for one batch — the
    vectorized membership kernel (np.isin against the sorted bench
    array).  Shared by `ngram_contamination` and fused passes that
    compute contamination alongside other per-doc reductions in a single
    corpus read (docs_prep_v2)."""
    d, h = _doc_gram_hashes(t, k, col)
    hit = np.isin(h, bench_set)
    if not hit.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    uniq_d, cnt = np.unique(d[hit], return_counts=True)
    return uniq_d, cnt.astype(np.int64)


def ngram_contamination(corpus_ds, bench_ds, k: int = 5, col: str = "text"):
    """Train/test contamination check: corpus documents sharing at least
    one k-gram with the benchmark set, with the count of distinct shared
    grams — the decontamination sweep every pretraining pipeline runs
    before training.

    Scale shape: the BENCHMARK side (small by definition — test sets) is
    reduced to a distinct gram-u64 set and broadcast via the task closure;
    the corpus streams through one vectorized membership pass (np.isin
    against the sorted bench array) — no shuffle touches the corpus at
    all.  Returns (doc_id, n_shared) rows for hit documents only."""
    bench_set = bench_gram_set(bench_ds, k, col)

    def probe(t: pa.Table) -> pa.Table:
        uniq_d, cnt = contamination_counts_batch(t, bench_set, k, col)
        return pa.table(
            {
                "doc_id": pa.array(uniq_d, pa.int64()),
                "n_shared": pa.array(cnt, pa.int64()),
            }
        )

    return corpus_ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def postings(ds, k: int = 200, col: str = "text"):
    """Inverted-index head: per term its document frequency, total term
    frequency, and posting span (min/max doc_id); output = the top-`k`
    terms by (df DESC, term ASC) — the dictionary page a distributed
    index build writes first, and the stats a query planner prunes with.

    Scale shape: (1) `term_freq_batch` emits exact per-(doc, term) rows
    per block (one doc never spans blocks, so block-local distinctness
    is global); (2) a per-batch Arrow group_by collapses them to thin
    (term, df, tf, min_doc, max_doc) partials; (3) ONE coarse-bucket
    aggregate finishes every term; (4) each bucket emits only its local
    top-k, the driver finishes k x buckets thin rows.  Full postings
    LISTS are deliberately not materialized here — at 100 TB they are a
    partitioned parquet sink (term-bucket dirs), while the contract
    surface is the bounded dictionary head."""
    from ..pipelines.relational import grouped_arrow_aggregate

    def partial(t: pa.Table) -> pa.Table:
        tf = term_freq_batch(t, col)
        one = pa.array(np.ones(tf.num_rows, np.int64))
        g = (
            pa.table(
                {
                    "term": tf["term"],
                    "df": one,
                    "tf": tf["tf"],
                    "min_doc": tf["doc_id"],
                    "max_doc": tf["doc_id"],
                }
            )
            .group_by("term")
            .aggregate(
                [("df", "sum"), ("tf", "sum"), ("min_doc", "min"), ("max_doc", "max")]
            )
        )
        agg = [c for c in g.column_names if c != "term"]
        return g.select(["term"] + agg).rename_columns(
            ["term", "df", "tf", "min_doc", "max_doc"]
        )

    full = grouped_arrow_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "term",
        [("df", "sum"), ("tf", "sum"), ("min_doc", "min"), ("max_doc", "max")],
        ["df", "tf", "min_doc", "max_doc"],
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        terms = t["term"].to_numpy(zero_copy_only=False)
        df = t["df"].to_numpy(zero_copy_only=False)
        top = np.lexsort((terms, -df))[:k]
        return t.take(pa.array(np.sort(top)))

    import ray

    parts = pa.concat_tables(
        ray.get(
            full.map_batches(
                local_topk, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
    )
    terms = parts["term"].to_numpy(zero_copy_only=False)
    df = parts["df"].to_numpy(zero_copy_only=False)
    top = np.lexsort((terms, -df))[:k]
    out = parts.take(pa.array(top))
    return pa.table(
        {
            "rn": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            "term": out["term"],
            "df": out["df"],
            "tf": out["tf"],
            "min_doc": out["min_doc"],
            "max_doc": out["max_doc"],
        }
    )


def table_profile(ds, columns: "list[str]") -> pa.Table:
    """Per-column data profile: row/null counts, exact min/max, distinct
    count, total string chars — the table-level statistics view a 100-TB
    onboarding job runs before anything else (the reference's preCheck,
    CommonRdbmsReader.java's dry-run hook, only validates config; it has
    no data statistics).

    Scale shape: ONE stats pass emits a tiny per-block × per-column
    partial (counts + typed min/max), folded with a single driver-side
    Arrow group_by over O(blocks × columns) rows; distinct counts ride a
    SECOND pass that ships only per-block-deduped (col_idx, hash64(value))
    pairs through the coarse-bucket distinct + count
    (sketches.grouped_distinct_count) — raw values, notably full document
    texts, never shuffle.  Distinct is exact up to 64-bit hash collisions
    (P ≈ n²/2⁶⁵ — negligible below ~10⁹ distinct values per column).

    Int64/temporal min/max fold as integers and render as DuckDB-style
    VARCHAR at the end; string columns fold lexicographically (binary
    UTF-8 order, DuckDB's default collation)."""
    import ray

    from ..ops.sketches import grouped_distinct_count
    from ..pipelines.relational import _hash64_col

    col_list = list(columns)

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in (
            "col_name", "n_rows", "n_null", "min_i", "max_i",
            "min_s", "max_s", "total_chars",
        )}
        for c in col_list:
            arr = t[c]
            is_str = pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
            mm = pc.min_max(arr)  # skips nulls; all-null/empty -> None
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            rows["col_name"].append(c)
            rows["n_rows"].append(t.num_rows)
            rows["n_null"].append(arr.null_count)
            rows["min_i"].append(None if is_str or mn is None else int(mn))
            rows["max_i"].append(None if is_str or mx is None else int(mx))
            rows["min_s"].append(mn if is_str else None)
            rows["max_s"].append(mx if is_str else None)
            rows["total_chars"].append(
                (pc.sum(pc.utf8_length(arr)).as_py() or 0) if is_str else None
            )
        return pa.table({
            "col_name": pa.array(rows["col_name"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_i": pa.array(rows["min_i"], pa.int64()),
            "max_i": pa.array(rows["max_i"], pa.int64()),
            "min_s": pa.array(rows["min_s"], pa.string()),
            "max_s": pa.array(rows["max_s"], pa.string()),
            "total_chars": pa.array(rows["total_chars"], pa.int64()),
        })

    partials = pa.Table.from_pylist(
        ds.map_batches(stats_partial, batch_format="pyarrow").take_all()
    )

    def pairs(t: pa.Table) -> pa.Table:
        idx, hs = [], []
        for ci, c in enumerate(col_list):
            valid = pc.drop_null(t[c].combine_chunks())
            if len(valid):
                h = np.unique(_hash64_col(valid).view(np.int64))
                idx.append(np.full(len(h), ci, dtype=np.int64))
                hs.append(h)
        if not idx:
            return pa.table({"col_idx": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        return pa.table({"col_idx": pa.array(np.concatenate(idx)),
                         "h": pa.array(np.concatenate(hs))})

    nd = {
        r["col_idx"]: r["n_distinct"]
        for r in grouped_distinct_count(
            ds.map_batches(pairs, batch_format="pyarrow"), "col_idx", "h"
        ).take_all()
    }

    out = {k: [] for k in (
        "col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v",
        "total_chars",
    )}
    if partials.num_rows:
        fold = partials.group_by("col_name").aggregate([
            ("n_rows", "sum"), ("n_null", "sum"),
            ("min_i", "min"), ("max_i", "max"),
            ("min_s", "min"), ("max_s", "max"),
            ("total_chars", "sum"),
        ])
        by = {fold["col_name"][i].as_py(): i for i in range(fold.num_rows)}
        for ci, c in enumerate(sorted(col_list)):
            i = by[c]
            g = lambda n: fold[n][i].as_py()
            mn_i, mx_i = g("min_i_min"), g("max_i_max")
            out["col_name"].append(c)
            out["n_rows"].append(g("n_rows_sum"))
            out["n_null"].append(g("n_null_sum"))
            out["n_distinct"].append(int(nd.get(col_list.index(c), 0)))
            out["min_v"].append(str(mn_i) if mn_i is not None else g("min_s_min"))
            out["max_v"].append(str(mx_i) if mx_i is not None else g("max_s_max"))
            out["total_chars"].append(g("total_chars_sum"))
    return pa.table({
        "col_name": pa.array(out["col_name"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_null": pa.array(out["n_null"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
        "min_v": pa.array(out["min_v"], pa.string()),
        "max_v": pa.array(out["max_v"], pa.string()),
        "total_chars": pa.array(out["total_chars"], pa.int64()),
    })


# ---------------------------------------------------------------------------
# reproducible training-order shuffle

def seeded_shuffle_rank(ds, seed: str, id_col: str = "doc_id",
                        num_ranges: int = 64):
    """Reproducible global training-order shuffle: every row gets
    ``shuffle_key = md5-u64(seed || ':' || id)`` and ``shuffle_rank`` =
    its 0-based position in ascending (key, id) order.  The order is a
    FUNCTION of (seed, ids) — byte-identical across runs, cluster sizes,
    and block layouts, which is what a resumable pretraining job needs:
    epoch N's order can be re-derived after any failure, and a different
    seed gives an independent permutation.  ``random_shuffle`` cannot
    give this (its permutation depends on the block layout of the run).

    Distributed shape (the pack_sequences prefix-sum idiom on the
    uint64 key space): a thin (id, key) pass; keys range-partition by
    VALUE (md5 keys are uniform by construction, so fixed equal-width
    u64 ranges are balanced — no sampling pass needed); per-range
    counts prefix-sum on the driver (O(num_ranges) state); a per-range
    local sort assigns ranks.  Shuffle volume is two int64 columns —
    the payload never moves; at 10^10 rows the exchange is ~160 GB of
    thin pairs against a petabyte corpus.  Ranks are globally dense and
    exact; md5 ties (collisions) break deterministically by id.

    Returns (id_col, shuffle_key, shuffle_rank); join back on id_col or
    feed the rank to a range read to stream epoch order."""
    import hashlib as _hashlib

    def keys(t: pa.Table) -> pa.Table:
        ids = _i64(t[id_col])
        ks = np.array(
            [
                int.from_bytes(
                    _hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "little"
                )
                for i in ids
            ],
            dtype=np.uint64,
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shuffle_key": pa.array(ks.view(np.int64), pa.int64()),
            }
        )

    thin = ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
    width = np.uint64((1 << 64) // num_ranges)

    def tag_range(t: pa.Table) -> pa.Table:
        k = _i64(t["shuffle_key"]).view(np.uint64)
        rg = np.minimum(k // width, np.uint64(num_ranges - 1)).astype(np.int64)
        return t.append_column("_rg", pa.array(rg))

    tagged = thin.map_batches(
        tag_range, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    counts = (
        tagged.map_batches(
            lambda t: pa.table(
                {
                    "_rg": t["_rg"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ).group_by("_rg").aggregate([("one", "sum")]).rename_columns(["_rg", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .groupby("_rg", as_index=False)["n"]
        .sum()
        .sort_values("_rg")
    )
    starts = np.concatenate([[0], np.cumsum(counts["n"].to_numpy(np.int64))])[:-1]
    range_off = dict(zip(counts["_rg"].astype(np.int64), starts))

    def assign(g: pa.Table) -> pa.Table:
        ids = _i64(g[id_col])
        k = _i64(g["shuffle_key"]).view(np.uint64)
        rg = int(g["_rg"][0].as_py())
        order = np.lexsort((ids, k))
        rank = range_off[rg] + np.arange(len(ids), dtype=np.int64)
        out = np.empty(len(ids), np.int64)
        out[order] = rank
        return pa.table(
            {
                id_col: g[id_col],
                "shuffle_key": g["shuffle_key"],
                "shuffle_rank": pa.array(out, pa.int64()),
            }
        )

    return tagged.groupby("_rg").map_groups(assign, batch_format="pyarrow")


def bm25_topk(ds, terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
              col: str = "text") -> pa.Table:
    """BM25 ranked retrieval (Robertson/Lucene idf: ln((N-df+0.5)/(df+0.5)+1);
    tf normalization tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))), global top-k
    by (score DESC, doc_id ASC).  Scores are micro-unit round_even int64
    (the text_tfidf oracle convention, _round_even_u6) so ranking and
    value hashing are integer-exact against the SQL oracle; the float
    expression mirrors the oracle's operation structure term-for-term.

    The log-damped complement of keyword_topk's raw integer tf contract
    and the lexical sibling of ann_topk.

    Scale shape — two streaming passes, train -> broadcast -> score (the
    docs_bigram_lm discipline):
      pass 1 emits per-block THIN stats rows (per-query-term df partial +
      one (n_docs, total_tokens) row); the driver reduces O(q + blocks)
      rows to an idf vector + avgdl that ride to pass 2 in the
      (object-store-cached) task closure;
      pass 2 re-reads only `col`, scores each block's matching docs and
      emits its local top-k — k x blocks thin rows finish on the driver.
    Text never leaves a block task; nothing wide shuffles."""
    import pyarrow.compute as pc

    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    term_arr = pa.array(terms, pa.string())

    def stats_partial(t: pa.Table) -> pa.Table:
        tfr = term_freq_batch(t, col)
        tot = int(pc.sum(tfr["tf"]).as_py() or 0)
        tfq = tfr.filter(pc.is_in(tfr["term"], value_set=term_arr))
        g = tfq.group_by("term").aggregate([("doc_id", "count")])
        n = g.num_rows
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [g["term"].combine_chunks().cast(pa.string()), pa.array([""], pa.string())]
                ),
                "df": pa.array(
                    list(g["doc_id_count"].to_numpy(zero_copy_only=False)) + [0],
                    pa.int64(),
                ),
                "n_docs": pa.array([0] * n + [t.num_rows], pa.int64()),
                "toks": pa.array([0] * n + [tot], pa.int64()),
            }
        )

    stats = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    N = int(stats["n_docs"].sum())
    L = int(stats["toks"].sum())
    if N == 0 or L == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score_u": pa.array([], pa.int64())})
    avgdl = float(L) / N  # double, same single division as the oracle's L/n
    df_by_term = stats[stats["term"] != ""].groupby("term")["df"].sum()
    # ln((N - df + 0.5)/(df + 0.5) + 1), one libm call per query term
    idf = {
        t: float(np.log((N - int(d) + 0.5) / (int(d) + 0.5) + 1.0))
        for t, d in df_by_term.items()
    }

    def score_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score_u": pa.array([], pa.int64())})
        tfr = term_freq_batch(t, col)
        if tfr.num_rows == 0:
            return empty
        doc = _i64(tfr["doc_id"])
        tf = _i64(tfr["tf"])
        # dl = total tokens per doc (sum of tf over ALL its terms)
        uniq, inv = np.unique(doc, return_inverse=True)
        dl = np.bincount(inv, weights=tf.astype(np.float64))
        # vectorized idf lookup: index_in against the (tiny) query-term
        # list, then one gather — no Python loop over the (doc, term) rows
        idf_vec = np.array([idf.get(t_, 0.0) for t_ in terms] + [0.0], np.float64)
        codes = pc.fill_null(
            pc.index_in(tfr["term"], value_set=term_arr), len(terms)
        ).to_numpy(zero_copy_only=False)
        w = idf_vec[codes]
        m = w > 0.0
        if not m.any():
            return empty
        # mirror the oracle's expression structure exactly:
        # tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        tfm = tf[m].astype(np.float64)
        dlm = dl[inv[m]]
        contrib = w[m] * (tfm * (k1 + 1)) / (tfm + k1 * (1 - b + b * dlm / avgdl))
        docs_m = doc[m]
        u2, inv2 = np.unique(docs_m, return_inverse=True)
        score = np.bincount(inv2, weights=contrib)
        su = _round_even_u6(score)
        top = np.lexsort((u2, -su))[:k]
        return pa.table({"doc_id": pa.array(u2[top], pa.int64()),
                         "score_u": pa.array(su[top], pa.int64())})

    parts = ds.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ids = np.array([r["doc_id"] for r in parts], np.int64)
    su = np.array([r["score_u"] for r in parts], np.int64)
    top = np.lexsort((ids, -su))[:k]
    return pa.table({"doc_id": pa.array(ids[top], pa.int64()),
                     "score_u": pa.array(su[top], pa.int64())})


# ---------------------------------------------------------------------------
# vocabulary build + tokenize-to-ids (the id-mapping step between token
# counting and sequence packing in a pretraining prep chain)

def build_vocab(ds, size: int, col: str = "text") -> pa.Table:
    """Global top-`size` vocabulary by (count DESC, term ASC), assigned
    dense ids 0..size-1 in rank order (the fastText/word-level convention;
    OOV id = `size` by downstream convention).

    Shape (one streamed pass): per-batch (term, n) partials via one
    np.unique over the shared flat tokenizer -> coarse-bucket SUM
    (`grouped_arrow_aggregate`: shuffle carries unique-terms-per-batch
    rows, never token instances) -> per-bucket top-`size` -> driver
    merge of n_coarse x size rows.  Driver state is O(buckets x size);
    the full vocabulary never gathers (Heaps-law bounded per bucket but
    unbounded corpus-wide — same discipline as tfidf_topk)."""
    from ..pipelines.relational import grouped_arrow_aggregate

    def term_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_flat(t[col])
        if not len(flat):
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        terms, counts = np.unique(flat, return_counts=True)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    total = grouped_arrow_aggregate(
        ds.map_batches(term_partial, batch_format="pyarrow", zero_copy_batch=True),
        "term", [("n", "sum")], ["n"],
    )

    def bucket_topk(g: pa.Table) -> pa.Table:
        cnt = _i64(g["n"])
        tm = g["term"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((tm, -cnt))[:size]
        return pa.table({"term": pa.array(tm[order], pa.string()),
                         "n": pa.array(cnt[order], pa.int64())})

    head = total.map_batches(bucket_topk, batch_format="pyarrow").to_pandas()
    if head.empty:
        return pa.table({"term": pa.array([], pa.string()),
                         "id": pa.array([], pa.int32()),
                         "n": pa.array([], pa.int64())})
    head = head.sort_values(["n", "term"], ascending=[False, True]).head(size)
    head = head.reset_index(drop=True)
    return pa.table({"term": pa.array(head["term"], pa.string()),
                     "id": pa.array(np.arange(len(head), dtype=np.int32)),
                     "n": pa.array(head["n"].to_numpy(np.int64))})


class TokenizeToIds:
    """Instance-shipped map_batches stage: the vocab (built once by
    `build_vocab`, bounded at `size` entries so the closure broadcast is
    bounded by construction — unlike a raw dimension table) rides the
    task closure sorted for a searchsorted lookup.  Per batch: shared
    flat tokenize -> one np.searchsorted + equality verify -> OOV fill
    -> ListArray rebuild on the tokenizer's own offsets.  Emits
    (id_col, ids list<int32>, n_tokens, n_oov); empty/null docs keep an
    empty list."""

    def __init__(self, vocab: pa.Table, id_col: str = "doc_id", col: str = "text"):
        terms = vocab["term"].to_numpy(zero_copy_only=False)
        ids = vocab["id"].to_numpy(zero_copy_only=False).astype(np.int32)
        order = np.argsort(terms)
        self.sorted_terms = terms[order]
        self.sorted_ids = ids[order]
        self.oov_id = np.int32(len(terms))
        self.id_col = id_col
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, offs = _tokens_flat(t[self.col])
        if len(flat):
            pos = np.searchsorted(self.sorted_terms, flat)
            pos = np.minimum(pos, len(self.sorted_terms) - 1)
            hit = self.sorted_terms[pos] == flat
            ids = np.where(hit, self.sorted_ids[pos], self.oov_id).astype(np.int32)
        else:
            ids = np.array([], np.int32)
            hit = np.array([], bool)
        offs64 = offs.astype(np.int64)
        lists = pa.ListArray.from_arrays(pa.array(offs64, pa.int64()).cast(pa.int32()),
                                         pa.array(ids, pa.int32()))
        n_tok = np.diff(offs64)
        # per-doc OOV counts: reduceat needs non-empty slices; bincount on
        # the doc index of each OOV token is branch-free for empty docs
        doc_idx = np.repeat(np.arange(t.num_rows), n_tok)
        n_oov = np.bincount(doc_idx[~hit], minlength=t.num_rows).astype(np.int64) \
            if len(flat) else np.zeros(t.num_rows, np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            "ids": lists,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
        })


def tokenize_to_ids(ds, vocab: pa.Table, id_col: str = "doc_id", col: str = "text"):
    """Map every document's tokens to vocabulary ids (OOV = len(vocab)):
    the tokenize step before `pack_sequences` materializes actual
    training sequences rather than token budgets.  Returns a Dataset of
    (id_col, ids list<int32>, n_tokens, n_oov)."""
    return ds.map_batches(
        TokenizeToIds(vocab, id_col=id_col, col=col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pack_ids(ds, vocab: pa.Table, budget: int = 2048, id_col: str = "doc_id",
             col: str = "text", num_buckets: "int | None" = None,
             size_hint_bytes: "int | None" = None):
    """Materialize actual fixed-`budget` training sequences of vocabulary
    ids — the end of the prep chain (vocab -> tokenize_to_ids ->
    pack-layout -> sequence rows): documents concatenate in `id_col`
    order and the global id stream cuts every `budget` tokens (docs span
    boundaries; the final sequence may be short).  Returns a Dataset of
    (seq_id, ids list<int32>, n).

    Shape: tokenize once (ids ride as list<int32>) -> thin
    (doc, n_tok) rows through `pack_sequences_thin`'s distributed
    ordered prefix sum -> hash_join layout back onto the tokenized rows
    (both sides thin; the ids lists are the only payload) -> explode to
    (seq_id, pos, id) and exchange by seq_id -> per-bucket lexsort +
    run-length ListArray assembly.  The exchange necessarily carries
    every token id ONCE (4 B + key — that IS the materialization, same
    volume as the training shards being written); all other stages move
    thin rows.  seq_id buckets by value (each sequence is exactly
    `budget` tokens, so value skew cannot exist).

    The tokenized stream has two consumers (thin layout pass + the join)
    and is the size of the corpus' token ids, so it checkpoints through
    the bounded spool, NOT materialize (an unbounded object-store pin at
    10^10 tokens); `size_hint_bytes` (the source parquet size) lets
    small inputs skip the disk round trip — the spool_checkpoint dual
    path.  Per-consumer spool reads are column-pruned: the layout pass
    never re-reads the ids lists.

    `num_buckets` sizes the assembly exchange; with None it derives from
    `size_hint_bytes` at ~128 MB of token rows per bucket (the hash_join
    rule) — a STATIC count would put tokens/B in one task's memory at
    10^10 tokens."""
    from ..pipelines.relational import _derive_num_buckets, hash_join
    from ..util import spool_checkpoint

    if num_buckets is None:
        # token-id rows ≈ 20 B each vs ~6 B/token of source text, so the
        # source-size hint is the right order of magnitude; floor of 32
        # keeps test-scale assembly parallel
        num_buckets = max(32, _derive_num_buckets(size_hint_bytes and size_hint_bytes * 3))

    tok = spool_checkpoint(
        tokenize_to_ids(ds, vocab, id_col=id_col, col=col),
        "pack_ids_tok", size_hint_bytes=size_hint_bytes,
    )

    def thin_rows(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], "n_tok": t["n_tokens"]})

    layout = pack_sequences_thin(
        tok([id_col, "n_tokens"]).map_batches(
            thin_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        budget=budget, id_col=id_col,
    )
    joined = hash_join(
        tok([id_col, "ids"]),
        layout.select_columns([id_col, "tok_start"]),
        on=id_col, right_unique=True,
    )

    def explode(t: pa.Table) -> pa.Table:
        lst = t["ids"].combine_chunks()
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks() if lst.num_chunks != 1 else lst.chunk(0)
        n_tok = np.diff(lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
        start = _i64(t["tok_start"])
        gpos = np.repeat(start, n_tok) + (
            np.arange(len(lst.values)) - np.repeat(np.cumsum(n_tok) - n_tok, n_tok)
        )
        seq = gpos // budget
        return pa.table({
            "seq_id": pa.array(seq, pa.int64()),
            "pos": pa.array(gpos % budget, pa.int64()),
            "id": lst.values,
            "_b": pa.array(seq % num_buckets, pa.int64()),
        })

    def assemble(g: pa.Table) -> pa.Table:
        seq = _i64(g["seq_id"])
        pos = _i64(g["pos"])
        ids = g["id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, seq))
        seq, ids = seq[order], ids[order].astype(np.int32)
        first = np.concatenate([[True], seq[1:] != seq[:-1]])
        offs = np.concatenate([np.nonzero(first)[0], [len(seq)]]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                         pa.array(ids, pa.int32()))
        return pa.table({
            "seq_id": pa.array(seq[first], pa.int64()),
            "ids": lists,
            "n": pa.array(np.diff(offs).astype(np.int64), pa.int64()),
        })

    return (
        joined.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(assemble, batch_format="pyarrow")
    )


def pack_ids_shuffled(ds, vocab: pa.Table, seed: str, budget: int = 2048,
                      id_col: str = "doc_id", col: str = "text",
                      size_hint_bytes: "int | None" = None):
    """`pack_ids` in reproducible SHUFFLED document order: the stream
    concatenates documents by `seeded_shuffle_rank(seed)` instead of id
    order, so epoch N's sequences are a pure function of (seed, ids) —
    byte-identical across runs, cluster sizes and block layouts, and a
    new seed gives an independent permutation (what a resumable
    pretraining job needs from its shard producer).

    Composition: thin (id, rank) pairs from seeded_shuffle_rank join
    onto the documents (hash_join; the only payload is text), then
    pack_ids runs with the RANK as its ordering key — every scale
    property of both parents carries over unchanged."""
    from ..pipelines.relational import hash_join

    ranks = seeded_shuffle_rank(ds.select_columns([id_col]), seed, id_col=id_col)
    joined = hash_join(
        ds.select_columns([id_col, col]),
        ranks.select_columns([id_col, "shuffle_rank"]),
        on=id_col, right_unique=True,
    )
    return pack_ids(
        joined.select_columns(["shuffle_rank", col]), vocab, budget=budget,
        id_col="shuffle_rank", col=col, size_hint_bytes=size_hint_bytes,
    )
