"""Tests for corpus-level analytics ops (n-grams, TF-IDF, stratified
sampling, histogram quantiles) over the driver-provided sf0.001 tables."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_bigrams_do_not_cross_doc_boundaries():
    from tg_data_connector_ray.ops.corpus import bigram_counts_batch

    t = pa.table({"text": pa.array(["a b", "c d", "", "e"])})
    out = bigram_counts_batch(t)
    got = dict(zip(out["ngram"].to_pylist(), out["n"].to_pylist()))
    # "b c" and "d e" would only appear if windows crossed docs
    assert got == {"a b": 1, "c d": 1}


def test_top_ngrams_matches_duckdb(docs):
    import duckdb

    from tg_data_connector_ray.ops.corpus import top_ngrams

    got = top_ngrams(docs, k=20).to_pandas()
    exp = duckdb.sql(
        f"""
        WITH a AS (
          SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr
          FROM '{SF}/documents.parquet'
        ), b AS (
          SELECT unnest(list_transform(range(1, len(arr)),
                        i -> arr[i] || ' ' || arr[i+1])) AS ngram
          FROM a
        )
        SELECT ngram, count(*) AS n FROM b GROUP BY ngram
        ORDER BY n DESC, ngram LIMIT 20
        """
    ).df()
    assert got["ngram"].tolist() == exp["ngram"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_term_freq_batch_counts():
    from tg_data_connector_ray.ops.corpus import term_freq_batch

    t = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["Cat cat DOG", "dog"]),
        }
    )
    out = term_freq_batch(t).to_pandas()
    rows = {(r.doc_id, r.term): r.tf for r in out.itertuples()}
    assert rows == {(7, "cat"): 2, (7, "dog"): 1, (8, "dog"): 1}


def test_tfidf_broadcast_and_join_paths_agree(docs):
    from tg_data_connector_ray.ops.corpus import tfidf_topk

    def canon(res):
        df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
        return df.sort_values(["doc_id", "rn"]).reset_index(drop=True)

    small = canon(tfidf_topk(docs, k=3))
    big = canon(tfidf_topk(docs, k=3, small_vocab=0))  # force the join path
    assert small.equals(big)
    # rn is 1..k per doc, scores non-increasing within a doc
    for _, g in small.groupby("doc_id"):
        assert g["rn"].tolist() == list(range(1, len(g) + 1))
        assert (np.diff(g["score_u"].to_numpy()) <= 0).all()


def test_stratified_sample_deterministic_and_capped(docs):
    from tg_data_connector_ray.ops.corpus import stratified_sample

    ds = docs.select_columns(["doc_id", "lang"])
    a = stratified_sample(ds, "lang", "doc_id", k=10).to_pandas()
    b = stratified_sample(ds, "lang", "doc_id", k=10).to_pandas()
    a = a.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = b.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)
    sizes = a.groupby("lang").size()
    assert (sizes <= 10).all() and len(sizes) > 1


def test_grouped_quantiles_match_numpy():
    from tg_data_connector_ray.ops.corpus import grouped_quantiles

    rng = np.random.default_rng(7)
    g = np.repeat(np.array(["x", "y", "z"], dtype=object), 400)
    v = np.round(rng.uniform(0, 50, size=1200), 2)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(g, pa.string()), "v": pa.array(v, pa.float64())})
    ).repartition(6)
    out = grouped_quantiles(ds, "k", "v", qs=(0.5, 0.9)).to_pandas()
    out = out.set_index("k")
    for key in ("x", "y", "z"):
        sub = v[g == key]
        for q, col in ((0.5, "p50_u"), (0.9, "p90_u")):
            exp = int(np.round(np.percentile(sub, q * 100, method="linear") * 1e6))
            assert abs(int(out.loc[key, col]) - exp) <= 1, (key, col)


def test_grouped_quantiles_rejects_off_grid():
    from tg_data_connector_ray.ops.corpus import grouped_quantiles

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(["a"] * 3), "v": pa.array([0.001, 0.002, 0.003])})
    )
    with pytest.raises(Exception):
        grouped_quantiles(ds, "k", "v").to_pandas()


def test_pii_scrub_sequential_semantics():
    from tg_data_connector_ray.ops.text import pii_scrub_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "mail a.b+c@x.org and 10.0.0.1 then +1 555 12 34 end",
                    "no pii here at all",
                ]
            ),
        }
    )
    out = pii_scrub_batch(t).to_pandas()
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <IP> then <PHONE> end"
    assert (
        out.loc[0, ["n_email", "n_ip", "n_phone"]].tolist() == [1, 1, 1]
    )
    assert out.loc[1, "clean_text"] == "no pii here at all"
    assert out.loc[1, ["n_email", "n_ip", "n_phone"]].tolist() == [0, 0, 0]


def test_repetition_metrics_known_case():
    from tg_data_connector_ray.ops.text import repetition_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b a b a b",  # bigrams: ab x3, ba x2 -> top2 3/5; trigrams aba x2, bab x2 -> dup 4/4
                    "x y z w",  # all bigrams unique, no dup trigram
                    "q",  # too short for any gram
                ]
            ),
        }
    )
    out = repetition_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tok"] == 6
    assert out.loc[1, "top2_frac_u6"] == 600000  # 3/5
    assert out.loc[1, "dup3_frac_u6"] == 1000000  # 4/4
    assert out.loc[2, "top2_frac_u6"] == 333333  # 1/3
    assert out.loc[2, "dup3_frac_u6"] == 0
    assert out.loc[3, "top2_frac_u6"] == 0 and out.loc[3, "dup3_frac_u6"] == 0


def test_pack_sequences_matches_serial(docs):
    import duckdb

    from tg_data_connector_ray.ops.corpus import pack_sequences

    got = (
        pack_sequences(docs.select_columns(["doc_id", "text"]), budget=100, num_ranges=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        WITH t AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tok
          FROM '{SF}/documents.parquet'
        ), c AS (
          SELECT doc_id, n_tok,
            CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
          FROM t
        )
        SELECT doc_id, n_tok, tok_start, tok_start // 100 AS seq_first,
               (tok_start + greatest(n_tok, 1) - 1) // 100 AS seq_last,
               tok_start % 100 AS off_in_seq
        FROM c ORDER BY doc_id
        """
    ).df()
    for c in got.columns:
        assert got[c].astype("int64").tolist() == exp[c].astype("int64").tolist(), c
    # packing invariant: offsets are contiguous in doc order
    assert (
        got["tok_start"].to_numpy()[1:]
        == (got["tok_start"] + got["n_tok"]).to_numpy()[:-1]
    ).all()


def test_degenerate_empty_corpus_paths():
    """The zero-schema guards: an all-empty corpus returns typed empty
    results instead of KeyError (grouped_arrow_aggregate's empty-input
    caveat)."""
    from tg_data_connector_ray.ops.corpus import (
        grouped_quantiles,
        tfidf_topk,
        top_ngrams,
    )

    empty_docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", None])})
    )
    tg = top_ngrams(empty_docs, k=5)
    assert tg.num_rows == 0 and tg.column_names == ["ngram", "n"]
    tf = tfidf_topk(empty_docs, k=2)
    df = tf.to_pandas() if not isinstance(tf, pa.Table) else tf.to_pandas()
    assert len(df) == 0 and "score_u" in df.columns

    empty_ev = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())})
    )
    q = grouped_quantiles(empty_ev, "k", "v", qs=(0.5,))
    assert q.num_rows == 0 and q.column_names == ["k", "p50_u"]


def test_anti_join_null_right_key_keeps_left_rows():
    """NOT EXISTS semantics: a NULL key on the right must not eliminate
    left rows (NULL = NULL is never true)."""
    from tg_data_connector_ray.pipelines.relational import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "x": pa.array([10, 20, 30], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, None], pa.int64())})
    )
    out = hash_join(left, right, on="k", how="anti").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 3]


def test_contamination_matches_duckdb(docs):
    import duckdb

    from tg_data_connector_ray.ops.corpus import ngram_contamination

    d = docs.select_columns(["doc_id", "text"])
    got = (
        ngram_contamination(d.filter(expr="doc_id >= 20"), d.filter(expr="doc_id < 20"), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
          FROM '{SF}/documents.parquet'
        ), g AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                 i -> array_to_string(t[i:i+2], ' '))) AS gram
          FROM toks
        ), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
        SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared
        FROM g JOIN bench USING (gram) WHERE g.doc_id >= 20
        GROUP BY g.doc_id ORDER BY g.doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_shared"].tolist() == exp["n_shared"].tolist()
    assert len(got) > 20  # k=3 on this corpus: plenty of shared trigrams


def test_pack_sequences_empty_corpus():
    import ray
    import ray.data

    from tg_data_connector_ray.ops.corpus import pack_sequences

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = pack_sequences(empty, budget=100)
    assert out.num_rows == 0
    assert "tok_start" in out.column_names  # typed empty, not a TypeError


def test_users_in_both_no_matching_events(tmp_path):
    """No rows of either type: the intersection is a typed empty table,
    not a KeyError on the zero-schema distinct output."""
    import pyarrow.parquet as pq

    from tg_data_connector_ray.pipelines.relational import users_in_both

    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["click"] * 3),
                "user_id": pa.array([1, 2, 3], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = users_in_both(str(tmp_path))
    assert out.num_rows == 0 and out.column_names == ["user_id"]


def test_null_text_and_null_strata_edges(ray_session):
    """Review-pass regressions: pack_sequences treats null text as 0
    tokens (no NaN-poisoned offsets); stratified_sample treats a null
    stratum as its own group (SQL semantics) instead of a lexsort
    TypeError."""
    import pyarrow as pa
    import ray

    from tg_data_connector_ray.ops.corpus import pack_sequences, stratified_sample

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["one two", None, "three"], pa.string()),
            }
        )
    )
    out = pack_sequences(docs, budget=4).to_pandas().set_index("doc_id").sort_index()
    assert out["n_tok"].tolist() == [2, 0, 1]

    strat = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", None, "en", None], pa.string()),
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    got = stratified_sample(strat, "lang", "doc_id", k=1).to_pandas()
    # one row per stratum, null being a stratum of its own
    assert len(got) == 2
    assert got["lang"].isna().sum() == 1


def test_postings_dictionary_head(ray_session):
    """df counts docs (not occurrences), tf totals occurrences, posting
    span is min/max doc_id, ranking is (df DESC, term ASC), k caps."""
    import pyarrow as pa
    import ray

    from tg_data_connector_ray.ops.corpus import postings

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta alpha",   # alpha tf=2 here
                    "beta gamma",
                    "beta ALPHA",          # lowercased tokenizer
                ]
            ),
        }
    )
    out = postings(ray.data.from_arrow(docs), k=2).to_pylist()
    # beta: df=3; alpha: df=2 (ties impossible here); gamma cut by k=2
    assert [(r["rn"], r["term"], r["df"], r["tf"], r["min_doc"], r["max_doc"]) for r in out] == [
        (1, "beta", 3, 3, 1, 3),
        (2, "alpha", 2, 3, 1, 3),
    ]


def test_table_profile_matches_duckdb_and_edges(ray_session):
    """table_profile vs a direct DuckDB profile on mixed-type data with
    nulls and an all-null column; empty input yields a typed empty
    profile."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.ops.corpus import table_profile

    rng = np.random.default_rng(3)
    n = 2000
    t = pa.table({
        "k": pa.array([None if i % 13 == 0 else int(v)
                       for i, v in enumerate(rng.integers(-50, 50, n))],
                      type=pa.int64()),
        "s": pa.array([None if i % 7 == 0 else f"w{v:02d}"
                       for i, v in enumerate(rng.integers(0, 30, n))]),
        "allnull": pa.array([None] * n, type=pa.string()),
    })
    got = table_profile(
        ray.data.from_arrow(t).repartition(8), ["k", "s", "allnull"]
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        SELECT * FROM (
          SELECT 'allnull' AS col_name, count(*) AS n_rows,
                 count(*) - count(allnull) AS n_null,
                 count(DISTINCT allnull) AS n_distinct,
                 CAST(min(allnull) AS VARCHAR) AS min_v,
                 CAST(max(allnull) AS VARCHAR) AS max_v,
                 CAST(sum(length(allnull)) AS BIGINT) AS total_chars FROM t
          UNION ALL
          SELECT 'k', count(*), count(*) - count(k), count(DISTINCT k),
                 CAST(min(k) AS VARCHAR), CAST(max(k) AS VARCHAR),
                 CAST(NULL AS BIGINT) FROM t
          UNION ALL
          SELECT 's', count(*), count(*) - count(s), count(DISTINCT s),
                 min(s), max(s), CAST(sum(length(s)) AS BIGINT) FROM t
        ) ORDER BY col_name
    """).arrow()
    # all-null string: engine emits total_chars 0, SQL sum() is NULL —
    # normalize (count-like semantics; documented)
    gd, ed = got.to_pydict(), exp.to_pydict()
    ed["total_chars"] = [0 if v is None and c == "allnull" else v
                         for c, v in zip(ed["col_name"], ed["total_chars"])]
    assert gd == ed

    empty = table_profile(ray.data.from_arrow(t.slice(0, 0)), ["k", "s"])
    assert empty.num_rows == 0 and empty.column_names == got.column_names


def test_seeded_shuffle_rank_is_dense_and_layout_independent():
    import pandas as pd

    from tg_data_connector_ray.ops.corpus import seeded_shuffle_rank

    ids = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    one_block = ray.data.from_arrow(ids)
    many_blocks = ray.data.from_arrow(ids).repartition(7)

    a = seeded_shuffle_rank(one_block, seed="s1").to_pandas().sort_values("doc_id")
    b = seeded_shuffle_rank(many_blocks, seed="s1").to_pandas().sort_values("doc_id")
    # ranks are a pure function of (seed, ids): block layout is invisible
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    # dense permutation of 0..n-1
    assert sorted(a["shuffle_rank"]) == list(range(200))
    # a different seed is a different permutation
    c = seeded_shuffle_rank(one_block, seed="s2").to_pandas().sort_values("doc_id")
    assert list(c["shuffle_rank"]) != list(a["shuffle_rank"])


def test_bm25_topk_matches_reference(ray_session):
    """BM25 on 3 tiny docs vs a direct float reference (Lucene idf,
    k1=1.2, b=0.75, micro-unit round_even)."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.ops.corpus import bm25_topk

    docs = {
        1: "spark spark window join",
        2: "window scan scan scan",
        3: "hash hash hash hash spark",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    got = bm25_topk(ray.data.from_arrow(t).repartition(2), ["spark", "hash"], k=3)

    # reference
    N, L = 3, sum(len(v.split()) for v in docs.values())
    avgdl = L / N
    tf = {d: {} for d in docs}
    for d, txt in docs.items():
        for w in txt.split():
            tf[d][w] = tf[d].get(w, 0) + 1
    df = {q: sum(1 for d in docs if q in tf[d]) for q in ("spark", "hash")}
    exp = {}
    for d in docs:
        s = 0.0
        dl = sum(tf[d].values())
        for q in ("spark", "hash"):
            f = tf[d].get(q, 0)
            if f:
                idf = math.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1)
                s += idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
        if s > 0:
            exp[d] = int(np.round(s * 1e6))
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert got["doc_id"].to_pylist() == order
    assert got["score_u"].to_pylist() == [exp[d] for d in order]


def test_bm25_topk_empty_query_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from tg_data_connector_ray.ops.corpus import bm25_topk

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"], pa.string())})
    with pytest.raises(ValueError):
        bm25_topk(ray.data.from_arrow(t), [])


def test_pack_sequences_thin_extras_and_order(ray_session):
    """pack_sequences_thin: offsets match the doc_id-ordered prefix sum
    and extra columns ride through reordered with their doc."""
    import pyarrow as pa
    import ray.data

    from tg_data_connector_ray.ops.corpus import pack_sequences_thin

    t = pa.table(
        {
            "doc_id": pa.array([30, 10, 20, 40], pa.int64()),
            "n_tok": pa.array([5, 3, 0, 7], pa.int64()),
            "rep": pa.array([300, 100, 200, 400], pa.int64()),
        }
    )
    out = pack_sequences_thin(
        ray.data.from_arrow(t).repartition(2), budget=4, extra_cols=("rep",)
    )
    rows = {r["doc_id"]: r for r in out.take_all()}
    # doc order 10,20,30,40 -> starts 0,3,3,8
    assert [rows[i]["tok_start"] for i in (10, 20, 30, 40)] == [0, 3, 3, 8]
    assert [rows[i]["rep"] for i in (10, 20, 30, 40)] == [100, 200, 300, 400]
    assert rows[10]["seq_first"] == 0 and rows[10]["seq_last"] == 0
    assert rows[30]["seq_first"] == 0 and rows[30]["seq_last"] == 1  # spans 3..7
    assert rows[20]["n_tok"] == 0 and rows[20]["seq_last"] == rows[20]["seq_first"]
    assert rows[40]["off_in_seq"] == 0 and rows[40]["seq_first"] == 2


def test_build_vocab_and_tokenize_to_ids_edges(ray_session):
    """Vocab rank = (count DESC, term ASC) with dense ids; OOV id =
    len(vocab); searchsorted clamp handles tokens sorting above the last
    vocab term; empty / null docs emit empty lists with 0/0 counts and
    do not shift neighbours' per-doc OOV attribution."""
    from tg_data_connector_ray.ops.corpus import build_vocab, tokenize_to_ids

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(
            ["the cat sat on the mat", "", None, "the dog", "zzz zzz the"],
            pa.string(),
        ),
    })
    ds = ray.data.from_arrow(docs)
    v = build_vocab(ds, size=3)
    # counts: the=4, zzz=2, rest=1 -> ties broken by term asc (cat first)
    assert v["term"].to_pylist() == ["the", "zzz", "cat"]
    assert v["id"].to_pylist() == [0, 1, 2]
    assert v["n"].to_pylist() == [4, 2, 1]

    out = (
        tokenize_to_ids(ds, v)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # OOV id = 3; "zzz" sorts ABOVE every vocab term (clamp path)
    assert list(out["ids"].map(list)) == [
        [0, 2, 3, 3, 0, 3],  # the cat sat on the mat
        [],
        [],
        [0, 3],              # the dog
        [1, 1, 0],           # zzz zzz the
    ]
    assert list(out["n_tokens"]) == [6, 0, 0, 2, 3]
    assert list(out["n_oov"]) == [3, 0, 0, 1, 0]

    # degenerate: empty corpus -> empty typed vocab
    empty = build_vocab(ray.data.from_arrow(docs.slice(1, 2)), size=3)
    assert empty.num_rows == 0 and empty.column_names == ["term", "id", "n"]


def test_pack_ids_materializes_boundary_spanning_sequences(ray_session):
    """Docs concatenate in doc_id order regardless of input order; a doc
    spans the budget boundary; empty docs vanish from the stream; the
    final short sequence survives; ids use the vocab ranks with OOV."""
    from tg_data_connector_ray.ops.corpus import build_vocab, pack_ids

    docs = pa.table({
        "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
        "text": pa.array(["e f g", "a b c d", "", "h i"], pa.string()),
    })
    ds = ray.data.from_arrow(docs)
    v = build_vocab(ds, size=4)  # all counts 1 -> term asc: a b c d
    assert v["term"].to_pylist() == ["a", "b", "c", "d"]

    out = (
        pack_ids(ds, v, budget=4)
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    # stream in doc order 1,2,3,4: a b c d | e f g h | i
    assert list(out["seq_id"]) == [0, 1, 2]
    assert [list(x) for x in out["ids"]] == [[0, 1, 2, 3], [4, 4, 4, 4], [4]]
    assert list(out["n"]) == [4, 4, 1]

    # budget beyond the whole stream -> one short sequence
    one = pack_ids(ds, v, budget=100).to_pandas()
    assert list(one["seq_id"]) == [0] and list(one["n"]) == [9]


def test_build_vocab_under_size_pressure_matches_reference(ray_session):
    """The fixture corpus has ~31 distinct tokens, so the sf sweeps never
    stress top-V selection; this pins it against a numpy reference on a
    1000-term vocabulary with heavy count ties across many blocks."""
    from tg_data_connector_ray.ops.corpus import build_vocab

    rng = np.random.RandomState(7)
    terms = [f"tk{i:04d}" for i in range(1000)]
    # zipf-ish counts with LOTS of ties (counts drawn from a tiny range)
    counts = rng.randint(1, 6, size=1000) * (1 + (np.arange(1000) % 7))
    texts, flat = [], []
    for t, c in zip(terms, counts):
        flat.extend([t] * int(c))
    rng.shuffle(flat)
    # split the token stream into 40 documents across 8 blocks
    docs = ["" for _ in range(40)]
    for i, tok in enumerate(flat):
        docs[i % 40] += tok + " "
    tbl = pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "text": pa.array(docs, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)

    got = build_vocab(ds, size=100)
    # reference: exact global counts, rank by (count desc, term asc)
    import collections
    ref_counts = collections.Counter(flat)
    ref = sorted(ref_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert got["term"].to_pylist() == [t for t, _ in ref]
    assert got["n"].to_pylist() == [c for _, c in ref]
    assert got["id"].to_pylist() == list(range(100))


def test_pack_ids_shuffled_is_layout_independent_and_seed_sensitive(ray_session):
    """The shuffled pack is a pure function of (seed, ids): repartitioning
    the input changes nothing; a different seed gives a different stream
    over the SAME multiset of tokens."""
    from tg_data_connector_ray.ops.corpus import build_vocab, pack_ids_shuffled

    docs = pa.table({
        "doc_id": pa.array(np.arange(12, dtype=np.int64)),
        "text": pa.array([f"w{i} w{i} common" for i in range(12)], pa.string()),
    })
    ds1 = ray.data.from_arrow(docs)
    ds2 = ray.data.from_arrow(docs).repartition(5)
    v = build_vocab(ds1, size=8)

    def norm(ds):
        df = ds.to_pandas().sort_values("seq_id").reset_index(drop=True)
        return [(int(r.seq_id), list(r.ids), int(r.n)) for r in df.itertuples()]

    a = norm(pack_ids_shuffled(ds1, v, seed="s1", budget=7))
    b = norm(pack_ids_shuffled(ds2, v, seed="s1", budget=7))
    assert a == b  # block layout cannot matter
    c = norm(pack_ids_shuffled(ds1, v, seed="s2", budget=7))
    assert a != c  # another seed = another permutation
    # same token multiset either way
    flat = sorted(x for _, ids, _ in a for x in ids)
    assert flat == sorted(x for _, ids, _ in c for x in ids)
